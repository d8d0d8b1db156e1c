"""k-anonymity invariants (SURVEY §5 property tests)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark import bin_equal_width, k_anonymize_suppress, k_anonymity_audit
from dbms_data_anonymity_differential_privacy_spark.operators.kanonymity import class_sizes
from dbms_data_anonymity_differential_privacy_spark.sources.readers import load_table

# 2-col QI keeps classes non-degenerate at sf0.001 (150 rows).
QI = ["c_mktsegment", "acctbal_bin"]


def _binned(spark, sf):
    return bin_equal_width(load_table(spark, sf, "customer"), "c_acctbal", 5, "acctbal_bin")


def test_min_class_size_ge_k(spark, sf0001):
    anon = k_anonymize_suppress(_binned(spark, sf0001), QI, 5)
    sizes = class_sizes(anon, QI)
    assert sizes.agg(F.min("class_size")).collect()[0][0] >= 5


def test_suppression_monotone_in_k(spark, sf0001):
    b = _binned(spark, sf0001)
    counts = [k_anonymize_suppress(b, QI, k).count() for k in (2, 5, 10)]
    assert counts[0] >= counts[1] >= counts[2]
    assert counts[0] <= b.count()


def test_schema_preserved(spark, sf0001):
    b = _binned(spark, sf0001)
    anon = k_anonymize_suppress(b, QI, 5)
    assert anon.columns == b.columns


def test_audit_fields(spark, sf0001):
    b = _binned(spark, sf0001)
    row = k_anonymity_audit(b, QI, 5).collect()[0]
    assert row.n_classes > 0
    assert row.min_class_size >= 1
    assert row.max_class_size >= row.min_class_size
    assert row.rows_at_risk < b.count()
    # after suppression the audit must report k satisfied
    anon = k_anonymize_suppress(b, QI, 5)
    row2 = k_anonymity_audit(anon, QI, 5).collect()[0]
    assert bool(row2.k_satisfied) is True
    assert row2.classes_below_k == 0


class TestKmAnonymity:
    def test_pair_supports(self, spark):
        from dbms_data_anonymity_differential_privacy_spark.operators.kanonymity import (
            km_anonymity_audit,
        )

        rows = [
            (1, "a"), (1, "b"), (1, "c"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "b"),
            (4, "c"),
            (1, "a"),  # duplicate event must not double-count the user
        ]
        df = spark.createDataFrame(rows, "u long, item string")
        out = {(r["item_a"], r["item_b"]): (r["support"], r["risky"]) for r in
               km_anonymity_audit(df, "u", "item", m=2, k=3).collect()}
        assert out[("a", "b")] == (3, False)
        assert out[("a", "c")] == (1, True)
        assert out[("b", "c")] == (1, True)

    def test_m1_is_item_support(self, spark):
        from dbms_data_anonymity_differential_privacy_spark.operators.kanonymity import (
            km_anonymity_audit,
        )

        rows = [(1, "a"), (2, "a"), (3, "b")]
        df = spark.createDataFrame(rows, "u long, item string")
        out = {r["item_a"]: r["support"] for r in
               km_anonymity_audit(df, "u", "item", m=1, k=2).collect()}
        assert out == {"a": 2, "b": 1}

    def test_rejects_large_m(self, spark):
        import pytest as _pytest

        from dbms_data_anonymity_differential_privacy_spark.operators.kanonymity import (
            km_anonymity_audit,
        )

        df = spark.createDataFrame([(1, "a")], "u long, item string")
        with _pytest.raises(ValueError):
            km_anonymity_audit(df, "u", "item", m=3)


def test_qi_uniqueness_search_crafted(spark):
    """X100: hand-checked subset census on a 5-row table, including a
    genuine NULL data value kept distinct from aggregated-out columns."""
    from dbms_data_anonymity_differential_privacy_spark.operators.metrics import qi_uniqueness_search

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 1), (None, 1)],
        "x string, y int",
    )
    out = {r.qi_subset: r for r in qi_uniqueness_search(df, ["x", "y"]).collect()}
    assert set(out) == {"x", "y", "x,y"}
    # subset {x}: classes a(3), b(1), NULL(1) -> 2 singletons
    assert out["x"].n_classes == 3 and out["x"].n_singletons == 2
    assert out["x"].min_class_size == 1 and out["x"].max_class_size == 3
    assert out["x"].uniqueness_r == round(2 / 5, 6)
    # subset {y}: 1(4), 2(1)
    assert out["y"].n_classes == 2 and out["y"].n_singletons == 1
    # subset {x,y}: (a,1)x2, (a,2), (b,1), (NULL,1) -> 3 singletons
    assert out["x,y"].n_classes == 4 and out["x,y"].n_singletons == 3
    assert out["x,y"].n_cols == 2 and out["x"].n_cols == 1
