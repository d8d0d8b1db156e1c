"""Unit tests for the round-3 additions x33/x34/x35: hierarchical rollup
release, user-level DP contribution bounding, and the k-map audit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.dp import (
    bound_contribution,
    dp_sum_user_level,
)
from dbms_data_anonymity_differential_privacy_spark import load_table
from dbms_data_anonymity_differential_privacy_spark.operators.metrics import k_map_audit
from dbms_data_anonymity_differential_privacy_spark.operators.rollup import rollup_release


@pytest.fixture(scope="module")
def geo(spark):
    rows = [
        # region, nation, seg, cents
        ("EU", "FR", "A", 100),
        ("EU", "FR", "A", 200),
        ("EU", "FR", "A", 300),
        ("EU", "DE", "A", 400),
        ("EU", "DE", "B", 500),
        ("US", "US", "A", 600),
    ]
    return spark.createDataFrame(rows, "r string, n string, s string, cents long")


def test_rollup_release_levels_and_suppression(geo):
    out = rollup_release(geo, ["r", "n", "s"], k=2, cents_col="cents").collect()
    by_key = {(t.r, t.n, t.s): t for t in out}
    # leaf cell (EU, FR, A) has 3 contributors, level 0
    leaf = by_key[("EU", "FR", "A")]
    assert (leaf.level, leaf.n_rows, leaf.sum_cents) == (0, 3, 600)
    # (EU, DE, *) rolls up to 2 contributors at level 1 (s aggregated away)
    de = by_key[("EU", "DE", None)]
    assert (de.level, de.n_rows, de.sum_cents) == (1, 2, 900)
    # grand total: level 7? no — rollup of 3 cols tops out at level 7 only
    # for cube; rollup's grand total has all three bits set
    total = by_key[(None, None, None)]
    assert (total.level, total.n_rows, total.sum_cents) == (7, 6, 2100)
    # SUPPRESSION: every singleton cell is gone, every released cell >= k
    assert all(t.n_rows >= 2 for t in out)
    assert ("US", "US", "A") not in by_key  # 1 contributor
    assert ("EU", "DE", "B") not in by_key


def test_rollup_release_hierarchy_consistency(geo):
    """With k=1 (nothing suppressed) each level's cent total telescopes to
    the same grand total — the Expand produced every level from one pass."""
    out = rollup_release(geo, ["r", "n", "s"], k=1, cents_col="cents")
    per_level = {
        t.level: t.total
        for t in out.groupBy("level").agg(F.sum("sum_cents").alias("total")).collect()
    }
    assert set(per_level) == {0, 1, 3, 7}
    assert len(set(per_level.values())) == 1  # all levels sum to 2100


def test_rollup_release_validates_args(geo):
    with pytest.raises(ValueError):
        rollup_release(geo, ["r"], k=0)
    with pytest.raises(ValueError):
        rollup_release(geo, [], k=2)


@pytest.fixture(scope="module")
def purchases(spark):
    rows = [
        ("u1", 1, 10.0),
        ("u1", 2, 20.0),
        ("u1", 3, 30.0),
        ("u1", 4, 40.0),  # u1 owns 4 rows — 4th must be cut at L=3
        ("u2", 5, 50.0),
        ("u3", 6, 2000.0),  # clipped to 100.0
    ]
    return spark.createDataFrame(rows, "user string, k long, v double")


def test_bound_contribution_caps_and_is_deterministic(purchases):
    b = bound_contribution(purchases, "user", 3, ["k"])
    per_user = {t.user: t.n for t in b.groupBy("user").agg(F.count("*").alias("n")).collect()}
    assert per_user == {"u1": 3, "u2": 1, "u3": 1}
    # deterministic rank by k: u1 keeps k in {1,2,3}, drops k=4
    kept = {t.k for t in b.filter(F.col("user") == "u1").collect()}
    assert kept == {1, 2, 3}
    # layout-independence: a different partitioning keeps the same rows
    b2 = bound_contribution(purchases.repartition(7, "k"), "user", 3, ["k"])
    assert {tuple(r) for r in b.collect()} == {tuple(r) for r in b2.collect()}


def test_bound_contribution_validates_args(purchases):
    with pytest.raises(ValueError):
        bound_contribution(purchases, "user", 0, ["k"])
    with pytest.raises(ValueError):
        bound_contribution(purchases, "user", 3, [])


def test_dp_sum_user_level_exact_core_and_noise_scale(purchases):
    out = dp_sum_user_level(
        purchases, [], "user", "v", ["k"],
        epsilon=1.0, lower=0.0, upper=100.0, max_rows=3,
        release="t1",
    ).collect()
    assert len(out) == 1
    # u1: 10+20+30 (4th row bounded away), u2: 50, u3: clipped to 100
    assert out[0].sum_exact == pytest.approx(10 + 20 + 30 + 50 + 100)
    # noise is deterministic for a fixed (seed, release) ...
    again = dp_sum_user_level(
        purchases, [], "user", "v", ["k"],
        epsilon=1.0, lower=0.0, upper=100.0, max_rows=3,
        release="t1",
    ).collect()
    assert out[0].sum_dp == again[0].sum_dp
    # ... and differs across releases (no shared draw to cancel)
    other = dp_sum_user_level(
        purchases, [], "user", "v", ["k"],
        epsilon=1.0, lower=0.0, upper=100.0, max_rows=3,
        release="t2",
    ).collect()
    assert out[0].sum_dp != other[0].sum_dp


def test_dp_sum_user_level_sensitivity_scales_with_max_rows(purchases):
    """Same uniform draw (same release), bigger L -> proportionally bigger
    noise magnitude: |noise| scales linearly in L * clip."""
    def noise(max_rows):
        r = dp_sum_user_level(
            purchases, [], "user", "v", ["k"],
            epsilon=1.0, lower=0.0, upper=100.0, max_rows=max_rows,
            release="t3",
        ).collect()[0]
        return r.sum_dp - r.sum_exact

    n1, n2 = noise(1), noise(2)
    assert n2 == pytest.approx(2.0 * n1)


def test_k_map_audit_flags_population_rare_classes(spark):
    pop_rows = [("a", i) for i in range(20)] + [("b", i) for i in range(3)] + [
        ("c", i) for i in range(9)
    ]
    pop = spark.createDataFrame(pop_rows, "qi string, rid long")
    smp = spark.createDataFrame(
        [("a", 0), ("a", 1), ("b", 0), ("zz", 0)], "qi string, rid long"
    )
    out = {t.qi: t for t in k_map_audit(smp, pop, ["qi"], k=5).collect()}
    # class c: in population only, not released -> absent from the audit
    assert set(out) == {"a", "b", "zz"}
    assert (out["a"].sample_count, out["a"].population_count, out["a"].at_risk) == (2, 20, False)
    # class b: common-looking in the sample but only 3 population members
    assert (out["b"].sample_count, out["b"].population_count, out["b"].at_risk) == (1, 3, True)
    # class zz: released but with NO population candidates — maximally
    # risky, must not be silently dropped by the join
    assert (out["zz"].sample_count, out["zz"].population_count, out["zz"].at_risk) == (1, 0, True)


def test_k_map_audit_validates_k(spark):
    df = spark.createDataFrame([("a", 1)], "qi string, rid long")
    with pytest.raises(ValueError):
        k_map_audit(df, df, ["qi"], k=0)


def test_delta_presence_bounds_and_coverage(spark, sf001):
    """x97: delta is exactly n_released/n_pop per population class; every
    population class appears (zero-release classes report delta 0); the
    violation flag matches the bounds."""
    from dbms_data_anonymity_differential_privacy_spark.operators.metrics import (
        delta_presence_audit,
    )
    from dbms_data_anonymity_differential_privacy_spark.operators.sampling import hash_sample

    c = load_table(spark, sf001, "customer")
    released = hash_sample(c, ["c_custkey"], 0.3, salt="t97")
    out = delta_presence_audit(
        c, released, ["c_nationkey"], delta_min=0.1, delta_max=0.5
    ).collect()
    n_classes = c.select("c_nationkey").distinct().count()
    assert len(out) == n_classes
    for r in out:
        assert 0 <= r.n_released <= r.n_pop
        d = r.n_released / r.n_pop
        assert abs(r.delta_r - d) < 1e-9
        assert r.violates == (d < 0.1 or d > 0.5)

    import pytest

    with pytest.raises(ValueError, match="delta_min"):
        delta_presence_audit(c, released, ["c_nationkey"], 0.9, 0.2)


def test_pivot_release_cell_semantics(spark):
    """X105: 0 = true zero, NULL = suppressed positive cell below k,
    >= k released verbatim; declared values fix the schema even when a
    category is absent from the data."""
    from dbms_data_anonymity_differential_privacy_spark.operators.rollup import pivot_release

    rows = [("r1", "a")] * 6 + [("r1", "b")] * 2 + [("r2", "a")] * 5
    df = spark.createDataFrame(rows, "rk string, cat string")
    out = {r.rk: r for r in
           pivot_release(df, ["rk"], "cat", ["a", "b", "c"], k=5).collect()}
    assert out["r1"]["a"] == 6          # released
    assert out["r1"]["b"] is None       # 2 < k: suppressed
    assert out["r1"]["c"] == 0          # absent category: true zero
    assert out["r2"]["a"] == 5          # boundary: k released
    assert out["r2"]["b"] == 0 and out["r2"]["c"] == 0


def test_pivot_release_validation(spark):
    import pytest

    from dbms_data_anonymity_differential_privacy_spark.operators.rollup import pivot_release

    df = spark.createDataFrame([("r", "a")], "rk string, cat string")
    with pytest.raises(ValueError):
        pivot_release(df, ["rk"], "cat", [], k=5)
    with pytest.raises(ValueError):
        pivot_release(df, ["rk"], "cat", ["a"], k=0)
