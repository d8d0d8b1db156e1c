"""Tests for CDC merge (x58 apply_changes) and the skew report (x59)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.profile import skew_report
from dbms_data_anonymity_differential_privacy_spark.operators.snapshot import apply_changes


def base_df(spark):
    return spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three"), (4, "four")], "id int, v string"
    )


class TestApplyChanges:
    def test_upsert_delete_insert(self, spark):
        ch = spark.createDataFrame(
            [
                (2, "TWO", "upsert"),     # update
                (3, None, "delete"),      # delete
                (9, "nine", "upsert"),    # insert
            ],
            "id int, v string, op string",
        )
        out = {r["id"]: r["v"] for r in apply_changes(base_df(spark), ch, "id").collect()}
        assert out == {1: "one", 2: "TWO", 4: "four", 9: "nine"}

    def test_latest_seq_wins(self, spark):
        ch = spark.createDataFrame(
            [(2, "v1", "upsert", 1), (2, "v2", "upsert", 2), (2, "dead", "delete", 0)],
            "id int, v string, op string, seq int",
        )
        out = {r["id"]: r["v"] for r in
               apply_changes(base_df(spark), ch, "id", seq_col="seq").collect()}
        assert out[2] == "v2"

    def test_delete_wins_seq_tie(self, spark):
        ch = spark.createDataFrame(
            [(2, "v1", "upsert", 5), (2, None, "delete", 5)],
            "id int, v string, op string, seq int",
        )
        out = apply_changes(base_df(spark), ch, "id", seq_col="seq")
        assert out.filter(F.col("id") == 2).count() == 0

    def test_schema_preserved_and_idempotent_replay(self, spark):
        ch = spark.createDataFrame([(2, "TWO", "upsert")], "id int, v string, op string")
        once = apply_changes(base_df(spark), ch, "id")
        twice = apply_changes(once, ch, "id")
        assert once.columns == base_df(spark).columns
        assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))

    def test_base_never_shuffles(self, spark):
        """The snapshot survives through a broadcast anti join — no
        hash-partition exchange may touch the base scan side."""
        ch = spark.createDataFrame([(2, "TWO", "upsert")], "id int, v string, op string")
        plan = apply_changes(base_df(spark), ch, "id")._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


class TestSkewReport:
    def test_exact_counts(self, spark):
        rows = [("hot",)] * 6 + [("a",), ("b",), ("c",), ("d",)]
        df = spark.createDataFrame(rows, "k string")
        r = skew_report(df, ["k"], top=2).collect()[0]
        assert (r["n_rows"], r["n_keys"], r["max_count"], r["top2_count"]) == (10, 5, 6, 7)
        assert r["max_share_r"] == pytest.approx(0.6)
        assert r["top2_share_r"] == pytest.approx(0.7)

    def test_null_keys_are_reported(self, spark):
        df = spark.createDataFrame([(None,), (None,), ("a",)], "k string")
        r = skew_report(df, ["k"], top=1).collect()[0]
        assert r["n_keys"] == 2 and r["max_count"] == 2

    def test_top_capped_by_cardinality(self, spark):
        df = spark.createDataFrame([("a",), ("b",)], "k string")
        r = skew_report(df, ["k"], top=10).collect()[0]
        assert r["top10_count"] == 2 and r["top10_share_r"] == pytest.approx(1.0)
