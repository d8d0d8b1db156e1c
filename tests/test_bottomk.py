"""Tests for the bottom-k synopsis (x60): mergeable uniform sample,
DKW-certified quantiles, KMV distinct counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.sketch import (
    bottomk_sample,
    kmv_distinct,
    quantile_sketch,
)


class TestBottomkSample:
    def test_mergeable(self, spark):
        """bottom-k(union) == bottom-k(bottom-k(A) ∪ bottom-k(B)) — the
        property that makes per-partition heaps correct."""
        df = spark.range(1000).select(F.col("id"))
        a, b = df.filter("id % 2 = 0"), df.filter("id % 2 = 1")
        whole = {r["id"] for r in bottomk_sample(df, "id", 50, "s").collect()}
        merged = bottomk_sample(
            bottomk_sample(a, "id", 50, "s").unionByName(bottomk_sample(b, "id", 50, "s")),
            "id",
            50,
            "s",
        )
        assert {r["id"] for r in merged.collect()} == whole

    def test_layout_independent(self, spark):
        df = spark.range(500)
        a = {r["id"] for r in bottomk_sample(df, "id", 20, "x").collect()}
        b = {r["id"] for r in bottomk_sample(df.repartition(13), "id", 20, "x").collect()}
        assert a == b and len(a) == 20

    def test_distinct_salts_distinct_samples(self, spark):
        df = spark.range(2000)
        a = {r["id"] for r in bottomk_sample(df, "id", 40, "s1").collect()}
        b = {r["id"] for r in bottomk_sample(df, "id", 40, "s2").collect()}
        assert a != b


class TestQuantileSketch:
    def test_dkw_certificate_holds(self, spark, sf001):
        """The estimated quantile's true rank must be within p ± eps_dkw —
        deterministic for this salt, so the bound is pinned forever."""
        ev = spark.read.parquet(f"{sf001}/events.parquet")
        row = quantile_sketch(ev, "value", ["event_id"], k=4096, salt="t").collect()[0]
        n = row["n_rows"]
        for p, est in [(0.5, row["p50_est"]), (0.95, row["p95_est"]), (0.99, row["p99_est"])]:
            true_rank = ev.filter(F.col("value") <= est).count() / n
            assert abs(true_rank - p) <= row["eps_dkw_r"] + 1e-12, (p, true_rank)

    def test_small_table_exact(self, spark):
        df = spark.createDataFrame([(float(v),) for v in range(1, 101)], "v double")
        row = quantile_sketch(df, "v", ["v"], k=1000, salt="t").collect()[0]
        # k >= n: the sample IS the table, estimates are exact percentiles
        assert row["k_used"] == 100 and row["n_rows"] == 100
        assert row["p50_est"] == pytest.approx(50.5)

    def test_rejects_bad_delta(self, spark):
        df = spark.range(10)
        with pytest.raises(ValueError):
            quantile_sketch(df, "id", ["id"], k=10, delta=0.0)


class TestKMV:
    def test_exact_regime_below_k(self, spark):
        df = spark.createDataFrame([(i % 37,) for i in range(5000)], "v int")
        row = kmv_distinct(df, "v", k=256, salt="t").collect()[0]
        assert row["k_used"] == 37 and row["n_distinct_est_r"] == 37.0

    def test_sketch_regime_relative_error(self, spark):
        true_n = 5000
        df = spark.range(true_n).select(F.col("id"))
        row = kmv_distinct(df, "id", k=256, salt="t").collect()[0]
        assert row["k_used"] == 256
        rel = abs(row["n_distinct_est_r"] - true_n) / true_n
        assert rel < 2.5 / (256 - 2) ** 0.5  # ~0.16 band, deterministic

    def test_duplicates_do_not_inflate(self, spark):
        base = spark.range(1000)
        dup = base.unionByName(base).unionByName(base)
        a = kmv_distinct(base, "id", k=128, salt="s").collect()[0]
        b = kmv_distinct(dup, "id", k=128, salt="s").collect()[0]
        assert a["n_distinct_est_r"] == b["n_distinct_est_r"]
