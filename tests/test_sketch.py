"""X49 — Misra–Gries heavy hitters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.sketch import heavy_hitters


@pytest.fixture(scope="module")
def zipf(spark):
    # deterministic skew: value v appears 2^(10-v) times, v in 0..10
    rows = [(v,) for v in range(11) for _ in range(2 ** (10 - v))]
    return spark.createDataFrame(rows, "v long").repartition(8)


def test_exact_regime_matches_value_counts(spark, sf001):
    ev = spark.read.parquet(f"{sf001}/events.parquet")
    got = {r["value"]: (r["est_count"], r["err_bound"]) for r in heavy_hitters(ev, "event_type", k=32).collect()}
    exact = {r["event_type"]: r["n"] for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert {v: c for v, (c, _) in got.items()} == exact
    assert all(e == 0 for _, e in got.values())


def test_sketch_bounds_hold(zipf):
    n = zipf.count()
    k = 4
    out = heavy_hitters(zipf, "v", k=k).collect()
    exact = {r["v"]: r["n"] for r in zipf.groupBy("v").agg(F.count("*").alias("n")).collect()}
    assert out, "skewed data must yield heavy hitters"
    err = out[0]["err_bound"]
    assert all(r["err_bound"] == err for r in out)
    got = {r["value"]: r["est_count"] for r in out}
    for v, est in got.items():
        assert est <= exact[v] <= est + err, (v, est, exact[v], err)
    # any value whose true count exceeds the certificate must be present
    for v, c in exact.items():
        if c > err:
            assert v in got, (v, c, err)


def test_err_bound_respects_mg_invariant(zipf):
    # per-partition decrement mass <= n_p/(k+1) -> global err <= n/(k+1)
    n = zipf.count()
    k = 4
    out = heavy_hitters(zipf, "v", k=k).collect()
    assert out[0]["err_bound"] <= n / (k + 1)


def test_at_most_k_rows_and_ordering(zipf):
    out = heavy_hitters(zipf, "v", k=3).collect()
    assert len(out) <= 3
    ests = [r["est_count"] for r in out]
    assert ests == sorted(ests, reverse=True)


def test_uniform_data_returns_nothing_confidently(spark):
    uni = spark.createDataFrame([(i % 500,) for i in range(5000)], "v long").repartition(8)
    out = heavy_hitters(uni, "v", k=4).collect()
    exact_max = 10  # every value appears exactly 10 times
    for r in out:
        # nothing may masquerade as frequent: est <= true count
        assert r["est_count"] <= exact_max


def test_k_validated(zipf):
    with pytest.raises(ValueError):
        heavy_hitters(zipf, "v", k=0)


def test_string_column_and_null_handling(spark):
    df = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 5 + [(None,)] * 20, "v string"
    ).repartition(4)
    out = {r["value"]: r["est_count"] for r in heavy_hitters(df, "v", k=8).collect()}
    # nulls are not counted as a value; 'a'/'b' exact (k >= cardinality)
    assert out == {"a": 50, "b": 5}
