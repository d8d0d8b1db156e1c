"""Tests for OHLC bars (x61) and lag/rolling features (x62)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.temporal import (
    lag_features,
    ohlc_bars,
)


def ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


SCHEMA = "event_id long, ts timestamp, event_type string, value double"


class TestOHLC:
    def test_candle_values(self, spark):
        rows = [
            (1, ts(0), "a", 10.0),   # open
            (2, ts(10), "a", 50.0),  # high
            (3, ts(20), "a", 5.0),   # low
            (4, ts(30), "a", 20.0),  # close
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        r = ohlc_bars(df, ["event_type"]).collect()[0]
        assert (r["open"], r["high"], r["low"], r["close"], r["n"]) == (10.0, 50.0, 5.0, 20.0, 4)
        assert r["total_r"] == pytest.approx(85.0)

    def test_tie_broken_by_id(self, spark):
        t = ts(0)
        rows = [(2, t, "a", 7.0), (1, t, "a", 3.0), (9, t, "a", 5.0)]
        df = spark.createDataFrame(rows, SCHEMA)
        r = ohlc_bars(df, ["event_type"]).collect()[0]
        assert r["open"] == 3.0 and r["close"] == 5.0  # min/max event_id win

    def test_buckets_split_hours(self, spark):
        rows = [(1, ts(59), "a", 1.0), (2, dt.datetime(2024, 1, 1, 1, 0), "a", 2.0)]
        df = spark.createDataFrame(rows, SCHEMA)
        assert ohlc_bars(df, ["event_type"]).count() == 2

    def test_single_shuffle_plan(self, spark, sf001):
        import re

        ev = spark.read.parquet(f"{sf001}/events.parquet")
        df = ohlc_bars(ev, ["event_type"])
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


class TestLagFeatures:
    def test_sequence_features(self, spark):
        rows = [
            (1, ts(0), "u", 10.0),
            (2, ts(1, 30), "u", 13.0),
            (3, ts(3), "u", 7.0),
        ]
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id string, value double")
        out = {r["event_id"]: r for r in lag_features(df, ["user_id"]).collect()}
        assert out[1]["prev_value"] is None and out[1]["gap_seconds"] is None
        assert out[2]["prev_value"] == 10.0 and out[2]["delta_r"] == pytest.approx(3.0)
        assert out[2]["gap_seconds"] == 90
        assert out[3]["gap_seconds"] == 90
        assert out[3]["trail_mean_r"] == pytest.approx(10.0)  # (10+13+7)/3

    def test_partitions_isolated(self, spark):
        rows = [(1, ts(0), "a", 1.0), (2, ts(1), "b", 2.0)]
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id string, value double")
        out = lag_features(df, ["user_id"]).collect()
        assert all(r["prev_value"] is None for r in out)

    def test_row_count_preserved(self, spark, sf001):
        ev = spark.read.parquet(f"{sf001}/events.parquet")
        assert lag_features(ev, ["user_id"]).count() == ev.count()
