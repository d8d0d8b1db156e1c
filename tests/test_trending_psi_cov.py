"""Tests for grouped top-k (x66), PSI drift (x67), DP covariance (x68)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.dp import dp_covariance
from dbms_data_anonymity_differential_privacy_spark.operators.stats import (
    psi_drift,
    psi_drift_bins,
    top_k_per_group,
)


class TestTopKPerGroup:
    def test_ranks_and_ties(self, spark):
        rows = [("g", "a")] * 3 + [("g", "b")] * 3 + [("g", "c")] * 1 + [("h", "z")] * 2
        df = spark.createDataFrame(rows, "grp string, k string")
        out = {(r["grp"], r["rank"]): (r["k"], r["cnt"]) for r in
               top_k_per_group(df, ["grp"], ["k"], k=2).collect()}
        assert out[("g", 1)] == ("a", 3)  # tie with b broken by key asc
        assert out[("g", 2)] == ("b", 3)
        assert out[("h", 1)] == ("z", 2)
        assert ("g", 3) not in out

    def test_partial_window_limit_plan(self, spark, sf001):
        import re

        ev = spark.read.parquet(f"{sf001}/events.parquet").withColumn(
            "h", F.date_trunc("hour", "ts")
        )
        df = top_k_per_group(ev, ["h"], ["event_type"], k=3)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert re.search(r"WindowGroupLimit.*Partial", plan)


class TestPSI:
    def test_identical_distributions_zero(self, spark):
        df = spark.createDataFrame([(float(v % 50),) for v in range(500)], "value double")
        r = psi_drift(df, df, "value", n_bins=10, lower=0.0, upper=50.0).collect()[0]
        assert r["psi_r"] == pytest.approx(0.0)

    def test_shift_detected(self, spark):
        old = spark.createDataFrame([(float(v % 50),) for v in range(500)], "value double")
        new = old.select((F.col("value") + 25.0).alias("value"))
        r = psi_drift(old, new, "value", n_bins=10, lower=0.0, upper=100.0).collect()[0]
        assert r["psi_r"] > 0.25  # "act" threshold: half the mass moved bins

    def test_bins_relation_consistent(self, spark):
        old = spark.createDataFrame([(float(v),) for v in range(100)], "value double")
        new = spark.createDataFrame([(float(v),) for v in range(50)], "value double")
        bins = psi_drift_bins(old, new, "value", n_bins=5, lower=0.0, upper=100.0).collect()
        assert len(bins) == 5
        assert sum(b["c_old"] for b in bins) == 100
        assert sum(b["c_new"] for b in bins) == 50

    def test_requires_public_bounds(self, spark):
        df = spark.createDataFrame([(1.0,)], "value double")
        with pytest.raises(ValueError, match="public bounds"):
            psi_drift(df, df, "value")


class TestDPCovariance:
    def mk(self, spark):
        rows = [("g", float(x), float(2 * x + 1)) for x in range(100)]
        return spark.createDataFrame(rows, "grp string, x double, y double")

    def test_exact_core(self, spark):
        df = self.mk(spark)
        r = dp_covariance(
            df, ["grp"], "x", "y", epsilon=1.0, x_bounds=(0.0, 100.0),
            y_bounds=(0.0, 200.0), release="t",
        ).collect()[0]
        # cov(x, 2x+1) = 2 * var(x); var(0..99 population) = (100^2-1)/12
        assert r["cov_exact_r"] == pytest.approx(2 * (100**2 - 1) / 12, rel=1e-9)

    def test_epsilon_inf_recovers_exact(self, spark):
        df = self.mk(spark)
        r = dp_covariance(
            df, ["grp"], "x", "y", epsilon=1e9, x_bounds=(0.0, 100.0),
            y_bounds=(0.0, 200.0), release="t",
        ).collect()[0]
        assert r["cov_dp"] == pytest.approx(r["cov_exact_r"], abs=1e-3)

    def test_deterministic_and_release_unique(self, spark):
        df = self.mk(spark)
        kw = dict(epsilon=1.0, x_bounds=(0.0, 100.0), y_bounds=(0.0, 200.0))
        a = dp_covariance(df, ["grp"], "x", "y", release="r1", **kw).collect()[0]
        b = dp_covariance(df.repartition(7), ["grp"], "x", "y", release="r1", **kw).collect()[0]
        c = dp_covariance(df, ["grp"], "x", "y", release="r2", **kw).collect()[0]
        assert a["cov_dp"] == b["cov_dp"]
        assert a["cov_dp"] != c["cov_dp"]

    def test_requires_release_or_budget(self, spark):
        df = self.mk(spark)
        with pytest.raises(ValueError, match="noise uniqueness"):
            dp_covariance(df, ["grp"], "x", "y", epsilon=1.0,
                          x_bounds=(0.0, 1.0), y_bounds=(0.0, 1.0))


class TestCorrelationMatrix:
    def test_matches_pandas_corr(self, spark, sf001):
        import pandas as pd

        from dbms_data_anonymity_differential_privacy_spark.operators.stats import correlation_matrix

        li = spark.read.parquet(f"{sf001}/lineitem.parquet")
        cols = ["l_quantity", "l_extendedprice", "l_discount"]
        got = {(r["col_a"], r["col_b"]): r["corr_r"]
               for r in correlation_matrix(li, cols).collect()}
        pdf = li.select(*cols).toPandas()
        ref = pdf.corr()
        for (a, b), v in got.items():
            assert v == pytest.approx(ref.loc[a, b], abs=1e-9)

    def test_perfect_and_anti_correlation(self, spark):
        from dbms_data_anonymity_differential_privacy_spark.operators.stats import correlation_matrix

        rows = [(float(i), 2.0 * i + 3.0, -1.0 * i) for i in range(50)]
        df = spark.createDataFrame(rows, "a double, b double, c double")
        got = {(r["col_a"], r["col_b"]): r["corr_r"]
               for r in correlation_matrix(df, ["a", "b", "c"]).collect()}
        assert got[("a", "b")] == pytest.approx(1.0)
        assert got[("a", "c")] == pytest.approx(-1.0)

    def test_constant_column_null(self, spark):
        from dbms_data_anonymity_differential_privacy_spark.operators.stats import correlation_matrix

        df = spark.createDataFrame([(float(i), 5.0) for i in range(10)], "a double, b double")
        r = correlation_matrix(df, ["a", "b"]).collect()[0]
        assert r["corr_r"] is None

    def test_single_scan_plan(self, spark, sf001):
        import re

        from dbms_data_anonymity_differential_privacy_spark.operators.stats import correlation_matrix

        li = spark.read.parquet(f"{sf001}/lineitem.parquet")
        df = correlation_matrix(li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"])
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert len(re.findall(r"Scan parquet|FileScan parquet", plan)) == 1


class TestABTest:
    def test_split_covers_all_users_once(self, spark, sf001):
        from dbms_data_anonymity_differential_privacy_spark.operators.stats import (
            ab_test_proportions,
        )

        ev = spark.read.parquet(f"{sf001}/events.parquet")
        r = ab_test_proportions(ev).collect()[0]
        assert r["n_a"] + r["n_b"] == ev.select("user_id").distinct().count()
        assert r["conv_a"] <= r["n_a"] and r["conv_b"] <= r["n_b"]

    def test_known_rates_and_z(self, spark):
        import math

        from dbms_data_anonymity_differential_privacy_spark.operators.stats import (
            ab_test_proportions,
        )

        # enough users that both variants are populated; conversion is a
        # deterministic function of user id, so rates are computable
        rows = [(u, "purchase" if u % 4 == 0 else "view") for u in range(400)]
        df = spark.createDataFrame(rows, "user_id long, event_type string")
        r = ab_test_proportions(df, salt="t").collect()[0]
        pa, pb = r["conv_a"] / r["n_a"], r["conv_b"] / r["n_b"]
        assert r["rate_a_r"] == pytest.approx(pa)
        pool = (r["conv_a"] + r["conv_b"]) / (r["n_a"] + r["n_b"])
        se = math.sqrt(pool * (1 - pool) * (1 / r["n_a"] + 1 / r["n_b"]))
        assert r["z_r"] == pytest.approx((pa - pb) / se, abs=1e-9)


class TestBenford:
    def test_exact_benford_sample_fits(self, spark):
        from dbms_data_anonymity_differential_privacy_spark.operators.stats import (
            BENFORD_P,
            benford_audit,
        )

        # counts proportional to Benford probabilities -> tiny chi2
        rows = [(float(d) * 10 ** (i % 3),) for d in range(1, 10)
                for i in range(int(round(BENFORD_P[d] * 1000)))]
        df = spark.createDataFrame(rows, "v double")
        out = benford_audit(df, "v").collect()
        assert len(out) == 9
        assert out[0]["chi2_r"] < 1.0
        for r in out:
            assert abs(r["dev_r"]) < 0.01

    def test_uniform_digits_fail_benford(self, spark):
        from dbms_data_anonymity_differential_privacy_spark.operators.stats import benford_audit

        rows = [(float(d) + 0.5,) for d in range(1, 10) for _ in range(100)]
        df = spark.createDataFrame(rows, "v double")
        out = benford_audit(df, "v").collect()
        assert out[0]["chi2_r"] > 100.0  # wildly non-Benford

    def test_nonpositive_excluded(self, spark):
        from dbms_data_anonymity_differential_privacy_spark.operators.stats import benford_audit

        rows = [(1.0,), (-5.0,), (0.0,), (None,)]
        df = spark.createDataFrame(rows, "v double")
        out = benford_audit(df, "v").collect()
        assert sum(r["n_obs"] for r in out) == 1


class TestSeasonality:
    def test_uniform_profile_index_one(self, spark):
        import datetime as dt

        from dbms_data_anonymity_differential_privacy_spark.operators.stats import (
            seasonality_index,
        )

        rows = [(1, dt.datetime(2024, 1, 1, h), "a") for h in range(24) for _ in range(5)]
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
        out = seasonality_index(df, ["event_type"]).collect()
        assert len(out) == 24
        for r in out:
            assert r["index_r"] == pytest.approx(1.0)

    def test_spike_and_zero_fill(self, spark):
        import datetime as dt

        from dbms_data_anonymity_differential_privacy_spark.operators.stats import (
            seasonality_index,
        )

        rows = [(i, dt.datetime(2024, 1, 1, 12), "a") for i in range(10)]
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
        out = {r["slot"]: r for r in seasonality_index(df, ["event_type"]).collect()}
        assert len(out) == 24
        assert out[12]["index_r"] == pytest.approx(24.0)
        assert out[0]["index_r"] == 0.0 and out[0]["n"] == 0
