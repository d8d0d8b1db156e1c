"""Tests for grouped OLS (x63) and mutual information (x64)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.stats import (
    group_ols,
    mutual_information,
)


class TestGroupOLS:
    def test_exact_line_recovered(self, spark):
        rows = [("g", float(x), 3.0 * x + 7.0) for x in range(10)]
        df = spark.createDataFrame(rows, "grp string, x double, y double")
        r = group_ols(df, ["grp"], "x", "y").collect()[0]
        assert r["slope_r"] == pytest.approx(3.0)
        assert r["intercept_r"] == pytest.approx(7.0)
        assert r["r2_r"] == pytest.approx(1.0)

    def test_matches_numpy_polyfit(self, spark):
        import numpy as np

        xs = [float(i % 24) for i in range(200)]
        ys = [0.5 * x - 2.0 + ((i * 37) % 11 - 5) * 0.3 for i, x in enumerate(xs)]
        df = spark.createDataFrame(
            [("g", x, y) for x, y in zip(xs, ys)], "grp string, x double, y double"
        )
        r = group_ols(df, ["grp"], "x", "y").collect()[0]
        slope, intercept = np.polyfit(xs, ys, 1)
        assert r["slope_r"] == pytest.approx(slope, abs=1e-6)
        assert r["intercept_r"] == pytest.approx(intercept, abs=1e-6)

    def test_zero_x_variance_null_fit(self, spark):
        df = spark.createDataFrame(
            [("g", 5.0, 1.0), ("g", 5.0, 2.0)], "grp string, x double, y double"
        )
        r = group_ols(df, ["grp"], "x", "y").collect()[0]
        assert r["slope_r"] is None and r["intercept_r"] is None and r["r2_r"] is None

    def test_zero_y_variance(self, spark):
        df = spark.createDataFrame(
            [("g", 1.0, 4.0), ("g", 2.0, 4.0), ("g", 3.0, 4.0)],
            "grp string, x double, y double",
        )
        r = group_ols(df, ["grp"], "x", "y").collect()[0]
        assert r["slope_r"] == pytest.approx(0.0) and r["r2_r"] is None


class TestMutualInformation:
    def test_independent_columns_zero_mi(self, spark):
        rows = [(a, b) for a in "xy" for b in "uv" for _ in range(25)]
        df = spark.createDataFrame(rows, "a string, b string")
        r = mutual_information(df, "a", "b").collect()[0]
        assert r["mi_r"] == pytest.approx(0.0, abs=1e-9)
        assert r["h_a_r"] == pytest.approx(math.log(2))
        assert r["h_b_r"] == pytest.approx(math.log(2))

    def test_deterministic_mapping_mi_equals_entropy(self, spark):
        rows = [("x", "u")] * 30 + [("y", "v")] * 70
        df = spark.createDataFrame(rows, "a string, b string")
        r = mutual_information(df, "a", "b").collect()[0]
        h = -(0.3 * math.log(0.3) + 0.7 * math.log(0.7))
        assert r["mi_r"] == pytest.approx(h, abs=1e-9)
        assert r["h_a_r"] == pytest.approx(h) and r["h_b_r"] == pytest.approx(h)

    def test_matches_direct_formula(self, spark):
        rows = [("x", "u")] * 10 + [("x", "v")] * 20 + [("y", "u")] * 30 + [("y", "v")] * 40
        df = spark.createDataFrame(rows, "a string, b string")
        r = mutual_information(df, "a", "b").collect()[0]
        n = 100
        joint = {("x", "u"): 10, ("x", "v"): 20, ("y", "u"): 30, ("y", "v"): 40}
        ca = {"x": 30, "y": 70}
        cb = {"u": 40, "v": 60}
        mi = sum(
            (c / n) * math.log(c * n / (ca[a] * cb[b])) for (a, b), c in joint.items()
        )
        assert r["mi_r"] == pytest.approx(mi, abs=1e-9)
        assert r["n"] == 100 and r["n_cells"] == 4

    def test_nulls_are_listwise_deleted(self, spark):
        # r10 fuzz finding: NULL is missing data, not a category — Spark
        # kept it as a level while the SQL twin's COUNT(DISTINCT)/joins
        # dropped it, so the release was engine-dependent off-fixture.
        # Convention now matches correlation_matrix: listwise deletion.
        rows = [("x", None)] * 5 + [("y", "v")] * 5 + [("x", "u")] * 5
        df = spark.createDataFrame(rows, "a string, b string")
        r = mutual_information(df, "a", "b").collect()[0]
        assert r["n_cells"] == 2  # (x,u) and (y,v); the NULL rows are out
        assert r["n"] == 10
        assert r["mi_r"] == pytest.approx(math.log(2))  # a determines b


class TestChiSquared:
    def test_matches_scipy_contingency(self, spark):
        from dbms_data_anonymity_differential_privacy_spark.operators.stats import chi_squared

        rows = [("x", "u")] * 10 + [("x", "v")] * 20 + [("y", "u")] * 30 + [("y", "v")] * 15
        df = spark.createDataFrame(rows, "a string, b string")
        r = chi_squared(df, "a", "b").collect()[0]
        try:
            from scipy.stats import chi2_contingency

            stat, _, dof, _ = chi2_contingency([[10, 20], [30, 15]], correction=False)
            assert r["chi2_r"] == pytest.approx(stat, abs=1e-9)
            assert r["dof"] == dof
        except ImportError:
            # hand formula fallback
            assert r["dof"] == 1 and r["chi2_r"] > 0

    def test_independent_is_zero(self, spark):
        from dbms_data_anonymity_differential_privacy_spark.operators.stats import chi_squared

        rows = [(a, b) for a in "xy" for b in "uv" for _ in range(25)]
        df = spark.createDataFrame(rows, "a string, b string")
        r = chi_squared(df, "a", "b").collect()[0]
        assert r["chi2_r"] == pytest.approx(0.0)
        assert r["n"] == 100


class TestTransitionMatrix:
    def test_counts_and_probs(self, spark):
        import datetime as dt

        from dbms_data_anonymity_differential_privacy_spark.operators.stats import (
            transition_matrix,
        )

        t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
        rows = [
            (1, t(0), 7, "a", 0.0, ""),
            (2, t(1), 7, "b", 0.0, ""),
            (3, t(2), 7, "a", 0.0, ""),
            (4, t(3), 7, "b", 0.0, ""),
            (5, t(0), 8, "a", 0.0, ""),
            (6, t(1), 8, "a", 0.0, ""),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )
        out = {(r["from_type"], r["to_type"]): (r["cnt"], r["p_r"]) for r in
               transition_matrix(df).collect()}
        assert out[("a", "b")] == (2, pytest.approx(2 / 3))
        assert out[("a", "a")] == (1, pytest.approx(1 / 3))
        assert out[("b", "a")] == (1, pytest.approx(1.0))
        # no cross-user transition (user 7 last event -> user 8 first event)
        assert ("b", "b") not in out

    def test_row_stochastic(self, spark, sf001):
        from dbms_data_anonymity_differential_privacy_spark.operators.stats import (
            transition_matrix,
        )

        ev = spark.read.parquet(f"{sf001}/events.parquet")
        out = transition_matrix(ev)
        sums = out.groupBy("from_type").agg(F.sum("p_r").alias("s")).collect()
        for r in sums:
            assert r["s"] == pytest.approx(1.0, abs=1e-6)


class TestKaplanMeier:
    def mk_durations(self, spark, rows):
        return spark.createDataFrame(rows, "duration long, event int")

    def test_textbook_example(self, spark):
        from dbms_data_anonymity_differential_privacy_spark.operators.stats import kaplan_meier

        # classic KM worked example: deaths at 1 (n=5), 3 (n=3);
        # censored at 2 and 4; death at 5 (n=1)
        rows = [(1, 1), (2, 0), (3, 1), (4, 0), (5, 1)]
        out = {r["t"]: r for r in kaplan_meier(self.mk_durations(spark, rows)).collect()}
        assert sorted(out) == [1, 3, 5]
        assert out[1]["n_risk"] == 5
        assert out[1]["survival_r"] == pytest.approx(4 / 5)
        assert out[3]["n_risk"] == 3
        assert out[3]["survival_r"] == pytest.approx(4 / 5 * 2 / 3)
        assert out[5]["n_risk"] == 1
        assert out[5]["survival_r"] == 0.0  # last subject dies -> curve hits 0

    def test_matches_lifelines_formula(self, spark):
        from dbms_data_anonymity_differential_privacy_spark.operators.stats import kaplan_meier

        rows = [((i * 13) % 50 + 1, 1 if i % 3 else 0) for i in range(200)]
        out = kaplan_meier(self.mk_durations(spark, rows)).collect()
        # brute-force reference
        from collections import Counter

        deaths = Counter(t for t, e in rows if e == 1)
        times = sorted({t for t, _ in rows})
        at_risk, s, ref = len(rows), 1.0, {}
        for t in times:
            d = deaths.get(t, 0)
            if d:
                s *= 1 - d / at_risk
                ref[t] = (at_risk, d, s)
            at_risk -= sum(1 for tt, _ in rows if tt == t)
        for r in out:
            n, d, sv = ref[r["t"]]
            assert (r["n_risk"], r["d_events"]) == (n, d)
            assert r["survival_r"] == pytest.approx(sv, abs=1e-9)

    def test_monotone_nonincreasing(self, spark, sf001):
        from dbms_data_anonymity_differential_privacy_spark.operators.stats import (
            kaplan_meier,
            time_to_event,
        )

        ev = spark.read.parquet(f"{sf001}/events.parquet")
        out = kaplan_meier(time_to_event(ev, "purchase")).collect()
        sv = [r["survival_r"] for r in out]
        assert sv == sorted(sv, reverse=True)
        assert all(0.0 <= v <= 1.0 for v in sv)

    def test_time_to_event_censoring(self, spark):
        import datetime as dt

        from dbms_data_anonymity_differential_privacy_spark.operators.stats import time_to_event

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, t0, 7, "view", 0.0, ""),
            (2, t0 + dt.timedelta(seconds=30), 7, "purchase", 0.0, ""),
            (3, t0, 8, "view", 0.0, ""),
            (4, t0 + dt.timedelta(seconds=99), 8, "click", 0.0, ""),  # never converts
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        )
        out = {r["user_id"]: r for r in time_to_event(df, "purchase").collect()}
        assert (out[7]["duration"], out[7]["event"]) == (30, 1)
        assert (out[8]["duration"], out[8]["event"]) == (99, 0)


class TestMannWhitney:
    def test_matches_scipy(self, spark):
        from dbms_data_anonymity_differential_privacy_spark.operators.stats import mann_whitney_u

        a_vals = [1.0, 2.0, 3.0, 3.0, 5.0, 8.0, 9.0]
        b_vals = [2.0, 4.0, 4.0, 6.0, 7.0]
        rows = [(v, "a") for v in a_vals] + [(v, "b") for v in b_vals]
        df = spark.createDataFrame(rows, "v double, g string")
        r = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
        try:
            from scipy.stats import mannwhitneyu

            res = mannwhitneyu(a_vals, b_vals, alternative="two-sided", method="asymptotic")
            assert r["u_a_r"] == pytest.approx(res.statistic)
        except ImportError:
            pass
        # hand check: U_a + U_b = n_a * n_b
        rows_b = [(v, "b") for v in a_vals] + [(v, "a") for v in b_vals]
        df_b = spark.createDataFrame(rows_b, "v double, g string")
        r_b = mann_whitney_u(df_b, "v", "g", "a", "b").collect()[0]
        assert r["u_a_r"] + r_b["u_a_r"] == pytest.approx(len(a_vals) * len(b_vals))
        assert r["z_r"] == pytest.approx(-r_b["z_r"], abs=1e-9)

    def test_identical_distributions_centered(self, spark):
        from dbms_data_anonymity_differential_privacy_spark.operators.stats import mann_whitney_u

        rows = [(float(v % 20), g) for v in range(400) for g in ("a", "b")]
        df = spark.createDataFrame(rows, "v double, g string")
        r = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
        assert r["u_a_r"] == pytest.approx(r["n_a"] * r["n_b"] / 2)
        assert r["z_r"] == pytest.approx(0.0, abs=1e-9)

    def test_dominant_group_positive_z(self, spark):
        from dbms_data_anonymity_differential_privacy_spark.operators.stats import mann_whitney_u

        rows = [(float(v) + 100.0, "a") for v in range(50)] + [
            (float(v), "b") for v in range(50)
        ]
        df = spark.createDataFrame(rows, "v double, g string")
        r = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
        assert r["u_a_r"] == 2500.0  # complete separation: every pair a > b
        assert r["z_r"] > 5.0


class TestRollingAnomaly:
    def mk(self, spark, counts, typ="a"):
        import datetime

        rows = []
        eid = 0
        for h, n in enumerate(counts):
            base = datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=h)
            for i in range(n):
                rows.append((eid, base + datetime.timedelta(seconds=i), typ))
                eid += 1
        return spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")

    def test_spike_flagged_and_warmup_silent(self, spark):
        from dbms_data_anonymity_differential_privacy_spark.operators.stats import rolling_anomaly

        # 24 calm hours (alternating 2/4: nonzero variance), then a spike
        counts = [2, 4] * 12 + [20]
        ev = self.mk(spark, counts)
        out = rolling_anomaly(ev, ["event_type"], window=24, z_threshold=3.0).collect()
        # only the spike bucket has a full trailing window
        assert len(out) == 1
        r = out[0]
        assert r.n == 20 and r.is_anomaly
        assert abs(r.mean_r - 3.0) < 1e-9
        # z = (20 - 3) / sqrt((24*240 - 72^2)/(24*23)) = 17/sqrt(1.04347...)
        import math

        var = (24 * 240 - 72 * 72) / (24 * 23)
        assert abs(r.z_r - (20 - 3.0) / math.sqrt(var)) < 1e-8

    def test_constant_series_null_z(self, spark):
        from dbms_data_anonymity_differential_privacy_spark.operators.stats import rolling_anomaly

        ev = self.mk(spark, [3] * 26)
        out = rolling_anomaly(ev, ["event_type"], window=24).collect()
        assert len(out) == 2
        assert all(r.z_r is None and r.is_anomaly is None for r in out)


class TestCusum:
    def test_closed_form_equals_recursion_and_single_crossing(self, spark):
        import datetime

        from dbms_data_anonymity_differential_privacy_spark.operators.stats import cusum_changepoints

        counts = [3] * 20 + [6] * 20  # level shift +3 at hour 20
        rows = []
        eid = 0
        for h, n in enumerate(counts):
            base = datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=h)
            for i in range(n):
                rows.append((eid, base + datetime.timedelta(seconds=i), "a"))
                eid += 1
        ev = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
        out = sorted(
            cusum_changepoints(ev, ["event_type"], drift=3, threshold=15.0).collect(),
            key=lambda r: r.bucket_start,
        )
        # reference recursion S_t = max(0, S_{t-1} + (x - k))
        sp = sn = 0
        for r, n in zip(out, counts):
            sp = max(0, sp + (n - 3))
            sn = max(0, sn + (3 - n))
            assert (r.s_pos, r.s_neg) == (sp, sn), r
        crossings = [r for r in out if r.is_change]
        assert len(crossings) == 1  # alarm once, at the crossing bucket
        assert crossings[0].s_pos >= 15


def test_copurchase_lift_crafted(spark):
    """X102: hand-computed lift on 4 baskets; duplicate (basket, item)
    rows collapse before pairing."""
    from dbms_data_anonymity_differential_privacy_spark.operators.stats import copurchase_lift

    rows = [
        (1, "x"), (1, "y"), (1, "y"),   # dup (1,y) must not double-count
        (2, "x"), (2, "y"),
        (3, "x"),
        (4, "z"),
    ]
    df = spark.createDataFrame(rows, "b long, i string")
    out = {(r.item_a, r.item_b): r for r in
           copurchase_lift(df, "b", "i", top_k=10).collect()}
    assert set(out) == {("x", "y")}
    r = out[("x", "y")]
    # c_xy=2, N=4, c_x=3, c_y=2 -> lift = 2*4/(3*2) = 1.333333
    assert r.pair_count == 2
    assert r.lift_r == round(2 * 4 / (3 * 2), 6)


def test_copurchase_mega_basket_cap(spark):
    """max_basket_size drops the catch-all basket before the quadratic
    pair stage; remaining counts exclude it entirely."""
    from dbms_data_anonymity_differential_privacy_spark.operators.stats import copurchase_lift

    rows = [(1, "a"), (1, "b")] + [(9, f"i{j}") for j in range(20)] + [(9, "a"), (9, "b")]
    df = spark.createDataFrame(rows, "b long, i string")
    out = copurchase_lift(df, "b", "i", top_k=100, max_basket_size=5).collect()
    assert {(r.item_a, r.item_b) for r in out} == {("a", "b")}
    r = out[0]
    assert r.pair_count == 1  # basket 9 dropped
    # N counts only surviving baskets: 1 -> lift = 1*1/(1*1) = 1
    assert r.lift_r == 1.0


def test_ewma_smooth_crafted(spark):
    """X104: hand-computed truncated EWMA over a 3-bucket series, head
    renormalization included."""
    import datetime as dt

    from dbms_data_anonymity_differential_privacy_spark.operators.stats import ewma_smooth

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = (
        [("a", t0)] * 2                                   # bucket 0: n=2
        + [("a", t0 + dt.timedelta(hours=1))] * 6         # bucket 1: n=6
        + [("a", t0 + dt.timedelta(hours=2))] * 4         # bucket 2: n=4
    )
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = sorted(
        ewma_smooth(df, ["event_type"], alpha=0.5, window=3).collect(),
        key=lambda r: r.bucket_start,
    )
    a = 0.5
    w = [a, a * (1 - a), a * (1 - a) ** 2]  # age 0, 1, 2
    # head: single term renormalizes to the value itself
    assert out[0].ewma_r == round((2 * w[0]) / w[0], 6) == 2.0
    assert out[1].ewma_r == round((6 * w[0] + 2 * w[1]) / (w[0] + w[1]), 6)
    assert out[2].ewma_r == round(
        (4 * w[0] + 6 * w[1] + 2 * w[2]) / (w[0] + w[1] + w[2]), 6
    )


def test_ewma_smooth_validation(spark):
    import pytest

    from dbms_data_anonymity_differential_privacy_spark.operators.stats import ewma_smooth

    df = spark.createDataFrame([("a",)], "event_type string").withColumn(
        "ts", F.current_timestamp()
    )
    with pytest.raises(ValueError):
        ewma_smooth(df, ["event_type"], alpha=1.0)
    with pytest.raises(ValueError):
        ewma_smooth(df, ["event_type"], window=0)


def test_ks_statistic_scipy_parity(spark):
    """X108 vs scipy.stats.ks_2samp on arbitrary samples (scipy as the
    independent test-side oracle, the x71/x80 convention)."""
    import random

    import pytest

    scipy_stats = pytest.importorskip("scipy.stats")
    random.seed(19)
    a = [round(random.gauss(0, 1), 3) for _ in range(200)]
    b = [round(random.gauss(0.4, 1.3), 3) for _ in range(150)]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, value double")

    from dbms_data_anonymity_differential_privacy_spark.operators.stats import ks_statistic

    r = ks_statistic(df, "value", "g", "a", "b").collect()[0]
    expected = scipy_stats.ks_2samp(a, b).statistic
    assert r.n_a == 200 and r.n_b == 150
    assert abs(r.ks_r - expected) < 1e-9


def test_ks_statistic_identical_and_disjoint(spark):
    from dbms_data_anonymity_differential_privacy_spark.operators.stats import ks_statistic

    same = [("a", float(v)) for v in range(10)] + [("b", float(v)) for v in range(10)]
    df = spark.createDataFrame(same, "g string, value double")
    assert ks_statistic(df, "value", "g", "a", "b").collect()[0].ks_r == 0.0
    disj = [("a", float(v)) for v in range(10)] + [("b", float(v + 100)) for v in range(10)]
    df2 = spark.createDataFrame(disj, "g string, value double")
    assert ks_statistic(df2, "value", "g", "a", "b").collect()[0].ks_r == 1.0


def test_spearman_crafted_and_properties(spark):
    """X109: monotone transform invariance (rho == 1 for any increasing
    map), sign flip on reversal, tie handling vs pandas."""
    from dbms_data_anonymity_differential_privacy_spark.operators.stats import spearman_corr

    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    mono = [(x, x ** 3) for x in xs]            # increasing, nonlinear
    df = spark.createDataFrame(mono, "x double, y double")
    assert spearman_corr(df, "x", "y").collect()[0].rho_r == 1.0
    rev = [(x, -x) for x in xs]
    df2 = spark.createDataFrame(rev, "x double, y double")
    assert spearman_corr(df2, "x", "y").collect()[0].rho_r == -1.0
    # ties: pure-Python average-rank Pearson as independent oracle
    # (pandas' spearman delegates to scipy, absent from this container)
    data = [(1.0, 2.0), (1.0, 3.0), (2.0, 2.0), (3.0, 5.0), (3.0, 1.0), (4.0, 4.0)]
    df3 = spark.createDataFrame(data, "x double, y double")
    got = spearman_corr(df3, "x", "y").collect()[0]

    def avg_ranks(vals):
        order = sorted(vals)
        return [
            (order.index(v) + 1 + order.index(v) + order.count(v)) / 2 for v in vals
        ]

    rx = avg_ranks([d[0] for d in data])
    ry = avg_ranks([d[1] for d in data])
    n = len(data)
    mx, my = sum(rx) / n, sum(ry) / n
    cov = sum(a * b for a, b in zip(rx, ry)) / n - mx * my
    vx = sum(a * a for a in rx) / n - mx * mx
    vy = sum(b * b for b in ry) / n - my * my
    expected = cov / (vx * vy) ** 0.5
    assert got.n == 6
    assert abs(got.rho_r - expected) < 1e-9


def test_spearman_constant_margin_null(spark):
    from dbms_data_anonymity_differential_privacy_spark.operators.stats import spearman_corr

    df = spark.createDataFrame([(1.0, 1.0), (2.0, 1.0)], "x double, y double")
    assert spearman_corr(df, "x", "y").collect()[0].rho_r is None


def test_anova_crafted_and_identical_groups(spark):
    """X110 vs the hand-computed textbook decomposition; F near 0 when
    group means coincide."""
    from dbms_data_anonymity_differential_privacy_spark.operators.stats import anova_oneway

    rows = (
        [("a", v) for v in (1.0, 2.0, 3.0)]
        + [("b", v) for v in (4.0, 5.0, 6.0)]
        + [("c", v) for v in (7.0, 8.0, 9.0)]
    )
    df = spark.createDataFrame(rows, "g string, value double")
    r = anova_oneway(df, "value", "g").collect()[0]
    # group means 2,5,8; grand 5; SSB = 3*(9+0+9)=54; SSW = 3 groups * 2
    assert r.n == 9 and r.k == 3
    assert r.ssb_r == 54.0 and r.ssw_r == 6.0
    assert r.f_r == round((54 / 2) / (6 / 6), 6) == 27.0
    same = [("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)]
    r2 = anova_oneway(spark.createDataFrame(same, "g string, value double"), "value", "g").collect()[0]
    assert r2.f_r == 0.0


def test_gini_crafted_extremes(spark):
    """X111: even mass -> 0; fully concentrated -> (n-1)/n; hand value."""
    from dbms_data_anonymity_differential_privacy_spark.operators.stats import gini_concentration

    even = [(k, 10.0) for k in range(5)]
    df = spark.createDataFrame(even, "k long, v double")
    assert gini_concentration(df, "k", "v").collect()[0].gini_r == 0.0
    conc = [(0, 100.0)] + [(k, 0.0) for k in range(1, 5)]
    df2 = spark.createDataFrame(conc, "k long, v double")
    r = gini_concentration(df2, "k", "v").collect()[0]
    assert r.gini_r == round((5 - 1) / 5, 9)
    # duplicate key rows collapse into per-key totals first
    dup = [(1, 5.0), (1, 5.0), (2, 10.0)]
    r2 = gini_concentration(spark.createDataFrame(dup, "k long, v double"), "k", "v").collect()[0]
    assert r2.n_keys == 2 and r2.gini_r == 0.0


def test_path_trigrams_crafted(spark):
    """X123: exact trigram counts on a hand-built flow; sequences never
    cross users; equal-ts ties ordered by event_id."""
    import datetime as dt

    from dbms_data_anonymity_differential_privacy_spark.operators.stats import path_trigrams

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1: a b c b c  -> trigrams abc, bcb, cbc
        (1, 7, t(0), "a"), (2, 7, t(1), "b"), (3, 7, t(2), "c"),
        (4, 7, t(3), "b"), (5, 7, t(4), "c"),
        # u2: a b c -> abc again
        (6, 8, t(0), "a"), (7, 8, t(1), "b"), (8, 8, t(2), "c"),
        # u3: only 2 events -> no trigram, and must NOT chain into u2
        (9, 9, t(3), "x"), (10, 9, t(4), "y"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
    out = {(r.t1, r.t2, r.t3): r.cnt for r in path_trigrams(df, k=10).collect()}
    assert out == {("a", "b", "c"): 2, ("b", "c", "b"): 1, ("c", "b", "c"): 1}
