"""Tests for the DP continual-observation counter (x56) and the
relational integrity checks (x57)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.dp import (
    PrivacyBudget,
    continual_counts_exact,
    dp_continual_counts,
    dp_range_counts,
)
from dbms_data_anonymity_differential_privacy_spark.operators.integrity import (
    key_uniqueness_check,
    referential_check,
)

T0 = 1704067200  # 2024-01-01 00:00:00 UTC


def mk_events(spark, hour_counts: dict[int, int]):
    rows = [
        (dt.datetime(2024, 1, 1) + dt.timedelta(hours=h, minutes=i % 60),)
        for h, n in hour_counts.items()
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "ts timestamp")


class TestContinual:
    def test_exact_tree_equals_running_sum(self, spark):
        counts = {0: 3, 2: 1, 5: 7, 6: 2}  # gaps at 1, 3, 4, 7
        df = mk_events(spark, counts)
        out = {r["bucket"]: r["prefix_exact"] for r in
               continual_counts_exact(df, "ts", T0, 8).collect()}
        run, expect = 0, {}
        for h in range(8):
            run += counts.get(h, 0)
            expect[h] = run
        assert out == expect

    def test_out_of_range_events_dropped(self, spark):
        df = mk_events(spark, {0: 2, 5: 4, 100: 9})  # 100 outside n_buckets=8
        out = continual_counts_exact(df, "ts", T0, 8).collect()
        assert max(r["prefix_exact"] for r in out) == 6

    def test_noisy_is_deterministic_and_replay_stable(self, spark):
        df = mk_events(spark, {h: (h * 3) % 5 for h in range(16)})
        a = dp_continual_counts(df, "ts", T0, 16, epsilon=1.0, release="r").collect()
        b = dp_continual_counts(
            df.repartition(5), "ts", T0, 16, epsilon=1.0, release="r"
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_distinct_releases_draw_distinct_noise(self, spark):
        df = mk_events(spark, {0: 5})
        a = dp_continual_counts(df, "ts", T0, 4, epsilon=1.0, release="r1").collect()
        b = dp_continual_counts(df, "ts", T0, 4, epsilon=1.0, release="r2").collect()
        assert sorted(map(tuple, a)) != sorted(map(tuple, b))

    def test_release_label_or_budget_required(self, spark):
        df = mk_events(spark, {0: 1})
        with pytest.raises(ValueError, match="noise uniqueness"):
            dp_continual_counts(df, "ts", T0, 4, epsilon=1.0)

    def test_budget_spends_once_for_all_releases(self, spark):
        df = mk_events(spark, {0: 2, 3: 1})
        budget = PrivacyBudget(total_epsilon=2.0)
        dp_continual_counts(df, "ts", T0, 8, epsilon=1.5, budget=budget)
        assert budget.spent == pytest.approx(1.5)
        assert len(budget.ledger) == 1  # whole tree = ONE charge, not T

    def test_epsilon_inf_recovers_exact(self, spark):
        counts = {h: (7 * h) % 4 for h in range(32)}
        df = mk_events(spark, counts)
        exact = {r["bucket"]: r["prefix_exact"] for r in
                 continual_counts_exact(df, "ts", T0, 32).collect()}
        noisy = {r["bucket"]: r["prefix_dp"] for r in
                 dp_continual_counts(df, "ts", T0, 32, epsilon=1e9, release="e").collect()}
        for b, v in exact.items():
            assert noisy[b] == pytest.approx(v, abs=1e-5)

    def test_error_within_polylog_band(self, spark):
        # deterministic hash noise: the bound below holds for THIS seed
        # forever. eps=1, T=64 -> L=7 levels, <=6 noisy nodes per prefix,
        # each Lap(7); a 20x-typical band is ample and regression-tight.
        counts = {h: 10 for h in range(64)}
        df = mk_events(spark, counts)
        exact = {r["bucket"]: r["prefix_exact"] for r in
                 continual_counts_exact(df, "ts", T0, 64).collect()}
        noisy = {r["bucket"]: r["prefix_dp"] for r in
                 dp_continual_counts(df, "ts", T0, 64, epsilon=1.0, seed=7,
                                     release="band").collect()}
        worst = max(abs(noisy[b] - exact[b]) for b in exact)
        assert worst < 400.0

    def test_every_public_bucket_released(self, spark):
        df = mk_events(spark, {3: 2})  # almost all buckets empty
        out = dp_continual_counts(df, "ts", T0, 24, epsilon=1.0, release="z")
        assert out.count() == 24


class TestIntegrity:
    def test_orphans_and_nulls(self, spark):
        child = spark.createDataFrame(
            [(1, "a"), (2, "b"), (9, "c"), (None, "d"), (9, "e")], "fk int, v string"
        )
        parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
        r = referential_check(child, parent, ["fk"], ["pk"]).collect()[0]
        assert (r["n_child"], r["n_null_fk"], r["n_orphans"]) == (5, 1, 2)
        assert r["orphan_rate_r"] == pytest.approx(0.4)

    def test_clean_fk_zero_orphans(self, spark, sf001):
        orders = spark.read.parquet(f"{sf001}/orders.parquet")
        cust = spark.read.parquet(f"{sf001}/customer.parquet")
        r = referential_check(orders, cust, ["o_custkey"], ["c_custkey"]).collect()[0]
        assert r["n_orphans"] == 0 and r["n_null_fk"] == 0

    def test_composite_key_null_exemption(self, spark):
        child = spark.createDataFrame([(1, None), (None, None)], "a int, b int")
        parent = spark.createDataFrame([(1, 1)], "a int, b int")
        r = referential_check(child, parent, ["a", "b"]).collect()[0]
        # any-NULL keys are exempt, so nothing reaches the orphan probe
        assert r["n_null_fk"] == 2 and r["n_orphans"] == 0

    def test_key_uniqueness_counts(self, spark):
        df = spark.createDataFrame(
            [(1, "x"), (1, "y"), (1, "z"), (2, "x"), (3, "x")], "k int, v string"
        )
        r = key_uniqueness_check(df, ["k"]).collect()[0]
        assert (r["n_rows"], r["n_keys"], r["n_dup_keys"], r["n_excess_rows"]) == (5, 3, 1, 2)

    def test_unique_key_clean_report(self, spark, sf001):
        orders = spark.read.parquet(f"{sf001}/orders.parquet")
        r = key_uniqueness_check(orders, ["o_orderkey"]).collect()[0]
        assert r["n_dup_keys"] == 0 and r["n_excess_rows"] == 0
        assert r["n_rows"] == r["n_keys"]


class TestRangeCounts:
    def test_exact_ranges_match_direct_counts(self, spark):
        counts = {h: (h * 5) % 7 for h in range(32)}
        df = mk_events(spark, counts)
        ranges = [(0, 7), (8, 31), (5, 5), (0, 31)]
        out = {r["range_id"]: r["range_exact"] for r in
               dp_range_counts(df, "ts", T0, 32, ranges, exact=True).collect()}
        for i, (lo, hi) in enumerate(ranges):
            assert out[i] == sum(counts.get(h, 0) for h in range(lo, hi + 1)), (lo, hi)

    def test_noisy_answers_are_consistent(self, spark):
        """Released range sums must TELESCOPE exactly — the tree property
        independent per-range noise can never have."""
        df = mk_events(spark, {h: 3 for h in range(16)})
        ranges = [(0, 7), (8, 15), (0, 15)]
        out = {r["range_id"]: r["range_dp"] for r in
               dp_range_counts(df, "ts", T0, 16, ranges, epsilon=1.0,
                               release="cons").collect()}
        assert out[0] + out[1] == pytest.approx(out[2], abs=1e-9)

    def test_shares_tree_with_prefix_stream(self, spark):
        """Same release label => the [0, m-1] range equals the prefix
        release at bucket m-1 bit-for-bit (one tree, one epsilon)."""
        df = mk_events(spark, {h: (h * 3) % 5 for h in range(16)})
        pref = {r["bucket"]: r["prefix_dp"] for r in
                dp_continual_counts(df, "ts", T0, 16, epsilon=1.0,
                                    release="shared").collect()}
        rng = dp_range_counts(df, "ts", T0, 16, [(0, 9)], epsilon=1.0,
                              release="shared").collect()[0]
        assert rng["range_dp"] == pref[9]

    def test_rejects_out_of_domain_range(self, spark):
        df = mk_events(spark, {0: 1})
        with pytest.raises(ValueError, match="outside"):
            dp_range_counts(df, "ts", T0, 8, [(0, 8)], release="z")


class TestExpectations:
    def test_all_rule_kinds(self, spark):
        from dbms_data_anonymity_differential_privacy_spark.operators.integrity import (
            expectation_report,
        )

        df = spark.createDataFrame(
            [
                (1, 5.0, "A", "ok-1"),
                (1, 50.0, "B", "ok-2"),     # dup id
                (None, -1.0, "Z", "bad"),   # null id, below range, bad set, bad regex
            ],
            "id int, v double, s string, t string",
        )
        rules = [
            ("not_null", "id"),
            ("unique", "id"),
            ("in_range", "v", 0.0, 10.0),
            ("in_set", "s", ["A", "B"]),
            ("matches", "t", "^ok-"),
        ]
        out = {r["rule_id"]: r for r in expectation_report(df, rules).collect()}
        assert (out[0]["n_violations"], bool(out[0]["passed"])) == (1, False)
        assert (out[1]["n_checked"], out[1]["n_violations"]) == (2, 1)  # NULLs exempt
        assert out[2]["n_violations"] == 2  # -1.0 below, 50.0 above
        assert out[3]["n_violations"] == 1
        assert out[4]["n_violations"] == 1

    def test_clean_table_all_pass(self, spark, sf001):
        from dbms_data_anonymity_differential_privacy_spark.operators.integrity import (
            expectation_report,
        )

        orders = spark.read.parquet(f"{sf001}/orders.parquet")
        out = expectation_report(
            orders, [("not_null", "o_custkey"), ("unique", "o_orderkey")]
        )
        assert out.filter(~F.col("passed")).count() == 0

    def test_one_scan_plan(self, spark, sf001):
        import re

        from dbms_data_anonymity_differential_privacy_spark.operators.integrity import (
            expectation_report,
        )

        orders = spark.read.parquet(f"{sf001}/orders.parquet")
        df = expectation_report(
            orders,
            [("not_null", "o_custkey"), ("in_range", "o_totalprice", 0.0, 1e6),
             ("in_set", "o_orderstatus", ["F", "O", "P"])],
        )
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert len(re.findall(r"Scan parquet|FileScan parquet", plan)) == 1

    def test_unknown_rule_rejected(self, spark):
        from dbms_data_anonymity_differential_privacy_spark.operators.integrity import (
            expectation_report,
        )

        df = spark.createDataFrame([(1,)], "id int")
        with pytest.raises(ValueError, match="unknown expectation"):
            expectation_report(df, [("bogus", "id")])


def test_dp_set_union_exact_budget_and_release(spark):
    """x89: the exact core matches a Python brute-force of cap+count+
    threshold; the noisy release is deterministic per seed, spends
    (eps, delta) on the budget, and releases only items that exist."""
    import hashlib

    from dbms_data_anonymity_differential_privacy_spark.operators.dp import (
        PrivacyBudget,
        dp_set_union,
        dp_set_union_exact,
    )

    rows = [(u, str(it)) for u in range(40) for it in range(u % 7 + 1)]
    df = spark.createDataFrame(rows, "user_id long, item string")

    eps, delta, mx = 2.0, 0.05, 2
    exact = {
        r.item: r.n_exact
        for r in dp_set_union_exact(df, "item", "user_id", eps, delta, mx).collect()
    }
    # Python brute force with the same md5 ranking
    import math
    from collections import Counter, defaultdict

    per_user = defaultdict(list)
    for u, it in set(rows):
        per_user[u].append(it)
    support = Counter()
    for u, items in per_user.items():
        ranked = sorted(items, key=lambda it: hashlib.md5(f"{u}|{it}".encode()).hexdigest())
        support.update(ranked[:mx])
    rho = mx + (mx / eps) * math.log(mx / (2 * delta))
    want = {it: n for it, n in support.items() if n >= rho}
    assert exact == want and exact  # non-trivial

    b = PrivacyBudget(total_epsilon=5.0, total_delta=0.1)
    rel1 = {
        (r.item, r.n_dp)
        for r in dp_set_union(
            df, "item", "user_id", eps, delta, mx, seed=7, budget=b, release="r1"
        ).collect()
    }
    assert abs(b.spent - eps) < 1e-12
    rel2 = {
        (r.item, r.n_dp)
        for r in dp_set_union(df, "item", "user_id", eps, delta, mx, seed=7, release="r1").collect()
    }
    assert rel1 == rel2  # deterministic per (seed, release)
    assert {it for it, _ in rel1} <= set(support)  # never hallucinates items
