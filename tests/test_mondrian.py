"""Mondrian k-anonymity invariants (operators/mondrian.py).

The k-guarantee must hold EXACTLY (cuts are accepted on exact side
counts, independent of median sketch accuracy), no row may be suppressed,
and every row's QI values must sit inside its leaf's released range —
the three properties that make the release a valid k-anonymous
generalization (LeFevre et al. 2006 §3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark import load_table
from dbms_data_anonymity_differential_privacy_spark.operators.mondrian import (
    PID,
    mondrian_anonymize,
    mondrian_assign,
    mondrian_leaf_bounds,
)

QI = ["c_acctbal", "c_nationkey"]
K = 25


def test_every_leaf_at_least_k(spark, sf001):
    c = load_table(spark, sf001, "customer")
    a = mondrian_assign(c, QI, K)
    sizes = a.groupBy(PID).count()
    r = sizes.agg(
        F.min("count").alias("mn"), F.sum("count").alias("tot"), F.count("*").alias("leaves")
    ).first()
    assert r.mn >= K
    assert r.tot == c.count()  # zero suppression
    assert r.leaves > 1  # it actually split


def test_rows_inside_leaf_ranges_and_qi_replaced(spark, sf001):
    c = load_table(spark, sf001, "customer")
    anon = mondrian_anonymize(c, QI, K, keep_pid=True)
    # QI columns replaced by lo/hi pairs; everything else intact
    for q in QI:
        assert q not in anon.columns
        assert f"{q}_lo" in anon.columns and f"{q}_hi" in anon.columns
    assert "c_name" in anon.columns
    # re-attach originals by key and check containment
    joined = anon.join(c.select("c_custkey", *QI), "c_custkey")
    bad = joined.where(
        (F.col("c_acctbal") < F.col("c_acctbal_lo"))
        | (F.col("c_acctbal") > F.col("c_acctbal_hi"))
        | (F.col("c_nationkey") < F.col("c_nationkey_lo"))
        | (F.col("c_nationkey") > F.col("c_nationkey_hi"))
    ).count()
    assert bad == 0
    assert joined.count() == c.count()


def test_exact_median_variant_matches_invariants_and_splits_finer(spark, sf0001):
    """Exact medians must satisfy the same k-floor; on a small relation
    the exact split is at least as balanced as the sketch split (leaf
    count can only match or beat a degenerate sketch run)."""
    c = load_table(spark, sf0001, "customer")
    a = mondrian_assign(c, QI, 10, median="exact")
    sizes = a.groupBy(PID).count()
    r = sizes.agg(F.min("count").alias("mn"), F.sum("count").alias("tot")).first()
    assert r.mn >= 10
    assert r.tot == c.count()


def test_unsplittable_input_is_single_leaf(spark):
    """n < 2k can never split: one leaf, everything in it."""
    df = spark.range(30).select(
        F.col("id").alias("v"), (F.col("id") % 3).alias("w")
    )
    a = mondrian_assign(df, ["v", "w"], 25)
    assert a.select(PID).distinct().count() == 1
    assert a.count() == 30


def test_leaf_bounds_relation_consistent_with_assign(spark, sf001):
    """mondrian_leaf_bounds is the aggregated view of the same exact run:
    leaf count, populations, and bounds must agree with mondrian_assign,
    every leaf >= k, populations sum to n, and bounds are disjoint-or-
    nested per the split tree (weak check: lo <= hi and cnt >= k)."""
    c = load_table(spark, sf001, "customer").select(
        "c_nationkey", F.round(F.col("c_acctbal") * 100, 0).alias("acct_cents")
    )
    k = 150
    bounds = mondrian_leaf_bounds(c, ["c_nationkey", "acct_cents"], k, median="exact")
    rows = bounds.collect()
    assert sum(r.cnt for r in rows) == c.count()
    assert all(r.cnt >= k for r in rows)
    assert all(r.c_nationkey_lo <= r.c_nationkey_hi for r in rows)
    assert all(r.acct_cents_lo <= r.acct_cents_hi for r in rows)
    # Same tree as mondrian_assign at the same settings.
    a = mondrian_assign(c, ["c_nationkey", "acct_cents"], k, median="exact")
    sizes = {r[PID]: r["count"] for r in a.groupBy(PID).count().collect()}
    assert {r.pid: r.cnt for r in rows} == sizes


def test_mondrian_beats_suppression_on_retention(spark, sf001):
    """The reason Mondrian exists: at the same k on the same QI, the
    suppression operator drops rows while Mondrian keeps all of them."""
    from dbms_data_anonymity_differential_privacy_spark import bin_equal_width, k_anonymize_suppress

    c = load_table(spark, sf001, "customer")
    b = bin_equal_width(c, "c_acctbal", 5, "acctbal_bin")
    kept = k_anonymize_suppress(b, ["c_nationkey", "c_mktsegment", "acctbal_bin"], K).count()
    mond = mondrian_anonymize(c, QI, K).count()
    n = c.count()
    assert mond == n
    assert kept < n  # suppression loses rows at this k/QI
