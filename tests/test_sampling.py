"""Deterministic sampling/split operators (operators/sampling.py).

Correctness here means *exact reproducibility*, not statistics: the same
row must land in the same split regardless of partitioning, run, or
engine. The registry twins (x10_*) prove engine-portability against
DuckDB; these tests pin the invariants the portability argument rests on.
"""

from __future__ import annotations

from dbms_data_anonymity_differential_privacy_spark import load_table
from dbms_data_anonymity_differential_privacy_spark.operators.sampling import (
    _threshold_hex,
    hash_sample,
    hash_split,
    stratified_sample_n,
)

import pytest
from pyspark.sql import functions as F


def test_threshold_hex_edges():
    assert _threshold_hex(0.0) == "00000000"
    assert _threshold_hex(1.0) == "g"  # 'g' sorts after every hex char
    assert _threshold_hex(0.5) == "80000000"


def test_hash_sample_fraction_and_determinism(spark, sf001):
    o = load_table(spark, sf001, "orders").select("o_orderkey")
    s1 = hash_sample(o, ["o_orderkey"], 0.2, salt="t")
    n, total = s1.count(), o.count()
    assert abs(n / total - 0.2) < 0.02
    # identical under a different physical layout
    n_repart = hash_sample(o.repartition(13), ["o_orderkey"], 0.2, salt="t").count()
    assert n_repart == n


def test_hash_sample_nested(spark, sf001):
    o = load_table(spark, sf001, "orders").select("o_orderkey")
    small = {r.o_orderkey for r in hash_sample(o, ["o_orderkey"], 0.05, salt="t").collect()}
    big = {r.o_orderkey for r in hash_sample(o, ["o_orderkey"], 0.2, salt="t").collect()}
    assert small <= big


def test_hash_sample_salts_independent(spark, sf001):
    o = load_table(spark, sf001, "orders").select("o_orderkey")
    a = {r.o_orderkey for r in hash_sample(o, ["o_orderkey"], 0.2, salt="a").collect()}
    b = {r.o_orderkey for r in hash_sample(o, ["o_orderkey"], 0.2, salt="b").collect()}
    assert a != b  # overwhelmingly likely for independent draws


def test_hash_sample_is_map_only(spark, sf001):
    o = load_table(spark, sf001, "orders").select("o_orderkey")
    plan = hash_sample(o, ["o_orderkey"], 0.1)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_hash_split_partitions_all_rows(spark, sf001):
    c = load_table(spark, sf001, "customer")
    tagged = hash_split(
        c, ["c_custkey"], [("train", 0.8), ("valid", 0.1), ("test", 0.1)], salt="t"
    )
    per = {r.split: r.n for r in tagged.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(per) == {"train", "valid", "test"}  # no NULL bucket
    assert sum(per.values()) == c.count()
    assert abs(per["train"] / c.count() - 0.8) < 0.03


def test_hash_split_by_group_key_is_leakage_safe(spark, sf001):
    """Splitting on an entity key (user_id) puts EVERY row of an entity
    in the same split — the property that prevents train/test leakage
    when one user has many events. Keying on the row id would scatter a
    user across splits; keying on the entity cannot."""
    ev = load_table(spark, sf001, "events")
    tagged = hash_split(ev, ["user_id"], [("train", 0.8), ("test", 0.2)], salt="lk")
    spread = (
        tagged.groupBy("user_id")
        .agg(F.countDistinct("split").alias("n_splits"), F.count("*").alias("n_rows"))
    )
    worst = spread.agg(F.max("n_splits").alias("mx"), F.max("n_rows").alias("rows_mx")).first()
    assert worst.mx == 1  # no user straddles splits
    assert worst.rows_mx > 1  # the property was actually exercised


def test_hash_split_validates_fractions():
    with pytest.raises(ValueError):
        hash_split(None, ["k"], [("a", 0.8), ("b", 0.3)])
    with pytest.raises(ValueError):
        hash_split(None, ["k"], [("a", -0.1)])


def test_stratified_sample_exact_quota(spark, sf001):
    o = load_table(spark, sf001, "orders").select("o_orderkey", "o_orderpriority")
    got = stratified_sample_n(o, ["o_orderpriority"], ["o_orderkey"], 7, salt="t")
    per = {
        r.o_orderpriority: r.n
        for r in got.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()
    }
    sizes = {
        r.o_orderpriority: r.n
        for r in o.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()
    }
    assert per == {k: min(7, v) for k, v in sizes.items()}
    # deterministic: same selection under different layout
    again = stratified_sample_n(
        o.repartition(17), ["o_orderpriority"], ["o_orderkey"], 7, salt="t"
    )
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in got.collect()}


def test_stratified_split_exact_quotas_and_layout_independence(spark, sf0001):
    """x84: every stratum gets exactly floor(n*cum) rows per boundary;
    assignment is identical under a different partition layout; fractions
    summing to 1 assign every row."""
    from dbms_data_anonymity_differential_privacy_spark.operators.sampling import stratified_split

    docs = load_table(spark, sf0001, "documents")
    splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    out = stratified_split(docs, ["lang"], ["doc_id"], splits, salt="t").select(
        "doc_id", "lang", "split"
    )
    rows = out.collect()
    assert all(r.split is not None for r in rows)

    from collections import Counter

    n_by_lang = Counter(r.lang for r in rows)
    got = Counter((r.lang, r.split) for r in rows)
    import math

    for lang, n in n_by_lang.items():
        b1 = math.floor(n * 0.8)
        b2 = math.floor(n * (0.8 + 0.1))
        assert got[(lang, "train")] == b1
        assert got[(lang, "val")] == b2 - b1
        assert got[(lang, "test")] == n - b2

    re_rows = {
        r.doc_id: r.split
        for r in stratified_split(
            docs.repartition(7, "doc_id"), ["lang"], ["doc_id"], splits, salt="t"
        ).collect()
    }
    assert re_rows == {r.doc_id: r.split for r in rows}

    import pytest

    with pytest.raises(ValueError, match="sum to <= 1"):
        stratified_split(docs, ["lang"], ["doc_id"], [("a", 0.9), ("b", 0.2)])


def test_zorder_locality_beats_single_column_sort(spark, sf001):
    """x95: slicing the z-ordered stream into equal 'files' must give a
    SMALLER total min/max span over the secondary dimension than sorting
    by the primary column alone — the file-skipping property the layout
    exists for. Also pins the interleave arithmetic on a crafted grid."""
    from dbms_data_anonymity_differential_privacy_spark.operators.sampling import zorder_layout

    # crafted 4x4 grid, bits=2: morton(x, y) with bins == values
    grid = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x int, y int"
    )
    got = {
        (r.x, r.y): r.zkey for r in zorder_layout(grid, ["x", "y"], bits=2).collect()
    }

    def morton(x, y):
        out = 0
        for i in range(2):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    assert got == {(x, y): morton(x, y) for x in range(4) for y in range(4)}

    li = load_table(spark, sf001, "lineitem").select("l_partkey", "l_suppkey")
    z = zorder_layout(li, ["l_partkey", "l_suppkey"], bits=8)
    rows_z = [
        (r.l_partkey, r.l_suppkey)
        for r in z.orderBy("zkey", "l_partkey", "l_suppkey").collect()
    ]
    rows_s = [
        (r.l_partkey, r.l_suppkey)
        for r in li.orderBy("l_partkey", "l_suppkey").collect()
    ]

    def span_sum(rows, n_files=32):
        per = max(1, len(rows) // n_files)
        total = 0
        for i in range(0, len(rows), per):
            chunk = rows[i : i + per]
            ys = [y for _, y in chunk]
            total += max(ys) - min(ys)
        return total

    # secondary-dim spans: z-order must beat the single-column sort by a
    # wide margin (suppkey is unconstrained within a partkey-sorted file)
    assert span_sum(rows_z) < 0.5 * span_sum(rows_s)
