"""Tests for X37 keyed pseudonymization and X38 generalization hierarchies."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.generalize import (
    apply_vgh,
    min_level_for_k,
    vgh_height,
)
from dbms_data_anonymity_differential_privacy_spark.operators.pseudonym import pseudonymize

VGH = {
    "a1": ["A", "*"],
    "a2": ["A", "*"],
    "b1": ["B", "*"],
    "b2": ["B", "*"],
}


def test_pseudonymize_matches_reference_hash_and_keeps_null(spark):
    df = spark.createDataFrame([(1, "alice"), (2, "bob"), (3, None)], "id long, name string")
    out = {r.id: r.name for r in pseudonymize(df, ["name"], secret="s3cr3t").collect()}
    assert out[1] == hashlib.sha256(b"s3cr3t|alice").hexdigest()[:16]
    assert out[2] == hashlib.sha256(b"s3cr3t|bob").hexdigest()[:16]
    assert out[3] is None
    # deterministic: same value -> same token; different secret -> different
    out2 = {r.id: r.name for r in pseudonymize(df, ["name"], secret="other").collect()}
    assert out2[1] != out[1]


def test_pseudonymize_preserves_joinability(spark):
    left = spark.createDataFrame([(1, "u1"), (2, "u2")], "id long, user string")
    right = spark.createDataFrame([("u1", 10), ("u2", 20)], "user string, v long")
    lp = pseudonymize(left, ["user"], secret="k")
    rp = pseudonymize(right, ["user"], secret="k")
    joined = lp.join(rp, "user").select("id", "v").collect()
    assert {(r.id, r.v) for r in joined} == {(1, 10), (2, 20)}


def test_pseudonymize_validates(spark):
    df = spark.createDataFrame([(1, "x")], "id long, name string")
    with pytest.raises(ValueError):
        pseudonymize(df, [], secret="k")
    with pytest.raises(ValueError):
        pseudonymize(df, ["name"], secret="")
    with pytest.raises(ValueError):
        pseudonymize(df, ["name"], secret="k", token_hex_chars=4)


def test_apply_vgh_levels_and_unknown_values(spark):
    df = spark.createDataFrame(
        [(1, "a1"), (2, "a2"), (3, "b1"), (4, "WEIRD")], "id long, seg string"
    )
    assert vgh_height(VGH) == 2
    lvl0 = {r.id: r.seg for r in apply_vgh(df, "seg", VGH, 0).collect()}
    assert lvl0[1] == "a1"  # level 0 = identity
    lvl1 = {r.id: r.seg for r in apply_vgh(df, "seg", VGH, 1).collect()}
    assert (lvl1[1], lvl1[2], lvl1[3]) == ("A", "A", "B")
    # unmapped values generalize to the top, never pass through raw
    assert lvl1[4] == "*"
    lvl2 = {r.id: r.seg for r in apply_vgh(df, "seg", VGH, 2).collect()}
    assert set(lvl2.values()) == {"*"}
    with pytest.raises(ValueError):
        apply_vgh(df, "seg", VGH, 3)


def test_min_level_for_k_picks_first_sufficient_level(spark):
    # 4 singleton raw classes; level 1 gives classes {A: 2, B: 2} -> k=2 at level 1
    df = spark.createDataFrame(
        [(1, "a1"), (2, "a2"), (3, "b1"), (4, "b2")], "id long, seg string"
    )
    level, g = min_level_for_k(df, ["seg"], "seg", VGH, k=2)
    assert level == 1
    sizes = {r.seg: r.n for r in g.groupBy("seg").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"A": 2, "B": 2}
    # k=4 forces the top level (one class of 4)
    level4, _ = min_level_for_k(df, ["seg"], "seg", VGH, k=4)
    assert level4 == 2
    with pytest.raises(ValueError):
        min_level_for_k(df, ["seg"], "seg", VGH, k=5)
    with pytest.raises(ValueError):
        min_level_for_k(df, ["other"], "seg", VGH, k=2)


def test_min_level_zero_when_already_anonymous(spark):
    df = spark.createDataFrame([(i, "a1") for i in range(5)], "id long, seg string")
    level, _ = min_level_for_k(df, ["seg"], "seg", VGH, k=5)
    assert level == 0


def test_streaming_pseudonymization_matches_batch(spark, sf0001, tmp_path):
    """Pseudonymization is stateless, so one token definition serves both
    the backfill and the live ingest path: the streaming run must produce
    byte-identical tokens to the batch run on the same file."""
    import shutil

    from dbms_data_anonymity_differential_privacy_spark.sources.readers import load_table

    cust = load_table(spark, sf0001, "customer").select("c_custkey", "c_name")

    def scrub(df):
        return pseudonymize(df, ["c_name"], secret="stream-secret")

    batch = {r.c_custkey: r.c_name for r in scrub(cust).collect()}

    stream_dir = tmp_path / "cust"
    stream_dir.mkdir()
    shutil.copy(f"{sf0001}/customer.parquet", stream_dir / "part-000.parquet")
    stream = spark.readStream.schema(
        load_table(spark, sf0001, "customer").schema
    ).parquet(str(stream_dir)).select("c_custkey", "c_name")
    q = (
        scrub(stream)
        .writeStream.format("memory")
        .queryName("pseudo_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.c_custkey: r.c_name
        for r in spark.sql("SELECT * FROM pseudo_stream_test").collect()
    }
    assert got == batch
    assert len(batch) > 0
