"""Round-10 operator fixes (ADVICE r9 lows).

- connected_components frees each superseded round's localCheckpoint
  blocks eagerly instead of waiting for driver GC (dedup.py).
- msttr honors a caller-supplied id column (text.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_cc_distributed_frees_per_round_checkpoints(spark):
    """A chain graph forces many label-propagation rounds; after the
    result is consumed, only the FINAL labels checkpoint may remain —
    per-round blocks must not accumulate until GC."""
    from dbms_data_anonymity_differential_privacy_spark.operators.dedup import connected_components

    n = 12  # chain 0-1-...-12: diameter forces many rounds, < max_iter
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    spark.catalog.clearCache()
    before = _n_persistent(spark)
    out = connected_components(pairs, driver_threshold=0)
    rows = {r["id"]: r["comp"] for r in out.collect()}
    assert rows == {i: 0 for i in range(n + 1)}
    after = _n_persistent(spark)
    # final labels checkpoint (1) is the only permissible residue; the
    # pre-fix behavior left one block set PER ROUND (>= 5 here) plus the
    # symmetric edge checkpoint
    assert after - before <= 1, (before, after)
    # and the returned relation stays readable after the internal frees
    assert out.count() == n + 1


def test_cc_shortcut_frees_per_round_checkpoints(spark):
    from dbms_data_anonymity_differential_privacy_spark.operators.dedup import connected_components

    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    spark.catalog.clearCache()
    before = _n_persistent(spark)
    out = connected_components(pairs, driver_threshold=0, shortcut=True)
    assert {r["comp"] for r in out.collect()} == {0}
    assert _n_persistent(spark) - before <= 1


def test_msttr_custom_id_col(spark):
    from dbms_data_anonymity_differential_privacy_spark.operators.text import msttr

    text = " ".join(f"w{i % 7}" for i in range(20))
    df = spark.createDataFrame(
        [(1, "en", text), (2, "en", text), (3, "de", text)],
        "my_id long, lang string, text string",
    )
    out = msttr(df, segment_tokens=10, id_col="my_id").collect()
    by_group = {r["group"]: r for r in out}
    assert by_group["en"]["n_segments"] == 4  # 2 docs x 2 full segments
    assert by_group["de"]["n_segments"] == 2
    # w0..w6 cycle: a 10-token segment has 7 distinct types
    assert by_group["en"]["msttr_r"] == pytest.approx(0.7)

    # the default stays doc_id and matches a renamed-column run
    df2 = df.withColumnRenamed("my_id", "doc_id")
    out2 = {r["group"]: r["msttr_r"] for r in msttr(df2, segment_tokens=10).collect()}
    assert out2 == {r["group"]: r["msttr_r"] for r in out}

    # a frame without the id column fails loudly (the pre-fix bug:
    # hard-coded doc_id despite the configurable signature)
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        msttr(df, segment_tokens=10).collect()


def test_free_local_checkpoint_contract(spark):
    from dbms_data_anonymity_differential_privacy_spark.operators.util import free_local_checkpoint

    ck = spark.range(100).selectExpr("id", "id * 2 AS y").localCheckpoint(eager=True)
    before = _n_persistent(spark)
    assert free_local_checkpoint(ck) is True
    assert _n_persistent(spark) == before - 1
    # non-checkpoint relations are refused (returns False, no-op)
    plain = spark.range(10).withColumn("z", F.col("id") + 1)
    assert free_local_checkpoint(plain) is False


# ---------------------------------------------------------------------------
# Verdict task 7: the adaptive prefix-filter switch ENGAGES on a
# boilerplate-heavy (planted-Zipf) corpus, the prefix path's candidate
# volume collapses vs the plain index, and the released pair set is
# unchanged. On a benign corpus the switch stays off.
# ---------------------------------------------------------------------------
def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rand_text(rng, n_tok, vocab):
    return " ".join(f"w{int(rng.randint(vocab))}" for _ in range(n_tok))


def test_prefix_switch_engages_on_planted_zipf(spark):
    import numpy as np

    from dbms_data_anonymity_differential_privacy_spark.operators.dedup import (
        near_dup_plan_audit,
        ngram_jaccard_pairs,
    )

    rng = np.random.RandomState(7)
    # a 40-token boilerplate block planted into 30% of 2500 docs: its
    # ~38 shingles each hit df=750, so sum(df^2) ~ 21M while postings
    # stay ~340k -- past the 50x production trigger. (A single hot
    # shingle cannot trip 50x below ~14k docs; the quadratic-vs-linear
    # race is the point of the switch.)
    hot = " ".join(f"boiler{j}" for j in range(40))
    rows = []
    for i in range(2500):
        body = _rand_text(rng, 100, 5000)
        text = body + " " + hot if i % 10 < 3 else body
        rows.append((i, text))
    docs = _mk_docs(spark, rows)

    audit = near_dup_plan_audit(docs, threshold=0.5, n=3).first()
    assert audit["prefix_chosen"], audit
    # the engaged trigger is the operator's own condition
    assert audit["sum_df2"] > 50 * audit["n_postings"]
    # the hot shingles alone contribute ~38 * (750 choose 2) ~ 10.7M
    # candidate rows; at t=0.5 the rare-first prefix (keep ~ n_sh/2
    # rarest) never reaches them
    assert audit["plain_cand_pairs"] > 5_000_000
    assert audit["prefix_cand_pairs"] < 0.05 * audit["plain_cand_pairs"], audit

    # and the adaptive operator (prefix engaged) still releases exactly
    # the plain-index pair set: the 750 planted docs share the block but
    # differ in their 100-token bodies, so true pairs are the j>=0.5 ones
    adaptive = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5, n=3).collect()
    }
    plain = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            docs, threshold=0.5, n=3, prefix_filter=False
        ).collect()
    }
    assert adaptive == plain


def test_prefix_switch_stays_off_on_benign_corpus(spark):
    import numpy as np

    from dbms_data_anonymity_differential_privacy_spark.operators.dedup import (
        near_dup_plan_audit,
    )

    rng = np.random.RandomState(11)
    docs = _mk_docs(
        spark, [(i, _rand_text(rng, 25, 50000)) for i in range(600)]
    )
    audit = near_dup_plan_audit(docs, threshold=0.2, n=3).first()
    assert not audit["prefix_chosen"], audit
    # sanity: the audit's volumes are consistent (prefix <= plain)
    assert audit["prefix_cand_pairs"] <= audit["plain_cand_pairs"]


# ---------------------------------------------------------------------------
# Verdict task 4: ANN recall measured at the production regime (301k-row
# sf15 corpus, tools/ann_recall_regime.py). The committed artifact is the
# evidence; these pins make a silent regression (or a deleted artifact)
# fail the suite. The committed operating point: IVF n_lists=32,
# n_probe=8.
# ---------------------------------------------------------------------------
def test_ann_recall_artifact_floor():
    import json
    import pathlib

    art = pathlib.Path(__file__).parent.parent / "ANN_RECALL.json"
    d = json.loads(art.read_text())
    assert d["corpus_rows"] >= 300_000 and d["n_queries"] >= 40
    by_probe = {r["n_probe"]: r for r in d["ivf"]}
    op = by_probe[8]
    # floor at the committed operating point, measured on the ISOTROPIC
    # synthetic corpus (the hard case — no cluster structure to exploit;
    # clustered real embeddings sit above this)
    assert op["recall_at_10"] >= 0.60, op
    # and the probe knob is a real trade-off: recall monotone in n_probe
    probes = sorted(by_probe)
    recalls = [by_probe[p]["recall_at_10"] for p in probes]
    assert recalls == sorted(recalls), recalls
    # the scale story: probing 8/32 lists beats the exact scan's wall
    assert op["wall_per_query_sec"] < d["exact_wall_per_query_sec"]
