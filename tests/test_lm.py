"""Invariants for the bigram language-model scorer (operators/lm.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.lm import bigram_lm_scores
from dbms_data_anonymity_differential_privacy_spark.operators.text import token_count


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bigram_counts_and_exclusions(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d"),  # 3 bigrams
            (2, "one"),  # < 2 tokens: excluded
            (3, ""),  # empty: excluded
            (4, "x y"),  # 1 bigram
        ],
    )
    out = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    assert set(out) == {1, 4}
    assert out[1]["n_bigrams"] == 3
    assert out[4]["n_bigrams"] == 1


def test_typical_text_scores_lower_nll_than_gibberish(spark):
    # 20 docs of the same common phrase + 1 doc of tokens seen nowhere
    # else: the modal docs' bigrams are high-probability under the
    # corpus-trained model, the outlier's are all unseen (count 0).
    rows = [(i, "the cat sat on the mat") for i in range(20)]
    rows.append((99, "zq wv xk jj qz vw"))
    df = _docs(spark, rows)
    out = {r["doc_id"]: r["avg_nll"] for r in bigram_lm_scores(df).collect()}
    assert out[99] > out[0]
    assert all(out[i] == out[0] for i in range(20))  # identical docs, identical score


def test_hand_computed_model(spark):
    # corpus: one doc "a b a b" -> bigrams (a,b) x2, (b,a) x1.
    # histories: a->2, b->1. vocab V = 2.
    # P(b|a) = (2+1)/(2+2) = 3/4 ; P(a|b) = (1+1)/(1+2) = 2/3
    # nll = -(ln .75 + ln .75 + ln(2/3)) / 3
    df = _docs(spark, [(1, "a b a b")])
    row = bigram_lm_scores(df).collect()[0]
    expect = -(math.log(3 / 4) + math.log(3 / 4) + math.log(2 / 3)) / 3
    assert row["n_bigrams"] == 3
    assert abs(row["avg_nll"] - round(expect, 6)) < 1e-9


def test_n_bigrams_is_token_count_minus_one(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    scored = bigram_lm_scores(docs)
    joined = scored.join(
        docs.select("doc_id", token_count(F.col("text")).alias("n_tokens")), "doc_id"
    )
    bad = joined.where(F.col("n_bigrams") != F.col("n_tokens") - 1).count()
    assert bad == 0


def test_degenerate_corpora_yield_empty_not_errors(spark):
    """Empty corpus / no-bigram corpus: every round-3 operator returns an
    empty (or trivially-correct) relation instead of raising."""
    from dbms_data_anonymity_differential_privacy_spark.operators.bpe import bpe_train
    from dbms_data_anonymity_differential_privacy_spark.operators.dedup import incremental_admit

    empty = spark.createDataFrame([], "doc_id long, text string")
    short = spark.createDataFrame([(1, "one")], "doc_id long, text string")
    assert bigram_lm_scores(empty).count() == 0
    assert bigram_lm_scores(short).count() == 0
    assert bpe_train(empty) == []
    # empty existing corpus: the whole batch is fresh and admitted
    out = incremental_admit(short, empty).collect()
    assert len(out) == 1 and out[0]["admitted"] is True
