"""Exact BPE behavior pins (operators/bpe.py) — the Sennrich et al. 2016
worked example plus encoder/scale invariants."""

from __future__ import annotations

from dbms_data_anonymity_differential_privacy_spark.operators.bpe import (
    EOW,
    bpe_tokenize,
    encode_word,
    learn_merges,
    word_histogram,
)

# The paper's example dictionary (§3.2): low x5, lower x2, newest x6, widest x3.
PAPER_HIST = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_learn_merges_matches_paper_example():
    merges = learn_merges(PAPER_HIST, n_merges=4, min_pair_count=1)
    # counts: (e,s)=9 and (s,t)=9 tie -> lexicographic picks (e,s); then
    # (es,t)=9; then (est,</w>)=9; then (l,o)=7.
    assert merges == [("e", "s"), ("es", "t"), ("est", EOW), ("l", "o")]


def test_encoder_applies_merges_in_rank_order():
    merges = learn_merges(PAPER_HIST, n_merges=10, min_pair_count=1)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    # 'lowest' was never a training word: its pieces come from learned units
    out = encode_word("lowest", ranks)
    assert "".join(out) == "lowest" + EOW
    assert "est" + EOW in out or "est" in out
    # a fully-merged training word encodes to one unit
    assert encode_word("newest", ranks) == ["newest" + EOW]


def test_encode_word_without_merges_is_chars():
    assert encode_word("abc", {}) == ["a", "b", "c", EOW]


def test_histogram_and_tokenize_on_spark(spark):
    rows = [(i, "low lower newest widest newest") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hist = word_histogram(df, top_words=10)
    assert dict(hist) == {"newest": 8, "low": 4, "lower": 4, "widest": 4}
    merges = learn_merges(hist, n_merges=50, min_pair_count=1)
    out = {r["doc_id"]: r for r in bpe_tokenize(df, merges).collect()}
    assert len(out) == 4
    r = out[0]
    assert r["n_words"] == 5
    # with enough merges every training word collapses to one token
    assert r["n_bpe_tokens"] == 5
    assert r["tokens"] == [w + EOW for w in ["low", "lower", "newest", "widest", "newest"]]
    # identical docs -> identical tokenization
    assert all(out[i]["tokens"] == r["tokens"] for i in range(4))


def test_tokenize_handles_empty_and_unseen(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "zzz")], "doc_id long, text string"
    )
    merges = [("l", "o")]
    out = {r["doc_id"]: r for r in bpe_tokenize(df, merges).collect()}
    assert out[1]["n_bpe_tokens"] == 0 and out[1]["tokens"] == []
    assert out[2]["n_bpe_tokens"] == 0
    assert out[3]["tokens"] == ["z", "z", "z", EOW]
