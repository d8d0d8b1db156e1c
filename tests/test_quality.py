"""Rule-by-rule tests for the Gopher quality gate (operators/quality.py)."""

from __future__ import annotations

from dbms_data_anonymity_differential_privacy_spark import load_table
from dbms_data_anonymity_differential_privacy_spark.operators import quality as Q
from dbms_data_anonymity_differential_privacy_spark.operators.quality import gopher_quality

GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs off to find "
    "some food that it can have for dinner with friends "
) * 3  # 66 tokens, all alphabetic, plenty of stopwords


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in gopher_quality(df).collect()}


def test_good_document_passes(spark):
    out = _run(spark, [(1, GOOD)])
    r = out[1]
    assert r["pass_gopher"] is True
    assert Q.MIN_TOKENS <= r["n_tokens"] <= Q.MAX_TOKENS
    assert r["alpha_word_frac"] == 1.0
    assert r["n_stopwords"] >= Q.MIN_STOPWORDS


def test_each_rule_fails_independently(spark):
    rows = [
        (1, GOOD),
        (2, "too short to pass the token floor"),  # n_tokens < 50
        (3, ("a " * 70) + "the of"),  # mean word len 1 < 3
        (4, " ".join(["12345"] * 60) + " the of and that"),  # alpha frac ~0.06
        (5, GOOD + " " + "# " * 20),  # symbol ratio > 0.1
        (6, "\n".join(["- " + GOOD] * 10)),  # all lines bulleted
        (7, "\n".join([GOOD + "..."] * 10)),  # all lines ellipsis-ended
        (8, " ".join(f"w{i}xyz" for i in range(60))),  # no stopwords
    ]
    out = _run(spark, rows)
    assert out[1]["pass_gopher"] is True
    for i in range(2, 9):
        assert out[i]["pass_gopher"] is False, f"doc {i} should fail"
    # and each failed for the intended reason
    assert out[2]["n_tokens"] < Q.MIN_TOKENS
    assert out[3]["mean_word_len"] < Q.MIN_WORD_LEN
    assert out[4]["alpha_word_frac"] < Q.MIN_ALPHA_FRAC
    assert out[5]["symbol_ratio"] > Q.MAX_SYMBOL_RATIO
    assert out[6]["bullet_line_frac"] > Q.MAX_BULLET_FRAC
    assert out[7]["ellipsis_line_frac"] > Q.MAX_ELLIPSIS_FRAC
    assert out[8]["n_stopwords"] < Q.MIN_STOPWORDS


def test_empty_and_degenerate_inputs(spark):
    out = _run(spark, [(1, ""), (2, "   "), (3, "the")])
    for i in (1, 2, 3):
        assert out[i]["pass_gopher"] is False
    assert out[1]["n_tokens"] == 0
    assert out[1]["mean_word_len"] == 0.0


def test_domain_quality_report_and_gate_consistency(spark, sf0001):
    """x85: pass rate arithmetic is exact; the gate keeps exactly the
    docs of passing domains; a precomputed report is honored."""
    from dbms_data_anonymity_differential_privacy_spark.operators.quality import (
        domain_gate,
        domain_quality_report,
    )

    docs = load_table(spark, sf0001, "documents")
    rep = domain_quality_report(docs, min_pass_rate=0.5, thresholds={"min_stopwords": 1})
    rows = rep.collect()
    assert all(abs(r.pass_rate_r - r.n_pass / r.n_docs) < 1e-9 for r in rows)
    assert all(r.domain_pass == (r.n_pass / r.n_docs >= 0.5) for r in rows)

    good = {r.source for r in rows if r.domain_pass}
    kept = domain_gate(
        docs, min_pass_rate=0.5, thresholds={"min_stopwords": 1}
    ).collect()
    assert {r.source for r in kept} == good
    n_by_domain = {r.source: r.n_docs for r in rows}
    assert len(kept) == sum(n_by_domain[s] for s in good)

    # precomputed report short-circuits recomputation and gives same result
    kept2 = domain_gate(docs, report=rep).collect()
    assert {r.doc_id for r in kept2} == {r.doc_id for r in kept}


def test_compression_ratio_signal(spark):
    """X118: repetitive text compresses far better than high-entropy
    text; empty doc releases zeros; deterministic across runs."""
    import random
    import zlib

    from dbms_data_anonymity_differential_privacy_spark.operators.quality import compression_ratio

    random.seed(4)
    noisy = "".join(random.choice("abcdefghijklmnopqrstuvwxyz0123456789 ") for _ in range(2000))
    docs = spark.createDataFrame(
        [(1, "spam ham " * 250), (2, noisy), (3, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in compression_ratio(docs).collect()}
    assert out[1].ratio_r < 0.05                   # boilerplate collapses
    assert out[2].ratio_r > 0.5                    # entropy resists
    assert out[3].n_bytes == 0 and out[3].ratio_r == 0.0
    # exact vs reference zlib
    assert out[2].n_compressed == len(zlib.compress(noisy.encode(), 6))
    again = {r.doc_id: r.ratio_r for r in compression_ratio(docs).collect()}
    assert again == {k: v.ratio_r for k, v in out.items()}
