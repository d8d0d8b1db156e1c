"""Corpus keyword search — BM25 ranking (Robertson & Zaragoza 2009).

A training-data pipeline uses this for dataset search and topical
filtering ("find the docs about X in 100 TB"): BM25 is the standard
lexical ranker, and its per-doc score for a FIXED query is a
fixed-shape arithmetic expression over (tf_t, dl, df_t, N, avgdl) —
which makes it fully oracle-checkable, unlike learned rankers.

Scale shape (the whole point of the formulation here):

- Per-doc term frequencies come from per-row token-ARRAY folds
  (``filter``/``size`` HOFs), not an explode+groupBy: the scoring scan is
  MAP-ONLY, embarrassingly parallel, no shuffle of token rows.
- The only full-corpus reductions are two scalar aggregates (N + Σdl, and
  the per-term document frequencies) — metadata-sized results that at
  100 TB would be computed once per corpus snapshot and cached alongside
  it, exactly like the table statistics a warehouse keeps.
- Top-k goes through ``orderBy().limit()`` → TakeOrderedAndProject
  (per-partition partial top-k, no global sort), same as cosine_topk.

Cross-engine exactness: idf values are computed ONCE driver-side with
C-libm ``math.log`` and embedded as literals (DuckDB's ``ln`` binds the
same libm, so the oracle's values match bit-for-bit; JVM ``Math.log``
may differ in the last ulp, so Spark never evaluates the log); avgdl is
one exact-integer division (the x09 canonicalization pattern); the
per-doc score is a fixed left-associative sum over query terms, rounded
to 6 dp on both engines.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.util import fan_out


def bm25_topk(
    df: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents by BM25 for a bag of query ``terms``.

    Tokenization matches the engine's corpus convention (lower, trim,
    split on whitespace — same as ``vocab_stats``). Documents matching no
    term are excluded (their score is identically 0). idf uses the
    +1-inside-the-log variant (Lucene's, always positive). Ties break by
    ascending ``id_col``; scores are rounded to 6 dp.

    Output: ``(id_col, score)``.
    """
    if not terms:
        raise ValueError("need at least one query term")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    base = fan_out(df).select(F.col(id_col), toks.alias("__toks"))
    def _tf(term: str):
        # closure factory, NOT a default-arg lambda: F.filter treats a
        # 2-parameter function as (element, index)
        return F.size(F.filter(F.col("__toks"), lambda t: t == F.lit(term)))

    base = base.select(
        F.col(id_col),
        F.size("__toks").alias("__dl"),
        *[_tf(term).alias(f"__tf_{i}") for i, term in enumerate(terms)],
    ).persist()

    # Corpus statistics — two metadata-sized scalar rows (at 100 TB:
    # computed once per snapshot, cached like table stats).
    s = base.agg(F.count(F.lit(1)).alias("n"), F.sum("__dl").alias("sum_dl")).first()
    n_docs = int(s["n"])
    if n_docs == 0:
        raise ValueError("empty corpus")
    sum_dl = int(s["sum_dl"])
    avgdl = sum_dl / n_docs  # one exact-integer IEEE division (bit-stable)
    dfr = base.agg(
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ]
    ).first()
    # C-libm log, embedded as literals (see module docstring)
    idfs = [
        math.log((n_docs - int(dfr[f"df_{i}"]) + 0.5) / (int(dfr[f"df_{i}"]) + 0.5) + 1.0)
        for i in range(len(terms))
    ]

    score = F.lit(0.0)
    for i, idf in enumerate(idfs):
        tf = F.col(f"__tf_{i}")
        part = (tf * F.lit(k1 + 1.0)) / (
            tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.lit(avgdl))
        )
        score = score + F.lit(idf) * part

    any_hit = F.greatest(*[F.col(f"__tf_{i}") for i in range(len(terms))]) > 0
    scored = base.filter(any_hit).select(
        F.col(id_col), F.round(score, 6).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)
