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

    hit_cols = [F.col(f"__tf_{i}") for i in range(len(terms))]
    any_hit = (hit_cols[0] if len(hit_cols) == 1 else F.greatest(*hit_cols)) > 0
    scored = base.filter(any_hit).select(
        F.col(id_col), F.round(score, 6).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def bm25_topk_many(
    df: DataFrame,
    queries: "dict[int, Sequence[str]]",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X83 — batched BM25 retrieval: top-``k`` documents for EVERY query
    in one corpus scan — the lexical sibling of the embedding k-NN join
    (x81), and the shape topical-filtering sweeps actually run ("score
    this 100 TB corpus against these 200 topic queries").

    One map-only scan computes per-doc tf for the DISTINCT term union;
    corpus stats (N, Σdl, per-term df) are the same two metadata-sized
    aggregates as :func:`bm25_topk`; each query's score is a fixed
    left-associative sum over its own terms (idf literals, C-libm log).
    Per-doc emission is an exploded array of (query, score) structs
    FILTERED to queries the doc hits before any shuffle, and the
    per-query rank<=k runs as a map-side WindowGroupLimit partial — so
    the single exchange carries <= k rows per query per partition.

    Output: ``(query_id, id_col, score, rnk)``, rnk in [1, k].
    """
    from pyspark.sql import Window

    if not queries:
        raise ValueError("need at least one query")
    for qid, terms in queries.items():
        if not terms:
            raise ValueError(f"query {qid} has no terms")
    all_terms = sorted({t for ts in queries.values() for t in ts})
    t_idx = {t: i for i, t in enumerate(all_terms)}

    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    base = fan_out(df).select(F.col(id_col), toks.alias("__toks"))

    def _tf(term: str):
        return F.size(F.filter(F.col("__toks"), lambda t: t == F.lit(term)))

    base = base.select(
        F.col(id_col),
        F.size("__toks").alias("__dl"),
        *[_tf(t).alias(f"__tf_{i}") for t, i in t_idx.items()],
    ).persist()

    s = base.agg(F.count(F.lit(1)).alias("n"), F.sum("__dl").alias("sum_dl")).first()
    n_docs = int(s["n"])
    if n_docs == 0:
        raise ValueError("empty corpus")
    avgdl = int(s["sum_dl"]) / n_docs
    dfr = base.agg(
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(all_terms))
        ]
    ).first()
    idfs = [
        math.log((n_docs - int(dfr[f"df_{i}"]) + 0.5) / (int(dfr[f"df_{i}"]) + 0.5) + 1.0)
        for i in range(len(all_terms))
    ]

    def q_score(terms: Sequence[str]):
        score = F.lit(0.0)
        for t in terms:
            i = t_idx[t]
            tf = F.col(f"__tf_{i}")
            part = (tf * F.lit(k1 + 1.0)) / (
                tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.lit(avgdl))
            )
            score = score + F.lit(idfs[i]) * part
        return F.round(score, 6)

    def q_hit(terms: Sequence[str]):
        cols = [F.col(f"__tf_{t_idx[t]}") for t in terms]
        return (cols[0] if len(cols) == 1 else F.greatest(*cols)) > 0

    per_q = F.array(
        *[
            F.struct(
                F.lit(int(qid)).alias("query_id"),
                q_score(terms).alias("score"),
                q_hit(terms).alias("hit"),
            )
            for qid, terms in sorted(queries.items())
        ]
    )
    scored = (
        base.select(F.col(id_col), F.explode(per_q).alias("q"))
        .filter(F.col("q.hit"))
        .select(F.col("q.query_id").alias("query_id"), id_col, F.col("q.score").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def rrf_weights(max_rank: int, k0: int = 60) -> list[tuple[int, int]]:
    """Integer RRF weight table for ranks 1..max_rank: ``w = round(1e12 /
    (k0 + rank))`` (Cormack et al. 2009's constant, default 60).

    Driver-built once (the x23/x124/x140 literal-table convention), shared
    verbatim with the DuckDB oracle, so fused scores are exact int64 sums —
    immune to float summation order across lists and partitions.
    """
    return [(r, round(1e12 / (k0 + r))) for r in range(1, max_rank + 1)]


def rrf_fuse(
    rankings: Sequence[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rnk",
    k0: int = 60,
    max_rank: int = 1000,
    topk: int | None = None,
) -> DataFrame:
    """X141 — reciprocal-rank fusion of N ranked lists (Cormack, Clarke &
    Büttcher SIGIR 2009): ``score(d) = Σ_lists 1/(k0 + rank_d)`` — the
    standard hybrid-retrieval combiner (lexical BM25 + dense ANN + priors)
    that needs no score calibration because it consumes only ranks.

    Each input is a bounded top-N list ``(id_col, rank_col)`` with ranks in
    [1, max_rank] — candidate lists, kilobytes next to the corpus that
    produced them, so every stage here runs on metadata-sized relations:
    union the lists map-side, one exact-int64 weight lookup against the
    broadcast :func:`rrf_weights` table (a rank beyond ``max_rank`` is a
    contract violation and fails loudly rather than silently dropping),
    ONE groupBy on the candidate union, and a TakeOrdered top-k release.

    Output: ``(id_col, n_lists, best_rank, rrf_int, rrf, fused_rank)``;
    ``rrf = rrf_int / 1e12`` is one IEEE division (x51 convention).
    """
    from pyspark.sql import Window

    if not rankings:
        raise ValueError("need at least one ranking")
    if k0 < 1:
        raise ValueError(f"k0 must be >= 1, got {k0}")
    spark = rankings[0].sparkSession
    wtab = spark.createDataFrame(rrf_weights(max_rank, k0), "rnk int, w long")

    parts = [r.select(F.col(id_col), F.col(rank_col).cast("int").alias("__r")) for r in rankings]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    looked = u.join(F.broadcast(wtab), u["__r"] == wtab["rnk"], "left").select(
        F.col(id_col),
        F.col("__r"),
        F.when(
            F.col("w").isNotNull(), F.col("w")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"rrf_fuse: rank beyond max_rank={max_rank}: "),
                    F.col("__r").cast("string"),
                )
            )
        ).alias("__w"),
    )
    fused = looked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lists"),
        F.min("__r").alias("best_rank"),
        F.sum("__w").alias("rrf_int"),
    )
    out = fused.select(
        id_col,
        "n_lists",
        "best_rank",
        "rrf_int",
        F.round(F.col("rrf_int").cast("double") / F.lit(1e12), 9).alias("rrf"),
    )
    w_rank = Window.orderBy(F.desc("rrf_int"), F.col(id_col))
    out = out.withColumn("fused_rank", F.row_number().over(w_rank))
    if topk is not None:
        out = out.filter(F.col("fused_rank") <= topk)
    return out
