"""Statistical language-model scoring for corpus quality filtering.

A CCNet/KenLM-style pipeline (Wenzek et al. 2020) scores every document
with an n-gram language model and drops the tail: gibberish, boilerplate,
and OCR noise all score far from the corpus' own distribution. The
reference has no text operators at all (SURVEY §0); this is a north-star
LLM-data-pipeline component designed from the public Spark API.

``bigram_lm_scores`` trains a Laplace-smoothed bigram model ON the corpus
itself (the self-scoring setup used for in-corpus outlier detection) and
emits each document's average negative log-likelihood per bigram:

    nll(doc) = -(1/n) * sum_i ln P(w_{i+1} | w_i)
    P(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)

where ``c(w1 w2)`` is the corpus bigram count, ``c(w1 ·)`` the history
count (bigrams starting with ``w1``), and ``V`` the corpus vocabulary
size. Low nll = typical text; high nll = atypical (or, with repeated
boilerplate, suspiciously low — both tails are useful gates).

Scale shape (100 TB):

- Tokenization and bigram emission are one map-side pass; bigrams travel
  as ``xxhash64`` 8-byte hashes, never strings (same up-to-collision
  contract as the dedup family, `operators/dedup.py`).
- Model training is two word-count-shaped aggregations (bigram counts,
  history counts) with map-side partial aggregation — the shuffle carries
  near-distinct hashes, not occurrences.
- Scoring joins occurrences back to the two model relations: shuffle hash
  joins on 8-byte keys; the model side is orders of magnitude smaller
  than the occurrence side (distinct bigrams vs total bigrams). With a
  bounded vocabulary (``top_v``), the model collapses to a broadcastable
  relation and the scoring pass becomes map-only.
- Per-document reduction is a ``collect_list`` bounded by document
  length, then an in-row sorted fold — no second shuffle.

Cross-engine exactness (the oracle gate): JVM ``Math.log`` differs from
C-libm ``ln`` by 1 ulp on ~1e-4 of inputs (measured on this platform),
so Spark NEVER evaluates a log. Both log arguments are integers
(``c+1``, ``c_hist+V``); their distinct values form a metadata-sized set
(≤ O(sqrt(total bigrams)) by the count-histogram bound, a few MB even at
100 TB — the same "corpus statistics" tier as BM25's idf table,
`operators/search.py`). Those logs are computed driver-side with C-libm
``math.log`` and broadcast-joined, making every per-bigram log-prob
bit-identical to DuckDB's ``ln``. The per-document sum is a left fold
over the ASCENDING-sorted log-prob list on both engines (equal values
are adjacent after sorting, so fold order is fully determined), and the
final division and ROUND are single IEEE ops. Result: bit-exact across
engines with no rounding slack hiding real bugs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.text import WS
from dbms_data_anonymity_differential_privacy_spark.operators.util import (
    fan_out,
    track_cached,
)


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
    exact: bool = True,
) -> DataFrame:
    """Per-document average negative log-likelihood under a
    Laplace-smoothed bigram LM trained on ``df`` itself.

    Tokenization matches the corpus convention (lower, trim, whitespace
    split, drop empties — same as ``vocab_stats``/``bm25_topk``).
    Documents with < 2 tokens have no bigram support and are excluded.

    ``exact=True`` (the oracle default) evaluates every log driver-side
    with C-libm over the distinct integer log inputs and broadcasts the
    table back — bit-identical to DuckDB's ``ln`` (module docstring).
    ``exact=False`` is the PRODUCTION mode: logs run JVM-side with
    ``F.log`` inside whole-stage codegen — no driver materialization at
    all (the libm table, though count-histogram bounded, is still
    millions of collected rows at a 10^13-token corpus). JVM Math.log
    differs from libm by ≤1 ulp on ~1e-4 of inputs, so the two modes
    agree to ~1e-15 relative (pinned in tests).

    Output: ``(id_col, n_bigrams, avg_nll)``.
    """
    spark = df.sparkSession
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), WS), lambda t: t != "")
    # cached: the bigram expansion AND the vocabulary count read the
    # tokenized relation — one regex tokenization pass, not two (r10)
    base = track_cached(
        fan_out(df).select(F.col(id_col), toks.alias("__t")).persist()
    )

    # Bigram occurrences as 8-byte hash pairs (one map-side pass).
    occ = (
        base.where(F.size("__t") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    "transform(sequence(0, size(__t) - 2), "
                    "i -> struct(xxhash64(__t[i]) AS h1, xxhash64(__t[i + 1]) AS h2))"
                )
            ).alias("__bg"),
        )
        .select(id_col, F.col("__bg.h1").alias("h1"), F.col("__bg.h2").alias("h2"))
    )
    track_cached(occ.persist())

    # Model: bigram counts + history counts, PRE-JOINED at bigram grain
    # (model-sized join) so the fat occurrence relation is joined ONCE —
    # the previous occ ⋈ cb ⋈ cu shape shuffled the per-token-occurrence
    # relation through two exchanges (r10 optimization, guide §2.3/§2.4;
    # at corpus scale occ is the 10^13-row relation, the model is the
    # distinct-bigram relation).
    cb = occ.groupBy("h1", "h2").agg(F.count(F.lit(1)).alias("cb"))
    cu = occ.groupBy("h1").agg(F.count(F.lit(1)).alias("cu"))
    model = track_cached(cb.join(cu, on="h1").persist())

    # Vocabulary size over ALL token positions (exact).
    vocab = (
        base.select(F.explode("__t").alias("tok"))
        .agg(F.countDistinct(F.xxhash64("tok")).alias("v"))
        .first()["v"]
    )
    v = int(vocab)

    if exact:
        # Driver-side C-libm log table over the distinct integer log inputs
        # (metadata-sized; see module docstring), fetched in ONE job over
        # the pre-joined model. The exact libm values attach to the MODEL
        # (one row per distinct bigram), not to every occurrence — the
        # same released numbers at a fraction of the join work.
        vals = (
            model.select((F.col("cb") + 1).alias("val"))
            .unionByName(model.select((F.col("cu") + v).alias("val")))
            .distinct()
            .collect()
        )
        log_rows = [(x, math.log(x)) for x in sorted(int(r["val"]) for r in vals)]
        logtab = spark.createDataFrame(log_rows, "val long, lnval double")
        model_lp = (
            model.join(
                F.broadcast(logtab.select(F.col("val").alias("__nv"), F.col("lnval").alias("__ln_num"))),
                F.col("cb") + 1 == F.col("__nv"),
            )
            .join(
                F.broadcast(logtab.select(F.col("val").alias("__dv"), F.col("lnval").alias("__ln_den"))),
                F.col("cu") + v == F.col("__dv"),
            )
            .select("h1", "h2", (F.col("__ln_num") - F.col("__ln_den")).alias("logp"))
        )
    else:
        # production: JVM log inside codegen, zero driver materialization
        model_lp = model.select(
            "h1",
            "h2",
            (
                F.log((F.col("cb") + 1).cast("double"))
                - F.log((F.col("cu") + v).cast("double"))
            ).alias("logp"),
        )
    scored = occ.join(model_lp, ["h1", "h2"]).select(id_col, "logp")

    # Sorted left fold per document: deterministic summation order on
    # both engines (DuckDB twin: list_reduce(list_sort(list(logp)))).
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.expr(
            "aggregate(array_sort(collect_list(logp)), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
        ).alias("__s"),
    )
    return per_doc.select(
        id_col,
        "n_bigrams",
        F.round(-F.col("__s") / F.col("n_bigrams"), round_to).alias("avg_nll"),
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 1000,
    round_to: int = 9,
    exact: bool = True,
) -> DataFrame:
    """Zipf rank-frequency fit over the corpus vocabulary: OLS of
    ``ln(count)`` on ``ln(rank)`` for the ``top_k`` most frequent words.
    A healthy natural-language corpus sits near slope -1 (Zipf 1949);
    machine-generated or boilerplate-heavy corpora bend away — this is
    the corpus-level cousin of the per-doc quality gates.

    Output (single row): ``(n_words, slope_r, intercept_r, r2_r)``.

    Exactness: rank->count pairing is deterministic under count ties
    (rank i always pairs the i-th largest count, whichever word holds
    it), ln values come from the driver-built C-libm table (the x23
    idiom — DuckDB's ln() is the same libm double), and every OLS sum
    is a sorted left fold (``aggregate(array_sort(collect_list(...)))``
    / ``list_reduce(list_sort(list(...)))``) so float addition order is
    identical on both engines.

    Scale shape: ONE word-count shuffle on 8-byte token hashes; top-k
    via TakeOrdered (map-side partial top-k, no global sort); the
    regression itself runs over a k-row relation.
    """
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), WS), lambda t: t != "")
    wc = (
        fan_out(df)
        .select(F.explode(toks).alias("tok"))
        .groupBy(F.xxhash64("tok").alias("h"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window

    topk = wc.orderBy(F.desc("cnt"), "h").limit(int(top_k)).persist()
    ranked = topk.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("cnt"), "h"))
    )
    if exact:
        cnts = sorted({int(r["cnt"]) for r in topk.select("cnt").collect()})
        spark = df.sparkSession
        ln_cnt = spark.createDataFrame(
            [(c, math.log(float(c))) for c in cnts], "cnt long, y double"
        )
        n_rows = topk.count()
        ln_rank = spark.createDataFrame(
            [(i, math.log(float(i))) for i in range(1, n_rows + 1)],
            "rank int, x double",
        )
        xy = (
            ranked.join(F.broadcast(ln_cnt), on="cnt")
            .join(F.broadcast(ln_rank), on="rank")
            .select("x", "y")
        )
    else:
        # production: JVM log in codegen (the libm tables exist only for
        # the DuckDB bit-exactness gate; the top-k relation is k rows, so
        # either way this is cheap — the flag keeps the mode contract
        # uniform across the log-table family)
        xy = ranked.select(
            F.log(F.col("rank").cast("double")).alias("x"),
            F.log(F.col("cnt").cast("double")).alias("y"),
        )

    def fold(expr: str) -> F.Column:
        return F.expr(
            f"aggregate(array_sort(collect_list({expr})), "
            "CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
        )

    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        fold("x").alias("sx"),
        fold("y").alias("sy"),
        fold("x * y").alias("sxy"),
        fold("x * x").alias("sxx"),
        fold("y * y").alias("syy"),
    )
    n = F.col("n").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        F.col("n").cast("long").alias("n_words"),
        F.round(cov / varx, round_to).alias("slope_r"),
        F.round(
            (F.col("sy") - (cov / varx) * F.col("sx")) / n, round_to
        ).alias("intercept_r"),
        F.round((cov * cov) / (varx * vary), round_to).alias("r2_r"),
    )
