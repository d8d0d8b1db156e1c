"""Gopher-style document quality gate (Rae et al. 2021, §A1.1).

The published MassiveText filter: a document survives only if its basic
shape statistics sit inside human-text bounds. This module computes the
full rule set in ONE map-only projection of built-in expressions (per-row
array folds — no explode, no shuffle, whole-stage codegen) with an exact
DuckDB twin generated from the same thresholds, so the gate is
oracle-checkable end to end. Complements the per-doc repetition gates in
`operators/text.py` (`repetition_metrics`), which cover §A1.1's
duplicate-token rules.

Rules (thresholds are module constants, overridable per call):

- token count in [MIN_TOKENS, MAX_TOKENS]
- mean word length in [MIN_WORD_LEN, MAX_WORD_LEN]
- fraction of words with >= 1 alphabetic char >= MIN_ALPHA_FRAC
- symbol-to-word ratio (# and ... occurrences per word) <= MAX_SYMBOL_RATIO
- fraction of lines starting with a bullet <= MAX_BULLET_FRAC
- fraction of lines ending with an ellipsis <= MAX_ELLIPSIS_FRAC
- >= MIN_STOPWORDS distinct stopwords present (the Gopher 8-word list)

Cross-engine exactness: every statistic is an integer count or a single
IEEE division of two integers — no rounding needed anywhere; patterns
stay in the Java-regex∩RE2 subset (`operators/clean.py` rules).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.text import WS
from dbms_data_anonymity_differential_privacy_spark.operators.util import fan_out, nondet_true

MIN_TOKENS, MAX_TOKENS = 50, 100_000
MIN_WORD_LEN, MAX_WORD_LEN = 3.0, 10.0
MIN_ALPHA_FRAC = 0.80
MAX_SYMBOL_RATIO = 0.10
MAX_BULLET_FRAC = 0.90
MAX_ELLIPSIS_FRAC = 0.30
MIN_STOPWORDS = 2
STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# The published thresholds above, overridable per corpus (a crawl of
# short-form or non-English text tunes these; both the Spark gate and
# its SQL twin read the SAME resolved dict, so they can never drift).
DEFAULT_THRESHOLDS = {
    "min_tokens": MIN_TOKENS,
    "max_tokens": MAX_TOKENS,
    "min_word_len": MIN_WORD_LEN,
    "max_word_len": MAX_WORD_LEN,
    "min_alpha_frac": MIN_ALPHA_FRAC,
    "max_symbol_ratio": MAX_SYMBOL_RATIO,
    "max_bullet_frac": MAX_BULLET_FRAC,
    "max_ellipsis_frac": MAX_ELLIPSIS_FRAC,
    "min_stopwords": MIN_STOPWORDS,
}


def _resolve(thresholds: dict | None) -> dict:
    bad = set(thresholds or ()) - set(DEFAULT_THRESHOLDS)
    if bad:
        raise ValueError(f"unknown Gopher thresholds: {sorted(bad)}")
    return {**DEFAULT_THRESHOLDS, **(thresholds or {})}

_ALPHA = "[A-Za-z]"
_SYMBOL = r"#|\.\.\."
_BULLET = r"^[-*\x{2022}]"
_ELLIPSIS = r"\.\.\.$"


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
    thresholds: dict | None = None,
) -> DataFrame:
    """Annotate each document with the Gopher statistics and the overall
    ``pass_gopher`` verdict. Map-only; see module docstring.
    ``keep_cols`` pass through unchanged (so a streaming caller can gate
    and keep payload columns in ONE projection — no stream-stream
    join); ``thresholds`` overrides any DEFAULT_THRESHOLDS key."""
    th = _resolve(thresholds)
    t = F.col(text_col)

    # Tokenize/split ONCE into materialized array attributes. The stat
    # expressions below are higher-order functions (CodegenFallback —
    # interpreted, no common-subexpression elimination), so if they
    # referenced the split expression directly, the whole-document
    # tokenize would re-run once PER STAT (4x for toks, 3x for lines) —
    # and a downstream filter(pass_gopher) pushdown would restate it all
    # again below the projection. With the split in its own projection,
    # CollapseProject keeps the boundary (SPARK-36718: never duplicate
    # non-cheap expressions referenced more than once) and both the stats
    # and any pushed-down verdict predicate read the arrays as attribute
    # lookups. Measured 3.2s -> 0.9s on the pipe_private_export gate at
    # sf0.1.
    pre = fan_out(df).select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.filter(F.split(F.lower(F.trim(t)), WS), lambda w: w != "").alias("__toks"),
        F.split(t, r"\n").alias("__lines"),
        F.size(F.regexp_extract_all(t, F.lit(_SYMBOL), 0)).alias("__n_sym"),
    )
    toks = F.col("__toks")
    lines = F.col("__lines")

    n_tokens = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike(_ALPHA)))
    n_sym = F.col("__n_sym")
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda l: F.trim(l).rlike(_BULLET)))
    n_ellipsis = F.size(F.filter(lines, lambda l: F.trim(l).rlike(_ELLIPSIS)))
    n_stop = F.size(F.array_intersect(toks, F.array(*[F.lit(s) for s in STOPWORDS])))

    base = pre.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        n_tokens.cast("long").alias("n_tokens"),
        F.when(n_tokens > 0, sum_len / n_tokens).otherwise(F.lit(0.0)).alias("mean_word_len"),
        F.when(n_tokens > 0, n_alpha / n_tokens).otherwise(F.lit(0.0)).alias("alpha_word_frac"),
        F.when(n_tokens > 0, n_sym / n_tokens).otherwise(F.lit(0.0)).alias("symbol_ratio"),
        F.when(n_lines > 0, n_bullet / n_lines).otherwise(F.lit(0.0)).alias("bullet_line_frac"),
        F.when(n_lines > 0, n_ellipsis / n_lines)
        .otherwise(F.lit(0.0))
        .alias("ellipsis_line_frac"),
        n_stop.cast("int").alias("n_stopwords"),
    )
    ok: Column = (
        F.col("n_tokens").between(th["min_tokens"], th["max_tokens"])
        & F.col("mean_word_len").between(th["min_word_len"], th["max_word_len"])
        & (F.col("alpha_word_frac") >= th["min_alpha_frac"])
        & (F.col("symbol_ratio") <= th["max_symbol_ratio"])
        & (F.col("bullet_line_frac") <= th["max_bullet_frac"])
        & (F.col("ellipsis_line_frac") <= th["max_ellipsis_frac"])
        & (F.col("n_stopwords") >= th["min_stopwords"])
    )
    # nondet_true() pins a caller's filter(pass_gopher) ABOVE this
    # projection — without it the pushed-down predicate restates the
    # interpreted tokenize chain once per threshold term below the
    # fan-out exchange (measured 3.4s -> 0.4s on the private-export
    # gate at sf0.1; see operators/util.py nondet_true for the full
    # mechanics).
    return base.withColumn("pass_gopher", ok & nondet_true())


def gopher_quality_sql(table: str = "documents", text_col: str = "text",
                       id_col: str = "doc_id", thresholds: dict | None = None) -> str:
    """DuckDB twin of :func:`gopher_quality`, generated from the same
    thresholds/patterns (identical integer counts + single divisions)."""
    th = _resolve(thresholds)
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
    WITH s AS (SELECT {id_col},
        list_filter(string_split_regex(lower(trim({text_col})), '\\s+'),
                    w -> w <> '') AS toks,
        string_split({text_col}, chr(10)) AS lines,
        len(regexp_extract_all({text_col}, '{_SYMBOL}')) AS n_sym
      FROM {table}),
    m AS (SELECT {id_col},
        CAST(len(toks) AS BIGINT) AS n_tokens,
        list_sum(list_transform(toks, w -> len(w))) AS sum_len,
        len(list_filter(toks, w -> regexp_matches(w, '{_ALPHA}'))) AS n_alpha,
        n_sym,
        len(lines) AS n_lines,
        len(list_filter(lines, l -> regexp_matches(trim(l), '{_BULLET}'))) AS n_bullet,
        len(list_filter(lines, l -> regexp_matches(trim(l), '{_ELLIPSIS}'))) AS n_ellipsis,
        CAST(len(list_intersect(toks, [{stops}])) AS INT) AS n_stopwords
      FROM s),
    q AS (SELECT {id_col}, n_tokens,
        CASE WHEN n_tokens > 0 THEN CAST(sum_len AS DOUBLE) / n_tokens ELSE 0.0 END
          AS mean_word_len,
        CASE WHEN n_tokens > 0 THEN CAST(n_alpha AS DOUBLE) / n_tokens ELSE 0.0 END
          AS alpha_word_frac,
        CASE WHEN n_tokens > 0 THEN CAST(n_sym AS DOUBLE) / n_tokens ELSE 0.0 END
          AS symbol_ratio,
        CASE WHEN n_lines > 0 THEN CAST(n_bullet AS DOUBLE) / n_lines ELSE 0.0 END
          AS bullet_line_frac,
        CASE WHEN n_lines > 0 THEN CAST(n_ellipsis AS DOUBLE) / n_lines ELSE 0.0 END
          AS ellipsis_line_frac,
        n_stopwords
      FROM m)
    SELECT *,
      (n_tokens BETWEEN {th["min_tokens"]} AND {th["max_tokens"]}
       AND mean_word_len BETWEEN {th["min_word_len"]} AND {th["max_word_len"]}
       AND alpha_word_frac >= {th["min_alpha_frac"]}
       AND symbol_ratio <= {th["max_symbol_ratio"]}
       AND bullet_line_frac <= {th["max_bullet_frac"]}
       AND ellipsis_line_frac <= {th["max_ellipsis_frac"]}
       AND n_stopwords >= {th["min_stopwords"]}) AS pass_gopher
    FROM q
    """


def domain_quality_report(
    df: DataFrame,
    domain_col: str = "source",
    min_pass_rate: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    thresholds: dict | None = None,
) -> DataFrame:
    """X85 — domain-level quality rollup (the CCNet/C4 blocklist step):
    per-domain doc count, Gopher pass count/rate, token volume, and a
    ``domain_pass`` verdict (pass rate >= ``min_pass_rate``). Individual
    doc gates miss systematically-bad domains whose docs each sit just
    above threshold — curation pipelines drop WHOLE domains whose
    aggregate quality is poor.

    Physical shape: the per-row stats are the same map-only Gopher folds;
    the rollup shuffles only (domain, partials) — at 100 TB the report is
    domains-sized (thousands of rows), broadcast-consumable by
    :func:`domain_gate`.

    Output: ``(domain_col, n_docs, n_pass, total_tokens, pass_rate_r,
    domain_pass)``.
    """
    g = gopher_quality(
        df, text_col, id_col, keep_cols=(domain_col,), thresholds=thresholds
    )
    agg = g.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("pass_gopher").cast("long")).alias("n_pass"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )
    rate = F.col("n_pass").cast("double") / F.col("n_docs").cast("double")
    return agg.select(
        domain_col,
        "n_docs",
        "n_pass",
        "total_tokens",
        F.round(rate, 9).alias("pass_rate_r"),
        (rate >= F.lit(min_pass_rate)).alias("domain_pass"),
    )


def domain_gate(
    df: DataFrame,
    report: DataFrame | None = None,
    domain_col: str = "source",
    min_pass_rate: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    thresholds: dict | None = None,
) -> DataFrame:
    """X85 — keep only documents from domains whose aggregate quality
    passes (:func:`domain_quality_report`): one broadcast left-semi join
    on the domains-sized verdict relation — the 100 TB corpus never
    shuffles. Pass a precomputed ``report`` to reuse a cached rollup."""
    rep = (
        report
        if report is not None
        else domain_quality_report(
            df, domain_col, min_pass_rate, text_col, id_col, thresholds
        )
    )
    good = rep.filter(F.col("domain_pass")).select(domain_col)
    return df.join(F.broadcast(good), on=domain_col, how="left_semi")


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """X118 — per-document zlib compression ratio: the
    model-free repetition/entropy signal quality pipelines use alongside
    the Gopher shape rules (highly compressible text is boilerplate or
    repetition; incompressible text is noise/binary junk — both tails
    get gated).

    Python-side by necessity (zlib), so it runs as an Arrow
    ``mapInPandas`` batch transform — the sanctioned vectorized escape
    hatch (multimodal convention): one Python worker per core, no
    per-row pickling, deterministic output (zlib level pinned).

    Output: ``(id_col, n_bytes, n_compressed, ratio_r)`` — ratio =
    compressed/raw (lower = more repetitive), 0.0 for empty docs.
    """
    import pandas as pd

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("__id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("n_compressed", T.LongType()),
            T.StructField("ratio_r", T.DoubleType()),
        ]
    )

    def run(batches):
        import zlib

        for pdf in batches:
            raw = [t.encode("utf-8") if t is not None else b"" for t in pdf[text_col]]
            nb = [len(b) for b in raw]
            nc = [len(zlib.compress(b, level)) if b else 0 for b in raw]
            yield pd.DataFrame(
                {
                    "__id": pdf[id_col],
                    "n_bytes": nb,
                    "n_compressed": nc,
                    "ratio_r": [
                        round(c / b, 9) if b else 0.0 for b, c in zip(nb, nc)
                    ],
                }
            )

    from dbms_data_anonymity_differential_privacy_spark.operators.util import fan_out

    out = fan_out(df.select(id_col, text_col)).mapInPandas(run, schema)
    return out.withColumnRenamed("__id", id_col)


def linear_quality_score(
    df: DataFrame,
    n_buckets: int = 64,
    threshold: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights_seed: int = 12345,
) -> DataFrame:
    """Model-based quality filtering: LINEAR-CLASSIFIER INFERENCE over
    hashed bag-of-words features — the fastText-style quality gate of
    CCNet / LLaMA-era pipelines (Wenzek et al. 2020; Joulin et al. 2017),
    the learned complement to the rule-based Gopher gate above. Training
    is offline; at corpus scale the pipeline runs INFERENCE ONLY, which
    is exactly what this operator models.

    The feature map is the engine's portable signed hashing trick
    (`text.feature_hashing`: md5 bucket + ±1 sign — engine-exact
    integers) and the weight vector is a deterministic published
    artifact: ``w_b = pmod(b·2654435761 + seed, 1000003)/1000003 − 0.5``
    — pure integer arithmetic + one IEEE division, reproducible in any
    SQL engine (in production, swap in real trained weights as a
    broadcast literal table; every physical property is identical).

    No transcendentals: the release is the raw LOGIT (the sigmoid is
    monotone, so thresholding the logit IS thresholding the
    probability) — bit-exact cross-engine with the sorted-fold sum
    discipline (per-doc terms ≤ n_buckets).

    Shape: tokenize/explode map-only → ONE (doc, bucket) partial-agg
    shuffle (the feature_hashing shuffle) → per-doc fold; the weight
    expression is computed inline from the bucket id (no join at all).
    Docs with zero surviving features release logit 0.

    Output: ``(id_col, n_feats, logit_r, keep)``.
    """
    from dbms_data_anonymity_differential_privacy_spark.operators.text import feature_hashing

    feats = feature_hashing(df, n_buckets=n_buckets, id_col=id_col, text_col=text_col)
    w = (
        F.pmod(F.col("bucket") * F.lit(2654435761) + F.lit(int(weights_seed)), F.lit(1000003))
        .cast("double") / F.lit(1000003.0) - F.lit(0.5)
    )
    terms = feats.select(
        id_col, (F.col("feat").cast("double") * w).alias("__t")
    )
    per_doc = terms.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_feats"),
        F.expr(
            "aggregate(array_sort(collect_list(__t)), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
        ).alias("__logit"),
    )
    base = df.select(id_col)
    return base.join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
        F.round(F.coalesce("__logit", F.lit(0.0)), 9).alias("logit_r"),
        (F.coalesce("__logit", F.lit(0.0)) > F.lit(float(threshold))).alias("keep"),
    )


def quality_gating_curve(
    df: DataFrame,
    n_tiles: int = 10,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """X187 — quality-gating (data-pruning) curve: for each score decile
    threshold, how much of the corpus survives the gate — the curve a
    data-mix owner reads before choosing a pruning threshold (Sorscher
    et al. 2022 "Beyond neural scaling laws" makes the keep-fraction the
    decision variable; every CCNet/LLaMA-style pipeline picks its
    quality cut from exactly this table).

    Documents are scored by the linear quality classifier
    (:func:`linear_quality_score`, the engine-exact logit) and ranked
    into ``n_tiles`` exact equal-frequency tiles on ``(logit DESC, id)``
    — the ntile assignment is a total order, partitioning-independent.
    Row ``d`` of the release describes gating AT tile d's floor:

        (tile, score_floor_r, n_docs_cum, n_tokens_cum,
         frac_docs_r, frac_tokens_r)

    — documents and whitespace tokens retained if every tile <= d is
    kept, as exact cumulative integers and int/int fractions (9 dp).
    Token counts use the x05 whitespace contract (empty tokens dropped).

    Scale shape: scoring is the x173 shape (one (doc, bucket) shuffle);
    tokens are counted in the same map-only projection that carries the
    text; the ntile + cumulative windows run on the per-DOCUMENT slim
    relation, and the released relation is n_tiles rows. At 10^9+ docs
    the single-partition ntile window would re-bucket by score range
    first (the x142 spine discipline) — at any tested scale the
    per-doc relation is far below executor memory.
    """
    from pyspark.sql import Window

    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")
    scored = linear_quality_score(df, n_buckets=n_buckets, id_col=id_col, text_col=text_col)
    toks = fan_out(df).select(
        F.col(id_col),
        F.size(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda w: w != ""
            )
        ).cast("long").alias("__nt"),
    )
    ranked = scored.join(toks, id_col).select(
        F.col("logit_r"),
        "__nt",
        F.ntile(n_tiles)
        .over(Window.orderBy(F.desc("logit_r"), F.col(id_col)))
        .alias("tile"),
    )
    per_tile = ranked.groupBy("tile").agg(
        F.count(F.lit(1)).alias("__d"),
        F.sum("__nt").alias("__t"),
        F.min("logit_r").alias("score_floor_r"),
    )
    cum = Window.orderBy("tile").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.orderBy("tile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per_tile.select(
        F.col("tile").cast("int").alias("tile"),
        "score_floor_r",
        F.sum("__d").over(cum).cast("long").alias("n_docs_cum"),
        F.sum("__t").over(cum).cast("long").alias("n_tokens_cum"),
        F.round(
            F.sum("__d").over(cum).cast("double") / F.sum("__d").over(tot).cast("double"), 9
        ).alias("frac_docs_r"),
        F.round(
            F.sum("__t").over(cum).cast("double") / F.sum("__t").over(tot).cast("double"), 9
        ).alias("frac_tokens_r"),
    )


def boilerplate_by_source(
    docs: DataFrame,
    line_tokens: int = 4,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """X233 — per-source boilerplate-line detection (the C4/CCNet
    cleaning stage: navigation chrome, cookie banners, footers — lines
    repeated across many documents of one SOURCE are template, not
    content). A line is boilerplate when it appears in >= ``min_df``
    distinct documents of its source; the release is the per-source
    scorecard a curation pipeline gates on: how much of the source's
    token mass is template?

    The fixture's documents are single-line token streams, so documents
    are first segmented into ``line_tokens``-token lines (deterministic
    segmentation, the x176 convention — real corpora would split on
    newlines instead).

    Output per source: ``(source, n_docs, n_lines, n_distinct_lines,
    n_boilerplate_lines, boilerplate_token_share_r)`` — the share is
    (token mass of boilerplate line occurrences) / (total token mass),
    both exact int64, one IEEE division at 9 dp.

    Scale shape (100 TB): tokenize/segment is map-only; ONE
    (source, line) aggregation with map-side combining carries the
    document frequencies (the word-count shape); the per-source rollup
    runs on the distinct-line relation. No joins back to documents —
    the occurrence counts ride the same aggregation.
    """
    if line_tokens < 1 or min_df < 1:
        raise ValueError("line_tokens and min_df must be >= 1")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    e = docs.select(
        F.col(id_col).alias("__id"),
        F.col(source_col).alias("source"),
        F.posexplode(toks).alias("__pos", "__tok"),
    )
    lines = e.groupBy(
        "source",
        "__id",
        F.floor(F.col("__pos") / F.lit(line_tokens)).alias("__lpos"),
    ).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__tok"))),
                lambda s: s["__tok"],
            ),
            " ",
        ).alias("__line"),
        F.count(F.lit(1)).cast("long").alias("__ntok"),
    )
    # lines feeds the per-line DF relation AND the per-source doc/line
    # counts — persist the slim segmented relation so the tokenize +
    # segment pass runs once (ledger-tracked)
    from dbms_data_anonymity_differential_privacy_spark.operators.util import track_cached

    lines = track_cached(lines.persist())
    per_line = lines.groupBy("source", "__line").agg(
        F.countDistinct("__id").cast("long").alias("__df"),
        F.count(F.lit(1)).cast("long").alias("__occ"),
        F.sum("__ntok").cast("long").alias("__tok_mass"),
    )
    docs_per_source = lines.groupBy("source").agg(
        F.countDistinct("__id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )
    roll = per_line.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_lines"),
        F.sum(F.when(F.col("__df") >= min_df, 1).otherwise(0))
        .cast("long")
        .alias("n_boilerplate_lines"),
        F.sum(F.when(F.col("__df") >= min_df, F.col("__tok_mass")).otherwise(0))
        .cast("long")
        .alias("__bp_mass"),
        F.sum("__tok_mass").cast("long").alias("__mass"),
    )
    out = docs_per_source.join(roll, "source")
    share = F.when(
        F.col("__mass") > 0,
        F.col("__bp_mass").cast("double") / F.col("__mass").cast("double"),
    ).otherwise(F.lit(0.0))
    return out.select(
        "source",
        "n_docs",
        "n_lines",
        "n_distinct_lines",
        "n_boilerplate_lines",
        F.round(share, 9).alias("boilerplate_token_share_r"),
    )


def dedup_survivor_bias(
    docs: DataFrame,
    pairs: DataFrame,
    thresholds: dict | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """X239 — dedup survivor-bias audit: does near-dedup systematically
    drop different-quality documents than it keeps? The curation-QA
    check nobody runs until it bites — greedy min-id dropping is
    quality-blind, and if duplicated content skews long/short or
    high/low quality, the post-dedup corpus distribution silently
    shifts. Releases the Gopher pass rate and mean token count of KEPT
    vs DROPPED documents side by side; a large gap means the dedup
    policy needs the quality-aware survivor variant (x82).

    ``pairs`` is any near-dup pair relation; a document is "dropped"
    when it appears as ``id_b`` (the greedy policy, Lee et al. 2022
    §3.2 — consistent with x03_dedup_corpus and x228).

    Output (two rows): ``(status, n_docs, n_pass_gopher, pass_rate_r,
    mean_tokens_r)`` at 9 dp — exact integer numerators, one division
    each.

    Scale shape (100 TB): the quality flags are x27's map-only
    projection; the drop set is one distinct over the pair relation's
    dropped column; one broadcast-able join and a 2-row rollup.
    """
    gq = gopher_quality(
        docs, id_col=id_col, thresholds=dict(thresholds or {}), keep_cols=()
    )
    drops = (
        pairs.select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("__dropped", F.lit(1))
    )
    j = gq.join(drops, id_col, "left")
    out = j.groupBy(
        F.when(F.col("__dropped").isNotNull(), F.lit("dropped"))
        .otherwise(F.lit("kept"))
        .alias("status")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("pass_gopher").cast("long")).cast("long").alias("n_pass_gopher"),
        F.sum("n_tokens").cast("long").alias("__tok"),
    )
    nd = F.col("n_docs").cast("double")
    return out.select(
        "status",
        "n_docs",
        "n_pass_gopher",
        F.round(F.col("n_pass_gopher").cast("double") / nd, 9).alias("pass_rate_r"),
        F.round(F.col("__tok").cast("double") / nd, 9).alias("mean_tokens_r"),
    )
