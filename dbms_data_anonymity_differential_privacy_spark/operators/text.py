"""Text analysis for training-data pipelines — SURVEY §2c X5 + north-star
text operators (language-ID, quality scoring, token counting, document
fingerprinting).

Absent from the reference (its only data is census rows); designed from
the public Spark API. Everything here is pure built-in column expressions
(JVM-side, whole-stage codegen, no UDFs) so the 100 TB scan is one
map-only stage — and every expression has an exact DuckDB twin for the
oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.util import fan_out, track_cached

# Whitespace tokenizer (P-analog of str.split()).
WS = r"\s+"
# BPE-ish pretokenizer: letter runs, digit runs, or single non-space symbols
# (a simplification of the GPT-2 pretokenizer regex, kept to ASCII classes so
# Java and RE2-style engines agree).
BPE_ISH = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"

# Tiny per-language stopword probes for the n-gram/stopword language-ID
# heuristic. Word-boundary regexes keep Spark and DuckDB semantics aligned.
LANG_PROBES: dict[str, str] = {
    "en": r"\b(the|and|of|to|in)\b",
    "de": r"\b(der|die|und|das|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|los|las|es|una)\b",
    "zh": r"[一-鿿]",
}


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, WS)))


def bpe_ish_token_count(text: Column) -> Column:
    """Token count under the BPE-ish pretokenizer regex."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH), 0))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the casefolded,
    whitespace-normalized text. Identical hex in any engine."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), WS, " "))


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: length factor x (1 - symbol ratio) x
    stopword-presence factor. Deterministic, SQL-expressible."""
    n = F.length(text)
    n_sym = F.length(F.regexp_replace(text, "[A-Za-z0-9 ]", ""))
    sym_ratio = F.when(n > 0, n_sym / n).otherwise(F.lit(1.0))
    len_factor = F.least(n / F.lit(200.0), F.lit(1.0))
    stop_hits = F.size(F.regexp_extract_all(text, F.lit(LANG_PROBES["en"]), 0))
    stop_factor = F.least(F.lit(0.5) + stop_hits / F.lit(10.0), F.lit(1.0))
    return F.round(len_factor * (F.lit(1.0) - sym_ratio) * stop_factor, 9)


def lang_scores(text: Column) -> dict[str, Column]:
    return {
        lang: F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 0))
        for lang, pat in LANG_PROBES.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax of the stopword probes, ties broken by probe order; 'und'
    (undetermined) when no probe hits."""
    scores = lang_scores(text)
    langs = list(scores)
    best = scores[langs[0]]
    for lg in langs[1:]:
        best = F.greatest(best, scores[lg])
    out = F.lit("und")
    # build reverse so earlier langs win ties
    for lg in reversed(langs):
        out = F.when((scores[lg] == best) & (best > 0), F.lit(lg)).otherwise(out)
    return out


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Annotate a document relation with all text features in one map-only
    projection."""
    t = F.col(text_col)
    return fan_out(df).select(
        "*",
        F.length(t).alias("n_chars_calc"),
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        fingerprint(t).alias("fingerprint"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
    )


def text_stats(df: DataFrame, text_col: str = "text", by: str = "lang") -> DataFrame:
    """X5 — per-group corpus statistics."""
    feats = with_text_features(df, text_col)
    return feats.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_chars_calc"), 9).alias("avg_chars"),
        F.round(F.avg("quality"), 9).alias("avg_quality"),
        F.countDistinct("fingerprint").alias("n_unique_fingerprints"),
    )


def vocab_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 50,
) -> DataFrame:
    """Corpus vocabulary statistics: the ``top_k`` tokens by term frequency
    with their document frequencies — the first look any tokenizer/corpus
    audit takes at a new crawl.

    Physical shape is canonical word-count: explode → groupBy(token) with
    map-side partial aggregation (the hot tokens collapse inside each scan
    partition before the shuffle, so the exchange carries near-distinct
    tokens, not token occurrences). Document frequency rides the same
    aggregation as a two-phase distinct (partial distinct per partition).
    The top-k is ``TakeOrderedAndProject`` — per-partition heaps, no
    global sort — with ties broken by token text for determinism.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), WS)
    # explode_outer: a plain explode would let Catalyst infer size()>0 and
    # push the tokenization below the fan-out exchange into a
    # single-partition filter (see dedup.contamination_check).
    e = (
        fan_out(df)
        .select(F.col(id_col), F.explode_outer(toks).alias("token"))
        .where(F.col("token").isNotNull() & (F.col("token") != ""))
    )
    agg = e.groupBy("token").agg(
        F.count(F.lit(1)).alias("term_freq"),
        F.countDistinct(F.col(id_col)).alias("doc_freq"),
    )
    return agg.orderBy(F.desc("term_freq"), F.asc("token")).limit(top_k)


def repetition_metrics(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document repetition signals (the Gopher/MassiveText-style
    quality gates, Rae et al. 2021 §A1.1): duplicate-token fraction and
    top-bigram occurrence fraction. Boilerplate and generation loops show
    up as high repetition long before a human reads the text.

    Physical shape: FULLY MAP-SIDE — no explode, no shuffle. The
    duplicate-token fraction is ``array_distinct`` over the token array.
    The top-bigram count is the longest equal-run in the SORTED per-row
    bigram-hash array (mode of a multiset == longest run after sort),
    computed with one ``array_sort`` + one ``aggregate`` fold per row —
    O(m log m) per doc in-place, versus an explode that would shuffle
    every bigram occurrence. Bigrams are compared as ``xxhash64(tok_i,
    tok_{i+1})`` 8-byte hashes, never concatenated strings (same
    up-to-collision argument as the dedup family). The bigram total per
    doc is ``n_tokens - 1`` by construction. At 100 TB this is one scan,
    embarrassingly parallel, zero exchanges.

    Docs with < 2 tokens are excluded (no bigram is defined; a fraction
    over an empty support would be noise, and the gate's callers treat
    missing as "too short to judge").
    """
    from dbms_data_anonymity_differential_privacy_spark.operators.util import fan_out

    t = F.split(F.trim(F.col(text_col)), WS)
    base = (
        fan_out(df)
        .select(
            F.col(id_col),
            t.alias("__t"),
            F.size(t).alias("n_tokens"),
        )
        .where(F.col("n_tokens") >= 2)
        .select(
            id_col,
            "n_tokens",
            F.round(
                F.lit(1.0) - F.size(F.array_distinct(F.col("__t"))) / F.col("n_tokens"), 9
            ).alias("dup_token_frac"),
            # CASE guard: Catalyst may collapse this projection with the
            # size>=2 filter and evaluate the lambda on short rows, where
            # sequence(0, size-2) DESCENDS (e.g. [0,-1]) and the index
            # throws under ANSI mode. The guard makes the expression total.
            F.expr(
                "CASE WHEN size(__t) >= 2 THEN "
                "array_sort(transform(sequence(0, size(__t) - 2), "
                "i -> xxhash64(__t[i], __t[i + 1]))) "
                "ELSE CAST(array() AS array<bigint>) END"
            ).alias("__bg"),
        )
    )
    # Longest equal-run fold over the sorted hash array: state =
    # (prev, current run, best run). Sorted order makes every bigram's
    # occurrences adjacent, so best == the modal bigram's count.
    top_c = F.expr(
        "aggregate(__bg, "
        "named_struct('prev', CAST(NULL AS BIGINT), 'run', CAST(0 AS BIGINT), "
        "'best', CAST(0 AS BIGINT)), "
        "(s, x) -> named_struct("
        "'prev', x, "
        "'run', CASE WHEN s.prev IS NOT NULL AND x = s.prev THEN s.run + 1 "
        "ELSE CAST(1 AS BIGINT) END, "
        "'best', greatest(s.best, CASE WHEN s.prev IS NOT NULL AND x = s.prev "
        "THEN s.run + 1 ELSE CAST(1 AS BIGINT) END)), "
        "s -> s.best)"
    )
    return base.select(
        id_col,
        "n_tokens",
        "dup_token_frac",
        F.round(top_c / (F.col("n_tokens") - 1), 9).alias("top_bigram_frac"),
    )


def tfidf_topk(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    exact: bool = True,
) -> DataFrame:
    """X99 — top-``k`` TF-IDF keyword terms per document.

    The per-document salience primitive of corpus curation (topical
    filtering, keyword-facet search, dataset cards): score each term by
    ``tf · ln((N+1)/(df+1))`` (the +1-smoothed idf) and keep each doc's
    ``k`` highest-scoring terms.

    Scale shape:

    - ``tf`` is the canonical word-count shuffle: explode → partial
      aggregation on ``(doc, token)`` — hot tokens collapse map-side, the
      exchange carries near-distinct (doc, token) pairs.
    - ``df`` re-aggregates that (doc, token) relation by token — a second,
      much smaller shuffle (vocab-sized output).
    - idf is NEVER computed by the JVM: the distinct document-frequency
      VALUES (a metadata-sized set — integer counts under a heavy-tailed
      distribution, bounded by the number of distinct class sizes, the
      x23 log-table precedent) are collected once and the C-libm
      ``math.log`` literals broadcast back, so the scores match DuckDB's
      libm ``ln`` bit-for-bit.
    - Per-doc top-k is ``row_number() <= k`` over (score desc, term asc —
      ties after 6-dp rounding are broken textually on both engines),
      which compiles to a map-side WindowGroupLimit partial: the final
      doc-keyed exchange carries at most ~k·docs rows.

    Output: ``(id_col, term, tf, df_docs, tfidf_r, rnk)``.
    """
    import math

    from pyspark.sql import Window

    toks = F.split(F.lower(F.trim(F.col(text_col))), WS)
    e = (
        fan_out(df)
        .select(F.col(id_col), F.explode_outer(toks).alias("term"))
        .where(F.col("term").isNotNull() & (F.col("term") != ""))
    )
    tf = e.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # persisted: backs the df-frequency aggregation, the distinct-value
    # collect, and the score join without re-running the explode shuffle
    track_cached(tf.persist())
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    n_docs = tf.select(id_col).distinct().count()
    if exact:
        # oracle mode: distinct df values → driver C-libm table (DuckDB
        # ln bit-exactness; see module docstring)
        vals = sorted(
            int(r["df_docs"]) for r in dfreq.select("df_docs").distinct().collect()
        )
        spark = df.sparkSession
        logtab = spark.createDataFrame(
            [(v, math.log((n_docs + 1.0) / (v + 1.0))) for v in vals],
            "df_docs long, __idf double",
        )
        base = tf.join(dfreq, "term").join(F.broadcast(logtab), "df_docs")
        idf = F.col("__idf")
    else:
        # production mode: JVM log inside codegen, no driver-side distinct
        # collect (the df-value set, though count-histogram bounded, still
        # grows with the corpus)
        base = tf.join(dfreq, "term")
        idf = F.log(F.lit(n_docs + 1.0) / (F.col("df_docs") + F.lit(1.0)))
    scored = base.select(
        F.col(id_col),
        "term",
        "tf",
        "df_docs",
        F.round(F.col("tf") * idf, 6).alias("tfidf_r"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf_r"), F.asc("term"))
    return scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)


def oov_rate(
    df: DataFrame,
    vocab_size: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X117 — per-document out-of-vocabulary rate against the corpus's
    own top-``vocab_size`` vocabulary: the tokenizer-coverage screen
    (docs full of OOV tokens inflate sequence lengths and signal
    encoding junk, boilerplate IDs, or the wrong language).

    Vocabulary = the ``vocab_size`` most frequent tokens (freq desc,
    token asc — deterministic); in production the vocab is a published
    artifact, here it is derived in-engine so the whole release is
    self-contained and oracle-checkable.

    Shape: one word-count aggregation builds the vocab
    (TakeOrderedAndProject top-k); scoring is the canonical word-count
    shuffle — explode → BROADCAST left join against the vocab relation
    (vocab-sized by construction) → per-doc aggregation. Token strings
    shuffle once, as (doc, token) partial counts.

    Output: ``(id_col, n_tokens, n_oov, oov_rate_r)``; empty docs
    release ``(0, 0, 0.0)``.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), WS)
    e = (
        fan_out(df)
        .select(F.col(id_col), F.explode_outer(toks).alias("tok"))
        .where(F.col("tok").isNotNull() & (F.col("tok") != ""))
    )
    track_cached(e.persist())
    vocab = (
        e.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("__f"))
        .orderBy(F.desc("__f"), F.asc("tok"))
        .limit(vocab_size)
        .select("tok", F.lit(True).alias("__in_vocab"))
    )
    scored = (
        e.join(F.broadcast(vocab), "tok", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
    )
    base = df.select(F.col(id_col))
    return base.join(scored, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
        F.round(
            F.when(
                F.coalesce("n_tokens", F.lit(0)) > 0,
                F.coalesce("n_oov", F.lit(0)) / F.coalesce("n_tokens", F.lit(0)).cast("double"),
            ).otherwise(0.0),
            9,
        ).alias("oov_rate_r"),
    )


def jsd_divergence(
    df: DataFrame,
    source_a: str,
    source_b: str,
    top_k: int = 300,
    text_col: str = "text",
    source_col: str = "source",
    exact: bool = True,
) -> DataFrame:
    """X145 — Jensen-Shannon divergence between two sources' word
    distributions over a shared top-``top_k`` vocabulary (+ an OTHER
    bucket, so both distributions stay complete): the bounded, symmetric
    corpus-drift measure — 0 = identical, ln 2 = disjoint — that
    complements PSI (x67, binned scalar drift) and the overlap matrix
    (x113, shingle containment) with a proper distributional distance,
    the quantity mixture tuning and domain-shift monitors report (Lin
    1991; the pretraining-data-analysis standard).

    Exactness: vocabulary selection is (total count desc, token asc) —
    deterministic cross-engine; per-word probabilities never materialize.
    Each KL term is ``(a_w/A)*ln(2u/(u+v))`` with ``u = a_w*B,
    v = b_w*A`` exact int64 products — the ln args are ratios of exact
    integers, evaluated ONCE per distinct (u, v) pair by driver-side
    C-libm ``math.log`` and broadcast back (the x23/x128 idiom; DuckDB's
    ``ln`` binds the same libm, JVM ``Math.log`` never runs). Term sums
    are sorted left folds (x128), so float addition order is pinned.

    Shape: ONE (source, token) word-count shuffle restricted to the two
    sources; everything after runs on the (top_k+1)-row vector relation.
    The collected log-table is bounded by ``top_k + 1`` rows.

    Output (single row): ``(n_terms, a_total, b_total, jsd_r,
    jsd_norm_r)`` — ``jsd_norm = jsd / ln 2`` in [0, 1].
    """
    import math

    spark = df.sparkSession
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), WS), lambda t: t != "")
    two = df.filter(F.col(source_col).isin([source_a, source_b]))
    wc = (
        fan_out(two)
        .select(F.col(source_col).alias("__s"), F.explode(toks).alias("tok"))
        .groupBy("__s", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    track_cached(wc)
    a_cnt = F.sum(F.when(F.col("__s") == source_a, F.col("cnt")).otherwise(0))
    b_cnt = F.sum(F.when(F.col("__s") == source_b, F.col("cnt")).otherwise(0))
    per_tok = wc.groupBy("tok").agg(
        a_cnt.alias("a"), b_cnt.alias("b"), (a_cnt + b_cnt).alias("t")
    )
    vocab = per_tok.orderBy(F.desc("t"), "tok").limit(int(top_k))
    tot = per_tok.agg(F.sum("a").alias("A"), F.sum("b").alias("B"))
    vsum = vocab.agg(
        F.coalesce(F.sum("a"), F.lit(0)).alias("va"),
        F.coalesce(F.sum("b"), F.lit(0)).alias("vb"),
    )
    other = (
        tot.crossJoin(F.broadcast(vsum))
        .select(
            F.lit(" <other>").alias("tok"),
            (F.col("A") - F.col("va")).alias("a"),
            (F.col("B") - F.col("vb")).alias("b"),
        )
    )
    vec = track_cached(vocab.select("tok", "a", "b").unionByName(other).persist())

    # exact int cross-products; in exact mode the ln args are evaluated
    # once per distinct pair by driver libm and broadcast back
    totals = tot.collect()[0]
    A, B = int(totals["A"]), int(totals["B"])
    if A == 0 or B == 0:
        raise ValueError("both sources must contain at least one token")
    uved = vec.select(
        "tok",
        (F.col("a") * F.lit(B)).alias("u"),
        (F.col("b") * F.lit(A)).alias("v"),
        F.col("a"),
        F.col("b"),
    )
    if exact:
        uv = [
            (int(r["a"]) * B, int(r["b"]) * A)
            for r in vec.select("a", "b").distinct().collect()
        ]
        ln_rows = [
            (
                u,
                v,
                math.log(2.0 * u / (u + v)) if u > 0 else None,
                math.log(2.0 * v / (u + v)) if v > 0 else None,
            )
            for u, v in uv
            if u + v > 0
        ]
        ln_tab = spark.createDataFrame(ln_rows, "u long, v long, lnp double, lnq double")
        withln = uved.join(F.broadcast(ln_tab), ["u", "v"], "left")
    else:
        # production mode: JVM log in codegen — same guards (term is 0
        # when the source count is 0), no driver-side distinct collect
        s = (F.col("u") + F.col("v")).cast("double")
        withln = uved.select(
            "tok", "u", "v", "a", "b",
            F.when(F.col("u") > 0, F.log(F.lit(2.0) * F.col("u").cast("double") / s)).alias("lnp"),
            F.when(F.col("v") > 0, F.log(F.lit(2.0) * F.col("v").cast("double") / s)).alias("lnq"),
        )
    terms = withln.select(
        F.when(
            F.col("lnp").isNotNull(),
            (F.col("a").cast("double") / F.lit(float(A))) * F.col("lnp"),
        )
        .otherwise(F.lit(0.0))
        .alias("pt"),
        F.when(
            F.col("lnq").isNotNull(),
            (F.col("b").cast("double") / F.lit(float(B))) * F.col("lnq"),
        )
        .otherwise(F.lit(0.0))
        .alias("qt"),
    )

    def fold(expr: str) -> "F.Column":
        return F.expr(
            f"aggregate(array_sort(collect_list({expr})), "
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )

    s = terms.agg(
        F.count(F.lit(1)).alias("n"), fold("pt").alias("sp"), fold("qt").alias("sq")
    )
    jsd = F.lit(0.5) * (F.col("sp") + F.col("sq"))
    ln2 = F.lit(math.log(2.0))
    return s.select(
        F.col("n").cast("long").alias("n_terms"),
        F.lit(A).cast("long").alias("a_total"),
        F.lit(B).cast("long").alias("b_total"),
        F.round(jsd, 9).alias("jsd_r"),
        F.round(jsd / ln2, 9).alias("jsd_norm_r"),
    )


def textrank_keywords(
    docs: DataFrame,
    text_col: str = "text",
    iters: int = 10,
    top: int = 30,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
    the word co-occurrence graph (adjacent tokens, undirected, deduped)
    picks the corpus's structurally central vocabulary — the unsupervised
    keyword signal next to tf-idf (x99).

    Composition: tokenization is the x19 convention; adjacency pairs come
    from a map-only array transform (struct-zipping each token with its
    successor — no per-document window shuffle); words get dense integer
    ids (row_number over the sorted distinct vocabulary, a slim global
    window) so the INTEGER PageRank (``operators.graph.pagerank_int``,
    bit-exact cross-engine) can run unchanged; the final cut is a
    distributed TakeOrdered by (rank desc, word).

    Output: ``(word, rank_ppb)``, top ``top`` rows.
    """
    from pyspark.sql import Window

    from .graph import pagerank_int

    d = docs.select(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("t")
    )
    pairs = (
        d.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(t) >= 2 THEN transform(sequence(0, size(t) - 2),"
                    " i -> struct(t[i] AS wa, t[i+1] AS wb)) ELSE"
                    " array() END"
                )
            ).alias("p")
        )
        .select(F.col("p.wa").alias("wa"), F.col("p.wb").alias("wb"))
        .filter((F.col("wa") != "") & (F.col("wb") != "") & (F.col("wa") != F.col("wb")))
    )
    und = pairs.select(
        F.least("wa", "wb").alias("a"), F.greatest("wa", "wb").alias("b")
    ).distinct()
    vocab = (
        d.select(F.explode("t").alias("w"))
        .filter(F.col("w") != "")
        .distinct()
        .withColumn("wid", F.row_number().over(Window.orderBy("w")))
    )
    va = vocab.select(F.col("w").alias("a"), F.col("wid").alias("ida"))
    vb = vocab.select(F.col("w").alias("b"), F.col("wid").alias("idb"))
    ids = und.join(va, on="a").join(vb, on="b")
    edges = ids.selectExpr("ida AS src", "idb AS dst").unionAll(
        ids.selectExpr("idb AS src", "ida AS dst")
    )
    pr = pagerank_int(edges, iters=iters)
    return (
        pr.join(vocab, pr["node"] == vocab["wid"])
        .select(F.col("w").alias("word"), F.col("rank_ppb"))
        .orderBy(F.col("rank_ppb").desc(), F.col("word").asc())
        .limit(top)
    )


def feature_hashing(
    docs: DataFrame,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Signed feature hashing (the "hashing trick", Weinberger et al.
    ICML 2009): token counts fold into a fixed ``n_buckets``-dim sparse
    vector with a ±1 sign hash, so collisions cancel in expectation —
    the constant-memory featurizer for unbounded vocabularies.

    Both hashes derive from the PORTABLE md5 of the token (bucket = the
    first 8 hex chars as an integer mod ``n_buckets``; sign = the 9th
    hex char's top bit), so the feature matrix is engine-exact and
    integer-valued. Shape: tokenize/explode map-only, then ONE
    (doc, bucket) partial-agg shuffle. Zero entries are not emitted
    (sparse representation).

    Output: ``(id_col, bucket, feat)``.
    """
    toks = (
        docs.select(
            id_col,
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
        .withColumn("__h", F.md5(F.col("w").cast("binary")))
    )
    bucket = F.pmod(
        F.conv(F.substring("__h", 1, 8), 16, 10).cast("long"), F.lit(n_buckets)
    )
    sign = F.when(F.substring("__h", 9, 1) < "8", 1).otherwise(-1)
    return (
        toks.select(id_col, bucket.alias("bucket"), sign.alias("__s"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("__s").cast("long").alias("feat"))
        .filter(F.col("feat") != 0)
    )


def good_turing_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """X184 — Good–Turing unseen-mass and richness estimates (Good 1953;
    Gale & Sampson 1995 for the smoothing framing; Chao 1984 for the
    richness bound): from the token frequency spectrum alone, estimate
    (a) the probability mass of token types NOT yet seen — the number
    every vocabulary/coverage decision (tokenizer fit, OOV budget, "have
    we crawled enough?") actually needs — and (b) the Chao1 lower bound
    on the true vocabulary size.

    - ``gt_unseen_r``: V1 / N — the Good–Turing estimate that the next
      token drawn is a NEW type (V1 = hapax count, N = token count);
    - ``coverage_r``: 1 − V1/N, the estimated type coverage;
    - ``chao1_r``: V + V1(V1−1) / (2(V2+1)) — the bias-corrected Chao1
      richness floor (exact rational; the +1 keeps it defined when no
      type occurs exactly twice).

    All three are one exact integer-ratio expression each, rounded at
    6 dp. Optionally grouped (e.g. per language) via ``group_cols``.

    Scale shape: one tokenization pass, ONE shuffle into (token, count),
    a second slim aggregation of the frequency spectrum (counts of
    counts) — the released relation is one row per group. The spectrum
    aggregation partial-combines, so corpus-scale token skew collapses
    map-side.
    """
    gcols = list(group_cols or [])
    toks = F.split(F.lower(F.trim(F.col(text_col))), WS)
    e = fan_out(df).select(*gcols, F.explode(toks).alias("__t")).filter(F.col("__t") != "")
    tf = e.groupBy(*gcols, "__t").agg(F.count(F.lit(1)).alias("__c"))
    spec = tf.groupBy(*gcols).agg(
        F.sum("__c").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum((F.col("__c") == 1).cast("long")).alias("v1"),
        F.sum((F.col("__c") == 2).cast("long")).alias("v2"),
    )
    n = F.col("n_tokens").cast("double")
    v1 = F.col("v1").cast("double")
    v2 = F.col("v2").cast("double")
    return spec.select(
        *gcols,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("vocab").cast("long").alias("vocab"),
        F.col("v1").cast("long").alias("v1"),
        F.col("v2").cast("long").alias("v2"),
        F.round(v1 / n, 6).alias("gt_unseen_r"),
        F.round(1.0 - v1 / n, 6).alias("coverage_r"),
        F.round(
            F.col("vocab").cast("double") + v1 * (v1 - 1.0) / (2.0 * (v2 + 1.0)), 6
        ).alias("chao1_r"),
    )


def heaps_fit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X185 — Heaps' law fit (Heaps 1978; Herdan 1960): vocabulary growth
    ``V(N) ≈ K·N^beta`` — the planning curve for "how much bigger does
    the vocabulary get if we crawl 10x more?". The exponent beta (~0.5
    for natural language) is the released quantity; a corpus whose beta
    is drifting up is picking up junk (serial numbers, hashes), one
    drifting to 0 is saturating.

    The growth CURVE is computed exactly, one point per document in
    ``id_col`` order (a deterministic corpus order both engines share):
    ``N(d)`` = cumulative token count through doc d, ``V(d)`` =
    cumulative distinct types — each type counted at its FIRST document
    (min doc id per token: a partial-combining aggregation, no
    corpus-order scan of occurrences). The fit is closed-form log-log
    OLS over all curve points: ``beta = (n·Σxy − Σx·Σy) /
    (n·Σx² − (Σx)²)`` with x = ln N(d), y = ln V(d), ``K = exp(ȳ −
    beta·x̄)``; both engines sum the same libm ln values (the x145/x154
    contract), released at 6 dp.

    Output (single row): ``(n_docs, n_tokens, vocab, beta_r, k_r)``.

    Scale shape: the two corpus-wide shuffles are (token → first doc)
    and (doc → token count); the curve and the fit then live on the
    per-DOCUMENT relation (one row per doc — millions, not billions),
    with two cumulative windows and one closed-form aggregation over it.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), WS)
    e = fan_out(df).select(F.col(id_col), F.explode(toks).alias("__t")).filter(
        F.col("__t") != ""
    )
    per_doc = e.groupBy(id_col).agg(F.count(F.lit(1)).alias("__nt"))
    first = e.groupBy("__t").agg(F.min(id_col).alias("__fd"))
    new_types = first.groupBy(F.col("__fd").alias(id_col)).agg(
        F.count(F.lit(1)).alias("__nv")
    )
    from pyspark.sql import Window

    cum = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        per_doc.join(new_types, id_col, "left")
        .select(id_col, "__nt", F.coalesce("__nv", F.lit(0)).alias("__nv"))
        .select(
            id_col,
            F.sum("__nt").over(cum).alias("__N"),
            F.sum("__nv").over(cum).alias("__V"),
        )
        .filter((F.col("__N") > 0) & (F.col("__V") > 0))
    )
    x = F.log(F.col("__N").cast("double"))
    y = F.log(F.col("__V").cast("double"))
    s = curve.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.max("__N").cast("long").alias("n_tokens"),
        F.max("__V").cast("long").alias("vocab"),
    )
    beta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").cast("long").alias("n_docs"),
        "n_tokens",
        "vocab",
        F.round(beta, 6).alias("beta_r"),
        F.round(
            F.exp(F.col("sy") / F.col("n") - beta * (F.col("sx") / F.col("n"))), 6
        ).alias("k_r"),
    )


def classification_eval(
    df: DataFrame,
    gold_col: str,
    pred_col: str,
) -> DataFrame:
    """X189 — per-class classification evaluation: precision, recall, F1
    for any (gold, prediction) pair of label columns — the standard
    eval table behind every classifier-driven curation stage (language
    ID x05, quality gate x173, domain gate x85). Exact integer
    tp / n_gold / n_pred counts; one division each for P and R; F1 is
    their harmonic mean; all released at 9 dp; classes with no
    predictions release NULL precision (not a fake 0), classes with
    tp = 0 release NULL F1.

    Output, one row per class in the UNION of gold and predicted labels
    (a prediction-only class — e.g. 'und' from the lang-ID — must show
    its precision hit; a gold-only class must show the recall miss)::

        (label, n_gold, n_pred, tp, precision_r, recall_r, f1_r)

    Scale shape: three partial-combined aggregations over the slim
    (gold, pred) projection — each is one shuffle on a label key whose
    cardinality is the class vocabulary; the final joins run on
    class-sized relations.
    """
    pairs = df.select(F.col(gold_col).alias("__g"), F.col(pred_col).alias("__p"))
    gold = pairs.groupBy(F.col("__g").alias("label")).agg(
        F.count(F.lit(1)).alias("n_gold")
    )
    pred = pairs.groupBy(F.col("__p").alias("label")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    tp = (
        pairs.filter(F.col("__g") == F.col("__p"))
        .groupBy(F.col("__g").alias("label"))
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    classes = gold.select("label").union(pred.select("label")).distinct()
    j = (
        classes.join(gold, "label", "left")
        .join(pred, "label", "left")
        .join(tp, "label", "left")
        .select(
            "label",
            F.coalesce("n_gold", F.lit(0)).cast("long").alias("n_gold"),
            F.coalesce("n_pred", F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
        )
    )
    p = F.when(F.col("n_pred") > 0, F.col("tp").cast("double") / F.col("n_pred").cast("double"))
    r = F.when(F.col("n_gold") > 0, F.col("tp").cast("double") / F.col("n_gold").cast("double"))
    return j.select(
        "label", "n_gold", "n_pred", "tp",
        F.round(p, 9).alias("precision_r"),
        F.round(r, 9).alias("recall_r"),
        F.round(
            F.when(
                (F.coalesce(p, F.lit(0.0)) + F.coalesce(r, F.lit(0.0))) > 0,
                2.0 * F.coalesce(p, F.lit(0.0)) * F.coalesce(r, F.lit(0.0))
                / (F.coalesce(p, F.lit(0.0)) + F.coalesce(r, F.lit(0.0))),
            ),
            9,
        ).alias("f1_r"),
    )


def pmi_collocations(
    df: DataFrame,
    min_count: int = 5,
    top: int = 30,
    text_col: str = "text",
) -> DataFrame:
    """Top bigram collocations by pointwise mutual information — the
    classic collocation-extraction readout (Church & Hanks 1990) a
    corpus owner uses to find multi-word units ("new york", "machine
    learning") worth treating as single tokens.

    PMI is released in RATIO form ``lift = P(w1,w2) / (P(w1)·P(w2))
    = c_xy·N / (c_x·c_y)`` — the exp of PMI — so the score is a fixed
    IEEE expression over exact int64 counts with no logs anywhere
    (the monotone transform preserves the ranking exactly). ``c_x`` /
    ``c_y`` are positional marginals (occurrences as first / second
    bigram element), ``N`` = total bigrams. Pairs below ``min_count``
    are pruned (PMI is notoriously noisy on rare pairs); the release is
    the top ``top`` by ``(pmi_lift_r DESC, w1, w2)`` — a total order.

    Output: ``(w1, w2, c_xy, c_x, c_y, pmi_lift_r)`` (6 dp).

    Scale shape: ONE heavy word-count-shaped shuffle (the bigram pair
    count, map-side partial agg); the marginals re-aggregate the
    distinct-pair relation (orders of magnitude smaller than the
    occurrence stream), and the final top-k is a TakeOrderedAndProject
    — map-side partial top-k, never a full sort.
    """
    from dbms_data_anonymity_differential_privacy_spark.operators.util import track_cached

    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), WS), lambda t: t != "")
    base = fan_out(df).select(toks.alias("__t")).where(F.size("__t") >= 2)
    bg = base.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(__t) - 2),"
                " i -> struct(__t[i] AS w1, __t[i + 1] AS w2))"
            )
        ).alias("b")
    ).select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    pc = track_cached(
        bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c_xy")).persist()
    )
    nn = pc.agg(F.sum("c_xy").cast("long").alias("__n"))
    cx = pc.groupBy("w1").agg(F.sum("c_xy").cast("long").alias("c_x"))
    cy = pc.groupBy("w2").agg(F.sum("c_xy").cast("long").alias("c_y"))
    lift = (
        F.col("c_xy").cast("double")
        * F.col("__n").cast("double")
        / (F.col("c_x").cast("double") * F.col("c_y").cast("double"))
    )
    return (
        pc.filter(F.col("c_xy") >= int(min_count))
        .join(cx, on="w1")
        .join(cy, on="w2")
        .join(F.broadcast(nn))
        .select("w1", "w2", "c_xy", "c_x", "c_y", F.round(lift, 6).alias("pmi_lift_r"))
        .orderBy(F.desc("pmi_lift_r"), "w1", "w2")
        .limit(int(top))
    )


def readability_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch reading ease + Flesch–Kincaid grade per document — the
    classic readability gate (Flesch 1948; Kincaid et al. 1975) a
    corpus curator uses alongside the Gopher rules to target an
    audience level.

    Syllables are the standard regex heuristic: vowel-group count
    (``[aeiouy]+`` runs in the lowercased text — groups cannot span
    whitespace, so the text-level count equals the per-word sum with no
    per-word loop). Sentences = ``[.!?]+`` runs, floored at 1. Both
    regexes are plain character classes with identical semantics in
    Java regex and any RE2-style engine. Heuristic disclosure:
    vowel-less tokens count 0 syllables; non-Latin scripts score
    meaningless numbers — gate on lang first.

    Output: ``(id_col, n_words, n_sentences, n_syllables, flesch_r,
    fk_grade_r)`` (6 dp; NULL scores for wordless docs). One map-only
    projection — whole-stage codegen, no shuffle at all.
    """
    t = F.col(text_col)
    words = token_count(t)
    syl = F.size(F.regexp_extract_all(F.lower(t), F.lit("[aeiouy]+"), 0))
    sents = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit("[.!?]+"), 0)), F.lit(1)
    )
    out = fan_out(df).select(
        F.col(id_col),
        words.cast("long").alias("n_words"),
        sents.cast("long").alias("n_sentences"),
        syl.cast("long").alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast("double")
    spw = F.col("n_syllables").cast("double") / F.col("n_words").cast("double")
    return out.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(
            F.when(
                F.col("n_words") > 0,
                F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw,
            ),
            6,
        ).alias("flesch_r"),
        F.round(
            F.when(
                F.col("n_words") > 0,
                F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59),
            ),
            6,
        ).alias("fk_grade_r"),
    )


def token_fertility(df: DataFrame, text_col: str = "text", by: str = "lang") -> DataFrame:
    """Per-group tokenizer fertility: subword (BPE-ish) tokens per
    whitespace word — the number a tokenizer owner watches per language
    (high fertility = the vocabulary underserves that language, costing
    context budget; Rust et al. 2021 make this the headline tokenizer-
    fairness metric).

    Output per group: ``(by, n_docs, n_words, n_bpe_tokens,
    fertility_r, avg_words_r)`` — exact int64 token sums, two IEEE
    divisions (9 dp). One map-only projection + one grouped agg.
    """
    t = F.col(text_col)
    per = fan_out(df).select(
        F.col(by),
        token_count(t).cast("long").alias("__w"),
        bpe_ish_token_count(t).cast("long").alias("__b"),
    )
    return per.groupBy(by).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__w").cast("long").alias("n_words"),
        F.sum("__b").cast("long").alias("n_bpe_tokens"),
        F.round(
            F.sum("__b").cast("double") / F.sum("__w").cast("double"), 9
        ).alias("fertility_r"),
        F.round(
            F.sum("__w").cast("double") / F.count(F.lit(1)).cast("double"), 9
        ).alias("avg_words_r"),
    )


def keyness_llr(
    df: DataFrame,
    target_col: str,
    text_col: str = "text",
    min_count: int = 5,
    top: int = 30,
) -> DataFrame:
    """Distinctive-term extraction by log-likelihood ratio keyness
    (Dunning 1993; Rayson & Garside 2000) — which tokens
    over-represent the target slice vs the rest of the corpus? The
    corpus-linguistics staple behind "what is this source/cluster
    about" readouts, sharper than raw frequency ratios on rare terms.

    ``G² = 2·Σ_cell O·ln(O/E)`` over the 2-cell term row (target,
    rest), expected from the marginals; zero cells contribute 0 (their
    limit). Token counts are exact int64; the two ln terms are fixed
    IEEE expressions (6 dp — the x145/x185 contract). Terms below
    ``min_count`` total occurrences are pruned; release = top ``top``
    by ``(g2_r DESC, token)``, signed by direction (negative G² when
    the term is UNDER-represented in the target).

    Output: ``(token, n_target, n_rest, g2_r)``.

    Scale shape: one word-count shuffle carrying per-token conditional
    counts (target / rest as two SUM columns — never a second pass);
    marginals are one broadcast row; top-k is a TakeOrderedAndProject.
    """
    t = F.filter(F.split(F.lower(F.trim(F.col(text_col))), WS), lambda x: x != "")
    toks = fan_out(df).select(
        F.col(target_col).cast("boolean").alias("__tg"), F.explode(t).alias("__w")
    )
    per = toks.groupBy("__w").agg(
        F.sum(F.col("__tg").cast("int")).cast("long").alias("n_target"),
        F.sum((~F.col("__tg")).cast("int")).cast("long").alias("n_rest"),
    ).filter(F.col("n_target") + F.col("n_rest") >= int(min_count))
    tot = toks.agg(
        F.sum(F.col("__tg").cast("int")).cast("long").alias("__t1"),
        F.sum((~F.col("__tg")).cast("int")).cast("long").alias("__t2"),
    )
    o1 = F.col("n_target").cast("double")
    o2 = F.col("n_rest").cast("double")
    t1 = F.col("__t1").cast("double")
    t2 = F.col("__t2").cast("double")
    e1 = t1 * (o1 + o2) / (t1 + t2)
    e2 = t2 * (o1 + o2) / (t1 + t2)
    g2 = F.lit(2.0) * (
        F.when(o1 > 0, o1 * F.log(o1 / e1)).otherwise(F.lit(0.0))
        + F.when(o2 > 0, o2 * F.log(o2 / e2)).otherwise(F.lit(0.0))
    )
    signed = F.when(o1 / t1 >= o2 / t2, g2).otherwise(-g2)
    return (
        per.join(F.broadcast(tot))
        .select(
            F.col("__w").alias("token"),
            "n_target",
            "n_rest",
            F.round(signed, 6).alias("g2_r"),
        )
        .orderBy(F.desc("g2_r"), "token")
        .limit(int(top))
    )


def msttr(
    docs: DataFrame,
    segment_tokens: int = 50,
    text_col: str = "text",
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """X237 — mean segmental type-token ratio (MSTTR, Johnson 1944): the
    length-robust lexical-diversity number. Plain TTR falls with text
    length (Heaps' law, x185), so corpora of different document lengths
    are incomparable under it; MSTTR scores fixed-size segments and
    averages — the standard corpus-linguistics normalization, and a
    practical LLM-data quality signal (template/spam text has LOW
    segment diversity even when the corpus vocabulary is large).

    Segments are consecutive ``segment_tokens``-token windows per
    document (the x176 segmentation); the trailing partial segment is
    DROPPED (the textbook protocol — partial segments would re-import
    the length bias). Exactness: every kept segment has exactly
    ``segment_tokens`` tokens, so ``mean TTR = Σ distinct_types /
    (segment_tokens · n_segments)`` — exact int64 numerator and
    denominator, ONE IEEE division per group.

    Output per group: ``(group, n_segments, n_tokens, msttr_r)`` at
    9 dp.

    Scale shape (100 TB): tokenize/segment is map-only; one
    (group, doc, segment) distinct-count aggregation with map-side
    combining; one group rollup. No joins.
    """
    if segment_tokens < 1:
        raise ValueError("segment_tokens must be >= 1")
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    e = docs.select(
        F.col(group_col).alias("group"),
        F.col(id_col).alias("__id"),
        F.posexplode(toks).alias("__pos", "__tok"),
    )
    seg = e.groupBy(
        "group",
        "__id",
        F.floor(F.col("__pos") / F.lit(segment_tokens)).alias("__seg"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("__ntok"),
        F.countDistinct("__tok").cast("long").alias("__types"),
    )
    full = seg.filter(F.col("__ntok") == segment_tokens)
    out = full.groupBy("group").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum("__ntok").cast("long").alias("n_tokens"),
        F.sum("__types").cast("long").alias("__sum_types"),
    )
    return out.select(
        "group",
        "n_segments",
        "n_tokens",
        F.round(
            F.col("__sum_types").cast("double") / F.col("n_tokens").cast("double"),
            9,
        ).alias("msttr_r"),
    )


def vocab_coverage(
    docs: DataFrame,
    ks: "Sequence[int]" = (100, 1000, 10000),
    text_col: str = "text",
) -> DataFrame:
    """X240 — vocabulary coverage curve: what fraction of all token
    OCCURRENCES does the top-K vocabulary cover, for each planning
    breakpoint K? The tokenizer/vocab-pruning question (how big must
    the vocab be before <unk> mass is negligible) and the Zipf (x128)
    companion that answers it in budget terms rather than exponents.

    Ranking is deterministic: tokens ordered by (count DESC, token ASC).
    Coverage = Σ counts of rank ≤ K / Σ all counts — exact int64
    numerator and denominator, ONE division per breakpoint.

    Output per breakpoint: ``(k, vocab_size, covered_occurrences,
    total_occurrences, coverage_r)`` at 9 dp, ascending k;
    ``vocab_size = min(k, |V|)``.

    Scale shape (100 TB): one token-frequency aggregation (word-count
    shape); the rank window runs on the vocab-sized relation; the
    breakpoint rollup explodes each vocab row into its ≤|ks| qualifying
    breakpoints (constant factor). Fact rows shuffle once.
    """
    from pyspark.sql import Window

    ks = sorted(set(int(k) for k in ks))
    if not ks or ks[0] < 1:
        raise ValueError("ks must be positive ints")
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # tf feeds the rank window AND the total — persist the vocab-sized
    # relation so the corpus tokenization runs once (ledger-tracked; the
    # consuming action is the caller's)
    tf = track_cached(
        docs.select(F.explode(toks).alias("__t"))
        .where(F.col("__t") != "")
        .groupBy("__t")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        .persist()
    )
    ranked = tf.withColumn(
        "__rn",
        F.row_number().over(Window.orderBy(F.desc("__c"), F.asc("__t"))),
    )
    kdf = F.array(*[F.lit(k) for k in ks])
    hits = ranked.select(
        "__c", "__rn", F.explode(kdf).alias("k")
    ).where(F.col("__rn") <= F.col("k"))
    per_k = hits.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.sum("__c").cast("long").alias("covered_occurrences"),
    )
    total = tf.agg(F.sum("__c").cast("long").alias("total_occurrences"))
    return (
        per_k.join(F.broadcast(total))
        .select(
            "k",
            "vocab_size",
            "covered_occurrences",
            "total_occurrences",
            F.round(
                F.col("covered_occurrences").cast("double")
                / F.col("total_occurrences").cast("double"),
                9,
            ).alias("coverage_r"),
        )
    )
