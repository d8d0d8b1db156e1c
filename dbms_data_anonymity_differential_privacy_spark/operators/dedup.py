"""Deduplication for training-data pipelines — SURVEY §2c X2/X3 +
north-star dedup family (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine).

Absent from the reference; designed from the public Spark API and the
standard near-dup literature (Broder 1997 shingling/MinHash; Charikar 2002
SimHash; Lee et al. 2022 "Deduplicating Training Data Makes Language
Models Better" for the pipeline shape).

Scale notes per operator are inline; the common principle: never form the
O(n^2) pair space — block first (exact key, LSH band, shingle), then score
within blocks.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbms_data_anonymity_differential_privacy_spark.operators.text import fingerprint
from dbms_data_anonymity_differential_privacy_spark.operators.util import (
    fan_out,
    free_local_checkpoint,
    track_cached,
)


def dedup_exact(df: DataFrame, keys: Sequence[str], id_col: str) -> DataFrame:
    """X2 — one representative row per key group: the row with the lowest
    ``id_col`` (deterministic, unlike ``dropDuplicates`` which keeps an
    arbitrary row — determinism matters for reproducible corpus builds).
    One shuffle on the dedup key."""
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(id_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_by_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact content dedup on the normalized-md5 fingerprint — the standard
    first pass of corpus dedup (cheap, hash-partitioned)."""
    return dedup_exact(df.withColumn("__fp", fingerprint(F.col(text_col))), ["__fp"], id_col).drop(
        "__fp"
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (lowercased, whitespace
    tokenized). Built-ins only: slice/transform over the token array."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    n_sh = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    # sequence(0, -1) generates a DESCENDING [0, -1] (Spark sequences
    # reverse direction instead of being empty) → guard the sub-n case
    return F.when(n_sh > 0, F.transform(
        F.sequence(F.lit(0), n_sh - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )).otherwise(F.array().cast("array<string>"))


def hashed_tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """``(id, __th: array<long>)`` — ONE regex tokenization pass and ONE
    xxhash64 per token occurrence, in its own projection.

    This is the shared entry point of the whole near-dup family: Jaccard
    shingles, MinHash signatures, and SimHash votes all derive from the
    token-hash array, so a corpus run through several detectors (see
    :func:`near_dup_suite`) tokenizes ONCE instead of once per detector —
    the regex split + string hashing is the dominant per-doc CPU. The
    projection boundary matters: higher-order-function chains get no
    codegen CSE, so downstream expressions must reference the materialized
    ``__th`` attribute, never re-state the chain."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return fan_out(df).select(
        F.col(id_col),
        F.transform(toks, lambda t: F.xxhash64(t)).alias("__th"),
    )


def shingle_hashes(th: Column, n: int = 3) -> Column:
    """``array<long>`` of n-gram hashes from consecutive token hashes:
    ``xxhash64(th[i], ..., th[i+n-1])``. Set-equivalent to hashing the
    string shingle (injective up to 64-bit collisions) at a fraction of
    the CPU — a string n-gram costs a concat allocation plus a
    variable-length string hash per shingle; this is one fixed-width hash
    of n longs, and each token's string is hashed once total instead of
    once per covering shingle. ``th`` must be a materialized attribute
    (see :func:`hashed_tokens`), not an expression chain."""
    n_sh = F.size(th) - F.lit(n - 1)
    return F.when(
        n_sh > 0,
        F.transform(
            F.sequence(F.lit(0), n_sh - 1),
            lambda i: F.xxhash64(*[F.element_at(th, i + F.lit(j + 1)) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<long>"))


def _finish_pairs(pairs: DataFrame, n_cand: int | None) -> DataFrame:
    """Finish a near-dup pair pipeline under the bounded plan when the
    adaptive stats probe already measured the exact candidate volume.

    The pair pipeline downstream of the persisted shingle relations is a
    cascade of slim-id joins + aggregations; at bench scale AQE turns
    each exchange into its own re-planned query stage (x228 paid 31
    sequential stage-jobs for a 50k-doc corpus). The probe's
    ``(s2 - s1)/2`` is the exact plain-path candidate count, so it is a
    sound gate input: under ``LOOP_AQE_MAX_ROWS`` the whole cascade runs
    in one scoped AQE-off job (util.bounded_plan_result), above it —
    the hot-shingle regime the prefix path exists for — everything is
    untouched, AQE skew-split included. Callers that pass an explicit
    ``prefix_filter`` skip the probe, get ``n_cand=None``, and keep the
    lazy plan."""
    if n_cand is None:
        return pairs
    from dbms_data_anonymity_differential_privacy_spark.operators.util import (
        bounded_plan_result,
    )

    return bounded_plan_result(pairs, n_cand)


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_filter: bool | None = None,
    tokens: DataFrame | None = None,
) -> DataFrame:
    """N-gram Jaccard near-dup pairs — EXACT under either physical
    strategy; the strategy is picked adaptively from the corpus's shingle
    frequency statistics (AQE-style runtime decision, but for the
    algorithm itself):

    - **plain inverted index** (benign corpora): explode → self-join on
      shingle → count intersections. Candidate volume is exactly
      sum over shingles of df², so when that is modest this is the
      fastest path (no ranking pass).
    - **rare-first prefix filter** (SSJoin/PPJoin family; Zipfian
      corpora): a qualifying pair provably shares an element among each
      doc's rarest |X|-ceil(t|X|)+1 shingles (df-ascending global order),
      so hot boilerplate n-grams — whose df² pair volume is THE blowup
      mode on web corpora — never enter candidate generation; candidates
      re-score exactly on the full hashed sets. ~2x slower on skew-free
      data (measured), asymptotically safe on skewed data.

    ``prefix_filter=None`` computes sum(df²) (one tiny job over the
    already-persisted shingle relation) and switches to the prefix path
    when candidates would exceed 50x the exploded relation. Exactness of
    both paths and their equivalence is asserted by
    tests/test_properties.py and the DuckDB contract gate.
    """
    # Evaluation discipline: higher-order-function chains run interpreted
    # (CodegenFallback — no codegen, no common-subexpression elimination),
    # so tokenization lives in its own projection (hashed_tokens) and the
    # shingle combine references the materialized attribute. Pre-hash to a
    # long join key (SURVEY §4 composite-key idiom: 8-byte shuffle rows),
    # persist the slim exploded relation, and recover per-doc set sizes
    # from it with a cheap count. `tokens` lets near_dup_suite share one
    # tokenization pass across the whole detector family.
    toks = tokens if tokens is not None else hashed_tokens(df, text_col, id_col)
    # PERSISTED array relation: size() and explode() below each reference
    # `hs`, and Catalyst's CollapseProject would otherwise merge the
    # projections and re-evaluate the interpreted HOF chain once PER
    # REFERENCE (no codegen CSE — measured 7x blowup). The cache boundary
    # makes `hs` an attribute read. The same relation IS the exact
    # re-score set for the prefix path — one materialization, three uses.
    sh_arr = track_cached(toks.select(
        F.col(id_col), F.array_distinct(shingle_hashes(F.col("__th"), n)).alias("hs")
    ).persist())
    # n_sh rides along from the materialized array — NOT a later
    # groupBy(id).count() over the exploded relation, which would be a
    # second full shuffle just to recover a number known at explode time.
    exploded = track_cached(sh_arr.select(
        F.col(id_col),
        F.size("hs").alias("n_sh"),
        F.explode("hs").alias("shingle_h"),
    ).persist())
    # persisted: the adaptive decision below materializes it, and the
    # chosen path's frequency join then reuses that work instead of
    # re-aggregating the exploded relation
    dfreq = track_cached(
        exploded.groupBy("shingle_h").agg(F.count(F.lit(1)).alias("__df")).persist()
    )
    # Exact candidate volume for the plain path: sum over shingles of
    # df*(df-1)/2 = (s2 - s1)/2 ordered pairs. Besides driving the
    # adaptive path switch, this is a FREE size gate for finishing the
    # pair pipeline under the bounded plan (see the return below).
    n_cand = None
    if prefix_filter is None:
        stats = dfreq.agg(
            F.sum(F.col("__df") * F.col("__df")).alias("s2"),
            F.sum("__df").alias("s1"),
        ).first()
        prefix_filter = bool(stats and stats["s1"] and stats["s2"] > 50 * stats["s1"])
        if stats and stats["s1"]:
            n_cand = max(1, int(stats["s2"] - stats["s1"]) // 2)

    if not prefix_filter:
        # plain inverted-index join; df>=2 prune (singletons join to
        # nothing) rides the same shingle_h partitioning. Set sizes travel
        # WITH the candidate rows (8 extra bytes each) — cheaper than a
        # separate sizes shuffle plus two broadcast-build passes.
        joinable = exploded.join(dfreq.filter(F.col("__df") >= 2), on="shingle_h").select(
            id_col, "n_sh", "shingle_h"
        )
        a = joinable.select(
            F.col(id_col).alias("id_a"), F.col("n_sh").alias("na"), "shingle_h"
        )
        b = joinable.select(
            F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb"), "shingle_h"
        )
        inter = (
            a.join(b, on="shingle_h")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(
                F.count(F.lit(1)).alias("inter"),
                F.min("na").alias("na"),  # constant per id — min is determinism
                F.min("nb").alias("nb"),
            )
        )
        jac = inter.select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 9
            ).alias("jaccard"),
        )
        return _finish_pairs(
            jac.filter(F.col("jaccard") >= F.lit(threshold)), n_cand
        )

    # Rare-first PREFIX FILTER (SSJoin/PPJoin prefix principle — EXACT):
    # J(A,B) >= t implies |A∩B| >= ceil(t*|A|) (the union is at least as
    # large as either set), so with every doc's shingles sorted in one
    # global order, a qualifying pair MUST share an element among each
    # doc's first |X| - ceil(t*|X|) + 1 shingles. Choosing ascending
    # document frequency as the global order makes prefixes consist of the
    # RAREST shingles — the hot-shingle pair explosion (this operator's
    # skew risk at corpus scale) never enters candidate generation.
    ranked = (
        # same-key equi-join: both sides already hash-partition by
        # shingle_h, so the frequency attach adds no fact re-shuffle
        exploded.join(dfreq, on="shingle_h")
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy("__df", "shingle_h")
            ),
        )
        .withColumn("__n", F.col("n_sh"))  # set size carried from explode time
    )
    prefix = ranked.filter(
        (
            F.col("__rn")
            <= F.col("__n") - F.ceil(F.lit(float(threshold)) * F.col("__n")) + 1
        )
        # singleton shingles join to nothing — pruning them from the
        # already-ranked prefix relation is free and exact
        & (F.col("__df") >= 2)
    ).select(id_col, "shingle_h")
    cands = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            on=[
                F.col("a.shingle_h") == F.col("b.shingle_h"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact re-score on the full hashed shingle sets (candidates only) —
    # straight from the persisted array relation, no re-collect shuffle
    sa = sh_arr.select(F.col(id_col).alias("id_a"), F.col("hs").alias("sa"))
    sb = sh_arr.select(F.col(id_col).alias("id_b"), F.col("hs").alias("sb"))
    inter_sz = F.size(F.array_intersect("sa", "sb"))
    jac = (
        cands.join(sa, on="id_a")
        .join(sb, on="id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                inter_sz / (F.size("sa") + F.size("sb") - inter_sz), 9
            ).alias("jaccard"),
        )
    )
    return _finish_pairs(jac.filter(F.col("jaccard") >= F.lit(threshold)), n_cand)


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens: DataFrame | None = None,
) -> DataFrame:
    """X3 — MinHash + LSH candidate pairs with exact-Jaccard re-score.

    MLlib's MinHashLSH over a CountVectorizer space works, but the
    hash-expression formulation below is leaner and deterministic across
    partitionings: minhash_i = min over shingles of a universal-hash map
    of xxhash64(shingle) (see the Carter-Wegman note below); band = hash
    of a signature slice; candidates join within bands; final Jaccard via
    the exact hashed shingle sets (re-score kills LSH false positives).
    num_hashes=32, bands of 4 → catches J>=~0.5 w.h.p.
    """
    if num_hashes % 4 != 0:
        raise ValueError("num_hashes must be a multiple of the band width (4)")
    bands = num_hashes // 4
    # Shingle hashes come from the shared token-hash relation
    # (hashed_tokens + shingle_hashes): each token string is hashed once,
    # each shingle is one fixed-width hash of n longs, and the strings are
    # never touched again — the signature, the LSH bands, and the exact
    # re-score all work off the long array. 64-bit collisions are
    # negligible at any corpus size that fits a cluster
    # (~n_shingles^2 / 2^64), so Jaccard-on-hashes == Jaccard-on-strings
    # in practice. The slim (id, array<long>) relation is persisted
    # because it feeds three consumers (signature + both sides of the
    # re-score join). The emptiness filter is a cheap size() predicate on
    # the materialized token-hash attribute (size(__th) >= n iff at least
    # one shingle exists) — never a re-statement of the interpreted chain.
    toks = tokens if tokens is not None else hashed_tokens(df, text_col, id_col)
    sh = track_cached(
        toks.filter(F.size(F.col("__th")) >= F.lit(n))
        .select(
            F.col(id_col),
            F.array_distinct(shingle_hashes(F.col("__th"), n)).alias("hs"),
        )
        .persist()
    )

    # One expensive string hash per shingle; the num_hashes permutations are
    # cheap universal-hash maps (a_i*h32 + b_i) mod p over the 32-bit-
    # truncated base hash (Broder 1997 §4; Carter-Wegman family). The mod by
    # a Mersenne prime is what breaks monotonicity — a plain affine map is
    # order-preserving in h, so every derived hash would pick the SAME
    # argmin shingle and the signature would degenerate to one hash.
    # ANSI-overflow bounds: h32 < 2^32, a_i < 2^29 → product < 2^61;
    # b_i < 2^61 → sum < 2^62 < long max.
    P_MERSENNE = (1 << 61) - 1

    def _affine(i: int):
        a = ((0x9E3779B9 * (2 * i + 1)) & 0x1FFFFFFE) | 1  # odd, < 2^29
        b = (0x85EBCA6B94D049BB * (i + 1)) & 0x1FFFFFFFFFFFFFFF  # < 2^61
        return F.array_min(
            F.transform(
                F.col("hs"),
                lambda h: F.pmod(
                    h.bitwiseAND(F.lit(0xFFFFFFFF)) * F.lit(a) + F.lit(b),
                    F.lit(P_MERSENNE),
                ),
            )
        ).alias(f"mh{i}")

    sig = sh.select(id_col, *[_affine(i) for i in range(num_hashes)])
    band_cols = [
        F.xxhash64(*[F.col(f"mh{4 * b + j}") for j in range(4)], F.lit(b)).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select(id_col, *band_cols)

    # One (band_idx, band_hash) relation via posexplode → a SINGLE
    # candidate self-join carrying only ids (the heavy shingle arrays do
    # NOT travel through the candidate shuffle — they re-attach afterwards
    # for the exact re-score). At 100 TB the candidate stream is two longs
    # per row instead of two 300-string arrays.
    bandrel = banded.select(
        F.col(id_col),
        F.posexplode(F.array(*[F.col(f"band{b}") for b in range(bands)])).alias(
            "band_idx", "band_hash"
        ),
    )
    cands = (
        bandrel.alias("a")
        .join(
            bandrel.alias("b"),
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sha = sh.select(F.col(id_col).alias("id_a"), F.col("hs").alias("sha"))
    shb = sh.select(F.col(id_col).alias("id_b"), F.col("hs").alias("shb"))
    jac = (
        cands.join(sha, on="id_a")
        .join(shb, on="id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sha", "shb"))
                / F.size(F.array_union("sha", "shb")),
                9,
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= F.lit(threshold))


def connected_components(
    pairs: DataFrame,
    max_iter: int = 20,
    shortcut: bool = False,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """Connected components of the undirected near-dup pair graph.

    Hybrid strategy, decided at runtime from the materialized edge count
    (the same AQE-style adaptivity as :func:`ngram_jaccard_pairs`):

    - **edge list ≤ ``driver_threshold``** (the common case — near-dup
      pairs are the *duplicate mass*, orders of magnitude smaller than the
      corpus): collect the slim 16-byte edge rows and run union-find on
      the driver. One Spark job (which also materializes the pair
      pipeline for downstream reuse), zero iterative shuffles. 2M edges
      is ~32 MB on the driver — trivially bounded.
    - **larger graphs**: distributed min-label propagation: every node
      starts labeled with its own id; each round replaces a node's label
      with the minimum over itself and its neighbors. Converges in
      O(graph diameter) rounds — duplicate clusters are shallow (dense
      cliques-of-cliques), so the bounded ``max_iter`` is a safety net.
      The iteration state is the (id, comp) relation — ids only, never
      documents. The convergence signal is a ``__chg`` flag computed IN
      the step join (nbr_comp < comp), so each round is exactly one
      materialize-and-count action, not a separate old-vs-new join.
      Labels are eagerly ``localCheckpoint``-ed per round: they feed
      2-4 consumers per round, so persist alone would leave the LOGICAL
      plan doubling every round (persist caches data, never the plan)
      and plan-string generation OOMs by round ~8 — measured at the
      300k-row SemDeDup escalation proof (r9), same trap as graph.py.

    The input pair relation is persisted here so the symmetric edge union
    (two branches) and the iterations evaluate the — potentially
    expensive — upstream pair pipeline exactly once.

    Returns ``(id, comp)`` for every id that appears in a pair; ``comp``
    is the minimum id of the component. Both paths produce identical
    output (min-id labeling); equivalence is pinned in
    tests/test_extensions.py.
    """
    slim = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b")).persist()
    n_edges = slim.count()  # one job: materializes the pair pipeline once
    if n_edges <= driver_threshold:
        rows = slim.collect()
        id_type = slim.schema["a"].dataType
        slim.unpersist()
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in rows:
            ra, rb = find(r.a), find(r.b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comp_of: dict = {}
        nodes = set()
        for r in rows:
            nodes.add(r.a)
            nodes.add(r.b)
        # min-id labeling: roots are already component minima because
        # union always attaches the larger root under the smaller one
        out = [(n, find(n)) for n in sorted(nodes)]
        schema = T.StructType(
            [T.StructField("id", id_type, False), T.StructField("comp", id_type, False)]
        )
        return pairs.sparkSession.createDataFrame(out, schema)

    # Distributed path: eager localCheckpoint discipline throughout (the
    # graph.py lesson, learned AGAIN here at the 300k-row SemDeDup proof:
    # labels feeds 2-4 consumers per round, so a persist-only iteration
    # DOUBLES the logical plan every round and AQE's plan-STRING
    # generation alone OOMs the driver by round ~8 — persist caches data,
    # never the plan). The symmetric edge relation is checkpointed ONCE
    # so every round's plan starts from a flat scan instead of the full
    # upstream pair pipeline (grid-split unions, quantizer transforms);
    # each round's labels are checkpointed eagerly, truncating lineage.
    sym = slim.unionByName(
        slim.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    slim.unpersist()
    labels = (
        sym.select(F.col("a").alias("id")).distinct().withColumn("comp", F.col("id"))
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = labels.join(nbr_min, labels["id"] == nbr_min["a"], "left").select(
            labels["id"],
            F.least(
                labels["comp"], F.coalesce(F.col("nbr_comp"), labels["comp"])
            ).alias("comp"),
            # convergence flag rides the step — no separate old-vs-new join
            (F.col("nbr_comp") < labels["comp"]).alias("__chg"),
        )
        if shortcut:
            # pointer halving: comp <- label[comp]. Every comp value IS a
            # node id (labels are min-ids), so one id-relation self-join
            # per round turns O(diameter) convergence into O(log
            # diameter). Worth it ONLY for chain-shaped graphs (fuzzy
            # name linkage, x103: 31 s -> 27 s at sf0.1); dense near-dup
            # cliques already converge in 1-2 rounds and the extra join
            # nearly doubles their cost (x82: 17 s -> 28 s measured) —
            # hence opt-in, not default.
            jump = stepped.select(
                F.col("id").alias("__cid"), F.col("comp").alias("__ccomp")
            )
            new_labels = (
                stepped.join(jump, stepped["comp"] == jump["__cid"])
                .select(
                    stepped["id"],
                    F.col("__ccomp").alias("comp"),
                    # the jump itself can lower a label after the nbr step
                    # settles — fold it into the convergence flag too
                    (stepped["__chg"] | (F.col("__ccomp") < stepped["comp"])).alias(
                        "__chg"
                    ),
                )
                .localCheckpoint(eager=True)
            )
        else:
            new_labels = stepped.localCheckpoint(eager=True)
        # the eager checkpoint materialized the round; the count reads
        # the stored blocks
        n_changed = new_labels.filter(F.col("__chg")).count()
        # round N's labels now have zero consumers — free their blocks
        # eagerly instead of waiting for driver GC (round-9 review:
        # long-lived drivers accumulated every round's ids-only blocks)
        free_local_checkpoint(labels)
        labels = new_labels
        if n_changed == 0:
            break
    # the final labels are materialized, so the symmetric edge relation
    # is consumed too
    free_local_checkpoint(sym)
    # The FINAL labels relation stays a materialized localCheckpoint —
    # NEVER ledger-tracked and not freed here (callers consume it
    # lazily; releasing a checkpoint's blocks makes it unrecomputable).
    # Failure mode to know: localCheckpoint blocks live on executors
    # with NO lineage fallback — on executor loss, jobs reading this
    # relation FAIL instead of recomputing (acceptable here: the loop
    # would have to re-run anyway, and the caller retries the query).
    return labels.select("id", "comp")


def dedup_corpus(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    policy: str = "greedy",
    score_col: str | None = None,
) -> DataFrame:
    """Turn a near-dup PAIR relation into a kept CORPUS.

    ``policy='greedy'`` (default): drop every doc that appears as the
    larger id of a pair — one anti-join, the standard corpus-dedup policy
    (Lee et al. 2022 §3.2). The min id of each cluster always survives,
    but a doc paired only with LARGER ids also survives even when a
    smaller id is transitively reachable (A~C, B~C keeps both A and B).

    ``policy='components'``: exact transitive closure — keep only the
    minimum id of each connected component (:func:`connected_components`,
    bounded-iteration label propagation). Strictly stronger dedup on
    chained duplicates at the cost of an iterative job.

    ``policy='best'``: transitive closure, but the survivor of each
    component is the row maximizing ``score_col`` (ties by min id) —
    the quality-aware representative selection training-corpus dedup
    actually wants (keep the longest / highest-quality variant, not an
    id accident; RefinedWeb-style). Scale shape: only the slim
    ``(id, score)`` projection joins the component relation — document
    bodies never shuffle; the per-component argmax is a window over the
    near-dup-mass-sized member relation, and survivors come back as one
    anti-join.

    Deterministic given deterministic pairs.
    """
    if policy == "greedy":
        drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    elif policy == "components":
        comp = connected_components(pairs)
        drop = comp.filter(F.col("comp") != F.col("id")).select(
            F.col("id").alias(id_col)
        )
    elif policy == "best":
        if score_col is None:
            raise ValueError("policy='best' needs score_col")
        from pyspark.sql import Window

        comp = connected_components(pairs)
        scores = df.select(F.col(id_col).alias("id"), F.col(score_col).alias("__score"))
        members = comp.join(scores, on="id")
        w = Window.partitionBy("comp").orderBy(F.desc("__score"), F.col("id"))
        drop = (
            members.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") > 1)
            .select(F.col("id").alias(id_col))
        )
    else:
        raise ValueError(f"unknown policy: {policy}")
    return df.join(drop, on=id_col, how="left_anti")


def near_dedup_corpus(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    method: str = "jaccard",
    text_col: str = "text",
    id_col: str = "doc_id",
    policy: str = "greedy",
    score_col: str | None = None,
) -> DataFrame:
    """The full corpus-dedup composite: exact text dedup, then near-dup
    pair detection (``jaccard`` exact inverted index | ``minhash`` LSH),
    then representative keeping (``greedy`` | ``components`` | ``best``
    with ``score_col`` — see :func:`dedup_corpus`). Returns the kept
    corpus with the input schema."""
    # persisted: the kept corpus is read three times (pair generation,
    # the score projection under policy='best', and the final anti-join) —
    # without the cache boundary the exact-dedup window re-runs per read
    stage1 = track_cached(dedup_exact(df, [text_col], id_col).persist())
    if method == "jaccard":
        pairs = ngram_jaccard_pairs(stage1, threshold, n, text_col, id_col)
    elif method == "minhash":
        pairs = minhash_lsh_pairs(stage1, threshold, n, text_col=text_col, id_col=id_col)
    else:
        raise ValueError(f"unknown method: {method}")
    return dedup_corpus(stage1, pairs, id_col, policy=policy, score_col=score_col)


def contamination_check(
    corpus: DataFrame,
    bench: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark-contamination scan (the decontamination step of every
    LLM training pipeline, e.g. GPT-3 appendix C / PaLM §6.1): for each
    corpus document, how many of its distinct word n-grams also appear
    anywhere in the benchmark/eval set.

    Output: ``(id, n_ngrams, n_hits, contaminated_frac)`` — one row per
    corpus doc, zero-filled (a clean doc reports 0 / 0.0), so downstream
    gates can threshold on ``contaminated_frac`` directly.

    Physical shape for 100 TB corpus vs MB-scale benchmarks: both sides
    reuse the shared one-pass tokenization (:func:`hashed_tokens`) and
    8-byte shingle hashes (:func:`shingle_hashes`) — no string shingles
    ever shuffle. The benchmark's distinct shingle set is broadcast
    (eval suites are tiny by construction), making the membership probe a
    map-side BroadcastHashJoin over the corpus scan; the only shuffle is
    the per-doc hit aggregation, keyed by doc id. Set
    ``broadcast_bench=False`` for an atypically large right side and the
    probe becomes a shuffled semi-join instead.
    """
    # explode_outer everywhere, deliberately: a plain explode lets Catalyst
    # infer `size(...) > 0` / notnull constraints from the Generate and push
    # them below the fan-out exchange, inlining the whole tokenize+shingle
    # chain (restated several times — no CSE across a Filter) into a
    # single-partition scan-side filter. Outer generate infers nothing, so
    # the CPU-heavy shingling stays in the parallel post-exchange stage;
    # it also keeps zero-shingle docs without a second pass or join-back.
    b_sh = (
        hashed_tokens(bench, text_col, id_col)
        .select(F.explode_outer(shingle_hashes(F.col("__th"), n)).alias("__s"))
        .where(F.col("__s").isNotNull())
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    if broadcast_bench:
        b_sh = F.broadcast(b_sh)
    c_doc = hashed_tokens(corpus, text_col, id_col).select(
        F.col(id_col), F.array_distinct(shingle_hashes(F.col("__th"), n)).alias("__sh")
    )
    c_e = c_doc.select(
        F.col(id_col),
        F.size(F.col("__sh")).cast("long").alias("n_ngrams"),
        F.explode_outer(F.col("__sh")).alias("__s"),
    )
    probed = c_e.join(b_sh, "__s", "left")
    agg = probed.groupBy(id_col, "n_ngrams").agg(
        F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_hits")
    )
    return agg.select(
        F.col(id_col),
        "n_ngrams",
        "n_hits",
        F.round(
            F.when(F.col("n_ngrams") > 0, F.col("n_hits") / F.col("n_ngrams")).otherwise(
                F.lit(0.0)
            ),
            9,
        ).alias("contaminated_frac"),
    )


def incremental_admit(
    batch: DataFrame,
    corpus: DataFrame,
    n: int = 3,
    max_overlap: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental corpus maintenance: vet a new crawl ``batch`` against an
    already-deduped ``corpus`` WITHOUT reprocessing the corpus — the only
    workable contract at 100 TB, where re-deduping the full corpus per
    snapshot is off the table.

    Three stages, all reusing the engine's proven shapes:

    1. within-batch exact dedup — min-id representative per normalized-text
       fingerprint (the :func:`dedup_by_fingerprint` rule);
    2. exact anti-join — batch fingerprints vs the corpus fingerprint
       relation (at scale this right side is the corpus' precomputed
       fingerprint INDEX, not a rescan; passing the corpus itself, as here,
       derives it in one map pass);
    3. near-dup gate — distinct shingle-hash overlap of each surviving doc
       against the corpus shingle set (:func:`contamination_check` with
       ``broadcast_bench=False``: the corpus side is large, so the
       membership probe is a shuffled join on 8-byte hashes, not a
       broadcast).

    Output: one row per batch doc surviving stages 1-2 —
    ``(id, fingerprint, n_ngrams, n_hits, overlap_frac, admitted)`` with
    ``admitted = overlap_frac <= max_overlap``. Callers filter on it; the
    full relation is kept so rejects are auditable.
    """
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    b1 = (
        batch.withColumn("__fp", fingerprint(F.col(text_col)))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    corpus_fp = corpus.select(fingerprint(F.col(text_col)).alias("__fp")).distinct()
    fresh = b1.join(corpus_fp, "__fp", "left_anti")
    ov = contamination_check(
        fresh, corpus, n=n, text_col=text_col, id_col=id_col, broadcast_bench=False
    ).withColumnRenamed("contaminated_frac", "overlap_frac")
    return (
        fresh.select(F.col(id_col), F.col("__fp").alias("fingerprint"))
        .join(ov, id_col)
        .select(
            id_col,
            "fingerprint",
            "n_ngrams",
            "n_hits",
            "overlap_frac",
            (F.col("overlap_frac") <= F.lit(max_overlap)).alias("admitted"),
        )
    )


def simhash_from_token_hashes(hs: Column, bits: int = 32) -> Column:
    """Frequency-weighted SimHash (Charikar 2002) over a pre-hashed token
    array: bit j = sign of the sum over token *occurrences* of ±1 derived
    from bit j of the token hash. Occurrence weighting (not the
    distinct-token set) is what separates documents drawn from a shared
    vocabulary. Pure built-ins (aggregate over the array); deterministic
    everywhere.

    One xxhash64 per token occurrence happens upstream in
    :func:`hashed_tokens` (NOT one per token per bit — the naive per-bit
    formulation re-hashes every token ``bits`` times, a 32× CPU blowup
    measured at 13 s vs <1 s on the sf0.01 documents table). The per-bit
    ±1 votes all read bits of that single hash: a running vote vector as
    an array<int> accumulator, one pass over the tokens.

    Vote cost is linear in ``bits``; 32 suffices for small corpora, 64 is
    what the banded candidate join needs past ~10^4 docs (see
    :func:`simhash_pairs`). Bit 63 of a 64-bit signature is the sign bit
    of the long, so its mask/power is the two's-complement ``-2^63``."""
    if bits < 1 or bits > 64:
        raise ValueError(f"bits must be in [1, 64], got {bits}")

    def _bit(j: int) -> int:
        return (1 << j) if j < 63 else -(1 << 63)

    masks = F.array(*[F.lit(_bit(j)).cast("long") for j in range(bits)])
    votes = F.aggregate(
        hs,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda v, m: v
            + F.when(h.bitwiseAND(m) == 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    # Reassemble the sign bits into one long: bit j set iff votes[j] >= 0.
    powers = F.array(*[F.lit(_bit(j)).cast("long") for j in range(bits)])
    return F.aggregate(
        F.zip_with(votes, powers, lambda v, p: F.when(v >= 0, p).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash(text: Column, bits: int = 32) -> Column:
    """SimHash straight from a text column (one inline token-hash pass —
    the aggregate evaluates its child exactly once, so this is safe in a
    single projection). Prefer :func:`simhash_from_token_hashes` over a
    shared :func:`hashed_tokens` relation when several detectors run."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    return simhash_from_token_hashes(F.transform(toks, lambda t: F.xxhash64(t)), bits)


# Above this corpus size the candidate join switches from direct banding
# (d+1 blocks, single-block keys) to combination banding (2(d+1) blocks,
# keys = concatenations of (n_blocks - d) blocks — Manku et al., WWW'07
# §3). Expected block collisions are n^2 * n_keys / 2^key_width: 8-bit
# single-block keys cap the key space at 256 values, so candidates grow
# quadratically past ~10^4 docs (measured: 3x wall for 10x docs on the
# inflated corpus); 20-bit combination keys (8 blocks of 4 bits, C(8,5)=56
# combos) trade a 14x larger block relation for a ~300x collision
# reduction. Both bandings are EXACT (pigeonhole: hamming <= d spoils at
# most d blocks, leaving an intact (n_blocks - d)-subset), so the switch
# changes only the physical plan, never the pair set.
SIMHASH_COMBO_DOC_THRESHOLD = 20_000


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    bits: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens: DataFrame | None = None,
    n_blocks: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: band the signature into equal-width blocks,
    equi-join candidates on each (n_blocks - max_hamming)-block
    combination key (pigeonhole guarantees recall), then exact popcount
    filter — no O(n^2) pair space.

    ``n_blocks=None`` picks the banding from the corpus size (one count
    over the input): direct ``d+1``-block banding below
    :data:`SIMHASH_COMBO_DOC_THRESHOLD` docs, ``2(d+1)``-block
    combination banding above — the same adaptive-physical-strategy idea
    as the Jaccard prefix filter, and like it output-invariant: the
    detector is defined by (bits, max_hamming) alone."""
    import itertools

    d = max_hamming
    toks = tokens if tokens is not None else hashed_tokens(df, text_col, id_col)
    if n_blocks is None:
        n_docs = (df if tokens is None else tokens).count()
        n_blocks = (2 * (d + 1)) if n_docs > SIMHASH_COMBO_DOC_THRESHOLD else (d + 1)
        if bits % n_blocks:
            n_blocks = d + 1  # combination banding needs equal blocks
    if bits % n_blocks:
        raise ValueError(f"bits={bits} must divide into {n_blocks} equal blocks")
    if not d < n_blocks <= bits:
        raise ValueError(f"need max_hamming < n_blocks <= bits, got {d}, {n_blocks}")
    block_width = bits // n_blocks
    # width 64 (max_hamming=0 on a 64-bit sig): all-ones mask is -1 in
    # two's complement — (1<<64)-1 would overflow the long literal
    block_mask = (1 << block_width) - 1 if block_width < 64 else -1
    # persist: the block-join branches reference this relation repeatedly,
    # and the simhash vote aggregate is interpreted (no codegen CSE) — it
    # must be evaluated once per row, not once per branch
    hashed = track_cached(
        toks.select(
            F.col(id_col), simhash_from_token_hashes(F.col("__th"), bits).alias("sh")
        )
        .persist()
    )

    # arithmetic shift then mask: the mask keeps only the block's low
    # bits, so sign extension is irrelevant
    def _block(b: int) -> Column:
        return F.shiftright(F.col("sh"), block_width * b).bitwiseAND(F.lit(block_mask))

    # each combination key concatenates its blocks into one long
    # ((n_blocks - d) * block_width <= 60 bits for every supported shape)
    def _combo_key(combo: tuple[int, ...]) -> Column:
        key = F.lit(0).cast("long")
        for pos, b in enumerate(combo):
            key = key + F.shiftleft(_block(b), pos * block_width)
        return key

    combos = list(itertools.combinations(range(n_blocks), n_blocks - d))
    # One (combo_idx, combo_value) relation via posexplode → a SINGLE
    # candidate self-join instead of per-combo joins + union (one shuffle
    # stage, one dedup). Signatures re-attach afterwards from the small
    # persisted relation for the exact popcount filter.
    blockrel = hashed.select(
        F.col(id_col),
        F.posexplode(F.array(*[_combo_key(c) for c in combos])).alias(
            "blk_idx", "blk_val"
        ),
    )
    cands = (
        blockrel.alias("a")
        .join(
            blockrel.alias("b"),
            on=[
                F.col("a.blk_idx") == F.col("b.blk_idx"),
                F.col("a.blk_val") == F.col("b.blk_val"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # no broadcast hint: the signature relation scales with the corpus
    # (unlike per-class verdicts) — AQE broadcasts it only when it fits
    sa = hashed.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sa"))
    sb = hashed.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sb"))
    ham = (
        cands.join(sa, on="id_a")
        .join(sb, on="id_b")
        .withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
    )
    return ham.filter(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")


def simhash_pairs_topm(
    df: DataFrame,
    m: int = 5,
    max_hamming: int = 3,
    bits: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens: DataFrame | None = None,
) -> DataFrame:
    """Bounded-output SimHash neighbors: each doc's ``m`` nearest
    candidates by Hamming distance (ties by neighbor id). Candidate
    *generation* is already banding-bounded in :func:`simhash_pairs`; this
    bounds the *emission* to <= n*m rows, the cap-and-rank twin of
    ``cosine_pairs_topm`` for dense near-dup corpora where the pair count
    itself is the blowup. The rank filter compiles to a map-side
    WindowGroupLimit partial top-k (same plan property, gated in tests).

    Output: ``(doc_id, nbr_id, hamming, rnk)`` — directed (a pair appears
    under both endpoints, each ranked in that doc's list).
    """
    from pyspark.sql import Window

    pairs = simhash_pairs(
        df, max_hamming, bits, text_col=text_col, id_col=id_col, tokens=tokens
    )
    # both directions via a literal 2-array explode: a union of two selects
    # over `pairs` would re-execute the whole banding+popcount pipeline per
    # branch (no automatic CSE across union children); explode_outer per
    # the measured Generate-pushdown trap (SCALE.md)
    sym = pairs.select(
        F.explode_outer(
            F.array(
                F.struct(F.col("id_a").alias("s"), F.col("id_b").alias("d")),
                F.struct(F.col("id_b").alias("s"), F.col("id_a").alias("d")),
            )
        ).alias("e"),
        "hamming",
    ).select(F.col("e.s").alias("doc_id"), F.col("e.d").alias("nbr_id"), "hamming")
    w = Window.partitionBy("doc_id").orderBy(F.col("hamming"), F.col("nbr_id"))
    return sym.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= m)


def near_dup_suite(
    df: DataFrame,
    jaccard_threshold: float = 0.5,
    minhash_threshold: float = 0.5,
    max_hamming: int = 3,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict[str, DataFrame]:
    """All three near-dup detectors over ONE tokenization pass.

    Tokenizing + hashing the corpus text is the dominant per-doc CPU of
    every detector; running them separately pays it three times. The suite
    materializes the shared ``(id, token-hash array)`` relation once
    (persisted) and feeds it to Jaccard, MinHash-LSH, and SimHash — at
    100 TB this is one full-corpus scan + tokenize instead of three.

    Returns ``{"jaccard": pairs, "minhash": pairs, "simhash": pairs}``.
    """
    toks = track_cached(hashed_tokens(df, text_col, id_col).persist())
    return {
        "jaccard": ngram_jaccard_pairs(
            df, jaccard_threshold, n, text_col, id_col, tokens=toks
        ),
        "minhash": minhash_lsh_pairs(
            df, minhash_threshold, n, text_col=text_col, id_col=id_col, tokens=toks
        ),
        "simhash": simhash_pairs(
            df, max_hamming, text_col=text_col, id_col=id_col, tokens=toks
        ),
    }


def repeated_span_stats(
    df: DataFrame,
    window: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X40 — cross-document repeated-span detection, the token-window
    approximation of exact-substring training-data dedup (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better", ACL 2022:
    spans duplicated across documents are memorization fuel and should be
    found and cut). A span = ``window`` consecutive normalized tokens; a
    span is DUPLICATED iff its content occurs in >= 2 distinct documents
    (within-doc repetition is x14's domain and is deliberately excluded).

    Output, one row per document that contains any duplicated span:
    ``(id, n_dup_spans, dup_tokens, n_tokens)`` where ``dup_tokens`` is
    the size of the UNION of the covered token intervals (gaps-and-
    islands over span start positions — overlapping spans don't double
    count).

    Scale shape: the suffix-array the paper builds is replaced by the
    engine's hash idiom — spans shuffle as 8-byte ``xxhash64`` longs from
    the shared one-pass tokenization (:func:`hashed_tokens`), the
    duplicated-span relation is found with ONE partial-combined aggregate,
    and membership returns via a shuffled 8-byte join (the duplicated-
    hash relation is corpus-scale, so no broadcast hint — AQE decides).
    The coverage window partitions per-document (bounded by doc length).
    """
    from pyspark.sql import Window

    if window < 2:
        raise ValueError("window must be >= 2 tokens")
    toks = hashed_tokens(df, text_col, id_col)
    spans = toks.select(
        F.col(id_col),
        F.size("__th").cast("long").alias("n_tokens"),
        F.posexplode(shingle_hashes(F.col("__th"), window)).alias("pos", "__h"),
    )
    dup = (
        spans.groupBy("__h")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("__h")
    )
    marked = spans.join(dup, "__h")
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_end = F.max(F.col("pos") + F.lit(window)).over(w)
    contrib = F.greatest(
        F.lit(0),
        F.col("pos") + F.lit(window) - F.greatest(F.col("pos"), F.coalesce(cum_end, F.lit(0))),
    )
    return (
        marked.withColumn("__c", contrib)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_dup_spans"),
            F.sum("__c").cast("long").alias("dup_tokens"),
            F.max("n_tokens").alias("n_tokens"),
        )
    )


def remove_repeated_spans(
    df: DataFrame,
    window: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X40 — cut every cross-document duplicated span out of each
    document (the "remove" half of Lee et al. 2022). Returns
    ``(id, text, n_tokens_before, n_tokens_after)`` with ``text`` rebuilt
    from the surviving tokens.

    DISCLOSED NORMALIZATION: removal operates on the same normalized
    token stream the detector hashes (lowercased, whitespace-split,
    single-space rejoined) — the paper cuts raw bytes; byte-faithful
    reconstruction would need original offsets, which the normalized
    pipeline deliberately discards. Use the stats relation to route
    documents to a byte-level cutter if exact bytes matter.

    Physical shape: the marked positions collapse to one slim
    ``(id, sorted positions)`` row per affected document (bounded by doc
    length), LEFT-join back onto the corpus, and an Arrow-batched
    ``mapInPandas`` rebuilds the token stream — the only Python in the
    path, at one batch per partition.
    """
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    stats_src = hashed_tokens(df, text_col, id_col)
    spans = stats_src.select(
        F.col(id_col),
        F.posexplode(shingle_hashes(F.col("__th"), window)).alias("pos", "__h"),
    )
    dup = (
        spans.groupBy("__h")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("__h")
    )
    marked = (
        spans.join(dup, "__h")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("__marks"))
    )
    joined = df.select(id_col, text_col).join(marked, id_col, "left")
    out_schema = StructType(
        [
            StructField(id_col, joined.schema[id_col].dataType),
            StructField("text", StringType()),
            StructField("n_tokens_before", LongType()),
            StructField("n_tokens_after", LongType()),
        ]
    )

    def cut(batches):
        import re

        import pandas as pd

        # EXACT twin of hashed_tokens' tokenization: Java's \s is ASCII by
        # default, Python's is Unicode-aware — re.ASCII keeps positions
        # aligned with the detector on Unicode-whitespace inputs.
        def tok(s):
            return re.split(r"\s+", (s or "").strip().lower(), flags=re.ASCII)

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                raw = row[text_col]
                toks = tok(raw)
                marks = row["__marks"]
                if marks is None or (hasattr(marks, "__len__") and len(marks) == 0):
                    out.append((row[id_col], " ".join(toks), len(toks), len(toks)))
                    continue
                covered = [False] * len(toks)
                for p in marks:
                    for i in range(int(p), min(int(p) + window, len(toks))):
                        covered[i] = True
                kept = [t for t, c in zip(toks, covered) if not c]
                out.append((row[id_col], " ".join(kept), len(toks), len(kept)))
            yield pd.DataFrame(
                out, columns=[id_col, "text", "n_tokens_before", "n_tokens_after"]
            )

    return joined.mapInPandas(cut, out_schema)


def ngram_novelty(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X112 — per-document n-gram novelty: the fraction of a document's
    distinct word n-grams that appear NOWHERE else in the corpus
    (corpus-wide document frequency 1). The memorization/novelty screen
    of training-data curation (the complement of the duplication the
    near-dup family removes): boilerplate-heavy docs score near 0,
    genuinely novel text near 1 — and it directly upper-bounds how much
    of a doc could have been copied from the rest of the corpus.

    Physical shape (the X3 skeleton): shared one-pass tokenization →
    8-byte shingle hashes → ONE exploded (id, shingle_h) aggregation for
    corpus document frequencies → re-join on the hash → per-doc
    aggregation. No string shingles ever shuffle; candidate volume is
    the exploded relation itself (linear), never pairs.

    Output: ``(id, n_ngrams, n_unique, novelty_r)``; docs with fewer
    than ``n`` tokens release ``(0, 0, 0.0)``.
    """
    toks = hashed_tokens(df, text_col, id_col)
    sh_arr = track_cached(toks.select(
        F.col(id_col), F.array_distinct(shingle_hashes(F.col("__th"), n)).alias("hs")
    ).persist())
    exploded = sh_arr.select(
        F.col(id_col), F.size("hs").alias("n_sh"), F.explode("hs").alias("__h")
    )
    # df counts over DISTINCT (doc, shingle) — sh_arr is already distinct
    dfreq = exploded.groupBy("__h").agg(F.count(F.lit(1)).alias("__df"))
    per_doc = (
        exploded.join(dfreq, "__h")
        .groupBy(id_col)
        .agg(
            F.max("n_sh").alias("n_ngrams"),
            F.sum(F.when(F.col("__df") == 1, 1).otherwise(0)).alias("n_unique"),
        )
    )
    base = sh_arr.select(F.col(id_col), F.size("hs").alias("__n0"))
    return (
        base.join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce("n_unique", F.lit(0)).cast("long").alias("n_unique"),
            F.round(
                F.when(
                    F.coalesce("n_ngrams", F.lit(0)) > 0,
                    F.coalesce("n_unique", F.lit(0))
                    / F.coalesce("n_ngrams", F.lit(0)).cast("double"),
                ).otherwise(0.0),
                9,
            ).alias("novelty_r"),
        )
    )


def source_overlap_matrix(
    df: DataFrame,
    source_col: str = "source",
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X113 — cross-source content-overlap matrix: for every pair of
    corpus sources (crawl snapshots, vendor feeds, domains), how many
    distinct word n-grams they share, with the Jaccard overlap. The
    provenance question mixture design asks before weighting sources
    (x26): which feeds are near-copies of each other, and which are
    genuinely additive.

    Physical shape: the corpus collapses ONCE to the distinct
    (source, shingle_hash) relation — 8-byte hashes, map-side distinct
    combine; the pair generator is a self-join on the shingle hash whose
    fan-out per shingle is bounded by sources-containing-it choose 2 —
    at most |sources|², a CONSTANT per shingle (never doc-pair volume).
    Source set sizes broadcast back onto the kilobyte pair relation.
    Jaccard telescopes to exact int64 counts and one IEEE division.

    Output: ``(source_a, source_b, shared, n_a, n_b, jaccard_r)`` for
    source_a < source_b with ``shared > 0``.
    """
    toks = hashed_tokens(df, text_col, id_col)
    src_map = df.select(F.col(id_col), F.col(source_col).alias("__src"))
    sh = (
        toks.join(src_map, id_col)
        .select(
            F.col("__src"),
            F.explode(F.array_distinct(shingle_hashes(F.col("__th"), n))).alias("__h"),
        )
        .distinct()
    )
    track_cached(sh.persist())
    sizes = sh.groupBy("__src").agg(F.count(F.lit(1)).alias("__n"))
    a = sh.select(F.col("__src").alias("source_a"), "__h")
    b = sh.select(F.col("__src").alias("source_b"), "__h")
    pairs = (
        a.join(b, "__h")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        pairs.join(
            F.broadcast(sizes.select(F.col("__src").alias("source_a"), F.col("__n").alias("n_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("__src").alias("source_b"), F.col("__n").alias("n_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "shared",
            "n_a",
            "n_b",
            F.round(
                F.col("shared")
                / (F.col("n_a") + F.col("n_b") - F.col("shared")).cast("double"),
                9,
            ).alias("jaccard_r"),
        )
    )


def containment_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Directional n-gram containment pairs: ``C(A in B) = |A∩B| / |A|``.

    Jaccard (:func:`ngram_jaccard_pairs`) misses the
    quote/boilerplate-inclusion case — a short doc fully embedded in a
    much longer one has tiny Jaccard but containment 1.0. This is the
    detector subsuming-document dedup and quote attribution use
    (e.g. Lee et al. 2022 §5 discuss substring containment as the gap
    exact-dup + Jaccard leave open).

    Emits one row per unordered pair whose LARGER directional
    containment clears ``threshold``:
    ``(id_a, id_b, inter, na, nb, cont_a_r, cont_b_r)`` with
    ``cont_a_r = round(inter/na, 9)`` (the fraction of A's shingles
    inside B) and ``id_a < id_b``.

    Same physical shape as the plain inverted-index Jaccard path: one
    tokenize pass, 8-byte shingle-hash self-join with the df>=2 prune
    (singleton shingles can join to nothing, so dropping them is exact),
    one pair aggregation. The prefix filter does NOT apply — its bound
    is Jaccard-specific — so run this after blocking/banding at corpus
    scale if the shingle-frequency profile is hot.
    """
    toks = hashed_tokens(df, text_col, id_col)
    sh_arr = track_cached(toks.select(
        F.col(id_col), F.array_distinct(shingle_hashes(F.col("__th"), n)).alias("hs")
    ).persist())
    exploded = track_cached(sh_arr.select(
        F.col(id_col),
        F.size("hs").alias("n_sh"),
        F.explode("hs").alias("shingle_h"),
    ).persist())
    dfreq = exploded.groupBy("shingle_h").agg(F.count(F.lit(1)).alias("__df"))
    joinable = exploded.join(dfreq.filter(F.col("__df") >= 2), on="shingle_h").select(
        id_col, "n_sh", "shingle_h"
    )
    a = joinable.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na"), "shingle_h")
    b = joinable.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb"), "shingle_h")
    inter = (
        a.join(b, on="shingle_h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.min("na").alias("na"),
            F.min("nb").alias("nb"),
        )
    )
    scored = inter.select(
        "id_a",
        "id_b",
        "inter",
        F.col("na").cast("long").alias("na"),
        F.col("nb").cast("long").alias("nb"),
        F.round(F.col("inter") / F.col("na"), 9).alias("cont_a_r"),
        F.round(F.col("inter") / F.col("nb"), 9).alias("cont_b_r"),
    )
    return scored.filter(
        F.greatest(F.col("cont_a_r"), F.col("cont_b_r")) >= F.lit(threshold)
    )


def leakage_safe_split(
    docs: DataFrame,
    threshold: float = 0.2,
    n: int = 3,
    valid_frac: float = 0.1,
    salt: str = "split",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup-aware train/validation split: assign every document's
    whole near-duplicate COMPONENT to one side, so near-duplicates can
    never straddle the split — the leakage failure mode of naive random
    splits on web corpora (a validation doc whose near-twin sits in
    train scores as memorized). The eval-integrity counterpart of
    decontamination (x18): x18 protects against EXTERNAL benchmark
    leakage, this protects the pipeline's OWN held-out split.

    Construction: n-gram-Jaccard pairs UNIONED with an exact-text-hash
    pair source → :func:`connected_components` min-id labeling → the
    COMPONENT id (not the doc id) hashes to a side via the portable md5
    fraction ``int(md5(comp|salt)[:8], 16) < valid_frac · 2^32`` (the
    x10 hash-split discipline — deterministic, engine-exact, stable
    under re-runs and data layout). Singleton docs are their own
    component. The explicit exact source exists because Jaccard alone
    does NOT cover all exact duplicates: identical documents shorter
    than the shingle width ``n`` produce zero shingles, are never
    paired, and would straddle the split as separate singletons — the
    exact source pairs every doc with the min-id holder of its md5(text)
    group (one extra shuffle on a 16-byte hash; for docs ≥ n tokens the
    pairs are redundant with J = 1 and CC absorbs them).

    Shape: the pair/CC machinery is the x03 corpus path (shuffles on
    8-byte shingle hashes + ids-only iteration); the split itself adds
    one ids-only left join + a map-only hash. At 100 TB the components
    relation is bounded by the near-dup mass, not the corpus.

    Output: ``(id_col, component, split)`` with split ∈ {train, valid}.
    """
    from pyspark.sql import Window

    jac = ngram_jaccard_pairs(
        docs, threshold=threshold, n=n, text_col=text_col, id_col=id_col
    ).select("id_a", "id_b")
    # exact-text pairs: every doc links to the min-id holder of its
    # md5(text) group (star topology — |group|-1 edges, CC-equivalent to
    # the clique). Covers identical docs with < n tokens (zero shingles)
    # that the Jaccard source structurally misses. NULL texts are
    # EXCLUDED: md5(NULL) is NULL and the window would otherwise fuse
    # every missing-text doc into one giant component, swinging the
    # split fractions by the whole null mass — absent text is absent
    # evidence of duplication, so null-text docs stay independent
    # singletons (their pre-round-7 behavior).
    exact = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col), F.md5(F.col(text_col).cast("binary")).alias("__h")
        )
        .select(
            F.min(id_col).over(Window.partitionBy("__h")).alias("id_a"),
            F.col(id_col).alias("id_b"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )
    comp = connected_components(jac.unionByName(exact))
    full = docs.select(F.col(id_col)).join(
        comp.withColumnRenamed("id", id_col), on=id_col, how="left"
    )
    component = F.coalesce(F.col("comp"), F.col(id_col)).alias("component")
    cut = int(valid_frac * 4294967296)
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", component.cast("string"), F.lit(salt)).cast("binary")),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return full.select(
        F.col(id_col),
        component,
        F.when(h < F.lit(cut), F.lit("valid")).otherwise(F.lit("train")).alias("split"),
    )


# Self-blocking semantic dedup fits its k-center quantizer on a sampled
# pool once the corpus exceeds the threshold (coreset_sample=None path);
# the target keeps the greedy selection's k scans ~constant-cost while
# the spread of the sample still covers the space (recall-pinned).
_CORESET_FIT_THRESHOLD = 16_384
_CORESET_FIT_TARGET = 8_192.0
# Above the threshold the auto-derived quantizer also SCALES: enough
# centers to keep blocks near the target size (bounded by the literal-
# expression cap — past that, swap the assignment to an Arrow batch),
# and the pair join grid-splits each block for parallelism.
_BLOCK_TARGET_ROWS = 4_096
_AUTO_BLOCK_K_CAP = 64
_PAIR_GRID = 8
# The grid split pays ~grid/2 row replication + (k x grid^2/2)-way task
# scheduling; below this corpus size the per-cell work is too small for
# that overhead to win (measured: sf1/20k rows 14.4 -> 18.6 s WITH the
# grid, sf3/60k rows 496 -> 80 s — the straggler regime starts past
# ~2 blocks per core).
_PAIR_GRID_THRESHOLD = 32_768


def _kmeans_blocks(
    emb: DataFrame,
    fit_fraction: "float | None",
    k: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Coarse-quantizer blocks for :func:`semantic_dedup` past the
    literal-center cap: MLlib KMeans (k-means||, fixed seed) fit on the
    hash-sampled pool, assignment via the fitted model's JVM transform.
    Returns ``emb`` + an int ``__blk`` column."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from dbms_data_anonymity_differential_privacy_spark.operators.sampling import hash_sample

    pool = emb
    if fit_fraction is not None:
        pool = hash_sample(emb, [id_col], fit_fraction, salt="semdedup-coreset")
    feat = array_to_vector(F.col(vec_col).cast("array<double>"))
    # persist the (sampled, ~8k-row) fit pool: the k-bound count below
    # and the k-means|| iterations otherwise each re-scan the sampling
    # projection (r8 verdict watch item 3 — the count was a second scan)
    train = pool.select(feat.alias("__features")).persist()
    try:
        # k can never exceed the fitting pool (KMeans requires k <=
        # points); at corpora where the block target would demand more
        # centers than the ~8k sample holds, blocks run over target and
        # the triangular pair grid carries the extra parallelism
        # (documented trade)
        k = min(int(k), max(1, train.count() // 2))
        km = KMeans(
            k=int(k), seed=42, featuresCol="__features", predictionCol="__blk",
            maxIter=20,
        )
        model = km.fit(train)
    finally:
        train.unpersist()
    assigned = model.transform(emb.withColumn("__features", feat))
    return assigned.drop("__features")


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.6,
    block_col: str | None = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    auto_block_k: int = 8,
    coreset_sample: float | None = None,
) -> DataFrame:
    """SemDeDup-style embedding-level corpus dedup (Abbas et al. 2023):
    two documents are semantic duplicates when their embeddings' cosine
    clears ``threshold``; whole duplicate CLUSTERS (connected components
    of the pair graph, not just pairwise drops) collapse to one
    representative — the min-id member, the same deterministic policy as
    the text-level corpus dedup (x03).

    The blocking column is the coarse quantizer (in SemDeDup proper: a
    k-means cluster id) — pairs are only scored INSIDE a block, which is
    what makes the quadratic scoring tractable at 100 TB (per-block pair
    volume, never corpus²). Two ways to get one:

    - ``block_col='label'`` (or any existing column): use a
      pre-existing block assignment — honest when the corpus already
      carries a cluster/LSH/topic id.
    - ``block_col=None`` (SELF-BLOCKING, the unlabeled-corpus path):
      derive the quantizer from the data — pick ``auto_block_k``
      maximally-spread exemplars with the greedy k-center coreset
      (:func:`embeddings.kcenter_coreset`, engine-exact trajectory) and
      assign every embedding to its nearest center (squared L2, ties to
      the earlier-chosen center). The k center vectors ride the
      assignment projection as literal arrays — the assignment is one
      MAP-ONLY pass over the corpus (k interpreted folds per row), no
      shuffle, no crossJoin anywhere in the plan (plan-gated in
      tests/test_round7_ops.py). Construction is eager (the coreset
      collects k 1-row selections — bounded driver work, the x171
      contract). ``coreset_sample``: the greedy selection itself scans
      the FITTING pool once per center; at 100 TB fit the quantizer on
      a deterministic hash-sample (``coreset_sample=1e-4`` ≈ a
      million-vector pool) — the standard coarse-quantizer practice
      (SemDeDup fits k-means on a subset too). Sampling only shrinks
      the fitting pool; ASSIGNMENT still covers every row, the sample
      is the portable md5 fraction (reproducible, SQL-twinnable), and
      ``None`` (default) fits on the full pool up to
      ``_CORESET_FIT_THRESHOLD`` rows and then AUTO-SAMPLES to
      ~``_CORESET_FIT_TARGET`` fitting rows (r7 verdict task 5; block
      recall vs the full-pool trajectory pinned >= 0.95 at sf1). The
      oracle-hashed x175_auto config at sf0.01/sf0.1 sits below the
      threshold, so its release is the full-pool one.
      Exactness: distances expand to
      ``dot(x,x) − 2·dot(x,c) + dot(c,c)`` with every dot a sequential
      fold, bit-identical to DuckDB's ``list_dot_product`` (the x04
      contract), so the block assignment — and therefore the whole
      release — is SQL-twinnable and oracle-hashed (x175_auto).

    The pair generator is :func:`similarity.cosine_self_join_pairs`
    (per-row norms, bit-exact vs the SQL oracle); components are
    :func:`connected_components` (driver union-find under 2M edges,
    distributed min-label propagation above).

    Output: ``(id_col, component, kept)`` for EVERY embedding row —
    singletons are their own component and always kept.
    """
    from dbms_data_anonymity_differential_privacy_spark.operators.similarity import (
        cosine_self_join_pairs,
    )

    pair_src, pair_block, pair_grid = emb, block_col, None
    if block_col is None:
        if not auto_block_k:
            raise ValueError(
                "semantic_dedup with block_col=None requires auto_block_k >= 1: "
                "unblocked pair scoring is corpus-quadratic (use "
                "similarity.cosine_self_join_pairs directly for small-data "
                "brute force)"
            )
        from dbms_data_anonymity_differential_privacy_spark.operators.similarity import _dot

        fit_pool = emb
        frac = coreset_sample
        if frac is None:
            # r7 verdict task 5: above _CORESET_FIT_THRESHOLD rows the
            # greedy selection's k full-pool scans stop being free, so
            # the quantizer fits on a deterministic hash-sample targeting
            # ~_CORESET_FIT_TARGET rows BY DEFAULT — the standard coarse-
            # quantizer practice (SemDeDup fits k-means on a subset).
            # Sampling shrinks only the FITTING pool; assignment still
            # covers every row. Block recall vs the full-pool trajectory
            # is pinned >= 0.95 at sf1 in tests/test_round8_ops.py. The
            # count is one partial-combined aggregation — noise against
            # the k scans it prices. Fixture SFs (sf0.01/sf0.1) sit below
            # the threshold, so the oracle-hashed x175_auto release is
            # byte-identical to the always-full-pool behavior there.
            n = emb.count()
            if n > _CORESET_FIT_THRESHOLD:
                frac = min(1.0, _CORESET_FIT_TARGET / float(n))
                # SCALE the quantizer with the corpus (the 30x lesson,
                # SCALE.md round-8 sf3 section): with a FIXED k the
                # per-block pair volume grows as (n/k)^2 and the join's
                # parallelism is k tasks — one oversized cell became a
                # 496 s single-core straggler at 60k rows. Growing k
                # keeps blocks near _BLOCK_TARGET_ROWS (total pair work
                # ~ n x block, linear), and the triangular pair-join
                # grid below spreads whatever imbalance remains.
                auto_block_k = max(
                    auto_block_k,
                    min(_AUTO_BLOCK_K_CAP, -(-n // _BLOCK_TARGET_ROWS)),
                )
                if n > _PAIR_GRID_THRESHOLD:
                    pair_grid = _PAIR_GRID
                k_needed = -(-n // _BLOCK_TARGET_ROWS)
                if k_needed > _AUTO_BLOCK_K_CAP:
                    # Past the literal-center cap the k-center machinery
                    # stops being the right quantizer twice over: the
                    # greedy selection is k driver round-trips, and k
                    # 64-dim literal arrays in one assignment projection
                    # blow up codegen. This is exactly where SemDeDup
                    # proper uses k-means — MLlib KMeans fit on the
                    # SAMPLED pool, JVM-side transform for assignment
                    # (array_to_vector, no Python in the scan). Above
                    # the cap the release is rows-only by the C3
                    # contract (k-means won't bit-match any SQL oracle);
                    # the oracle-hashed fixture configs never get here.
                    pair_src = _kmeans_blocks(
                        emb, frac, k_needed, vec_col, id_col
                    )
                    pair_block = "__blk"
                    pairs = cosine_self_join_pairs(
                        pair_src,
                        threshold=threshold,
                        block_col=pair_block,
                        vec_col=vec_col,
                        id_col=id_col,
                        grid=pair_grid,
                    )
                    comp = connected_components(pairs)
                    out = emb.select(F.col(id_col)).join(
                        comp.withColumnRenamed("id", id_col), on=id_col, how="left"
                    )
                    component = F.coalesce(F.col("comp"), F.col(id_col))
                    return out.select(
                        F.col(id_col),
                        component.alias("component"),
                        (component == F.col(id_col)).alias("kept"),
                    )
        if frac is not None:
            from dbms_data_anonymity_differential_privacy_spark.operators.sampling import hash_sample

            fit_pool = hash_sample(
                emb, [id_col], frac, salt="semdedup-coreset"
            )
            # a too-aggressive fraction can leave fewer than k fitting
            # points — fall back to the full pool (the count runs on the
            # SAMPLED relation, so it is cheap even when emb is not)
            if fit_pool.limit(auto_block_k).count() < auto_block_k:
                fit_pool = emb
        from dbms_data_anonymity_differential_privacy_spark.operators.embeddings import (
            _kcenter_chosen,
        )

        # the internal selection carries each center's VECTOR and its
        # engine-fold c·c, so the old centers→emb join-collect (one more
        # Spark job per call) is gone (r11)
        chosen = _kcenter_chosen(
            fit_pool, k=auto_block_k, vec_col=vec_col, id_col=id_col
        )
        v = F.col(vec_col).cast("array<double>")
        if not chosen:
            # empty corpus: nothing to block or pair — the documented
            # (id, component, kept) shape over zero rows
            return emb.select(
                F.col(id_col),
                F.col(id_col).alias("component"),
                F.lit(True).alias("kept"),
            )
        xx = _dot(v, v)
        cands = []
        for rnd, _cid, _cd, cvec_raw, cxx in sorted(chosen, key=lambda c: c[0]):
            # cxx is the pool's engine-fold dot(c, c) — the same
            # sequential left-fold that produces e.xx, so comparisons
            # downstream see bit-identical doubles
            cvec = [float(x) for x in cvec_raw]
            clit = F.array(*[F.lit(x) for x in cvec])
            cands.append(
                F.struct(
                    (xx - 2.0 * _dot(v, clit) + F.lit(float(cxx))).alias("d"),
                    F.lit(int(rnd)).alias("r"),
                )
            )
        # argmin by (distance, selection round): struct comparison is
        # lexicographic, so ties go to the earlier-chosen center
        pair_src = emb.withColumn("__blk", F.array_min(F.array(*cands))["r"])
        pair_block = "__blk"

    pairs = cosine_self_join_pairs(
        pair_src,
        threshold=threshold,
        block_col=pair_block,
        vec_col=vec_col,
        id_col=id_col,
        grid=pair_grid,
    )
    comp = connected_components(pairs)
    out = emb.select(F.col(id_col)).join(
        comp.withColumnRenamed("id", id_col), on=id_col, how="left"
    )
    component = F.coalesce(F.col("comp"), F.col(id_col))
    return out.select(
        F.col(id_col),
        component.alias("component"),
        (component == F.col(id_col)).alias("kept"),
    )


def dedup_lines_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """X176 — corpus-level duplicated-line removal (the CCNet / RefinedWeb
    paragraph-dedup stage: Wenzek et al. 2020 dedupe normalized paragraphs
    by hash across the whole crawl; Penedo et al. 2023 repeat it line-wise).
    Absent from the reference (SURVEY §0 — no corpus ops at all); designed
    from the public Spark API.

    A document is split on ``delim`` into lines with positions. A line's
    identity is its TRIMMED content; among all occurrences of the same
    content corpus-wide, only the canonical first occurrence — the minimum
    ``(id, position)`` pair, a total order independent of partitioning —
    survives. Lines whose trimmed length is below ``min_chars`` are exempt
    (always kept in place): blank/separator lines are document structure,
    and deduping them would fuse every document onto one winner.

    Output, one row per input document::

        (id, n_lines, n_kept, text_hash)

    where ``text_hash = md5(kept lines re-joined by delim in position
    order)`` — a whole-text witness that the rebuilt document is
    byte-identical across engines, without shipping the text.

    Scale shape (100 TB), built to survive the boilerplate hot key (a
    "Subscribe!" line occurring in 10% of the crawl):

    1. winners — ``groupBy(xxhash64(trimmed line)).agg(min(id, pos))``
       over the SLIM ``(hash, id, pos)`` projection: a partial-combined
       aggregation, so the hot key collapses to one row per map task
       before the exchange (a window over the hash — the obvious
       formulation — would ship every occurrence of the hot line to one
       reducer). The exchange carries 8-byte keys + two longs, no text.
    2. keep-marking — lines LEFT-join the winner ``(id, pos)`` relation
       on ``(id, pos)``: unique join keys by construction, zero skew.
    3. rebuild — kept lines regroup by ``id``.

    The line text moves through exchanges twice (2 and 3) — any
    formulation must move it at least once. Hash-keying (rather than
    grouping on the raw line string) keeps exchange 1's key fixed at 8
    bytes; a 64-bit collision across distinct line contents merges two
    dedup groups (probability ~n^2/2^65 — the standard CCNet trade,
    which hashes paragraphs to sha1 prefixes for the same reason). The
    DuckDB twin groups on the raw content, so an actual collision would
    surface as an oracle mismatch instead of passing silently.
    """
    if min_chars < 0:
        raise ValueError("min_chars must be >= 0")
    # split() takes a Java regex but the rebuild joins the literal string:
    # \Q...\E-quote the delimiter so both sides agree on any literal delim.
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\\Q" + delim + "\\E", -1)
        ).alias("__pos", "__line"),
    )
    norm = F.trim(F.col("__line"))
    dedupable = F.length(norm) >= min_chars
    winners = (
        lines.filter(dedupable)
        .groupBy(F.xxhash64(norm).alias("__k"))
        .agg(F.min(F.struct(F.col(id_col), F.col("__pos"))).alias("__f"))
        .select(
            F.col("__f")[id_col].alias("__wid"),
            F.col("__f")["__pos"].alias("__wpos"),
            F.lit(True).alias("__w"),
        )
    )
    joined = lines.join(
        winners,
        (F.col(id_col) == F.col("__wid")) & (F.col("__pos") == F.col("__wpos")),
        "left",
    )
    kept = ~dedupable | F.coalesce(F.col("__w"), F.lit(False))
    marked = joined.withColumn("__keep", kept)
    rebuilt = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("__keep"), F.struct(F.col("__pos"), F.col("__line")))
                )
            ),
            lambda s: s["__line"],
        ),
        delim,
    )
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("__keep").cast("long")).alias("n_kept"),
        F.md5(rebuilt).alias("text_hash"),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 4,
) -> DataFrame:
    """X178 — winnowing document fingerprints (Schleimer, Wilkerson &
    Aiken 2003, the MOSS algorithm): select a position-robust subset of
    k-gram hashes such that any shared substring of length >= w + k - 1
    tokens between two documents is GUARANTEED to contribute at least one
    shared fingerprint — the coverage guarantee MinHash cannot give
    (MinHash bounds expected Jaccard error; winnowing bounds worst-case
    detection). Absent from the reference (SURVEY §0 — no corpus ops);
    designed from the public algorithm.

    Selection rule (the paper's robust variant): slide a window of ``w``
    consecutive k-gram hashes; in each window keep the minimum hash,
    breaking ties by RIGHTMOST position. Expected density is
    2 / (w + 1) of all k-grams, so the fingerprint relation is a tunable
    fraction of the shingle relation.

    The hash must order identically on every engine because the
    SELECTION (not just the identity) depends on hash ORDER: md5 hex of
    the space-joined lowercased k-gram, compared lexicographically — a
    portable total order, unlike engine-native 64-bit hashes
    (xxhash64 vs DuckDB's hash() disagree). 32 hex chars per selected
    gram is the honest cost; the pair join downstream carries only
    selected rows (~2/(w+1) density).

    Documents with fewer than ``w + k - 1`` tokens degrade gracefully:
    the only valid window start is position 0 and the frame truncates at
    the partition end, so the single corpus-visible minimum of ALL their
    k-grams is selected (documents shorter than ``k`` tokens have no
    k-grams and no fingerprints — disclosed, same as the shingle ops).

    Output: ``(id, h, fpos)`` — one row per distinct selected
    (fingerprint, position); the same hash selected at two positions in
    one document appears twice (positions matter for extent estimation),
    so consumers that want set semantics must project-distinct on
    ``(id, h)`` (:func:`winnow_match_pairs` does).

    Scale shape: one tokenization pass; k-grams stay an array column
    until a single posexplode; the ONE exchange is the per-doc sort for
    the window (partitioned by doc id — uniform unless one document is a
    significant fraction of the corpus). min-of-struct with a bounded
    w-row frame is a linear scan per partition; no self-join, no
    quadratic blowup at any stage.
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n_g = F.greatest(F.size(toks) - F.lit(k - 1), F.lit(0))
    grams = F.when(
        n_g > 0,
        F.transform(
            F.sequence(F.lit(0), n_g - 1),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = fan_out(df).select(F.col(id_col), F.posexplode(grams).alias("pos", "h"))
    win = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    per_doc = Window.partitionBy(id_col)
    # min(struct(h, -pos)) == (smallest hash, rightmost position): the
    # paper's tie rule, one expression, no second pass. Valid window
    # starts are pos <= G - w (greatest(..., 0) keeps the degenerate
    # short-doc window at pos 0).
    return (
        g.withColumn(
            "__m", F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np"))).over(win)
        )
        .withColumn("__G", F.count(F.lit(1)).over(per_doc))
        .filter(F.col("pos") <= F.greatest(F.col("__G") - F.lit(w), F.lit(0)))
        .select(F.col(id_col), F.col("__m.h").alias("h"), (-F.col("__m.np")).alias("fpos"))
        .distinct()
    )


def winnow_match_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 4,
    max_df: int = 50,
    min_shared: int = 3,
) -> DataFrame:
    """X178 — cross-document content-overlap candidates from winnowing
    fingerprints (the MOSS match step): documents sharing >= ``min_shared``
    distinct fingerprints, with the shared count as the overlap score.
    By the winnowing guarantee, any copied passage of
    ``w + k - 1`` (default 7) or more tokens between two documents
    surfaces at least one shared fingerprint — so ``min_shared`` counts
    (approximately) distinct copied passages, a plagiarism/boilerplate
    signal orthogonal to whole-doc Jaccard.

    Stop-fingerprint removal before the pair join: a fingerprint
    appearing in more than ``max_df`` documents is corpus boilerplate and
    would contribute a df^2 pair blowup (the hot-key death of every
    inverted-index join); dropping it is both the scale guard and the
    standard relevance heuristic (MOSS does the same via its shared-
    fingerprint cap). With the cap, pair volume is bounded by
    sum_h min(df_h, max_df)^2 — linear in corpus size for fixed max_df.

    Output: ``(doc_a, doc_b, n_shared)`` with doc_a < doc_b.
    """
    sel = winnow_fingerprints(df, text_col, id_col, k=k, w=w)
    dh = sel.select(F.col(id_col), "h").distinct()
    keep = dh.groupBy("h").agg(F.count(F.lit(1)).alias("__df")).filter(
        F.col("__df") <= max_df
    )
    ok = dh.join(keep.select("h"), "h")
    a = ok.select(F.col(id_col).alias("doc_a"), "h")
    b = ok.select(F.col(id_col).alias("doc_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def canary_audit(
    df: DataFrame,
    canaries: "Sequence[str]",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X227 — planted-canary memorization audit (Carlini et al. 2019,
    "The Secret Sharer": unique canary strings are planted before
    training and their duplication level predicts extraction risk; the
    Secret Sharer protocol's first, data-side half is exactly this
    report). Given the PUBLIC canary list, release per canary how often
    and how widely it occurs in the corpus — the number a privacy
    review reads before approving a training run, and the input to the
    canary-exposure computation the model-side half performs.

    Output, one row per canary (canaries absent from the corpus release
    zeros — absence is the PASSING result and must be visible)::

        (canary_id, canary, n_docs, n_occurrences, first_doc_id)

    ``n_occurrences`` counts overlapping-free occurrences via the
    classic length-difference identity
    ``(len(t) - len(replace(t, c, ''))) / len(c)`` — pure JVM
    built-ins; ``first_doc_id`` is the min doc id containing the
    canary (deterministic witness).

    Scale shape (100 TB): the canary list is data-independent metadata
    (tens of strings) riding the projection as LITERALS — the scan is
    ONE map-only pass over the corpus (all canaries tested per row,
    zero joins), followed by one partial-combined aggregation to
    |canaries| rows. No shuffle carries text.

    Cross-engine exactness: counts are exact int64; no floats anywhere.
    """
    rows = []
    for cid, c in enumerate(canaries):
        if not c:
            raise ValueError("empty canary string")
        t = F.col(text_col)
        occ = (F.length(t) - F.length(F.replace(t, F.lit(c), F.lit("")))) / F.lit(
            len(c)
        )
        rows.append(
            F.struct(
                F.lit(cid).alias("canary_id"),
                F.lit(c).alias("canary"),
                occ.cast("long").alias("occ"),
                F.col(id_col).alias("id"),
            )
        )
    exploded = df.select(F.explode(F.array(*rows)).alias("c")).select(
        "c.canary_id", "c.canary", "c.occ", "c.id"
    )
    return (
        exploded.groupBy("canary_id", "canary")
        .agg(
            F.sum((F.col("occ") > 0).cast("long")).alias("n_docs"),
            F.sum("occ").alias("n_occurrences"),
            F.min(F.when(F.col("occ") > 0, F.col("id"))).alias("first_doc_id"),
        )
        .select(
            "canary_id",
            "canary",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            "first_doc_id",
        )
    )


def near_dup_plan_audit(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    switch_factor: int = 50,
) -> DataFrame:
    """EXPLAIN for the adaptive Jaccard join: the shingle-frequency
    statistics :func:`ngram_jaccard_pairs` bases its physical-strategy
    switch on, plus the candidate-pair volume EACH strategy would
    shuffle — so the sum(df²) >= ``switch_factor``·sum(df) trigger is an
    auditable release, not a hidden heuristic (round-9 verdict task 7:
    committed evidence that the prefix path ENGAGES on boilerplate-heavy
    corpora and what it saves).

    One row: ``(n_docs, n_shingles, n_postings, sum_df2,
    plain_cand_pairs, prefix_cand_pairs, prefix_chosen)``.

    - ``plain_cand_pairs`` = Σ_s df·(df−1)/2 — the exact candidate-row
      volume the inverted-index self-join generates (its blowup mode:
      one shingle in 30 % of docs contributes (0.3·N)²/2 alone).
    - ``prefix_cand_pairs`` = the same sum over the PPJoin rare-first
      prefix postings (rank by (df, shingle) within doc, keep
      rn ≤ n_sh − ceil(t·n_sh) + 1, df ≥ 2).

    Portability: the audit ranks by the string shingle itself (binary
    collation on both engines), where the operator ranks equal-df
    shingles by their xxhash64 — candidate COUNTS under equal-df
    tie-breaks differ by which equal-frequency shingles make the cut,
    never in magnitude; the operator's exactness is unaffected (prefix
    choice changes candidates, re-scoring makes the PAIR SET identical —
    tests/test_properties.py).

    Scale shape: tokenize/shingle map-only; one df aggregation; one
    per-doc row_number window over the posting relation (bounded by doc
    shingle counts); three scalar aggregations. No pair joins — the
    audit costs O(postings), precisely so it can run BEFORE committing
    to a strategy at 100 TB.
    """
    sh = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(F.col(text_col), n)).alias("s"),
    )
    sh = track_cached(sh.persist())
    e = sh.select(
        "id", F.size("s").alias("n_sh"), F.explode("s").alias("shingle")
    )
    e = track_cached(e.persist())
    dfreq = track_cached(
        e.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).persist()
    )
    n_docs = sh.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    stats = dfreq.agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.coalesce(F.sum("df"), F.lit(0)).cast("long").alias("n_postings"),
        F.coalesce(F.sum(F.col("df") * F.col("df")), F.lit(0))
        .cast("long")
        .alias("sum_df2"),
        F.coalesce(
            F.sum(F.expr("CAST(df * (df - 1) DIV 2 AS BIGINT)")), F.lit(0)
        )
        .cast("long")
        .alias("plain_cand_pairs"),
    )
    ranked = e.join(dfreq, on="shingle").withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("id").orderBy("df", "shingle")),
    )
    prefix = ranked.filter(
        (
            F.col("rn")
            <= F.col("n_sh") - F.ceil(F.lit(float(threshold)) * F.col("n_sh")) + 1
        )
        & (F.col("df") >= 2)
    )
    pstats = prefix.groupBy("shingle").agg(F.count(F.lit(1)).alias("pdf")).agg(
        F.coalesce(
            F.sum(F.expr("CAST(pdf * (pdf - 1) DIV 2 AS BIGINT)")), F.lit(0)
        )
        .cast("long")
        .alias("prefix_cand_pairs")
    )
    return (
        n_docs.crossJoin(stats)  # 1-row constant relations: broadcast
        .crossJoin(pstats)
        .select(
            "n_docs",
            "n_shingles",
            "n_postings",
            "sum_df2",
            "plain_cand_pairs",
            "prefix_cand_pairs",
            (
                F.col("sum_df2") > F.lit(int(switch_factor)) * F.col("n_postings")
            ).alias("prefix_chosen"),
        )
    )


def capture_recapture_audit(
    pairs_a: DataFrame,
    pairs_b: DataFrame,
    id_col: str = "id_b",
) -> DataFrame:
    """X228 — capture-recapture duplicate-population estimate (Chapman
    1951's bias-corrected Lincoln-Petersen): treat two INDEPENDENT
    near-dup detectors as two capture occasions over the same unknown
    population of true duplicates, and estimate how many duplicates the
    corpus really contains — including the ones BOTH detectors missed.
    This is the coverage audit a dedup pipeline publishes next to its
    drop count: "we dropped 480, capture-recapture estimates ~520 exist"
    turns an unverifiable cleaning step into a measurable one. The same
    estimator wildlife surveys and record-linkage QA use.

    Inputs are two PAIR relations (the ``(id_a, id_b, ...)`` shape every
    pair generator here emits); a document counts as "captured" by a
    detector when it appears as the DROPPED side (``id_b``) of any
    qualifying pair — the greedy-policy flag (Lee et al. 2022 §3.2),
    consistent with x03_dedup_corpus.

    ``chapman = (n1+1)(n2+1)/(m+1) - 1`` (exact-integer numerator, one
    IEEE division; defined even at m=0), ``lincoln_petersen = n1*n2/m``
    (NULL at m=0). Independence caveat documented: correlated detectors
    bias both estimators low — pair detectors with different
    representations (e.g. different shingle widths).

    Output (single row): ``(n_a, n_b, n_both, chapman_r,
    lincoln_petersen_r)`` at 6 dp.

    Scale shape (100 TB): each flag set is one distinct over a pair
    relation's dropped column; the overlap is one join of two id sets
    (metadata-sized relative to the corpus); the release is one row.
    """
    fa = pairs_a.select(F.col(id_col).alias("__id")).distinct()
    fb = pairs_b.select(F.col(id_col).alias("__id")).distinct()
    agg = (
        fa.withColumn("__a", F.lit(1))
        .join(fb.withColumn("__b", F.lit(1)), on="__id", how="full")
        .agg(
            # coalesce AFTER the sum too: a zero-row full join (neither
            # detector flagged anything) must release (0, 0, 0), not NULLs
            # (round-9 review finding)
            F.coalesce(F.sum(F.coalesce(F.col("__a"), F.lit(0))), F.lit(0))
            .cast("long")
            .alias("n_a"),
            F.coalesce(F.sum(F.coalesce(F.col("__b"), F.lit(0))), F.lit(0))
            .cast("long")
            .alias("n_b"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("__a").isNotNull() & F.col("__b").isNotNull(), 1
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_both"),
        )
    )
    n1 = F.col("n_a").cast("double")
    n2 = F.col("n_b").cast("double")
    m = F.col("n_both").cast("double")
    chapman = (
        ((F.col("n_a") + F.lit(1)) * (F.col("n_b") + F.lit(1))).cast("double")
        / (m + F.lit(1.0))
        - F.lit(1.0)
    )
    lp = F.when(F.col("n_both") > 0, n1 * n2 / m)
    return agg.select(
        "n_a",
        "n_b",
        "n_both",
        F.round(chapman, 6).alias("chapman_r"),
        F.round(lp, 6).alias("lincoln_petersen_r"),
    )


# Carter-Wegman permutation constants for the PORTABLE (md5-based)
# MinHash audit — same family as minhash_lsh_pairs' _affine, precomputed
# driver-side so both engines consume identical literals.
_MH_AUDIT_P = (1 << 61) - 1


def _mh_audit_perms(num_hashes: int) -> "list[tuple[int, int, int]]":
    out = []
    for i in range(num_hashes):
        a = ((0x9E3779B9 * (2 * i + 1)) & 0x1FFFFFFE) | 1  # odd, < 2^29
        b = (0x85EBCA6B94D049BB * (i + 1)) & 0x1FFFFFFFFFFFFFFF  # < 2^61
        out.append((i, a, b))
    return out


def minhash_jaccard_audit(
    docs: DataFrame,
    threshold: float = 0.2,
    n: int = 3,
    num_hashes: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X234 — MinHash estimator audit (Broder 1997): for every exact
    n-gram-Jaccard qualifying pair, release the exact Jaccard NEXT TO
    the k-permutation MinHash estimate ``(1/k) Σ_i [mh_i(A)=mh_i(B)]``
    and the absolute error — the x232 Count-Min idea applied to the
    sketch this engine's own LSH dedup (x03) relies on: the estimator's
    accuracy contract (err ~ sqrt(J(1-J)/k)) becomes an auditable
    relation over real corpus pairs instead of a paper bound.

    Portability: the production LSH path (minhash_lsh_pairs) hashes via
    xxhash64 — Spark-only. The AUDIT derives its base hash from an md5
    hex prefix (``conv(substr(md5(shingle),1,8),16,10)``, the x10/x232
    discipline) so DuckDB replays every signature component exactly; the
    Carter-Wegman maps ``(a_i·h32 + b_i) mod (2^61-1)`` use the SAME
    driver-computed constants on both engines (exact int64:
    h32 < 2^32, a < 2^29 → product < 2^61; +b < 2^62).

    Output per qualifying pair: ``(id_a, id_b, jaccard_r,
    minhash_est_r, abs_err_r)`` at 9 dp.

    Scale shape (100 TB): signatures are ONE aggregation of the shingle
    relation exploded ×k with map-side min-combining; the audit join
    touches qualifying pairs × k signature rows — pair-relation-sized,
    never corpus². The exact pair relation reuses
    :func:`ngram_jaccard_pairs` (shared tokenization economics).
    """
    sh_rel = (
        fan_out(docs)
        .select(
            F.col(id_col).alias("__id"),
            F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("__sh"),
        )
    )
    h32 = F.conv(F.substring(F.md5(F.col("__sh")), 1, 8), 16, 10).cast("long")
    # WIDE signature: one row per doc with num_hashes min columns, via a
    # single partial-combined aggregation over the posting relation. The
    # previous shape crossJoined every posting with the k permutations
    # (postings x k exchange rows) and re-aggregated by (doc, i), then
    # joined the pair relation to k signature rows PER SIDE and counted
    # matches with one more aggregation. Per-component mins are
    # identical (min over the same multiset, grouped wide instead of
    # tall), and the match count is the same exact integer sum of k
    # equality indicators — now a single projection over one row (r11;
    # guide §2.3/§2.4: k times fewer exchange rows, three exchanges and
    # a crossJoin removed).
    sig = (
        sh_rel.withColumn("__h32", h32)
        .groupBy("__id")
        .agg(
            *[
                F.min(
                    F.pmod(
                        F.col("__h32") * F.lit(a) + F.lit(b), F.lit(_MH_AUDIT_P)
                    )
                ).alias(f"__mh{i}")
                for i, a, b in _mh_audit_perms(num_hashes)
            ]
        )
    )
    sig = track_cached(sig.persist())  # feeds both sides of the pair join
    pairs = ngram_jaccard_pairs(
        docs, threshold=threshold, n=n, text_col=text_col, id_col=id_col
    )
    sa = sig.select(
        F.col("__id").alias("id_a"),
        *[F.col(f"__mh{i}").alias(f"__ma{i}") for i in range(num_hashes)],
    )
    sb = sig.select(
        F.col("__id").alias("id_b"),
        *[F.col(f"__mh{i}").alias(f"__mb{i}") for i in range(num_hashes)],
    )
    matches = sum(
        [
            F.when(F.col(f"__ma{i}") == F.col(f"__mb{i}"), 1).otherwise(0)
            for i in range(num_hashes)
        ],
        F.lit(0),
    )
    est = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "jaccard",
            (matches.cast("double") / F.lit(float(num_hashes))).alias("__est"),
        )
    )
    return est.select(
        "id_a",
        "id_b",
        F.col("jaccard").alias("jaccard_r"),
        F.round("__est", 9).alias("minhash_est_r"),
        F.round(F.abs(F.col("jaccard") - F.col("__est")), 9).alias("abs_err_r"),
    )


def line_duplication_profile(
    docs: DataFrame,
    line_tokens: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X238 — the corpus duplication PROFILE: for every line-repetition
    count s, how many distinct lines occur exactly s times and what
    share of the corpus token mass they carry. x176 answers "remove the
    duplicates"; this answers the datasheet question BEFORE removal —
    is duplication a flat 2x tail or a few mega-repeated boilerplate
    lines? (The shape decides between line-dedup, boilerplate removal
    (x233), and doing nothing.) The same histogram-of-multiplicities
    relation Good-Turing (x184) reads for types, here over x176's
    4-token line segmentation with token-mass accounting.

    Output per multiplicity: ``(occurrences, n_distinct_lines, n_line_
    occurrences, token_mass, token_share_r)`` ascending, share at 9 dp.

    Scale shape (100 TB): segmentation is map-only; one (line)
    aggregation with map-side combining (word-count shape), one
    histogram rollup on the distinct-line relation, one broadcast of
    the 1-row total. The released relation is at most
    max-multiplicity rows.
    """
    if line_tokens < 1:
        raise ValueError("line_tokens must be >= 1")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    e = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(toks).alias("__pos", "__tok"),
    )
    lines = e.groupBy(
        "__id", F.floor(F.col("__pos") / F.lit(line_tokens)).alias("__lpos")
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
    # per_line feeds the histogram AND the total — persist the
    # distinct-line-sized relation so segmentation runs once
    per_line = track_cached(
        lines.groupBy("__line")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__occ"),
            F.sum("__ntok").cast("long").alias("__mass"),
        )
        .persist()
    )
    hist = per_line.groupBy(F.col("__occ").alias("occurrences")).agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_lines"),
        F.sum("__occ").cast("long").alias("n_line_occurrences"),
        F.sum("__mass").cast("long").alias("token_mass"),
    )
    total = per_line.agg(F.sum("__mass").cast("long").alias("__tot"))
    return hist.join(F.broadcast(total)).select(
        "occurrences",
        "n_distinct_lines",
        "n_line_occurrences",
        "token_mass",
        F.round(
            F.col("token_mass").cast("double") / F.col("__tot").cast("double"), 9
        ).alias("token_share_r"),
    )
