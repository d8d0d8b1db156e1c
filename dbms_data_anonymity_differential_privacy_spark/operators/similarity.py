"""Similarity search over embedding columns — SURVEY §2c X4.

Baseline: brute-force cosine top-k with the dot product as a fold over
``zip_with`` — pure built-ins, JVM-side, map-only over the table then a
global top-k (``TakeOrderedAndProject``, no full sort shuffle).

Scale path: random-hyperplane LSH bucketing (charikar 2002-style) — the
signature is computed with deterministic per-plane hashes so bucket
assignment is partitioning-independent; candidates only join within a
bucket. For 100 TB you'd persist the bucketed relation and broadcast the
query signature; brute force stays as the exact re-scorer within buckets.
MLlib's BucketedRandomProjectionLSH offers the same shape when Euclidean
distance is acceptable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.util import fan_out


def _dot(a: Column, b: Column) -> Column:
    """Sequential fold — same accumulation order as DuckDB's
    list_dot_product, so results are bit-identical."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    """NULL (not NaN) for zero vectors: 0/0 would yield NaN, and Spark
    sorts NaN as LARGEST — a zero vector would fake-top every descending
    top-k. NULLs sort last under desc (default nulls-last), so degenerate
    vectors drop out of rankings instead of winning them."""
    denom = _norm(a) * _norm(b)
    return F.when(denom != 0.0, _dot(a, b) / denom).otherwise(F.lit(None))


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """X4 — exact cosine top-k of ``query_vec`` against every row.

    Output ``(id, cos)`` with cos rounded to 6 dp; ties broken by id so the
    selection is total-order deterministic (and oracle-reproducible).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    scored = fan_out(df).select(
        F.col(id_col), F.round(cosine_expr(v, q), 6).alias("cos")
    )
    return scored.orderBy(F.desc("cos"), F.col(id_col)).limit(k)


def cosine_self_join_pairs(
    df: DataFrame,
    threshold: float,
    block_col: str | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    grid: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold, optionally
    blocked on ``block_col`` (a coarse-quantizer/LSH-bucket stand-in that
    turns the O(n^2) join into per-bucket joins — the scale idiom).

    Norms are computed ONCE PER ROW in the pre-join projections and
    carried through the join: with P pairs from n rows (P >> n in every
    bucket of interesting size) the naive per-pair ``cosine_expr`` costs
    3 interpreted HOF folds per pair (dot + both norms — HOFs get no
    codegen CSE), while this shape costs 1 fold per pair + 1 per row.
    Measured 3x on the 10x-inflated corpus. The arithmetic is unchanged
    (same dot, same norm values, same guard), so results stay
    bit-identical to the DuckDB oracle.

    ``grid`` (blocked mode only): triangular self-join grid split. A
    plain per-block join's PARALLELISM equals the block count — with a
    handful of quantizer cells, one oversized block is a single
    straggler task scoring block² pairs alone (measured at 30× scale:
    x175-auto 496 s with 31/32 cores idle). Each row gets a sub-bucket
    ``s = pmod(xxhash64(id), grid)``; cell (p, q), p <= q, joins the
    rows with s=p against the rows with s=q, so every unordered pair
    lands in EXACTLY ONE of the grid·(grid+1)/2 cells per block and the
    shuffle key (blk, p, q) spreads a hot block over that many tasks.
    Row replication is ~grid/2 per side (linear, tiny next to the pair
    volume); the pair SET and every scored value are identical — the
    in-cell condition ``p < q OR id_a < id_b`` keeps exactly the
    original a.id < b.id pair set after least/greatest orientation
    (the elementwise products commute, so the fold is the same double
    sequence either way). Equivalence pinned in tests.
    """
    from dbms_data_anonymity_differential_privacy_spark.operators.util import track_cached

    df = fan_out(df)
    v = F.col(vec_col).cast("array<double>")
    if block_col and grid and grid > 1:
        s = F.pmod(F.xxhash64(F.col(id_col)), F.lit(int(grid))).cast("int")
        # persisted: BOTH sides of the self-join read this projection, and
        # its upstream is routinely expensive — the interpreted per-row
        # norm fold here, plus whatever the caller computed (semantic_
        # dedup's k-center assignment folds, the LSH hyperplane signature)
        # — without the cache boundary every one of those runs TWICE, once
        # per join side (r11; the x41 hamming_pairs lesson, guide §5)
        base = track_cached(
            df.select(
                F.col(id_col).alias("id"),
                v.alias("vec"),
                _norm(v).alias("nrm"),
                F.col(block_col).alias("blk"),
                s.alias("s"),
            ).persist()
        )
        a = base.select(
            F.col("id").alias("id_a"),
            F.col("vec").alias("va"),
            F.col("nrm").alias("na"),
            "blk",
            F.col("s").alias("p"),
            F.explode(F.sequence(F.col("s"), F.lit(int(grid) - 1))).alias("q"),
        )
        b = base.select(
            F.col("id").alias("id_b"),
            F.col("vec").alias("vb"),
            F.col("nrm").alias("nb"),
            "blk",
            F.explode(F.sequence(F.lit(0), F.col("s"))).alias("p"),
            F.col("s").alias("q"),
        )
        joined = a.join(b, on=["blk", "p", "q"], how="inner").filter(
            (F.col("p") < F.col("q")) | (F.col("id_a") < F.col("id_b"))
        )
        denom = F.col("na") * F.col("nb")
        cos = F.when(denom != 0.0, _dot(F.col("va"), F.col("vb")) / denom).otherwise(
            F.lit(None)
        )
        scored = joined.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.round(cos, 6).alias("cos"),
        )
        return scored.filter(F.col("cos") >= F.lit(threshold))
    # same double-execution guard as the grid path: one persisted
    # (id, vec, norm[, blk]) projection feeds both join sides
    base = track_cached(
        df.select(
            F.col(id_col).alias("id"),
            v.alias("vec"),
            _norm(v).alias("nrm"),
            *([F.col(block_col).alias("blk")] if block_col else []),
        ).persist()
    )
    a = base.select(
        F.col("id").alias("id_a"),
        F.col("vec").alias("va"),
        F.col("nrm").alias("na"),
        *(["blk"] if block_col else []),
    )
    b = base.select(
        F.col("id").alias("id_b"),
        F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"),
        *(["blk"] if block_col else []),
    )
    cond = [F.col("id_a") < F.col("id_b")]
    joined = a.join(b, on=(["blk"] if block_col else []) or None, how="inner") if block_col else a.crossJoin(b)
    joined = joined.filter(cond[0])
    denom = F.col("na") * F.col("nb")
    cos = F.when(denom != 0.0, _dot(F.col("va"), F.col("vb")) / denom).otherwise(F.lit(None))
    scored = joined.select("id_a", "id_b", F.round(cos, 6).alias("cos"))
    return scored.filter(F.col("cos") >= F.lit(threshold))


def cosine_pairs_topm(
    df: DataFrame,
    m: int = 5,
    threshold: float | None = None,
    block_col: str | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    impl: str | None = None,
) -> DataFrame:
    """Bounded-output neighbor pairs: for every vector, its ``m`` most
    similar OTHER vectors (ties broken by neighbor id). The cap-and-rank
    answer to the one scale weakness of exact pair emission: where
    ``cosine_self_join_pairs`` emits O(matches) rows (output-bound by
    contract), this emits <= n*m rows whatever the similarity structure —
    the shape dedup/link pipelines actually consume.

    ``impl=None`` (default) resolves to ``'arrow'`` when ``block_col`` is
    set and ``'sql'`` otherwise: blocked scoring is exactly where the
    BLAS path is both applicable (blocks fit a worker) and ~20x faster
    than the interpreted fold at sf1, so it is the production default;
    the sequential-fold sql flavor remains the oracle-bit-exact path.

    ``impl='sql'`` (oracle-bit-exact): each undirected candidate
    pair is scored ONCE (one interpreted HOF fold), both directions are
    emitted with a 2-element explode, and the rank filter is written as
    row_number-over-window + ``rnk <= m`` so Catalyst's
    InferWindowGroupLimit inserts a WindowGroupLimit (Partial) that keeps
    m rows per key map-side BEFORE the window shuffle (plan-gated in
    tests/test_plans.py) — per-key partial top-k, never
    materialize-all-pairs.

    ``impl='arrow'`` (the throughput path): per-block grouped
    ``applyInPandas`` scoring the whole block with one BLAS matmul —
    measured ~20x over the interpreted fold at the synthetic sf1 (the fold
    pays ~64 interpreted ops/pair; BLAS pays vectorized FMAs). Same
    semantics and tie order; float accumulation order differs from the
    sequential fold (last-bit), so this flavor is equivalence-tested
    rather than oracle-hashed. Blocks must fit one worker's memory —
    exactly the bound ``block_col`` (label / LSH bucket / IVF list)
    already enforces for candidate generation.

    Combine with ``block_col`` at scale so candidate generation is also
    bounded; with no blocking the sql flavor cross-joins (exact but
    O(n^2) — small-n only).
    """
    from pyspark.sql import Window

    if impl is None:
        impl = "arrow" if block_col is not None else "sql"
    if impl == "arrow":
        if block_col is None:
            raise ValueError("impl='arrow' scores per block; pass block_col")
        return _cosine_topm_arrow(df, m, threshold, block_col, vec_col, id_col)
    if impl != "sql":
        raise ValueError(f"unknown impl {impl!r}")

    df = fan_out(df)
    v = F.col(vec_col).cast("array<double>")
    blk = [F.col(block_col).alias("blk")] if block_col else []
    a = df.select(F.col(id_col).alias("id_a"), v.alias("va"), _norm(v).alias("na"), *blk)
    b = df.select(F.col(id_col).alias("id_b"), v.alias("vb"), _norm(v).alias("nb"), *blk)
    joined = a.join(b, on="blk") if block_col else a.crossJoin(b)
    joined = joined.filter(F.col("id_a") < F.col("id_b"))
    denom = F.col("na") * F.col("nb")
    cos = F.when(denom != 0.0, _dot(F.col("va"), F.col("vb")) / denom).otherwise(F.lit(None))
    undirected = joined.select("id_a", "id_b", F.round(cos, 6).alias("cos"))
    # the threshold is direction-independent, so it filters the undirected
    # stream BEFORE the bidirectional explode: half the rows reach the
    # explode and the window shuffle (the r3 sf1 profile showed the
    # post-explode placement doubling the stream for nothing)
    if threshold is not None:
        undirected = undirected.filter(F.col("cos") >= F.lit(threshold))
    # one fold per undirected pair; both directions via a literal 2-array
    # explode (explode_outer per the measured Generate-pushdown trap —
    # SCALE.md "Python boundary": plain explode lets Catalyst restate the
    # generated-side constraints below the join as filters, and Filter
    # gets no CSE on the interpreted fold)
    scored = undirected.select(
        F.explode_outer(
            F.array(
                F.struct(F.col("id_a").alias("s"), F.col("id_b").alias("d")),
                F.struct(F.col("id_b").alias("s"), F.col("id_a").alias("d")),
            )
        ).alias("e"),
        "cos",
    ).select(F.col("e.s").alias("id_a"), F.col("e.d").alias("id_b"), "cos")
    w = Window.partitionBy("id_a").orderBy(F.desc("cos"), F.col("id_b"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= m)


def _cosine_topm_arrow(
    df: DataFrame,
    m: int,
    threshold: float | None,
    block_col: str,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Grouped-map BLAS scoring for :func:`cosine_pairs_topm`
    (``impl='arrow'``): one ``V @ V.T`` per block, per-row
    (cos desc, id asc) top-m via lexsort. NaN cosines (zero vectors) rank
    last, matching the SQL flavor's NULLS LAST."""
    import numpy as np
    import pandas as pd

    def block(pdf: pd.DataFrame) -> pd.DataFrame:
        v_mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        ids = pdf[id_col].to_numpy()
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": [], "rnk": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cos": "float64", "rnk": "int32"}
            )
        norms = np.sqrt((v_mat * v_mat).sum(axis=1))
        denom = np.outer(norms, norms)
        with np.errstate(divide="ignore", invalid="ignore"):
            cmat = np.where(denom != 0.0, (v_mat @ v_mat.T) / denom, np.nan)
        np.fill_diagonal(cmat, np.nan)
        cmat = np.round(cmat, 6)
        out_a, out_b, out_c, out_r = [], [], [], []
        for i in range(n):
            row = cmat[i]
            # candidates: all j != i, filtered BEFORE ranking (matching the
            # sql flavor's filter-then-row_number), ordered (cos desc,
            # id asc); NaN sorts last, matching NULLS LAST
            cand = np.delete(np.arange(n), i)
            if threshold is not None:
                cand = cand[np.where(row[cand] >= threshold)[0]]  # NaN fails
            sel = cand[np.lexsort((ids[cand], -row[cand]))]
            take = sel[:m]
            cs = row[take]
            out_a.extend([ids[i]] * len(take))
            out_b.extend(ids[take])
            out_c.extend([None if np.isnan(c) else float(c) for c in cs])
            out_r.extend(range(1, len(take) + 1))
        return pd.DataFrame(
            {
                "id_a": pd.array(out_a, dtype="int64"),
                "id_b": pd.array(out_b, dtype="int64"),
                "cos": pd.array(out_c, dtype="float64"),
                "rnk": pd.array(out_r, dtype="int32"),
            }
        )

    return df.groupBy(block_col).applyInPandas(block, "id_a long, id_b long, cos double, rnk int")


def lsh_bucket_signature(
    df: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane signature as an int bucket in [0, 2^n_planes).

    Plane j's i-th coordinate is a deterministic pseudo-random ±1 derived
    from xxhash64(seed, j, i) — no driver-side RNG state, identical on any
    cluster. sign(v . plane_j) gives bit j.
    """
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for j in range(n_planes):
        # deterministic ±1 pattern for plane j over the dim coordinates
        plane = F.array(
            *[
                F.when(
                    F.pmod(F.xxhash64(F.lit(seed), F.lit(j), F.lit(i)), F.lit(2)) == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0))
                for i in range(dim)
            ]
        )
        bit = F.when(_dot(v, plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + (bit.cast("long") * F.lit(2**j))
    return df.withColumn("lsh_bucket", bucket)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Label-free embedding near-dup pairs: random-hyperplane LSH bucket as
    the blocking key, exact cosine re-score within buckets.

    High-cosine pairs agree on most hyperplane signs, so they share a
    bucket with high probability at modest n_planes; candidates are
    ~n^2/2^n_planes instead of n^2. Approximate by design (bucket-boundary
    pairs can be missed) → rows-only check with a recall test.
    """
    bucketed = lsh_bucket_signature(df, n_planes, _dim_of(df, vec_col), seed, vec_col)
    return cosine_self_join_pairs(
        bucketed, threshold, block_col="lsh_bucket", vec_col=vec_col, id_col=id_col
    ).select("id_a", "id_b", "cos")


def embedding_dedup(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    policy: str = "components",
) -> DataFrame:
    """Embedding-level corpus dedup — the semantic-duplicate analog of the
    text-shingle ``near_dedup_corpus``: LSH-blocked cosine pairs above
    ``threshold`` (:func:`embedding_near_dup_pairs`), then the shared
    keep-policy machinery (``dedup.dedup_corpus``: greedy anti-join or
    exact connected components, min-id representative). Returns the kept
    rows with the input schema.

    This is how a training-data pipeline drops paraphrase/translation
    near-copies that share no n-grams. Approximate by LSH-bucket design
    (bucket-boundary pairs can be missed) → rows-only check with recall
    pinned by the planted-duplicate test.
    """
    from dbms_data_anonymity_differential_privacy_spark.operators.dedup import dedup_corpus

    pairs = embedding_near_dup_pairs(
        df, threshold=threshold, n_planes=n_planes, seed=seed,
        vec_col=vec_col, id_col=id_col,
    ).select(F.col("id_a"), F.col("id_b"))
    return dedup_corpus(df, pairs, id_col=id_col, policy=policy)


def _dim_of(df: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality from the first row (metadata-cheap; the
    plane construction needs it driver-side)."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None:
        return 0
    return int(row["d"])


def ivf_index(
    df: DataFrame,
    n_lists: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: KMeans centroids over the embedding space;
    every vector is assigned to its nearest centroid's inverted list.

    Returns ``(df + ivf_list column, centroids)``. At scale the assigned
    relation is written bucketed by ``ivf_list`` so probes read only
    n_probe/n_lists of the data (partition pruning on the list id).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    work = df.withColumn("__v", array_to_vector(F.col(vec_col).cast("array<double>")))
    km = KMeans(k=n_lists, seed=seed, featuresCol="__v", predictionCol="ivf_list")
    model = km.fit(work)
    assigned = model.transform(work).drop("__v")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_topk(
    indexed: DataFrame,
    centroids: Sequence[Sequence[float]],
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF probe: rank inverted lists by centroid cosine to the query
    (driver-side — centroids are tiny), scan the top ``n_probe`` lists,
    exact cosine re-rank inside. The list filter prunes (1 - n_probe/
    n_lists) of the table before any vector math."""
    import math

    def cos(a: Sequence[float], b: Sequence[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return dot / (na * nb)

    ranked = sorted(
        range(len(centroids)), key=lambda i: -cos(centroids[i], query_vec)
    )[:n_probe]
    cands = indexed.filter(F.col("ivf_list").isin([int(i) for i in ranked]))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    scored = cands.select(F.col(id_col), F.round(cosine_expr(v, q), 6).alias("cos"))
    return scored.orderBy(F.desc("cos"), F.col(id_col)).limit(k)


def ann_topk_lsh(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 6,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only rows sharing the query's LSH bucket,
    exact cosine re-rank inside. Recall < 1 by design; the candidate scan
    is ~n/2^planes of the table.

    Measured at the 301k-row regime (ANN_RECALL.json, SCALE.md r10): on
    ISOTROPIC embeddings single-bucket recall decays fast with plane
    count (0.25 @ 4 planes, 0.06 @ 8) — a true neighbor crosses each
    random hyperplane with non-trivial probability and one probe
    forgives none of them. Prefer ivf_index/ivf_topk (recall 0.68 at a
    25% probe fraction there); keep this for clustered corpora or as a
    cheap pre-filter."""
    dim = len(query_vec)
    bucketed = lsh_bucket_signature(df, n_planes, dim, seed, vec_col)
    # The query's bucket uses the same hash-derived planes — computed by
    # running the identical expression on a one-row relation (keeps a single
    # source of truth for the plane definition).
    qdf = df.sparkSession.createDataFrame([(list(map(float, query_vec)),)], f"{vec_col} array<double>")
    qbucket = lsh_bucket_signature(qdf, n_planes, dim, seed, vec_col).collect()[0]["lsh_bucket"]
    cands = bucketed.filter(F.col("lsh_bucket") == qbucket)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    scored = cands.select(F.col(id_col), F.round(cosine_expr(v, q), 6).alias("cos"))
    return scored.orderBy(F.desc("cos"), F.col(id_col)).limit(k)


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    impl: str | None = None,
) -> DataFrame:
    """X81 — batched k-nearest-neighbor join: for EVERY query vector, its
    ``k`` most cosine-similar corpus rows (ties by corpus id) — the
    retrieval primitive between single-probe ``cosine_topk`` and all-pairs
    ``cosine_pairs_topm``. Reference analogue: the per-record similarity
    lookup loop (cluster-assignment distance scans); re-expressed as one
    declarative broadcast join instead of a driver loop.

    Physical shape (both flavors): the corpus NEVER shuffles — the query
    batch broadcasts (it is a probe batch, bounded by contract), every
    corpus partition scores locally, and the per-query rank<=k filter
    runs as a map-side WindowGroupLimit partial, so the one exchange
    carries <= k rows per query per partition, independent of corpus
    size. At 100 TB: identical plan, just more partitions.

    ``impl=None`` resolves to ``'arrow'`` (BLAS scoring per partition
    against the broadcast query matrix) — the throughput path; ``'sql'``
    is the sequential-fold flavor whose arithmetic is bit-identical to
    the DuckDB oracle.

    Output: ``(id_q, id_c, cos, rnk)``, rnk in [1, k].
    """
    from pyspark.sql import Window

    if impl is None:
        impl = "arrow"
    q = queries.select(
        F.col(id_col).alias("id_q"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    w = Window.partitionBy("id_q").orderBy(F.desc("cos"), F.col("id_c"))
    if impl == "sql":
        c = fan_out(corpus).select(
            F.col(id_col).alias("id_c"), F.col(vec_col).cast("array<double>").alias("cv")
        )
        scored = c.join(F.broadcast(q), how="cross").select(
            "id_q", "id_c", F.round(cosine_expr(F.col("cv"), F.col("qv")), 6).alias("cos")
        )
        return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)
    if impl != "arrow":
        raise ValueError(f"unknown impl {impl!r}")

    import numpy as np
    import pandas as pd

    rows = q.collect()  # probe batch: bounded by contract (broadcast-sized)
    q_ids = np.array([r["id_q"] for r in rows], dtype=np.int64)
    q_mat = np.array([np.asarray(r["qv"], dtype=np.float64) for r in rows])
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))

    def part(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            c_mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["cv"]])
            c_ids = pdf["id_c"].to_numpy()
            c_norm = np.sqrt((c_mat * c_mat).sum(axis=1))
            denom = np.outer(q_norm, c_norm)
            with np.errstate(divide="ignore", invalid="ignore"):
                cmat = np.where(denom != 0.0, (q_mat @ c_mat.T) / denom, np.nan)
            cmat = np.round(cmat, 6)
            out_q, out_c, out_s = [], [], []
            for qi in range(len(q_ids)):
                row = cmat[qi]
                # partial top-k per partition: NaN (NULL cosine) sorts last
                # but IS emitted — matching the sql flavor, where NULL-cos
                # rows still rank (NULLS LAST) and fill out k when a query
                # has fewer than k scoreable neighbors
                sel = np.lexsort((c_ids, -row))[: k]
                out_q.extend([q_ids[qi]] * len(sel))
                out_c.extend(c_ids[sel])
                out_s.extend([None if np.isnan(s) else float(s) for s in row[sel]])
            yield pd.DataFrame(
                {
                    "id_q": pd.array(out_q, dtype="int64"),
                    "id_c": pd.array(out_c, dtype="int64"),
                    "cos": pd.array(out_s, dtype="float64"),
                }
            )

    c = fan_out(corpus).select(
        F.col(id_col).alias("id_c"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    partial = c.mapInPandas(part, "id_q long, id_c long, cos double")
    return partial.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive / retrieval training: for
    every query vector, the ``k`` most cosine-similar corpus rows whose
    label DIFFERS from the query's — the negatives that sit closest to
    the decision boundary, which contrastive losses weight hardest
    (e.g. DPR's in-batch + hard negatives, Karpukhin et al. 2020).

    Same physical shape as :func:`knn_join` (sql flavor): corpus never
    shuffles, the query batch broadcasts, the label-mismatch filter
    prunes BEFORE ranking, and rank<=k runs as a map-side
    WindowGroupLimit partial. Arithmetic is the sequential-fold cosine,
    bit-identical to the DuckDB oracle.

    Output: ``(id_q, id_c, cos, rnk)``, rnk in [1, k].
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("id_q"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        F.col(label_col).alias("ql"),
    )
    c = fan_out(corpus).select(
        F.col(id_col).alias("id_c"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        F.col(label_col).alias("cl"),
    )
    scored = (
        c.join(F.broadcast(q), how="cross")
        .filter(~F.col("cl").eqNullSafe(F.col("ql")))
        .select(
            "id_q", "id_c", F.round(cosine_expr(F.col("cv"), F.col("qv")), 6).alias("cos")
        )
    )
    w = Window.partitionBy("id_q").orderBy(F.desc("cos"), F.col("id_c"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def mmr_rerank(
    rel: DataFrame,
    sims: DataFrame,
    k: int = 5,
    lam: float = 0.7,
) -> DataFrame:
    """X180 — Maximal Marginal Relevance re-ranking (Carbonell &
    Goldstein 1998): greedily pick ``k`` results per query maximizing
    ``lam * rel(c) - (1 - lam) * max_{s in selected} sim(c, s)`` — the
    standard diversity pass between retrieval and a RAG prompt (top-k by
    raw relevance returns near-duplicates; MMR trades relevance for
    coverage). Absent from the reference; designed from the public
    formulation.

    Inputs are the retrieval stage's own artifacts:

    - ``rel``:  ``(q_id, c_id, rel)`` — candidates per query with
      relevance, PRE-ROUNDED by the caller at SIX decimals (the greedy
      branches on comparisons, so both engines must see bit-identical
      scores — and the 6 dp input bound means every greedy score is an
      exactly-7-decimal value, so the 9 dp release rounding NEVER sits
      on a half-way boundary where engine rounding conventions diverge;
      9 dp inputs put 0.7*rel exactly ON such boundaries ~1/10 of the
      time, and one of them flipped between engines at sf0.1);
    - ``sims``: ``(q_id, id_a, id_b, sim)`` — pairwise similarity within
      each query's candidate set, both directions, same rounding.

    The greedy is inherently sequential PER QUERY but embarrassingly
    parallel ACROSS queries, and the state per query is the bounded
    candidate set (n_cand relevances + n_cand^2 sims — n_cand is a
    retrieval constant like 12, never corpus-sized). That is exactly the
    cogrouped-``applyInPandas`` shape: one Arrow batch per query, a
    few-hundred-float greedy in pandas, no driver loop, no corpus-wide
    state. At 100 TB the only big relations are the INPUTS, built by the
    blocked/bounded x04 machinery upstream; this operator's shuffle keys
    are query ids (uniform by construction).

    Determinism contract: max-over-empty-set is 0.0 (so the first pick's
    score is ``lam * rel``, the uniform formula); ties broken by smallest
    candidate id (strict ``>`` keeps the earliest in id-ascending scan
    order == SQL ``row_number() ORDER BY score DESC, c ASC``); all
    arithmetic is two IEEE multiplies and a subtract on pre-rounded
    doubles — bit-identical cross-engine. The greedy COMPARES unrounded
    scores; only the release rounds, and it rounds JVM-side (F.round),
    never in Python (half-even vs SQL half-away diverges on the
    boundary-heavy 0.7*rel values). Output: ``(q_id, rank, c_id,
    score_r)`` with score rounded at 9 dp, ``rank`` 1-based; queries with
    fewer than ``k`` candidates release what they have.
    """
    import pandas as pd

    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    if k < 1:
        raise ValueError("k must be >= 1")
    one_m_lam = 1.0 - lam

    def _greedy(rel_pdf: pd.DataFrame, sim_pdf: pd.DataFrame) -> pd.DataFrame:
        if rel_pdf.empty:
            return pd.DataFrame(
                {"q_id": [], "rank": [], "c_id": [], "score_r": []}
            ).astype({"q_id": "int64", "rank": "int32", "c_id": "int64", "score_r": "float64"})
        q = int(rel_pdf["q_id"].iloc[0])
        relmap = dict(zip(rel_pdf["c_id"].astype("int64"), rel_pdf["rel"].astype("float64")))
        simmap = {
            (int(a), int(b)): float(s)
            for a, b, s in zip(sim_pdf["id_a"], sim_pdf["id_b"], sim_pdf["sim"])
        }
        remaining = sorted(relmap)
        selected: list[int] = []
        rows = []
        while remaining and len(selected) < k:
            best_c, best_sc = None, None
            for c in remaining:  # id-ascending: strict > == smallest-id tie-break
                ms = max((simmap.get((c, s), 0.0) for s in selected), default=0.0)
                sc = lam * relmap[c] - one_m_lam * ms
                if best_sc is None or sc > best_sc:
                    best_c, best_sc = c, sc
            selected.append(best_c)
            remaining.remove(best_c)
            rows.append((q, len(selected), best_c, best_sc))
        return pd.DataFrame(rows, columns=["q_id", "rank", "c_id", "score_r"]).astype(
            {"q_id": "int64", "rank": "int32", "c_id": "int64", "score_r": "float64"}
        )

    def _fn(_key, rel_pdf: pd.DataFrame, sim_pdf: pd.DataFrame) -> pd.DataFrame:
        return _greedy(rel_pdf, sim_pdf)

    out = (
        rel.groupBy("q_id")
        .cogroup(sims.groupBy("q_id"))
        .applyInPandas(_fn, "q_id long, rank int, c_id long, score_r double")
    )
    # the release rounding runs JVM-side: Python round() is half-even on
    # the binary value while SQL ROUND is not — 0.7 * (a 9dp-rounded rel)
    # lands on the 10th-decimal boundary ~1/10 of the time, so the two
    # conventions visibly diverge; F.round == DuckDB ROUND is the
    # repo-wide contract
    return out.select("q_id", "rank", "c_id", F.round("score_r", 9).alias("score_r"))


def mmr_rerank_embeddings(
    df: DataFrame,
    query_mod: int = 20,
    n_cand: int = 12,
    k: int = 5,
    lam: float = 0.7,
    block_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """X180 wrapper — build the MMR inputs from an embedding table with
    the x04 discipline, then greedy-select.

    Queries are the rows with ``id % query_mod == 0`` (a deterministic
    sample standing in for an external query table). Candidate
    generation is BLOCKED on ``block_col`` (the x04 bound: never
    corpus x queries), relevance is cosine rounded at 9 dp, and each
    query keeps its top ``n_cand`` by ``(rel DESC, id ASC)`` — ranked on
    the ROUNDED value so both engines cut the same set. Pairwise sims
    are computed only within each query's kept candidate set
    (<= n_cand^2 per query, a constant). Zero vectors (NULL cosine)
    never become candidates.
    """
    df = fan_out(df)
    v = F.col(vec_col).cast("array<double>")
    base = df.select(F.col(id_col), v.alias("__v"), _norm(v).alias("__n"), F.col(block_col))
    q = base.filter((F.col(id_col) % query_mod) == 0).select(
        F.col(id_col).alias("q_id"), F.col("__v").alias("qv"),
        F.col("__n").alias("qn"), F.col(block_col).alias("__blk_q"),
    )
    c = base.select(
        F.col(id_col).alias("c_id"), F.col("__v").alias("cv"),
        F.col("__n").alias("cn"), F.col(block_col).alias("__blk_c"),
    )
    denom = F.col("qn") * F.col("cn")
    rel_all = (
        q.join(c, F.col("__blk_q") == F.col("__blk_c"))
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id", "c_id", "cv", "cn",
            F.round(
                F.when(denom != 0.0, _dot(F.col("qv"), F.col("cv")) / denom)
            , 6).alias("rel"),
        )
        .filter(F.col("rel").isNotNull())
    )
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("q_id").orderBy(F.desc("rel"), F.col("c_id"))
    )
    cand = rel_all.withColumn("__rn", rn).filter(F.col("__rn") <= n_cand)
    rel = cand.select("q_id", "c_id", "rel")
    # norms were folded once per row upstream (the cosine_self_join_pairs
    # lesson: HOF folds get no codegen CSE) — carry them, never re-fold
    a = cand.select(
        "q_id", F.col("c_id").alias("id_a"), F.col("cv").alias("va"), F.col("cn").alias("na")
    )
    # dataset aliases + qualified refs: both sides share cand's lineage
    # and Spark's ambiguous-self-join check rejects bare column refs
    b = cand.select(
        "q_id", F.col("c_id").alias("id_b"),
        F.col("cv").alias("vb"), F.col("cn").alias("nb"),
    )
    sd = F.col("na") * F.col("nb")
    sims = (
        a.alias("A")
        .join(b.alias("B"), F.col("A.q_id") == F.col("B.q_id"))
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.col("A.q_id").alias("q_id"), "id_a", "id_b",
            F.round(
                F.when(sd != 0.0, _dot(F.col("va"), F.col("vb")) / sd), 6
            ).alias("sim"),
        )
    )
    return mmr_rerank(rel, sims, k=k, lam=lam)


def mutual_knn_pairs(
    df: DataFrame,
    m: int = 5,
    block_col: str | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    impl: str | None = None,
) -> DataFrame:
    """X183 — reciprocal (mutual) k-NN pairs: ``(a, b)`` where ``b`` is in
    ``a``'s top-m neighbors AND ``a`` is in ``b``'s — the standard
    high-precision filter on top of raw nearest-neighbor candidates
    (asymmetric hubs fail it: a centroid-ish vector appears in everyone's
    top-m, but its own top-m holds only its true peers, so hub edges are
    dropped). Used as the edge set for high-confidence embedding dedup
    and as the k-reciprocal re-ranking primitive (Zhong et al. 2017).

    Pure composition: the directed top-m relation comes from
    :func:`cosine_pairs_topm` (bounded <= n*m rows by construction,
    map-side WindowGroupLimit partial), then ONE equi-join of that slim
    relation with itself on the reversed key — never touches vectors
    again, never exceeds n*m rows on either side. Output
    ``(id_a, id_b, cos, rank_ab, rank_ba)`` with ``id_a < id_b``:
    ``rank_ab`` = b's rank in a's list, ``rank_ba`` = a's rank in b's.
    """
    d = cosine_pairs_topm(
        df, m=m, block_col=block_col, vec_col=vec_col, id_col=id_col, impl=impl
    )
    fwd = d.select("id_a", "id_b", "cos", F.col("rnk").alias("rank_ab"))
    rev = d.select(
        F.col("id_a").alias("__ra"), F.col("id_b").alias("__rb"),
        F.col("rnk").alias("rank_ba"),
    )
    return (
        fwd.join(
            rev,
            (F.col("id_a") == F.col("__rb")) & (F.col("id_b") == F.col("__ra")),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "cos", "rank_ab", "rank_ba")
    )
