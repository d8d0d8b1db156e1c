"""Embedding-column utilities: scalar quantization and label centroids.

The reference has no vector columns at all (SURVEY §0); X4 added cosine
similarity / ANN over ``array<float>``. This module adds the two
embedding operations the rest of a 100 TB curation stack leans on:

- **Scalar quantization** (int8-style): the standard memory lever for
  vector search — a 64-dim float32 embedding (256 B) becomes 64 int8
  codes + one float scale (~68 B), a 3.7× working-set cut that turns
  shuffle-heavy ANN stages CPU-bound instead of network-bound. Per-vector
  symmetric max-abs scaling, the simplest industry-standard scheme
  (FAISS ``ScalarQuantizer`` QT_8bit-style).
- **Label centroids**: per-group mean vectors — IVF coarse-quantizer
  training data, SemDeDup-style cluster centers, class prototypes.

Determinism across engines is engineered, not hoped for:

- Quantization is pure elementwise IEEE-double arithmetic:
  ``floor(x / scale * qmax + 0.5)`` (explicit floor-of-shifted instead of
  ``round`` — engines disagree on double rounding modes, but ``floor``,
  ``/`` and ``*`` are bit-identical IEEE ops everywhere). float→double
  widening is exact. The DuckDB twin is the same expression over
  ``list_transform``, so the quantized codes hash-match bit-for-bit.
- Exact centroids are computed over the QUANTIZED codes as
  ``(sum BIGINT, count BIGINT)`` per (label, position) — integer
  arithmetic is associative, so the distributed partial-agg order can
  never change the answer (float centroids, by contrast, vary in the
  last bit with aggregation order; ``label_centroids`` provides them for
  API use under a tolerance contract, tested against numpy).

Scale shape: quantization is map-only (no shuffle, codegen-friendly);
centroids shuffle (label, pos) pairs — rows × dim 16-byte-ish records
through ONE partial-aggregated exchange, grouped on a key whose
cardinality (labels × dim) is tiny, so the reduce side is trivially
broadcast-consumable by IVF/assignment stages downstream.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(c: Column) -> Column:
    return c.cast("double")


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "qvec",
    scale_col: str = "q_scale",
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-vector scalar quantization to ``bits``-bit codes.

    Adds ``out_col`` (array<bigint> codes in [-qmax, qmax], qmax =
    2^(bits-1) - 1) and ``scale_col`` (the per-vector max-abs, double).
    Dequantize as ``code * scale / qmax``. All-zero vectors get scale 0
    and all-zero codes (guarded — no 0/0 NaN). Map-only; deterministic
    bit-for-bit across engines and partitionings.
    """
    if not 2 <= bits <= 32:
        raise ValueError(f"bits must be in [2, 32], got {bits}")
    qmax = float(2 ** (bits - 1) - 1)
    scale = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(_as_double(x))))
    code = lambda x: F.when(  # noqa: E731
        F.col(scale_col) > 0.0,
        F.floor(_as_double(x) / F.col(scale_col) * F.lit(qmax) + F.lit(0.5)),
    ).otherwise(F.lit(0).cast("long"))
    return df.withColumn(scale_col, scale).withColumn(
        out_col, F.transform(F.col(vec_col), code)
    )


def dequantize(
    df: DataFrame,
    code_col: str = "qvec",
    scale_col: str = "q_scale",
    out_col: str = "vec_approx",
    bits: int = 8,
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings` (lossy): code*scale/qmax."""
    qmax = float(2 ** (bits - 1) - 1)
    return df.withColumn(
        out_col,
        F.transform(F.col(code_col), lambda q: _as_double(q) * F.col(scale_col) / F.lit(qmax)),
    )


def centroid_sums(
    df: DataFrame,
    label_col: str = "label",
    code_col: str = "qvec",
) -> DataFrame:
    """Exact per-(label, position) centroid accumulators over quantized codes.

    Returns ``(label, pos, n, sum_q)`` — all integers, so the distributed
    aggregation is bit-exact whatever the partial-agg order. The centroid
    code at (label, pos) is ``sum_q / n`` (consumer's choice of float or
    re-quantized). Long layout is deliberate: it is the join-ready /
    oracle-checkable relation; reassemble arrays with
    :func:`assemble_centroids` when a vector shape is needed.
    """
    exploded = df.select(
        F.col(label_col).alias("label"), F.posexplode(F.col(code_col)).alias("pos", "q")
    )
    return exploded.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("n"), F.sum("q").alias("sum_q")
    )


def assemble_centroids(sums: DataFrame, bits: int = 8) -> DataFrame:
    """Fold :func:`centroid_sums` output back to one mean-code vector per
    label: ``(label, n, centroid array<double>)`` (codes / qmax scale)."""
    qmax = float(2 ** (bits - 1) - 1)
    return (
        sums.groupBy("label")
        .agg(
            F.max("n").alias("n"),
            F.array_sort(
                F.collect_list(F.struct("pos", "sum_q", "n"))
            ).alias("_parts"),
        )
        .select(
            "label",
            "n",
            F.transform(
                F.col("_parts"),
                lambda p: p["sum_q"].cast("double") / p["n"].cast("double") / F.lit(qmax),
            ).alias("centroid"),
        )
    )


def label_centroids(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Float mean vector per label: ``(label, n, centroid array<double>)``.

    The convenience API (IVF training, prototypes). Float summation order
    varies with partitioning, so this carries a tolerance contract (tested
    against numpy at rtol 1e-6), not a bit-exactness one — use
    :func:`centroid_sums` when cross-run hashes must agree.
    """
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(_as_double_array(F.col(vec_col))).alias("pos", "v"),
    )
    per_pos = exploded.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("n"), F.avg("v").alias("mean_v")
    )
    return (
        per_pos.groupBy("label")
        .agg(
            F.max("n").alias("n"),
            F.array_sort(F.collect_list(F.struct("pos", "mean_v"))).alias("_parts"),
        )
        .select(
            "label",
            "n",
            F.transform(F.col("_parts"), lambda p: p["mean_v"]).alias("centroid"),
        )
    )


def _as_double_array(c: Column) -> Column:
    return F.transform(c, _as_double)


def quantization_error(
    df: DataFrame,
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Per-vector max absolute reconstruction error of ``bits``-bit
    quantization, as a fraction of the vector's scale — bounded by
    ``0.5 / qmax`` by construction (asserted in tests, the operator's
    correctness invariant)."""
    qmax = float(2 ** (bits - 1) - 1)
    q = quantize_embeddings(df, vec_col=vec_col, bits=bits)
    rec = dequantize(q, bits=bits)
    err = F.array_max(
        F.zip_with(
            _as_double_array(F.col(vec_col)),
            F.col("vec_approx"),
            lambda a, b: F.abs(a - b),
        )
    )
    return rec.withColumn(
        "rel_err",
        F.when(F.col("q_scale") > 0.0, err / F.col("q_scale")).otherwise(F.lit(0.0)),
    ).drop("vec_approx")


def label_consistency(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    impl: str | None = None,
) -> DataFrame:
    """X122 — k-NN label-consistency screen: for each probe vector, the
    fraction of its ``k`` nearest corpus neighbors (self excluded)
    sharing its label. The standard label-noise detector for embedding
    datasets (Confident-Learning / deep-kNN line): rows whose neighbors
    systematically disagree are suspected mislabels or out-of-class
    outliers.

    Composition, not new machinery: the X81 batched k-NN join (corpus
    never shuffles, query batch broadcasts, map-side per-query top-k)
    fetches ``k+1`` neighbors, the self-match (rank 1 by cosine 1.0
    with the deterministic corpus-id tie-break) drops out, and the
    agreement fraction is one kilobyte-scale join of neighbor labels —
    label relations are (id, label) pairs, broadcast-sized relative to
    the vectors.

    Output: ``(id_col, label, n_neighbors, n_agree, agreement_r)``.
    """
    from dbms_data_anonymity_differential_privacy_spark.operators.similarity import knn_join

    nn = knn_join(emb, queries, k=k + 1, vec_col=vec_col, id_col=id_col, impl=impl)
    nn = nn.where(F.col("id_q") != F.col("id_c"))
    labels = emb.select(F.col(id_col), F.col(label_col))
    q_lab = labels.withColumnRenamed(id_col, "id_q").withColumnRenamed(
        label_col, "__lq"
    )
    c_lab = labels.withColumnRenamed(id_col, "id_c").withColumnRenamed(
        label_col, "__lc"
    )
    joined = nn.join(F.broadcast(q_lab), "id_q").join(F.broadcast(c_lab), "id_c")
    out = joined.groupBy(F.col("id_q").alias(id_col), F.col("__lq").alias("label")).agg(
        F.count(F.lit(1)).alias("n_neighbors"),
        F.sum(F.when(F.col("__lc") == F.col("__lq"), 1).otherwise(0)).alias("n_agree"),
    )
    return out.select(
        id_col,
        "label",
        "n_neighbors",
        "n_agree",
        F.round(F.col("n_agree") / F.col("n_neighbors").cast("double"), 9).alias(
            "agreement_r"
        ),
    )


def ndcg_weights(k: int) -> list[tuple[int, int, int]]:
    """Integer DCG weight table for ranks 1..k: ``w = round(1e9 /
    log2(rank + 1))`` plus its prefix sum (the ideal-DCG lookup).

    Computed ONCE on the driver with Python libm (the x23/x124 literal-
    table convention) so Spark and the DuckDB oracle consume the SAME
    integers — no engine ever evaluates ``log2``, and the DCG sums are
    exact int64 arithmetic, immune to float summation order.
    """
    import math

    rows, cum = [], 0
    for r in range(1, k + 1):
        w = round(1e9 / math.log2(r + 1))
        cum += w
        rows.append((r, w, cum))
    return rows


def retrieval_eval(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    impl: str | None = None,
) -> DataFrame:
    """X140 — per-query retrieval-quality scorecard: NDCG@k, MRR and
    recall@k of cosine k-NN retrieval, with same-label corpus rows as the
    relevance ground truth (the standard ANN-benchmark protocol when no
    click/judgment data exists; e.g. BEIR-style label-match evaluation).

    Composition: the X81 batched k-NN join fetches ``k+1`` neighbors
    (corpus never shuffles, query batch broadcasts, map-side per-query
    top-k), the self-match drops out and ranks are RE-NUMBERED over the
    same (id_q)-keyed sort — rank-sensitive metrics cannot tolerate the
    gap x122 could ignore. All three metrics then reduce to integer
    sufficient statistics over the queries×k relation:

    - ``dcg = Σ w(rank)·rel`` with ``w`` from :func:`ndcg_weights` —
      an exact int64 sum, order-free under partial aggregation;
    - ``idcg = cumw(min(k, n_rel))`` — a broadcast lookup into the same
      table, where ``n_rel`` is the query's same-label corpus count
      minus self (a labels-sized relation, broadcast);
    - ``mrr = 1/first_rel_rank``, ``recall = hits/min(k, n_rel)`` —
      single IEEE divisions at release (the x51 one-division convention).

    Per-query rows (not a float mean over queries) keep every released
    double the result of exactly one division — bit-stable cross-engine;
    roll up downstream if a corpus-level scalar is wanted.

    Output: ``(vec_id, label, n_rel, hits, recall_k, mrr, ndcg)``.
    Reference analogue: utility evaluation of released data
    (utility-accuracy.py:52-69) re-targeted at the retrieval stack.
    """
    from pyspark.sql import Window

    from dbms_data_anonymity_differential_privacy_spark.operators.similarity import knn_join

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = emb.sparkSession
    wtab = spark.createDataFrame(ndcg_weights(k), "rnk int, w long, cumw long")

    nn = knn_join(emb, queries, k=k + 1, vec_col=vec_col, id_col=id_col, impl=impl)
    nn = nn.where(F.col("id_q") != F.col("id_c"))
    rerank = Window.partitionBy("id_q").orderBy(F.desc("cos"), F.col("id_c"))
    nn = (
        nn.withColumn("rnk2", F.row_number().over(rerank))
        .filter(F.col("rnk2") <= k)
        .drop("rnk")
    )

    labels = emb.select(F.col(id_col), F.col(label_col))
    q_lab = labels.withColumnRenamed(id_col, "id_q").withColumnRenamed(label_col, "__lq")
    c_lab = labels.withColumnRenamed(id_col, "id_c").withColumnRenamed(label_col, "__lc")
    lab_counts = emb.groupBy(F.col(label_col).alias("__lq")).agg(
        F.count(F.lit(1)).alias("__lab_n")
    )

    joined = (
        nn.join(F.broadcast(q_lab), "id_q")
        .join(F.broadcast(c_lab), "id_c")
        .join(F.broadcast(wtab), F.col("rnk2") == F.col("rnk"))
        .withColumn("rel", F.when(F.col("__lc") == F.col("__lq"), 1).otherwise(0))
    )
    per_q = joined.groupBy("id_q", "__lq").agg(
        F.sum("rel").alias("hits"),
        F.sum(F.col("w") * F.col("rel")).alias("dcg_int"),
        F.min(F.when(F.col("rel") == 1, F.col("rnk2"))).alias("first_rel"),
    )
    scored = (
        per_q.join(F.broadcast(lab_counts), "__lq")
        .withColumn("n_rel", F.col("__lab_n") - F.lit(1))
        .withColumn("ideal_k", F.least(F.lit(k), F.col("n_rel")))
        .join(
            F.broadcast(wtab.select(F.col("rnk").alias("ideal_k"), "cumw")),
            "ideal_k",
            "left",
        )
    )
    return scored.select(
        F.col("id_q").alias(id_col),
        F.col("__lq").alias(label_col),
        F.col("n_rel").cast("long").alias("n_rel"),
        F.col("hits").cast("long").alias("hits"),
        F.round(
            F.when(
                F.col("ideal_k") > 0,
                F.col("hits") / F.col("ideal_k").cast("double"),
            ).otherwise(F.lit(None)),
            9,
        ).alias("recall_k"),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("first_rel").cast("double"), F.lit(0.0)), 9
        ).alias("mrr"),
        F.round(
            F.when(
                F.col("cumw").isNotNull(),
                F.col("dcg_int").cast("double") / F.col("cumw").cast("double"),
            ).otherwise(F.lit(None)),
            9,
        ).alias("ndcg"),
    )


# Above this pool size the greedy selection stays distributed (k
# map-only distance updates + k TakeOrdered collects); at or below it
# the pool collects ONCE and the k rounds run vectorized on the driver
# (the pagerank_int/connected_components hybrid discipline — r11). At
# 64-dim doubles the bound is ~34 MB of driver memory; semantic_dedup's
# fitting pool is hash-sampled to ~8k rows at scale, so the driver path
# is the common case there by construction.
KCENTER_DRIVER_MAX_ROWS = int(
    os.environ.get("SPARK_GRAFT_KCENTER_DRIVER_ROWS", str(65_536))
)


def _kcenter_greedy_driver(rows, k: int):
    """Vectorized greedy k-center over collected pool rows. Returns
    ``[(round, id, dist, vec, xx)]`` (dist None for the seed) or None
    when the rows are unsuitable (ragged/NaN/NULL vectors) and the
    caller must fall back to the distributed loop.

    EXACT-ARITHMETIC twin of the distributed formulation: each dot is
    accumulated dimension-by-dimension (``acc = acc + x_j*c_j`` — the
    same left-fold IEEE order as ``_dot``'s sequential fold), the
    distance expands in the same ``(xx - 2.0*dot) + cxx`` order, and the
    per-round update is an elementwise ``least``. Comparisons therefore
    see bit-identical doubles and the greedy trajectory — which the
    oracle-hashed x175_auto release depends on — cannot diverge.
    """
    import numpy as np

    ids = [r["__id"] for r in rows]
    vecs = [r["__v"] for r in rows]
    if any(v is None for v in vecs):
        return None
    try:
        V = np.array([list(v) for v in vecs], dtype=np.float64)
    except (TypeError, ValueError):
        return None  # ragged or non-numeric — distributed path handles it
    if V.ndim != 2 or np.isnan(V).any():
        return None
    xx = np.array([r["__xx"] for r in rows], dtype=np.float64)
    if np.isnan(xx).any():
        return None
    n, dim = V.shape

    def dist_to(ci: int):
        dot = np.zeros(n, dtype=np.float64)
        cv = V[ci]
        for j in range(dim):  # left-fold over dimensions == _dot's order
            dot = dot + V[:, j] * cv[j]
        return (xx - 2.0 * dot) + xx[ci]

    seed_i = min(range(n), key=lambda i: ids[i])
    chosen = [(1, ids[seed_i], None, vecs[seed_i], float(xx[seed_i]))]
    if k == 1:
        return chosen
    d = dist_to(seed_i)
    for r in range(2, k + 1):
        m = d.max()
        far_i = min((i for i in range(n) if d[i] == m), key=lambda i: ids[i])
        chosen.append((r, ids[far_i], float(d[far_i]), vecs[far_i], float(xx[far_i])))
        if r == k:
            break
        d = np.minimum(d, dist_to(far_i))
    return chosen


def _kcenter_chosen(
    df: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list:
    """Greedy k-center selection returning the chosen rows WITH their
    vectors: ``[(round, id, dist, vec, xx)]``. Internal — callers that
    need the center vectors (semantic_dedup's assignment projection)
    read them from here instead of re-joining the pool (one fewer
    collect job)."""
    from .similarity import _dot

    v = F.col(vec_col).cast("array<double>")
    pool_plan = df.select(
        F.col(id_col).alias("__id"), v.alias("__v"), _dot(v, v).alias("__xx")
    )
    # bounded probe: LocalLimit short-circuits the scan, so an oversized
    # pool pays one truncated pass, not a full one
    probe = pool_plan.limit(KCENTER_DRIVER_MAX_ROWS + 1).collect()
    if not probe:
        return []
    if len(probe) <= KCENTER_DRIVER_MAX_ROWS:
        chosen = _kcenter_greedy_driver(probe, k)
        if chosen is not None:
            return chosen

    pool = pool_plan.persist()

    def dist_to(center_vec: list[float], center_xx: float):
        lit = F.array(*[F.lit(float(x)) for x in center_vec])
        return F.col("__xx") - 2.0 * _dot(F.col("__v"), lit) + F.lit(center_xx)

    seed = pool.orderBy(F.col("__id").asc()).limit(1).collect()[0]
    chosen = [(1, seed["__id"], None, seed["__v"], float(seed["__xx"]))]
    # ONE job per round: the TakeOrdered collect below is itself the
    # action that populates the round's persisted distance relation, so
    # no separate count() barrier is needed. The PREVIOUS round's cache
    # is released only after the current round has materialized (the
    # current relation is built from it lazily).
    cur = pool.select(
        "__id", "__v", "__xx",
        dist_to(list(seed["__v"]), float(seed["__xx"])).alias("__d"),
    ).persist()
    prev = None
    for r in range(2, k + 1):
        far = cur.orderBy(F.col("__d").desc(), F.col("__id").asc()).limit(1).collect()[0]
        if prev is not None:
            prev.unpersist()
        chosen.append((r, far["__id"], float(far["__d"]), far["__v"], float(far["__xx"])))
        if r == k:  # k centers chosen — no further update round needed
            break
        nxt = cur.select(
            "__id", "__v", "__xx",
            F.least(
                F.col("__d"),
                dist_to(list(far["__v"]), float(far["__xx"])),
            ).alias("__d"),
        ).persist()
        prev, cur = cur, nxt
    cur.unpersist()
    if prev is not None:
        prev.unpersist()
    pool.unpersist()
    return chosen


def kcenter_coreset(
    df: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Greedy k-center (farthest-point-first) coreset selection — the
    classic 2-approximation (Gonzalez 1985) diversity sampler training-
    data pipelines use to pick maximally-spread exemplars from an
    embedding pool. Seed = smallest id; each round adds the point
    farthest (squared L2, min over chosen centers) from the current
    set, ties to the smallest id; the selection distance sequence is the
    coverage-radius curve.

    Exactness: d(x,c) expands to ``dot(x,x) - 2·dot(x,c) + dot(c,c)``
    with every dot a SEQUENTIAL fold (bit-identical to DuckDB's
    list_dot_product — the x04 contract), so the greedy trajectory is
    engine-exact; only the released distances round.

    Shape — hybrid (r11): pools at or under
    :data:`KCENTER_DRIVER_MAX_ROWS` collect once and iterate vectorized
    on the driver with the identical fold arithmetic (one job instead
    of k+1); larger pools run the distributed loop — per round ONE
    map-only distance-update projection (center vector rides the plan
    as a literal array) and one distributed TakeOrdered(1), k bounded
    1-row collects total, no shuffles of the pool. Output:
    ``(round, vec_id, dist_r)``, dist NULL for the seed.
    """
    chosen = _kcenter_chosen(df, k, vec_col, id_col)
    if not chosen:
        return df.sparkSession.createDataFrame(
            [], "round INT, vec_id LONG, dist_r DOUBLE"
        )
    return df.sparkSession.createDataFrame(
        [
            (r, int(i), None if d is None else round(d, 6))
            for r, i, d, _v, _xx in chosen
        ],
        "round INT, vec_id LONG, dist_r DOUBLE",
    )


def rp_sign_matrix(in_dim: int, out_dim: int, seed: str = "rp") -> list[list[float]]:
    """Deterministic Rademacher (+-1) sign matrix for :func:`random_project`,
    derived from md5 parity of ``"{seed}:{j}:{i}"`` — pure stdlib, identical
    on any engine that can compute md5, no RNG state. Returned as
    ``out_dim`` rows of ``in_dim`` signs."""
    import hashlib

    def sign(j: int, i: int) -> float:
        h = hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()
        return 1.0 if int(h[0], 16) % 2 == 0 else -1.0

    return [[sign(j, i) for i in range(in_dim)] for j in range(out_dim)]


def random_project(
    df: DataFrame,
    in_dim: int,
    out_dim: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = "rp",
) -> DataFrame:
    """X177 — Johnson–Lindenstrauss random projection with a Rademacher
    (+-1/sqrt(out_dim)) matrix (Achlioptas 2003, "Database-friendly random
    projections"): the standard dimensionality cut in front of LSH/ANN and
    clustering at corpus scale — a 768-dim float32 embedding becomes
    ``out_dim`` doubles while pairwise distances are preserved within
    (1 +- eps) w.h.p., shrinking every downstream shuffle by d/out_dim.

    The projection matrix is NOT data-dependent and NOT stored: it is
    re-derived from md5 parity (:func:`rp_sign_matrix`), so any engine —
    or a reader auditing a release — reproduces the exact same projection
    from ``(seed, in_dim, out_dim)`` alone. Signs ride the plan as literal
    arrays (out_dim x in_dim doubles, trivially small vs a broadcast).

    Output: one row per (vector, output dimension) —
    ``(id, dim, value)`` with ``value`` rounded to 9 dp — long-form so the
    release is scalar-typed (array columns don't hash portably across
    engines). Each value is a SEQUENTIAL left-fold of
    ``sum_i v[i] * sign[j][i]`` in index order divided by sqrt(out_dim):
    the same accumulation order as DuckDB's ``list_dot_product``, so the
    doubles are bit-identical across engines.

    Scale shape: map-only — zero shuffles, whole-stage-codegen arithmetic
    over the array column; out_dim * in_dim multiply-adds per row. Rows
    with NULL or wrong-length vectors are dropped (disclosed; a quarantine
    count belongs to the profiling ops).
    """
    if in_dim < 1 or out_dim < 1:
        raise ValueError("in_dim and out_dim must be >= 1")
    signs = rp_sign_matrix(in_dim, out_dim, seed)
    inv = 1.0 / math.sqrt(float(out_dim))
    v = F.col(vec_col).cast("array<double>")
    dims = F.array(
        *[
            F.struct(
                F.lit(j).alias("dim"),
                F.round(
                    F.aggregate(
                        F.zip_with(
                            v,
                            F.array(*[F.lit(s) for s in signs[j]]),
                            lambda a, b: a * b,
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    * F.lit(inv),
                    9,
                ).alias("value"),
            )
            for j in range(out_dim)
        ]
    )
    return (
        df.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == in_dim))
        .select(F.col(id_col), F.explode(dims).alias("__p"))
        .select(id_col, F.col("__p.dim").alias("dim"), F.col("__p.value").alias("value"))
    )


def embedding_drift(
    df: DataFrame,
    in_b,
    in_dim: int,
    bits: int = 8,
    seed: str = "drift",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """X181 — embedding distribution drift between two populations, the
    monitoring op for a production embedding pipeline ("did the new
    crawl / new encoder shift the embedding distribution?"). Scalar-PSI
    (x67) cannot see a 64-dim distribution; this projects every vector
    through the deterministic Rademacher matrix (:func:`rp_sign_matrix`,
    the x177 machinery) and buckets it by the ``bits``-bit SIGN PATTERN
    — a SimHash-style coarse quantizer with 2^bits cells that is
    data-independent, engine-reproducible, and storage-free.

    ``in_b`` is a boolean Column splitting rows into population A
    (false) and B (true). Per cell, proportions are Laplace-smoothed —
    ``p = (count + 1) / (n + 2^bits)`` — over the DENSE cell spine
    (unobserved cells still contribute to PSI; dropping them biases the
    index toward zero exactly when drift concentrates mass). Released
    row::

        (n_a, n_b, cells_a, cells_b, psi_r, tv_r)

    PSI = sum (p - q) ln(p / q) rounded at 6 dp (the x145/x154 libm-sum
    contract: both engines sum the same ln values; partial-agg order
    perturbs only the last bits). TV = 0.5 sum |p - q| rounded at 9 dp.
    Rule-of-thumb thresholds (PSI > 0.25 = major shift) are the
    caller's; this releases the indices.

    Scale shape: the projection is map-only (x177); the only exchanges
    are one groupBy per vector id (bits rows -> 1) and one groupBy on
    the 2^bits cell space — the drift statistic itself aggregates a
    256-row relation however large the corpus is. Sign of the ROUNDED
    projection value decides the cell, so both engines branch on
    bit-identical doubles (and -0.0 >= 0 is true in both).
    """
    if bits < 1 or bits > 16:
        raise ValueError("bits must be in [1, 16]")
    proj = random_project(df, in_dim, out_dim=bits, vec_col=vec_col, id_col=id_col, seed=seed)
    flag = df.select(F.col(id_col), in_b.cast("boolean").alias("__b"))
    cell = (
        proj.groupBy(id_col)
        .agg(
            F.sum(
                (F.col("value") >= 0).cast("long")
                * F.pow(F.lit(2.0), F.col("dim")).cast("long")
            ).alias("cell")
        )
        .join(flag, id_col)
    )
    n_cells = 2 ** bits
    counts = cell.groupBy("cell").agg(
        F.sum(F.when(~F.col("__b"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("__b"), 1).otherwise(0)).alias("cb"),
    )
    spine = df.sparkSession.range(n_cells).select(F.col("id").alias("cell"))
    dense = spine.join(counts, "cell", "left").select(
        "cell",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    tot = dense.agg(F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b"))
    sm = dense.crossJoin(tot).select(
        "cell", "ca", "cb",
        ((F.col("ca") + 1).cast("double") / (F.col("n_a") + n_cells).cast("double")).alias("p"),
        ((F.col("cb") + 1).cast("double") / (F.col("n_b") + n_cells).cast("double")).alias("q"),
        "n_a", "n_b",
    )
    return sm.agg(
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
        F.sum((F.col("ca") > 0).cast("long")).alias("cells_a"),
        F.sum((F.col("cb") > 0).cast("long")).alias("cells_b"),
        F.round(
            F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), 6
        ).alias("psi_r"),
        F.round(0.5 * F.sum(F.abs(F.col("p") - F.col("q"))), 9).alias("tv_r"),
    )


def pca_project(
    df: DataFrame,
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PCA projection of an embedding column onto its top-``k``
    principal components — the standard dimensionality-reduction /
    visualization / whitening step before clustering or coarse ANN
    blocking (the linear cousin of :func:`random_project`, data-driven
    where x177 is data-free).

    Physical strategy: per-partition moment blocks (n, Σx, XᵀX) are
    computed in ONE Arrow ``mapInPandas`` pass (numpy BLAS inside the
    batch — a 2144-expression SQL aggregate for d = 64 spends ~20 s in
    whole-stage codegen COMPILATION alone, measured, so the vectorized
    partial is the right shape at every scale); the partitions-sized
    partial relation collects to the driver, is reduced in sorted
    partition order (pinned float accumulation), eigendecomposed with
    numpy ``eigh``, sign-fixed so each component's largest-magnitude
    entry is positive, and broadcast back as literal weights — the
    projection pass is map-only JVM arithmetic.

    Rows-only by design (no SQL eigensolver exists — same contract as
    C3/C10); invariants pinned in pytest: component orthogonality,
    variance ordering, centering, known-direction recovery.

    Output: ``(id_col, pc1_r..pck_r)`` (6 dp).
    """
    import numpy as np
    import pandas as pd

    first = df.select(F.size(vec_col)).first()
    if first is None:
        raise ValueError("pca_project: empty input relation")
    d = first[0]

    def moments(batches):
        from pyspark import TaskContext

        n = 0
        s = np.zeros(d)
        q = np.zeros((d, d))
        for pdf in batches:
            x = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s += x.sum(axis=0)
            q += x.T @ x
        if n:
            yield pd.DataFrame(
                {
                    "pid": [TaskContext.get().partitionId()],
                    "n": [n],
                    "s": [s.tolist()],
                    "q": [q.reshape(-1).tolist()],
                }
            )

    parts = (
        df.select(_as_double_array(F.col(vec_col)).alias("__v"))
        .mapInPandas(
            moments, "pid int, n long, s array<double>, q array<double>"
        )
        .collect()
    )
    n = 0
    s = np.zeros(d)
    q = np.zeros((d, d))
    for r in sorted(parts, key=lambda r: r["pid"]):  # pinned accumulation
        n += r["n"]
        s += np.array(r["s"])
        q += np.array(r["q"]).reshape(d, d)
    mean = s / n
    cov = q / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][: int(k)]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v  # deterministic sign convention
        comps.append(v)
    x = _as_double_array(F.col(vec_col))
    out_cols = [F.col(id_col)]
    for ci, v in enumerate(comps, start=1):
        expr = None
        for i in range(d):
            term = (F.element_at(x, i + 1) - F.lit(float(mean[i]))) * F.lit(
                float(v[i])
            )
            expr = term if expr is None else expr + term
        out_cols.append(F.round(expr, 6).alias(f"pc{ci}_r"))
    return df.select(*out_cols)


def silhouette_by_label(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 6,
    exact_fold_max_rows: int = 2_000_000,
) -> DataFrame:
    """X224 — per-cluster simplified silhouette scorecard (Rousseeuw
    1987 for the coefficient; the "simplified silhouette" centroid
    variant of Hruschka et al. 2004, the form every large-scale
    evaluator uses because it needs centroids, not pairwise distances).
    The cluster-quality gate the engine was missing: it scores C3's
    KMeans clusters, x171's k-center blocks, and the x175 SemDeDup
    quantizer cells with one number per cluster — how much closer is a
    member to its own centroid than to the best foreign one?

    Per row: ``a`` = Euclidean distance to the OWN label centroid,
    ``b`` = min distance to any OTHER label centroid,
    ``s = (b - a) / max(a, b)`` (0 when both are 0). Released per
    label: ``(label, n, mean_a_r, mean_b_r, silhouette_r)``.

    Cross-engine exactness (the oracle gate): centroids are per-(label,
    dim) sorted left folds divided by exact counts; every distance
    expands to ``xx - 2*dot(x, c) + cc`` with each dot a sequential
    in-list-order fold — bit-identical to DuckDB's
    ``list_dot_product`` (the x04 contract) — and the per-label means
    are sorted folds again, so each released double is one identical
    IEEE expression on both engines.

    Scale shape (100 TB): one posexplode shuffle builds the (label, dim)
    centroid sufficient statistics; the k centroid vectors (k = label
    count, metadata-sized) are collected once and ride the scoring
    projection as LITERAL arrays — the x175 idiom — so the per-row
    a/b/s computation is MAP-ONLY (no k× row inflation, no per-id
    shuffle), and the only post-scoring exchange is the one per-label
    aggregation. The per-(label,dim) and per-label collect_list folds
    bound memory by cluster size, so past ``exact_fold_max_rows`` input
    rows (default 2M) the operator AUTOMATICALLY switches both fold
    sites to plain partial-combining ``sum()`` — constant aggregation-
    buffer memory at any cluster size, with a tolerance contract: plain
    sums are partial-order-dependent in the last ulps, so they agree
    with the fold release to ~1e-9 relative (inside ``round_to`` = 6 dp
    in practice) but are not bit-pinned. The fold variant IS the
    oracle-hashed release and fires on every fixture (the x175
    inert-below-threshold pattern); the escalation carries its own
    tolerance + plan test (round-8 verdict task 3). Gate cost: one
    count() of the input — parquet-metadata-cheap on a plain scan.
    """
    from dbms_data_anonymity_differential_privacy_spark.operators.similarity import _dot

    v = _as_double_array(F.col(vec_col))
    e = df.select(
        F.col(id_col).alias("__id"), F.col(label_col).alias("__lbl"), v.alias("__v")
    )
    # scale escape: past the threshold the exact collect_list folds
    # would materialize cluster-sized arrays in single aggregation
    # buffers — switch to plain partial-combining sums (tolerance
    # contract, see docstring)
    exact_folds = df.count() <= exact_fold_max_rows

    def sum_of(col: str) -> Column:
        if exact_folds:
            return F.expr(
                f"aggregate(array_sort(collect_list({col})), CAST(0.0 AS DOUBLE),"
                " (a, b) -> a + b)"
            )
        return F.sum(col)

    # exact per-(label, dim) centroid coordinates: sorted fold / count
    sums = (
        e.select("__lbl", F.posexplode("__v").alias("__pos", "__x"))
        .groupBy("__lbl", "__pos")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            sum_of("__x").alias("__s"),
        )
    )
    crows = (
        sums.groupBy("__lbl")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("__pos", (F.col("__s") / F.col("__n").cast("double")).alias("__m"))
                )
            ).alias("__p")
        )
        .select("__lbl", F.transform("__p", lambda p: p["__m"]).alias("__cv"))
        .collect()  # k rows — bounded driver work (the x175 contract)
    )
    xx = _dot(F.col("__v"), F.col("__v"))
    dists = []  # (label literal, distance expression)
    for row in crows:
        cvec = [float(x) for x in row["__cv"]]
        # sequential left-fold of c·c in list order — bit-identical to
        # the fold the broadcast-relation formulation would have used
        cxx = 0.0
        for x in cvec:
            cxx += x * x
        clit = F.array(*[F.lit(x) for x in cvec])
        d = F.sqrt(
            F.greatest(xx - 2.0 * _dot(F.col("__v"), clit) + F.lit(cxx), F.lit(0.0))
        )
        dists.append((row["__lbl"], d))
    # a = distance to the OWN centroid (exactly one non-null candidate),
    # b = min distance to any OTHER centroid; array_min/max skip NULLs —
    # the same null-skipping MIN/MAX(CASE ...) semantics the SQL twin uses
    a = F.array_max(
        F.array(*[F.when(F.col("__lbl") == F.lit(lbl), d) for lbl, d in dists])
    )
    b = F.array_min(
        F.array(*[F.when(F.col("__lbl") != F.lit(lbl), d) for lbl, d in dists])
    )
    s = F.when(
        F.greatest(a, b) > 0.0,
        (b - a) / F.greatest(a, b),
    ).otherwise(F.lit(0.0))
    per = e.select(F.col("__lbl"), a.alias("__a"), b.alias("__b"), s.alias("__s"))

    out = per.groupBy(F.col("__lbl").alias(label_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        sum_of("__a").alias("__sa"),
        sum_of("__b").alias("__sb"),
        sum_of("__s").alias("__ss"),
    )
    nd = F.col("n").cast("double")
    return out.select(
        label_col,
        "n",
        F.round(F.col("__sa") / nd, round_to).alias("mean_a_r"),
        F.round(F.col("__sb") / nd, round_to).alias("mean_b_r"),
        F.round(F.col("__ss") / nd, round_to).alias("silhouette_r"),
    )
