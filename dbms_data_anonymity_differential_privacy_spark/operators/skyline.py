"""Skyline (Pareto-frontier) operators.

The reference engine has no multi-criteria selection at all — its closest
notion is the single-criterion threshold filter (``naive-suppresion.py:40``).
A curation pipeline constantly trades off competing per-item scores (quality
vs length, freshness vs popularity, coverage vs dedup-cost), and the
canonical exact answer to "which items are not strictly worse than some
other item on every axis" is the skyline: row p survives iff no row q
dominates it (q >= p on every dimension, q > p on at least one).

Scale design (the naive formulation is an all-pairs NOT EXISTS — quadratic,
a non-starter at 100 TB):

``skyline_2d`` (both dims maximised) is fully JVM-side in three stages:

1. **Collapse to the per-d1 maximum of d2** — ``groupBy(d1).max(d2)``, one
   partial-aggregated shuffle of two 8-byte columns. Any row below its
   d1-group's max d2 is dominated inside its own group, so only group
   maxima can be frontier points.
2. **Bucketed local pruning** — the group relation is hashed into ``P``
   buckets and a per-bucket running-max window discards local non-frontier
   points. The union of per-bucket skylines always contains the global
   skyline (dominance is partition-agnostic), and the expected skyline of
   an n-point bucket is O(log n) points, so the survivor set is tiny.
3. **Exact global pass** — one ROWS-frame window over the kilobyte-scale
   survivor relation (sorted by d1 desc, running max of d2; survive iff
   strictly above the running max of all strictly-greater-d1 points), then
   a **broadcast** join back to the fact table to emit full frontier rows,
   tie rows included.

No all-pairs stage ever touches fact rows; the only fact-row shuffle is the
stage-1 aggregate.

``skyline_kd`` handles k >= 2 dimensions with the classic two-phase
distributed skyline: an Arrow-batched per-partition local skyline
(numpy dominance sweep over the partition, map-only), then an exact final
sweep over the collected candidate union on a single partition — correct
for any k because local pruning can never remove a global frontier point.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    d1: str,
    d2: str,
    payload: Sequence[str] = (),
    buckets: int = 64,
) -> DataFrame:
    """Exact 2-D skyline, both dimensions maximised. Returns the frontier
    rows of ``df`` projected to ``[d1, d2, *payload]`` (all ties kept)."""
    # Stage 1: one aggregate shuffle — only per-d1 maxima can survive.
    groups = df.groupBy(d1).agg(F.max(d2).alias("_mx2"))

    # Stage 2: per-bucket running-max prune on the slim group relation.
    local_w = (
        Window.partitionBy("_b")
        .orderBy(F.col(d1).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pruned = (
        groups.withColumn("_b", F.pmod(F.xxhash64(F.col(d1)), F.lit(buckets)))
        .withColumn("_pmax", F.max("_mx2").over(local_w))
        .filter(F.col("_pmax").isNull() | (F.col("_mx2") > F.col("_pmax")))
        .drop("_b", "_pmax")
    )

    # Stage 3: exact global sweep over the tiny survivor set. ROWS frame is
    # safe despite d1 ties because stage 1 left exactly one row per d1.
    global_w = Window.orderBy(F.col(d1).desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = (
        pruned.withColumn("_gmax", F.max("_mx2").over(global_w))
        .filter(F.col("_gmax").isNull() | (F.col("_mx2") > F.col("_gmax")))
        .select(F.col(d1).alias("_f1"), F.col("_mx2").alias("_f2"))
    )

    out_cols = [d1, d2, *payload]
    fact = df.select(*out_cols)
    return (
        fact.join(
            F.broadcast(frontier),
            on=[fact[d1] == F.col("_f1"), fact[d2] == F.col("_f2")],
            how="inner",
        )
        .select(*out_cols)
    )


def skyline_kd(
    df: DataFrame,
    dims: Sequence[str],
    payload: Sequence[str] = (),
) -> DataFrame:
    """Exact k-D skyline, all dimensions maximised.

    Phase 1 computes each partition's local skyline with a vectorised numpy
    dominance sweep (map-only, Arrow-batched); phase 2 repeats the exact
    same sweep over the union of local skylines on one partition. Local
    pruning is sound for any partitioning: a globally undominated point is
    undominated in every subset containing it.
    """
    import numpy as np

    cols = [*dims, *payload]
    proj = df.select(*cols)
    schema = proj.schema
    k = len(dims)

    def local_skyline(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [b for b in batches if len(b)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        vals = pdf[list(dims)].to_numpy(dtype="float64")
        # Sort by dim0 desc so a point can only be dominated by a
        # predecessor; sweep keeps the running undominated set.
        order = np.lexsort(tuple(-vals[:, i] for i in range(k - 1, -1, -1)))
        vals = vals[order]
        keep_idx: list[int] = []
        kept = np.empty((0, k))
        for i in range(len(vals)):
            v = vals[i]
            ge = (kept >= v).all(axis=1)
            gt = (kept > v).any(axis=1)
            if not (ge & gt).any():
                keep_idx.append(i)
                kept = np.vstack([kept, v])
        yield pdf.iloc[order[keep_idx]]

    candidates = proj.mapInPandas(local_skyline, schema)
    return candidates.coalesce(1).mapInPandas(local_skyline, schema)
