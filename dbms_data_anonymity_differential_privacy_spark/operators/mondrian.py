"""Mondrian multidimensional k-anonymity (LeFevre, DeWitt, Ramakrishnan,
ICDE 2006) — greedy median-split partitioning of the QI space, then
per-leaf range generalization.

The reference achieves k-anonymity only by SUPPRESSION (drop every class
smaller than k, naive-suppresion.py:29-40) or by k-means clustering
(clustering-anon.py). Mondrian is the classic third way: generalize
instead of drop, losing precision instead of rows. Published utility is
far better than suppression on skewed QIs (its NCP degrades gracefully
instead of suppressing whole regions).

Spark-first design — the whole recursion is data-parallel:

* One "round" splits EVERY splittable leaf at once (breadth-first over
  the partition tree), not one leaf at a time: rounds = tree DEPTH
  (~log2(n/k)), not leaf count. 100 TB with k=25 is ~40 rounds.
* Per-leaf state (counts, ranges, medians, the chosen cut) lives in a
  small aggregated relation keyed by leaf id — NEVER collected into a
  driver-side CASE chain, so billions of leaves are fine. Row → leaf
  routing is a join on the leaf id.
* Medians come from ``percentile_approx`` (Greenwald–Khanna sketch, one
  pass) by default; the k-guarantee does NOT depend on median accuracy
  because side populations are re-counted exactly before a cut is
  accepted — a sloppy median only unbalances the tree slightly.
  ``median='exact'`` switches to the exact sort-based percentile for
  deterministic small-relation runs.
* Each round ends in ``localCheckpoint(eager=True)`` to truncate the
  iterative lineage (the same pattern MLlib uses); a real cluster
  deployment would point this at a reliable checkpoint dir.

Deviation from the paper, documented: when the widest allowable
dimension's median cut would violate k, the original retries remaining
dimensions serially; we evaluate ALL dimensions' cuts in the same
aggregation pass and pick the widest among the allowable ones — same
intent, strictly fewer passes, and never worse coverage than
widest-only.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PID = "__pid"
RID = "__rid"


def _median_expr(col: str, how: str, accuracy: int):
    if how == "exact":
        return F.expr(f"percentile({col}, 0.5)")
    return F.percentile_approx(F.col(col), F.lit(0.5), F.lit(accuracy)).cast("double")


def _assign_slim(
    df: DataFrame,
    qi: Sequence[str],
    k: int,
    median: str = "approx",
    accuracy: int = 10_000,
    max_rounds: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Core breadth-first split loop over a SLIM relation.

    Returns ``(src, leaves)``: ``src`` is the input with a frozen row id
    ``__rid`` (payload intact, checkpointed once), ``leaves`` is the slim
    ``(__rid, __d0..__dn, __pid)`` relation after all rounds. Callers
    re-attach payload / compute bounds from these without ever rewriting
    payload columns through the iteration.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not qi:
        raise ValueError("need at least one QI column")
    dims = list(qi)

    # The iterated relation is SLIM: (row id, dims as double, pid) — the
    # per-round localCheckpoint materializes ~(8 + 8*|qi| + 8) bytes/row,
    # never the payload columns. At 100 TB the payload re-attaches ONCE at
    # the end (join on the frozen row id), instead of being rewritten
    # ~log2(n/k) times. The row id is frozen by the first checkpoint
    # (monotonically_increasing_id is layout-dependent only until
    # materialized), so the final join is exact.
    src = df.withColumn(RID, F.monotonically_increasing_id()).localCheckpoint(eager=True)
    d = src.select(
        F.col(RID),
        *[F.col(q).cast("double").alias(f"__d{i}") for i in range(len(dims)) for q in [dims[i]]],
        F.lit(0).cast("long").alias(PID),
    )
    grange: list[float] | None = None  # derived from round-0 leaf stats

    for rnd in range(max_rounds):
        # One aggregation: per-leaf count, range, and median of EVERY dim.
        stats = d.groupBy(PID).agg(
            F.count(F.lit(1)).alias("__cnt"),
            *[F.min(F.col(f"__d{i}")).alias(f"__min_{i}") for i in range(len(dims))],
            *[_median_expr(f"__d{i}", median, accuracy).alias(f"__med_{i}") for i in range(len(dims))],
            *[F.max(F.col(f"__d{i}")).alias(f"__max_{i}") for i in range(len(dims))],
        )
        if grange is None:
            # Round 0 has a single leaf, so its stats row IS the global
            # range — no separate full-table aggregation.
            g = stats.agg(
                *[F.min(f"__min_{i}").alias(f"mn{i}") for i in range(len(dims))],
                *[F.max(f"__max_{i}").alias(f"mx{i}") for i in range(len(dims))],
            ).first()
            grange = [
                max((g[f"mx{i}"] or 0.0) - (g[f"mn{i}"] or 0.0), 1e-12)
                for i in range(len(dims))
            ]
        # Exact side counts for every candidate cut, same shuffle key.
        lefts = (
            d.join(stats.select(PID, *[f"__med_{i}" for i in range(len(dims))]), PID)
            .groupBy(PID)
            .agg(
                *[
                    F.sum((F.col(f"__d{i}") <= F.col(f"__med_{i}")).cast("long")).alias(
                        f"__left_{i}"
                    )
                    for i in range(len(dims))
                ]
            )
        )
        spec = stats.join(lefts, PID)
        # Widest allowable dimension: score = normalized range where the
        # cut keeps k on both sides, else -1.
        scores = []
        for i in range(len(dims)):
            allowable = (F.col(f"__left_{i}") >= k) & (
                (F.col("__cnt") - F.col(f"__left_{i}")) >= k
            )
            rng = (F.col(f"__max_{i}") - F.col(f"__min_{i}")) / F.lit(grange[i])
            scores.append(F.when(allowable, rng).otherwise(F.lit(-1.0)))
        best = scores[0]
        for s in scores[1:]:
            best = F.greatest(best, s)
        dim_idx = F.lit(-1)
        for i in reversed(range(len(dims))):
            dim_idx = F.when(scores[i] == best, F.lit(i)).otherwise(dim_idx)
        med = F.lit(None).cast("double")
        for i in range(len(dims)):
            med = F.when(dim_idx == i, F.col(f"__med_{i}")).otherwise(med)
        spec = spec.select(
            PID,
            (best >= 0).alias("__allowed"),
            dim_idx.alias("__dim"),
            med.alias("__cut"),
        ).persist()

        n_splittable = spec.where("__allowed").count()
        if n_splittable == 0:
            spec.unpersist()
            break

        val = F.lit(None).cast("double")
        for i in range(len(dims)):
            val = F.when(F.col("__dim") == i, F.col(f"__d{i}")).otherwise(val)
        routed = (
            d.join(spec, PID)
            .withColumn(
                PID,
                F.when(~F.col("__allowed"), F.col(PID))
                .when(val <= F.col("__cut"), F.col(PID) * 2 + 1)
                .otherwise(F.col(PID) * 2 + 2),
            )
            .drop("__allowed", "__dim", "__cut")
        )
        d = routed.localCheckpoint(eager=True)
        spec.unpersist()
    return src, d


def mondrian_assign(
    df: DataFrame,
    qi: Sequence[str],
    k: int,
    median: str = "approx",
    accuracy: int = 10_000,
    max_rounds: int = 64,
) -> DataFrame:
    """Assign every row a Mondrian leaf id ``__pid`` such that every leaf
    holds >= k rows (exact guarantee: cuts are accepted only after exact
    side counts). QI columns must be numeric-orderable; NULLs sort to the
    right side of every cut (they satisfy no ``<= median`` predicate) and
    are not bounded by the leaf ranges.
    """
    src, leaves = _assign_slim(df, qi, k, median=median, accuracy=accuracy, max_rounds=max_rounds)
    return src.join(leaves.select(RID, PID), RID).drop(RID)


def mondrian_leaf_bounds(
    df: DataFrame,
    qi: Sequence[str],
    k: int,
    median: str = "exact",
    max_rounds: int = 64,
) -> DataFrame:
    """The leaf relation of a Mondrian run: one row per leaf with its id,
    population, and per-dimension [lo, hi] bounds — the deterministic core
    every release derives from (``mondrian_anonymize`` is this joined back
    to rows).

    With ``median='exact'`` the whole run is a pure function of the input:
    exact interpolated medians (type-7, matching DuckDB ``quantile_cont``),
    exact side counts, and the widest-normalized-range / lowest-index
    tie-break in ``_assign_slim`` are all deterministic — so on
    integer-valued dims the relation is reproducible bit-for-bit by a SQL
    engine unrolling the same rounds (see the x15_mondrian_exact oracle in
    queries_registry.py). This is what makes a *recursive, data-dependent*
    operator hash-checkable.
    """
    _, leaves = _assign_slim(df, qi, k, median=median, max_rounds=max_rounds)
    out = leaves.groupBy(PID).agg(
        F.count(F.lit(1)).alias("cnt"),
        *[F.min(F.col(f"__d{i}")).alias(f"{q}_lo") for i, q in enumerate(qi)],
        *[F.max(F.col(f"__d{i}")).alias(f"{q}_hi") for i, q in enumerate(qi)],
    )
    return out.withColumnRenamed(PID, "pid")


def mondrian_anonymize(
    df: DataFrame,
    qi: Sequence[str],
    k: int,
    median: str = "approx",
    keep_pid: bool = False,
) -> DataFrame:
    """Full Mondrian release: every QI column is replaced by its leaf
    range ``[lo, hi]`` (numeric ``<q>_lo`` / ``<q>_hi`` pairs — the form
    NCP and downstream models want; the pretty string is one concat away).
    Non-QI columns pass through untouched; NO rows are suppressed.

    Bounds come from one aggregation over the SLIM leaf relation (never
    touching payload); the payload joins back exactly once, on the frozen
    row id. The bounds relation is ~n/k rows — broadcastable for typical
    k at survey scale, so AQE picks the strategy rather than forcing it.
    """
    src, leaves = _assign_slim(df, qi, k, median=median)
    bounds = leaves.groupBy(PID).agg(
        *[F.min(F.col(f"__d{i}")).alias(f"{q}_lo") for i, q in enumerate(qi)],
        *[F.max(F.col(f"__d{i}")).alias(f"{q}_hi") for i, q in enumerate(qi)],
    )
    out = src.join(leaves.select(RID, PID), RID).join(bounds, PID).drop(RID, *qi)
    if not keep_pid:
        out = out.drop(PID)
    return out
