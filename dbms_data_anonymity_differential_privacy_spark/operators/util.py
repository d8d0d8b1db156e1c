"""Physical-layout helpers."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def nondet_true() -> Column:
    """An always-true boolean Catalyst must treat as nondeterministic.

    AND-ing this onto a computed per-row verdict column pins a caller's
    ``filter(verdict)`` ABOVE the projection that computes it:
    ``PushPredicateThroughNonJoin`` only pushes a filter through a
    Project whose fields are ALL deterministic, and would otherwise
    substitute the verdict's aliases downward — restating the whole
    (often interpreted, CodegenFallback) expression chain once per
    predicate term below the fan-out exchange. Measured on
    pipe_private_export's Gopher gate at sf0.1: the pushed-down form
    re-evaluated the clean+redact+tokenize chain ~8x per row in a
    single-threaded pre-shuffle stage, 3.4s vs 0.4s.

    ``size(shuffle(array(1))) > 0`` specifically: ``shuffle`` is
    nondeterministic but allowed in streaming plans (unlike
    ``monotonically_increasing_id``), and the optimizer cannot fold the
    comparison (Spark 4 DOES fold bounded comparisons on ``rand()``,
    e.g. ``rand() > -1`` simplifies to true and the barrier vanishes —
    measured). Per-row cost is one 1-element array shuffle: noise.

    Value and schema are unchanged; only alias substitution is blocked.
    """
    return F.size(F.shuffle(F.array(F.lit(1)))) > 0


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a *narrow* input so CPU-heavy per-row work (regex
    shingling, hash signatures, vector math) uses every core.

    Small benchmark inputs arrive as ONE parquet file → one partition → the
    whole downstream pipeline runs single-threaded regardless of cluster
    size. At real scale inputs already have >= cores partitions and this is
    a no-op (the check is against the actual partition count, so no shuffle
    is added on a 100 TB multi-file scan).
    """
    if df.isStreaming:
        # partition probing needs .rdd (batch-only); micro-batch sizing is
        # the source's job (maxFilesPerTrigger etc.), so pass through
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
