"""Physical-layout helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
