"""Misra–Gries heavy hitters — bounded-memory frequent-value detection.

The third sketch family in the engine, next to Greenwald–Khanna quantiles
(`functions.binning.bin_equal_frequency_approx`, `metrics.group_percentiles
exact=False`) and HyperLogLog++ distinct counts (`profile_columns
exact=False`): "which values appear more than n/(k+1) times?" without a
full value_counts shuffle. At 100 TB a full `groupBy(value)` over a
high-cardinality column shuffles near-distinct rows; Misra–Gries caps the
state at k counters per partition and ships ≤ k rows per partition total.

Distributed shape (Agarwal et al., "Mergeable Summaries", PODS 2012):

1. **Per-partition summaries** via Arrow `mapInPandas`: each partition
   folds its batches through a k-counter Misra–Gries dict (per-batch exact
   ``value_counts`` merged into the running summary — batch-exact counts
   entering a standard MG merge keep the guarantee). Output ≤ k rows
   ``(value, cnt)`` per partition, plus ONE ``(NULL, d)`` row carrying the
   partition's total decrement — the summary's error certificate.
2. **SQL merge**: summed lower bounds per value (tiny groupBy over
   ≤ k × partitions rows). The decrement rows sum to the global error
   bound, attached to every output row as ``err_bound`` — for any value,
   ``est_count ≤ true_count ≤ est_count + err_bound``, and
   ``err_bound ≤ n/(k+1)`` by the MG invariant.

When k exceeds the column's true cardinality no decrement ever happens,
``err_bound`` is 0, and the sketch returns EXACT counts — the regime the
DuckDB oracle checks (`x49_heavy_hitters_exact`); the sketch regime is
pinned by bound tests against exact counts.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbms_data_anonymity_differential_privacy_spark.operators.util import fan_out


def _mg_partial(k: int):
    """Per-partition fold: batches → one MG summary + one decrement row."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        decremented = 0
        for pdf in batches:
            col = pdf.iloc[:, 0]
            # exact per-batch counts (the batch is in memory anyway), then
            # a standard MG merge of the batch histogram into the summary
            for value, cnt in col.value_counts(dropna=True).items():
                counters[value] = counters.get(value, 0) + int(cnt)
            if len(counters) > k:
                # decrement by the (k+1)-largest count: keeps ≤ k counters
                # and charges every surviving counter fairly (one bulk
                # decrement ≡ that many single-item MG decrements)
                cut = sorted(counters.values(), reverse=True)[k]
                decremented += cut
                counters = {v: c - cut for v, c in counters.items() if c > cut}
        out = pd.DataFrame(
            {
                "value": list(counters.keys()) + [None],
                "cnt": list(counters.values()) + [decremented],
            }
        )
        yield out

    return fold


def heavy_hitters(df: DataFrame, col: str, k: int = 32) -> DataFrame:
    """Approximate frequent values of ``col`` with ≤ k counters/partition.

    Returns ``(value, est_count, err_bound)`` — up to k rows, largest
    first. ``est_count`` is a LOWER bound on the true count; the true
    count is ≤ ``est_count + err_bound`` (global certificate, identical on
    every row). Values with true count > ``err_bound`` are guaranteed
    present. With k ≥ true cardinality, ``err_bound`` is 0 and counts are
    exact.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    in_type = df.schema[col].dataType
    schema = T.StructType(
        [T.StructField("value", in_type), T.StructField("cnt", T.LongType())]
    )
    partials = fan_out(df.select(col)).mapInPandas(_mg_partial(k), schema)
    merged = (
        partials.filter(F.col("value").isNotNull())
        .groupBy("value")
        .agg(F.sum("cnt").alias("est_count"))
    )
    err = partials.filter(F.col("value").isNull()).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("err_bound")
    )
    return (
        merged.crossJoin(F.broadcast(err))
        .orderBy(F.col("est_count").desc(), F.col("value"))
        .limit(k)
    )
