"""Streaming audience metrics — exact windowed distinct-user counts.

Daily/hourly unique users is the first dashboard number any event
pipeline publishes, and the naive streaming answer is wrong twice over:
``COUNT(DISTINCT)`` is unsupported in streaming aggregations, and
``approx_count_distinct`` trades exactness away even where the state
would be affordable. The exact composition is TWO chained stateful
operators (supported since Spark 3.4 with watermark propagation):

1. ``dropDuplicatesWithinWatermark`` on (window_start, user) — state is
   one entry per ACTIVE (window, user), bounded by the lateness horizon
   times per-window audience, not by stream length;
2. a windowed count over the deduplicated stream.

The batch twin is a plain per-window ``countDistinct`` — DuckDB-oracle
checkable — and the stream must equal it exactly on a replay (pinned in
tests): dedup-then-count is arrival-order-independent, unlike any
first/last-based aggregate.

At 100 TB/day the dedup state is the product of window count and
distinct users per window — audience-sized, not event-sized; for
audiences beyond state budget, swap stage 1 for the x202 HLL register
construction (a (window, bucket) MAX aggregation is a plain windowed
agg) and accept the estimate.

Absent from the reference (batch-only pandas study) — designed from the
public Structured Streaming API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.streaming.anonymize import events_readstream


def windowed_distinct_users_stream(
    spark: SparkSession,
    events_path: str,
    window: str = "1 day",
    watermark: str = "2 days",
    user_col: str = "user_id",
) -> DataFrame:
    """Exact unique users per event-time window over a stream: dedup on
    (window, user) within the watermark, then a windowed count. File
    source flavor for tests; swap the reader for Kafka in production."""
    ev = events_readstream(spark, events_path)
    keyed = ev.withWatermark("ts", watermark).withColumn(
        "__wstart", F.window("ts", window).getField("start")
    )
    deduped = keyed.dropDuplicatesWithinWatermark(["__wstart", user_col])
    # the count groups on window(ts) — the WATERMARKED event-time column
    # — not on the derived __wstart key: append mode requires the
    # aggregation's grouping to carry the watermark, which a plain
    # projected column does not (watermark propagation across the
    # chained dedup works on the event-time attribute itself)
    return (
        deduped.groupBy(F.window("ts", window).alias("__w"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.col("__w.start").alias("window_start"), "n_users")
    )


def windowed_distinct_users_batch(
    events: DataFrame, window: str = "1 day", user_col: str = "user_id"
) -> DataFrame:
    """Batch twin: exact per-window distinct users — the oracle surface."""
    return (
        events.groupBy(
            F.window("ts", window).getField("start").alias("window_start")
        )
        .agg(F.countDistinct(F.col(user_col)).cast("long").alias("n_users"))
        .select("window_start", "n_users")
    )
