"""Streaming deduplication — north-star training-pipeline extension.

A 100 TB/day ingest pipeline dedups records AS THEY ARRIVE, not in a
nightly batch. Structured Streaming gives exactly this via
``dropDuplicatesWithinWatermark``: state holds one entry per key only
until the watermark passes the key's event time, so state is bounded by
the lateness horizon x key arrival rate — not by stream length (plain
``dropDuplicates`` on a stream retains ALL keys forever and OOMs on an
unbounded stream; this module deliberately does not offer it).

The batch twin (``dedup_events_batch``) applies the same key-level
semantics to a static DataFrame with a deterministic representative
(min event_id per key), which keeps it DuckDB-oracle-checkable. The
streaming path keeps the FIRST ARRIVAL per key — arrival order is not
deterministic across retries, so stream-vs-batch equivalence is asserted
on the key set and count (the deduplicated universe), not representative
rows; tests drive both over the same file.

Absent from the reference (batch-only pandas study) — designed from the
public Structured Streaming API.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from dbms_data_anonymity_differential_privacy_spark.operators.dedup import dedup_exact
from dbms_data_anonymity_differential_privacy_spark.streaming.anonymize import events_readstream


def dedup_events_stream(
    spark: SparkSession,
    events_path: str,
    keys: Sequence[str] = ("user_id", "event_type"),
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival per key, with state
    bounded by the watermark horizon. File-source flavor for tests; swap
    the reader line for Kafka etc. in production."""
    events = events_readstream(spark, events_path)
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(keys))


def dedup_events_batch(
    events: DataFrame, keys: Sequence[str] = ("user_id", "event_type")
) -> DataFrame:
    """Batch twin: same key-level dedup with a deterministic representative
    (min event_id per key, via X2 ``dedup_exact``) so the result is
    oracle-checkable."""
    return dedup_exact(events, list(keys), "event_id")
