"""Sessionization — event-gap session windows over the events stream.

The reference is batch-only and has no event/stream concepts; this is a
north-star extension alongside X6: grouping a user's events into sessions
separated by idle gaps is the standard first step of behavioral training
data (and of per-session privacy units — DP-SQL systems bound user
contribution per session). Two flavors with identical semantics:

- **Batch**: ``F.session_window(ts, gap)`` aggregation — Spark implements
  it as one shuffle on the user key + per-key sort-merge of overlapping
  windows. Equivalent to the classic gaps-and-islands SQL (lag → gap flag
  → running sum → group), which is exactly what the DuckDB oracle twin
  runs; the engine uses the native operator because it fuses the island
  assignment and the aggregation into one stage, with no window-function
  pass over fact rows.
- **Streaming**: same expression under a watermark. State is one struct
  per OPEN session (merged on arrival, like the batch sort-merge);
  sessions older than the watermark close and evict, so state is bounded
  by concurrent-active users regardless of stream length — the property
  that keeps it viable on an unbounded event feed.

A session's ``session_end`` is ``last_event_ts + gap`` (Spark's
session_window contract: the window stays open for one idle gap past the
last event); duration is end - start.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.streaming.anonymize import events_readstream


def _session_agg(events: DataFrame, user_col: str, ts_col: str, gap: str) -> DataFrame:
    sw = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(sw.alias("sw"), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def sessionize_batch(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-(user, session) relation: start, end (= last event + gap), size.

    One fact-row shuffle (on the user key); the session merge happens
    inside the aggregation, not in a separate window pass. Oracle twin:
    gaps-and-islands SQL (x11_sessionize).
    """
    return _session_agg(events, user_col, ts_col, gap)


def sessionize_stream(
    spark: SparkSession,
    events_path: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming flavor: file readStream + watermark + session_window.

    Append-mode emits each session exactly once, when the watermark passes
    its close; tests drive it with availableNow into a memory sink and
    assert row-set equality with the batch twin.
    """
    events = events_readstream(spark, events_path)
    return _session_agg(events.withWatermark(ts_col, watermark), user_col, ts_col, gap)
