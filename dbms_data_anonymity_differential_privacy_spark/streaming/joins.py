"""Stream-stream interval join — click→purchase attribution pairs.

The reference is batch-only; Structured Streaming's stream-stream join is
the canonical way to emit (click, purchase) attribution pairs online: both
sides carry a watermark, the join condition bounds purchase time to a
window after the click, and Spark sizes the join state from exactly those
bounds (clicks are dropped from state once older than the watermark minus
the window — bounded memory on an unbounded stream).

Batch twin discipline (x06/x30 convention): the same time-bounded join
condition is built by ONE shared function and applied to batch frames for
the oracle-checkable twin, so stream and batch can't drift semantically.
The equivalence test replays a file source with availableNow and compares
against the batch twin row-for-row.

Scale shape (batch): equi-key ``user_id`` drives the shuffle; the time
bounds are post-join filters on each user's pairs — never a cross join.
State size (stream): O(clicks in the attribution window) per user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_WINDOW = "30 minutes"


def _pair_condition(window: str):
    return (
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") >= F.col("c.ts"))
        & (F.col("p.ts") <= F.col("c.ts") + F.expr(f"INTERVAL {window}"))
    )


def _project(pairs: DataFrame) -> DataFrame:
    return pairs.select(
        F.col("c.user_id").alias("user_id"),
        F.col("c.event_id").alias("click_id"),
        F.col("p.event_id").alias("purchase_id"),
        # elapsed whole seconds = floor(exact microsecond diff / 1e6);
        # second-granularity datediffs count boundary CROSSINGS in some
        # engines (DuckDB) and elapsed seconds in others — microseconds
        # are exact everywhere.
        F.expr("timestampdiff(MICROSECOND, c.ts, p.ts) DIV 1000000")
        .cast("long")
        .alias("lag_sec"),
    )


def click_purchase_pairs_batch(
    events: DataFrame, window: str = ATTRIBUTION_WINDOW
) -> DataFrame:
    """Batch twin: every (click, purchase) pair of the same user with the
    purchase inside ``window`` after the click."""
    clicks = events.filter(F.col("event_type") == "click").alias("c")
    purchases = events.filter(F.col("event_type") == "purchase").alias("p")
    return _project(clicks.join(purchases, _pair_condition(window)))


def click_purchase_pairs_stream(
    events_stream: DataFrame,
    window: str = ATTRIBUTION_WINDOW,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming flavor: stream-stream inner join with watermarks on both
    sides; identical condition and projection as the batch twin."""
    clicks = (
        events_stream.filter(F.col("event_type") == "click")
        .withWatermark("ts", watermark)
        .alias("c")
    )
    purchases = (
        events_stream.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .alias("p")
    )
    return _project(clicks.join(purchases, _pair_condition(window)))
