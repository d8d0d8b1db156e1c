"""Streaming distribution-drift monitor — the x67/x181 drift family on an
unbounded event stream.

Per event-time tumbling window, the Population Stability Index of the
window's event-type mix against a FIXED reference distribution (the
training-period baseline every production drift monitor pins): the
"did traffic composition shift this hour?" alarm, continuously.

Structured Streaming shape: ONE stateful aggregation — the per-window
conditional counts for every reference type are columns of a single
``groupBy(window)`` (never a second ``groupBy`` over a first one, which
append-mode streams disallow and which would double state); PSI is then a
map-only fold over those columns with the reference embedded as exact
integer literals. Watermark bounds state to O(active windows) regardless
of stream length.

Types outside the reference fall into an OTHER bucket (reference count 0,
Laplace-smoothed), so drift INTO unseen types raises PSI instead of
being invisible. Laplace smoothing ``(c + 1) / (n + B)`` over the fixed
``B = len(ref) + 1`` buckets keeps every log finite (the x181 contract);
PSI rounds at 6 dp (the libm-sum contract).

``drift_windows_batch`` is the exact batch twin (same expressions on a
static DataFrame) used by the DuckDB oracle; the streaming flavor over
the same file in availableNow mode must produce identical rows (asserted
in tests — the correctness argument for the streaming path).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.streaming.anonymize import events_readstream


def reference_counts(events: DataFrame, type_col: str = "event_type") -> dict[str, int]:
    """Build the reference distribution — exact integer counts per type —
    from a baseline relation (one tiny driver collect of the type
    histogram; types are a fixed small vocabulary by contract)."""
    rows = events.groupBy(type_col).agg(F.count(F.lit(1)).alias("c")).collect()
    return {r[0]: r[1] for r in rows if r[0] is not None}


def _psi_projection(
    counted: DataFrame, ref: Mapping[str, int], types: list[str]
) -> DataFrame:
    """Map-only PSI over the per-window conditional-count columns.

    ``counted`` carries ``window_start``, ``n_events`` and one ``__c_{i}``
    column per reference type (OTHER is the remainder). The reference
    rides as exact integer literals; both engines then divide and ln the
    same doubles.
    """
    n_buckets = len(types) + 1
    ref_n = sum(int(ref.get(t, 0)) for t in types)
    n = F.col("n_events").cast("double")

    def term(cnt: Column, ref_cnt: int) -> Column:
        p = (cnt.cast("double") + 1.0) / (n + float(n_buckets))
        q = F.lit(float(ref_cnt + 1)) / F.lit(float(ref_n + n_buckets))
        return (p - q) * F.log(p / q)

    other_cnt = F.col("n_events") - sum(F.col(f"__c_{i}") for i in range(len(types)))
    psi = sum(
        [term(F.col(f"__c_{i}"), int(ref[t])) for i, t in enumerate(types)],
        term(other_cnt, 0),
    )
    return counted.select(
        "window_start",
        F.col("n_events").cast("long").alias("n_events"),
        F.round(psi, 6).alias("psi_r"),
    )


def _windowed_type_counts(
    events: DataFrame, types: list[str], window: str, type_col: str, ts_col: str
) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias("n_events")] + [
        F.sum((F.col(type_col) == F.lit(t)).cast("long")).alias(f"__c_{i}")
        for i, t in enumerate(types)
    ]
    return (
        events.groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(*aggs)
        .select(F.col("w.start").alias("window_start"), "*")
        .drop("w")
    )


def drift_windows_batch(
    events: DataFrame,
    ref: Mapping[str, int],
    window: str = "1 day",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Batch twin of the streaming drift monitor (oracle-checkable):
    per-window PSI of the type mix against ``ref``. Output:
    ``(window_start, n_events, psi_r)``."""
    types = sorted(ref)
    counted = _windowed_type_counts(events, types, window, type_col, ts_col)
    return _psi_projection(counted, ref, types)


def drift_windows_stream(
    spark: SparkSession,
    events_path: str,
    ref: Mapping[str, int],
    window: str = "1 day",
    watermark: str = "2 days",
    type_col: str = "event_type",
) -> DataFrame:
    """The streaming flavor: file-source readStream + watermark + ONE
    windowed aggregation carrying the per-type conditional counts, then
    the map-only PSI projection. State is O(active windows); the
    reference is a fixed literal vector, so no second stateful stage
    exists and the query runs in any output mode."""
    events = events_readstream(spark, events_path)
    types = sorted(ref)
    counted = _windowed_type_counts(
        events.withWatermark("ts", watermark), types, window, type_col, "ts"
    )
    return _psi_projection(counted, ref, types)
