"""Streaming anonymization — SURVEY §2c X6.

The reference is batch-only; this is the north-star streaming extension:
k-threshold suppression of (window, QI) groups over an event stream —
publish an hourly count per event_type only when the group has >= k
members inside the hour (the streaming analog of C1's class-size rule).

Structured Streaming shape: event-time tumbling window + watermark →
grouped count → threshold filter. The watermark bounds state: groups
older than the lateness horizon are finalized and evicted, so state size
is O(active windows x QI cardinality) regardless of stream length — the
property that makes this viable on an unbounded 100 TB/day stream.

``windowed_kanon_batch`` is the exact batch equivalent (same expressions
on a static DataFrame) used by the DuckDB oracle; a Structured Streaming
run over the same file in availableNow mode must produce identical rows
(asserted in tests — the correctness argument for the streaming path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


# Kept for callers that build their own stream over native-timestamp files.
# Watermarks require TIMESTAMP (ltz) — NTZ event time is rejected
# (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) — so the stream declares ltz over
# the file's int64 micros; with the engine's UTC session timezone
# (session.py) the instants match the batch reader's NTZ values exactly.
#
# CHANGED CONTRACT (round 2): ``ts`` here was LongType nanoseconds through
# round 1 and is now TimestampType. External callers that applied their own
# ``ts div 1000`` conversion must drop it — the stream already delivers
# proper timestamps.
EVENTS_SCHEMA = _events_schema(T.TimestampType())


def events_readstream(
    spark: SparkSession, events_path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source readStream over an events directory with ``ts`` always
    arriving as a proper TimestampType, whatever the file encoding.

    ``max_files_per_trigger`` caps each micro-batch at that many source
    files (the file source's ``maxFilesPerTrigger``; respected by
    availableNow replays too) — how the stream-state bench drives a
    multi-batch replay with per-batch state/throughput telemetry.

    Streaming sources need a declared schema, and the events table has
    shipped in two encodings (TIMESTAMP(NANOS) stored as int64, and native
    TIMESTAMP(MICROS)). One driver-side batch footer probe (no data read)
    picks the matching schema; the nanos flavor is converted in-stream.
    Mirrors the batch-side handling in ``sources.readers.load_table``.

    The probe runs ONCE at stream construction, so one directory must hold
    one ts encoding for the stream's lifetime: files of the other encoding
    landing later would be misread by the fixed declared schema. (Mixed
    directories would confuse any fixed-schema file source; keep encodings
    in separate directories.)

    The session timezone is pinned to UTC here because the declared ltz
    TimestampType reinterprets the file's NTZ-annotated micros through the
    session zone: any non-UTC zone would shift every window boundary
    relative to the batch reader's NTZ values. Engine-built sessions
    (session.py) are already UTC; this makes externally-built sessions safe
    too. Deliberately NOT restored — a mid-stream timezone flip would change
    window assignment between micro-batches of the running query.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # The nanos flag is runtime-settable and only affects how the probe (and
    # the stream itself, for nanos files) reads the footer; save/restore so
    # a micros-encoded directory doesn't leave a session-global flag flipped
    # for unrelated reads.
    prev_nanos = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probe = spark.read.parquet(events_path)
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    if dict(probe.dtypes).get("ts") == "bigint":
        # Nanos directory: the stream relies on the flag staying set so the
        # file source reads int64; leave it on for this session.
        raw = reader.schema(_events_schema(T.LongType())).parquet(events_path)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if prev_nanos is None:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    else:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev_nanos)
    return reader.schema(EVENTS_SCHEMA).parquet(events_path)


def _windowed_counts(events: DataFrame, k: int, window: str) -> DataFrame:
    win = F.window(F.col("ts"), window)
    return (
        events.groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= F.lit(k))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "cnt",
        )
    )


def windowed_kanon_batch(events: DataFrame, k: int = 5, window: str = "1 hour") -> DataFrame:
    """Batch-equivalent of the streaming query (oracle-checkable)."""
    return _windowed_counts(events, k, window)


def windowed_kanon_stream(
    spark: SparkSession,
    events_path: str,
    k: int = 5,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """The streaming flavor: file-source readStream + watermark + windowed
    count + threshold. Complete/update-mode sinks can publish per-window
    suppression-safe counts; in tests it's driven with availableNow into a
    memory sink and compared to the batch twin."""
    events = events_readstream(spark, events_path)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= F.lit(k))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )


def _dp_windowed_counts(
    grouped: DataFrame, epsilon: float, seed: int, release: str
) -> DataFrame:
    """Shared projection: Laplace noise keyed on (window_start, event_type).

    ``release`` is mandatory (operators/dp.py threat model): each logical
    release — one streaming query lifetime, or one batch publication — must
    carry a unique (seed, release) pair, or two releases share their
    uniform draws and differencing cancels the noise.
    """
    from dbms_data_anonymity_differential_privacy_spark.operators.dp import laplace_noise

    if epsilon <= 0:
        raise ValueError("epsilon must be positive")
    return grouped.select(
        "window_start",
        "event_type",
        "count_exact",
        (
            F.col("count_exact")
            + laplace_noise(
                ["window_start", "event_type"], 1.0 / epsilon, seed, f"stream:{release}"
            )
        ).alias("count_dp"),
    )


def dp_windowed_count_batch(
    events: DataFrame,
    epsilon: float = 1.0,
    window: str = "1 hour",
    seed: int = 42,
    release: str = "r0",
) -> DataFrame:
    """Batch twin of :func:`dp_windowed_count_stream` — identical
    expressions on a static DataFrame. Because the noise is a deterministic
    function of the (window_start, event_type) key, the batch twin produces
    byte-identical releases to the streaming run (asserted in tests), and
    the pre-noise column is oracle-checkable."""
    win = F.window(F.col("ts"), window)
    grouped = (
        events.groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("count_exact"))
        .select(F.col("w.start").alias("window_start"), "event_type", "count_exact")
    )
    return _dp_windowed_counts(grouped, epsilon, seed, release)


def dp_windowed_count_stream(
    spark: SparkSession,
    events_path: str,
    epsilon: float = 1.0,
    window: str = "1 hour",
    watermark: str = "2 hours",
    seed: int = 42,
    release: str = "r0",
) -> DataFrame:
    """X1 x X6 — differentially private per-window counts over a stream.

    The hash-derived noise (operators/dp.py) is what makes this correct in
    streaming: noise is a pure function of the (window, key) tuple, so a
    window re-emitted after a task retry or micro-batch replay carries the
    SAME noise — ``rand()``-based noise would draw fresh randomness on
    every replay, and averaging the replays would wash the noise out (a
    privacy failure). Watermark bounds the agg state.

    Emission semantics matter for the DP guarantee: publish each window
    ONCE, after its watermark closes (append-style). Update-mode revisions
    of a still-open window would publish several counts under the same
    noise draw, and their differences are exact — the deterministic noise
    protects against *replays of the same value*, not against publishing a
    *sequence of evolving values* per key. One streaming query lifetime =
    one release label.
    """
    events = events_readstream(spark, events_path)
    grouped = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("count_exact"))
        .select(F.col("w.start").alias("window_start"), "event_type", "count_exact")
    )
    return _dp_windowed_counts(grouped, epsilon, seed, release)
