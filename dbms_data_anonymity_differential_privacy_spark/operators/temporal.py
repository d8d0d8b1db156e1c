"""Temporal joins — as-of join and keyed interval join over event data.

The reference is a single-table census study with no temporal concepts
(SURVEY §0); these are north-star extensions for event/feature pipelines.
The as-of join (attach the most recent prior observation to each probe
row) is the point-in-time-correctness primitive of feature stores and
market data; the interval join (aggregate events falling inside derived
time windows) is the companion for session/window analytics. Neither
exists as a Spark built-in.

Spark-first design:

* :func:`asof_join` is the merge-scan formulation (what DuckDB's native
  ASOF JOIN and kdb's ``aj`` do): union both relations with a side tag
  and resolve matches with one ordered window pass per key. Cost is ONE
  shuffle on the join key — identical to a single window aggregation —
  with no range-pair blowup, no per-row subquery, and no broadcast of
  either fact table. At 1000 executors the plan is scan+scan → union →
  hash-partition by key → per-partition sort, all whole-stage-codegen;
  key skew is an AQE concern like any other window, and the state per
  key is a single struct, not a buffered range.
* :func:`interval_join_by_key` equi-joins on the partition key and
  applies the range predicate as a filter inside the same SortMergeJoin
  stage — never a cartesian/range explosion. Fan-out is bounded by
  intervals-per-key (e.g. sessions per user), the natural data shape.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_LTS = "__asof_t"
_SIDE = "__asof_side"
_PAY = "__asof_pay"
MATCHED_TS = "__matched_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    payload: Sequence[str] | None = None,
    prefix: str = "prior_",
    strict: bool = False,
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join: for every left row, attach the latest right row of
    the same key with ``right.ts <= left.ts`` (``<`` when ``strict``).

    Output = all left columns + ``<prefix><right_ts>`` (the matched row's
    timestamp) + ``<prefix><c>`` for each payload column; NULLs when no
    prior right row exists (or the match is older than ``tolerance``, an
    SQL interval string like ``'1 hour'``).

    Deterministic under ties: among right rows sharing the maximal
    eligible timestamp, the one with the greatest payload tuple (struct
    ordering over ``payload`` in the given order) wins — reproducible
    regardless of partitioning, and mirrored exactly by the oracle's
    ``ORDER BY ts DESC, payload... DESC LIMIT 1``.
    """
    on = list(on)
    right_ts = right_ts or left_ts
    if payload is None:
        payload = [c for c in right.columns if c not in on and c != right_ts]
    payload = list(payload)
    rpay = F.struct(
        F.col(right_ts).alias(MATCHED_TS), *[F.col(c).alias(c) for c in payload]
    )
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias(_LTS),
        F.lit(1).alias(_SIDE),
        rpay.alias(_PAY),
    )
    l = left.withColumn(_LTS, F.col(left_ts)).withColumn(_SIDE, F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)

    # Inclusive: right rows sort BEFORE left rows at equal ts (side 1 first)
    # so a left row sees same-instant observations; strict: after.
    side_order = F.col(_SIDE).desc() if not strict else F.col(_SIDE).asc()
    w = (
        Window.partitionBy(*[F.col(c) for c in on])
        .orderBy(F.col(_LTS).asc(), side_order, F.col(_PAY).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u.withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w)).where(
        F.col(_SIDE) == 0
    )
    if tolerance is not None:
        fresh = F.col(f"{_PAY}.{MATCHED_TS}") >= F.col(_LTS) - F.expr(
            f"INTERVAL {tolerance}"
        )
        out = out.withColumn(_PAY, F.when(fresh, F.col(_PAY)))
    return out.select(
        *[F.col(c) for c in left.columns],
        F.col(f"{_PAY}.{MATCHED_TS}").alias(f"{prefix}{right_ts}"),
        *[F.col(f"{_PAY}.{c}").alias(f"{prefix}{c}") for c in payload],
    )


def interval_join_by_key(
    intervals: DataFrame,
    events: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    start_col: str = "session_start",
    end_col: str = "session_end",
    how: str = "left",
) -> DataFrame:
    """Join events into keyed intervals: one output row per (interval,
    contained event) with containment ``start <= ts < end``; ``how='left'``
    keeps empty intervals (event columns NULL).

    The equi key rides the SortMergeJoin; the range predicate is a
    post-join filter in the same stage (wrapped so LEFT semantics keep
    unmatched intervals). Event columns are exposed as ``ev_<name>``.
    """
    on = list(on)
    iv = intervals.alias("iv")
    ev = events.alias("ev")
    keys = [F.col(f"iv.{k}") == F.col(f"ev.{k}") for k in on]
    rng = (F.col(f"ev.{ts_col}") >= F.col(f"iv.{start_col}")) & (
        F.col(f"ev.{ts_col}") < F.col(f"iv.{end_col}")
    )
    cond = keys[0]
    for k in keys[1:]:
        cond = cond & k
    joined = iv.join(ev, cond & rng, how)
    ev_cols = [c for c in events.columns if c not in on]
    return joined.select(
        *[F.col(f"iv.{c}") for c in intervals.columns],
        *[F.col(f"ev.{c}").alias(f"ev_{c}") for c in ev_cols],
    )


def events_per_interval(
    intervals: DataFrame,
    events: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    start_col: str = "session_start",
    end_col: str = "session_end",
    count_alias: str = "n_matched",
) -> DataFrame:
    """Count events contained in each keyed interval (zero-filled —
    intervals with no events are kept with count 0). One SortMergeJoin on
    the key + one aggregation keyed by the interval tuple."""
    j = interval_join_by_key(
        intervals, events, on, ts_col, start_col, end_col, how="left"
    )
    return j.groupBy(*[F.col(c) for c in intervals.columns]).agg(
        F.count(F.col(f"ev_{ts_col}")).alias(count_alias)
    )


def gapfill_rollup(
    events: DataFrame,
    group_cols: Sequence[str],
    ts_col: str = "ts",
    bucket: str = "1 hour",
    value_col: str | None = None,
    trailing: int = 3,
) -> DataFrame:
    """X52 — gap-filled time-bucket rollup with a trailing-window average
    (the hypertable "continuous aggregate + gapfill" idiom).

    Buckets ``ts`` to a fixed width, aggregates per (group, bucket), then
    ZERO-FILLS every missing bucket over the table-wide [min, max] bucket
    range so downstream window math (trailing averages, anomaly bands)
    sees a dense, regular series — absent buckets are real observations
    of zero activity, and a moving average that silently skips them is
    wrong.

    Output: ``(*group_cols, bucket_ts, n, total, trail_avg_n_r)`` where
    ``trail_avg_n_r`` is the mean event count over this bucket and the
    ``trailing - 1`` preceding ones (partial at the series head, exactly
    like SQL ``ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW``), rounded to
    9 dp. ``total`` sums ``value_col`` in exact integer cents-free form —
    rounded to 9 dp since double summation order varies.

    Physical shape: the fact table collapses in ONE aggregation to
    (group, bucket) — everything after runs on the dense grid, which is
    |groups| x |buckets| rows (kilobytes for any sane retention). The
    grid is built from the aggregate's own min/max via ``sequence()`` —
    one single-row subrelation broadcast against the distinct groups —
    and left-joins the rollup back. Windows partition by group over the
    small grid. At 100 TB: one shuffle of partial counts, then kilobyte
    math, same counts-relation pattern as the EMD chain.
    """
    secs = {"1 hour": 3600, "1 day": 86400, "15 minutes": 900}
    if bucket not in secs:
        raise ValueError(f"bucket must be one of {sorted(secs)}, got {bucket!r}")
    step = secs[bucket]

    b = F.to_timestamp(
        F.from_unixtime((F.unix_timestamp(F.col(ts_col)) / step).cast("long") * step)
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(F.round(F.sum(F.col(value_col)), 9).alias("total"))
    # persisted: bounds, the distinct-group list, and the zero-fill join
    # all read this slim (group, bucket) relation — without the persist,
    # Catalyst re-derives each consumer from its own full fact scan.
    rollup = events.groupBy(*group_cols, b.alias("bucket_ts")).agg(*aggs).persist()

    bounds = rollup.agg(
        F.min("bucket_ts").alias("mn"), F.max("bucket_ts").alias("mx")
    )
    buckets = bounds.select(
        F.explode(
            F.sequence("mn", "mx", F.expr(f"INTERVAL {bucket}"))
        ).alias("bucket_ts")
    )
    groups = rollup.select(*group_cols).distinct()
    grid = groups.crossJoin(F.broadcast(buckets))
    dense = (
        # the rollup is |groups| x |observed buckets| — same kilobyte scale
        # as the grid itself — so broadcast it rather than shuffling both
        # sides of the zero-fill join
        grid.join(F.broadcast(rollup), on=[*group_cols, "bucket_ts"], how="left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
    )
    if value_col is not None:
        dense = dense.withColumn("total", F.coalesce(F.col("total"), F.lit(0.0)))
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy("bucket_ts")
        .rowsBetween(-(trailing - 1), 0)
    )
    return dense.withColumn("trail_avg_n_r", F.round(F.avg("n").over(w), 9))


def ohlc_bars(
    events: DataFrame,
    group_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "1 hour",
    id_col: str = "event_id",
) -> DataFrame:
    """X61 — OHLC resampling bars: per (group, bucket) the first / max /
    min / last observation plus count and sum (the market-data "candle",
    equally the shape of any sensor/metric downsampler).

    Open/close are argmin/argmax by time; ties (same timestamp) are
    broken by ``id_col`` so the bar is total and engine-portable — the
    oracle replays the same (ts, id) ordering with ROW_NUMBER. Exact
    integer counts, min/max untouched doubles, sum rounded 9 dp.

    Physical shape: ONE shuffle on (group, bucket); the open/close
    window and the aggregation ride the same partitioning (Spark plans
    Window → HashAggregate without a second exchange).
    """
    secs = {"1 hour": 3600, "1 day": 86400, "15 minutes": 900}
    if bucket not in secs:
        raise ValueError(f"bucket must be one of {sorted(secs)}, got {bucket!r}")
    step = secs[bucket]
    b = F.to_timestamp(
        F.from_unixtime((F.unix_timestamp(F.col(ts_col)) / step).cast("long") * step)
    )
    keyed = events.select(
        *group_cols,
        b.alias("bucket_ts"),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
        F.col(value_col).alias("__v"),
    )
    part = [F.col(c) for c in group_cols] + [F.col("bucket_ts")]
    w_asc = Window.partitionBy(*part).orderBy(F.col("__ts").asc(), F.col("__id").asc())
    w_desc = Window.partitionBy(*part).orderBy(F.col("__ts").desc(), F.col("__id").desc())
    ranked = keyed.withColumn("__ra", F.row_number().over(w_asc)).withColumn(
        "__rd", F.row_number().over(w_desc)
    )
    return ranked.groupBy(*group_cols, "bucket_ts").agg(
        F.max(F.when(F.col("__ra") == 1, F.col("__v"))).alias("open"),
        F.max("__v").alias("high"),
        F.min("__v").alias("low"),
        F.max(F.when(F.col("__rd") == 1, F.col("__v"))).alias("close"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("__v"), 9).alias("total_r"),
    )


def lag_features(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    window_rows: int = 3,
) -> DataFrame:
    """X62 — per-key time-ordered ML features: previous value, delta,
    gap seconds, and a trailing ``window_rows``-row mean.

    The feature-store primitive: every model over event streams wants
    "what happened just before". One shuffle on the key; every feature
    derives from the same per-key ordered window pass (lag + rolling
    frames share the sort). Ordering ties break by ``id_col`` —
    deterministic and oracle-replayable. The rolling mean is emitted at
    9 dp (window-sum order is engine-stable here — a fold over an
    explicit ROWS frame — but the division result is rounded to stay
    inside the engine's float-release convention).

    Output: input keys + ``(ts, value, prev_value, delta_r, gap_seconds,
    trail_mean_r)``; the first row per key has NULL prev/delta/gap.
    """
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")
    part = [F.col(c) for c in key_cols]
    order = [F.col(ts_col).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(*part).orderBy(*order)
    w_roll = w.rowsBetween(-(window_rows - 1), 0)
    prev_v = F.lag(F.col(value_col)).over(w)
    prev_t = F.lag(F.col(ts_col)).over(w)
    return events.select(
        *key_cols,
        F.col(ts_col),
        F.col(id_col),
        F.col(value_col),
        prev_v.alias("prev_value"),
        F.round(F.col(value_col) - prev_v, 9).alias("delta_r"),
        (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_t)).alias("gap_seconds"),
        F.round(F.avg(value_col).over(w_roll), 9).alias("trail_mean_r"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: Sequence[str] | None = None,
    bucket_us: int = 3_600_000_000,
    prefix: str = "r_",
) -> DataFrame:
    """X98 — interval overlap join via bucket fragmentation (range join).

    Emits one row per (left, right) interval pair that OVERLAPS:
    ``l.start < r.end AND r.start < l.end`` (half-open ``[start, end)``
    semantics — touching intervals do NOT overlap), optionally also
    matching equi keys ``on``. Spark has no range-join operator; the
    naive formulation is a cartesian (or key-only) join with the range
    predicate as a post-filter — a row-pair blowup that dies at scale.

    Spark-first design (the bin/fragment range-join technique warehouses
    use for DATE/interval overlap joins): each interval is fragmented
    map-side into the fixed-width time buckets it covers
    (``explode(sequence(floor(start/w), floor((end-1)/w)))``), both
    sides shuffle on ``(keys…, bucket)``, and the equi-join on the
    bucket bounds candidate pairs to co-bucketed intervals only. A pair
    sharing several buckets would match once per shared bucket; the
    emit-once rule ``bucket == floor(greatest(l.start, r.start)/w)``
    keeps exactly one copy WITHOUT a distinct shuffle (the first shared
    bucket is a deterministic function of the pair). The true overlap
    predicate filters inside the join stage.

    At 100 TB: candidate volume = sum over buckets of |L_b|·|R_b| —
    choose ``bucket_us`` near the median interval length so most
    intervals fragment into 1-2 buckets; a small fragmented side
    broadcasts (Catalyst decides), a big one rides SortMergeJoin on
    8-byte bucket keys. A hot bucket (everything overlapping one hour)
    is ordinary join skew — AQE skew-join splits it. Empty intervals
    (``end <= start``) cover no bucket and emit nothing.

    Output: all ``left`` columns + ``right`` columns prefixed with
    ``prefix`` (equi keys kept once, unprefixed), plus ``overlap_us``
    (exact integer microseconds of intersection).
    """
    if bucket_us <= 0:
        raise ValueError("bucket_us must be positive")
    keys = list(on or [])

    def fragment(df: DataFrame, start: str, end: str) -> DataFrame:
        s_us = F.unix_micros(F.col(start).cast("timestamp"))
        e_us = F.unix_micros(F.col(end).cast("timestamp"))
        frag = df.where(e_us > s_us).withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(s_us / F.lit(bucket_us)),
                    F.floor((e_us - F.lit(1)) / F.lit(bucket_us)),
                )
            ),
        )
        return frag

    lf = fragment(left, left_start, left_end).alias("l")
    rf = fragment(right, right_start, right_end).alias("r")

    cond = F.col("l.__bucket") == F.col("r.__bucket")
    for k in keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))

    l_s = F.unix_micros(F.col(f"l.{left_start}").cast("timestamp"))
    l_e = F.unix_micros(F.col(f"l.{left_end}").cast("timestamp"))
    r_s = F.unix_micros(F.col(f"r.{right_start}").cast("timestamp"))
    r_e = F.unix_micros(F.col(f"r.{right_end}").cast("timestamp"))
    overlap = (l_s < r_e) & (r_s < l_e)
    emit_once = F.col("l.__bucket") == F.floor(
        F.greatest(l_s, r_s) / F.lit(bucket_us)
    )

    joined = lf.join(rf, cond & overlap & emit_once, "inner")
    right_cols = [c for c in right.columns if c not in keys]
    return joined.select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}").alias(f"{prefix}{c}") for c in right_cols],
        (F.least(l_e, r_e) - F.greatest(l_s, r_s)).alias("overlap_us"),
    )


def interpolate_gapfill(
    events: DataFrame,
    group_cols: Sequence[str],
    ts_col: str = "ts",
    bucket: str = "1 hour",
    value_col: str = "value",
) -> DataFrame:
    """X119 — gap-filled series with LINEAR INTERPOLATION (and LOCF
    fallback at the tail): the hypertable ``interpolate()`` companion to
    X52's zero-fill. Zero-fill is right when absent buckets mean "no
    activity" (counts); interpolation is right when the series SAMPLES a
    continuous signal (a gauge, a price, a sensor) and a missing bucket
    means "not observed", not "zero".

    Per (group, bucket): observed mean where present; else
    ``prev + (next − prev)·(t − t_prev)/(t_next − t_prev)`` over the
    nearest observed neighbors (time terms in exact integer bucket
    indices); head gaps carry the next observation backward, tail gaps
    the previous forward (LOCF), both flagged by ``src``
    ('obs'/'interp'/'locf').

    Shape: ONE fact aggregation to the observed (group, bucket, mean)
    relation; the dense per-group spine comes from ``sequence()`` over
    each group's [min, max] bucket; neighbor lookup is two
    ``last/first(ignoreNulls)`` window passes over the buckets-sized
    relation — fact rows never rescan.

    Output: ``(*group_cols, bucket_ts, value_r, src)``.
    """
    from pyspark.sql import Window

    b = F.window(F.col(ts_col), bucket).start.alias("__b")
    obs = events.groupBy(*group_cols, b).agg(
        F.avg(F.col(value_col).cast("double")).alias("__v")
    )
    # per-group dense spine (sequence over the group's own span)
    span = obs.groupBy(*group_cols).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    secs = F.unix_timestamp(F.col("__hi").cast("timestamp")) - F.unix_timestamp(
        F.col("__lo").cast("timestamp")
    )
    # bucket width from the observed grid itself: sequence of timestamps
    spine = span.select(
        *group_cols,
        F.explode(
            F.sequence(
                F.col("__lo").cast("timestamp"),
                F.col("__hi").cast("timestamp"),
                F.expr(f"INTERVAL {bucket}"),
            )
        ).alias("__b"),
    )
    dense = spine.join(
        obs.withColumn("__b", F.col("__b").cast("timestamp")),
        [*group_cols, "__b"],
        "left",
    )
    part = [F.col(c) for c in group_cols]
    w_fwd = (
        Window.partitionBy(*part)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_bwd = (
        Window.partitionBy(*part)
        .orderBy(F.col("__b").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = F.unix_timestamp("__b")
    prev_v = F.last("__v", ignorenulls=True).over(w_fwd)
    prev_t = F.last(F.when(F.col("__v").isNotNull(), t), ignorenulls=True).over(w_fwd)
    next_v = F.last("__v", ignorenulls=True).over(w_bwd)
    next_t = F.last(F.when(F.col("__v").isNotNull(), t), ignorenulls=True).over(w_bwd)
    interp = prev_v + (next_v - prev_v) * (t - prev_t).cast("double") / (
        next_t - prev_t
    ).cast("double")
    value = (
        F.when(F.col("__v").isNotNull(), F.col("__v"))
        .when(prev_v.isNull(), next_v)          # head gap: backfill
        .when(next_v.isNull(), prev_v)          # tail gap: LOCF
        .otherwise(interp)
    )
    src = (
        F.when(F.col("__v").isNotNull(), F.lit("obs"))
        .when(prev_v.isNull() | next_v.isNull(), F.lit("locf"))
        .otherwise(F.lit("interp"))
    )
    return dense.select(
        *group_cols,
        F.col("__b").alias("bucket_ts"),
        F.round(value, 9).alias("value_r"),
        src.alias("src"),
    )
