"""Event-sequence analytics: conversion funnels and retention cohorts.

The reference has no event data at all (its single table is the static
Adult census extract, ``naive-suppresion.py:13-20``); these operators are
north-star extensions over the ``events`` stream table — the two queries
every product/analytics deployment of an engine like this runs daily, and
the two whose naive formulations (self-joins per step, per-user Python
loops) collapse first at 100 TB.

Scale design
------------
``funnel``: the classic formulation is k-1 self-joins of the event table
(step i joined against step i+1 with a time predicate) — k-1 shuffles of
the *fact* table and a pair blowup on hot users. Here instead:

1. a map-only filter keeps only the k step types (column-pruned scan —
   usually a small fraction of the event volume);
2. ONE shuffle groups the surviving ``(ts, step_rank)`` structs per user;
3. a JVM higher-order-function fold (``aggregate`` over the sorted
   struct array) walks each user's timeline once and records the
   earliest timestamp at which each funnel prefix completes — no Python,
   no second shuffle, whole-stage-codegen friendly;
4. one global aggregation reduces the per-user state to per-step
   conversion counts (k integers).

Per-user state is k timestamps; the transient sorted array is bounded by
the user's *step-type* event count. For adversarially hot users at 100 TB,
pre-cap with ``stratified_sample_n``-style per-(user, type) quotas — the
earliest events per type are the only ones that can ever advance the
funnel state for monotone step sequences.

``retention_cohorts``: events collapse to distinct (user, period) pairs
map-side BEFORE any join (the activity relation is ≤ users × periods, ≪
events); the cohort relation derives from that same slim relation, and
the final rollup counts pairs, never rescanning facts. Both shuffles are
over the slim activity relation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_user_states(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Per-user funnel progress: earliest completion time of each step prefix.

    A user "reaches" step i at the earliest event of ``steps[i]`` that is
    at-or-after the time they reached step i-1 (ordered funnel, ties
    resolved earlier-step-first — matching SQL ``ts >= t_prev`` chaining
    with ``MIN``). Output: ``(user_col, t1 .. tk)`` timestamps, NULL from
    the first step the user never reached.

    ``within_seconds`` (X107) bounds the WHOLE conversion to a window
    anchored at step 1: steps 2..k only count within ``t1 +
    within_seconds`` (the standard product-analytics "converted within
    72 h of signup" semantics). Single-entry model: the anchor is the
    user's EARLIEST step-1 event — no re-entry on a later one (disclosed;
    re-entry funnels need per-attempt sessionization first).
    """
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps!r}")
    k = len(steps)

    rank: Column = F.lit(None).cast("int")
    for i, s in reversed(list(enumerate(steps))):
        rank = F.when(F.col(type_col) == F.lit(s), F.lit(i)).otherwise(rank)

    relevant = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col), F.struct(F.col(ts_col).alias("ts"), rank.alias("rank")).alias("e")
    )
    per_user = relevant.groupBy(user_col).agg(
        F.sort_array(F.collect_list("e")).alias("es")
    )

    # Fold the time-sorted events through the k-slot state vector: slot i
    # takes the current event's ts iff the event is step i, slot i is
    # still empty, and slot i-1 is filled. Sorting guarantees ts >= the
    # prefix time, and (ts, rank) ordering makes equal-timestamp chains
    # (step i at the exact ts step i-1 completed) count, matching the
    # oracle's ts >= t_prev semantics.
    init = F.array_repeat(F.lit(None).cast("timestamp"), k)

    def in_window(acc, e):
        # later steps must land within the step-1-anchored window; the
        # anchor acc[1] is filled by the time any rank>0 slot can fill
        # (prefix condition), so the NULL guard only matters for rank 0
        if within_seconds is None:
            return F.lit(True)
        anchor = F.element_at(acc, 1)
        return (e["rank"] == F.lit(0)) | (
            anchor.isNotNull()
            & (
                F.unix_micros(e["ts"].cast("timestamp"))
                <= F.unix_micros(anchor.cast("timestamp"))
                + F.lit(int(within_seconds) * 1_000_000)
            )
        )

    state = F.aggregate(
        "es",
        init,
        lambda acc, e: F.transform(
            acc,
            lambda t, i: F.when(
                (e["rank"] == i)
                & t.isNull()
                & ((e["rank"] == F.lit(0)) | F.element_at(acc, e["rank"]).isNotNull())
                & in_window(acc, e),
                e["ts"],
            ).otherwise(t),
        ),
    )
    cols = [F.element_at(state, i + 1).alias(f"t{i + 1}") for i in range(k)]
    return per_user.select(F.col(user_col), *cols)


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered-funnel conversion counts: users reaching each step prefix.

    Output: ``(step, event_type, users)`` — 1-based step index, the step's
    event type, and how many users completed steps 1..i in order. Counts
    are exact integers (oracle-hashable); ``users`` is non-increasing in
    ``step`` by construction. ``within_seconds`` bounds conversion to a
    step-1-anchored window (see :func:`funnel_user_states`).
    """
    states = funnel_user_states(events, steps, user_col, ts_col, type_col, within_seconds)
    k = len(steps)
    wide = states.agg(
        *[
            F.sum(F.when(F.col(f"t{i + 1}").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"u{i + 1}")
            for i in range(k)
        ]
    )
    stack = ", ".join(f"{i + 1}, '{steps[i]}', u{i + 1}" for i in range(k))
    return wide.selectExpr(
        f"stack({k}, {stack}) AS (step, event_type, users)"
    ).select(F.col("step").cast("int"), "event_type", "users")


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users active N periods after first activity.

    cohort = the user's first active period (``date_trunc`` boundary);
    one output row per (cohort, period_offset) with the count of cohort
    users active in that period. Offsets are exact integers; the cohort
    boundary is released as an ISO date *string* so both engines hash the
    same canonical value (DATE physical types differ across engines).
    """
    days = {"week": 7, "day": 1}
    if period not in days:
        raise ValueError(f"period must be one of {sorted(days)}, got {period!r}")
    d = days[period]

    act = (
        events.select(
            F.col(user_col),
            F.to_date(F.date_trunc(period, F.col(ts_col))).alias("period"),
        )
        .distinct()
    )
    first = act.groupBy(user_col).agg(F.min("period").alias("cohort"))
    return (
        act.join(first, user_col)
        .groupBy(
            F.col("cohort").cast("string").alias("cohort"),
            (F.datediff("period", "cohort") / d).cast("int").alias("period_offset"),
        )
        # act is distinct on (user, period) and offset is injective in
        # period for a fixed user, so COUNT(*) == COUNT(DISTINCT user) —
        # the cheap partial-aggregating form.
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


def last_touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    tolerance: str | None = None,
) -> DataFrame:
    """X78 — last-touch conversion attribution: each conversion event is
    credited to the user's latest at-or-before touch event (optionally
    within ``tolerance``), then rolled up to credited conversions per
    touch type — marketing/product analytics' default attribution model,
    built by COMPOSING the engine's as-of join (X16) rather than a
    bespoke pair join.

    Physical shape is the as-of join's: conversions and touches are two
    filtered projections of the event scan, resolved with ONE shuffle on
    the user key (merge-scan union + window), then a kilobyte rollup.
    Conversions with no prior touch are reported under touch type
    '(none)' so credit always sums to the conversion count.

    Output: ``(touch_type, conversions)``.
    """
    from dbms_data_anonymity_differential_privacy_spark.operators.temporal import asof_join

    conv = events.filter(F.col(type_col) == conversion_type).select(
        user_col, ts_col, id_col
    )
    if touch_types is None:
        touches = events.filter(F.col(type_col) != conversion_type)
    else:
        touches = events.filter(F.col(type_col).isin(list(touch_types)))
    touches = touches.select(user_col, ts_col, F.col(type_col).alias("touch"))
    attributed = asof_join(
        conv,
        touches,
        on=[user_col],
        left_ts=ts_col,
        payload=["touch"],
        prefix="prior_",
        tolerance=tolerance,
    )
    return (
        attributed.groupBy(
            F.coalesce(F.col("prior_touch"), F.lit("(none)")).alias("touch_type")
        )
        .agg(F.count(F.lit(1)).alias("conversions"))
    )


def linear_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """X90 — linear multi-touch attribution: each conversion's unit of
    credit is split EQUALLY over all of the user's at-or-before touches
    (last-touch's x78 sibling — the other standard attribution model;
    the two bracket the single-touch/all-touch spectrum). Conversions
    with no prior touch credit '(none)' in full, so credit always sums
    to the conversion count.

    Exactness: per-pair credit is 1/n — float sums of those across
    millions of pairs in nondeterministic combine order would drift
    past the rounding band, so the rollup is decomposed exactly:
    integer pair counts per (touch_type, n) first (one exact
    aggregation), then ``Σ cnt/n`` folded LEFT-TO-RIGHT over the
    n-sorted tiny relation (``aggregate(sort_array(collect_list(...)))``
    ≡ DuckDB ``list_reduce(list(... ORDER BY n))``) — deterministic on
    both engines, bit-for-bit.

    Physical shape: the conversion-touch pairing is the X17 interval
    idiom (SortMergeJoin on the user key, range predicate in-stage);
    pair volume is Σ_user conv_u·touch_u — bounded per user, the honest
    cost of an all-touch model. Everything after collapses to the
    (type, n) relation.

    Output: ``(touch_type, n_pairs, credit_r)``.
    """
    from pyspark.sql import Window

    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("__u"), F.col(ts_col).alias("__cts"),
        F.col(id_col).alias("__cid"),
    )
    if touch_types is None:
        touches = events.filter(F.col(type_col) != conversion_type)
    else:
        touches = events.filter(F.col(type_col).isin(list(touch_types)))
    touches = touches.select(
        F.col(user_col).alias("__tu"), F.col(ts_col).alias("__tts"),
        F.col(type_col).alias("__touch"),
    )
    pairs = conv.join(
        touches,
        (F.col("__u") == F.col("__tu")) & (F.col("__tts") <= F.col("__cts")),
        "left",
    )
    w = Window.partitionBy("__cid")
    n_touch = F.count("__touch").over(w)
    staged = pairs.select(
        F.coalesce(F.col("__touch"), F.lit("(none)")).alias("touch_type"),
        F.when(F.col("__touch").isNull(), F.lit(1)).otherwise(n_touch).alias("__n"),
    )
    by_n = staged.groupBy("touch_type", "__n").agg(F.count(F.lit(1)).alias("__cnt"))
    folded = by_n.groupBy("touch_type").agg(
        F.sum("__cnt").cast("long").alias("n_pairs"),
        F.round(
            F.aggregate(
                F.transform(
                    F.sort_array(F.collect_list(F.struct(F.col("__n"), F.col("__cnt")))),
                    lambda x: x["__cnt"].cast("double") / x["__n"].cast("double"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            9,
        ).alias("credit_r"),
    )
    return folded


def user_growth(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "day",
) -> DataFrame:
    """X92 — new-user growth curve: per period, how many users appear for
    the FIRST time, plus the cumulative unique-user count — the
    DAU/"total users over time" pair every growth dashboard opens with.

    Exact cumulative distinct WITHOUT a distinct-per-prefix rescan: a
    user contributes to exactly one period (their first), so the
    cumulative unique count is a plain cumsum of first-appearance counts
    — one distinct-collapse of (user, first-period) and windows over the
    periods-sized relation (the global-order window runs on ~hundreds of
    rows; the fact table contributes one aggregation). Periods are
    released as ISO strings (the x55 canonical-date convention).

    Output: ``(period, new_users, cum_users)`` ordered by period.
    """
    days = {"day": "day", "week": "week"}
    if period not in days:
        raise ValueError(f"period must be one of {sorted(days)}, got {period!r}")
    from pyspark.sql import Window

    first = events.groupBy(user_col).agg(
        F.min(F.to_date(F.date_trunc(period, F.col(ts_col)))).alias("__p")
    )
    daily = first.groupBy(F.col("__p").cast("string").alias("period")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("period").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "period",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    ).orderBy("period")


def funnel_step_latency(
    events: DataFrame,
    steps: Sequence[str],
    ps: Sequence[float] = (0.5, 0.9),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """X94 — time-to-convert between consecutive funnel steps: for each
    (step i → step i+1) pair, the per-user latency distribution (exact
    percentiles) over users who completed the pair — the "WHERE does the
    funnel stall and for HOW LONG" companion to x54's conversion counts.

    Latencies are integer MICROseconds (``unix_micros`` ≡ DuckDB
    ``epoch_us`` — second-truncating ``unix_timestamp`` would shear
    sub-second funnels), so the type-7 percentile interpolation is the
    x22 bit-exact arithmetic. Built on :func:`funnel_user_states` — one
    user-key aggregation; the per-pair rollups run on the users-sized
    state relation.

    Output: one row per consecutive pair,
    ``(step_from, step_to, n_users, p<P>_us ...)``.
    """
    if len(steps) < 2:
        raise ValueError("step latency needs at least two steps")
    states = funnel_user_states(events, steps, user_col, ts_col, type_col).persist()

    def name(p: float) -> str:
        s = f"{p * 100:g}".replace(".", "_")
        return f"p{s}_us"

    parts = []
    for i in range(len(steps) - 1):
        d = F.unix_micros(F.col(f"t{i + 2}")) - F.unix_micros(F.col(f"t{i + 1}"))
        pair = (
            states.filter(F.col(f"t{i + 2}").isNotNull())
            .select(d.alias("__d"))
            .agg(
                F.count(F.lit(1)).alias("n_users"),
                *[F.expr(f"percentile(__d, {p!r})").alias(name(p)) for p in ps],
            )
            .select(
                F.lit(steps[i]).alias("step_from"),
                F.lit(steps[i + 1]).alias("step_to"),
                "n_users",
                *[name(p) for p in ps],
            )
        )
        parts.append(pair)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def interevent_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """X120 — per-user inter-event time statistics and burstiness: mean
    gap, gap dispersion, and the coefficient of variation CV = std/mean
    — the standard burstiness discriminator (CV ≈ 1 Poisson, CV < 1
    regular/bot-like periodic, CV > 1 bursty human sessions; Goh &
    Barabási 2008).

    Exactness: gaps are integer MICROseconds off one per-user ordered
    window pass (ties broken by ``id_col``); mean and variance derive
    from integer Σg and Σg² (the x87 integer-window-sum convention —
    sample variance ``(n·Σg² − (Σg)²)/(n·(n−1))``). The released mean
    is the INTEGER half-up division ``(2Σg + n) DIV 2n`` — a 6-dp
    double round at µs-of-a-month magnitude (~1e12) is NOT cross-engine
    bit-stable (measured 7.6e-6 drift: the rounded decimal isn't
    representable, and engines re-quantize differently); integer
    arithmetic is. Σg² accumulates in DECIMAL (the x109 convention —
    int64 overflows on squared µs gaps); cv is O(1) so its 6-dp round
    is safe.

    Output: ``(user_col, n_events, n_gaps, mean_gap_us, cv_r)``;
    users with < 2 events release NULL stats, < 3 release NULL cv.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gaps = events.select(
        F.col(user_col),
        (t - F.lag(t).over(w)).alias("__g"),
    )
    agg = gaps.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("__g").alias("n_gaps"),
        F.sum("__g").alias("__sg"),
        F.sum(
            F.col("__g").cast("decimal(19,0)") * F.col("__g").cast("decimal(19,0)")
        ).alias("__sgg"),
    )
    n = F.col("n_gaps")
    mean = F.col("__sg").cast("double") / n.cast("double")
    var = (
        (n.cast("decimal(30,0)") * F.col("__sgg")
         - (F.col("__sg").cast("decimal(30,0)") * F.col("__sg").cast("decimal(30,0)")))
        .cast("double")
        / (n * (n - 1)).cast("double")
    )
    cv = F.when((n >= 2) & (F.col("__sg") > 0), F.sqrt(var) / mean)
    mean_int = F.expr("(2 * __sg + n_gaps) DIV (2 * n_gaps)")
    return agg.select(
        user_col,
        "n_events",
        "n_gaps",
        F.when(n >= 1, mean_int).alias("mean_gap_us"),
        F.round(cv, 6).alias("cv_r"),
    )


def rolling_active_users(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """X121 — rolling distinct active users (the WAU/MAU curve): for
    every day, how many distinct users were active in the trailing
    ``window_days`` window. The north-star engagement metric — and a
    COUNT DISTINCT over a sliding window, which no window function
    computes (distinct doesn't decompose over frames).

    Spark-first shape: fact rows collapse ONCE to the distinct
    (user, day) activity relation; each activity day then CONTRIBUTES
    map-side to the ``window_days`` report days it falls inside
    (``explode(sequence(day, day+W-1))``), and a second distinct
    aggregation on (report_day, user) de-duplicates multi-active users
    before the final count. Total volume = W × the activity relation —
    linear, bounded by the window length, never a per-day rescan.
    Report days are trimmed to the observed [min+0, max] day span (the
    leading ramp-up days are real partial windows and are RELEASED —
    callers drop the first W−1 days if they want full windows only).

    Output: ``(day, active_users)`` with ``day`` released as an ISO
    date string (the x55 cross-engine date convention).
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    act = (
        events.select(
            F.col(user_col).alias("__u"),
            F.to_date(F.date_trunc("day", F.col(ts_col))).alias("__d"),
        )
        .distinct()
    )
    span = act.agg(F.max("__d").alias("__hi"))
    contrib = act.select(
        "__u",
        F.explode(
            F.sequence(F.col("__d"), F.date_add(F.col("__d"), window_days - 1))
        ).alias("day"),
    )
    pairs = contrib.distinct()
    counts = pairs.groupBy("day").agg(F.count(F.lit(1)).alias("active_users"))
    return (
        counts.join(F.broadcast(span), counts["day"] <= F.col("__hi"))
        .select(F.col("day").cast("string").alias("day"), "active_users")
    )


def time_decay_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] | None = None,
    half_life_hours: int = 24,
    max_age_hours: int = 720,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """X124 — time-decay multi-touch attribution: each conversion's unit
    of credit splits over its prior touches proportionally to
    ``0.5^(age/half_life)`` — the third standard model bracketing x78
    (last-touch) and x90 (linear): recent touches matter more, old ones
    never quite vanish.

    Exactness (this family's hardest float hazard — x90's docstring):
    decayed weights are INTEGER micro-units from a driver-built literal
    table ``W[h] = round(1e6 · 0.5^(h/half_life))`` over whole-hour ages
    (0..max_age — ages beyond it weigh 0 and drop), so per-conversion
    weight sums are exact int64 and each touch's credit is the integer
    division ``(w · 1e6) DIV Σw`` — credit in parts-per-million, summing
    to ≤ 1e6 per conversion (the DIV remainder, < n_touches ppm, is the
    disclosed quantization; no float ever aggregates). The engine never
    calls pow(): JVM ``Math.pow`` and C libm disagree in the last ulp,
    the x86/x23 literal-table rationale.

    Shape: the X17 user-keyed SortMergeJoin pairs conversions with
    prior touches (range predicate in-stage); the decay table (721
    rows) broadcasts; everything downstream is exact integer
    aggregation. Conversions with no in-window touch credit '(none)'
    the full 1e6.

    Output: ``(touch_type, n_pairs, credit_ppm)`` — BIGINT ppm credits.
    """
    from pyspark.sql import Window

    if half_life_hours < 1 or max_age_hours < 1:
        raise ValueError("half_life_hours and max_age_hours must be >= 1")
    spark = events.sparkSession
    decay = spark.createDataFrame(
        [(h, round(1_000_000 * 0.5 ** (h / half_life_hours))) for h in range(max_age_hours + 1)],
        "__age_h long, __w long",
    )
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("__u"), F.col(ts_col).alias("__cts"),
        F.col(id_col).alias("__cid"),
    )
    if touch_types is None:
        touches = events.filter(F.col(type_col) != conversion_type)
    else:
        touches = events.filter(F.col(type_col).isin(list(touch_types)))
    touches = touches.select(
        F.col(user_col).alias("__tu"), F.col(ts_col).alias("__tts"),
        F.col(type_col).alias("__touch"),
    )
    age_h = F.floor(
        (
            F.unix_micros(F.col("__cts").cast("timestamp"))
            - F.unix_micros(F.col("__tts").cast("timestamp"))
        )
        / F.lit(3_600_000_000)
    )
    pairs = (
        conv.join(
            touches,
            (F.col("__u") == F.col("__tu")) & (F.col("__tts") <= F.col("__cts")),
            "left",
        )
        .withColumn("__age_h", age_h)
        .join(F.broadcast(decay), "__age_h", "left")
        # beyond max_age (or no touch at all): weight NULL -> handled below
    )
    w = Window.partitionBy("__cid")
    sum_w = F.sum("__w").over(w)
    staged = pairs.select(
        F.col("__cid"),
        F.col("__touch"),
        F.col("__w"),
        sum_w.alias("__sw"),
    )
    has_weight = F.col("__sw").isNotNull() & (F.col("__sw") > 0)
    # weighted touches of credited conversions; a conversion's over-age
    # (weight-NULL) rows and weight-0 rows carry no credit and drop —
    # they must NOT also feed '(none)', or credit would double-count
    touch_rows = staged.where(has_weight & F.col("__w").isNotNull() & (F.col("__w") > 0)).select(
        F.col("__touch").alias("touch_type"),
        F.lit(1).alias("__n"),
        F.expr("(__w * 1000000) DIV __sw").alias("__c"),
    )
    # '(none)': conversions with NO positive-weight touch at all (sum of
    # weights NULL — no touches/all over-age — or 0), one full credit each
    none_rows = (
        staged.where(~has_weight)
        .select("__cid")
        .distinct()
        .select(
            F.lit("(none)").alias("touch_type"),
            F.lit(1).alias("__n"),
            F.lit(1_000_000).alias("__c"),
        )
    )
    return (
        touch_rows.unionByName(none_rows)
        .groupBy("touch_type")
        .agg(
            F.sum("__n").cast("long").alias("n_pairs"),
            F.sum("__c").cast("long").alias("credit_ppm"),
        )
    )


def rfm_segments(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    n_tiles: int = 5,
) -> DataFrame:
    """RFM segmentation (Hughes 1994 — the classic CRM cut): per user,
    Recency (days since last event, against the corpus-wide anchor =
    global max timestamp), Frequency (event count), Monetary (summed
    value); each quintiled with ``ntile`` under a deterministic total
    order (better metric first, then user id), segment code =
    ``r*100 + f*10 + m`` with 5 = best.

    Output: per-segment rollup ``(segment, n_users, avg_recency_days_r,
    avg_frequency_r, avg_monetary_r)`` — the release shape a CRM
    consumes; at most ``n_tiles^3`` rows.

    Scale shape: one user-keyed aggregation collapses the fact table;
    three ntile windows share the per-user relation; the anchor is a
    single-row broadcast. (The ntile note from decile_lift applies.)
    """
    anchor = events.agg(F.max(ts_col).alias("__maxts"))
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        F.max(ts_col).alias("__last"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.coalesce(F.sum(value_col), F.lit(0.0)).alias("money"),
    )
    staged = per_user.join(F.broadcast(anchor)).withColumn(
        # microsecond epochs (unix_timestamp would truncate to seconds
        # and drift from the oracle's epoch_us by up to ~1s/86400)
        "rec_days",
        (F.unix_micros(F.col("__maxts").cast("timestamp"))
         - F.unix_micros(F.col("__last").cast("timestamp")))
        / F.lit(86400000000.0),
    )
    from pyspark.sql import Window

    # 5 = best for all three codes: recency orders DESC (largest gap ->
    # tile 1), frequency/monetary ASC (largest -> tile 5)
    w_r = Window.orderBy(F.desc("rec_days"), F.col("u"))
    w_f = Window.orderBy(F.asc("freq"), F.col("u"))
    w_m = Window.orderBy(F.asc("money"), F.col("u"))
    coded = (
        staged.withColumn("r", F.ntile(n_tiles).over(w_r))
        .withColumn("f", F.ntile(n_tiles).over(w_f))
        .withColumn("m", F.ntile(n_tiles).over(w_m))
        .withColumn(
            "segment", (F.col("r") * 100 + F.col("f") * 10 + F.col("m")).cast("int")
        )
    )
    return (
        coded.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.round(F.avg("rec_days"), 9).alias("avg_recency_days_r"),
            F.round(F.avg("freq"), 9).alias("avg_frequency_r"),
            F.round(F.avg("money"), 9).alias("avg_monetary_r"),
        )
        .orderBy("segment")
    )


def popularity_hitk(
    orders: DataFrame,
    lineitem: DataFrame,
    split_date: str,
    k: int = 20,
) -> DataFrame:
    """Hit-rate@k of the popularity baseline — the recommender-eval
    floor every paper reports: train on purchases before ``split_date``,
    recommend the global top-k items, a test user scores a hit if any of
    their post-split purchases is in that list.

    Output (single row): ``(k, n_test_users, n_hit, hit_rate_r)``.

    Scale shape: the item-popularity aggregation partial-combines on
    item keys; the top-k list is TakeOrdered then a k-row broadcast; the
    test-side hit test is one map-side semi-join + user-keyed distinct.
    Deterministic: ties at the k boundary break by item id.
    """
    split = F.lit(split_date).cast("timestamp")
    purchases = orders.join(
        lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
    ).select(
        F.col("o_custkey").alias("u"),
        F.col("l_partkey").alias("item"),
        F.col("o_orderdate").alias("d"),
    )
    topk = (
        purchases.filter(F.col("d") < split)
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "item")
        .limit(int(k))
        .select("item")
    )
    test = purchases.filter(F.col("d") >= split)
    test_users = test.select("u").distinct()
    hits = (
        test.join(F.broadcast(topk), on="item", how="left_semi")
        .select("u")
        .distinct()
    )
    n_t = test_users.agg(F.count(F.lit(1)).cast("long").alias("n_test_users"))
    n_h = hits.agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    return (
        n_t.join(F.broadcast(n_h))
        .select(
            F.lit(int(k)).alias("k"),
            "n_test_users",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_test_users"), 9).alias("hit_rate_r"),
        )
    )


def cohort_ltv(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    event_col: str = "event_type",
    value_event: str = "purchase",
) -> DataFrame:
    """X146 — cohort lifetime-value curve: for each weekly signup cohort
    (first activity week, x55's cohort definition), cumulative revenue
    per cohort user by cohort age — the curve LTV forecasting, payback
    windows and mixture-of-cohorts revenue accounting read from.

    Ages are DENSE per cohort (0..weeks-to-the-corpus-horizon, quiet
    weeks release 0.0) so every curve is complete and directly
    comparable. The cumulative sum runs as an ORDERED window over the
    (cohort, age) relation — float addition order pinned by the frame.
    Per-cell revenue is a TWO-LEVEL sorted-fold sum (the x173/noise-
    moments discipline, nested): a plain ``SUM(double)`` reduces in
    shuffle order, and at sf0.1 the ~5k-addend cells accumulate enough
    last-bit drift to flip the 9-dp rounding band vs the oracle
    (measured: 1.0e-9 on a ~2.3e5 magnitude cell). Level 1 folds each
    USER's purchases within the cell (list bounded by one user's weekly
    purchase count — tiny at any corpus scale); level 2 folds the
    per-user sums (list bounded by users active in that cohort-week).
    Both levels sort before folding, so the addition order is pinned on
    both engines and the release is hash-exact, while no aggregation
    buffer ever holds a whole cohort-week's raw purchase rows — the
    single-level formulation's 100×-scale failure mode.
    ``ltv = cum_rev / cohort_users`` is one IEEE division.

    Shape: one distinct (user, week) collapse + one revenue aggregation
    over the fact table; cohorts join broadcast; the dense grid and
    windows run on the (cohorts × ages) relation — kilobytes.

    Output: ``(cohort, age_weeks, cohort_users, rev_r, cum_rev_r,
    ltv_r)``.
    """
    from pyspark.sql import Window

    act = (
        events.select(
            F.col(user_col),
            F.to_date(F.date_trunc("week", F.col(ts_col))).alias("period"),
        )
        .distinct()
    )
    first = act.groupBy(user_col).agg(F.min("period").alias("cohort"))
    sizes = first.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_users"))

    rev = (
        events.filter(F.col(event_col) == value_event)
        .select(
            F.col(user_col),
            F.to_date(F.date_trunc("week", F.col(ts_col))).alias("period"),
            F.col(value_col),
        )
        .join(first, user_col)
        .groupBy(
            "cohort",
            (F.datediff("period", "cohort") / 7).cast("int").alias("age_weeks"),
            F.col(user_col),
        )
        .agg(
            F.expr(
                f"aggregate(array_sort(collect_list({value_col})), "
                "CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
            ).alias("__urev")
        )
        .groupBy("cohort", "age_weeks")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(__urev)), "
                "CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
            ).alias("rev")
        )
    )

    horizon = act.agg(F.max("period").alias("hi"))
    grid = (
        sizes.crossJoin(F.broadcast(horizon))
        .select(
            "cohort",
            "cohort_users",
            F.explode(
                F.sequence(
                    F.lit(0), (F.datediff("hi", "cohort") / 7).cast("int")
                )
            ).alias("age_weeks"),
        )
    )
    dense = grid.join(rev, ["cohort", "age_weeks"], "left").select(
        "cohort",
        "age_weeks",
        "cohort_users",
        F.coalesce("rev", F.lit(0.0)).alias("rev"),
    )
    w = Window.partitionBy("cohort").orderBy("age_weeks").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = F.sum("rev").over(w)
    return dense.select(
        F.col("cohort").cast("string").alias("cohort"),
        "age_weeks",
        "cohort_users",
        F.round("rev", 9).alias("rev_r"),
        F.round(cum, 9).alias("cum_rev_r"),
        F.round(cum / F.col("cohort_users").cast("double"), 9).alias("ltv_r"),
    )


def markov_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    n_iter: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Markov-chain attribution by REMOVAL EFFECT (Anderl et al. 2016)
    — the data-driven successor of the x78/x90/x124 rule-based models:
    build the first-order journey chain (START → touches → CONV/NULL),
    then credit each channel by how much the conversion probability
    drops when the channel is removed (transitions into it redirected
    to NULL).

    Journey: each user's events ordered by ``(ts, id)``, truncated at
    the FIRST conversion (which becomes the absorbing CONV state);
    users who never convert end in NULL. Transition probabilities are
    UNROUNDED divisions of exact int64 counts. Absorption probabilities
    use ``n_iter`` fixed Jacobi steps from x = 0 (the x188 discipline:
    a fixed unrolled computation both engines replay identically;
    accumulation order pinned by sorted state order driver-side — the
    oracle's SQL SUM differs only at the last bit; the release rounds at
    6 dp with HALF-AWAY semantics (util.sql_round) because the values
    are driver-computed — Python's half-even round would diverge from
    SQL ROUND on decimal-exact boundaries).

    Driver-side iteration is the deliberate scale choice (the
    x188/kcenter idiom): the chain lives on the event-TYPE vocabulary
    (tens of states), while the journey construction — the corpus-scale
    work — is one user-keyed window pass plus one count aggregation.

    Output: one row per channel, ``(channel, p_conv_base_r,
    p_conv_removed_r, removal_effect_r, share_r)`` (6 dp); share is the
    removal effect normalized over channels (NULL when the total
    effect is 0).
    """
    from pyspark.sql import Window

    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    e2 = events.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
        F.col(type_col).alias("__ty"),
    ).withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy("__u").orderBy("__ts", "__id")
        ),
    )
    per_u = e2.groupBy("__u").agg(
        F.min(F.when(F.col("__ty") == conversion_type, F.col("__rn"))).alias(
            "__crn"
        ),
        F.max("__rn").alias("__mrn"),
    )
    kept = e2.join(per_u, on="__u").filter(
        F.col("__crn").isNull() | (F.col("__rn") <= F.col("__crn"))
    )
    st = F.when(F.col("__ty") == conversion_type, F.lit("CONV")).otherwise(
        F.col("__ty")
    )
    seq = kept.select(
        "__u", "__rn", st.alias("__st"), "__crn", "__mrn"
    )
    wq = Window.partitionBy("__u").orderBy("__rn")
    steps = seq.select(
        F.coalesce(F.lag("__st").over(wq), F.lit("START")).alias("f"),
        F.col("__st").alias("t"),
    )
    terminal = seq.filter(
        F.col("__crn").isNull() & (F.col("__rn") == F.col("__mrn"))
    ).select(F.col("__st").alias("f"), F.lit("NULL").alias("t"))
    counts = (
        steps.unionByName(terminal)
        .groupBy("f", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    )
    c: dict[tuple[str, str], int] = {(r.f, r.t): r.c for r in counts}
    row_tot: dict[str, int] = {}
    for (f, _t), n in c.items():
        row_tot[f] = row_tot.get(f, 0) + n
    prob: dict[tuple[str, str], float] = {
        (f, t): n / row_tot[f] for (f, t), n in c.items()
    }
    channels = sorted(
        s for s in {x for pair in c for x in pair}
        if s not in ("START", "CONV", "NULL")
    )

    def absorb(p: dict[tuple[str, str], float]) -> float:
        trans = sorted({f for (f, _t) in p})
        x = {s: 0.0 for s in trans}
        for _ in range(n_iter):
            nxt = {}
            for s in trans:  # sorted order pins accumulation
                acc = p.get((s, "CONV"), 0.0)
                for t in trans:
                    pt = p.get((s, t))
                    if pt is not None and x[t] != 0.0:
                        acc += pt * x[t]
                nxt[s] = acc
            x = nxt
        return x.get("START", 0.0)

    p_base = absorb(prob)
    rows = []
    re_sum = 0.0
    removed: dict[str, float] = {}
    for ch in channels:
        p_rm: dict[tuple[str, str], float] = {}
        # sorted iteration pins the float-merge order (prob's dict order
        # follows the nondeterministic collect order)
        for (f, t), v in sorted(prob.items()):
            if f == ch:
                continue  # node removed: its outgoing edges are unreachable
            t2 = "NULL" if t == ch else t
            p_rm[(f, t2)] = p_rm.get((f, t2), 0.0) + v
        removed[ch] = absorb(p_rm)
        re = (p_base - removed[ch]) / p_base if p_base > 0 else 0.0
        re_sum += re
        rows.append((ch, removed[ch], re))
    from dbms_data_anonymity_differential_privacy_spark.operators.util import sql_round

    spark = events.sparkSession
    return spark.createDataFrame(
        [
            (
                ch,
                sql_round(p_base, 6),
                sql_round(p_rm_v, 6),
                sql_round(re, 6),
                sql_round(re / re_sum, 6) if re_sum > 0 else None,
            )
            for ch, p_rm_v, re in rows
        ],
        "channel STRING, p_conv_base_r DOUBLE, p_conv_removed_r DOUBLE, "
        "removal_effect_r DOUBLE, share_r DOUBLE",
    )
