"""As-of join and keyed interval join (operators/temporal.py).

The oracle gate (x16/x17) checks the big-data path against DuckDB's
literal LATERAL semantics; these tests pin the edge semantics the oracle
query doesn't exercise: inclusive-vs-strict boundary, tolerance aging,
deterministic tie-breaking, no-match NULLs, and empty-interval retention.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.temporal import (
    asof_join,
    events_per_interval,
    interval_join_by_key,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),
            (2, "u1", _ts("2024-01-01 12:00:00")),
            (3, "u2", _ts("2024-01-01 09:00:00")),  # no prior right row
            (4, "u3", _ts("2024-01-01 10:00:00")),  # exactly-equal ts match
        ],
        "probe_id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:30:00"), 10.0),
            ("u1", _ts("2024-01-01 11:00:00"), 20.0),
            ("u2", _ts("2024-01-01 09:30:00"), 99.0),  # after u2's probe
            ("u3", _ts("2024-01-01 10:00:00"), 7.0),
        ],
        "user string, ts timestamp, value double",
    )
    return left, right


def test_asof_basic_latest_prior(spark):
    left, right = _frames(spark)
    out = {
        r.probe_id: (r.prior_value, r.prior_ts)
        for r in asof_join(left, right, on=["user"]).collect()
    }
    assert out[1] == (10.0, _ts("2024-01-01 09:30:00"))
    assert out[2] == (20.0, _ts("2024-01-01 11:00:00"))
    assert out[3] == (None, None)  # nothing at-or-before
    assert out[4] == (7.0, _ts("2024-01-01 10:00:00"))  # inclusive boundary


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _frames(spark)
    out = {
        r.probe_id: r.prior_value
        for r in asof_join(left, right, on=["user"], strict=True).collect()
    }
    assert out[4] is None  # equal-instant row no longer eligible
    assert out[1] == 10.0  # strictly-earlier matches unaffected


def test_asof_tolerance_exact_semantics(spark):
    left, right = _frames(spark)
    rows = asof_join(left, right, on=["user"], tolerance="'45' MINUTE").collect()
    by_id = {r.probe_id: r for r in rows}
    assert by_id[1].prior_value == 10.0  # 30 min old
    assert by_id[2].prior_value is None  # 60 min old: aged out, NOT fallback
    assert by_id[2].prior_ts is None
    assert len(rows) == 4  # left rows always kept


def test_asof_deterministic_tie_break(spark):
    """Two right rows at the identical instant: the greater payload tuple
    wins, independent of partitioning."""
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 10:00:00"))], "probe_id long, user string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01 09:00:00"), 5.0),
            ("u", _ts("2024-01-01 09:00:00"), 8.0),
        ],
        "user string, ts timestamp, value double",
    )
    for n_part in (1, 7):
        out = asof_join(left, right.repartition(n_part), on=["user"]).collect()
        assert out[0].prior_value == 8.0


def test_interval_join_containment_and_left_retention(spark):
    intervals = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"), 100),
            ("u1", _ts("2024-01-01 12:00:00"), _ts("2024-01-01 13:00:00"), 101),
            ("u2", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"), 102),
        ],
        "user string, session_start timestamp, session_end timestamp, iv_id long",
    )
    events = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 10:30:00")),
            ("u1", _ts("2024-01-01 11:00:00")),  # end-exclusive: outside iv 100
            ("u1", _ts("2024-01-01 12:00:00")),  # start-inclusive: inside iv 101
            ("u2", _ts("2024-01-01 09:59:59")),
        ],
        "user string, ts timestamp",
    )
    counts = {
        r.iv_id: r.n_matched
        for r in events_per_interval(intervals, events, ["user"]).collect()
    }
    assert counts == {100: 1, 101: 1, 102: 0}  # empty interval retained

    inner = interval_join_by_key(intervals, events, ["user"], how="inner")
    assert inner.count() == 2
    assert set(inner.columns) == {"user", "session_start", "session_end", "iv_id", "ev_ts"}


def test_contamination_check_counts(spark):
    from dbms_data_anonymity_differential_privacy_spark.operators.dedup import contamination_check

    corpus = spark.createDataFrame(
        [
            (1, "a b c d e"),        # trigrams: abc bcd cde
            (2, "x y z w"),          # trigrams: xyz yzw — disjoint from bench
            (3, "a"),                # too short: zero trigrams
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a b c d q")],  # trigrams: abc bcd cdq
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in contamination_check(corpus, bench, n=3).collect()}
    assert rows[1].n_ngrams == 3 and rows[1].n_hits == 2
    assert abs(rows[1].contaminated_frac - 2 / 3) < 1e-9
    assert rows[2].n_hits == 0 and rows[2].contaminated_frac == 0.0
    assert rows[3].n_ngrams == 0 and rows[3].contaminated_frac == 0.0


def test_vocab_stats_order_and_df(spark):
    from dbms_data_anonymity_differential_privacy_spark.operators.text import vocab_stats

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "  ")],
        "doc_id long, text string",
    )
    rows = vocab_stats(docs, top_k=10).collect()
    assert [(r.token, r.term_freq, r.doc_freq) for r in rows] == [
        ("apple", 2, 1),
        ("banana", 2, 2),
        ("cherry", 1, 1),
    ]


# ---------------------------------------------------------------------------
# X98 interval overlap join (bucket-fragmentation range join). The oracle
# gate (x98_session_impact) checks the composed rollup; these pin the pair
# semantics the rollup hides: half-open boundaries, emit-once dedup across
# shared buckets, empty-interval exclusion, keyed matching, and the plan.
# ---------------------------------------------------------------------------

def _iv(spark, rows, start="s", end="e"):
    return spark.createDataFrame(
        [(i, _ts(a), _ts(b)) for i, (a, b) in enumerate(rows)],
        f"id long, {start} timestamp, {end} timestamp",
    )


def _brute_overlap(a_rows, b_rows):
    out = set()
    for i, (as_, ae) in enumerate(a_rows):
        for j, (bs, be) in enumerate(b_rows):
            if _ts(as_) < _ts(be) and _ts(bs) < _ts(ae):
                out.add((i, j))
    return out


def test_overlap_join_matches_bruteforce_multibucket(spark):
    from dbms_data_anonymity_differential_privacy_spark.operators.temporal import interval_overlap_join

    # spans from sub-bucket to 5-bucket, arbitrary alignment
    a = [
        ("2024-01-01 00:10:00", "2024-01-01 00:20:00"),
        ("2024-01-01 00:50:00", "2024-01-01 03:10:00"),  # 4 buckets
        ("2024-01-01 02:00:00", "2024-01-01 02:00:01"),
        ("2024-01-01 23:00:00", "2024-01-02 04:00:00"),  # crosses midnight
    ]
    b = [
        ("2024-01-01 00:00:00", "2024-01-01 01:00:00"),
        ("2024-01-01 01:30:00", "2024-01-01 02:30:00"),
        ("2024-01-02 00:00:00", "2024-01-02 01:00:00"),
        ("2024-01-01 00:15:00", "2024-01-01 00:16:00"),
    ]
    got = interval_overlap_join(
        _iv(spark, a), _iv(spark, b, "bs", "be"), "s", "e", "bs", "be"
    )
    pairs = {(r["id"], r["r_id"]) for r in got.collect()}
    assert pairs == _brute_overlap(a, b)
    # each overlapping pair appears EXACTLY once despite shared buckets
    assert got.count() == len(pairs)


def test_overlap_join_halfopen_touching_and_empty(spark):
    from dbms_data_anonymity_differential_privacy_spark.operators.temporal import interval_overlap_join

    a = [("2024-01-01 01:00:00", "2024-01-01 02:00:00"),
         ("2024-01-01 03:00:00", "2024-01-01 03:00:00")]  # empty interval
    b = [("2024-01-01 02:00:00", "2024-01-01 03:00:00"),  # touches a0: NO overlap
         ("2024-01-01 01:59:59", "2024-01-01 02:00:01"),
         ("2024-01-01 02:59:00", "2024-01-01 03:59:00")]  # would cover a1 if nonempty
    got = interval_overlap_join(
        _iv(spark, a), _iv(spark, b, "bs", "be"), "s", "e", "bs", "be"
    ).collect()
    assert {(r["id"], r["r_id"]) for r in got} == {(0, 1)}
    assert got[0]["overlap_us"] == 1_000_000  # [01:59:59, 02:00:00)


def test_overlap_join_keys_and_overlap_us(spark):
    from dbms_data_anonymity_differential_privacy_spark.operators.temporal import interval_overlap_join

    a = spark.createDataFrame(
        [("u1", _ts("2024-01-01 01:00:00"), _ts("2024-01-01 02:00:00")),
         ("u2", _ts("2024-01-01 01:00:00"), _ts("2024-01-01 02:00:00"))],
        "k string, s timestamp, e timestamp",
    )
    b = spark.createDataFrame(
        [("u1", _ts("2024-01-01 01:30:00"), _ts("2024-01-01 02:30:00")),
         ("u3", _ts("2024-01-01 01:30:00"), _ts("2024-01-01 02:30:00"))],
        "k string, bs timestamp, be timestamp",
    )
    got = interval_overlap_join(a, b, "s", "e", "bs", "be", on=["k"]).collect()
    assert len(got) == 1 and got[0]["k"] == "u1"
    assert got[0]["overlap_us"] == 30 * 60 * 1_000_000


def test_overlap_join_plan_no_cartesian(spark):
    from dbms_data_anonymity_differential_privacy_spark.operators.temporal import interval_overlap_join

    a = _iv(spark, [("2024-01-01 01:00:00", "2024-01-01 02:00:00")])
    b = _iv(spark, [("2024-01-01 01:30:00", "2024-01-01 02:30:00")], "bs", "be")
    plan = interval_overlap_join(a, b, "s", "e", "bs", "be")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_interpolate_gapfill_crafted(spark):
    """X119: exact linear interpolation across a 2-bucket gap, backfill
    at the head, LOCF at the tail, observed buckets untouched."""
    rows = [
        ("g", _ts("2024-01-01 02:30:00"), 10.0),   # bucket 02:00 obs
        ("g", _ts("2024-01-01 05:10:00"), 40.0),   # bucket 05:00 obs (gap 03,04)
        ("g", _ts("2024-01-01 06:20:00"), 0.0),    # bucket 06:00 obs
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")

    from dbms_data_anonymity_differential_privacy_spark.operators.temporal import interpolate_gapfill

    out = {r.bucket_ts.hour: r for r in
           interpolate_gapfill(df, ["event_type"], bucket="1 hour").collect()}
    assert sorted(out) == [2, 3, 4, 5, 6]
    assert out[2].src == "obs" and out[2].value_r == 10.0
    # linear between 10 (02:00) and 40 (05:00): 03:00 -> 20, 04:00 -> 30
    assert out[3].src == "interp" and out[3].value_r == 20.0
    assert out[4].src == "interp" and out[4].value_r == 30.0
    assert out[5].src == "obs" and out[5].value_r == 40.0
    assert out[6].src == "obs" and out[6].value_r == 0.0


def test_interpolate_gapfill_edges(spark):
    """Head gap backfills the next observation; tail gap carries forward;
    both flagged locf. (Spine spans observed range only, so edge gaps
    require an interior construction: group with one isolated middle
    observation between two observed endpoints of OTHER groups is not
    possible — instead pin the single-observation group: every spine
    bucket is that value.)"""
    rows = [("g", _ts("2024-01-01 02:00:00"), 7.0)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")

    from dbms_data_anonymity_differential_privacy_spark.operators.temporal import interpolate_gapfill

    out = interpolate_gapfill(df, ["event_type"], bucket="1 hour").collect()
    assert len(out) == 1 and out[0].src == "obs" and out[0].value_r == 7.0
