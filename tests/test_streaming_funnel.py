"""Stream ≡ batch equivalence for the stateful streaming funnel."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.sources.readers import load_table
from dbms_data_anonymity_differential_privacy_spark.streaming.funnel import (
    funnel_batch_progress,
    funnel_stateful,
)

STEPS = ["signup", "click", "purchase"]


def test_stream_final_state_matches_batch(spark, sf0001, tmp_path):
    """Single-batch replay (availableNow, one file) applies the whole
    timeline in event-time order, so the last update per user must equal
    the batch fold exactly."""
    from dbms_data_anonymity_differential_privacy_spark.streaming.anonymize import events_readstream

    ev = load_table(spark, sf0001, "events")
    batch = {r.user_id: r.steps_reached for r in funnel_batch_progress(ev, STEPS).collect()}

    stream_dir = tmp_path / "events"
    stream_dir.mkdir()
    shutil.copy(f"{sf0001}/events.parquet", stream_dir / "part-000.parquet")
    stream = funnel_stateful(events_readstream(spark, str(stream_dir)), STEPS)
    q = (
        stream.writeStream.format("memory")
        .queryName("funnel_stream_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM funnel_stream_test").collect()
    # update mode may emit several advances per user; the LAST (max) is
    # the final state for a single-batch replay
    got: dict = {}
    for r in rows:
        got[r.user_id] = max(got.get(r.user_id, 0), r.steps_reached)
    assert got == batch
    assert len(batch) > 0


def test_stream_is_incremental_across_batches(spark, tmp_path):
    """Two micro-batches: state carries across; an in-order continuation
    advances the funnel."""
    import datetime as dt

    import pandas as pd

    stream_dir = tmp_path / "ev"
    stream_dir.mkdir()

    def write_batch(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        pdf.to_parquet(stream_dir / name)

    t = dt.datetime(2024, 1, 1)
    write_batch("b1.parquet", [(1, t, 7, "signup", 0.0, "{}")])
    from dbms_data_anonymity_differential_privacy_spark.streaming.anonymize import events_readstream

    stream = funnel_stateful(events_readstream(spark, str(stream_dir)), STEPS)
    q = (
        stream.writeStream.format("memory")
        .queryName("funnel_incr_test")
        .outputMode("update")
        .trigger(processingTime="1 second")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        deadline_rows = lambda n: spark.sql(  # noqa: E731
            "SELECT * FROM funnel_incr_test"
        ).count() >= n
        import time

        for _ in range(60):
            if deadline_rows(1):
                break
            time.sleep(1)
        assert deadline_rows(1)
        write_batch("b2.parquet", [(2, t + dt.timedelta(minutes=1), 7, "click", 0.0, "{}")])
        for _ in range(60):
            if deadline_rows(2):
                break
            time.sleep(1)
        rows = spark.sql("SELECT * FROM funnel_incr_test ORDER BY steps_reached").collect()
        assert [r.steps_reached for r in rows] == [1, 2]
        assert all(r.user_id == 7 for r in rows)
    finally:
        q.stop()
