"""Streaming rolling-anomaly detection — the stateful twin of X87.

The batch operator (``operators/stats.rolling_anomaly``) scores each
(group, bucket) count against the trailing ``window`` OBSERVED buckets.
Streaming adds one semantic wrinkle: a bucket's count is only final once
a LATER bucket for the same key has arrived (the event-time analog of a
watermark closing a window). This operator therefore emits scores for
CLOSED buckets only — the newest bucket per key stays provisional and
unemitted; the stream≡batch pytest asserts equality with the batch twin
on exactly the closed set.

State per key is O(window): the trailing ``window`` closed (bucket,
count) pairs plus the open tail and a scored-until high-water mark —
no row buffering, state does not grow with stream length. Late rows for
an already-scored bucket are dropped-by-assumption (documented in-order
delivery at bucket granularity, the same discipline a watermark
enforces); a production deployment pairs this with
``withWatermark`` upstream.

Arithmetic matches the batch twin op-for-op: integer Σx/Σx² over the
trailing window, ``var = (W·Σx² − (Σx)²)/(W·(W−1))``, one division each
— Python floats and JVM doubles execute the same IEEE ops.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "event_type string, bucket_start timestamp, n long, "
    "mean_r double, z_r double, is_anomaly boolean"
)
STATE_SCHEMA = "bks array<long>, cnts array<long>, scored_until long"


def rolling_anomaly_stateful(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    bucket_secs: int = 3600,
    window: int = 24,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Streaming flavor of x87 over a streaming DataFrame: emits
    ``(group, bucket_start, n, mean_r, z_r, is_anomaly)`` per CLOSED
    bucket with a full trailing window, in append-style update mode."""

    def score(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            bks, cnts, scored_until = state.get
            merged = dict(zip(list(bks), list(cnts)))
        else:
            merged, scored_until = {}, -(1 << 62)
        for pdf in pdfs:
            secs = pdf[ts_col].astype("int64") // 1_000_000_000
            for b, c in (secs // bucket_secs).value_counts().items():
                b = int(b)
                if b > scored_until:  # late-for-scored buckets dropped
                    merged[b] = merged.get(b, 0) + int(c)
        items = sorted(merged.items())
        rows = {"event_type": [], "bucket_start": [], "n": [],
                "mean_r": [], "z_r": [], "is_anomaly": []}
        for idx, (b, c) in enumerate(items[:-1]):  # all but the open tail
            if b <= scored_until:
                continue
            prev = items[max(0, idx - window): idx]
            scored_until = b
            if len(prev) != window:
                continue  # warm-up: partial trailing window, same as batch
            ws = sum(x for _, x in prev)
            wsq = sum(x * x for _, x in prev)
            var = (window * wsq - ws * ws) / float(window * (window - 1))
            mean = ws / float(window)
            rows["event_type"].append(key[0])
            rows["bucket_start"].append(pd.Timestamp(b * bucket_secs, unit="s"))
            rows["n"].append(c)
            rows["mean_r"].append(round(mean, 9))
            if var > 0:
                z = round((c - mean) / math.sqrt(var), 9)
                rows["z_r"].append(z)
                rows["is_anomaly"].append(abs(z) >= z_threshold)
            else:
                rows["z_r"].append(None)
                rows["is_anomaly"].append(None)
        keep = items[-(window + 1):]  # window closed + the open tail
        state.update((
            [b for b, _ in keep], [c for _, c in keep], scored_until,
        ))
        if rows["event_type"]:
            yield pd.DataFrame(rows)

    return events.groupBy(group_col).applyInPandasWithState(
        score,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def rolling_anomaly_stream(
    spark,
    path: str,
    group_col: str = "event_type",
    bucket_secs: int = 3600,
    window: int = 24,
    z_threshold: float = 3.0,
) -> DataFrame:
    """File-source wrapper: readStream over a parquet directory →
    :func:`rolling_anomaly_stateful`."""
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    return rolling_anomaly_stateful(
        stream, group_col=group_col, bucket_secs=bucket_secs,
        window=window, z_threshold=z_threshold,
    )
