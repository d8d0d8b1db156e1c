"""Custom stateful streaming — the k-anonymity release gate.

Beyond the windowed aggregate (X6), a privacy release over an unbounded
stream needs CUMULATIVE suppression: a group key may only ever be
published once its all-time member count reaches k — independent of how
the rows were spread over micro-batches. That cumulative count is
per-key mutable state → ``applyInPandasWithState`` (Arrow-batched,
update-mode), the sanctioned Structured Streaming API for custom
stateful operators.

State design for scale: state per key is ONE long (the running count) —
no row buffering, so state size is O(distinct keys) and does not grow
with stream length. A production deployment adds a state TTL
(``GroupStateTimeout.ProcessingTimeTimeout``) to retire dead keys; the
gate's semantics make eviction safe (an evicted key restarts counting —
conservative, never under-k).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "event_type string, cnt long"
STATE_SCHEMA = "cnt long"


def kanon_gate_stateful(events: DataFrame, k: int = 5) -> DataFrame:
    """Per-key cumulative count gate over a *streaming* DataFrame: emits
    ``(event_type, cnt)`` in update mode only when the all-time count has
    reached k. Groups that never reach k are never published."""

    def gate(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        if total >= k:
            yield pd.DataFrame({"event_type": [key[0]], "cnt": [total]})

    return events.groupBy("event_type").applyInPandasWithState(
        gate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def kanon_gate_batch(events: DataFrame, k: int = 5) -> DataFrame:
    """Batch twin: after the whole file is one 'stream', the gate's final
    update per key equals the plain threshold count — the equivalence the
    streaming test asserts."""
    from pyspark.sql import functions as F

    return (
        events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= F.lit(k))
    )
