"""Streaming conversion funnel — per-user ordered-step state over an
unbounded event stream.

The batch funnel (``operators.funnel``) folds each user's whole timeline
in one pass; a stream never has the whole timeline. Per-user mutable
state — the earliest completion time of each step prefix — is exactly
the ``applyInPandasWithState`` shape (same API as the cumulative k-anon
gate): state is k epoch-micro longs per user, O(users) total, no row
buffering, TTL-safe (an evicted user restarts cold — conservative, never
counts a partial sequence).

Semantics note (disclosed, standard for streaming funnels): events are
applied in event-time order WITHIN each micro-batch (sorted before the
fold), but the state machine is forward-only ACROSS batches — a step-1
event arriving in a later batch than an already-seen step-2 event cannot
retroactively complete the pair. Stream ≡ batch exactly when per-user
event-time order is preserved across batch boundaries (in particular for
a single-batch replay, which is what the equivalence test runs).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, steps_reached int"


def funnel_stateful(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming funnel over a streaming DataFrame: update-mode rows
    ``(user_id, steps_reached)`` whenever a user's funnel prefix advances.

    Map-side the stream is pre-filtered to the k step types (same pruning
    as the batch operator), so state updates only ever see relevant rows.
    """
    if len(set(steps)) != len(steps) or not steps:
        raise ValueError("steps must be non-empty and distinct")
    k = len(steps)
    rank_of = {s: i for i, s in enumerate(steps)}
    state_schema = ", ".join(f"t{i + 1} long" for i in range(k))

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ts_state: list[int | None] = list(state.get) if state.exists else [None] * k
        before = sum(t is not None for t in ts_state)
        rows = []
        for pdf in pdfs:
            for ts, et in zip(pdf[ts_col], pdf[type_col]):
                rows.append((ts.value, rank_of[et]))  # epoch ns
        # event-time order within the batch; earlier step first on ties —
        # identical to the batch fold's (ts, rank) struct sort
        for ts_ns, r in sorted(rows):
            if ts_state[r] is None and (r == 0 or ts_state[r - 1] is not None):
                ts_state[r] = ts_ns
        after = sum(t is not None for t in ts_state)
        state.update(tuple(ts_state))
        if after > before:
            yield pd.DataFrame({"user_id": [key[0]], "steps_reached": [after]})

    relevant = events.filter(F.col(type_col).isin(list(steps)))
    return relevant.groupBy(user_col).applyInPandasWithState(
        fold,
        outputStructType=OUT_SCHEMA,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def funnel_batch_progress(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Batch twin of the stream's FINAL state: ``(user_id,
    steps_reached)`` for every user that reached at least step 1 — what a
    single-batch replay of the stream must emit last per user."""
    from dbms_data_anonymity_differential_privacy_spark.operators.funnel import funnel_user_states

    st = funnel_user_states(events, steps, user_col, ts_col, type_col)
    reached = None
    for i in range(len(steps)):
        c = F.when(F.col(f"t{i + 1}").isNotNull(), 1).otherwise(0)
        reached = c if reached is None else reached + c
    return (
        st.select(F.col(user_col).alias("user_id"), reached.cast("int").alias("steps_reached"))
        .filter(F.col("steps_reached") > 0)
    )
