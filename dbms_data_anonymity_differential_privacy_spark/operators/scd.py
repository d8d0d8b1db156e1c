"""Slowly-changing-dimension builds from append-only change logs.

The warehouse-side twin of the CDC operators in ``operators/snapshot.py``
(x58 ``apply_changes`` replays a keyed log into a current-state table;
this module keeps the *history*): SCD Type 2 turns an event stream into
versioned validity intervals — one row per (key, state) run with
``valid_from``/``valid_to``/``version``/``is_current`` — the dimension
shape every Kimball-style mart and every feature-store
point-in-time-correct join consumes.

Reference parity: the reference engine has no dimension builder; this is
north-star extension surface like the rest of the temporal family
(SURVEY §2 X-ops). Semantics follow the standard SCD2 definition
(Kimball & Ross, The Data Warehouse Toolkit, ch. 5).

Physical shape at 100 TB: everything is ONE window family partitioned by
the dimension key — change compression (lag), versioning (row_number)
and interval close-out (lead) share the same sort, so Spark plans a
single shuffle on the key followed by map-side window evaluation. No
joins, no second fact pass.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    df: DataFrame,
    key_cols: Sequence[str],
    state_cols: Sequence[str],
    ts_col: str = "ts",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Build an SCD Type 2 history from an append-only change log.

    Consecutive rows (per key, in ``ts_col`` then ``tiebreak`` order)
    with identical ``state_cols`` compress into one validity interval;
    each surviving run becomes a version row:

    - ``valid_from`` — the run's first timestamp
    - ``valid_to`` — the next run's ``valid_from`` (NULL for the open,
      current run)
    - ``version`` — 1-based per key, in time order
    - ``is_current`` — ``valid_to IS NULL``

    Deterministic given a deterministic total order; pass ``tiebreak``
    (e.g. an event id) when timestamps can collide.
    """
    keys = [F.col(c) for c in key_cols]
    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)

    changed = F.lit(False)
    for c in state_cols:
        prev = F.lag(F.col(c)).over(w)
        # null-safe inequality: a state transitioning to/from NULL is a
        # change; eqNullSafe then negate
        changed = changed | ~F.col(c).eqNullSafe(prev)
    first = F.row_number().over(w) == 1

    runs = df.withColumn("__new_run", (first | changed).cast("int"))
    # run starts only — the compression: every non-start row carries no
    # new information for the dimension
    starts = runs.filter(F.col("__new_run") == 1).drop("__new_run")

    w2 = Window.partitionBy(*keys).orderBy(*order)
    return starts.select(
        *key_cols,
        *state_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.lead(F.col(ts_col)).over(w2).isNull().alias("is_current"),
    )
