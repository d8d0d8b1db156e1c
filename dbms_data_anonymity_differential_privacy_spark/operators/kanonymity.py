"""k-anonymity operators — SURVEY §2b C1/C2.

The reference suppresses rows whose quasi-identifier (QI) equivalence class
has fewer than k members by building a group-frequency table and inner-
merging it back (reference ``naive-suppresion.py:29-40``), and audits
k-anonymity by reporting class counts / min size / at-risk rows
(``Archived/data-anonymity.py:48-71``).

Spark-first design: the suppression is ONE shuffle — a window count over
the QI partition and a filter — instead of the reference's aggregate +
re-join (two shuffles of which one re-shuffles the whole fact table on a
wide composite key). At 100 TB this halves shuffle volume; AQE handles
skewed modal classes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CLASS_SIZE_COL = "class_size"


def class_sizes(df: DataFrame, qi: Sequence[str]) -> DataFrame:
    """P5 — the QI group-frequency relation: one row per equivalence class
    with its member count (reference ``naive-suppresion.py:34``)."""
    return df.groupBy(*qi).agg(F.count(F.lit(1)).alias(CLASS_SIZE_COL))


def with_class_size(df: DataFrame, qi: Sequence[str], out_col: str = CLASS_SIZE_COL) -> DataFrame:
    """P9 — annotate every row with its equivalence-class size via a window
    count (replaces the reference's ``index.map`` join-back idiom,
    ``naive-suppresion.py:66-67``). One shuffle, no second relation."""
    w = Window.partitionBy(*[F.col(c) for c in qi])
    return df.withColumn(out_col, F.count(F.lit(1)).over(w))


def k_anonymize_suppress(df: DataFrame, qi: Sequence[str], k: int) -> DataFrame:
    """C1 — drop every row whose QI equivalence class has < k members.

    Physical shape (SURVEY P5→P6→P8): group-frequency aggregate + broadcast
    LEFT SEMI join of the frequent-class keys back onto the fact scan. The
    fact table is never shuffled: the aggregate ships only QI tuples with
    map-side partial counts (skew-safe — a modal class partial-aggregates
    on every mapper instead of landing on one reducer, the failure mode of
    the window-count formulation), and the output path is scan + broadcast
    probe. If the frequent-key relation outgrows broadcast range (worst
    case rows/k keys), drop the hint and AQE falls back to a shuffled semi
    join with skew splitting. Reference semantics:
    ``naive-suppresion.py:29-40`` / ``t-closeness.py:91-95``.

    NULL handling contract: a row with ANY NULL QI value is always
    suppressed, whatever k — the semi-join uses SQL equality, under which
    NULL keys match nothing (identical in the DuckDB oracle, so both
    engines agree). This is also the privacy-conservative choice, and the
    reference never encounters the case (it drops all-NULL rows first,
    P2); pre-clean with ``df.na.drop`` to opt into the reference's exact
    flow.
    """
    frequent = (
        class_sizes(df, qi)
        .filter(F.col(CLASS_SIZE_COL) >= F.lit(k))
        .select(*qi)
    )
    # semi-join hoists join keys to the front — restore the input order
    return df.join(F.broadcast(frequent), on=list(qi), how="left_semi").select(
        *df.columns
    )


def k_anonymity_audit(df: DataFrame, qi: Sequence[str], k: int) -> DataFrame:
    """C2 — one-row report: #classes, min/max class size, #classes below k,
    #at-risk rows, k satisfied (reference ``Archived/data-anonymity.py:48-71``).

    Single aggregation over the class-frequency relation — the class
    relation is tiny relative to the fact table, so this is one shuffle +
    a scalar agg.
    """
    cs = class_sizes(df, qi)
    return cs.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min(CLASS_SIZE_COL).alias("min_class_size"),
        F.max(CLASS_SIZE_COL).alias("max_class_size"),
        F.sum(F.when(F.col(CLASS_SIZE_COL) < k, 1).otherwise(0)).alias("classes_below_k"),
        F.sum(F.when(F.col(CLASS_SIZE_COL) < k, F.col(CLASS_SIZE_COL)).otherwise(0)).alias(
            "rows_at_risk"
        ),
        (F.min(CLASS_SIZE_COL) >= F.lit(k)).alias("k_satisfied"),
    )
