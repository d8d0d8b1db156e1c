"""Corpus snapshot diff — change accounting between dataset versions.

A recurring curation task the reference never needed (it processes one
static table): given yesterday's corpus snapshot and today's, report what
was ADDED, REMOVED, CHANGED, and UNCHANGED — the relation that drives
incremental re-processing (only added/changed docs re-enter the dedup /
quality / embedding stages) and dataset-version audit trails.

Design:

- Content identity is the same normalized md5 ``fingerprint`` the dedup
  family uses (``operators.text.fingerprint``), so "changed" means the
  *normalized* content changed — whitespace-only edits are UNCHANGED,
  consistent with how the dedup stages would treat them.
- ONE full-outer shuffle join on the id column classifies every doc. Both
  sides are first collapsed to ``(id, fingerprint)`` — 40-byte records —
  so the join never moves document bodies, only identities: at 100 TB the
  shuffle is ~0.04% of corpus bytes. Catalyst plans a sort-merge join on
  the id; with both snapshots bucketed by id (``writers.write_bucketed``)
  even that shuffle disappears.
- ``snapshot_diff`` returns the per-doc status relation (join-ready for
  the incremental pipeline); ``snapshot_diff_summary`` rolls it up to the
  audit row per status.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.text import fingerprint


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Classify every document id across two snapshots.

    Returns ``(id_col, status)`` with status in
    ``{'added', 'removed', 'changed', 'unchanged'}``.
    """
    o = old.select(F.col(id_col), fingerprint(F.col(text_col)).alias("__fp_old"))
    n = new.select(F.col(id_col), fingerprint(F.col(text_col)).alias("__fp_new"))
    joined = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("__fp_old").isNull(), F.lit("added"))
        .when(F.col("__fp_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old") == F.col("__fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(F.col(id_col), status.alias("status"))


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Audit rollup of :func:`snapshot_diff`: ``(status, n_docs)``."""
    return (
        snapshot_diff(old, new, id_col=id_col, text_col=text_col)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: str | list[str] = "doc_id",
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """X58 — CDC MERGE: apply an upsert/delete change batch to a snapshot.

    ``changes`` carries the base schema plus ``op_col`` in
    ``{'upsert', 'delete'}`` and (optionally) ``seq_col`` when one batch
    can hold several changes for a key — the highest sequence wins, and
    on an exact sequence tie the delete wins (pinned, deterministic).

    The scale property that matters: the snapshot is NEVER shuffled.
    Changed keys are a broadcast-sized relation in any sane CDC cadence,
    so untouched base rows survive through one broadcast LEFT ANTI join
    (map-only over the base scan) and the winning upsert payloads union
    in behind them. Applying a GB of changes to 100 TB costs one base
    scan + kilobytes of broadcast — the same reason x48's diff never
    moves bodies. (If a batch ever rivals the base in key count, Catalyst
    falls back to a shuffled anti join on its own — semantics unchanged.)

    Output: the merged snapshot, base schema exactly.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = [F.col(seq_col).desc()] if seq_col else []
    # delete before upsert on ties: 'delete' < 'upsert' lexicographically
    order += [F.col(op_col).asc()]
    w = Window.partitionBy(*keys).orderBy(*order)
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    survivors = base.join(F.broadcast(latest.select(*keys)), on=keys, how="left_anti")
    upserts = latest.filter(F.col(op_col) == "upsert").select(*base.columns)
    return survivors.unionByName(upserts)
