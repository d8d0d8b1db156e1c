"""Relational integrity checks — data-quality gates for ingest pipelines.

The reference never validates its input (it drops nulls and trusts the
rest, ``naive-suppresion.py:17``); at 100 TB, silent referential drift —
orphaned fact rows after a partial dimension load, duplicate keys after a
bad merge — is how quietly-wrong training data gets made. These checks
are the engine's first-class guards, each returning a small relation
(never a driver-side assert) so they compose into pipelines and
oracle-check like any other query.

Scale shape: ``referential_check`` is one left-anti join on the key
(broadcast when the parent's distinct-key relation is small — the usual
dimension case; shuffled hash join otherwise) plus map-side null
counting. ``key_uniqueness_check`` is one aggregation on the candidate
key with partial map-side combine. Neither ever moves non-key columns.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def referential_check(
    child: DataFrame,
    parent: DataFrame,
    fk_cols: Sequence[str],
    pk_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Foreign-key containment audit: child[fk] ⊆ parent[pk].

    Output (single row): ``(n_child, n_null_fk, n_orphans, orphan_rate_r)``
    — rows with any-NULL foreign key are counted separately (SQL FK
    semantics: NULL keys are exempt from the containment requirement) and
    excluded from the orphan probe.
    """
    pk_cols = list(pk_cols or fk_cols)
    if len(pk_cols) != len(fk_cols):
        raise ValueError("fk_cols and pk_cols must have equal length")
    fk = [F.col(c) for c in fk_cols]
    null_any = None
    for c in fk:
        null_any = c.isNull() if null_any is None else (null_any | c.isNull())
    keys = child.select(*fk_cols)
    nn = keys.filter(~null_any)
    parent_keys = parent.select(
        *[F.col(p).alias(f) for p, f in zip(pk_cols, fk_cols)]
    ).distinct()
    orphans = nn.join(parent_keys, on=list(fk_cols), how="left_anti")
    totals = keys.agg(
        F.count(F.lit(1)).alias("n_child"),
        F.sum(F.when(null_any, 1).otherwise(0)).cast("long").alias("n_null_fk"),
    )
    n_orph = orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
    return totals.crossJoin(n_orph).select(
        "n_child",
        "n_null_fk",
        "n_orphans",
        F.round(
            F.col("n_orphans").cast("double") / F.col("n_child").cast("double"), 9
        ).alias("orphan_rate_r"),
    )


def key_uniqueness_check(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Candidate-key audit: is ``key_cols`` unique over the table?

    Output (single row): ``(n_rows, n_keys, n_dup_keys, n_excess_rows)``
    where ``n_dup_keys`` counts key values appearing more than once and
    ``n_excess_rows`` counts the rows a dedup would remove. NULL-keyed
    rows group under their NULL key like SQL ``GROUP BY`` (disclosed:
    this treats NULL as a value, unlike a SQL UNIQUE constraint).

    One aggregation on the key (map-side combine), then a scalar rollup
    of the slim per-key relation.
    """
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__c"))
    return per_key.agg(
        F.sum("__c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("__c") > 1, 1).otherwise(0)).cast("long").alias("n_dup_keys"),
        F.sum(F.col("__c") - 1).cast("long").alias("n_excess_rows"),
    )


def expectation_report(
    df: DataFrame,
    rules: Sequence[tuple],
) -> DataFrame:
    """X77 — declarative data-quality expectations in ONE scan.

    ``rules`` is a list of tuples, each becoming one report row:

    - ``("not_null", col)`` — no NULLs in ``col``;
    - ``("unique", col)`` — no duplicated values (NULLs exempt, like a
      SQL UNIQUE constraint);
    - ``("in_range", col, lo, hi)`` — all non-NULL values in [lo, hi];
    - ``("in_set", col, values)`` — all non-NULL values in the list;
    - ``("matches", col, regex)`` — all non-NULL strings match.

    Every rule except ``unique`` is a per-row predicate, so the whole
    suite compiles to ONE aggregation over ONE scan (conditional sums —
    the x43 profile shape); ``unique`` rules each add one distinct-count
    aggregate to the same pass. Output: one row per rule,
    ``(rule_id, rule, column, n_checked, n_violations, passed)`` —
    exact integers, fully oracle-checkable, and composable (filter
    ``NOT passed`` and fail the pipeline, or write the report as a
    dataset card).
    """
    aggs = []
    meta = []
    for i, rule in enumerate(rules):
        kind, col = rule[0], rule[1]
        c = F.col(col)
        if kind == "not_null":
            checked = F.count(F.lit(1))
            viol = F.sum(F.when(c.isNull(), 1).otherwise(0))
        elif kind == "unique":
            checked = F.count(c)
            viol = checked - F.countDistinct(c)
        elif kind == "in_range":
            lo, hi = rule[2], rule[3]
            checked = F.count(c)
            viol = F.sum(
                F.when(c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))), 1).otherwise(0)
            )
        elif kind == "in_set":
            vals = list(rule[2])
            checked = F.count(c)
            viol = F.sum(F.when(c.isNotNull() & ~c.isin(vals), 1).otherwise(0))
        elif kind == "matches":
            pattern = rule[2]
            checked = F.count(c)
            viol = F.sum(
                F.when(c.isNotNull() & ~c.rlike(pattern), 1).otherwise(0)
            )
        else:
            raise ValueError(f"unknown expectation kind {kind!r}")
        aggs.append(checked.cast("long").alias(f"chk_{i}"))
        aggs.append(F.coalesce(viol, F.lit(0)).cast("long").alias(f"vio_{i}"))
        meta.append((i, kind, col))
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(i).alias("rule_id"),
            F.lit(kind).alias("rule"),
            F.lit(col).alias("column"),
            F.col(f"chk_{i}").alias("n_checked"),
            F.col(f"vio_{i}").alias("n_violations"),
            (F.col(f"vio_{i}") == 0).alias("passed"),
        )
        for i, kind, col in meta
    ]
    return wide.select(F.explode(F.array(*rows)).alias("e")).select(
        "e.rule_id", "e.rule", "e.column", "e.n_checked", "e.n_violations", "e.passed"
    )


def deletion_impact_plan(
    df: DataFrame,
    subject_ids: DataFrame,
    subject_col: str,
    partition_expr,
    partition_name: str = "partition",
) -> DataFrame:
    """Right-to-erasure (GDPR Art. 17) rewrite planner: given a relation
    of deletion-request subject ids, report — per storage partition —
    how many rows must go and what fraction of the partition rewrites.
    This is the planning half of compliance deletes on immutable
    formats: partitions with affected_rows = 0 are skipped entirely,
    the rest pay a full rewrite, so the affected-fraction column IS the
    cost model.

    Shape: the subject list BROADCASTS (deletion requests are tiny
    relative to the fact table); one pass computes per-partition totals
    and affected counts together (conditional aggregation over the
    broadcast-hash membership flag — the fact table never shuffles by
    subject). Output: ``(partition_name, n_rows, affected_rows,
    affected_ppm, must_rewrite)`` with the fraction in exact integer
    parts-per-million.
    """
    subjects = subject_ids.select(
        F.col(subject_col).alias("__subj")
    ).distinct()
    flagged = df.select(
        partition_expr.alias(partition_name), F.col(subject_col).alias("__s")
    ).join(
        F.broadcast(subjects.withColumn("__hit", F.lit(1))),
        F.col("__s") == F.col("__subj"),
        "left",
    )
    return flagged.groupBy(partition_name).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("affected_rows"),
        F.expr("CAST(sum(coalesce(__hit, 0)) * 1000000 DIV count(1) AS BIGINT)").alias(
            "affected_ppm"
        ),
        (F.sum(F.coalesce(F.col("__hit"), F.lit(0))) > 0).alias("must_rewrite"),
    )


def join_cardinality_profile(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    top: int = 10,
) -> DataFrame:
    """Exact join-cardinality profile — the CBO-style diagnostic run
    BEFORE a big join: output size ``|A ⋈ B| = Σ_k cA(k)·cB(k)``, the
    key overlap counts, and the ``top`` heaviest keys by pair
    contribution (the skew candidates a salting strategy targets).

    Shape: each side collapses to its per-key count relation (one
    partial-agg shuffle each); the profile joins the two SLIM count
    relations, never the fact tables — the whole point is predicting
    the expensive join without running it. The summary row aggregates
    that count-join; heavy keys are a distributed TakeOrdered.

    Output: one row per heavy key ``(key, left_rows, right_rows,
    pairs)`` ordered by (pairs desc, key), plus the grand totals as the
    key = NULL row.
    """
    ca = left.groupBy(F.col(left_key).alias("key")).agg(
        F.count(F.lit(1)).alias("left_rows")
    )
    cb = right.groupBy(F.col(right_key).alias("key")).agg(
        F.count(F.lit(1)).alias("right_rows")
    )
    joined = ca.join(cb, on="key").select(
        "key",
        F.col("left_rows").cast("long").alias("left_rows"),
        F.col("right_rows").cast("long").alias("right_rows"),
        (F.col("left_rows") * F.col("right_rows")).cast("long").alias("pairs"),
    )
    heavy = joined.orderBy(F.col("pairs").desc(), F.col("key").asc()).limit(top)
    totals = joined.agg(
        F.lit(None).cast(joined.schema["key"].dataType).alias("key"),
        F.sum("left_rows").cast("long").alias("left_rows"),
        F.sum("right_rows").cast("long").alias("right_rows"),
        F.sum("pairs").cast("long").alias("pairs"),
    )
    return heavy.unionByName(totals)
