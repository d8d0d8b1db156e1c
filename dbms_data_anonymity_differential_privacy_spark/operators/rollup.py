"""Hierarchical rollup release with small-cell suppression — extension X33.

Statistical agencies release aggregates at every level of a geographic /
categorical hierarchy (region -> nation -> segment) and suppress "small
cells" whose contributor count is below a threshold k — the tabular
analogue of k-anonymity (primary cell suppression; see Hundepool et al.,
*Statistical Disclosure Control*, Wiley 2012, ch. 4). The reference has no
hierarchical release (SURVEY §2d lists grouping sets/rollup/cube as
explicit negatives), so this is a designed extension in the spirit of its
k-threshold operators (``naive-suppresion.py:37``).

Spark-first design: ``df.rollup(...)`` computes ALL hierarchy levels in
one logical aggregate — Catalyst expands it to a single Expand + partial
hash-aggregate plan, so the fact table is scanned ONCE and shuffled ONCE
(map-side partial aggregation ships one pre-aggregated row per (mapper,
group, level)) no matter how many levels the hierarchy has. The naive
alternative — one groupBy per level + union — scans and shuffles L times.
At 100 TB with a 3-level hierarchy that is a 3x scan and shuffle saving.

Money values are aggregated in integer cents (exact, engine-portable)
rather than floating doubles: cross-level sums then agree bit-for-bit
with any ANSI-SQL engine regardless of summation order.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_release(
    df: DataFrame,
    hierarchy: Sequence[str],
    k: int,
    cents_col: str | None = None,
) -> DataFrame:
    """Release counts (and optional exact cent-sums) at every rollup level
    of ``hierarchy``, suppressing cells with fewer than ``k`` contributors.

    Output: ``(*hierarchy, level, n_rows[, sum_cents])`` where ``level``
    encodes which columns are rolled up (bit i set <=> hierarchy[i] is
    aggregated away; 0 = leaf cells, 2^len-1 = grand total), computed as
    ``sum(grouping(c) * 2^(len-1-i))`` — the same arithmetic an ANSI
    ``GROUPING()`` oracle uses, so the relation is hash-checkable.

    Suppression here is primary-cell only: a cell is dropped iff its own
    contributor count is < k. Complementary (secondary) suppression —
    dropping additional cells so suppressed ones cannot be re-derived by
    subtraction — is a set-cover problem out of scope for this release
    primitive; callers needing it should release only non-adjacent levels.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not hierarchy:
        raise ValueError("hierarchy must name at least one column")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if cents_col is not None:
        aggs.append(F.sum(cents_col).alias("sum_cents"))
    nbits = len(hierarchy)
    level = None
    for i, c in enumerate(hierarchy):
        bit = F.grouping(c).cast("int") * F.lit(2 ** (nbits - 1 - i))
        level = bit if level is None else level + bit
    out = df.rollup(*hierarchy).agg(*aggs, level.alias("level"))
    cols = [*hierarchy, "level", "n_rows"] + ([] if cents_col is None else ["sum_cents"])
    return out.filter(F.col("n_rows") >= F.lit(k)).select(*cols)


def pivot_release(
    df: DataFrame,
    row_cols: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """X105 — wide-format contingency release with small-cell suppression:
    the census cross-tabulation shape (rows × categories as columns),
    where any cell smaller than ``k`` is withheld.

    Cell semantics: ``0`` means "no rows" (a true, safe zero); ``NULL``
    means "suppressed" (a positive count below ``k`` — publishing it
    would expose a small group). The distinction is deliberate and
    matches X33's rollup-suppression convention.

    ``pivot_values`` is REQUIRED (no inference): Spark's value-less
    ``pivot()`` runs an extra distinct job over the fact table to learn
    the columns, and the release schema of a published table must be a
    declared, reviewed artifact anyway (the dp-histogram public-domain
    argument, applied to schema). With explicit values the whole pivot
    compiles to ONE aggregation — each cell a conditional partial count,
    one fact-row shuffle of (row key, partial cells), skew-safe.

    Output: ``(*row_cols, <value> for each pivot value)``.
    """
    if not pivot_values:
        raise ValueError("pivot_values must be declared explicitly")
    if k < 1:
        raise ValueError("k must be >= 1")
    wide = df.groupBy(*row_cols).pivot(pivot_col, list(pivot_values)).count()
    out = wide.select(
        *row_cols,
        *[
            F.when(F.coalesce(F.col(f"`{v}`"), F.lit(0)) >= k, F.col(f"`{v}`"))
            .when(F.coalesce(F.col(f"`{v}`"), F.lit(0)) == 0, F.lit(0))
            .alias(v)
            for v in pivot_values
        ],
    )
    return out
