"""One-pass column profiling — data-quality reconnaissance for curation.

The reference inspects its input by printing ``df.head()`` / ad-hoc
``value_counts`` (``Archived/data-anonymity.py:16-24``); P11/P12/P13 cover
those as single-column queries. A 100 TB curation pipeline needs the
*table-level* version: one job that answers "how many rows, how many nulls
per column, how many distinct values per column, what is the value range"
for every column of interest — the first thing an engineer runs against a
new snapshot before deciding QI columns, bin edges, or dedup keys.

Design for scale:

- ONE scan. All per-column statistics are expressions inside a single
  global aggregation, so the fact table is read once whatever the column
  count (the plan gate pins one scan). Exact ``count(DISTINCT ...)`` over
  several columns makes Catalyst plan an Expand (one input row fans out to
  one row per distinct-aggregate) — that is a deliberate trade: row volume
  × n_cols through ONE shuffle, still map-side-combined, instead of n_cols
  separate jobs. For profile-everything over very wide tables at 100 TB,
  use ``exact=False``: HyperLogLog++ ``approx_count_distinct`` keeps the
  aggregation single-phase (no Expand) and the whole profile is one
  partial-agg shuffle of a few KB per partition.
- The long (column, stat) layout is produced by a driver-side unpivot of
  the single aggregated row — n_cols is driver-knowable by definition, no
  second distributed pass.
- Min/max are computed on the NATIVE type (so numeric/date ordering, not
  lexicographic), then canonicalized to strings for a uniform schema:
  numeric extremes via DECIMAL(38,9) (both Spark and DuckDB render a fixed
  nine-digit scale, making the operator oracle-checkable bit-for-bit;
  doubles beyond 1e29 would overflow the decimal — curation profile
  columns are counts/prices/dates, fine by contract), everything else via
  a plain string cast.

Reference for the ad-hoc originals: ``Archived/data-anonymity.py:16``
(head/describe), ``naive-suppresion.py:36`` (per-column nunique loop).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbms_data_anonymity_differential_privacy_spark.operators.util import fan_out

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _canon_extreme(col: Column, dtype: T.DataType) -> Column:
    """Render a min/max value as a cross-engine-stable string."""
    if isinstance(dtype, _NUMERIC):
        return col.cast(T.DecimalType(38, 9)).cast("string")
    return col.cast("string")


def profile_columns(
    df: DataFrame, cols: Sequence[str] | None = None, exact: bool = True
) -> DataFrame:
    """Profile ``cols`` (default: all) in one scan.

    Returns one row per column:
    ``(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)`` with
    the extremes canonicalized to strings (decimal-rendered for numerics).

    ``exact=False`` swaps exact distinct counts for HyperLogLog++
    estimates (±~2.3% default rsd) — the single-phase plan for
    profile-everything sweeps over wide fact tables.
    """
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    if cols is None:
        cols = list(df.schema.names)
    unknown = [c for c in cols if c not in dtypes]
    if unknown:
        raise ValueError(f"unknown columns: {unknown}")

    # The multi-distinct Expand plan multiplies every input row by
    # (n_distinct_cols + 1) BEFORE the partial aggregation, so this is
    # CPU-heavy per *input split* — fan out a narrow scan to all cores
    # (no-op at real scale where the scan already has >= cores splits).
    df = fan_out(df.select(*cols))

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"__nulls__{c}"))
        if exact:
            aggs.append(F.count_distinct(col).alias(f"__dist__{c}"))
        else:
            aggs.append(F.approx_count_distinct(col).alias(f"__dist__{c}"))
        aggs.append(_canon_extreme(F.min(col), dtypes[c]).alias(f"__min__{c}"))
        aggs.append(_canon_extreme(F.max(col), dtypes[c]).alias(f"__max__{c}"))

    one_row = df.agg(*aggs)

    # Driver-side unpivot of the single aggregated row: a stack() over
    # literal column references — no second distributed pass, the agg row
    # is broadcast-sized by construction.
    stack_args: list[str] = []
    for c in cols:
        stack_args.append(f"'{c}', __nulls__{c}, __dist__{c}, __min__{c}, __max__{c}")
    n = len(cols)
    return one_row.select(
        F.expr(
            f"stack({n}, {', '.join(stack_args)}) "
            "AS (col_name, n_nulls, n_distinct, min_value, max_value)"
        ),
        F.col("__n_rows").alias("n_rows"),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


def profile_oracle_sql(
    table: str, cols: Sequence[str], numeric_cols: Sequence[str]
) -> str:
    """DuckDB twin of :func:`profile_columns` (exact mode), generated from
    the same column list so the two can never drift on coverage."""
    selects = []
    for c in cols:
        extreme = (
            f"CAST(CAST(MIN({c}) AS DECIMAL(38,9)) AS VARCHAR)",
            f"CAST(CAST(MAX({c}) AS DECIMAL(38,9)) AS VARCHAR)",
        ) if c in set(numeric_cols) else (
            f"CAST(MIN({c}) AS VARCHAR)",
            f"CAST(MAX({c}) AS VARCHAR)",
        )
        selects.append(
            f"SELECT '{c}' AS col_name, COUNT(*) AS n_rows, "
            f"COUNT(*) - COUNT({c}) AS n_nulls, "
            f"COUNT(DISTINCT {c}) AS n_distinct, "
            f"{extreme[0]} AS min_value, {extreme[1]} AS max_value FROM {table}"
        )
    return " UNION ALL ".join(selects)


def skew_report(df: DataFrame, key_cols: Sequence[str], top: int = 5) -> DataFrame:
    """X59 — shuffle-key skew diagnostic: how hot is the hottest key?

    Every groupBy/join in this engine hash-partitions on some key; at
    1000 executors one modal key means one straggler task owning the
    whole job's tail latency. This report is the pre-flight check that
    decides between a plain shuffle, AQE skew splitting, and salting.

    Output (single row): ``(n_rows, n_keys, max_count, top{N}_count,
    max_share_r, top{N}_share_r)`` — the hottest key's row count / the
    combined top-N count, and their shares of the table (9 dp; exact
    integers otherwise).

    Physical shape: one aggregation on the key (map-side combine — the
    same cost profile as the shuffle being diagnosed, which is the
    honest price of an exact answer), then a scalar rollup with a
    partial top-N heap (TakeOrderedAndProject shape) over the slim
    per-key relation. NULL keys group as a value — a NULL-heavy column
    IS a skew hazard, so it must show up here.
    """
    if top < 1:
        raise ValueError("top must be >= 1")
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__c"))
    topn = per_key.orderBy(F.col("__c").desc(), *[F.col(c).asc_nulls_last() for c in key_cols]).limit(
        int(top)
    )
    top_row = topn.agg(F.sum("__c").alias(f"top{top}_count"))
    totals = per_key.agg(
        F.sum("__c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("__c").alias("max_count"),
    )
    out = totals.crossJoin(top_row)
    return out.select(
        "n_rows",
        "n_keys",
        "max_count",
        F.col(f"top{top}_count").cast("long").alias(f"top{top}_count"),
        F.round(F.col("max_count").cast("double") / F.col("n_rows").cast("double"), 9).alias(
            "max_share_r"
        ),
        F.round(
            F.col(f"top{top}_count").cast("double") / F.col("n_rows").cast("double"), 9
        ).alias(f"top{top}_share_r"),
    )
