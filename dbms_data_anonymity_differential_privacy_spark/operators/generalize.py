"""Value generalization hierarchies (VGH) — extension X38.

Full-domain generalization in the Samarati/Sweeney sense (Samarati,
TKDE 2001; Sweeney, IJUFKS 2002): every value of a quasi-identifier is
replaced by its ancestor at one chosen hierarchy level — level 0 is the
raw value, the top level is a single root ("*") — and the anonymization
problem becomes picking the minimal level (least information loss) whose
generalized table is k-anonymous. The reference gestures at this with
its hand-rolled age bins (``Archived/data-anonymity.py:79-83``); this
module provides the general mechanism those bins are a special case of.

Design:

- A hierarchy is a plain ``{value: [ancestor_level_1, ..., ancestor_top]}``
  mapping (domain-sized — hierarchies are metadata, kilobytes even for
  large categorical domains).
- :func:`apply_vgh` rewrites the column through a BROADCAST map join
  (domain-sized dimension, never a shuffle of fact rows); unmapped
  values generalize to the top root rather than leaking raw.
- :func:`min_level_for_k` walks levels bottom-up and returns the first
  k-anonymous one. Each probe is one partial-combined aggregate over
  (generalized QI) keys — ~``height`` cheap scans, the classic
  binary-searchable lattice walk collapsed to a linear one because
  heights are tiny (<= 5 in practice).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOP = "*"


def vgh_height(vgh: Mapping[str, Sequence[str]]) -> int:
    """Number of generalization levels above raw (all chains must agree —
    ragged hierarchies are padded by repeating their top)."""
    if not vgh:
        raise ValueError("hierarchy must map at least one value")
    return max(len(chain) for chain in vgh.values())


def apply_vgh(
    df: DataFrame,
    col: str,
    vgh: Mapping[str, Sequence[str]],
    level: int,
) -> DataFrame:
    """Replace ``col`` with its level-``level`` ancestor (0 = unchanged).

    Values absent from the hierarchy map to the top root ``*`` — the
    privacy-conservative choice (an unexpected raw value must not pass
    through a release unmapped).
    """
    height = vgh_height(vgh)
    if not 0 <= level <= height:
        raise ValueError(f"level must be in [0, {height}]")
    if level == 0:
        return df
    spark = df.sparkSession
    rows = []
    for v, chain in vgh.items():
        padded = list(chain) + [chain[-1] if chain else TOP] * (height - len(chain))
        rows.append((str(v), str(padded[level - 1])))
    dim = spark.createDataFrame(rows, "__raw string, __gen string")
    out = (
        df.withColumn("__raw", F.col(col).cast("string"))
        .join(F.broadcast(dim), "__raw", "left")
        .withColumn(col, F.coalesce(F.col("__gen"), F.lit(TOP)))
        .drop("__raw", "__gen")
    )
    return out.select(*df.columns)


def min_level_for_k(
    df: DataFrame,
    qi: Sequence[str],
    col: str,
    vgh: Mapping[str, Sequence[str]],
    k: int,
) -> tuple[int, DataFrame]:
    """Smallest level L such that generalizing ``col`` to level L makes
    the table k-anonymous on ``qi`` (which must include ``col``); returns
    ``(L, generalized_df)``. Raises if even the top level fails (then the
    OTHER QI columns need generalization or suppression — compose with
    ``k_anonymize_suppress``).

    Each probe aggregates the generalized QI keys (map-side combined, no
    fact-row shuffle) and checks ``min(class size) >= k`` — the Samarati
    lattice walk specialized to a single-attribute chain, linear instead
    of binary-searched because hierarchy heights are single-digit.
    """
    if col not in qi:
        raise ValueError("col must be one of the qi columns")
    if k < 1:
        raise ValueError("k must be >= 1")
    height = vgh_height(vgh)
    for level in range(height + 1):
        g = apply_vgh(df, col, vgh, level)
        min_size = (
            g.groupBy(*qi)
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.min("n").alias("m"))
            .collect()[0]["m"]
        )
        if min_size is not None and min_size >= k:
            return level, g
    raise ValueError(
        f"no level of {col!r} (height {height}) achieves {k}-anonymity on {list(qi)}; "
        "generalize further attributes or suppress residual classes"
    )
