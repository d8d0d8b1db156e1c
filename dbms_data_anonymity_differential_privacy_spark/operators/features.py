"""ML feature engineering over categorical columns — target encoding.

The reference stops at generalization hierarchies and binning (SURVEY
§2a P17-P19); a training-data pipeline also needs the supervised
encodings that turn high-cardinality categoricals into model features.
Target (mean) encoding with additive smoothing (Micci-Barreca, SIGKDD
Explorations 2001) is the workhorse: encode each category by its
shrunk outcome rate, pulling small categories toward the global prior
so rare levels don't memorize noise.

Exactness is engineered the repo-standard way: with an INTEGER (0/1)
target, the smoothed rate

    enc(c) = (hits_c + m·prior) / (n_c + m),  prior = H/N

is cleared of the inner division by multiplying through by N:

    enc(c) = (hits_c·N + m·H) / ((n_c + m)·N)

— numerator and denominator are exact DECIMAL(38,0) integers (x109
convention; int64 dies near hits·N ~ 1e18), so the release is ONE IEEE
division per category, bit-identical cross-engine.

Scale shape: ONE partial-aggregated groupBy over the fact table into a
categories-sized relation; the two global scalars ride a broadcast
cross join. The encoding table is the broadcast artifact downstream
feature joins consume — fact rows never shuffle to be encoded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ROUND_DP = 9
_DEC = "decimal(38,0)"


def target_encode(
    df: DataFrame,
    cat_col: str,
    target: Column,
    m: int = 20,
) -> DataFrame:
    """X144 — smoothed target-encoding table for ``cat_col`` against the
    binary ``target`` expression (must evaluate to 0/1 integers).

    ``m`` is the additive-smoothing pseudo-count: a category with n≪m
    encodes near the global prior, n≫m near its own rate. ``m=0`` is
    plain (unsmoothed) mean encoding.

    Output: ``(cat_col, n, hits, enc_r)``, one row per category.
    Join it back broadcast to encode fact rows.
    """
    if m < 0:
        raise ValueError(f"m must be >= 0, got {m}")
    per_cat = df.groupBy(cat_col).agg(
        F.count(F.lit(1)).alias("n"), F.sum(target).alias("hits")
    )
    tot = df.agg(
        F.count(F.lit(1)).alias("__N"), F.sum(target).alias("__H")
    )
    j = per_cat.crossJoin(F.broadcast(tot))
    num = (
        F.col("hits").cast(_DEC) * F.col("__N").cast(_DEC)
        + F.lit(m).cast(_DEC) * F.col("__H").cast(_DEC)
    )
    den = (F.col("n") + F.lit(m)).cast(_DEC) * F.col("__N").cast(_DEC)
    return j.select(
        cat_col,
        "n",
        F.col("hits").cast("long").alias("hits"),
        F.round(
            F.when(den > 0, num.cast("double") / den.cast("double")), ROUND_DP
        ).alias("enc_r"),
    )
