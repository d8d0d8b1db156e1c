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

from typing import Sequence

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


def roc_auc(
    df: DataFrame,
    score_col: str,
    label: Column,
) -> DataFrame:
    """X147 — exact ROC-AUC of a score against a binary ``label``
    expression (0/1), by the rank formulation (AUC = the Mann-Whitney
    U statistic normalized; Hanley & McNeil 1982) — the model-quality
    scalar next to the decile gains table (x136).

    Tie-averaged ranks are handled the x109/x80 way: on the DISTINCT
    score-value relation, DOUBLED rank sums stay exact integers —

        AUC = (S2 - n_pos*(n_pos+1)) / (2*n_pos*n_neg)

    with ``S2 = sum over values of cnt_pos*(2*cum_before + cnt + 1)``
    summed in DECIMAL(38,0) (merge-order-proof; int64 dies near n²),
    and the release is ONE IEEE division. NULL when either class is
    empty.

    Shape: one groupBy collapses fact rows to the distinct-score
    relation; the rank cumsum windows that compact relation — fact rows
    never sort globally.

    Output (single row): ``(n_pos, n_neg, auc_r)``.
    """
    from pyspark.sql import Window

    # NULL scores rank nowhere and NULL ORDER BY position is engine-
    # dependent — exclude (fuzz-oracle finding, r10)
    per_v = (
        df.filter(F.col(score_col).isNotNull())
        .select(F.col(score_col).alias("__v"), label.alias("__y"))
        .groupBy("__v")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("__y").alias("pos"),
        )
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_v.withColumn(
        "cumb", F.coalesce(F.sum("cnt").over(w), F.lit(0))
    )
    s = ranked.agg(
        F.sum(
            (F.col("pos") * (2 * F.col("cumb") + F.col("cnt") + 1)).cast(_DEC)
        ).alias("s2"),
        F.sum("pos").cast(_DEC).alias("np"),
        F.sum(F.col("cnt") - F.col("pos")).cast(_DEC).alias("nn"),
    )
    num = F.col("s2") - F.col("np") * (F.col("np") + 1)
    den = 2 * F.col("np") * F.col("nn")
    return s.select(
        F.col("np").cast("long").alias("n_pos"),
        F.col("nn").cast("long").alias("n_neg"),
        F.round(
            F.when(den > 0, num.cast("double") / den.cast("double")), ROUND_DP
        ).alias("auc_r"),
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_cols: Sequence[str],
) -> DataFrame:
    """Pooled-reference quantile normalization (nearest-rank flavor):
    replace each row's value with the pooled distribution's order
    statistic at the row's within-group quantile, removing per-group
    distribution shift while preserving within-group rank order — the
    cross-source calibration step batch-effect pipelines use before
    comparing per-source metrics.

    Mapping is INTEGER-exact end to end: within-group rank r of n_g maps
    to pooled rank ``k = ceil(((2r-1) / (2 n_g)) · N)`` computed as
    ``((2r-1)·N + 2·n_g - 1) div (2·n_g)``, and the pooled order
    statistic comes from exploding the distinct-value count relation
    into an (k, value) rank table — an equi-join, never an inequality
    join. Shapes: one per-group window (fact shuffle on group), one
    distinct-value cumsum (slim), one N-row rank relation joined on k.

    Output: ``(*id_cols, group_col, value_col, qnorm)``.
    """
    from pyspark.sql import Window

    d = df.select(*id_cols, group_col, F.col(value_col).alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    pv = d.groupBy("__v").agg(F.count(F.lit(1)).alias("__t"))
    w_prev = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
    cum = pv.select(
        "__v", "__t", F.coalesce(F.sum("__t").over(w_prev), F.lit(0)).alias("__lo")
    )
    ranks = cum.select(
        F.col("__lo"),
        F.col("__v").alias("qnorm"),
        F.explode(F.sequence(F.lit(1), F.col("__t"))).alias("__i"),
    ).select((F.col("__lo") + F.col("__i")).alias("__k"), "qnorm")
    n_all = d.agg(F.count(F.lit(1)).alias("__n"))
    sizes = d.groupBy(group_col).agg(F.count(F.lit(1)).alias("__ng"))
    w_rank = Window.partitionBy(group_col).orderBy(
        F.col("__v").asc(), *[F.col(c).asc() for c in id_cols]
    )
    ranked = (
        d.withColumn("__r", F.row_number().over(w_rank))
        .join(F.broadcast(sizes), on=group_col)
        .crossJoin(F.broadcast(n_all))
        .withColumn(
            "__k",
            F.expr("((2 * __r - 1) * __n + 2 * __ng - 1) DIV (2 * __ng)"),
        )
    )
    return ranked.join(ranks, on="__k").select(
        *id_cols, group_col, F.col("__v").alias(value_col), "qnorm"
    )


def isotonic_calibration(
    df: DataFrame,
    score_col: str,
    label_col,
    n_bins: int = 40,
) -> DataFrame:
    """Isotonic (monotone non-decreasing) calibration curve: bin the
    score, then fit weighted PAVA to the per-bin positive rate — the
    standard score→probability calibrator (Zadrozny & Elkan 2002,
    pool-adjacent-violators).

    Exactness: labels are 0/1, so per-bin (positives, total) stay
    INTEGER through the fit; PAVA pools compare means by integer
    cross-multiplication (``s_i · n_j`` vs ``s_j · n_i``) — no float
    drift decides a pool — and every fitted value is an exact
    integer-ratio double. That makes the result equal, bit for bit, to
    the closed-form minimax characterization
    ``iso(i) = max_{j<=i} min_{k>=i} mean(y[j..k])`` a SQL oracle can
    evaluate over the bin relation.

    Scale shape: ONE fact aggregation to at most ``n_bins`` rows
    (map-side partial); the PAVA loop runs driver-side on that
    bounded-by-construction relation (x21/x29 bounded-collect
    discipline). Output: ``(bin, n, pos, rate_r, iso_r)`` per non-empty
    bin.
    """
    from ..functions.binning import bin_equal_width

    y = label_col if not isinstance(label_col, str) else F.col(label_col)
    binned = bin_equal_width(
        df.select(F.col(score_col), y.cast("long").alias("__y")),
        score_col,
        n_bins,
        out_col="__bin",
    )
    bins = (
        binned.groupBy(F.col("__bin").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__y").cast("long").alias("pos"),
        )
        .orderBy("bin")
        .collect()  # bounded: <= n_bins rows by construction
    )
    # Weighted PAVA over (pos, n) blocks with integer mean comparison.
    blocks: list[list[int]] = []  # [start_bin, pos, n]
    for r in bins:
        blocks.append([r.bin, r.pos, r.n])
        while len(blocks) >= 2 and (
            blocks[-2][1] * blocks[-1][2] >= blocks[-1][1] * blocks[-2][2]
        ):
            b = blocks.pop()
            blocks[-1][1] += b[1]
            blocks[-1][2] += b[2]
    fitted = {}
    starts = [b[0] for b in blocks] + [bins[-1].bin + 1 if bins else 0]
    for (s, p, n), nxt in zip(blocks, starts[1:]):
        for r in bins:
            if s <= r.bin < nxt:
                fitted[r.bin] = p / n
    spark = df.sparkSession
    out = spark.createDataFrame(
        [
            (r.bin, r.n, r.pos, round(r.pos / r.n, 9), round(fitted[r.bin], 9))
            for r in bins
        ],
        "bin INT, n BIGINT, pos BIGINT, rate_r DOUBLE, iso_r DOUBLE",
    )
    return out
