"""Statistical analytics — grouped OLS trend fits and categorical
association measures, as exact aggregations.

The reference's only statistics are counts and means (SURVEY §2a); an
analytics engine needs at least trend estimation ("is this metric
drifting?") and association strength ("which columns predict which?") —
and at 100 TB both must be single-pass aggregations, not iterative
solvers. Both operators here reduce to sums the partial-aggregation
machinery handles natively, then do constant-size math on the group row.

Float policy: every released float is the result of a short, fixed
expression over exact integer/double sums, rounded to 9 dp on both
engines (the repo-wide convention; the sums themselves are
summation-order-stable to well under 1e-9 at these magnitudes).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUND_DP = 9


def group_ols(
    df: DataFrame,
    by: Sequence[str],
    x_col,
    y_col: str,
) -> DataFrame:
    """X63 — per-group simple linear regression by closed-form OLS.

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), intercept = ȳ − slope·x̄,
    r² = slope² · Sxx / Syy — one grouped aggregation computes the five
    sufficient statistics (n, Σx, Σy, Σxy, Σx²  [+ Σy² for r²]); the fit
    itself is constant work per group. This is THE scale shape for trend
    fitting: no gradient steps, no per-group solver, map-side partial
    combine all the way.

    ``x_col`` may be a column name or a Column expression (e.g. an
    hour-of-day derivation). Groups with zero x-variance release NULL
    slope/intercept/r2 (vertical fit); groups with zero y-variance
    release r2 NULL (undefined) with slope 0.

    Output: ``(*by, n, slope_r, intercept_r, r2_r)``.
    """
    x = F.col(x_col).cast("double") if isinstance(x_col, str) else x_col.cast("double")
    y = F.col(y_col).cast("double")
    agg = df.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
    )
    n = F.col("n").cast("double")
    sxx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    syy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    sxy = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    slope = F.when(sxx != 0, sxy / sxx)
    intercept = F.when(sxx != 0, (F.col("__sy") - slope * F.col("__sx")) / n)
    r2 = F.when((sxx != 0) & (syy != 0), (sxy * sxy) / (sxx * syy))
    return agg.select(
        *by,
        "n",
        F.round(slope, ROUND_DP).alias("slope_r"),
        F.round(intercept, ROUND_DP).alias("intercept_r"),
        F.round(r2, ROUND_DP).alias("r2_r"),
    )


def mutual_information(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """X64 — mutual information (nats) between two categorical columns,
    with the marginal entropies — the feature-selection / association
    screen (MI = 0 iff independent; MI = min(H) iff one determines the
    other).

    I(A;B) = Σ p(a,b) · ln( p(a,b) / (p(a)·p(b)) ) over the observed
    joint support. One fact aggregation to the (a, b, count) relation;
    marginals and the MI sum derive from that slim relation (window sums
    + one rollup — the counts-relation algebra of the t-closeness
    family). NULLs are treated as a category (disclosed; they carry
    association signal).

    p(a,b)/(p(a)p(b)) telescopes to ``c_ab · N / (c_a · c_b)`` — exact
    int64 products, ONE division and one ln per support cell, so the
    only float noise is the final sum, absorbed by the 9 dp rounding.

    Output (single row): ``(n, n_cells, h_a_r, h_b_r, mi_r)``.
    """
    from pyspark.sql import Window

    joint = df.groupBy(
        F.col(a_col).alias("__a"), F.col(b_col).alias("__b")
    ).agg(F.count(F.lit(1)).alias("__c"))
    wa = Window.partitionBy("__a")
    wb = Window.partitionBy("__b")
    wall = Window.partitionBy()
    cells = (
        joint.withColumn("__ca", F.sum("__c").over(wa))
        .withColumn("__cb", F.sum("__c").over(wb))
        .withColumn("__n", F.sum("__c").over(wall))
        # one marked cell per marginal value, so the entropy sums below
        # count each marginal term exactly once (windows are illegal
        # inside the final agg, hence the precomputed marks)
        .withColumn("__ma", F.row_number().over(wa.orderBy("__b")) == 1)
        .withColumn("__mb", F.row_number().over(wb.orderBy("__a")) == 1)
    )
    n = F.col("__n").cast("double")
    p_ab = F.col("__c") / n
    # ln(c_ab * N / (c_a * c_b)) — integer products inside one log
    ratio = (F.col("__c") * F.col("__n")).cast("double") / (
        F.col("__ca") * F.col("__cb")
    ).cast("double")
    pa = F.col("__ca") / n
    pb = F.col("__cb") / n
    return cells.agg(
        F.max("__n").cast("long").alias("n"),
        F.count(F.lit(1)).alias("n_cells"),
        F.round(-F.sum(F.when(F.col("__ma"), pa * F.log(pa)).otherwise(0.0)), ROUND_DP).alias(
            "h_a_r"
        ),
        F.round(-F.sum(F.when(F.col("__mb"), pb * F.log(pb)).otherwise(0.0)), ROUND_DP).alias(
            "h_b_r"
        ),
        F.round(F.sum(p_ab * F.log(ratio)), ROUND_DP).alias("mi_r"),
    )
