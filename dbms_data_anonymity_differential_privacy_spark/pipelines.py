"""End-to-end pipeline composites — one per reference entry point.

A user of the reference runs three scripts top-to-bottom; each function
here is the Spark-native equivalent of one script (SURVEY §3.1-§3.3),
returning the anonymized relation plus a single-row metrics relation with
the same metric definitions the script prints. Everything stays lazy; the
metrics row is the only thing a caller should collect.

| function | reference entry point |
|---|---|
| ``naive_suppression_pipeline`` | ``naive-suppresion.py`` (full trace §3.1) |
| ``clustering_pipeline`` | ``clustering-anon.py`` (§3.2, quirks preserved) |
| ``t_closeness_pipeline`` | ``t-closeness.py`` (§3.3; strict + reference modes) |

The ML utility-accuracy step (C10) is deliberately NOT run inside the
pipelines — it trains a RandomForest and belongs to an explicit
``operators.utility.utility_accuracy`` call (the reference runs it inline,
which makes every anonymization pay for a model fit).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.functions.binning import bin_equal_width
from dbms_data_anonymity_differential_privacy_spark.operators.clustering import cluster_anonymize
from dbms_data_anonymity_differential_privacy_spark.operators.kanonymity import (
    class_sizes,
    k_anonymize_suppress,
    with_class_size,
)
from dbms_data_anonymity_differential_privacy_spark.operators.metrics import (
    ncp,
    reid_risk,
    suppression_rate,
    uniqueness_rate,
)
from dbms_data_anonymity_differential_privacy_spark.operators.tcloseness import (
    ROUND_DP as _ROUND_DP,
    _emd_from_counts,
)

ROUND_DP = 9


def _one_row(*dfs: DataFrame) -> DataFrame:
    """Combine single-row metric DataFrames into one row. Each side is one
    row → broadcast cross joins, no shuffle."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.crossJoin(F.broadcast(d))
    return out


def naive_suppression_pipeline(
    df: DataFrame, qi: Sequence[str], k: int = 5
) -> dict[str, DataFrame]:
    """Reference ``naive-suppresion.py`` end to end (SURVEY §3.1):
    null-drop → k-anonymity suppression → privacy metrics.

    Returns ``{"anonymized": rows, "metrics": one-row}`` where metrics has
    ``n_orig, n_anon, suppression_rate`` (:47-49), ``min_class_size,
    k_satisfied`` (:56), ``uniqueness_rate`` rows-denominator (:60-62),
    ``reid_risk`` (:64-69), ``ncp`` (:74-83).

    The cleaned input feeds four metric aggregates — callers running the
    metrics should expect one scan per aggregate group; at scale, persist
    the cleaned relation first if the source is not columnar.
    """
    clean = df.na.drop("any")
    # five metric aggregates consume the anonymized relation — pin it
    anon = k_anonymize_suppress(clean, qi, k).persist()

    post_sizes = class_sizes(anon, qi)
    kcheck = post_sizes.agg(
        F.coalesce(F.min("class_size"), F.lit(0)).alias("min_class_size"),
        F.coalesce(F.min("class_size") >= k, F.lit(False)).alias("k_satisfied"),
    )
    metrics = _one_row(
        suppression_rate(clean, anon),
        kcheck,
        uniqueness_rate(anon, qi, denominator="rows"),
        reid_risk(anon, qi),
        ncp(clean, anon, qi),
    )
    return {"anonymized": anon, "metrics": metrics}


def clustering_pipeline(
    df: DataFrame,
    qi: Sequence[str],
    n_clusters: int = 10,
    k: int = 5,
    seed: int = 42,
) -> dict[str, DataFrame]:
    """Reference ``clustering-anon.py`` end to end (SURVEY §3.2), quirks
    preserved: rows are never removed (suppression is *measured* over
    clusters smaller than k, :78-81) and the generalization table is a
    separate k_clusters-row relation never joined back (:51).

    Metrics row: ``k_satisfied`` (min cluster size >= k, :63),
    ``uniqueness_rate`` = singleton clusters / n_clusters (:67-69),
    ``reid_risk`` = mean over rows of 1/cluster size (:71-75),
    ``suppression_rate`` = rows in clusters < k / total rows (:78-81),
    ``ncp`` = per-QI (nunique original - nunique *ranges*)/nunique original
    (:85-88 — note the anon side counts distinct range strings in the
    10-row generalization table, not row values).
    """
    clustered, generalized = cluster_anonymize(df, qi, n_clusters, seed)
    # The clustered relation feeds every metric below; its lineage contains
    # an MLlib model transform → always worth pinning.
    clustered = clustered.persist()

    sizes = class_sizes(clustered, ["cluster"])
    kcheck = sizes.agg(
        (F.min("class_size") >= k).alias("k_satisfied"),
        F.round(
            F.sum(F.when(F.col("class_size") == 1, 1).otherwise(0)) / F.lit(n_clusters),
            ROUND_DP,
        ).alias("uniqueness_rate"),
    )
    risk = reid_risk(clustered, ["cluster"])
    suppressed = with_class_size(clustered, ["cluster"], "__csize").agg(
        F.round(
            F.sum(F.when(F.col("__csize") < k, 1).otherwise(0)) / F.count(F.lit(1)),
            ROUND_DP,
        ).alias("suppression_rate")
    )
    # NCP with the generalization table as the anonymized side (:85-88).
    ncp_df = ncp(clustered, generalized, qi)

    metrics = _one_row(kcheck, risk, suppressed, ncp_df)
    return {"anonymized": clustered, "generalization": generalized, "metrics": metrics}


def t_closeness_pipeline(
    df: DataFrame,
    qi: Sequence[str],
    sensitive: str,
    k: int = 5,
    t: float = 0.2,
    bin_spec: Mapping[str, int] | None = None,
    mode: str = "strict",
) -> dict[str, DataFrame]:
    """Reference ``t-closeness.py`` end to end (SURVEY §3.3): null-drop →
    equal-width binning of numeric QIs (age→5, capital→3 in the reference,
    :36-40) → k-anonymity → t-closeness filter → metrics.

    ``bin_spec`` maps column → n_bins; each binned column replaces the raw
    column in the QI set as ``<col>_bin``. ``mode`` follows
    ``t_closeness_filter`` (SURVEY §3.4: 'strict' = intended EMD semantics,
    'reference' = as-written k-filter-only).

    Metrics row: ``n_orig, n_anon, suppression_rate`` (:223-224),
    ``uniqueness_rate`` classes-denominator (:211-214), ``ncp`` (:226-234),
    ``violations / total_groups / violation_rate`` vs the *post-filter*
    table distribution (:186-208).
    """
    clean = df.na.drop("any")
    work = clean
    eff_qi = list(qi)
    for col, n_bins in (bin_spec or {}).items():
        out = f"{col}_bin"
        work = bin_equal_width(work, col, n_bins, out)
        eff_qi = [out if c == col else c for c in eff_qi]

    # ONE fact-table aggregation: the (class, sensitive, count) relation
    # feeds the k-filter, both EMD chains (filter verdicts + post-filter
    # violation report), and every count-derived metric (n_orig, n_anon,
    # suppression, uniqueness). Composing the standalone operators instead
    # would re-aggregate the fact table once per metric; at 100 TB that is
    # the difference between one big-table pass for counting and four.
    # Only NCP (distinct *values* per column) and the anonymized output
    # itself need the fact rows again.
    counts = (
        work.groupBy(*eff_qi, sensitive).agg(F.count(F.lit(1)).alias("__cnt")).persist()
    )
    sizes = counts.groupBy(*eff_qi).agg(F.sum("__cnt").alias("__class_size"))
    big = sizes.filter(F.col("__class_size") >= F.lit(k)).select(*eff_qi)
    if mode == "reference":
        ok = big  # SURVEY §3.4: as-written pipeline = k-filter only
    else:
        kcounts = counts.join(F.broadcast(big), on=eff_qi, how="left_semi")
        ok = (
            _emd_from_counts(kcounts, eff_qi, sensitive)
            .filter(F.col("emd") <= F.lit(t))
            .select(*eff_qi)
        )
    post_counts = counts.join(F.broadcast(ok), on=eff_qi, how="left_semi").persist()
    anon = work.join(F.broadcast(ok), on=eff_qi, how="left_semi").persist()

    # metric definitions identical to suppression_rate / uniqueness_rate /
    # t_violations (operators/metrics.py, operators/tcloseness.py), just
    # sourced from the counts relation instead of fact rows.
    n_orig = counts.agg(F.coalesce(F.sum("__cnt"), F.lit(0)).alias("__n_orig"))
    n_anon = post_counts.agg(F.coalesce(F.sum("__cnt"), F.lit(0)).alias("__n_anon"))
    supp = n_orig.crossJoin(F.broadcast(n_anon)).select(
        F.col("__n_orig").alias("n_orig"),
        F.col("__n_anon").alias("n_anon"),
        F.round(
            (F.col("__n_orig") - F.col("__n_anon")) / F.col("__n_orig"), _ROUND_DP
        ).alias("suppression_rate"),
    )
    post_sizes = post_counts.groupBy(*eff_qi).agg(F.sum("__cnt").alias("class_size"))
    uniq = post_sizes.agg(
        F.round(
            F.sum(F.when(F.col("class_size") == 1, 1).otherwise(0)) / F.count(F.lit(1)),
            _ROUND_DP,
        ).alias("uniqueness_rate")
    )
    viol = _emd_from_counts(post_counts, eff_qi, sensitive).agg(
        F.sum(F.when(F.col("emd") > t, 1).otherwise(0)).alias("violations"),
        F.count(F.lit(1)).alias("total_groups"),
        F.round(
            F.sum(F.when(F.col("emd") > t, 1).otherwise(0)) / F.count(F.lit(1)), _ROUND_DP
        ).alias("violation_rate"),
    )
    metrics = _one_row(supp, uniq, ncp(work, anon, eff_qi), viol)
    return {"anonymized": anon, "metrics": metrics}
