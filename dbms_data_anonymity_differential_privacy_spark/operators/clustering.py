"""Clustering-based anonymization — SURVEY §2b C3.

Reference (``clustering-anon.py:37-51``): label-encode categorical QIs →
standardize → KMeans(n_clusters=10, seed=42) → cluster id per row →
generalize each QI to its per-cluster "min-max" range string. The
reference never removes rows (suppression is *defined* but not applied,
SURVEY §3.2) and never joins the generalization back to rows — both quirks
preserved here: the row relation keeps raw values + cluster id, and the
generalization is a separate 10-row table.

Spark-first: StringIndexer / VectorAssembler / StandardScaler / MLlib
KMeans — all distributed; k-means|| init, Arrow-free JVM pipeline. Exact
cluster assignments won't bit-match sklearn (different init), so these are
rows-only checks (SURVEY §2 note on C3).

Scale: KMeans cost is O(rows x dims x k x iters) map-side + tiny reduces;
the generalization is one groupBy over k groups. Both fine at 100 TB with
sampled/mini-batch variants if iteration cost bites — the public API keeps
that swap internal.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_assign(
    df: DataFrame,
    qi: Sequence[str],
    n_clusters: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Fit KMeans on (indexed, scaled) QI columns; return ``df`` +
    ``cluster`` int column (reference ``clustering-anon.py:46-48``)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import StandardScaler, StringIndexer, VectorAssembler

    string_cols = [c for c, t in df.dtypes if c in qi and t == "string"]
    work = df
    feat_cols = []
    for c in qi:
        if c in string_cols:
            # LabelEncoder equivalent; handleInvalid keep → unseen at
            # transform time get their own index (not relevant for
            # fit==transform data, but correct for reuse).
            idx = StringIndexer(
                inputCol=c, outputCol=f"__idx_{c}", handleInvalid="keep", stringOrderType="alphabetAsc"
            )
            work = idx.fit(work).transform(work)
            feat_cols.append(f"__idx_{c}")
        else:
            feat_cols.append(c)
    assembled = VectorAssembler(inputCols=feat_cols, outputCol="__features_raw").transform(
        work
    )
    scaler = StandardScaler(
        inputCol="__features_raw", outputCol="__features", withMean=True, withStd=True
    )
    scaled = scaler.fit(assembled).transform(assembled)
    km = KMeans(k=n_clusters, seed=seed, featuresCol="__features", predictionCol="cluster")
    clustered = km.fit(scaled).transform(scaled)
    drop = [c for c in clustered.columns if c.startswith("__")]
    return clustered.drop(*drop)


def cluster_generalize(clustered: DataFrame, qi: Sequence[str]) -> DataFrame:
    """Per-cluster range generalization table (reference
    ``clustering-anon.py:51``): each QI → "min-max" string (lexicographic
    for strings, matching pandas object-series min/max), plus cluster_size.
    Pure built-ins — P19, no UDF."""
    aggs = [
        F.concat_ws(
            "-", F.min(c).cast("string"), F.max(c).cast("string")
        ).alias(c)
        for c in qi
    ]
    return clustered.groupBy("cluster").agg(
        *aggs, F.count(F.lit(1)).alias("cluster_size")
    )


def cluster_anonymize(
    df: DataFrame,
    qi: Sequence[str],
    n_clusters: int = 10,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """C3 — returns (rows-with-cluster, generalization-table)."""
    clustered = cluster_assign(df, qi, n_clusters, seed)
    return clustered, cluster_generalize(clustered, qi)
