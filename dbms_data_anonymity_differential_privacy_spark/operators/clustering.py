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


def encode_scale(
    df: DataFrame,
    qi: Sequence[str],
    id_col: str,
    money_cols: Sequence[str] = (),
    round_to: int = 9,
) -> DataFrame:
    """C3's deterministic encode/standardize PREFIX as an oracle-checkable
    relation (reference ``clustering-anon.py:41-45``): label-encode string
    QIs exactly like :func:`cluster_assign`'s StringIndexer
    (``alphabetAsc`` — index = 0-based rank of the value among the sorted
    distinct values), then standardize every feature like its
    StandardScaler (``withMean=True, withStd=True`` — subtract the mean,
    divide by the SAMPLE std). Only the KMeans step after this projection
    is genuinely non-SQL (rows-only by the SURVEY §2 contract); splitting
    the prefix out shrinks the unchecked surface to the solver alone.

    Output: ``(id_col, <c>_idx for each string QI, <c>_scaled_r for every
    QI)`` — scaled values at 9 dp. Rows with a NULL string QI are
    DROPPED (dictionary excludes NULL + inner join), mirroring
    StringIndexer's default ``handleInvalid="error"`` refusal to encode
    NULL — they never reach the moments either.

    Cross-engine exactness: every feature is first mapped to an exact
    int64 domain (string → dictionary index, ``money_cols`` → cents via
    ``round(x*100)``, ints as-is), so the sufficient statistics
    ``(n, Σx, Σx²)`` are exact integer sums whatever the partial-agg
    order; mean/std/scaled are then single fixed IEEE expressions over
    those integers. Standardization is scale-invariant, so the cents
    domain releases the same scaled values as the raw-dollars MLlib
    pipeline (pinned against the real StringIndexer+StandardScaler
    stages in pytest at rtol 1e-6). Int64 bound: Σx² stays exact below
    ~9e18 / max(x²) rows (documented, the x191 class).

    Scale shape (100 TB): the dictionary is a distinct over the string
    QI (metadata-sized, broadcast back); the moments are ONE map-side
    partially-combined aggregation; scaling is a map-only projection
    against the broadcast 1-row moment relation. No UDFs, no MLlib —
    whole-stage codegen end to end.
    """
    from pyspark.sql import Window

    work = df
    int_cols: list[tuple[str, str]] = []  # (qi name, int64 working col)
    idx_out: list[str] = []
    for c in qi:
        dt = dict(df.dtypes)[c]
        if dt == "string":
            # NULLs are excluded from the dictionary: Spark's ascending
            # window ranks NULL FIRST (shifting every real label's index
            # off the documented StringIndexer(alphabetAsc) parity) while
            # DuckDB's DENSE_RANK ranks NULL LAST — and StringIndexer's
            # default handleInvalid="error" rejects NULLs outright. The
            # inner join below then drops NULL-QI rows from the output
            # AND the moments, which is the documented contract: rows
            # with a NULL string QI are not encodable (round-8 advisory).
            dict_rel = (
                df.select(F.col(c)).where(F.col(c).isNotNull()).distinct()
                .withColumn(
                    f"{c}_idx",
                    (F.dense_rank().over(Window.orderBy(F.col(c))) - 1).cast("long"),
                )
            )
            work = work.join(F.broadcast(dict_rel), on=c)
            int_cols.append((c, f"{c}_idx"))
            idx_out.append(f"{c}_idx")
        elif c in money_cols:
            work = work.withColumn(
                f"__i_{c}", F.round(F.col(c) * 100.0, 0).cast("long")
            )
            int_cols.append((c, f"__i_{c}"))
        else:
            work = work.withColumn(f"__i_{c}", F.col(c).cast("long"))
            int_cols.append((c, f"__i_{c}"))
    moments = work.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        *[
            a
            for _, ic in int_cols
            for a in (
                F.sum(ic).cast("long").alias(f"__s1_{ic}"),
                F.sum(F.col(ic) * F.col(ic)).cast("long").alias(f"__s2_{ic}"),
            )
        ],
    )
    scaled = work.join(F.broadcast(moments))
    nd = F.col("__n").cast("double")
    outs = [F.col(id_col)] + [F.col(c) for c in idx_out]
    for c, ic in int_cols:
        s1 = F.col(f"__s1_{ic}").cast("double")
        s2 = F.col(f"__s2_{ic}").cast("double")
        mean = s1 / nd
        var = (s2 - s1 * s1 / nd) / (nd - F.lit(1.0))
        std = F.sqrt(var)
        outs.append(
            F.round(
                F.when(std > 0.0, (F.col(ic).cast("double") - mean) / std).otherwise(
                    F.lit(0.0)
                ),
                round_to,
            ).alias(f"{c}_scaled_r")
        )
    return scaled.select(*outs)
