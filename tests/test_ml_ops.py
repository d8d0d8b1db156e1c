"""C3/C10 tolerance-band tests (SURVEY §5: never hash ML outputs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.clustering import cluster_anonymize
from dbms_data_anonymity_differential_privacy_spark.operators.utility import utility_accuracy
from dbms_data_anonymity_differential_privacy_spark.sources.readers import load_table

QI = ["c_nationkey", "c_mktsegment", "c_acctbal"]


def test_cluster_anonymize_shape(spark, sf0001):
    c = load_table(spark, sf0001, "customer")
    clustered, gen = cluster_anonymize(c, QI, n_clusters=10, seed=42)
    assert clustered.count() == c.count()  # no rows removed (reference quirk)
    assert set(clustered.columns) == set(c.columns) | {"cluster"}
    n_clusters = clustered.select("cluster").distinct().count()
    assert 1 < n_clusters <= 10
    gen_rows = gen.collect()
    assert len(gen_rows) == n_clusters
    # generalized ranges are "min-max" strings; sizes sum to row count
    assert sum(r.cluster_size for r in gen_rows) == c.count()
    for r in gen_rows:
        assert "-" in r.c_mktsegment or r.c_mktsegment  # range string present


def test_cluster_determinism_same_seed(spark, sf0001):
    c = load_table(spark, sf0001, "customer")
    a, _ = cluster_anonymize(c, QI, n_clusters=5, seed=42)
    b, _ = cluster_anonymize(c, QI, n_clusters=5, seed=42)
    joined = a.select("c_custkey", F.col("cluster").alias("ca")).join(
        b.select("c_custkey", F.col("cluster").alias("cb")), "c_custkey"
    )
    assert joined.filter(F.col("ca") != F.col("cb")).count() == 0


def test_utility_accuracy_band(spark, sf0001):
    from dbms_data_anonymity_differential_privacy_spark import bin_equal_width, k_anonymize_suppress

    b = bin_equal_width(load_table(spark, sf0001, "customer"), "c_acctbal", 5, "acctbal_bin")
    anon = k_anonymize_suppress(b, ["c_mktsegment", "acctbal_bin"], 5)
    row = utility_accuracy(
        b, anon, target="c_mktsegment", features=["c_nationkey", "c_acctbal", "acctbal_bin"]
    ).collect()[0]
    assert 0.0 <= row.accuracy_original <= 1.0
    assert 0.0 <= row.accuracy_anonymized <= 1.0
    assert abs(row.accuracy_drop - (row.accuracy_original - row.accuracy_anonymized)) < 1e-9
