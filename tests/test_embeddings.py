"""X44/X45 — embedding quantization + label centroids."""

from __future__ import annotations

import numpy as np
import pytest

from dbms_data_anonymity_differential_privacy_spark.operators.embeddings import (
    assemble_centroids,
    centroid_sums,
    dequantize,
    label_centroids,
    quantization_error,
    quantize_embeddings,
)


@pytest.fixture(scope="module")
def emb(spark, sf001):
    return spark.read.parquet(f"{sf001}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_pdf(emb):
    return emb.toPandas()


def test_codes_bounded_and_scale_is_maxabs(emb, emb_pdf):
    out = quantize_embeddings(emb).select("vec_id", "qvec", "q_scale").toPandas()
    assert out["qvec"].map(lambda q: max(abs(int(v)) for v in q)).max() <= 127
    # every vector's max-|code| hits exactly 127 (the element at max-abs)
    assert out["qvec"].map(lambda q: max(abs(int(v)) for v in q)).min() == 127
    merged = out.merge(emb_pdf, on="vec_id")
    np.testing.assert_allclose(
        merged["q_scale"],
        merged["embedding"].map(lambda v: np.abs(np.asarray(v, dtype=np.float64)).max()),
        rtol=0,
        atol=0,
    )


def test_reconstruction_error_bound(emb):
    # symmetric scalar quantization error is <= 0.5/qmax of scale by construction
    errs = quantization_error(emb).select("rel_err").toPandas()["rel_err"]
    assert float(errs.max()) <= 0.5 / 127 + 1e-12


def test_dequantize_roundtrip_close(emb, emb_pdf):
    rec = dequantize(quantize_embeddings(emb)).select("vec_id", "vec_approx").toPandas()
    merged = rec.merge(emb_pdf, on="vec_id")
    for _, r in merged.head(50).iterrows():
        a = np.asarray(r["embedding"], dtype=np.float64)
        b = np.asarray(r["vec_approx"], dtype=np.float64)
        assert np.abs(a - b).max() <= np.abs(a).max() * (0.5 / 127) + 1e-12


def test_centroid_sums_match_numpy(emb, emb_pdf):
    q = quantize_embeddings(emb)
    sums = centroid_sums(q).toPandas()
    codes = q.select("label", "qvec").toPandas()
    for label in codes["label"].unique()[:3]:
        mat = np.array(codes[codes["label"] == label]["qvec"].tolist(), dtype=np.int64)
        got = sums[sums["label"] == label].sort_values("pos")
        assert (got["n"] == mat.shape[0]).all()
        np.testing.assert_array_equal(got["sum_q"].to_numpy(), mat.sum(axis=0))


def test_assemble_centroids_consistent(emb):
    q = quantize_embeddings(emb)
    sums = centroid_sums(q)
    arr = assemble_centroids(sums).toPandas()
    long = sums.toPandas()
    row = arr[arr["label"] == int(long["label"].iloc[0])].iloc[0]
    sub = long[long["label"] == int(long["label"].iloc[0])].sort_values("pos")
    np.testing.assert_allclose(
        np.asarray(row["centroid"]),
        (sub["sum_q"] / sub["n"] / 127.0).to_numpy(),
        rtol=1e-12,
    )


def test_label_centroids_match_numpy(emb, emb_pdf):
    got = label_centroids(emb).toPandas()
    for _, r in got.iterrows():
        mat = np.array(
            emb_pdf[emb_pdf["label"] == r["label"]]["embedding"].tolist(),
            dtype=np.float64,
        )
        assert r["n"] == mat.shape[0]
        np.testing.assert_allclose(np.asarray(r["centroid"]), mat.mean(axis=0), rtol=1e-6)


def test_zero_vector_guard(spark):
    df = spark.createDataFrame([(0, [0.0, 0.0]), (1, [1.0, -2.0])], "vec_id long, embedding array<double>")
    out = quantize_embeddings(df).orderBy("vec_id").collect()
    assert out[0]["q_scale"] == 0.0 and list(out[0]["qvec"]) == [0, 0]
    assert out[1]["q_scale"] == 2.0 and list(out[1]["qvec"]) == [64, -127]


def test_quantize_is_map_only(emb):
    plan = quantize_embeddings(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_label_consistency_crafted(spark):
    """X122: clean cluster members agree with neighbors; a mislabeled
    vector inside a foreign cluster scores 0; self excluded."""
    import math

    def vec(angle):
        return [math.cos(angle), math.sin(angle)]

    # cluster A near angle 0 (label 1), cluster B near pi/2 (label 2),
    # one planted mislabel: vector 10 sits in cluster A but carries label 2
    rows = (
        [(i, vec(0.01 * i), 1) for i in range(4)]
        + [(10, vec(0.02), 2)]
        + [(20 + i, vec(1.57 + 0.01 * i), 2) for i in range(4)]
    )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    from dbms_data_anonymity_differential_privacy_spark.operators.embeddings import label_consistency

    out = {r.vec_id: r for r in label_consistency(emb, emb, k=3, impl="sql").collect()}
    assert out[10].label == 2 and out[10].agreement_r == 0.0   # planted mislabel
    assert out[0].agreement_r >= 2 / 3                         # clean A member
    assert out[20].agreement_r >= 2 / 3                        # clean B member
    assert all(r.n_neighbors == 3 for r in out.values())
