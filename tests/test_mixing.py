"""Invariants for corpus mixture reweighting (operators/mixing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark import load_table
from dbms_data_anonymity_differential_privacy_spark.operators.mixing import (
    apply_mixture,
    mixture_rates,
)


def _corpus(spark):
    rows = (
        [(i, f"doc {i}", "en") for i in range(800)]
        + [(1000 + i, f"doc {1000 + i}", "de") for i in range(150)]
        + [(2000 + i, f"doc {2000 + i}", "fr") for i in range(50)]
    )
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


TARGET = {"en": 0.5, "de": 0.3, "fr": 0.2}


def test_rates_realize_target_mixture(spark):
    df = _corpus(spark)
    rates = {r["lang"]: r for r in mixture_rates(df, "lang", TARGET).collect()}
    # fr is the scarcest group relative to its share: T = 50/0.2 = 250
    assert rates["fr"]["rate"] == 1.0
    assert rates["fr"]["take_rows"] == 50
    assert rates["en"]["take_rows"] == 125  # 250 * 0.5
    assert rates["de"]["take_rows"] == 75  # 250 * 0.3
    # realized mixture == target exactly
    total = sum(r["take_rows"] for r in rates.values())
    assert [rates[g]["take_rows"] / total for g in ("en", "de", "fr")] == [0.5, 0.3, 0.2]


def test_untargeted_group_gets_rate_zero(spark):
    df = _corpus(spark).withColumn(
        "lang", F.when(F.col("doc_id") % 7 == 0, "xx").otherwise(F.col("lang"))
    )
    rates = {r["lang"]: r["rate"] for r in mixture_rates(df, "lang", TARGET).collect()}
    assert rates["xx"] == 0.0


def test_invalid_shares_rejected(spark):
    df = _corpus(spark)
    with pytest.raises(ValueError):
        mixture_rates(df, "lang", {})
    with pytest.raises(ValueError):
        mixture_rates(df, "lang", {"en": 0.9, "de": 0.3})
    with pytest.raises(ValueError):
        mixture_rates(df, "lang", {"en": -0.1})


def test_apply_mixture_is_deterministic_and_close_to_target(spark):
    df = _corpus(spark)
    out1 = apply_mixture(df, "lang", TARGET, key_cols=["doc_id"])
    out2 = apply_mixture(df, "lang", TARGET, key_cols=["doc_id"])
    ids1 = sorted(r["doc_id"] for r in out1.collect())
    assert ids1 == sorted(r["doc_id"] for r in out2.collect())
    got = {r["lang"]: r["n"] for r in out1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # within hash-quantization noise of the exact take_rows
    assert got["fr"] == 50  # rate 1.0: everything kept
    assert abs(got["en"] - 125) <= 30
    assert abs(got["de"] - 75) <= 25
    # repartitioning must not change membership (content-hash contract)
    ids3 = sorted(
        r["doc_id"] for r in apply_mixture(df.repartition(13), "lang", TARGET, ["doc_id"]).collect()
    )
    assert ids3 == ids1


def test_apply_mixture_drops_untargeted(spark):
    df = _corpus(spark).withColumn(
        "lang", F.when(F.col("doc_id") % 7 == 0, "xx").otherwise(F.col("lang"))
    )
    out = apply_mixture(df, "lang", TARGET, key_cols=["doc_id"])
    assert out.filter(F.col("lang") == "xx").count() == 0


def test_temperature_rates_direction_and_sample(spark, sf0001):
    """x86: alpha < 1 thins the head group (rate < 1) and keeps the
    smallest group whole (rate == 1); alpha == 1 is the identity mix;
    realized per-group keeps track rate*n within hash quantization; the
    sample is layout-independent."""
    import math

    from dbms_data_anonymity_differential_privacy_spark.operators.mixing import (
        temperature_rates,
        temperature_sample,
    )

    docs = load_table(spark, sf0001, "documents")
    rates = temperature_rates(docs, "lang", 0.7)
    by_g = {g: (n, r) for g, n, r in rates}
    n_min_g = min(by_g, key=lambda g: by_g[g][0])
    n_max_g = max(by_g, key=lambda g: by_g[g][0])
    assert by_g[n_min_g][1] == 1.0
    assert by_g[n_max_g][1] < 1.0
    # alpha=1: natural mix, every rate exactly 1
    assert all(r == 1.0 for _, _, r in temperature_rates(docs, "lang", 1.0))

    kept = temperature_sample(docs, "lang", ["doc_id"], 0.7).collect()
    from collections import Counter

    got = Counter(r.lang for r in kept)
    for g, (n, r) in by_g.items():
        expect = r * n
        assert abs(got[g] - expect) <= 4 * math.sqrt(n) + 1, (g, got[g], expect)

    re_kept = {
        r.doc_id
        for r in temperature_sample(
            docs.repartition(13), "lang", ["doc_id"], 0.7
        ).collect()
    }
    assert re_kept == {r.doc_id for r in kept}

    import pytest

    with pytest.raises(ValueError, match="in \\(0, 1\\]"):
        temperature_rates(docs, "lang", 0.0)
