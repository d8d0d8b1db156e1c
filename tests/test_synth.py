"""Tests for X36 DP synthetic data generation (operators/synth.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.dp import BudgetExceededError, PrivacyBudget
from dbms_data_anonymity_differential_privacy_spark.operators.synth import dp_marginals, dp_synthesize

DOMAINS = {"color": ["red", "green", "blue"], "size": ["S", "M", "L"]}


@pytest.fixture(scope="module")
def priv(spark):
    rows = (
        [("red", "S")] * 50
        + [("red", "M")] * 30
        + [("green", "M")] * 15
        + [("blue", "L")] * 5
        + [("purple", "XXL")] * 7  # outside the public domains
    )
    return spark.createDataFrame(rows, "color string, size string")


def test_marginals_public_domain_and_zero_cells(priv):
    out = dp_marginals(priv, DOMAINS, epsilon=1.0, release="m1")
    rows = {(r.column, r.value): r for r in out.collect()}
    # exactly the public cells, nothing data-derived
    assert set(rows) == {("color", v) for v in DOMAINS["color"]} | {
        ("size", v) for v in DOMAINS["size"]
    }
    assert rows[("color", "red")].count_exact == 80
    assert rows[("size", "L")].count_exact == 5
    # out-of-domain values contribute nothing, but the cell is still there
    assert rows[("size", "S")].count_exact == 50
    # noise applied
    assert any(r.count_dp != r.count_exact for r in rows.values())


def test_marginals_validate_domains(priv):
    with pytest.raises(ValueError):
        dp_marginals(priv, {}, epsilon=1.0, release="m2")
    with pytest.raises(ValueError):
        dp_marginals(priv, {"color": []}, epsilon=1.0, release="m3")
    with pytest.raises(ValueError):
        dp_marginals(priv, {"color": ["a", "a"]}, epsilon=1.0, release="m4")
    with pytest.raises(ValueError):
        dp_marginals(priv, {"color": [str(i) for i in range(1000)]}, epsilon=1.0, release="m5")


def test_synthesize_deterministic_and_schema(spark, priv):
    a = dp_synthesize(spark, priv, DOMAINS, epsilon=5.0, n_out=200, release="s1")
    b = dp_synthesize(spark, priv, DOMAINS, epsilon=5.0, n_out=200, release="s1")
    assert a.columns == ["color", "size"]
    assert a.count() == 200
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]
    # repartitioned generation is identical (hash-uniforms, not rand())
    c = dp_synthesize(spark, priv, DOMAINS, epsilon=5.0, n_out=200, release="s1").repartition(7)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, c.collect()))
    # values come only from the public domains
    vals = {r.color for r in a.collect()}
    assert vals <= set(DOMAINS["color"])


def test_synthesize_preserves_marginals_at_high_epsilon(spark, priv):
    out = dp_synthesize(spark, priv, DOMAINS, epsilon=1e6, n_out=4000, release="s2")
    freq = {r.color: r.n for r in out.groupBy("color").agg(F.count("*").alias("n")).collect()}
    # true in-domain shares: red 80/100, green 15/100, blue 5/100
    assert freq["red"] / 4000 == pytest.approx(0.80, abs=0.03)
    assert freq["green"] / 4000 == pytest.approx(0.15, abs=0.03)
    assert freq.get("blue", 0) / 4000 == pytest.approx(0.05, abs=0.03)


def test_synthesize_budget_accounting(spark, priv):
    budget = PrivacyBudget(1.0)
    dp_synthesize(spark, priv, DOMAINS, epsilon=0.7, n_out=10, budget=budget)
    assert budget.spent == pytest.approx(0.7)
    with pytest.raises(BudgetExceededError):
        dp_synthesize(spark, priv, DOMAINS, epsilon=0.7, n_out=10, budget=budget)


def test_synthesize_empty_table_still_yields_domain_values(spark):
    """Empty private data: the noisy marginal is pure clamped noise (or,
    if every draw clamps to zero, the uniform fallback) — either way the
    synthesizer must emit n_out rows drawn from the PUBLIC domain."""
    empty = spark.createDataFrame([], "color string, size string")
    out = dp_synthesize(
        spark, empty, {"color": ["red", "blue"]}, epsilon=1e9, n_out=400, release="s3"
    )
    rows = out.collect()
    assert len(rows) == 400
    assert {r.color for r in rows} <= {"red", "blue"}


def test_zero_mass_fallback_is_uniform(spark, priv):
    """Drive the all-zero branch directly: weights clamp to zero when every
    noisy count is <= 0, and the sampler then falls back to uniform."""
    from unittest import mock

    import dbms_data_anonymity_differential_privacy_spark.operators.synth as synth_mod

    real = synth_mod.dp_marginals

    def zeroed(*a, **kw):
        return real(*a, **kw).withColumn("count_dp", F.lit(-1.0))

    with mock.patch.object(synth_mod, "dp_marginals", side_effect=zeroed):
        out = dp_synthesize(
            spark, priv, {"color": ["red", "blue"]}, epsilon=1.0, n_out=400, release="s5"
        )
        freq = {r.color: r.n for r in out.groupBy("color").agg(F.count("*").alias("n")).collect()}
    assert freq["red"] / 400 == pytest.approx(0.5, abs=0.1)
    assert freq["blue"] / 400 == pytest.approx(0.5, abs=0.1)


def test_synthesize_single_value_domain(spark, priv):
    out = dp_synthesize(
        spark, priv, {"color": ["onlyval"]}, epsilon=1.0, n_out=5, release="s4"
    )
    assert {r.color for r in out.collect()} == {"onlyval"}


def test_chain_synthesis_preserves_correlation(spark):
    """Perfectly correlated columns: independent-marginal synthesis breaks
    the dependency, the Bayes-chain model keeps it."""
    from dbms_data_anonymity_differential_privacy_spark.operators.synth import dp_synthesize_chain

    rows = [("red", "S")] * 50 + [("green", "L")] * 50
    df = spark.createDataFrame(rows, "color string, size string")
    doms = {"color": ["red", "green"], "size": ["S", "L"]}
    out = dp_synthesize_chain(
        spark, df, ["color", "size"], doms, epsilon=1e6, n_out=2000, release="c1"
    )
    pairs = {(r.color, r.size): r.n for r in out.groupBy("color", "size").agg(F.count("*").alias("n")).collect()}
    # the off-diagonal cells (red,L)/(green,S) should be (near) absent
    assert pairs.get(("red", "L"), 0) + pairs.get(("green", "S"), 0) < 2000 * 0.02
    # and the diagonal split ~50/50
    assert pairs[("red", "S")] / 2000 == pytest.approx(0.5, abs=0.05)
    # independent model on the same data scatters ~25% into each cell
    ind = dp_synthesize(spark, df, doms, epsilon=1e6, n_out=2000, release="c2")
    ip = {(r.color, r.size): r.n for r in ind.groupBy("color", "size").agg(F.count("*").alias("n")).collect()}
    assert ip.get(("red", "L"), 0) / 2000 == pytest.approx(0.25, abs=0.05)


def test_chain_synthesis_deterministic_and_budget(spark, priv):
    from dbms_data_anonymity_differential_privacy_spark.operators.synth import dp_synthesize_chain

    a = dp_synthesize_chain(
        spark, priv, ["color", "size"], DOMAINS, epsilon=2.0, n_out=100, release="c3"
    )
    b = dp_synthesize_chain(
        spark, priv, ["color", "size"], DOMAINS, epsilon=2.0, n_out=100, release="c3"
    )
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]
    assert a.columns == ["color", "size"]
    budget = PrivacyBudget(1.0)
    dp_synthesize_chain(
        spark, priv, ["color", "size"], DOMAINS, epsilon=0.9, n_out=10, budget=budget
    )
    assert budget.spent == pytest.approx(0.9)
    with pytest.raises(BudgetExceededError):
        dp_synthesize_chain(
            spark, priv, ["color", "size"], DOMAINS, epsilon=0.9, n_out=10, budget=budget
        )


def test_chain_synthesis_validates(spark, priv):
    from dbms_data_anonymity_differential_privacy_spark.operators.synth import dp_synthesize_chain

    with pytest.raises(ValueError):
        dp_synthesize_chain(spark, priv, ["color"], DOMAINS, epsilon=1.0, n_out=10, release="v1")
    with pytest.raises(ValueError):
        dp_synthesize_chain(
            spark, priv, ["color", "color"], DOMAINS, epsilon=1.0, n_out=10, release="v2"
        )
    with pytest.raises(ValueError):
        dp_synthesize_chain(
            spark, priv, ["color", "missing"], DOMAINS, epsilon=1.0, n_out=10, release="v3"
        )
