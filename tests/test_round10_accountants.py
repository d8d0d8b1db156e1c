"""Round-10 accountant soundness: mechanism-tagged spends.

ADVICE r9 (high): RenyiBudget charged the Gaussian RDP curve for EVERY
delta>0 spend, but dp_set_union is a Laplace-threshold stability
mechanism with no finite RDP curve — the accountant under-counted.
Fix under test: spend(..., mechanism=) distinguishes families; a
delta>0 spend not tagged gaussian charges the pure-DP curve on eps and
routes delta to a TV allowance subtracted from the conversion delta.
VERDICT r9 task 6: tagged Laplace spends regain the tight Mironov
Prop. 6 curve (min'd with the generic bound).
"""

from __future__ import annotations

import math

import pytest

from dbms_data_anonymity_differential_privacy_spark.operators.dp import (
    _RDP_ALPHAS,
    BudgetExceededError,
    PrivacyBudget,
    RenyiBudget,
    ZCDPBudget,
)


def _lap_rdp(alpha: float, eps: float) -> float:
    """Mironov 2017 Prop. 6, direct form (small enough args to not overflow)."""
    return (
        math.log(
            alpha / (2 * alpha - 1) * math.exp((alpha - 1) * eps)
            + (alpha - 1) / (2 * alpha - 1) * math.exp(-alpha * eps)
        )
        / (alpha - 1)
    )


def test_laplace_curve_matches_closed_form_and_numeric_integral():
    # the logsumexp implementation equals the direct formula where the
    # direct formula is computable ...
    for eps in (0.1, 0.5, 1.0, 2.0):
        curve = RenyiBudget._curve(eps, 0.0, mechanism="laplace")
        for a, charged in zip(_RDP_ALPHAS, curve):
            expect = min(eps, a * eps * eps / 2.0, _lap_rdp(a, eps))
            assert charged == pytest.approx(expect, rel=1e-12), (eps, a)
    # ... and stays finite/sane at alpha=256 with large eps, where the
    # direct form would overflow float range in exp()
    big = RenyiBudget._curve(500.0, 0.0, mechanism="laplace")
    assert all(math.isfinite(v) and v <= 500.0 + 1e-9 for v in big)

    # numeric check: the Prop. 6 value IS the Renyi divergence
    # D_a(Lap(0,b) || Lap(1,b)) with b = 1/eps, integrated on a grid
    eps, a = 0.8, 2.5
    b = 1.0 / eps

    def pdf(x, mu):
        return math.exp(-abs(x - mu) / b) / (2 * b)

    lo, hi, n = -40.0, 41.0, 400_000
    h = (hi - lo) / n
    acc = 0.0
    for i in range(n):
        x = lo + (i + 0.5) * h
        acc += pdf(x, 0.0) ** a * pdf(x, 1.0) ** (1 - a) * h
    numeric = math.log(acc) / (a - 1)
    assert _lap_rdp(a, eps) == pytest.approx(numeric, rel=1e-6)


def test_tagged_laplace_tighter_than_generic_never_looser():
    """Same ledger, tagged vs untagged: tagged Laplace spends compose to
    a strictly smaller converted epsilon and are never looser."""
    lap = RenyiBudget(total_epsilon=50.0, target_delta=1e-6)
    gen = RenyiBudget(total_epsilon=50.0, target_delta=1e-6)
    for i in range(30):
        lap.spend(0.4, label=f"l{i}", mechanism="laplace")
        gen.spend(0.4, label=f"g{i}")
    assert lap.spent <= gen.spent + 1e-15
    assert lap.spent < gen.spent  # strictly tighter at this regime
    # and both stay below basic composition
    assert lap.spent < 30 * 0.4
    # per-alpha: the laplace curve never exceeds the generic curve
    for eps in (0.05, 0.3, 1.0, 4.0):
        lc = RenyiBudget._curve(eps, 0.0, mechanism="laplace")
        gc = RenyiBudget._curve(eps, 0.0)
        assert all(l <= g + 1e-15 for l, g in zip(lc, gc))


def test_non_gaussian_delta_spend_is_tv_not_gaussian_curve():
    """The dp_set_union shape: eps with delta>0, NOT gaussian. The
    accountant must charge the pure-DP curve (NOT the much smaller
    Gaussian curve) and burn delta from the conversion allowance."""
    eps, delta = 1.0, 1e-7
    b = RenyiBudget(total_epsilon=10.0, target_delta=1e-6)
    b.spend(eps, label="setunion", delta=delta)  # untagged => generic
    assert b.spent_tv_delta == delta
    # charged curve equals the generic pure curve, not Gaussian's
    assert b._rdp == RenyiBudget._curve(eps, 0.0)
    # conversion happens at target_delta - tv_delta
    conv_delta = 1e-6 - delta
    expect_conv = min(
        c + math.log(1.0 / conv_delta) / (a - 1.0)
        for a, c in zip(_RDP_ALPHAS, RenyiBudget._curve(eps, 0.0))
    )
    assert b.spent == pytest.approx(min(expect_conv, eps))
    # the old (unsound) behavior charged the tiny Gaussian curve; that
    # curve's conversion would be far below the pure epsilon — make sure
    # we are NOT there anymore
    gauss_curve = RenyiBudget._curve(eps, delta, mechanism="gaussian")
    unsound = min(
        c + math.log(1e6) / (a - 1.0) for a, c in zip(_RDP_ALPHAS, gauss_curve)
    )
    assert b.spent > unsound  # i.e. we stopped under-counting

    # epsilon_at below/at the TV allowance: no guarantee from the RDP
    # branch; with the basic branch also invalid the result is infinite
    lone = RenyiBudget(total_epsilon=10.0, target_delta=1e-2)
    lone.spend(1.0, label="su", delta=1e-3)
    # at delta below the spent TV allowance, even basic composition
    # does not apply: no guarantee exists
    assert math.isinf(lone.epsilon_at(1e-5))
    # at delta above both allowances the guarantee is finite
    assert math.isfinite(lone.epsilon_at(2e-3))


def test_tv_spends_can_exhaust_conversion_delta():
    """Enough non-Gaussian delta spends make the conversion impossible;
    the accountant rejects rather than fabricating a guarantee."""
    b = RenyiBudget(total_epsilon=1000.0, target_delta=1e-6)
    b.spend(0.1, label="a", delta=9e-7)
    # next TV spend pushes tv_delta past target_delta; conv becomes inf
    # and basic (sum eps) also exceeds no cap... basic stays valid only
    # while its delta total fits, which it no longer does -> inf -> raise
    with pytest.raises(BudgetExceededError):
        b.spend(0.1, label="b", delta=5e-7)


def test_zcdp_non_gaussian_delta_spend():
    b = ZCDPBudget(total_rho=1.0)
    b.spend(0.5, "setunion", delta=1e-6)  # untagged: pure rho + TV delta
    assert b.spent_rho == pytest.approx(0.125)  # eps^2/2, NOT gaussian rho
    assert b.spent_tv_delta == 1e-6
    # conversion subtracts the TV allowance
    rho = 0.125
    assert b.epsilon_at(1e-5) == pytest.approx(
        rho + 2.0 * math.sqrt(rho * math.log(1.0 / (1e-5 - 1e-6)))
    )
    with pytest.raises(ValueError):
        b.epsilon_at(1e-7)  # below the TV allowance: no guarantee exists


def test_unknown_mechanism_rejected_everywhere():
    for budget in (
        PrivacyBudget(1.0),
        ZCDPBudget(1.0),
        RenyiBudget(1.0, 1e-6),
    ):
        with pytest.raises(ValueError):
            budget.spend(0.1, "x", mechanism="subsampled-gaussian")
        assert budget.ledger == []
    # gaussian with delta=0 is meaningless (no calibration)
    with pytest.raises(ValueError):
        RenyiBudget(1.0, 1e-6).spend(0.1, "x", mechanism="gaussian")
    with pytest.raises(ValueError):
        ZCDPBudget(1.0).spend(0.1, "x", mechanism="gaussian")


def test_set_union_with_renyi_budget_end_to_end(spark, sf0001):
    """dp_set_union driven by a RenyiBudget: the release succeeds, the
    ledger carries its delta as TV, and the reported guarantee exists
    only above the TV allowance."""
    from dbms_data_anonymity_differential_privacy_spark.operators.dp import dp_set_union
    from dbms_data_anonymity_differential_privacy_spark.queries_registry import load_table

    ev = load_table(spark, sf0001, "events")
    b = RenyiBudget(total_epsilon=4.0, target_delta=1e-5)
    out = dp_set_union(
        ev, user_col="user_id", item_col="event_type", epsilon=1.0,
        delta=1e-6, max_items=4, seed=7, budget=b,
    )
    assert out.count() >= 0
    assert b.spent_tv_delta == pytest.approx(1e-6)
    assert math.isfinite(b.epsilon_at(1e-5))
    assert math.isinf(b.epsilon_at(1e-9))
