"""Differential privacy on aggregates — SURVEY §2c X1.

The reference implements NO differential privacy despite its repo name
(SURVEY §0) — this module is the north-star extension: the Laplace
mechanism (Dwork, McSherry, Nissim, Smith, TCC 2006) on grouped
count/sum/avg.

Noise design for a distributed engine: the uniform draw per output group
is derived from ``xxhash64(group key, seed)`` instead of ``rand()``, so
results are deterministic for a given (data, seed) regardless of
partitioning, task retries, or speculative execution — ``rand(seed)`` in
Spark depends on partition layout and would make DP releases
irreproducible under AQE re-planning. Laplace sample via inverse CDF:

    u ~ Uniform(-1/2, 1/2);  lap = -scale * sign(u) * ln(1 - 2|u|)

All JVM-side built-ins — no UDF, whole-stage codegen applies.

Contribution bounding: ``dp_sum``/``dp_avg`` clip the value column to
[lower, upper] first; without clipping the sensitivity of SUM is
unbounded and the release is not DP.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_MOD = 2_147_483_647  # 2^31 - 1; plenty of uniform resolution


class PrivacyBudget:
    """Sequential-composition epsilon accountant (Dwork & Roth 2014, Thm
    3.14): releases against the same data add their epsilons. Mechanisms
    here take the accountant via ``spend`` so a pipeline can enforce a
    global budget; exceeding it raises before any release is computed.

    Driver-side only (budget is pipeline metadata, not data).
    """

    def __init__(self, total_epsilon: float):
        if total_epsilon <= 0:
            raise ValueError("total_epsilon must be positive")
        self.total = float(total_epsilon)
        self.ledger: list[tuple[str, float]] = []

    @property
    def spent(self) -> float:
        return sum(e for _, e in self.ledger)

    @property
    def remaining(self) -> float:
        return self.total - self.spent

    def spend(self, epsilon: float, label: str = "") -> float:
        if epsilon <= 0:
            raise ValueError("epsilon must be positive")
        if self.spent + epsilon > self.total + 1e-12:
            raise BudgetExceededError(
                f"release {label!r} needs eps={epsilon}, only {self.remaining:.6g} "
                f"of {self.total:.6g} remains"
            )
        self.ledger.append((label, float(epsilon)))
        return epsilon


class BudgetExceededError(RuntimeError):
    """Raised when a release would exceed the accountant's total epsilon."""


def _uniform_from_key(group_cols: Sequence[str], seed: int, salt: str) -> Column:
    """Deterministic uniform in (0, 1): hash of the group key + seed."""
    h = F.xxhash64(*[F.col(c) for c in group_cols], F.lit(seed), F.lit(salt))
    return (F.pmod(h, F.lit(_HASH_MOD)).cast("double") + F.lit(0.5)) / F.lit(float(_HASH_MOD))


def laplace_noise(group_cols: Sequence[str], scale: float, seed: int, salt: str = "") -> Column:
    """Laplace(0, scale) noise column, deterministic per group key."""
    u = _uniform_from_key(group_cols, seed, salt) - F.lit(0.5)  # (-0.5, 0.5)
    return -F.lit(scale) * F.signum(u) * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u))


def dp_count(
    df: DataFrame,
    by: Sequence[str],
    epsilon: float,
    seed: int = 42,
    budget: "PrivacyBudget | None" = None,
) -> DataFrame:
    """X1 — noisy group counts. Sensitivity of COUNT is 1 → scale = 1/eps.

    Output: ``(*by, count_exact, count_dp)``. ``count_exact`` is kept so
    the pre-noise aggregate stays oracle-checkable; a production release
    would drop it.
    """
    if budget is not None:
        budget.spend(epsilon, f"dp_count:{','.join(by)}")
    scale = 1.0 / epsilon
    agg = df.groupBy(*by).agg(F.count(F.lit(1)).alias("count_exact"))
    return agg.withColumn(
        "count_dp", F.col("count_exact") + laplace_noise(by, scale, seed, "count")
    )


def dp_sum(
    df: DataFrame,
    by: Sequence[str],
    value_col: str,
    epsilon: float,
    lower: float,
    upper: float,
    seed: int = 42,
    budget: "PrivacyBudget | None" = None,
) -> DataFrame:
    """X1 — noisy group sums with per-record clipping to [lower, upper].

    Sensitivity = max(|lower|, |upper|) → scale = sensitivity/eps.
    Output: ``(*by, sum_exact, sum_dp)``.
    """
    if budget is not None:
        budget.spend(epsilon, f"dp_sum:{value_col}")
    sens = max(abs(lower), abs(upper))
    scale = sens / epsilon
    clipped = F.least(F.greatest(F.col(value_col), F.lit(lower)), F.lit(upper))
    agg = df.groupBy(*by).agg(F.sum(clipped).alias("sum_exact"))
    return agg.withColumn("sum_dp", F.col("sum_exact") + laplace_noise(by, scale, seed, "sum"))


def dp_histogram(
    df: DataFrame,
    value_col: str,
    n_bins: int,
    epsilon: float,
    seed: int = 42,
    budget: "PrivacyBudget | None" = None,
) -> DataFrame:
    """X1 — noisy equal-width histogram: bin (P17) then Laplace counts.

    Histogram queries have sensitivity 1 under add/remove-one adjacency
    (each record lands in exactly one bin), so one epsilon covers ALL bins
    in parallel — no budget split (Dwork & Roth 2014, §3.4).
    Output: ``(bin, count_exact, count_dp)``.
    """
    from dbms_data_anonymity_differential_privacy_spark.functions.binning import bin_equal_width

    binned = bin_equal_width(df.select(value_col), value_col, n_bins, "bin")
    return dp_count(binned, ["bin"], epsilon, seed, budget=budget)


def dp_avg(
    df: DataFrame,
    by: Sequence[str],
    value_col: str,
    epsilon: float,
    lower: float,
    upper: float,
    seed: int = 42,
    budget: "PrivacyBudget | None" = None,
) -> DataFrame:
    """X1 — noisy mean as noisy-sum / noisy-count with the budget split
    evenly (eps/2 each; sequential composition)."""
    if budget is not None:
        budget.spend(epsilon, f"dp_avg:{value_col}")
    eps_half = epsilon / 2.0
    sens = max(abs(lower), abs(upper))
    clipped = F.least(F.greatest(F.col(value_col), F.lit(lower)), F.lit(upper))
    agg = df.groupBy(*by).agg(
        F.sum(clipped).alias("__sum"), F.count(F.lit(1)).alias("__cnt")
    )
    noisy = agg.withColumn(
        "__sum_dp", F.col("__sum") + laplace_noise(by, sens / eps_half, seed, "sum")
    ).withColumn(
        "__cnt_dp",
        F.greatest(F.col("__cnt") + laplace_noise(by, 1.0 / eps_half, seed, "count"), F.lit(1.0)),
    )
    return noisy.select(
        *by,
        (F.col("__sum") / F.col("__cnt")).alias("avg_exact"),
        (F.col("__sum_dp") / F.col("__cnt_dp")).alias("avg_dp"),
    )
