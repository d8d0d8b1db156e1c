"""Differential privacy on aggregates — SURVEY §2c X1.

The reference implements NO differential privacy despite its repo name
(SURVEY §0) — this module is the north-star extension: the Laplace
mechanism (Dwork, McSherry, Nissim, Smith, TCC 2006), the Gaussian
mechanism (Dwork & Roth 2014, Thm A.1), and the exponential mechanism
(McSherry & Talwar, FOCS 2007) on grouped count/sum/avg/argmax.

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
ROUND_DP = 9  # float rounding for oracle-checkable score columns


class PrivacyBudget:
    """Sequential-composition (epsilon, delta) accountant (Dwork & Roth
    2014, Thm 3.16): releases against the same data add their epsilons AND
    their deltas. Mechanisms here take the accountant via ``spend`` so a
    pipeline can enforce a global budget; exceeding either component raises
    before any release is computed. Pure-DP mechanisms (Laplace,
    exponential) spend delta=0, so an all-Laplace pipeline never needs a
    delta allowance.

    Driver-side only (budget is pipeline metadata, not data).
    """

    def __init__(self, total_epsilon: float, total_delta: float = 0.0):
        if total_epsilon <= 0:
            raise ValueError("total_epsilon must be positive")
        if total_delta < 0:
            raise ValueError("total_delta must be >= 0")
        self.total = float(total_epsilon)
        self.total_delta = float(total_delta)
        self.ledger: list[tuple[str, float, float]] = []

    @property
    def spent(self) -> float:
        return sum(e for _, e, _ in self.ledger)

    @property
    def spent_delta(self) -> float:
        return sum(d for _, _, d in self.ledger)

    @property
    def remaining(self) -> float:
        return self.total - self.spent

    @property
    def remaining_delta(self) -> float:
        return self.total_delta - self.spent_delta

    def spend(self, epsilon: float, label: str = "", delta: float = 0.0) -> float:
        if epsilon <= 0:
            raise ValueError("epsilon must be positive")
        if delta < 0:
            raise ValueError("delta must be >= 0")
        if self.spent + epsilon > self.total + 1e-12:
            raise BudgetExceededError(
                f"release {label!r} needs eps={epsilon}, only {self.remaining:.6g} "
                f"of {self.total:.6g} remains"
            )
        if self.spent_delta + delta > self.total_delta + 1e-18:
            raise BudgetExceededError(
                f"release {label!r} needs delta={delta}, only "
                f"{self.remaining_delta:.6g} of {self.total_delta:.6g} remains"
            )
        self.ledger.append((label, float(epsilon), float(delta)))
        return epsilon


class BudgetExceededError(RuntimeError):
    """Raised when a release would exceed the accountant's total epsilon."""


class ZCDPBudget:
    """rho-zCDP accountant (Bun & Steinke 2016). Drop-in for
    :class:`PrivacyBudget` — mechanisms call the same
    ``spend(epsilon, label, delta)`` duck-typed interface, and the
    accountant converts each release to its rho cost:

    - Gaussian release calibrated by :func:`gaussian_sigma` (``delta > 0``):
      ``rho = sensitivity^2 / (2 sigma^2) = epsilon^2 / (4 ln(1.25/delta))``
      (the sensitivity cancels against the calibration).
    - Pure-DP release (``delta == 0``, Laplace/exponential): eps-DP implies
      ``(eps^2 / 2)``-zCDP (Bun & Steinke Prop. 1.4).

    rho composes ADDITIVELY even adaptively, which is strictly tighter than
    (eps, delta) sequential composition for many Gaussian releases: k
    releases at eps each cost ``k * eps^2 / (4 ln(1.25/delta))`` rho
    instead of ``k * eps`` epsilon. :meth:`epsilon_at` reports the total
    (eps, delta) guarantee via ``eps = rho + 2 sqrt(rho ln(1/delta))``
    (Bun & Steinke Prop. 1.3).

    Driver-side only, like :class:`PrivacyBudget`.
    """

    def __init__(self, total_rho: float):
        import math as _math  # noqa: F401 — used by methods

        if total_rho <= 0:
            raise ValueError("total_rho must be positive")
        self.total_rho = float(total_rho)
        self.ledger: list[tuple[str, float]] = []

    @property
    def spent_rho(self) -> float:
        return sum(r for _, r in self.ledger)

    @property
    def remaining_rho(self) -> float:
        return self.total_rho - self.spent_rho

    @staticmethod
    def rho_of(epsilon: float, delta: float = 0.0) -> float:
        import math

        if epsilon <= 0:
            raise ValueError("epsilon must be positive")
        if delta == 0.0:
            return epsilon * epsilon / 2.0
        return epsilon * epsilon / (4.0 * math.log(1.25 / delta))

    def spend(self, epsilon: float, label: str = "", delta: float = 0.0) -> float:
        rho = self.rho_of(epsilon, delta)
        if self.spent_rho + rho > self.total_rho + 1e-15:
            raise BudgetExceededError(
                f"release {label!r} needs rho={rho:.6g}, only "
                f"{self.remaining_rho:.6g} of {self.total_rho:.6g} remains"
            )
        self.ledger.append((label, rho))
        return epsilon

    def epsilon_at(self, delta: float) -> float:
        """Total (epsilon, delta)-DP guarantee implied by the rho spent so
        far, at the caller's chosen delta."""
        import math

        if not 0 < delta < 1:
            raise ValueError("delta must be in (0, 1)")
        rho = self.spent_rho
        return rho + 2.0 * math.sqrt(rho * math.log(1.0 / delta))


def _uniform_from_key(group_cols: Sequence[str], seed: int, salt: str) -> Column:
    """Deterministic uniform in (0, 1): hash of the group key + seed."""
    h = F.xxhash64(*[F.col(c) for c in group_cols], F.lit(seed), F.lit(salt))
    return (F.pmod(h, F.lit(_HASH_MOD)).cast("double") + F.lit(0.5)) / F.lit(float(_HASH_MOD))


def laplace_noise(group_cols: Sequence[str], scale: float, seed: int, salt: str = "") -> Column:
    """Laplace(0, scale) noise column, deterministic per group key."""
    u = _uniform_from_key(group_cols, seed, salt) - F.lit(0.5)  # (-0.5, 0.5)
    return -F.lit(scale) * F.signum(u) * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u))


def gaussian_noise(group_cols: Sequence[str], sigma: float, seed: int, salt: str = "") -> Column:
    """N(0, sigma^2) noise column, deterministic per group key.

    Box–Muller over two independent hash-derived uniforms:
    ``z = sqrt(-2 ln u1) * cos(2 pi u2)``. Same reproducibility design as
    :func:`laplace_noise` — partition-layout-independent, so a DP release
    is identical under AQE re-planning, task retries, and repartitioning.
    """
    u1 = _uniform_from_key(group_cols, seed, salt + ":g1")
    u2 = _uniform_from_key(group_cols, seed, salt + ":g2")
    two_pi = 6.283185307179586
    return F.lit(sigma) * F.sqrt(F.lit(-2.0) * F.log(u1)) * F.cos(F.lit(two_pi) * u2)


def gaussian_sigma(epsilon: float, delta: float, sensitivity: float) -> float:
    """Classic Gaussian-mechanism calibration (Dwork & Roth 2014, Thm A.1):
    ``sigma = sensitivity * sqrt(2 ln(1.25/delta)) / epsilon`` gives
    (epsilon, delta)-DP for epsilon in (0, 1)."""
    import math

    if not 0 < epsilon < 1:
        raise ValueError("classic Gaussian mechanism requires 0 < epsilon < 1")
    if not 0 < delta < 1:
        raise ValueError("delta must be in (0, 1)")
    return sensitivity * math.sqrt(2.0 * math.log(1.25 / delta)) / epsilon


def gumbel_noise(group_cols: Sequence[str], scale: float, seed: int, salt: str = "") -> Column:
    """Gumbel(0, scale) noise column: ``-scale * ln(-ln u)``, deterministic
    per key. Basis of the Gumbel-max implementation of the exponential
    mechanism (argmax over scores + Gumbel(2*sens/eps) samples exactly from
    ``p(c) ∝ exp(eps * score(c) / (2 * sens))``)."""
    u = _uniform_from_key(group_cols, seed, salt + ":gum")
    return -F.lit(scale) * F.log(-F.log(u))


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


def dp_count_gaussian(
    df: DataFrame,
    by: Sequence[str],
    epsilon: float,
    delta: float,
    seed: int = 42,
    budget: "PrivacyBudget | None" = None,
) -> DataFrame:
    """X1 — (epsilon, delta)-DP group counts via the Gaussian mechanism.

    L2 sensitivity of a count vector under add/remove-one adjacency is 1
    (one record changes one group's count by 1), so one (eps, delta) covers
    all groups. Output: ``(*by, count_exact, count_dp)`` — ``count_exact``
    kept for the oracle, as in :func:`dp_count`.
    """
    if budget is not None:
        budget.spend(epsilon, f"dp_count_gaussian:{','.join(by)}", delta=delta)
    sigma = gaussian_sigma(epsilon, delta, sensitivity=1.0)
    agg = df.groupBy(*by).agg(F.count(F.lit(1)).alias("count_exact"))
    return agg.withColumn(
        "count_dp", F.col("count_exact") + gaussian_noise(by, sigma, seed, "count")
    )


def dp_sum_gaussian(
    df: DataFrame,
    by: Sequence[str],
    value_col: str,
    epsilon: float,
    delta: float,
    lower: float,
    upper: float,
    seed: int = 42,
    budget: "PrivacyBudget | None" = None,
) -> DataFrame:
    """X1 — (epsilon, delta)-DP group sums, per-record clip to [lower, upper]
    (L2 sensitivity = max(|lower|, |upper|): one record moves one group's
    sum by at most that). Output: ``(*by, sum_exact, sum_dp)``."""
    if budget is not None:
        budget.spend(epsilon, f"dp_sum_gaussian:{value_col}", delta=delta)
    sens = max(abs(lower), abs(upper))
    sigma = gaussian_sigma(epsilon, delta, sensitivity=sens)
    clipped = F.least(F.greatest(F.col(value_col), F.lit(lower)), F.lit(upper))
    agg = df.groupBy(*by).agg(F.sum(clipped).alias("sum_exact"))
    return agg.withColumn("sum_dp", F.col("sum_exact") + gaussian_noise(by, sigma, seed, "sum"))


def dp_mode(
    df: DataFrame,
    by: Sequence[str],
    candidate_col: str,
    epsilon: float,
    seed: int = 42,
    budget: "PrivacyBudget | None" = None,
) -> DataFrame:
    """X1 — exponential mechanism: per group, select the modal value of
    ``candidate_col`` with probability ``∝ exp(eps * count / 2)`` (count
    scores have sensitivity 1).

    Implemented as the Gumbel-max trick — per (group, candidate) add
    Gumbel(2/eps) noise to the count and take the per-group argmax — which
    samples the exponential mechanism exactly (Durfee & Rogers, NeurIPS
    2019) and costs one groupBy + one max-struct agg: no per-candidate
    loop, no window sort, no UDF. Only candidate *scores* ever shuffle
    (one row per distinct (group, candidate)), never fact rows.

    Output: ``(*by, <candidate_col>, score_exact)`` — the selected value
    and its true count (the count itself is NOT part of the DP release;
    drop it in production).
    """
    if budget is not None:
        budget.spend(epsilon, f"dp_mode:{candidate_col}")
    scale = 2.0 / epsilon
    key = [*by, candidate_col]
    scores = df.groupBy(*key).agg(F.count(F.lit(1)).alias("score_exact"))
    noisy = scores.withColumn(
        "__noisy", F.col("score_exact").cast("double") + gumbel_noise(key, scale, seed, "mode")
    )
    # argmax via max-of-struct: deterministic given the deterministic noise
    # (hash collisions in __noisy broken by the candidate value itself).
    winner = noisy.groupBy(*by).agg(
        F.max(F.struct("__noisy", candidate_col, "score_exact")).alias("__w")
    )
    return winner.select(
        *by,
        F.col(f"__w.{candidate_col}").alias(candidate_col),
        F.col("__w.score_exact").alias("score_exact"),
    )


def dp_topk(
    df: DataFrame,
    by: Sequence[str],
    candidate_col: str,
    k: int,
    epsilon: float,
    seed: int = 42,
    budget: "PrivacyBudget | None" = None,
) -> DataFrame:
    """X1 — DP top-k most frequent values of ``candidate_col`` per group.

    One-shot Gumbel top-k: adding independent Gumbel(2k/eps) noise to every
    candidate's count and taking the k highest is equivalent to k rounds of
    the peeling exponential mechanism (Durfee & Rogers, NeurIPS 2019) and
    satisfies eps-DP overall — but needs ONE pass and no k-iteration loop.

    Physical shape: aggregate to candidate scores (only scores shuffle,
    never fact rows), then a per-group top-k window over the noisy score.
    The window sorts |candidates| rows per group — fine because the score
    relation is already the small side; for extreme candidate cardinality
    swap in a bounded per-partition heap via ``mapInPandas``.

    Output: ``(*by, <candidate_col>, score_exact, rank)`` with rank 1..k by
    noisy score (the true count is NOT part of the DP release; drop
    ``score_exact`` in production).
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    if budget is not None:
        budget.spend(epsilon, f"dp_topk:{candidate_col}@{k}")
    scale = 2.0 * k / epsilon
    key = [*by, candidate_col]
    scores = df.groupBy(*key).agg(F.count(F.lit(1)).alias("score_exact"))
    noisy = scores.withColumn(
        "__noisy", F.col("score_exact").cast("double") + gumbel_noise(key, scale, seed, "topk")
    )
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(
        F.desc("__noisy"), F.desc(candidate_col)
    )
    return (
        noisy.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(k))
        .select(*by, candidate_col, "score_exact", "rank")
    )


def quantile_scores(df: DataFrame, by: Sequence[str], value_col: str, q: float) -> DataFrame:
    """Rank-utility relation for the exponential-mechanism quantile:
    per (group, candidate value v), ``score = -|#records below v - q*n|``
    (Smith, STOC 2011 discrete form). Shared by :func:`dp_quantile` and its
    pre-noise oracle twin.

    Shape mirrors the EMD chain (tcloseness.py): ONE aggregation of the
    fact table to (group, value, count), then window cumsum over the tiny
    per-group support — no per-group loop, no UDF.
    """
    from pyspark.sql import Window

    counts = df.groupBy(*by, value_col).agg(F.count(F.lit(1)).alias("__c"))
    w_cum = Window.partitionBy(*[F.col(c) for c in by]).orderBy(value_col)
    w_all = Window.partitionBy(*[F.col(c) for c in by])
    return (
        counts.withColumn("__below", F.sum("__c").over(w_cum) - F.col("__c"))
        .withColumn("__n", F.sum("__c").over(w_all))
        .withColumn(
            "score", F.round(-F.abs(F.col("__below") - F.lit(q) * F.col("__n")), ROUND_DP)
        )
        .drop("__c", "__below", "__n")
    )


def dp_quantile(
    df: DataFrame,
    by: Sequence[str],
    value_col: str,
    q: float,
    epsilon: float,
    seed: int = 42,
    budget: "PrivacyBudget | None" = None,
) -> DataFrame:
    """X1 — (epsilon, 0)-DP quantile per group via the exponential mechanism
    over observed order statistics: select value v with probability
    ``∝ exp(eps * score(v) / 2)`` where ``score(v) = -|rank(v) - q*n|``
    (rank utility has sensitivity 1 under swap adjacency; scale = 2/eps).

    Gumbel-max sampling as in :func:`dp_mode`. Output:
    ``(*by, <value_col>, score_exact)``.
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError("q must be in [0, 1]")
    if budget is not None:
        budget.spend(epsilon, f"dp_quantile:{value_col}@{q}")
    scores = quantile_scores(df, by, value_col, q)
    key = [*by, value_col]
    noisy = scores.withColumn(
        "__noisy", F.col("score") + gumbel_noise(key, 2.0 / epsilon, seed, "quantile")
    )
    winner = noisy.groupBy(*by).agg(
        F.max(F.struct("__noisy", value_col, "score")).alias("__w")
    )
    return winner.select(
        *by,
        F.col(f"__w.{value_col}").alias(value_col),
        F.col("__w.score").alias("score_exact"),
    )
