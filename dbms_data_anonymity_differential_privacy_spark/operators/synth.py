"""DP synthetic data generation — extension X36.

Select–measure–generate, the workhorse recipe of the DP-synthesis
literature (MWEM: Hardt, Ligett & McSherry, NIPS 2012; PrivBayes: Zhang
et al., SIGMOD 2014; the NIST-winning AIM/PGM line): MEASURE noisy
marginals of the private table under a split budget, then GENERATE
synthetic rows from the noisy model. This module implements the
independent-marginals baseline — each column sampled from its own
DP histogram — which already supports the common "share a statistically
faithful fake extract" workflow; richer dependency models (pairwise /
Bayes-net) compose from the same measured-marginal relation.

The reference has no synthesis (it anonymizes in place); this is a
designed extension in its privacy lane, built on the module's hardened
DP conventions (public domains, per-release noise nonces, budget
accounting — ``operators/dp.py``).

Spark-first design, 100 TB shape:

- ALL column marginals are measured in ONE pass: the fact table is
  projected to exploded ``(column, value)`` pairs and aggregated once —
  k marginals cost one scan + one partial-combined shuffle of slim pairs,
  not k scans.
- Generation is fully distributed and DETERMINISTIC: ``spark.range(n)``
  plus a per-(row, column) hash-derived uniform, inverse-CDF'd through a
  literal when-chain over the (small, public-domain-sized) cumulative
  table. No ``rand()`` — output is identical under repartitioning, AQE
  re-planning, and task retries, and is itself shuffle-free (map-only).
- The only driver-side materialization is the NOISY marginal table —
  a DP release (public by definition), bounded by the public domain
  sizes, never raw data.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.dp import (
    PrivacyBudget,
    _release_salt,
    _uniform_from_key,
    laplace_noise,
)

# Inverse-CDF sampling compiles one when-chain per column; keep codegen
# bounded. Synthesis domains are small by construction (binned/categorical
# columns — measuring a high-cardinality marginal under DP is noise-domi-
# nated anyway), so this is a design bound, not a scale bound.
MAX_DOMAIN = 512


def dp_marginals(
    df: DataFrame,
    domains: Mapping[str, Sequence[str]],
    epsilon: float,
    seed: int = 42,
    budget: "PrivacyBudget | None" = None,
    release: str | None = None,
) -> DataFrame:
    """MEASURE step: noisy per-column marginals over PUBLIC domains.

    ``domains`` maps column name -> its public value list (data-independent,
    same requirement as ``dp_histogram``'s public bounds: a data-derived
    support would leak which values exist). Rows whose value falls outside
    the public domain contribute 0 to that column's marginal (each row
    still contributes at most 1 per column, so per-column sensitivity
    is 1). Values are compared as strings.

    The budget splits evenly across columns (sequential composition —
    every marginal reads the same rows). Output: one row per
    ``(column, value)`` in the public domains, zero cells included:
    ``(column, value, count_exact, count_dp)``.
    """
    if epsilon <= 0:
        raise ValueError("epsilon must be positive")
    if not domains:
        raise ValueError("domains must name at least one column")
    for c, dom in domains.items():
        if not dom:
            raise ValueError(f"column {c!r} has an empty public domain")
        if len(dom) > MAX_DOMAIN:
            raise ValueError(
                f"column {c!r} domain has {len(dom)} values (> {MAX_DOMAIN}); "
                "DP marginal synthesis needs small public domains — bin first"
            )
        if len(set(map(str, dom))) != len(dom):
            raise ValueError(f"column {c!r} public domain has duplicate values")
    cols = list(domains)
    eps_col = epsilon / len(cols)
    salt = _release_salt("marginals", release, budget)
    if budget is not None:
        budget.spend(epsilon, f"dp_marginals:{','.join(cols)}")

    # One pass: project each row to its (column, value) pairs and aggregate
    # the exploded slim relation once (out-of-domain values dropped here).
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.column", "p.value")
    spark = df.sparkSession
    spine = spark.createDataFrame(
        [(c, str(v)) for c, dom in domains.items() for v in dom],
        "column string, value string",
    )
    counts = pairs.join(F.broadcast(spine), ["column", "value"], "left_semi").groupBy(
        "column", "value"
    ).agg(F.count(F.lit(1)).alias("__c"))
    full = spine.join(counts, ["column", "value"], "left").select(
        "column", "value", F.coalesce(F.col("__c"), F.lit(0)).alias("count_exact")
    )
    return full.withColumn(
        "count_dp",
        F.col("count_exact") + laplace_noise(["column", "value"], 1.0 / eps_col, seed, salt),
    )


def dp_synthesize(
    spark: SparkSession,
    df: DataFrame,
    domains: Mapping[str, Sequence[str]],
    epsilon: float,
    n_out: int,
    seed: int = 42,
    budget: "PrivacyBudget | None" = None,
    release: str | None = None,
) -> DataFrame:
    """GENERATE step: ``n_out`` synthetic rows, each column drawn from its
    noisy marginal (independent-marginals model).

    Post-processing of the measured marginals (negative-clamp, normalize,
    inverse CDF) is free under DP's post-processing theorem. A column
    whose noisy mass clamps to all-zero falls back to uniform over its
    public domain (the least-informative valid distribution). The whole
    generation plan is map-only over ``spark.range(n_out)`` — row i's
    value for column c is a pure function of ``(i, seed, release, c)``.

    All synthesized columns are StringType (values come from the public
    domain lists); cast downstream if a typed extract is needed.
    """
    if n_out < 1:
        raise ValueError("n_out must be >= 1")
    marg = dp_marginals(df, domains, epsilon, seed=seed, budget=budget, release=release)
    # The noisy marginal table is a DP release (public); it is the ONLY
    # thing collected, and its size is bounded by the public domains.
    rows = marg.select("column", "value", "count_dp").collect()
    by_col: dict[str, list[tuple[str, float]]] = {c: [] for c in domains}
    for r in rows:
        by_col[r["column"]].append((r["value"], max(r["count_dp"], 0.0)))

    gen_salt = f"synth:{release if release is not None else 'ledger'}"
    out = spark.range(n_out).select(F.col("id").alias("__id"))
    for c, dom in domains.items():
        # preserve the caller's public-domain order for reproducibility
        mass = dict(by_col[c])
        weights = [mass[str(v)] for v in dom]
        total = sum(weights)
        if total <= 0.0:
            weights = [1.0] * len(dom)
            total = float(len(dom))
        u = _uniform_from_key(["__id"], seed, f"{gen_salt}:{c}")
        acc = 0.0
        branches: list[tuple[float, str]] = []
        for v, w in zip(dom, weights):
            acc += w / total
            branches.append((acc, str(v)))
        # ascending cumulative bounds; first true branch wins, the last
        # value is the otherwise-tail (u < 1 always, so it catches the top)
        chain = None
        for bound, v in branches[:-1]:
            cond = u < F.lit(bound)
            chain = F.when(cond, F.lit(v)) if chain is None else chain.when(cond, F.lit(v))
        tail = F.lit(branches[-1][1])
        expr = tail if chain is None else chain.otherwise(tail)
        out = out.withColumn(c, expr)
    return out.select(*domains)


def dp_synthesize_chain(
    spark: SparkSession,
    df: DataFrame,
    chain: Sequence[str],
    domains: Mapping[str, Sequence[str]],
    epsilon: float,
    n_out: int,
    seed: int = 42,
    budget: "PrivacyBudget | None" = None,
    release: str | None = None,
) -> DataFrame:
    """Bayes-chain synthesis: ``P(c1) * P(c2|c1) * ... * P(ck|c(k-1))`` —
    the first dependency rung of the PrivBayes ladder (Zhang et al.,
    SIGMOD 2014, with a fixed chain in place of the learned network; the
    network-structure search is itself privacy-charged in the paper and
    out of scope here).

    MEASURE: one noisy 2-way marginal per adjacent pair, all computed in
    ONE pass over the fact table (exploded (pair-name, value-pair) rows,
    same shape as :func:`dp_marginals`), budget split evenly across the
    k-1 pair measurements (each row contributes once to each, sequential
    composition). The root's 1-way marginal comes free as a post-
    processing sum over its first pair — no extra budget.

    GENERATE: row i's root value inverse-CDFs its marginal; each child
    inverse-CDFs the conditional row of its sampled parent (nested
    when-chain keyed on the parent value — bounded by the pairwise
    domain-product cap). Map-only, deterministic, zero shuffles, exactly
    as :func:`dp_synthesize`.
    """
    if len(chain) < 2:
        raise ValueError("chain needs at least two columns; use dp_synthesize otherwise")
    if len(set(chain)) != len(chain):
        raise ValueError("chain must not repeat columns")
    for c in chain:
        if c not in domains:
            raise ValueError(f"chain column {c!r} missing from domains")
    for a, b in zip(chain, chain[1:]):
        if len(domains[a]) * len(domains[b]) > MAX_DOMAIN * 8:
            raise ValueError(
                f"pair ({a!r}, {b!r}) domain product exceeds {MAX_DOMAIN * 8}; bin first"
            )
    if epsilon <= 0:
        raise ValueError("epsilon must be positive")
    if n_out < 1:
        raise ValueError("n_out must be >= 1")
    pairs = list(zip(chain, chain[1:]))
    eps_pair = epsilon / len(pairs)
    salt = _release_salt("chain", release, budget)
    if budget is not None:
        budget.spend(epsilon, f"dp_synthesize_chain:{'->'.join(chain)}")

    # ONE pass: every adjacent pair's (value_a, value_b) cell per row.
    exploded = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f"{a}->{b}").alias("pair"),
                        F.col(a).cast("string").alias("va"),
                        F.col(b).cast("string").alias("vb"),
                    )
                    for a, b in pairs
                ]
            )
        ).alias("p")
    ).select("p.pair", "p.va", "p.vb")
    spine = spark.createDataFrame(
        [
            (f"{a}->{b}", str(x), str(y))
            for a, b in pairs
            for x in domains[a]
            for y in domains[b]
        ],
        "pair string, va string, vb string",
    )
    counts = exploded.join(F.broadcast(spine), ["pair", "va", "vb"], "left_semi").groupBy(
        "pair", "va", "vb"
    ).agg(F.count(F.lit(1)).alias("__c"))
    full = spine.join(counts, ["pair", "va", "vb"], "left").select(
        "pair", "va", "vb", F.coalesce(F.col("__c"), F.lit(0)).alias("count_exact")
    )
    noisy = full.withColumn(
        "count_dp",
        F.col("count_exact")
        + laplace_noise(["pair", "va", "vb"], 1.0 / eps_pair, seed, salt),
    )
    rows = noisy.select("pair", "va", "vb", "count_dp").collect()
    joint: dict[str, dict[tuple[str, str], float]] = {f"{a}->{b}": {} for a, b in pairs}
    for r in rows:
        joint[r["pair"]][(r["va"], r["vb"])] = max(r["count_dp"], 0.0)

    gen_salt = f"synthchain:{release if release is not None else 'ledger'}"

    def _cdf_expr(weights: Sequence[float], values: Sequence[str], u) -> "F.Column":
        total = sum(weights)
        if total <= 0.0:
            weights, total = [1.0] * len(values), float(len(values))
        acc, branches = 0.0, []
        for v, w in zip(values, weights):
            acc += w / total
            branches.append((acc, v))
        chain_expr = None
        for bound, v in branches[:-1]:
            cond = u < F.lit(bound)
            chain_expr = (
                F.when(cond, F.lit(v)) if chain_expr is None else chain_expr.when(cond, F.lit(v))
            )
        tail = F.lit(branches[-1][1])
        return tail if chain_expr is None else chain_expr.otherwise(tail)

    out = spark.range(n_out).select(F.col("id").alias("__id"))
    root, first_child = pairs[0]
    first = joint[f"{root}->{first_child}"]
    root_dom = [str(v) for v in domains[root]]
    # root marginal = row sums of the first pair table (post-processing)
    root_w = [sum(first[(x, str(y))] for y in domains[first_child]) for x in root_dom]
    u_root = _uniform_from_key(["__id"], seed, f"{gen_salt}:{root}")
    out = out.withColumn(root, _cdf_expr(root_w, root_dom, u_root))
    for a, b in pairs:
        tbl = joint[f"{a}->{b}"]
        b_dom = [str(v) for v in domains[b]]
        u = _uniform_from_key(["__id"], seed, f"{gen_salt}:{b}")
        cond_expr = None
        for x in [str(v) for v in domains[a]]:
            w = [tbl[(x, y)] for y in b_dom]
            branch = _cdf_expr(w, b_dom, u)
            cond = F.col(a) == F.lit(x)
            cond_expr = (
                F.when(cond, branch) if cond_expr is None else cond_expr.when(cond, branch)
            )
        out = out.withColumn(b, cond_expr)
    return out.select(*chain)
