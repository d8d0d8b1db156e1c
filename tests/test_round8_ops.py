"""Round-8 tests: the r8 advisory fixes (dp_histogram_consistent total
nonce, largest-remainder exact-total repair in both directions, hits_int
iteration validation, the x212 oracle's channel-vocabulary pin) and the
r8 debuts (c03 encode/scale prefix vs the real MLlib stages, silhouette /
kendall tau-b / krippendorff alpha invariants).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.dp import (
    PrivacyBudget,
    _largest_remainder_round,
    dp_histogram_consistent,
)

SF001 = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# r8 advisory (high): budget-tracked consistent-histogram releases must
# draw INDEPENDENT total noise — the pre-fix constant ":total" salt made
# every release=None total reuse one Laplace draw, so differencing two
# releases cancelled the noise exactly.
# ---------------------------------------------------------------------------


def test_dp_consistent_total_nonce_is_per_release(spark):
    df = spark.range(500).select((F.col("id") % 7).alias("g"))
    budget = PrivacyBudget(total_epsilon=8.0)
    r1 = dp_histogram_consistent(df, ["g"], epsilon=1.0, seed=42, budget=budget)
    r2 = dp_histogram_consistent(df, ["g"], epsilon=1.0, seed=42, budget=budget)
    t1 = sum(r["count_dp_consistent"] for r in r1.collect())
    t2 = sum(r["count_dp_consistent"] for r in r2.collect())
    # same data, same seed, same accountant: only the ledger nonce moves,
    # so equal totals would mean the noise draw was reused (the attack)
    assert t1 != t2, "total noise draw reused across budget-tracked releases"
    # four spends on the ledger: cells + total, twice
    assert len(budget.ledger) == 4


def test_dp_consistent_differencing_does_not_cancel(spark):
    # ONE accountant, two releases over data differing by one row — the
    # advisory's differencing attack: pre-fix both totals shared the
    # ":total" salt, so the noise cancelled and the difference leaked the
    # true count exactly. (Two FRESH accountants sharing a seed still
    # replay the same draws by design — per-accountant uniqueness is the
    # documented _release_salt contract.)
    base = spark.range(500).select((F.col("id") % 7).alias("g"))
    plus1 = spark.range(501).select((F.col("id") % 7).alias("g"))
    budget = PrivacyBudget(total_epsilon=8.0)
    t = []
    for df in (base, plus1):
        rel = dp_histogram_consistent(df, ["g"], epsilon=1.0, seed=42, budget=budget)
        t.append(sum(r["count_dp_consistent"] for r in rel.collect()))
    assert t[1] - t[0] != 1


def test_dp_consistent_exact_total_invariant(spark):
    df = spark.range(1000).select((F.col("id") % 11).alias("g"))
    rel = dp_histogram_consistent(df, ["g"], epsilon=0.8, seed=7, release="r8-test")
    rows = rel.collect()
    assert all(r["count_dp_consistent"] >= 0 for r in rows)
    # replay-stable: same seed + release label → identical release
    rows2 = dp_histogram_consistent(
        df, ["g"], epsilon=0.8, seed=7, release="r8-test"
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


# ---------------------------------------------------------------------------
# r8 advisory (low): largest-remainder repair must hold the exact-total
# invariant in BOTH directions.
# ---------------------------------------------------------------------------


def test_largest_remainder_shortfall_branch():
    # remainders (.6, .6, .8): the .8 cell rounds up first, then the
    # .6/.6 tie breaks by key → index 0
    out = _largest_remainder_round([1.6, 1.6, 0.8], 4, [(0,), (1,), (2,)])
    assert sum(out) == 4 and out == [2, 1, 1]


def test_largest_remainder_excess_branch():
    # floors sum to 4 > total 3 (the float-boundary case): the mirror
    # path decrements the positive cell with the smallest remainder,
    # ties broken by key — NOT the old max(0, short) over-publish
    out = _largest_remainder_round([2.0, 2.0], 3, [(0,), (1,)])
    assert sum(out) == 3 and out == [1, 2]
    out = _largest_remainder_round([2.0, 2.25, 1.0], 4, [(0,), (1,), (2,)])
    assert sum(out) == 4 and min(out) >= 0
    # never drives a zero cell negative
    out = _largest_remainder_round([0.0, 3.0, 3.0], 4, [(0,), (1,), (2,)])
    assert sum(out) == 4 and min(out) >= 0


# ---------------------------------------------------------------------------
# r8 advisory (low): hits_int(iters=0) used to return zero auth on the
# driver branch but crash the distributed branch.
# ---------------------------------------------------------------------------


def test_hits_int_rejects_zero_iters(spark):
    from dbms_data_anonymity_differential_privacy_spark.operators.graph import hits_int

    edges = spark.createDataFrame([(1, 2)], "src LONG, dst LONG")
    with pytest.raises(ValueError, match="iters"):
        hits_int(edges, iters=0)


# ---------------------------------------------------------------------------
# r8 advisory (low): the x212 oracle hardcodes the channel vocabulary;
# pin the events fixture to it so a new event_type desyncs LOUDLY.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", SF001])
def test_x212_channel_vocab_pinned_to_fixture(sf_dir):
    import duckdb

    from dbms_data_anonymity_differential_privacy_spark.queries_registry import (
        PUBLIC_EVENT_CHANNELS,
    )

    vocab = {
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT event_type FROM '{sf_dir}/events.parquet'"
        ).fetchall()
    }
    assert vocab - {"purchase"} == set(PUBLIC_EVENT_CHANNELS), (
        "events fixture vocabulary moved: update PUBLIC_EVENT_CHANNELS "
        "(x212's oracle derives its removal variants from it)"
    )


# ---------------------------------------------------------------------------
# c03_encode_scale: the oracle-checkable prefix must match the REAL MLlib
# StringIndexer(alphabetAsc) + StandardScaler(withMean, withStd) stages.
# ---------------------------------------------------------------------------


def test_encode_scale_matches_mllib_stages(spark):
    from pyspark.ml.feature import StandardScaler, StringIndexer, VectorAssembler

    from dbms_data_anonymity_differential_privacy_spark.operators.clustering import encode_scale
    from dbms_data_anonymity_differential_privacy_spark.sources.readers import load_table

    c = load_table(spark, SF001, "customer")
    mine = encode_scale(
        c,
        ["c_nationkey", "c_mktsegment", "c_acctbal"],
        id_col="c_custkey",
        money_cols=("c_acctbal",),
    ).collect()

    idx = StringIndexer(
        inputCol="c_mktsegment",
        outputCol="__idx",
        handleInvalid="keep",
        stringOrderType="alphabetAsc",
    )
    work = idx.fit(c).transform(c)
    assembled = VectorAssembler(
        inputCols=["c_nationkey", "__idx", "c_acctbal"], outputCol="__raw"
    ).transform(work)
    scaled = (
        StandardScaler(inputCol="__raw", outputCol="__f", withMean=True, withStd=True)
        .fit(assembled)
        .transform(assembled)
        .select("c_custkey", "__idx", "__f")
        .collect()
    )
    ml = {r["c_custkey"]: (int(r["__idx"]), list(r["__f"])) for r in scaled}
    assert len(mine) == len(ml)
    for r in mine:
        midx, mvec = ml[r["c_custkey"]]
        assert r["c_mktsegment_idx"] == midx
        for got, want in zip(
            (r["c_nationkey_scaled_r"], r["c_mktsegment_scaled_r"], r["c_acctbal_scaled_r"]),
            mvec,
        ):
            assert got == pytest.approx(want, rel=1e-6, abs=1e-6)


# ---------------------------------------------------------------------------
# r8 debut invariants (oracle hashes cover exact values; these pin the
# mathematical contracts on fixture data).
# ---------------------------------------------------------------------------


def test_silhouette_bounds_and_separated_clusters(spark):
    from dbms_data_anonymity_differential_privacy_spark.operators.embeddings import (
        silhouette_by_label,
    )

    # two tight, well-separated clusters → silhouette near 1 for both
    rows = [
        (1, [0.0, 0.0], 0),
        (2, [0.1, 0.0], 0),
        (3, [10.0, 10.0], 1),
        (4, [10.1, 10.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>, label INT")
    out = {r["label"]: r for r in silhouette_by_label(df).collect()}
    assert set(out) == {0, 1}
    for r in out.values():
        assert r["n"] == 2
        assert 0.9 <= r["silhouette_r"] <= 1.0
        assert -1.0 <= r["silhouette_r"] <= 1.0


def test_kendall_tau_perfect_and_reversed(spark):
    from dbms_data_anonymity_differential_privacy_spark.operators.stats import kendall_tau_b

    inc = spark.createDataFrame([(i, i, 2 * i) for i in range(20)], "k LONG, x LONG, y LONG")
    r = kendall_tau_b(inc, "x", "y").first()
    assert r["tau_b_r"] == 1.0 and r["ties_x"] == 0 and r["ties_y"] == 0
    assert r["concordant"] == 190 and r["discordant"] == 0

    dec = spark.createDataFrame([(i, i, -i) for i in range(20)], "k LONG, x LONG, y LONG")
    assert kendall_tau_b(dec, "x", "y").first()["tau_b_r"] == -1.0


def test_kendall_tau_constant_marginal_is_null(spark):
    from dbms_data_anonymity_differential_privacy_spark.operators.stats import kendall_tau_b

    const = spark.createDataFrame([(i, 1, i) for i in range(5)], "k LONG, x LONG, y LONG")
    assert kendall_tau_b(const, "x", "y").first()["tau_b_r"] is None


def test_krippendorff_alpha_agreement_extremes(spark):
    from dbms_data_anonymity_differential_privacy_spark.operators.stats import (
        krippendorff_alpha_nominal,
    )

    # perfect agreement within every unit, two labels across units → α = 1
    rows = [(u, lbl) for u in range(10) for lbl in [("a" if u % 2 else "b")] * 3]
    df = spark.createDataFrame(rows, "u LONG, l STRING")
    r = krippendorff_alpha_nominal(df, "u", "l").first()
    assert r["n_units"] == 10 and r["n_ratings"] == 30
    assert r["alpha_r"] == 1.0 and r["d_obs_r"] == 0.0

    # one label everywhere → D_e = 0 → alpha undefined (NULL)
    mono = spark.createDataFrame([(u, "a") for u in range(4) for _ in range(2)], "u LONG, l STRING")
    assert krippendorff_alpha_nominal(mono, "u", "l").first()["alpha_r"] is None


def test_krippendorff_wide_units_escalate_to_fold_path(spark):
    """r10: units past the LCM(1..16) bound no longer raise — the
    operator escalates to the sorted-fold double path and still
    releases the textbook alpha (checked against a direct NumPy-free
    reference computation)."""
    from dbms_data_anonymity_differential_privacy_spark.operators.stats import (
        krippendorff_alpha_nominal,
    )

    # unit 1: 18 alternating ratings (wide); unit 2: 4 agreeing ratings
    rows = [(1, str(i % 2)) for i in range(18)] + [(2, "0")] * 4
    wide = spark.createDataFrame(rows, "u LONG, l STRING")
    r = krippendorff_alpha_nominal(wide, "u", "l").first()
    assert r["n_units"] == 2 and r["n_ratings"] == 22
    # reference: D_o = (1/n) Σ (m²−Σn_uc²)/(m−1); D_e = (n²−Σn_c²)/(n(n−1))
    do = ((18 * 18 - (81 + 81)) / 17 + (16 - 16) / 3) / 22
    nc0, nc1 = 9 + 4, 9
    de = (22 * 22 - (nc0 * nc0 + nc1 * nc1)) / (22 * 21)
    assert r["d_obs_r"] == pytest.approx(do, abs=1e-9)
    assert r["d_exp_r"] == pytest.approx(de, abs=1e-9)
    assert r["alpha_r"] == pytest.approx(1 - do / de, abs=1e-8)

    # and a narrow panel still takes the exact-integer LCM path with an
    # identical release (paths agree where both are defined)
    narrow = spark.createDataFrame(
        [(u, str((u + i) % 3)) for u in range(6) for i in range(5)],
        "u LONG, l STRING",
    )
    a_lcm = krippendorff_alpha_nominal(narrow, "u", "l").first()
    a_fold = krippendorff_alpha_nominal(
        narrow, "u", "l", max_ratings_per_unit=2
    ).first()  # force the fold path on the same data
    assert a_lcm["alpha_r"] == pytest.approx(a_fold["alpha_r"], abs=1e-9)


# ---------------------------------------------------------------------------
# r7 verdict task 6: the bench artifact must be transposition-proof —
# loadavg keys prefixed, times dict last (the driver's tail capture
# truncates the printed line from the front).
# ---------------------------------------------------------------------------


def test_bench_artifact_dicts_are_labeled():
    import json
    import pathlib

    art = pathlib.Path(__file__).parent.parent / "BENCH_full.json"
    d = json.loads(art.read_text())
    keys = list(d)
    assert keys[-1] == "queries", "times dict must be the LAST key"
    assert all(k.startswith("la:") for k in d["query_loadavg_1m"]), (
        "per-query loadavg keys must carry the la: prefix"
    )
    assert not set(d["query_loadavg_1m"]) & set(d["queries"])


# ---------------------------------------------------------------------------
# r7 verdict task 3: one multi-mechanism release walked through ONE
# ledger end-to-end — the final (eps, delta) spend must equal the
# documented sequential composition, and exhaustion must REJECT before
# any further release (ledger unchanged).
# ---------------------------------------------------------------------------


def test_dp_budget_ledger_end_to_end(spark):
    import math

    from dbms_data_anonymity_differential_privacy_spark.operators.dp import (
        BudgetExceededError,
        ZCDPBudget,
        dp_above_threshold,
        dp_count,
        dp_count_gaussian,
        dp_histogram,
        dp_sum,
    )
    from dbms_data_anonymity_differential_privacy_spark.sources.readers import load_table

    ev = load_table(spark, SF001, "events")
    budget = PrivacyBudget(total_epsilon=4.0, total_delta=1e-6)

    # one dataset, five mechanisms, one accountant — a realistic release
    dp_count(ev, ["event_type"], epsilon=0.5, seed=1, budget=budget).collect()
    dp_sum(
        ev, ["event_type"], "value", epsilon=0.5, lower=0.0, upper=100.0,
        seed=2, budget=budget,
    ).collect()
    dp_histogram(
        ev, "value", n_bins=10, epsilon=0.5, lower=0.0, upper=100.0,
        seed=3, budget=budget,
    ).collect()
    dp_above_threshold(
        ev, ["event_type"], threshold=1000.0, epsilon=0.5, seed=4, budget=budget
    ).collect()
    dp_count_gaussian(
        ev, ["event_type"], epsilon=0.5, delta=1e-6, seed=5, budget=budget
    ).collect()
    # consistent histogram spends TWICE (cells + total) — the documented
    # parallel-composition-plus-total cost
    dp_histogram_consistent(ev, ["event_type"], epsilon=0.4, seed=6, budget=budget)

    # sequential composition: epsilons add, deltas add
    assert budget.spent == pytest.approx(0.5 * 5 + 0.4 * 2)
    assert budget.spent_delta == pytest.approx(1e-6)
    assert len(budget.ledger) == 7
    assert budget.remaining == pytest.approx(4.0 - 3.3)

    # exhaustion: needs 0.8, only 0.7 remains → reject BEFORE release,
    # ledger untouched
    before = list(budget.ledger)
    with pytest.raises(BudgetExceededError):
        dp_count(ev, ["event_type"], epsilon=0.8, seed=7, budget=budget)
    assert budget.ledger == before

    # delta exhaustion independently enforced
    with pytest.raises(BudgetExceededError):
        dp_count_gaussian(
            ev, ["event_type"], epsilon=0.1, delta=0.5, seed=8, budget=budget
        )
    assert budget.ledger == before

    # zCDP accountant: rho composes additively; epsilon_at reports the
    # documented conversion eps = rho + 2 sqrt(rho ln(1/delta))
    z = ZCDPBudget(total_rho=0.02)
    for s in (11, 12, 13):
        dp_count_gaussian(
            ev, ["event_type"], epsilon=0.3, delta=1e-6, seed=s, budget=z
        ).collect()
    rho_each = 0.3 * 0.3 / (4.0 * math.log(1.25 / 1e-6))
    assert z.spent_rho == pytest.approx(3 * rho_each)
    rho = z.spent_rho
    assert z.epsilon_at(1e-6) == pytest.approx(
        rho + 2.0 * math.sqrt(rho * math.log(1.0 / 1e-6))
    )
    with pytest.raises(BudgetExceededError):
        dp_count(ev, ["event_type"], epsilon=0.5, seed=14, budget=z)


# ---------------------------------------------------------------------------
# r7 verdict task 5: semantic_dedup(block_col=None) auto-samples its
# k-center fitting pool above _CORESET_FIT_THRESHOLD rows. Below the
# threshold the release must stay byte-identical to the full-pool path
# (the oracle-hashed config); above it, block recall vs the full-pool
# trajectory must stay high (>= 0.95 on dropped-id recall at sf1).
# ---------------------------------------------------------------------------


def test_semantic_dedup_auto_below_threshold_is_full_pool(spark):
    from dbms_data_anonymity_differential_privacy_spark.operators.dedup import semantic_dedup
    from dbms_data_anonymity_differential_privacy_spark.sources.readers import load_table

    emb = load_table(spark, SF001, "embeddings")  # 500 rows << threshold
    auto = semantic_dedup(emb, threshold=0.4, block_col=None).collect()
    full = semantic_dedup(emb, threshold=0.4, block_col=None, coreset_sample=1.0).collect()
    assert sorted(map(tuple, auto)) == sorted(map(tuple, full))


SF1_DIR = "/root/repo/.bench_data/sf1.0"


@pytest.mark.skipif(
    not __import__("os").path.exists(f"{SF1_DIR}/embeddings.parquet"),
    reason="synthetic sf1 data not generated (tools/inflate_sf.py)",
)
def test_semantic_dedup_sampled_fit_recall_at_sf1(spark):
    """20k embeddings > threshold → the default path fits the quantizer
    on a ~8k hash-sample. Two claims, both vs the FULL-POOL trajectory:

    1. COVERAGE RECALL >= 0.95: the fraction of the corpus within the
       full trajectory's coverage radius of a SAMPLED center — the
       quantity greedy k-center optimizes, i.e. "the sampled fit is
       the same quantizer". Measured 0.9998 at sf1 (radius ratio
       1.006).
    2. DETECTION-POWER PARITY: the sampled-fit dedup must drop within
       5% as many duplicates as the full fit.

    Pair-IDENTITY recall is deliberately NOT the gate: the synthetic
    embeddings are isotropic noise (max pair cosine ~0.5), so the
    qualifying pairs live ON the Voronoi boundaries and trade ~1:1
    when centers move (measured 0.37 pair-identity agreement with
    IDENTICAL pair counts, 27.4k vs 27.6k) — an instability of
    boundary pairs on structureless fixtures, not a lost-duplicate
    problem. On real clustered corpora (SemDeDup's regime) blocks
    track cluster structure and both metrics coincide.
    """
    from dbms_data_anonymity_differential_privacy_spark.operators.dedup import (
        _CORESET_FIT_TARGET,
        _CORESET_FIT_THRESHOLD,
        semantic_dedup,
    )
    from dbms_data_anonymity_differential_privacy_spark.operators.embeddings import (
        kcenter_coreset,
    )
    from dbms_data_anonymity_differential_privacy_spark.operators.sampling import hash_sample
    from dbms_data_anonymity_differential_privacy_spark.operators.similarity import _dot

    emb = spark.read.parquet(f"{SF1_DIR}/embeddings.parquet")
    n = emb.count()
    assert n > _CORESET_FIT_THRESHOLD, "sf1 fixture no longer exceeds the threshold"

    def min_d2(centers):
        v = F.col("embedding").cast("array<double>")
        crows = (
            centers.select("round", "vec_id")
            .join(emb, on="vec_id")
            .select("round", v.alias("cv"))
            .collect()
        )
        xx = _dot(v, v)
        cands = []
        for row in sorted(crows, key=lambda r: r["round"]):
            cvec = [float(x) for x in row["cv"]]
            cxx = sum(x * x for x in cvec)
            clit = F.array(*[F.lit(x) for x in cvec])
            cands.append(xx - 2.0 * _dot(v, clit) + F.lit(cxx))
        return emb.select(F.greatest(F.least(*cands), F.lit(0.0)).alias("d2"))

    c_full = kcenter_coreset(emb, k=8)
    c_sampled = kcenter_coreset(
        hash_sample(emb, ["vec_id"], _CORESET_FIT_TARGET / n, salt="semdedup-coreset"),
        k=8,
    )
    r_full = min_d2(c_full).agg(F.max("d2")).first()[0]
    cov = (
        min_d2(c_sampled)
        .agg(F.avg((F.col("d2") <= F.lit(float(r_full))).cast("double")))
        .first()[0]
    )
    print(f"sampled-fit coverage recall at full radius: {cov:.4f}")
    assert cov >= 0.95

    auto = semantic_dedup(emb, threshold=0.4, block_col=None)
    full = semantic_dedup(emb, threshold=0.4, block_col=None, coreset_sample=1.0)
    d_auto = auto.filter("NOT kept").count()
    d_full = full.filter("NOT kept").count()
    assert d_full > 0, "fixture has no duplicate clusters at this threshold"
    print(f"dropped: sampled-fit {d_auto} vs full-fit {d_full}")
    assert abs(d_auto - d_full) <= 0.05 * d_full


# ---------------------------------------------------------------------------
# r7 verdict task 8: the C10 RF utility band at BENCH scale (sf0.1) —
# fixture-scale bands alone would let MLlib version drift land unseen.
# Synthetic mktsegment carries no real signal, so both accuracies sit at
# chance (~1/5, measured 0.1926 on pyspark 4.1.2) and the drop is ~0;
# a quietly changed RF (new impurity default, changed rng streams,
# feature-subsampling change) moves these out of band.
# ---------------------------------------------------------------------------


def test_c10_utility_band_at_sf01(spark):
    from dbms_data_anonymity_differential_privacy_spark import queries_registry as qr

    row = qr.QUERIES["c10_utility_accuracy"](spark, "/root/testdata/sf0.1").collect()[0]
    assert 0.15 <= row["accuracy_original"] <= 0.25, row
    assert 0.15 <= row["accuracy_anonymized"] <= 0.25, row
    assert abs(row["accuracy_drop"]) <= 0.05, row
    assert row["accuracy_drop"] == pytest.approx(
        row["accuracy_original"] - row["accuracy_anonymized"], abs=1e-9
    )


def test_silhouette_plan_is_map_only_scoring(spark):
    """x224's scoring must ride literal centroid arrays (the x175
    idiom): no cartesian/broadcast-NL join, no per-id shuffle — the
    ONLY exchange in the released plan is the per-label aggregation,
    and the scan prunes to (embedding, label)."""
    from dbms_data_anonymity_differential_privacy_spark import queries_registry as qr

    df = qr.QUERIES["x224_silhouette"](spark, SF001)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "ReadSchema: struct<embedding:array<float>,label:int>" in plan


# ---------------------------------------------------------------------------
# Brute-force reference cross-checks: the grid/LCM formulations must
# equal the O(n²)/textbook computations on small data.
# ---------------------------------------------------------------------------


def test_kendall_tau_matches_bruteforce(spark):
    import itertools
    import math
    import random

    from dbms_data_anonymity_differential_privacy_spark.operators.stats import kendall_tau_b

    rng = random.Random(8)
    data = [(i, rng.randint(0, 6), rng.randint(0, 4)) for i in range(200)]
    df = spark.createDataFrame(data, "k LONG, x LONG, y LONG")
    r = kendall_tau_b(df, "x", "y").first()

    c = d = tx = ty = 0
    for (_, xa, ya), (_, xb, yb) in itertools.combinations(data, 2):
        if xa == xb and ya == yb:
            tx += 1
            ty += 1
        elif xa == xb:
            tx += 1
        elif ya == yb:
            ty += 1
        elif (xa < xb) == (ya < yb):
            c += 1
        else:
            d += 1
    n = len(data)
    n0 = n * (n - 1) / 2
    tau = (c - d) / math.sqrt((n0 - tx) * (n0 - ty))
    assert r["concordant"] == c and r["discordant"] == d
    assert r["ties_x"] == tx and r["ties_y"] == ty
    assert r["tau_b_r"] == pytest.approx(tau, abs=1e-8)


def test_krippendorff_matches_textbook(spark):
    import random
    from collections import Counter, defaultdict

    from dbms_data_anonymity_differential_privacy_spark.operators.stats import (
        krippendorff_alpha_nominal,
    )

    rng = random.Random(9)
    rows = []
    for u in range(60):
        m = rng.randint(1, 6)
        for _ in range(m):
            rows.append((u, rng.choice("abc")))
    df = spark.createDataFrame(rows, "u LONG, l STRING")
    r = krippendorff_alpha_nominal(df, "u", "l").first()

    units: dict = defaultdict(Counter)
    for u, lbl in rows:
        units[u][lbl] += 1
    kept = {u: cnt for u, cnt in units.items() if sum(cnt.values()) >= 2}
    n = sum(sum(c.values()) for c in kept.values())
    d_obs = (
        sum(
            (m * m - sum(v * v for v in cnt.values())) / (m - 1)
            for cnt, m in ((c, sum(c.values())) for c in kept.values())
        )
        / n
    )
    marg: Counter = Counter()
    for cnt in kept.values():
        marg.update(cnt)
    d_exp = (n * n - sum(v * v for v in marg.values())) / (n * (n - 1))
    alpha = 1.0 - d_obs / d_exp
    assert r["n_ratings"] == n
    assert r["d_obs_r"] == pytest.approx(d_obs, abs=1e-8)
    assert r["d_exp_r"] == pytest.approx(d_exp, abs=1e-8)
    assert r["alpha_r"] == pytest.approx(alpha, abs=1e-8)


def test_largest_remainder_property():
    """Any non-negative scaled vector, any total: the published integers
    sum EXACTLY to the total and never go negative."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(st.floats(0.0, 1e6, allow_nan=False), min_size=1, max_size=20),
        st.integers(0, 10_000),
    )
    def prop(scaled, total):
        out = _largest_remainder_round(scaled, total, [(i,) for i in range(len(scaled))])
        assert sum(out) == total
        assert min(out) >= 0

    prop()


def test_canary_audit_planted_and_absent(spark):
    from dbms_data_anonymity_differential_privacy_spark.operators.dedup import canary_audit

    docs = spark.createDataFrame(
        [
            (1, "the canary XYZZY sings XYZZY twice"),
            (2, "no secrets here"),
            (3, "XYZZY appears once"),
        ],
        "doc_id LONG, text STRING",
    )
    out = {r["canary"]: r for r in canary_audit(docs, ["XYZZY", "PLUGH"]).collect()}
    assert out["XYZZY"]["n_docs"] == 2
    assert out["XYZZY"]["n_occurrences"] == 3
    assert out["XYZZY"]["first_doc_id"] == 1
    # absence is the PASSING result and must be a visible zero row
    assert out["PLUGH"]["n_docs"] == 0
    assert out["PLUGH"]["n_occurrences"] == 0
    assert out["PLUGH"]["first_doc_id"] is None

    with pytest.raises(ValueError, match="empty canary"):
        canary_audit(docs, [""])


def test_cosine_pairs_grid_split_is_exact(spark):
    """The triangular grid split must release the IDENTICAL pair set and
    scores as the plain per-block join — it only changes the shuffle
    key, never the math."""
    from dbms_data_anonymity_differential_privacy_spark.operators.similarity import (
        cosine_self_join_pairs,
    )
    from dbms_data_anonymity_differential_privacy_spark.sources.readers import load_table

    emb = load_table(spark, SF001, "embeddings")
    plain = sorted(
        map(tuple, cosine_self_join_pairs(emb, 0.3, block_col="label").collect())
    )
    assert plain, "fixture produced no qualifying pairs"
    for g in (2, 8):
        grid = sorted(
            map(
                tuple,
                cosine_self_join_pairs(emb, 0.3, block_col="label", grid=g).collect(),
            )
        )
        assert grid == plain, f"grid={g} changed the release"


def test_semantic_dedup_kmeans_escalation(spark, monkeypatch):
    """Past the literal-center cap the auto path must escalate to the
    MLlib KMeans quantizer (SemDeDup proper) and still release a sound
    (id, component, kept) partition. Trigger the branch at fixture
    scale by shrinking the module thresholds."""
    from dbms_data_anonymity_differential_privacy_spark.operators import dedup as dd
    from dbms_data_anonymity_differential_privacy_spark.sources.readers import load_table

    monkeypatch.setattr(dd, "_CORESET_FIT_THRESHOLD", 100)
    monkeypatch.setattr(dd, "_CORESET_FIT_TARGET", 64.0)
    monkeypatch.setattr(dd, "_BLOCK_TARGET_ROWS", 50)
    monkeypatch.setattr(dd, "_AUTO_BLOCK_K_CAP", 4)
    monkeypatch.setattr(dd, "_PAIR_GRID_THRESHOLD", 100)

    emb = load_table(spark, SF001, "embeddings")  # 500 rows -> k_needed=10 > 4
    out = dd.semantic_dedup(emb, threshold=0.4, block_col=None)
    rows = out.collect()
    assert len(rows) == emb.count()
    assert len({r["vec_id"] for r in rows}) == len(rows)
    for r in rows:
        assert r["kept"] == (r["component"] == r["vec_id"])
        assert r["component"] <= r["vec_id"]  # min-id representative
    # the quantizer actually found structure: some duplicate clusters
    # collapse (the fixture has pairs above 0.4 inside k-means cells)
    assert any(not r["kept"] for r in rows)
    # deterministic: same seed, same release
    rows2 = dd.semantic_dedup(emb, threshold=0.4, block_col=None).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))
