"""Misra–Gries heavy hitters — bounded-memory frequent-value detection.

The third sketch family in the engine, next to Greenwald–Khanna quantiles
(`functions.binning.bin_equal_frequency_approx`, `metrics.group_percentiles
exact=False`) and HyperLogLog++ distinct counts (`profile_columns
exact=False`): "which values appear more than n/(k+1) times?" without a
full value_counts shuffle. At 100 TB a full `groupBy(value)` over a
high-cardinality column shuffles near-distinct rows; Misra–Gries caps the
state at k counters per partition and ships ≤ k rows per partition total.

Distributed shape (Agarwal et al., "Mergeable Summaries", PODS 2012):

1. **Per-partition summaries** via Arrow `mapInPandas`: each partition
   folds its batches through a k-counter Misra–Gries dict (per-batch exact
   ``value_counts`` merged into the running summary — batch-exact counts
   entering a standard MG merge keep the guarantee). Output ≤ k rows
   ``(value, cnt)`` per partition, plus ONE ``(NULL, d)`` row carrying the
   partition's total decrement — the summary's error certificate.
2. **SQL merge**: summed lower bounds per value (tiny groupBy over
   ≤ k × partitions rows). The decrement rows sum to the global error
   bound, attached to every output row as ``err_bound`` — for any value,
   ``est_count ≤ true_count ≤ est_count + err_bound``, and
   ``err_bound ≤ n/(k+1)`` by the MG invariant.

When k exceeds the column's true cardinality no decrement ever happens,
``err_bound`` is 0, and the sketch returns EXACT counts — the regime the
DuckDB oracle checks (`x49_heavy_hitters_exact`); the sketch regime is
pinned by bound tests against exact counts.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbms_data_anonymity_differential_privacy_spark.operators.util import fan_out


def _mg_partial(k: int):
    """Per-partition fold: batches → one MG summary + one decrement row."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        decremented = 0
        for pdf in batches:
            col = pdf.iloc[:, 0]
            # exact per-batch counts (the batch is in memory anyway), then
            # a standard MG merge of the batch histogram into the summary
            for value, cnt in col.value_counts(dropna=True).items():
                counters[value] = counters.get(value, 0) + int(cnt)
            if len(counters) > k:
                # decrement by the (k+1)-largest count: keeps ≤ k counters
                # and charges every surviving counter fairly (one bulk
                # decrement ≡ that many single-item MG decrements)
                cut = sorted(counters.values(), reverse=True)[k]
                decremented += cut
                counters = {v: c - cut for v, c in counters.items() if c > cut}
        out = pd.DataFrame(
            {
                "value": list(counters.keys()) + [None],
                "cnt": list(counters.values()) + [decremented],
            }
        )
        yield out

    return fold


def heavy_hitters(df: DataFrame, col: str, k: int = 32) -> DataFrame:
    """Approximate frequent values of ``col`` with ≤ k counters/partition.

    Returns ``(value, est_count, err_bound)`` — up to k rows, largest
    first. ``est_count`` is a LOWER bound on the true count; the true
    count is ≤ ``est_count + err_bound`` (global certificate, identical on
    every row). Values with true count > ``err_bound`` are guaranteed
    present. With k ≥ true cardinality, ``err_bound`` is 0 and counts are
    exact.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    in_type = df.schema[col].dataType
    schema = T.StructType(
        [T.StructField("value", in_type), T.StructField("cnt", T.LongType())]
    )
    partials = fan_out(df.select(col)).mapInPandas(_mg_partial(k), schema)
    merged = (
        partials.filter(F.col("value").isNotNull())
        .groupBy("value")
        .agg(F.sum("cnt").alias("est_count"))
    )
    err = partials.filter(F.col("value").isNull()).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("err_bound")
    )
    return (
        merged.crossJoin(F.broadcast(err))
        .orderBy(F.col("est_count").desc(), F.col("value"))
        .limit(k)
    )


# --------------------------------------------------------------------------
# X60 — bottom-k synopsis: ONE mergeable, DETERMINISTIC summary giving a
# uniform sample, quantile estimates with a DKW certificate, and a KMV
# distinct-count estimate. Unlike GK/HLL (engine-internal, rows-only
# checkable), every output here is a pure function of the data + salt —
# the sketch itself replays in SQL, so even the SKETCH REGIME is
# oracle-hashable.
# --------------------------------------------------------------------------


def bottomk_sample(
    df: DataFrame, key_cols, k: int, salt: str = ""
) -> DataFrame:
    """Deterministic uniform sample of ``k`` rows: keep the k smallest
    content-hash priorities (bottom-k / min-wise sampling).

    Mergeable by construction — bottom-k of a union is the bottom-k of
    the parts' bottom-ks — which is exactly how Spark executes it:
    TakeOrderedAndProject keeps a k-row heap per partition and merges
    heaps, no shuffle, no global sort. Ties in the 32-bit hash (expected
    once per ~2^16 rows²) are broken by the key columns so selection is
    total. Adds ``__u`` — the normalized (0, 1] priority — for the
    synopsis consumers below.
    """
    from dbms_data_anonymity_differential_privacy_spark.operators.sampling import (
        _SPACE,
        _hash_hex,
    )

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if k < 1:
        raise ValueError("k must be >= 1")
    hex_h = _hash_hex(keys, salt)
    h_int = F.conv(hex_h, 16, 10).cast("long")
    u = (h_int + F.lit(1)).cast("double") / F.lit(float(_SPACE))
    return (
        df.withColumn("__u", u)
        .orderBy(F.col("__u").asc(), *[F.col(c).asc() for c in keys])
        .limit(int(k))
    )


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    key_cols,
    k: int = 4096,
    ps=(0.5, 0.95, 0.99),
    salt: str = "",
    delta: float = 0.05,
) -> DataFrame:
    """X60 — quantile estimates from the bottom-k sample, with a
    Dvoretzky–Kiefer–Wolfowitz certificate.

    The k-row uniform sample's empirical CDF is within
    ``eps = sqrt(ln(2/delta) / (2k))`` of the true CDF simultaneously at
    EVERY point with probability 1 - delta, so each reported quantile's
    true rank lies in ``p ± eps``. Estimates are exact type-7 percentiles
    OF THE SAMPLE — deterministic given (data, salt), so the whole
    release (certificate included) hash-checks against a SQL replay.

    vs Greenwald–Khanna (``group_percentiles exact=False``): GK gives
    tighter rank error per byte but is engine-internal state; this
    synopsis trades a √k factor for full cross-engine reproducibility
    and a reusable sample. One pass, per-partition k-heaps, no shuffle.

    Output (single row): ``(n_rows, k_used, eps_dkw_r, p<P>_est ...)``.
    """
    import math

    if not 0 < delta < 1:
        raise ValueError("delta must be in (0, 1)")
    sample = bottomk_sample(df, key_cols, k, salt)

    def name(p: float) -> str:
        return "p" + f"{p * 100:g}".replace(".", "_") + "_est"

    est = sample.agg(
        F.count(F.lit(1)).alias("k_used"),
        *[F.expr(f"percentile({value_col}, {p!r})").alias(name(p)) for p in ps],
    )
    n = df.agg(F.count(F.lit(1)).alias("n_rows"))
    eps = round(math.sqrt(math.log(2.0 / delta) / (2.0 * k)), 9)
    return n.crossJoin(est).select(
        "n_rows",
        "k_used",
        F.lit(eps).alias("eps_dkw_r"),
        *[name(p) for p in ps],
    )


def kmv_distinct(df: DataFrame, cols, k: int = 256, salt: str = "") -> DataFrame:
    """X60 — k-minimum-values distinct-count estimate (Bar-Yossef et al.,
    RANDOM 2002): over the DISTINCT values' hash priorities, the k-th
    smallest ``u_(k)`` estimates cardinality as ``(k - 1) / u_(k)``
    (unbiased; relative error ~ 1/sqrt(k - 2)).

    Fully deterministic — same md5 priorities as the sampling family —
    so unlike HLL++ (``profile_columns exact=False``) the ESTIMATE
    itself is oracle-hashable. When the column has fewer than k distinct
    values the synopsis holds them all and the exact count is returned.
    Physical shape: distinct (one key shuffle with partial combine) →
    per-partition k-heaps → singleton reduce.

    Output (single row): ``(k_used, kth_u_r, n_distinct_est_r)``.
    """
    keys = [cols] if isinstance(cols, str) else list(cols)
    sample = bottomk_sample(df.select(*keys).distinct(), keys, k, salt)
    agg = sample.agg(
        F.count(F.lit(1)).alias("k_used"), F.max("__u").alias("__ku")
    )
    exact_regime = F.col("k_used") < F.lit(int(k))
    return agg.select(
        "k_used",
        F.round("__ku", 9).alias("kth_u_r"),
        F.round(
            F.when(exact_regime, F.col("k_used").cast("double")).otherwise(
                (F.col("k_used") - F.lit(1)).cast("double") / F.col("__ku")
            ),
            9,
        ).alias("n_distinct_est_r"),
    )


# fixed universal-hash family for the Bloom membership sketch: h_i(x) =
# ((a_i * (x mod P) + b_i) mod P) mod m. P = 2^31 - 1 (Mersenne prime);
# a_i, b_i arbitrary fixed constants < P. The key is reduced mod P FIRST
# (identity for keys < 2^31, so small-sf hash positions are unchanged),
# which keeps every product under 2^62 for ANY long key — without the
# pre-reduction, billion-scale surrogate ids (exactly what a 100 TB
# catalog hands out; caught by the sf1 bench overflowing int64) would
# overflow the multiply on BOTH engines. The SAME integer arithmetic
# runs exactly on Spark longs and DuckDB BIGINTs — membership is
# hash-checkable cross-engine, unlike engine-builtin hash functions
# which never match across engines. Key contract: non-negative ids
# (both engines' % follows the dividend sign).
BLOOM_P = 2_147_483_647
BLOOM_HASHES = ((982_451_653, 12_289), (715_827_883, 524_287), (179_424_673, 6_700_417))


def bloom_membership(
    build: DataFrame,
    build_col: str,
    probe: DataFrame,
    probe_col: str,
    m: int = 8192,
) -> DataFrame:
    """Bloom-filter membership probe with engine-portable hashes.

    Builds the filter over ``build[build_col]`` (long keys) as the
    DISTINCT set of bit positions hit by the k=3 universal hashes, then
    probes every ``probe[probe_col]`` key: ``maybe_present`` iff all 3
    of its positions are set. Classic guarantee: no false negatives;
    false-positive rate ~ (1 - e^{-kn/m})^k.

    Output: one row per probe key — ``(key, maybe_present)``.

    Scale shape: the position set is at most ``m`` rows (bounded by the
    filter's bit width, NOT by the build cardinality) — it broadcasts as
    a map-side hash join however big the build side is; the build pass
    itself is one explode + distinct on integer positions (partial
    aggregation collapses each partition to <= m rows before the
    shuffle). This IS how engines ship runtime-filter bloom pushdowns:
    build rolls up to a tiny bitset, probe stays map-only.
    """

    def positions(col: F.Column) -> list[F.Column]:
        reduced = col % F.lit(BLOOM_P)
        return [
            ((reduced * F.lit(a) + F.lit(b)) % F.lit(BLOOM_P) % F.lit(m)).alias(f"__p{i}")
            for i, (a, b) in enumerate(BLOOM_HASHES)
        ]

    key = F.col(build_col).cast("long")
    bits = (
        build.select(F.explode(F.array(*positions(key))).alias("pos"))
        .distinct()
        .withColumn("__set", F.lit(1))
    )
    pkey = F.col(probe_col).cast("long")
    probed = probe.select(F.col(probe_col).alias("key"), *positions(pkey))
    for i in range(len(BLOOM_HASHES)):
        probed = (
            probed.join(
                F.broadcast(bits.select(F.col("pos").alias(f"__p{i}"), F.col("__set").alias(f"__s{i}"))),
                on=f"__p{i}",
                how="left",
            )
        )
    maybe = F.lit(True)
    for i in range(len(BLOOM_HASHES)):
        maybe = maybe & F.col(f"__s{i}").isNotNull()
    return probed.select("key", maybe.alias("maybe_present"))


# HyperLogLog geometry: p = 12 -> m = 4096 registers; alpha_m is the
# standard bias constant 0.7213/(1 + 1.079/m) embedded as one decimal
# literal so both engines parse the identical double.
HLL_P = 12
HLL_M = 4096
HLL_ALPHA = 0.7211100396160289


def hll_distinct(df: DataFrame, col: str, include_exact: bool = True) -> DataFrame:
    """X202 — HyperLogLog distinct-count synopsis (Flajolet et al. 2007),
    built from PORTABLE md5 hashes so the registers — and therefore the
    ESTIMATE — are bit-identical in any engine (unlike builtin
    ``approx_count_distinct``, whose HLL++ registers are engine-private;
    that flavor is ``profile_columns exact=False``). The companion of
    :func:`kmv_distinct` with the industry-standard register layout: the
    4096-register relation is MERGEABLE (max per register), which is the
    production story — per-shard registers roll up with one more max.

    Register construction: bucket = first 12 bits of md5 (3 hex chars);
    rank = leading-zero count of the next 52 bits + 1, computed from HEX
    characters (strip leading '0's, then a 16-way CASE on the first
    non-zero digit) — pure string/integer ops, no bit intrinsics needed.
    Duplicates never matter (register = MAX of ranks), so the input is
    NOT pre-deduplicated — one (bucket) partial-agg shuffle total. NULLs
    are excluded up front (md5(NULL) would otherwise mint a phantom
    register whose power term silently drops — and the SQL twin's
    list() would carry the NULL into a NULL estimate).

    Estimate: ``alpha·m²/Σ 2^(−M_j)`` with empty registers contributing
    2⁰; the 2-powers are exact doubles and the 4096-term sum runs as a
    SORTED in-row fold (register relation is metadata-sized), so the raw
    estimate is deterministic cross-engine. Small-range linear counting
    (``raw <= 2.5m`` and zeros present) applies the standard
    ``m·ln(m/V)`` correction (6 dp).

    Output (single row): ``(m_registers, n_nonempty, raw_est_r, est_r``
    [, ``n_exact``]) — ``include_exact`` adds the true distinct count
    for sketch-quality audits (one extra distinct shuffle; disable at
    100 TB).
    """
    h = F.md5(F.col(col).cast("string").cast("binary"))
    rem = F.regexp_replace(F.substring(h, 4, 13), "^0+", "")
    first = F.substring(rem, 1, 1)
    bits_first = (
        F.when(first == "1", 1)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 3)
        .otherwise(4)
    )
    rank = F.when(rem == "", F.lit(53)).otherwise(
        4 * (13 - F.length(rem)) + (4 - bits_first) + 1
    )
    reg = (
        df.filter(F.col(col).isNotNull())
        .select(
            F.conv(F.substring(h, 1, 3), 16, 10).cast("long").alias("bucket"),
            rank.alias("__rank"),
        )
        .groupBy("bucket")
        .agg(F.max("__rank").alias("m"))
    )
    s = reg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nonempty"),
        F.expr(
            "aggregate(array_sort(collect_list(power(2.0D, -CAST(m AS DOUBLE)))), "
            "CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
        ).alias("__sum_nz"),
    )
    md = F.lit(float(HLL_M))
    raw = (F.lit(HLL_ALPHA) * md * md) / (
        F.col("__sum_nz") + (md - F.col("n_nonempty").cast("double"))
    )
    zeros = md - F.col("n_nonempty").cast("double")
    est = F.when(
        (raw <= 2.5 * HLL_M) & (F.col("n_nonempty") < HLL_M),
        md * F.log(md / zeros),
    ).otherwise(raw)
    out = s.select(
        F.lit(HLL_M).cast("long").alias("m_registers"),
        "n_nonempty",
        F.round(raw, 6).alias("raw_est_r"),
        F.round(est, 6).alias("est_r"),
    )
    if include_exact:
        exact = df.agg(F.countDistinct(F.col(col)).cast("long").alias("n_exact"))
        out = out.join(F.broadcast(exact))
    return out


def count_min_estimates(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    top: int = 20,
    salt: str = "cms",
) -> DataFrame:
    """X232 — Count-Min sketch (Cormode & Muthukrishnan 2005) with a
    side-by-side exact audit: build the d×w counter grid with portable
    md5 bucket hashes, then release, for the exact top-``top`` keys,
    the exact count next to the CMS estimate (min over the key's d
    counters). The one-sided error contract — ``cms >= exact``, excess
    ≤ εN with ε = e/w at δ = e^−d — becomes an AUDITABLE relation
    instead of a paper claim; this is the sketch a 100 TB pipeline
    ships when the exact key space (x49's Misra-Gries regime) no
    longer fits anywhere.

    Portability: bucket_i(k) = hex(md5(k || '#<salt>' || i))[:8] mod w —
    the same md5 fraction discipline as hash_sample/x10, so DuckDB
    reproduces every counter exactly; estimates and counts are integer;
    the release carries no floats at all. Ties in the top-k break by
    key ascending (deterministic).

    Output: ``(key, exact_count, cms_count, overcount)`` for the top
    keys by exact count.

    Scale shape (100 TB): the counter grid is ONE aggregation of the
    keyed stream exploded ×depth (map-side combining collapses to d·w
    rows ≪ the stream); the exact top-k is one aggregation + a
    TakeOrdered; the estimate join touches top·depth counter rows
    against the d·w grid — broadcast-sized both sides.
    """
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    spark = df.sparkSession
    keyed = df.select(F.col(key_col).cast("string").alias("__k")).where(
        F.col("__k").isNotNull() & (F.col("__k") != "")
    )
    rows = spark.range(0, depth).select(F.col("id").cast("int").alias("__i"))

    def bucket(k: F.Column, i: F.Column) -> F.Column:
        h = F.md5(F.concat(k, F.lit(f"#{salt}"), i.cast("string")))
        return (
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(width)
        ).alias("__b")

    from dbms_data_anonymity_differential_privacy_spark.operators.util import track_cached

    # ONE corpus scan: the exact per-key counts are the sketch's
    # sufficient statistic, so the counter grid derives from the
    # vocab-sized relation (sum of key counts per bucket == count of
    # occurrences per bucket), and top-k reads the same cache — the
    # unpersisted three-scan shape re-tokenized the corpus three times
    # (round-9 review finding).
    exact = track_cached(
        keyed.groupBy("__k")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
        .persist()
    )
    counters = (
        exact.crossJoin(F.broadcast(rows))
        .groupBy(F.col("__i"), bucket(F.col("__k"), F.col("__i")))
        .agg(F.sum("exact_count").cast("long").alias("__c"))
    )
    topk = exact.orderBy(F.desc("exact_count"), F.asc("__k")).limit(top)
    probes = topk.crossJoin(F.broadcast(rows)).select(
        "__k", "exact_count", "__i", bucket(F.col("__k"), F.col("__i"))
    )
    est = (
        probes.join(counters, on=["__i", "__b"])
        .groupBy("__k", "exact_count")
        .agg(F.min("__c").alias("cms_count"))
    )
    return est.select(
        F.col("__k").alias("key"),
        "exact_count",
        "cms_count",
        (F.col("cms_count") - F.col("exact_count")).alias("overcount"),
    )
