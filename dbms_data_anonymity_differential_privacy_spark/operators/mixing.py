"""Corpus mixture reweighting — hit a target domain/language mix.

Training-data recipes prescribe the mixture, not the crawl: "40% English,
30% code, ..." (e.g. the mixture tables of GPT-3/LLaMA/Gopher-class
reports). Given observed per-group counts and a target share per group,
the feasible epoch is capped by the scarcest group; every other group is
downsampled to match. This module computes those rates exactly and
applies them with the engine's deterministic content-hash sampler, so the
realized subset is reproducible on any cluster layout.

Math: with group counts ``n_g`` and target shares ``s_g`` (sum ≤ 1 over
the targeted groups), the largest total ``T`` satisfying
``T * s_g <= n_g`` for all targeted groups is ``T = min_g n_g / s_g``;
each group then keeps ``rate_g = min(1, T * s_g / n_g)`` of its rows.
Groups without a target share get rate 0 (dropped from the mix).

Scale shape: one group-count aggregation (map-side partial, shuffle
carries one row per group), a broadcast join against the kilobyte-scale
share table, and a 1-row global min broadcast back — then the apply step
is the map-only hash filter from `operators/sampling.py`. No fact-table
shuffle anywhere.

Cross-engine exactness: every float op (n/s, T*s/n, LEAST) is applied in
the same order on both engines, so the oracle comparison is bit-exact
with no rounding.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def mixture_rates(
    df: DataFrame, group_col: str, target_shares: Mapping[str, float]
) -> DataFrame:
    """Per-group keep rates that realize ``target_shares``.

    Output: ``(group_col, n_rows, target_share, rate, take_rows)`` —
    ``take_rows = floor(T * share)`` is the realized group size. Only
    groups present in ``df`` appear; a targeted group with no rows would
    make the mixture infeasible (T = 0), which the caller should treat
    as a data bug, not silently skip.
    """
    if not target_shares:
        raise ValueError("target_shares must be non-empty")
    bad = [g for g, s in target_shares.items() if s < 0]
    if bad or sum(target_shares.values()) > 1.0 + 1e-9:
        raise ValueError(f"shares must be >= 0 and sum to <= 1: {dict(target_shares)}")

    spark = df.sparkSession
    shares = spark.createDataFrame(
        [(g, float(s)) for g, s in target_shares.items()],
        f"{group_col} string, target_share double",
    )
    counts = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .join(F.broadcast(shares), group_col, "left")
        .withColumn("target_share", F.coalesce("target_share", F.lit(0.0)))
    )
    t = counts.agg(
        F.min(
            F.when(F.col("target_share") > 0, F.col("n_rows") / F.col("target_share"))
        ).alias("__t")
    )
    return (
        counts.crossJoin(F.broadcast(t))
        .select(
            group_col,
            "n_rows",
            "target_share",
            F.when(
                F.col("target_share") > 0,
                F.least(F.lit(1.0), F.col("__t") * F.col("target_share") / F.col("n_rows")),
            )
            .otherwise(F.lit(0.0))
            .alias("rate"),
            F.floor(F.col("__t") * F.col("target_share")).cast("long").alias("take_rows"),
        )
    )


def mixture_rates_sql(
    table: str, group_col: str, target_shares: Mapping[str, float]
) -> str:
    """DuckDB twin of :func:`mixture_rates`, generated from the same share
    dict with the identical operation order (bit-exact, no rounding)."""
    share_case = " ".join(
        f"WHEN '{g}' THEN CAST({s!r} AS DOUBLE)" for g, s in target_shares.items()
    )
    return f"""
    WITH c AS (SELECT {group_col}, COUNT(*) AS n_rows,
                      COALESCE(CASE {group_col} {share_case} END, 0.0) AS target_share
               FROM {table} GROUP BY 1),
    t AS (SELECT MIN(CASE WHEN target_share > 0 THEN n_rows / target_share END) AS t FROM c)
    SELECT {group_col}, n_rows, target_share,
           CASE WHEN target_share > 0
                THEN LEAST(1.0, t.t * target_share / n_rows) ELSE 0.0 END AS rate,
           CAST(FLOOR(t.t * target_share) AS BIGINT) AS take_rows
    FROM c CROSS JOIN t
    """


def apply_mixture(
    df: DataFrame,
    group_col: str,
    target_shares: Mapping[str, float],
    key_cols: Sequence[str],
    salt: str = "mix",
) -> DataFrame:
    """Downsample ``df`` to the target mixture with the deterministic
    content-hash draw from `operators/sampling.py` (same md5-of-key
    construction, numeric comparison form so the threshold can be a
    per-group COLUMN). ONE pass: broadcast-join the group→rate relation,
    then a map-only filter — no per-group scans, no driver loop over
    data. Realized group sizes match ``take_rows`` to within the
    hash-threshold quantization (±O(sqrt(n)) rows), the same contract as
    ``hash_sample``."""
    from dbms_data_anonymity_differential_privacy_spark.operators.sampling import (
        _SPACE,
        _hash_hex,
    )

    rates = mixture_rates(df, group_col, target_shares).select(group_col, "rate")
    draw = F.conv(_hash_hex(key_cols, salt), 16, 10).cast("long")
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(draw < F.floor(F.col("rate") * F.lit(float(_SPACE))))
        .drop("rate")
    )


def temperature_rates(
    df: DataFrame, group_col: str, temperature: float
) -> "list[tuple]":
    """X86 — temperature-based resampling rates (the multilingual
    rebalancing formula, XLM-R α-convention: sampling probability ∝
    share^α, α in (0, 1] — α=1 is the natural mix, α→0 approaches
    uniform).

    Downsample-only normalization: ``rate_g = w_g / max_h w_h`` with
    ``w_g = (n_g / N)^(α − 1)`` — the SMALLEST group keeps rate 1.0 and
    the head languages are thinned toward the tempered mix (no
    upsampling). max() is order-independent, so the arithmetic is
    reproducible (a Σ-normalization would depend on float summation
    order across groups — deliberately avoided).

    The powered weights are computed DRIVER-side from the collected group
    counts (groups-sized — the BM25 corpus-stat convention) with C-libm
    ``math.pow``, the same libm DuckDB's POWER binds — JVM ``Math.pow``
    is only 1-ulp-accurate and never evaluates here.

    Returns ``[(group, n_rows, rate), ...]`` sorted by group.
    """
    import math

    if not 0.0 < temperature <= 1.0:
        raise ValueError(f"alpha/temperature must be in (0, 1], got {temperature}")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if not counts:
        raise ValueError("empty input")
    total = sum(counts.values())
    expo = temperature - 1.0
    w = {g: math.pow(n / total, expo) for g, n in counts.items()}
    mw = max(w.values())
    return [(g, counts[g], w[g] / mw) for g in sorted(counts)]


def temperature_sample(
    df: DataFrame,
    group_col: str,
    key_cols: Sequence[str],
    temperature: float,
    salt: str = "temp",
) -> DataFrame:
    """X86 — apply :func:`temperature_rates` with the deterministic
    content-hash draw: broadcast the groups-sized literal rate table, keep
    a row iff its 8-hex-char md5 draw falls under the group's threshold
    string (``printf('%08x', floor(rate * 16^8))`` — fixed-width hex
    compares bytewise identically on any engine). One map-only filter
    after a broadcast join; the corpus never shuffles.
    """
    from dbms_data_anonymity_differential_privacy_spark.operators.sampling import (
        _SPACE,
        _hash_hex,
    )

    rates = temperature_rates(df, group_col, temperature)
    spark = df.sparkSession
    rates_df = spark.createDataFrame(
        [(g, float(r)) for g, _, r in rates], f"{group_col} string, __rate double"
    )
    hh = _hash_hex(key_cols, salt)
    thr = F.format_string(
        "%08x", F.floor(F.col("__rate") * F.lit(float(_SPACE))).cast("long")
    )
    keep = (F.col("__rate") >= 1.0) | (hh < thr)
    return df.join(F.broadcast(rates_df), group_col).filter(keep).drop("__rate")


def top_p_support(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    p: float = 0.9,
) -> DataFrame:
    """X116 — top-p (nucleus) support per group: the smallest set of
    values covering at least fraction ``p`` of the group's mass, by
    descending frequency — the truncation rule of nucleus sampling
    (Holtzman et al. 2020), and the long-tail-cutoff every categorical
    release uses ("keep the heads covering 90%, bucket the rest").

    Kept = every value whose EXCLUSIVE prefix mass (sum of strictly
    higher-ranked values) is still below ``p·total`` — so the boundary
    value that crosses p is included, matching the nucleus rule. The
    mass test is exact integer arithmetic when ``p`` has a short decimal
    form: ``prev_mass · 10^k < p·10^k · total`` in int64 — no float
    thresholds. Rank order is (count desc, value asc), deterministic.

    Shape: one fact aggregation to the (group, value, count) relation;
    cumsum windows over it. Output: ``(*group_cols, value, cnt, rank,
    kept)`` for ALL values (callers filter ``kept``).
    """
    from pyspark.sql import Window

    if not 0 < p <= 1:
        raise ValueError("p must be in (0, 1]")
    # p as an exact scaled-integer fraction (short decimal forms only)
    num = round(p * 10**6)
    agg = df.groupBy(*group_cols, F.col(value_col).alias("value")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    part = [F.col(c) for c in group_cols]
    order = [F.col("cnt").desc(), F.col("value").asc()]
    w_rank = Window.partitionBy(*part).orderBy(*order)
    w_prev = w_rank.rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy(*part)
    return agg.select(
        *group_cols,
        "value",
        "cnt",
        F.row_number().over(w_rank).alias("rank"),
        (
            F.coalesce(F.sum("cnt").over(w_prev), F.lit(0)) * F.lit(10**6)
            < F.lit(num) * F.sum("cnt").over(w_all)
        ).alias("kept"),
    )


def dsir_importance(
    docs: DataFrame,
    target_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 2000,
) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al., NeurIPS 2023)
    — unigram-LM flavor.

    Scores every NON-target document by the log-likelihood ratio of its
    tokens under a target-pool vs raw-pool unigram model (add-1 smoothing
    over a shared top-``vocab_size`` vocabulary). High weight = "looks
    like the target distribution" — the selection signal DSIR feeds into
    resampling. ``target_pred`` is a boolean Column marking the target
    pool (e.g. ``F.col("source") == "src0"``).

    Spark shape (reference has nothing comparable — its corpus ops are
    single-table pandas): one tokenize->explode pass; a word-count shuffle
    TRUNCATED to the top-``vocab_size`` rows (count desc, word asc — the
    deterministic x19 vocab convention); per-word LLR computed on that
    kilobyte relation and **broadcast** back onto the token stream; one
    final per-doc aggregation. No fact-table shuffle carries anything
    wider than (doc_id, 8-byte llr).
    """
    from pyspark.sql import Window

    toks = (
        docs.select(id_col, target_pred.alias("_is_target"), text_col)
        .select(
            id_col,
            "_is_target",
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    counts = toks.groupBy("w").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum(F.when(F.col("_is_target"), 1).otherwise(0)).alias("ct"),
    )
    vocab = (
        counts.withColumn(
            "_rk",
            F.row_number().over(
                Window.orderBy(F.col("n_all").desc(), F.col("w").asc())
            ),
        )
        .filter(F.col("_rk") <= vocab_size)
        .select("w", "ct", (F.col("n_all") - F.col("ct")).alias("cr"))
    )
    tot = vocab.agg(
        F.sum("ct").alias("t_tot"), F.sum("cr").alias("r_tot")
    )
    llr = vocab.crossJoin(F.broadcast(tot)).select(
        "w",
        (
            F.log((F.col("ct") + 1.0) / (F.col("t_tot") + float(vocab_size)))
            - F.log((F.col("cr") + 1.0) / (F.col("r_tot") + float(vocab_size)))
        ).alias("llr"),
    )
    return (
        toks.filter(~F.col("_is_target"))
        .join(F.broadcast(llr), on="w", how="inner")
        .groupBy(id_col)
        .agg(
            F.round(F.sum("llr"), 6).alias("dsir_weight"),
            F.count(F.lit(1)).alias("n_terms"),
        )
    )
