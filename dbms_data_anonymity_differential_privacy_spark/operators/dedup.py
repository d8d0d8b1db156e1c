"""Deduplication for training-data pipelines — SURVEY §2c X2/X3 +
north-star dedup family (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine).

Absent from the reference; designed from the public Spark API and the
standard near-dup literature (Broder 1997 shingling/MinHash; Charikar 2002
SimHash; Lee et al. 2022 "Deduplicating Training Data Makes Language
Models Better" for the pipeline shape).

Scale notes per operator are inline; the common principle: never form the
O(n^2) pair space — block first (exact key, LSH band, shingle), then score
within blocks.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.text import fingerprint
from dbms_data_anonymity_differential_privacy_spark.operators.util import fan_out


def dedup_exact(df: DataFrame, keys: Sequence[str], id_col: str) -> DataFrame:
    """X2 — one representative row per key group: the row with the lowest
    ``id_col`` (deterministic, unlike ``dropDuplicates`` which keeps an
    arbitrary row — determinism matters for reproducible corpus builds).
    One shuffle on the dedup key."""
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(id_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_by_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact content dedup on the normalized-md5 fingerprint — the standard
    first pass of corpus dedup (cheap, hash-partitioned)."""
    return dedup_exact(df.withColumn("__fp", fingerprint(F.col(text_col))), ["__fp"], id_col).drop(
        "__fp"
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (lowercased, whitespace
    tokenized). Built-ins only: slice/transform over the token array."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    n_sh = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    return F.transform(
        F.sequence(F.lit(0), n_sh - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """N-gram Jaccard near-dup pairs via the shingle inverted index:
    explode shingles → self-join on shingle → |A∩B| per pair →
    Jaccard = inter / (|A| + |B| - inter) → filter.

    The join is blocked by shingle (no O(n^2) pair space); hot shingles are
    the skew risk at scale — AQE skew-join or a df-frequency cap
    (drop shingles appearing in > X% of docs) handles it. Exact → has a
    DuckDB oracle twin.
    """
    sh = fan_out(df).select(
        F.col(id_col), F.array_distinct(shingles(F.col(text_col), n)).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    # Pre-hash the wide shingle string to a long join key (SURVEY §4
    # composite-key idiom): the shuffle carries 8 bytes instead of ~20-char
    # strings and the join compares longs. 64-bit collisions are
    # negligible (~n^2/2^64).
    exploded = sh.select(
        id_col, "n_sh", F.explode("sh").alias("shingle")
    ).select(id_col, "n_sh", F.xxhash64("shingle").alias("shingle_h"))
    a = exploded.select(
        F.col(id_col).alias("id_a"), F.col("n_sh").alias("na"), "shingle_h"
    )
    b = exploded.select(
        F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb"), "shingle_h"
    )
    inter = (
        a.join(b, on="shingle_h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = inter.select(
        "id_a",
        "id_b",
        F.round(
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 9
        ).alias("jaccard"),
    )
    return jac.filter(F.col("jaccard") >= F.lit(threshold))


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X3 — MinHash + LSH candidate pairs with exact-Jaccard re-score.

    MLlib's MinHashLSH over a CountVectorizer space works, but the
    hash-expression formulation below is leaner and deterministic across
    partitionings: minhash_i = min over shingles of xxhash64(shingle, i);
    band = hash of a signature slice; candidates join within bands; final
    Jaccard via the exact shingle sets (re-score kills LSH false
    positives). num_hashes=32, bands of 4 → catches J>=~0.5 w.h.p.
    """
    bands = num_hashes // 4
    sh = fan_out(df).select(
        F.col(id_col), F.array_distinct(shingles(F.col(text_col), n)).alias("sh")
    ).filter(F.size("sh") > 0)

    # NB: higher-order-function lambdas must have exactly one parameter here —
    # PySpark counts default-valued params as lambda variables (a 2-param
    # lambda receives the array index as its second argument), which would
    # silently shadow the closure. Hence the explicit factory.
    def _minhash(i: int):
        return F.array_min(
            F.transform(F.col("sh"), lambda s: F.xxhash64(s, F.lit(i)))
        ).alias(f"mh{i}")

    sig = sh.select(id_col, "sh", *[_minhash(i) for i in range(num_hashes)])
    band_cols = [
        F.xxhash64(*[F.col(f"mh{4 * b + j}") for j in range(4)], F.lit(b)).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select(id_col, "sh", *band_cols)

    # One (band_idx, band_hash) relation via posexplode → a SINGLE
    # candidate self-join carrying only ids (the heavy shingle arrays do
    # NOT travel through the candidate shuffle — they re-attach afterwards
    # for the exact re-score). At 100 TB the candidate stream is two longs
    # per row instead of two 300-string arrays.
    bandrel = banded.select(
        F.col(id_col),
        F.posexplode(F.array(*[F.col(f"band{b}") for b in range(bands)])).alias(
            "band_idx", "band_hash"
        ),
    )
    cands = (
        bandrel.alias("a")
        .join(
            bandrel.alias("b"),
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sha = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sha"))
    shb = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("shb"))
    jac = (
        cands.join(sha, on="id_a")
        .join(shb, on="id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sha", "shb"))
                / F.size(F.array_union("sha", "shb")),
                9,
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= F.lit(threshold))


def simhash(text: Column, bits: int = 32) -> Column:
    """Frequency-weighted SimHash (Charikar 2002): bit j = sign of the sum
    over token *occurrences* of ±1 derived from xxhash64(token) bit j.
    Occurrence weighting (not the distinct-token set) is what separates
    documents drawn from a shared vocabulary. Pure built-ins (aggregate
    over the token array); deterministic everywhere.

    32 bits balances expression-tree size against collision noise."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")

    # Two-parameter lambda only (acc, t): see the lambda-arity note in
    # minhash_lsh_pairs — the bit mask is bound via a factory closure.
    def _vote(mask: int):
        return F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, t: acc
            + F.when(F.xxhash64(t).bitwiseAND(F.lit(mask)) == 0, F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )

    out = F.lit(0).cast("long")
    for j in range(bits):
        vote = _vote(1 << j)
        out = out + F.when(vote >= 0, F.lit(2**j)).otherwise(F.lit(0)).cast("long")
    return out


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    bits: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash near-dup pairs: block on the four 8-bit bytes (a pair within
    Hamming distance <= 3 must agree exactly on at least one of 4 blocks —
    pigeonhole), then exact popcount filter. Each block join is an
    equi-join on a small key → no O(n^2) pair space."""
    n_blocks = 4
    hashed = fan_out(df).select(F.col(id_col), simhash(F.col(text_col), bits).alias("sh"))
    block_cols = [
        (F.shiftright(F.col("sh"), 8 * b).bitwiseAND(F.lit(255))).alias(f"blk{b}")
        for b in range(n_blocks)
    ]
    hh = hashed.select(id_col, "sh", *block_cols)

    def block_join(b: int) -> DataFrame:
        key = f"blk{b}"
        a = hh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sa"), F.col(key).alias("k"))
        bb = hh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sb"), F.col(key).alias("k"))
        # bucket key alone collides often on 8 bits; the cheap popcount
        # post-filter keeps only true low-Hamming pairs
        return a.join(bb, on="k").filter(F.col("id_a") < F.col("id_b")).drop("k")

    cands = block_join(0)
    for b in range(1, n_blocks):
        cands = cands.unionByName(block_join(b))
    cands = cands.dropDuplicates(["id_a", "id_b"])
    ham = cands.withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
    return ham.filter(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")
