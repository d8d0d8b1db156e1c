"""Sequence packing for LLM pretraining — concat-and-chunk layout.

The standard pretraining data layout concatenates the token stream of the
whole corpus in a deterministic document order and cuts it into
fixed-length training sequences ("chunks") of ``seq_len`` tokens; a
document's tokens land at absolute offset ``[tok_start, tok_start +
n_tokens)`` and therefore touch chunks ``tok_start div L`` through
``(tok_start + n_tokens - 1) div L``. Computing that layout is a GLOBAL
PREFIX SUM over the corpus — the one primitive a naive Spark
implementation gets wrong, because ``SUM() OVER (ORDER BY id)`` with no
partitioning forces an Exchange SinglePartition: every row through ONE
reducer, the definition of a 100 TB bottleneck.

This module computes the exact same relation with the classic two-pass
distributed prefix sum instead:

1. range-repartition by document id and sort within partitions (one
   range exchange — the partitioner guarantees partition i holds ids
   strictly below partition i+1's);
2. one tiny aggregation of per-partition token sums (#partitions rows)
   → cumulative per-partition OFFSETS, broadcast back;
3. a window partitioned BY PARTITION ID (parallel, no single reducer)
   for the within-partition running sum; absolute offset = partition
   offset + local running sum.

All arithmetic is integer (token counts, ``div`` chunk ids), so the
result is bit-exact against the oracle's ``SUM OVER (ORDER BY)``
formulation on any engine. Plan-gated: no Exchange SinglePartition.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.util import fan_out


def pack_concat_chunks(
    df: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document its absolute token offset and chunk range in
    the concat-and-chunk layout (chunks of ``seq_len`` tokens, documents
    concatenated in ascending ``id_col`` order; engine-standard
    whitespace tokenization, same as vocab/BM25).

    Output per input row:
    ``(id_col, n_tokens, tok_start, chunk_first, chunk_last, n_chunks)``
    — empty documents get NULL chunk bounds and ``n_chunks = 0``.
    Deterministic and layout-independent: the order is defined by
    ``id_col`` alone.
    """
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    base = df.select(F.col(id_col), F.size(toks).cast("long").alias("n_tokens"))

    # Pass 1: range partition by id (partition i holds ids < partition
    # i+1's) and tag rows with their physical partition.
    ranged = (
        base.repartitionByRange(F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn("__pid", F.spark_partition_id())
    )
    # The window below re-sorts within each __pid partition; persist so
    # the partition tagging is computed once and stays consistent between
    # the offsets aggregation and the main pass.
    ranged = ranged.persist()

    # Pass 2: per-partition sums — #partitions rows, metadata-sized.
    psums = ranged.groupBy("__pid").agg(F.sum("n_tokens").alias("__psum")).collect()
    offsets = {}
    acc = 0
    for r in sorted(psums, key=lambda r: r["__pid"]):
        offsets[r["__pid"]] = acc
        acc += int(r["__psum"])
    spark = df.sparkSession
    offs = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "__pid int, __off long"
    )

    # Pass 3: within-partition running sum (window partitioned by __pid —
    # parallel across partitions, never a single reducer).
    from pyspark.sql import Window

    w = (
        Window.partitionBy("__pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    out = (
        ranged.join(F.broadcast(offs), on="__pid")
        .withColumn("tok_start", F.col("__off") + local_before)
        .withColumn(
            "chunk_first",
            F.when(F.col("n_tokens") > 0, F.expr(f"tok_start div {seq_len}")),
        )
        .withColumn(
            "chunk_last",
            F.when(
                F.col("n_tokens") > 0,
                F.expr(f"(tok_start + n_tokens - 1) div {seq_len}"),
            ),
        )
        .withColumn(
            "n_chunks",
            F.coalesce(F.col("chunk_last") - F.col("chunk_first") + 1, F.lit(0)),
        )
        .select(
            id_col, "n_tokens", "tok_start", "chunk_first", "chunk_last", "n_chunks"
        )
    )
    return out


def sliding_chunks(
    df: DataFrame,
    chunk_size: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document sliding-window chunk plan — the RAG / long-context
    preprocessing step: token windows of ``chunk_size`` advancing by
    ``stride = chunk_size - overlap``, last window truncated (never
    empty). Complements :func:`pack_concat_chunks` (which packs MANY
    docs into fixed budgets; this splits ONE doc into windows).

    Output: one row per chunk — ``(id, chunk_id, start_tok, end_tok,
    chunk_tokens, n_tokens)`` with ``end_tok`` exclusive. Documents with
    zero tokens emit nothing.

    All integer arithmetic (token counts from the corpus-standard
    whitespace tokenization); map-only — the chunk fan-out is a
    ``sequence``+``explode`` with no shuffle anywhere.
    """
    if chunk_size < 1 or overlap < 0 or overlap >= chunk_size:
        raise ValueError("need chunk_size >= 1 and 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    base = fan_out(df).select(
        F.col(id_col), F.size(toks).cast("long").alias("n_tokens")
    )
    # n_chunks = 1 + floor((n - 1) / stride) for n > chunk? Careful: a
    # window starting at s covers [s, s+chunk); windows start at
    # 0, stride, 2*stride, ... while s < n and (s == 0 or s + overlap < n)
    # — i.e. every window adds at least one NEW token. That gives
    # n_chunks = 1 + ceil(max(n - chunk_size, 0) / stride).
    n_chunks = (
        F.lit(1)
        + F.ceil(
            F.greatest(F.col("n_tokens") - F.lit(chunk_size), F.lit(0))
            / F.lit(stride)
        ).cast("long")
    )
    chunks = base.filter(F.col("n_tokens") > 0).select(
        id_col,
        "n_tokens",
        F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_id"),
    )
    start = F.col("chunk_id") * F.lit(stride)
    end = F.least(start + F.lit(chunk_size), F.col("n_tokens"))
    return chunks.select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        start.cast("long").alias("start_tok"),
        end.cast("long").alias("end_tok"),
        (end - start).cast("long").alias("chunk_tokens"),
        "n_tokens",
    )


def packing_efficiency(
    df: DataFrame,
    seq_lens: Sequence[int] = (256, 512, 1024, 2048),
    text_col: str = "text",
) -> DataFrame:
    """Sequence-packing economics table: for each candidate context
    length L, how many tokens the two standard batching strategies
    waste — the decision readout before fixing a training context
    length (Krell et al. 2021 study exactly this padding-vs-packing
    gap; concat-packing is what :func:`pack_concat_chunks` implements).

    Strategy A (pad/truncate, one doc per sequence): every doc shorter
    than L pads ``L − tok`` slots, every longer doc truncates
    ``tok − L`` tokens. Strategy B (concat-packing): the corpus is one
    token stream cut into ``ceil(total/L)`` sequences — only the final
    remainder pads.

    Output per L: ``(seq_len, n_docs, total_tokens, pad_tokens,
    trunc_tokens, n_seqs_packed, util_padded_r, util_packed_r)`` — all
    exact int64 until the two utilization divisions (9 dp).

    Scale shape: token counts are one map-only projection; the 4-row L
    table joins by broadcast-cross (docs × |seq_lens| rows, map-side
    partial agg) and the release is |seq_lens| rows.
    """
    from dbms_data_anonymity_differential_privacy_spark.operators.text import token_count
    from dbms_data_anonymity_differential_privacy_spark.operators.util import fan_out

    spark = df.sparkSession
    ls = spark.createDataFrame(
        [(int(l),) for l in seq_lens], "seq_len LONG"
    )
    toks = fan_out(df).select(token_count(F.col(text_col)).alias("__tok"))
    per_l = (
        toks.join(F.broadcast(ls))
        .groupBy("seq_len")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__tok").cast("long").alias("total_tokens"),
            F.sum(
                F.when(
                    F.col("__tok") < F.col("seq_len"),
                    F.col("seq_len") - F.col("__tok"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("pad_tokens"),
            F.sum(
                F.when(
                    F.col("__tok") > F.col("seq_len"),
                    F.col("__tok") - F.col("seq_len"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("trunc_tokens"),
        )
    )
    n_packed = F.expr("(total_tokens + seq_len - 1) div seq_len")
    return per_l.select(
        "seq_len",
        "n_docs",
        "total_tokens",
        "pad_tokens",
        "trunc_tokens",
        n_packed.cast("long").alias("n_seqs_packed"),
        F.round(
            (F.col("total_tokens") - F.col("trunc_tokens")).cast("double")
            / (F.col("n_docs") * F.col("seq_len")).cast("double"),
            9,
        ).alias("util_padded_r"),
        F.round(
            F.col("total_tokens").cast("double")
            / (n_packed * F.col("seq_len")).cast("double"),
            9,
        ).alias("util_packed_r"),
    )
