"""Streaming corpus curation — the text-pipeline gates over a document
stream.

A crawl lands continuously; the cleaning/quality gates should run on
arrival, not in a nightly batch. Because `operators/clean.py` and
`operators/quality.py` are STATELESS map-only projections of built-in
expressions, they are stream-safe verbatim: the exact same Column
expressions run per micro-batch with no state store, no watermark, no
output-mode constraints — the strongest stream≡batch guarantee there is
(byte identity over the same files, asserted in tests). The rollup
(`curate_stats`) is the only stateful piece and is an ordinary streaming
aggregation (complete-mode sink).

Absent from the reference (batch-only pandas study); designed from the
public Structured Streaming API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbms_data_anonymity_differential_privacy_spark.operators.clean import clean_text
from dbms_data_anonymity_differential_privacy_spark.operators.quality import gopher_quality

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def documents_readstream(spark: SparkSession, path: str) -> DataFrame:
    """File-source readStream over a documents directory (parquet, the
    testdata layout). Streaming sources need a declared schema; this is
    the documents table's. Swap the reader line for Kafka etc. in
    production — every transformation below is source-agnostic."""
    return spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(path)


def curate(docs: DataFrame, thresholds: dict | None = None) -> DataFrame:
    """The curation projection: clean the text, run the Gopher gate on
    the CLEANED text, keep passing docs with their payload columns. ONE
    map-only stage (the gate's ``keep_cols`` passes payload through, so
    no stream-stream self-join is ever needed). Identical semantics on a
    batch or streaming DataFrame — pinned byte-for-byte in
    ``tests/test_extensions.py``. ``thresholds`` tunes the gate per
    corpus (see `operators/quality.py` DEFAULT_THRESHOLDS)."""
    cleaned = docs.select(
        "doc_id", "lang", "source", clean_text(F.col("text")).alias("text")
    )
    gated = gopher_quality(
        cleaned, keep_cols=("lang", "source", "text"), thresholds=thresholds
    )
    return gated.where(F.col("pass_gopher"))


def curate_stats(docs: DataFrame, thresholds: dict | None = None) -> DataFrame:
    """Per-language rollup of the curated stream: docs kept + token
    volume. In streaming this is a standard aggregation (complete-mode
    sink); in batch a plain groupBy — same plan algebra."""
    return curate(docs, thresholds).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
