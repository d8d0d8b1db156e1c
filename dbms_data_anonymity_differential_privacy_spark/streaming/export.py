"""Streaming private training-data export — the privacy-review composite
(``pipelines.private_export_plan``) over a document stream.

Stage map (batch twin ≡ stream, byte-identical rollups):
clean → PII redact (typed placeholders, counted per doc) → Gopher gate
over the REDACTED text → content-fingerprint dedup → shard rollup.

Stream-safety per stage: clean / redact / gate are stateless map-only
projections (the x30 curation argument — the same Column expressions run
per micro-batch with no state store). The ONE stateful stage is the
fingerprint dedup, expressed with ``dropDuplicatesWithinWatermark``:
state holds one entry per distinct (lang, fingerprint) kept document and
is EVICTED once the watermark passes — at 100 TB the state size is the
distinct-content mass inside the watermark horizon, never the stream
length (the unbounded-state failure mode of plain ``dropDuplicates``).
The rollup is an ordinary streaming aggregation (complete-mode sink).

Representative-independence is the design key that makes stream ≡ batch
BYTE-IDENTICAL rather than merely row-equivalent:
``dropDuplicatesWithinWatermark`` keeps the FIRST-ARRIVING row per key
(arrival order is nondeterministic under parallelism), while the batch
twin keeps the deterministic min-id row (``dedup_exact``). The composite
therefore only releases columns that are IDENTICAL across any
representative choice: the dedup key itself carries ``lang``, the shard
is hashed from the content FINGERPRINT (never doc_id — the one honest
difference from the batch ``pipe_private_export``, which shards by
doc_id and therefore NEEDS the deterministic representative), and
``n_tokens`` / ``__redacted`` are pure functions of the redacted text.
Any surviving representative yields the same ``(shard, lang, n_docs,
total_tokens, n_docs_redacted)`` row — pinned byte-for-byte in
tests/test_round7_ops.py.

Absent from the reference (batch-only pandas study); designed from the
public Structured Streaming API.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.clean import clean_text
from dbms_data_anonymity_differential_privacy_spark.operators.dedup import dedup_exact
from dbms_data_anonymity_differential_privacy_spark.operators.pii import redact_pii
from dbms_data_anonymity_differential_privacy_spark.operators.quality import gopher_quality
from dbms_data_anonymity_differential_privacy_spark.operators.sampling import assign_shards
from dbms_data_anonymity_differential_privacy_spark.operators.text import fingerprint
from dbms_data_anonymity_differential_privacy_spark.operators.util import fan_out

# epoch seconds of 2024-01-01T00:00:00Z — base of the synthetic event time
_TS_EPOCH = 1_704_067_200


def _kept_with_fp(docs: DataFrame, thresholds: Mapping | None) -> DataFrame:
    """The shared stateless funnel: clean → redact(+count) → Gopher gate
    → fingerprint. ONE fused projection chain (no shuffle), identical
    Column expressions in batch and stream — the strongest stream≡batch
    guarantee there is. Documents get a deterministic event time derived
    from doc_id (the stream has no natural timestamp; any monotone
    injection works — watermark semantics only need SOME event time)."""
    cleaned = fan_out(docs.select("doc_id", "lang", "text")).select(
        "doc_id", "lang", clean_text(F.col("text")).alias("__clean")
    )
    redacted = cleaned.select(
        "doc_id",
        "lang",
        redact_pii(F.col("__clean")).alias("text"),
        (redact_pii(F.col("__clean")) != F.col("__clean")).cast("long").alias("__redacted"),
    )
    gated = gopher_quality(
        redacted,
        thresholds=dict(thresholds or {}),
        keep_cols=("lang", "text", "__redacted"),
    )
    # Synthetic event time is BOUNDED to one day (doc_id mod 86400): if
    # it grew with doc_id, the watermark delay would silently become an
    # id-DISTANCE bound — two identical docs whose ids differ by more
    # than delay-in-seconds would land outside each other's dedup
    # horizon and the stream≡batch byte identity would break on any
    # corpus past ~2.6M ids (or any sparse id space). With a one-day
    # spread the default 30-day watermark can never evict mid-corpus,
    # whatever the id range. Production streams should replace this
    # column with their REAL arrival timestamp — then the watermark is
    # a true time horizon and state stays bounded on infinite streams
    # (with the synthetic column, state is bounded by distinct kept
    # fingerprints instead, the same bound the batch dedup shuffle pays).
    return (
        gated.filter(F.col("pass_gopher"))
        .select("doc_id", "lang", "text", "n_tokens", "__redacted")
        .withColumn("__fp", fingerprint(F.col("text")))
        .withColumn(
            "ts",
            F.timestamp_seconds(F.lit(_TS_EPOCH) + F.col("doc_id") % F.lit(86400)),
        )
    )


def _rollup(deduped: DataFrame, n_shards: int, salt: str) -> DataFrame:
    sharded = assign_shards(deduped, ["__fp"], n_shards, salt=salt)
    return sharded.groupBy("shard", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("__redacted").cast("long").alias("n_docs_redacted"),
    )


def private_export_stream(
    docs: DataFrame,
    n_shards: int = 8,
    thresholds: Mapping | None = None,
    salt: str = "pexport-stream",
    watermark: str = "30 days",
) -> DataFrame:
    """The streaming composite: run on a ``readStream`` documents source,
    sink the returned aggregation in complete mode. ``watermark`` bounds
    the dedup state horizon — a duplicate arriving later than the
    watermark delay past the max seen event time may be re-admitted
    (the standard within-watermark contract)."""
    kept = _kept_with_fp(docs, thresholds)
    deduped = kept.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["lang", "__fp"]
    )
    return _rollup(deduped, n_shards, salt)


def private_export_batch(
    docs: DataFrame,
    n_shards: int = 8,
    thresholds: Mapping | None = None,
    salt: str = "pexport-stream",
) -> DataFrame:
    """The batch twin (the oracle-hashed side): identical funnel and
    rollup, deterministic min-id dedup in place of the stateful
    streaming dedup. Byte-identical by representative-independence."""
    kept = _kept_with_fp(docs, thresholds)
    deduped = dedup_exact(kept, ["lang", "__fp"], "doc_id")
    return _rollup(deduped, n_shards, salt)
