"""Multimodal column plumbing — SURVEY §2c north-star (image/audio/video
as opaque binary columns with typed metadata).

The decode step itself needs codec libraries that are NOT in this
container, so it is stubbed (clearly marked below) behind a deterministic
fake — but everything Spark-side is real and tested: the schema contract,
the Arrow-batched ``mapInPandas`` signature, batch shaping, partition
sizing, and the metadata projection. Swapping the fake for PIL/ffmpeg is a
one-function change that does not touch the distributed plumbing.

Design for 100 TB of blobs:
- blobs travel as ``binary`` columns with a struct of typed metadata
  (mime, width/height/duration, checksum) so filters/pruning work on
  metadata without touching bytes;
- decode/feature-extract runs in ``mapInPandas`` (Arrow batches, one
  Python worker per core, no per-row pickling);
- ``spark.sql.files.maxPartitionBytes`` / explicit repartition keep a
  partition's blob payload within executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.StructType([
            T.StructField("n_bytes", T.LongType()),
            T.StructField("checksum", T.StringType()),
        ])),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for the synthetic corpus: treat document text bytes as an
    opaque blob with typed metadata — the schema contract multimodal
    sources must provide."""
    content = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        content.alias("content"),
        F.lit("text/plain").alias("mime"),
        F.struct(
            F.length(content).cast("long").alias("n_bytes"),
            F.md5(content).alias("checksum"),
        ).alias("meta"),
    )


def decode_media(content: bytes, mime: str) -> list[float]:
    """STUB — real decode (image resize / audio resample / video frame
    sample) requires PIL/librosa/ffmpeg, absent from this container.

    Until those are available this raises for real media types; the
    deterministic fake below handles text/plain so the distributed
    plumbing stays exercised end-to-end.
    """
    if mime == "text/plain":
        # deterministic fake "embedding": byte-histogram moments
        n = len(content) or 1
        s = sum(content)
        sq = sum(b * b for b in content)
        return [float(len(content)), s / n, sq / n]
    raise NotImplementedError(
        f"decode for {mime!r} needs codec libraries not present in this environment"
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def resize_media(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize verb — STUB for the pixel math (needs PIL, absent here); the
    Spark-side contract is real: binary-in/binary-out ``mapInPandas`` with
    typed output dimensions. The fake 'resize' truncates/pads bytes to a
    deterministic width*height budget so batch shapes and schemas are
    exercised end-to-end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        budget = width * height
        for pdf in batches:
            content = [bytes(c)[:budget].ljust(budget, b"\0") for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "content": content,
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame-sampling verb — STUB for real video decoding (needs ffmpeg);
    emits up to ``max_frames`` fixed-stride byte windows per blob as
    'frames'. One row in → many rows out, the true generator shape a video
    pipeline needs (schema + row-explosion plumbing are the real part)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                data = bytes(c)
                for i in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(data[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(run, FRAMES_SCHEMA)


def extract_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over blobs via ``mapInPandas``.

    The iterator contract keeps peak memory at one Arrow batch per worker;
    ``batch_rows`` bounds blob payload per batch (tune with
    maxRecordsPerBatch when blobs are megabytes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "mime": chunk["mime"],
                        "n_bytes": [len(c) for c in chunk["content"]],
                        "feature": [
                            decode_media(bytes(c), m)
                            for c, m in zip(chunk["content"], chunk["mime"])
                        ],
                    }
                )

    return media.mapInPandas(run, FEATURES_SCHEMA)
