"""Multimodal column plumbing — SURVEY §2c north-star (image/audio/video
as opaque binary columns with typed metadata).

Decode is REAL for the formats a pure-Python decoder can handle without
codec libraries: BMP (24-bit BI_RGB), PPM (binary P6), WAV (PCM16, stdlib
``wave``), and PNG (8-bit RGB/RGBA via stdlib zlib inflate + scanline
unfilter). Lossy formats (JPEG/MP3/H.264) still need PIL/ffmpeg, absent
from this container, and raise ``NotImplementedError`` — the dispatch
point is one function
(:func:`decode_media`), so swapping in richer codecs never touches the
distributed plumbing. Everything Spark-side is real and tested: the schema
contract, the Arrow-batched ``mapInPandas`` signature, batch shaping,
partition sizing, and the metadata projection.

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


# ---------------------------------------------------------------------------
# Pure-Python codecs for uncompressed formats (no PIL/ffmpeg needed).
# ---------------------------------------------------------------------------

IMAGE_MIMES = ("image/bmp", "image/x-portable-pixmap", "image/png")
AUDIO_MIMES = ("audio/wav", "audio/x-wav")


def decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    """Decode a 24-bit uncompressed (BI_RGB) BMP → (width, height, RGB8
    bytes, row-major top-down). The only BMP flavor supported — the one
    :func:`encode_bmp` writes."""
    import struct

    if data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    width, height = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bit BI_RGB BMP supported (got bpp={bpp})")
    top_down = height < 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3  # rows padded to 4 bytes
    rgb = bytearray(width * height * 3)
    for row in range(height):
        src = pixel_off + (row if top_down else height - 1 - row) * stride
        for x in range(width):
            b, g, r = data[src + 3 * x : src + 3 * x + 3]
            i = (row * width + x) * 3
            rgb[i] = r
            rgb[i + 1] = g
            rgb[i + 2] = b
    return width, height, bytes(rgb)


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Encode row-major top-down RGB8 bytes as a 24-bit BI_RGB BMP (stored
    bottom-up, rows 4-byte padded) — the exact inverse of :func:`decode_bmp`."""
    import struct

    if len(rgb) != width * height * 3:
        raise ValueError("rgb buffer must be width*height*3 bytes")
    stride = (width * 3 + 3) & ~3
    img_size = stride * height
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + img_size, 0, 0, 54,
        40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0,
    )
    rows = bytearray()
    pad = b"\0" * (stride - width * 3)
    for row in range(height - 1, -1, -1):  # bottom-up storage
        line = bytearray()
        for x in range(width):
            i = (row * width + x) * 3
            line += bytes((rgb[i + 2], rgb[i + 1], rgb[i]))  # BGR on disk
        rows += line + pad
    return header + bytes(rows)


def decode_ppm(data: bytes) -> tuple[int, int, bytes]:
    """Decode a binary PPM (P6, maxval 255) → (width, height, RGB8 bytes)."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM stream")
    # header tokens: P6, width, height, maxval — '#' comments allowed
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    width, height, maxval = tokens
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    pos += 1  # single whitespace after maxval
    rgb = data[pos : pos + width * height * 3]
    if len(rgb) != width * height * 3:
        raise ValueError("truncated PPM pixel data")
    return width, height, rgb


def decode_wav(data: bytes) -> tuple[int, list[int]]:
    """Decode PCM16 WAV → (framerate, mono samples; channels averaged)."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(data)) as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError("only PCM16 WAV supported")
        nch, rate, nframes = w.getnchannels(), w.getframerate(), w.getnframes()
        raw = w.readframes(nframes)
    flat = struct.unpack(f"<{nframes * nch}h", raw)
    if nch == 1:
        return rate, list(flat)
    return rate, [sum(flat[i : i + nch]) // nch for i in range(0, len(flat), nch)]


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Decode an 8-bit truecolor PNG (color type 2 RGB or 6 RGBA, no
    interlace) → (width, height, RGB8 bytes, alpha dropped) with nothing
    but the stdlib: zlib inflate of the IDAT stream, then per-scanline
    reversal of the five standard filters (None/Sub/Up/Average/Paeth,
    RFC 2083 §6). Palette, 16-bit, grayscale, and Adam7 still raise —
    honest dispatch, same as the other codecs."""
    import struct
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG stream")
    pos = 8
    width = height = color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        length, ctype = struct.unpack_from(">I4s", data, pos)
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if bit_depth != 8 or color_type not in (2, 6):
                raise NotImplementedError(
                    f"only 8-bit RGB/RGBA PNG supported (depth={bit_depth}, "
                    f"color_type={color_type})"
                )
            if interlace:
                raise NotImplementedError("interlaced (Adam7) PNG not supported")
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG stream has no IHDR chunk")
    raw = zlib.decompress(bytes(idat))
    nch = 3 if color_type == 2 else 4
    stride = width * nch
    if len(raw) != (stride + 1) * height:
        raise ValueError("truncated PNG scanline data")
    rgb = bytearray(width * height * 3)
    prev = bytearray(stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub: + left
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif ftype == 2:  # Up: + above
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average: + floor((left+above)/2)
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth predictor of (left, above, upper-left)
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        prev = line
        for x in range(width):
            si = x * nch
            di = (y * width + x) * 3
            rgb[di : di + 3] = line[si : si + 3]
    return width, height, bytes(rgb)


def decode_image(content: bytes, mime: str) -> tuple[int, int, bytes]:
    if mime == "image/bmp":
        return decode_bmp(content)
    if mime == "image/x-portable-pixmap":
        return decode_ppm(content)
    if mime == "image/png":
        return decode_png(content)
    raise NotImplementedError(f"no pure-Python decoder for image mime {mime!r}")


def documents_as_bmp(docs: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """Adapter: render each document's text bytes as a real ``width×height``
    24-bit BMP (bytes → RGB raster, zero-padded), giving the image pipeline
    a decodable blob per document without external fixtures. Arrow-batched
    ``mapInPandas``; output follows MEDIA_SCHEMA."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        budget = width * height * 3
        for pdf in batches:
            blobs = [
                encode_bmp(width, height, t.encode("utf-8")[:budget].ljust(budget, b"\0"))
                for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "content": blobs,
                    "mime": "image/bmp",
                    "meta": [
                        {"n_bytes": len(b), "checksum": hashlib.md5(b).hexdigest()}
                        for b in blobs
                    ],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(run, MEDIA_SCHEMA)


def decode_media(content: bytes, mime: str) -> list[float]:
    """Feature vector for one blob, by mime:

    - ``text/plain`` → [n_bytes, byte mean, byte second moment]
    - BMP / PPM / PNG → [width, height, mean R, mean G, mean B]
    - PCM16 WAV → [n_samples, framerate, mean, RMS]

    Lossy formats (JPEG/MP3/...) need codec libraries absent from this
    container and raise ``NotImplementedError``.
    """
    if mime == "text/plain":
        # deterministic "embedding": byte-histogram moments
        n = len(content) or 1
        s = sum(content)
        sq = sum(b * b for b in content)
        return [float(len(content)), s / n, sq / n]
    if mime in IMAGE_MIMES:
        w, h, rgb = decode_image(content, mime)
        n_px = (w * h) or 1
        means = [sum(rgb[c::3]) / n_px for c in range(3)]
        return [float(w), float(h), *means]
    if mime in AUDIO_MIMES:
        rate, samples = decode_wav(content)
        n = len(samples) or 1
        mean = sum(samples) / n
        rms = (sum(s * s for s in samples) / n) ** 0.5
        return [float(len(samples)), float(rate), mean, rms]
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


def resize_nearest(rgb: bytes, w: int, h: int, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resample of row-major RGB8 pixels."""
    out = bytearray(out_w * out_h * 3)
    for y in range(out_h):
        sy = min(h - 1, y * h // out_h)
        for x in range(out_w):
            sx = min(w - 1, x * w // out_w)
            si = (sy * w + sx) * 3
            di = (y * out_w + x) * 3
            out[di : di + 3] = rgb[si : si + 3]
    return bytes(out)


def resize_media(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize verb: REAL nearest-neighbor pixel resampling for the
    decodable image formats (BMP/PPM), re-encoded as BMP so the output is
    itself decodable (``decode → resample → encode`` round-trips through
    :func:`decode_bmp`). Non-image blobs fall back to a deterministic
    byte-budget truncation so the binary-in/binary-out ``mapInPandas``
    contract still covers every mime. Arrow-batched, one Python worker per
    core — the 100 TB path is the same whether the codec is this
    pure-Python one or PIL."""

    def one(content: bytes, mime: str) -> bytes:
        if mime in IMAGE_MIMES:
            w, h, rgb = decode_image(content, mime)
            return encode_bmp(width, height, resize_nearest(rgb, w, h, width, height))
        budget = width * height
        return content[:budget].ljust(budget, b"\0")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [
                        "image/bmp" if m in IMAGE_MIMES else m for m in pdf["mime"]
                    ],
                    "content": [
                        one(bytes(c), m) for c, m in zip(pdf["content"], pdf["mime"])
                    ],
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame-sampling verb: one row in → many rows out, the generator shape
    a video/audio pipeline needs. For PCM16 WAV blobs the 'frames' are REAL
    fixed-duration sample windows (``every_n_bytes`` samples each, packed
    little-endian int16). Video containers need ffmpeg (absent here), so
    other mimes emit fixed-stride byte windows — the row-explosion plumbing
    (schema, Arrow batching, 1→N fan-out) is identical either way."""

    def windows(content: bytes, mime: str) -> list[bytes]:
        import struct

        if mime in AUDIO_MIMES:
            _, samples = decode_wav(content)
            step = every_n_bytes  # samples per frame for audio
            out = []
            for i in range(min(max_frames, max(1, len(samples) // step))):
                chunk = samples[i * step : (i + 1) * step]
                out.append(struct.pack(f"<{len(chunk)}h", *chunk))
            return out
        return [
            content[i * every_n_bytes : (i + 1) * every_n_bytes]
            for i in range(min(max_frames, max(1, len(content) // every_n_bytes)))
        ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, c, m in zip(pdf["media_id"], pdf["content"], pdf["mime"]):
                for i, fr in enumerate(windows(bytes(c), m)):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(fr)
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
