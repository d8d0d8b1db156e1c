"""Multimodal column plumbing — SURVEY §2c north-star (image/audio/video
as opaque binary columns with typed metadata).

Decode is REAL for the formats a pure-Python decoder can handle without
codec libraries: BMP (24-bit BI_RGB), PPM (binary P6), WAV (PCM16, stdlib
``wave``), PNG (8-bit RGB/RGBA via stdlib zlib inflate + scanline
unfilter), baseline JPEG (SOF0 sequential DCT, Huffman, 4:4:4/4:2:0,
restart markers — :func:`decode_jpeg`, with :func:`encode_jpeg` providing
in-repo fixtures), and GIF87a/89a (real LZW with variable code width,
table growth and reset, interlace reordering — :func:`decode_gif` /
:func:`encode_gif`). Progressive JPEG and video/audio-compressed formats
(MP3/H.264) still need PIL/ffmpeg, absent from this container, and raise
``NotImplementedError`` — the dispatch point is one function
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

# quarantine=True output: undecodable blobs (progressive JPEG, MP3, truncated
# streams, ...) surface as (feature=NULL, error=<message>) rows instead of
# failing the task — at 100 TB a single exotic file must cost one skipped
# row, never a stage retry loop.
FEATURES_Q_SCHEMA = T.StructType(
    FEATURES_SCHEMA.fields + [T.StructField("error", T.StringType())]
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

IMAGE_MIMES = (
    "image/bmp", "image/x-portable-pixmap", "image/png", "image/jpeg", "image/gif",
)
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


# --- Baseline JPEG (ITU-T T.81 sequential DCT) ------------------------------
#
# Pure-stdlib decode of the dominant interchange flavor: SOF0 baseline,
# 8-bit, Huffman entropy coding, 3-component YCbCr with 4:4:4 or 4:2:0
# (or any h,v <= 2) subsampling, restart markers honored. Progressive
# (SOF2), arithmetic coding, 12-bit, and non-3-component streams raise —
# honest dispatch like the other codecs. The companion encoder writes
# 4:4:4 baseline with IJG-scaled Annex K quant tables and per-image
# fixed-length canonical Huffman tables (spec-legal incomplete trees), so
# tests can round-trip real JPEG bytes without PIL.

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K reference quantization tables (luminance, chrominance).
_QT_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_QT_CHR = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
] + [99] * 32


def _idct_cos_table():
    import math

    return [
        [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)] for x in range(8)
    ]


_COS = _idct_cos_table()
_C = [0.7071067811865476] + [1.0] * 7  # C(0)=1/sqrt(2)


def _idct8x8(coef: list[float]) -> list[int]:
    """2-D inverse DCT of one dequantized 8x8 block (row-major coef) →
    64 level-shifted, clamped samples. Separable: rows then columns."""
    tmp = [0.0] * 64
    for y in range(8):
        row = coef[y * 8 : y * 8 + 8]
        for x in range(8):
            s = 0.0
            for u in range(8):
                s += _C[u] * row[u] * _COS[x][u]
            tmp[y * 8 + x] = s / 2
    out = [0] * 64
    for x in range(8):
        col = [tmp[y * 8 + x] for y in range(8)]
        for y in range(8):
            s = 0.0
            for v in range(8):
                s += _C[v] * col[v] * _COS[y][v]
            px = int(round(s / 2)) + 128
            out[y * 8 + x] = 0 if px < 0 else (255 if px > 255 else px)
    return out


class _BitReader:
    """MSB-first entropy-stream reader with 0xFF00 unstuffing; stops at
    any real marker (leaves it for the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos, self.buf, self.nbits = data, pos, 0, 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.buf |= 0 << (24 - self.nbits)  # pad with zeros past end
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    break  # RST marker: caller handles via restart()
                else:
                    break  # EOI / other marker
            else:
                self.pos += 1
            self.buf = (self.buf << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
            if self.nbits < n:  # stuck at a marker: zero-pad
                self.buf = self.buf << 8
                self.nbits += 8
        self.nbits -= n
        v = (self.buf >> self.nbits) & ((1 << n) - 1)
        self.buf &= (1 << self.nbits) - 1
        return v

    def restart(self):
        """Byte-align and consume one RSTn marker."""
        self.buf, self.nbits = 0, 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _build_huff(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol from the DHT BITS/HUFFVAL lists (canonical
    code assignment, T.81 Annex C)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.bits(1)
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline sequential JPEG (SOF0, 8-bit, Huffman, 3-component
    YCbCr, h/v sampling factors <= 2, optional restart markers) →
    (width, height, RGB8 bytes). Progressive/arithmetic/12-bit/other
    component counts raise ``NotImplementedError``."""
    import struct

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qts: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0
    scan_pos = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack_from(">H", data, pos + 2)[0]
        seg = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables not supported")
                qts[tq] = list(seg[i + 1 : i + 65])
                i += 65
        elif marker == 0xC0:  # SOF0 baseline
            _prec, height, width, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if _prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            if ncomp != 3:
                raise NotImplementedError("only 3-component YCbCr JPEG supported")
            for ci in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * ci)
                h, v = hv >> 4, hv & 15
                if h > 2 or v > 2:
                    raise NotImplementedError("sampling factors > 2 not supported")
                comps.append({"id": cid, "h": h, "v": v, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("only baseline (SOF0) JPEG supported")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                huff[(tc, th)] = _build_huff(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sel = {}
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                sel[cs] = (tt >> 4, tt & 15)
            for c in comps:
                c["dc"], c["ac"] = sel[c["id"]]
            scan_pos = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if scan_pos is None or not comps or not width:
        raise ValueError("incomplete JPEG stream")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    for c in comps:
        c["bw"] = mcus_x * c["h"]  # blocks per row
        c["bh"] = mcus_y * c["v"]
        c["plane"] = bytearray(c["bw"] * 8 * c["bh"] * 8)
        c["pred"] = 0

    br = _BitReader(data, scan_pos)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                for c in comps:
                    c["pred"] = 0
            mcu_count += 1
            for c in comps:
                qt = qts[c["tq"]]
                dct, act = huff[(0, c["dc"])], huff[(1, c["ac"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = [0.0] * 64
                        s = _huff_decode(br, dct)
                        diff = _extend(br.bits(s), s)
                        c["pred"] += diff
                        coef[0] = c["pred"] * qt[0]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(br, act)
                            r, ssss = sym >> 4, sym & 15
                            if ssss == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            coef[_ZIGZAG[k]] = _extend(br.bits(ssss), ssss) * qt[k]
                            k += 1
                        px = _idct8x8(coef)
                        bx0 = (mx * c["h"] + bx) * 8
                        by0 = (my * c["v"] + by) * 8
                        row_w = c["bw"] * 8
                        for yy in range(8):
                            off = (by0 + yy) * row_w + bx0
                            c["plane"][off : off + 8] = bytes(px[yy * 8 : yy * 8 + 8])

    y_c, cb_c, cr_c = comps
    rgb = bytearray(width * height * 3)
    for y in range(height):
        for x in range(width):
            yv = y_c["plane"][(y * y_c["v"] // vmax) * y_c["bw"] * 8 + (x * y_c["h"] // hmax)]
            cb = cb_c["plane"][(y * cb_c["v"] // vmax) * cb_c["bw"] * 8 + (x * cb_c["h"] // hmax)]
            cr = cr_c["plane"][(y * cr_c["v"] // vmax) * cr_c["bw"] * 8 + (x * cr_c["h"] // hmax)]
            r = yv + 1.402 * (cr - 128)
            g = yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
            b = yv + 1.772 * (cb - 128)
            i = (y * width + x) * 3
            rgb[i] = 0 if r < 0 else (255 if r > 255 else int(round(r)))
            rgb[i + 1] = 0 if g < 0 else (255 if g > 255 else int(round(g)))
            rgb[i + 2] = 0 if b < 0 else (255 if b > 255 else int(round(b)))
    return width, height, bytes(rgb)


def _fdct8x8(samples: list[int]) -> list[float]:
    """Forward DCT of one level-shifted 8x8 block (row-major samples)."""
    shifted = [s - 128.0 for s in samples]
    tmp = [0.0] * 64
    for y in range(8):
        for u in range(8):
            s = 0.0
            for x in range(8):
                s += shifted[y * 8 + x] * _COS[x][u]
            tmp[y * 8 + u] = s * _C[u] / 2
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                s += tmp[y * 8 + u] * _COS[y][v]
            out[v * 8 + u] = s * _C[v] / 2
    return out


def _scaled_qt(base: list[int], quality: int) -> list[int]:
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [max(1, min(255, (t * scale + 50) // 100)) for t in base]


def encode_jpeg(
    width: int,
    height: int,
    rgb: bytes,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode RGB8 pixels as a baseline JPEG (SOF0): IJG-scaled Annex K
    quant tables, per-image fixed-length canonical Huffman tables
    announced via DHT, ``4:4:4`` or ``4:2:0`` chroma subsampling, and
    optional restart markers (``restart_interval`` MCUs per segment).
    Exists so the decoder has real in-repo fixtures covering every
    decode path; not a size-optimal encoder."""
    import struct

    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    if len(rgb) != width * height * 3:
        raise ValueError("rgb buffer must be width*height*3 bytes")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
    qt = [_scaled_qt(_QT_LUM, quality), _scaled_qt(_QT_CHR, quality)]
    factors = [(1, 1)] * 3 if subsampling == "4:4:4" else [(2, 2), (1, 1), (1, 1)]
    hmax = max(h for h, _ in factors)
    vmax = max(v for _, v in factors)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    # full-resolution YCbCr planes, edge-replicated to the MCU grid
    full_w, full_h = mcus_x * 8 * hmax, mcus_y * 8 * vmax
    full = [[[0] * full_w for _ in range(full_h)] for _ in range(3)]
    for y in range(full_h):
        sy = min(y, height - 1)
        for x in range(full_w):
            sx = min(x, width - 1)
            i = (sy * width + sx) * 3
            r, g, b = rgb[i], rgb[i + 1], rgb[i + 2]
            full[0][y][x] = int(round(0.299 * r + 0.587 * g + 0.114 * b))
            full[1][y][x] = int(round(128 - 0.168736 * r - 0.331264 * g + 0.5 * b))
            full[2][y][x] = int(round(128 + 0.5 * r - 0.418688 * g - 0.081312 * b))

    # per-component planes at their sampled resolution (box-filter down)
    planes = []
    for ci, (h, v) in enumerate(factors):
        pw, ph = mcus_x * 8 * h, mcus_y * 8 * v
        sx_step, sy_step = hmax // h, vmax // v
        if sx_step == 1 and sy_step == 1:
            planes.append(full[ci])
            continue
        p = [[0] * pw for _ in range(ph)]
        for y in range(ph):
            for x in range(pw):
                acc = 0
                for dy in range(sy_step):
                    for dx in range(sx_step):
                        acc += full[ci][y * sy_step + dy][x * sx_step + dx]
                p[y][x] = (acc + sx_step * sy_step // 2) // (sx_step * sy_step)
        planes.append(p)

    # quantized zigzag coefficients in interleaved MCU order, tagged with
    # the MCU index so restart segmentation can reset DC predictors
    blocks: list[tuple[int, int, list[int]]] = []  # (mcu_idx, comp, zigzag)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            mcu_idx = my * mcus_x + mx
            for ci, (h, v) in enumerate(factors):
                for by in range(v):
                    for bx in range(h):
                        x0, y0 = (mx * h + bx) * 8, (my * v + by) * 8
                        block = [
                            planes[ci][y0 + yy][x0 + xx]
                            for yy in range(8)
                            for xx in range(8)
                        ]
                        coefs = _fdct8x8(block)
                        q = qt[0 if ci == 0 else 1]
                        zz = [int(round(coefs[_ZIGZAG[k]] / q[k])) for k in range(64)]
                        blocks.append((mcu_idx, ci, zz))

    # entropy symbols, then fixed-length canonical Huffman per table class
    def _cat(v: int) -> int:
        return 0 if v == 0 else abs(v).bit_length()

    # (mcu_idx, [(table_kind, sym, extra, nbits)])
    streams: list[tuple[int, list[tuple[int, int, int, int]]]] = []
    preds = [0, 0, 0]
    last_seg = 0
    used: dict[int, set] = {0: set(), 1: set(), 2: set(), 3: set()}  # dcY acY dcC acC
    for mcu_idx, ci, zz in blocks:
        if restart_interval and mcu_idx // restart_interval != last_seg:
            last_seg = mcu_idx // restart_interval
            preds = [0, 0, 0]
        dc_t, ac_t = (0, 1) if ci == 0 else (2, 3)
        out = []
        diff = zz[0] - preds[ci]
        preds[ci] = zz[0]
        s = _cat(diff)
        extra = diff if diff >= 0 else diff + (1 << s) - 1
        out.append((dc_t, s, extra, s))
        used[dc_t].add(s)
        run = 0
        for k in range(1, 64):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                out.append((ac_t, 0xF0, 0, 0))
                used[ac_t].add(0xF0)
                run -= 16
            s = _cat(zz[k])
            sym = (run << 4) | s
            extra = zz[k] if zz[k] >= 0 else zz[k] + (1 << s) - 1
            out.append((ac_t, sym, extra, s))
            used[ac_t].add(sym)
            run = 0
        if run:
            out.append((ac_t, 0x00, 0, 0))
            used[ac_t].add(0x00)
        streams.append((mcu_idx, out))

    tables = {}
    dht_payload = bytearray()
    for t in range(4):
        syms = sorted(used[t]) or [0]
        length = max(2, (len(syms) + 1).bit_length())  # +1 keeps all-ones unused
        code = {s: i for i, s in enumerate(syms)}
        tables[t] = (length, code)
        bits = [0] * 16
        bits[length - 1] = len(syms)
        tc, th = (0, t // 2) if t % 2 == 0 else (1, t // 2)
        dht_payload += bytes([tc << 4 | th]) + bytes(bits) + bytes(syms)

    # bit writer with 0xFF stuffing
    out = bytearray()
    acc, nacc = 0, 0

    def put(v: int, n: int):
        nonlocal acc, nacc
        if n == 0:
            return
        acc = (acc << n) | (v & ((1 << n) - 1))
        nacc += n
        while nacc >= 8:
            nacc -= 8
            byte = (acc >> nacc) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        acc &= (1 << nacc) - 1

    def flush():
        nonlocal acc, nacc
        if nacc:
            put(0x7F, 8 - nacc)  # pad with 1s to byte boundary

    cur_seg = 0
    for mcu_idx, block_syms in streams:
        if restart_interval and mcu_idx // restart_interval != cur_seg:
            flush()
            out.append(0xFF)
            out.append(0xD0 + (cur_seg % 8))
            cur_seg = mcu_idx // restart_interval
        for t, sym, extra, nbits in block_syms:
            length, code = tables[t]
            put(code[sym], length)
            put(extra, nbits)
    flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    jpeg = bytearray(b"\xff\xd8")
    jpeg += seg(0xDB, bytes([0]) + bytes(qt[0]))
    jpeg += seg(0xDB, bytes([1]) + bytes(qt[1]))
    sof = struct.pack(">BHHB", 8, height, width, 3)
    for ci, (cid, tq) in enumerate(((1, 0), (2, 1), (3, 1))):
        h, v = factors[ci]
        sof += bytes([cid, (h << 4) | v, tq])
    jpeg += seg(0xC0, sof)
    jpeg += seg(0xC4, bytes(dht_payload))
    if restart_interval:
        jpeg += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    jpeg += seg(0xDA, sos)
    jpeg += out
    jpeg += b"\xff\xd9"
    return bytes(jpeg)


def decode_image(content: bytes, mime: str) -> tuple[int, int, bytes]:
    if mime == "image/bmp":
        return decode_bmp(content)
    if mime == "image/x-portable-pixmap":
        return decode_ppm(content)
    if mime == "image/png":
        return decode_png(content)
    if mime == "image/jpeg":
        return decode_jpeg(content)
    if mime == "image/gif":
        return decode_gif(content)
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

    from dbms_data_anonymity_differential_privacy_spark.operators.util import fan_out

    # single-file bench inputs arrive as ONE partition; the whole media
    # pipeline downstream is Python-decode CPU, so spread it first
    return fan_out(docs.select("doc_id", "text")).mapInPandas(run, MEDIA_SCHEMA)


def decode_media(content: bytes, mime: str) -> list[float]:
    """Feature vector for one blob, by mime:

    - ``text/plain`` → [n_bytes, byte mean, byte second moment]
    - BMP / PPM / PNG / baseline JPEG → [width, height, mean R, mean G, mean B]
    - PCM16 WAV → [n_samples, framerate, mean, RMS]

    Compressed video/audio (MP3/H.264/...) needs codec libraries absent
    from this container and raises ``NotImplementedError``.
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


def extract_features(
    media: DataFrame, batch_rows: int = 256, quarantine: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over blobs via ``mapInPandas``.

    The iterator contract keeps peak memory at one Arrow batch per worker;
    ``batch_rows`` bounds blob payload per batch (tune with
    maxRecordsPerBatch when blobs are megabytes).

    ``quarantine=True`` is the production posture for heterogeneous
    corpora: per-blob decode failures (progressive JPEG — SOF2 is parsed
    and honestly refused by :func:`decode_jpeg` — MP3/H.264, truncated or
    corrupt streams) become ``(feature=NULL, error=<message>)`` rows, so a
    100 TB scan degrades to per-file skip accounting the caller can
    aggregate, never a task error that retries the whole partition. The
    default (``False``) keeps strict semantics: any undecodable blob
    raises, which small curated fixtures want."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                if not quarantine:
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
                    continue
                feats: list = []
                errs: list = []
                for c, m in zip(chunk["content"], chunk["mime"]):
                    try:
                        feats.append(decode_media(bytes(c), m))
                        errs.append(None)
                    except Exception as exc:  # noqa: BLE001 — quarantine
                        # mode's whole contract: ANY per-blob decode
                        # failure (format refusal, truncation
                        # struct.error, zlib/wave errors, ...) becomes
                        # one accounted row, never a task error
                        feats.append(None)
                        errs.append(f"{type(exc).__name__}: {exc}")
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "mime": chunk["mime"],
                        "n_bytes": [len(c) for c in chunk["content"]],
                        "feature": feats,
                        "error": errs,
                    }
                )

    return media.mapInPandas(run, FEATURES_Q_SCHEMA if quarantine else FEATURES_SCHEMA)


def dhash64(content: bytes, mime: str) -> int:
    """X41 — 64-bit difference hash (dHash) of one image blob: decode,
    luma-grayscale, nearest-resample to 9×8, then bit i*8+j = 1 iff
    gray[i][j] < gray[i][j+1]. The standard perceptual fingerprint for
    image near-dup detection (robust to re-encode/resize, brittle to
    crops — by design, like every row-major dHash). Returned as a SIGNED
    64-bit int (two's complement) so it rides Spark's LongType.
    """
    w, h, rgb = decode_image(content, mime)
    small = resize_nearest(rgb, w, h, 9, 8)
    # integer luma (ITU-R 601-ish, scaled by 1000 to stay integral)
    gray = [
        (299 * small[i * 3] + 587 * small[i * 3 + 1] + 114 * small[i * 3 + 2])
        for i in range(72)
    ]
    bits = 0
    for y in range(8):
        for x in range(8):
            bits = (bits << 1) | (1 if gray[y * 9 + x] < gray[y * 9 + x + 1] else 0)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def image_dhash(media: DataFrame) -> DataFrame:
    """X41 — ``(media_id, phash: long)`` for every decodable image blob
    (non-image mimes are dropped: a perceptual hash of non-pixels is
    noise). Arrow-batched ``mapInPandas``; the decode is the same
    pure-Python codec path as ``extract_features``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, content, mime in zip(pdf["media_id"], pdf["content"], pdf["mime"]):
                if mime not in IMAGE_MIMES:
                    continue
                ids.append(mid)
                hashes.append(dhash64(bytes(content), mime))
            yield pd.DataFrame({"media_id": ids, "phash": pd.array(hashes, dtype="int64")})

    return media.mapInPandas(run, "media_id long, phash long")


def image_near_dup_pairs(media: DataFrame, max_hamming: int = 4) -> DataFrame:
    """X41 — near-duplicate image pairs: ``(id_a, id_b, hamming)`` with
    Hamming(phash_a, phash_b) <= max_hamming, via the shared pigeonhole
    block join (:func:`hamming_pairs_64`) over the dHash relation. Exact
    for the detector; the hash relation is 16 bytes/image and the block
    join is the only shuffle."""
    return hamming_pairs_64(image_dhash(media), "media_id", "phash", max_hamming)


def encode_wav(samples: "list[int]", framerate: int = 8000) -> bytes:
    """Encode mono PCM16 samples as a WAV blob (round-trips through
    :func:`decode_wav`)."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def documents_as_wav(docs: DataFrame, framerate: int = 8000) -> DataFrame:
    """Adapter: render each document's text bytes as a real PCM16 WAV
    (bytes → centered samples), giving the audio pipeline a decodable
    blob per document without external fixtures. Fanned out like the
    image adapter — the downstream cost is Python decode CPU."""
    from dbms_data_anonymity_differential_privacy_spark.operators.util import fan_out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            blobs = [
                encode_wav([(b - 128) * 256 for b in t.encode("utf-8")[:1024]] or [0],
                           framerate)
                for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "content": blobs,
                    "mime": "audio/wav",
                    "meta": [
                        {"n_bytes": len(b), "checksum": hashlib.md5(b).hexdigest()}
                        for b in blobs
                    ],
                }
            )

    return fan_out(docs.select("doc_id", "text")).mapInPandas(run, MEDIA_SCHEMA)


def audio_fingerprint64(content: bytes) -> int:
    """X42 — 64-bit energy-delta fingerprint of one PCM16 WAV blob: the
    mono samples split into 65 equal frames, bit i = 1 iff RMS-energy of
    frame i+1 exceeds frame i — the energy-contour analogue of image
    dHash (a Shazam-style landmark scheme reduced to one word). Robust
    to volume scaling direction and small edits, brittle to time shifts
    (disclosed — alignment-invariant audio search needs landmark pairs,
    out of scope). Signed 64-bit (two's complement) for Spark LongType.
    """
    _, samples = decode_wav(content)
    n = len(samples)
    frames = 65
    energies = []
    for i in range(frames):
        lo, hi = i * n // frames, (i + 1) * n // frames
        seg = samples[lo:hi] or [0]
        energies.append(sum(s * s for s in seg) // len(seg))
    bits = 0
    for i in range(64):
        bits = (bits << 1) | (1 if energies[i + 1] > energies[i] else 0)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def hamming_pairs_64(
    hashes: DataFrame, id_col: str, hash_col: str, max_hamming: int
) -> DataFrame:
    """Shared pigeonhole Hamming join over any 64-bit fingerprint
    relation: split into ``max_hamming + 1`` blocks, equi-join on
    ``(block_idx, block_val)``, verify with JVM ``bit_count(xor)``.
    Exact for the detector by the pigeonhole principle; used by both the
    image (dHash) and audio (energy-delta) near-dup paths."""
    if not 0 <= max_hamming <= 16:
        raise ValueError("max_hamming must be in [0, 16]")
    n_blocks = max_hamming + 1
    width = 64 // n_blocks

    # The block join below is a SELF-join: left lazy, both sides would
    # re-execute the upstream fingerprint pipeline — for the media paths
    # that is the whole Python decode run twice (measured: x41 full
    # 2.56 s vs 0.86 s for a single decode+hash pass at sf0.1). The
    # relation is 16 bytes/fingerprint at any scale, so persist + eager
    # count materializes it exactly once for both join sides (r10).
    from dbms_data_anonymity_differential_privacy_spark.operators.util import track_cached

    hashes = track_cached(hashes.persist())
    hashes.count()

    def block_expr(i: int):
        shift = i * width
        if i == n_blocks - 1:
            return F.shiftrightunsigned(F.col(hash_col), shift)
        mask = (1 << width) - 1
        return F.shiftrightunsigned(F.col(hash_col), shift).bitwiseAND(F.lit(mask))

    blocks = hashes.select(
        id_col,
        hash_col,
        F.explode(
            F.array(
                *[F.struct(F.lit(i).alias("bi"), block_expr(i).alias("bv")) for i in range(n_blocks)]
            )
        ).alias("b"),
    ).select(id_col, hash_col, "b.bi", "b.bv")
    a = blocks.select(
        F.col(id_col).alias("id_a"), F.col(hash_col).alias("__pa"), "bi", "bv"
    )
    b = blocks.select(
        F.col(id_col).alias("id_b"), F.col(hash_col).alias("__pb"), "bi", "bv"
    )
    cand = (
        a.join(b, ["bi", "bv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__pa", "__pb")
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("__pa").bitwiseXOR(F.col("__pb"))))
        .where(F.col("hamming") <= F.lit(max_hamming))
        .select("id_a", "id_b", "hamming")
    )


def audio_fingerprints(media: DataFrame) -> DataFrame:
    """X42 — ``(media_id, afp: long)`` for every decodable WAV blob
    (other mimes dropped). Arrow-batched ``mapInPandas``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for mid, content, mime in zip(pdf["media_id"], pdf["content"], pdf["mime"]):
                if mime not in AUDIO_MIMES:
                    continue
                ids.append(mid)
                fps.append(audio_fingerprint64(bytes(content)))
            yield pd.DataFrame({"media_id": ids, "afp": pd.array(fps, dtype="int64")})

    return media.mapInPandas(run, "media_id long, afp long")


def audio_near_dup_pairs(media: DataFrame, max_hamming: int = 4) -> DataFrame:
    """X42 — near-duplicate audio pairs via :func:`hamming_pairs_64` over
    the energy-delta fingerprints. Same physical shape as image dedup:
    16 bytes/clip shuffle, one block join, map-only verification."""
    return hamming_pairs_64(audio_fingerprints(media), "media_id", "afp", max_hamming)


def documents_as_mixed_media(docs: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """Adapter for quarantine-path testing at corpus scale: the same
    deterministic BMP rendering as :func:`documents_as_bmp`, but every
    50th document (doc_id % 50 == 3) is TRUNCATED to 10 bytes — a
    deterministic stand-in for the corrupt/exotic blobs every real
     100 TB media crawl contains."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        budget = width * height * 3
        for pdf in batches:
            blobs = []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                b = encode_bmp(width, height, t.encode("utf-8")[:budget].ljust(budget, b"\0"))
                blobs.append(b[:10] if did % 50 == 3 else b)
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

    from dbms_data_anonymity_differential_privacy_spark.operators.util import fan_out

    return fan_out(docs.select("doc_id", "text")).mapInPandas(run, MEDIA_SCHEMA)


def media_curation_stats(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """X96 — the quarantine path end to end: decode every blob with
    per-file skip accounting (:func:`extract_features` quarantine mode),
    then roll up per (mime, outcome) — 'ok' or the error class — with
    counts and byte volume. The dataset-card row a media-curation run
    reports ("N decodable, M quarantined, of which K truncated...");
    a failed blob costs one skipped row, never a task retry.

    Shape: Arrow map-only decode, one (mime, outcome) partial-agg rollup.
    """
    feats = extract_features(media, batch_rows=batch_rows, quarantine=True)
    outcome = F.when(F.col("error").isNull(), F.lit("ok")).otherwise(
        F.regexp_extract(F.col("error"), r"^(\w+)", 1)
    )
    return feats.groupBy("mime", outcome.alias("outcome")).agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
    )


# ---------------------------------------------------------------------------
# GIF (87a/89a) — pure-Python decode: logical screen + color tables, LZW
# decompression (variable code width, LSB-first, clear/EOI, 12-bit cap),
# interlace reordering; first frame rendered to RGB. The companion
# encoder is a REAL LZW compressor (dictionary growth + reset), so the
# round-trip tests exercise the decoder's table-rebuild path, not just
# literal codes. Reference: GIF89a specification (CompuServe, 1990).
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = [[i] for i in range(clear)] + [[], []]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + [entry[0]])
            elif code == len(table):
                entry = prev + [prev[0]]
                table.append(entry)
            else:
                raise ValueError(f"corrupt LZW stream: code {code} beyond table")
            out.extend(entry)
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
    return out


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    code_size = min_code_size + 1

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    buf: tuple[int, ...] = ()
    for idx in indices:
        cand = buf + (idx,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        # register BEFORE possibly widening: decoder grows its table on
        # the same schedule
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code == (1 << 12):
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        buf = (idx,)
    if buf:
        emit(table[buf])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> tuple[int, int, bytes]:
    """First frame of a GIF87a/89a as ``(width, height, rgb)``.

    Global and local color tables, real LZW decode, interlace reordering.
    The frame renders at its own descriptor size; GCE transparency is
    ignored (output is opaque RGB, matching the other codecs' contract).
    """
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    pos = 6
    packed = data[pos + 4]
    pos += 7
    gct = b""
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = data[pos : pos + n]
        pos += n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        w = int.from_bytes(data[pos + 4 : pos + 6], "little")
        h = int.from_bytes(data[pos + 6 : pos + 8], "little")
        ipacked = data[pos + 8]
        pos += 9
        table = gct
        if ipacked & 0x80:
            n = 3 * (2 << (ipacked & 0x07))
            table = data[pos : pos + n]
            pos += n
        if not table:
            raise ValueError("GIF frame has no color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        indices = _lzw_decode(bytes(lzw), min_code)
        if len(indices) < w * h:
            raise ValueError(f"GIF pixel data short: {len(indices)} < {w * h}")
        if ipacked & 0x40:  # interlaced: reorder rows
            rows = [indices[r * w : (r + 1) * w] for r in range(h)]
            ordered: list[list[int]] = [[]] * h
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                for r in range(start, h, step):
                    ordered[r] = rows[src]
                    src += 1
            indices = [i for row in ordered for i in row]
        rgb = bytearray(w * h * 3)
        n_colors = len(table) // 3
        for i in range(w * h):
            c = indices[i]
            if c >= n_colors:
                raise ValueError("palette index out of range")
            rgb[3 * i : 3 * i + 3] = table[3 * c : 3 * c + 3]
        return w, h, bytes(rgb)
    raise ValueError("GIF contains no image frame")


def encode_gif(
    width: int,
    height: int,
    rgb: bytes,
    interlaced: bool = False,
) -> bytes:
    """Fixture encoder: quantize to the distinct colors present (must be
    <= 256), REAL LZW compression, optional interlacing."""
    pixels = [tuple(rgb[3 * i : 3 * i + 3]) for i in range(width * height)]
    palette = sorted(set(pixels))
    if len(palette) > 256:
        raise ValueError("encode_gif fixture supports <= 256 distinct colors")
    cbits = max(1, (len(palette) - 1).bit_length())
    lut = {c: i for i, c in enumerate(palette)}
    indices = [lut[p] for p in pixels]
    if interlaced:
        order = [
            r for start, step in _GIF_INTERLACE_PASSES for r in range(start, height, step)
        ]
        indices = [i for r in order for i in indices[r * width : (r + 1) * width]]
    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0x80 | (cbits - 1))  # GCT present, size 2^cbits
    out += b"\x00\x00"
    for c in palette:
        out += bytes(c)
    out += b"\x00" * 3 * ((1 << cbits) - len(palette))
    out.append(0x2C)
    out += b"\x00\x00\x00\x00"
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append((0x40 if interlaced else 0) | 0)
    min_code = max(2, cbits)
    out.append(min_code)
    lzw = _lzw_encode(indices, min_code)
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
