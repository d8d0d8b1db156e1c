"""Pure-Python media codecs (BMP/PPM/WAV) and the real decode path through
the Spark multimodal pipeline (VERDICT r1 item 4 — de-stub decode_media)."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from dbms_data_anonymity_differential_privacy_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_bmp,
    decode_media,
    decode_ppm,
    decode_wav,
    documents_as_bmp,
    encode_bmp,
    extract_features,
    frame_sample,
    resize_media,
    resize_nearest,
)

# 3x2 RGB test image (odd width exercises the 4-byte row padding)
W, H = 3, 2
PIXELS = bytes(
    [
        255, 0, 0,    0, 255, 0,    0, 0, 255,   # row 0: R G B
        10, 20, 30,   40, 50, 60,   70, 80, 90,  # row 1
    ]
)


def test_bmp_round_trip_exact():
    data = encode_bmp(W, H, PIXELS)
    w, h, rgb = decode_bmp(data)
    assert (w, h) == (W, H)
    assert rgb == PIXELS
    # on-disk: BM magic, 54-byte header, bottom-up padded rows
    assert data[:2] == b"BM"
    assert struct.unpack_from("<I", data, 10)[0] == 54
    stride = (W * 3 + 3) & ~3
    assert len(data) == 54 + stride * H


def test_ppm_decode_with_comment():
    header = b"P6\n# a comment\n3 2\n255\n"
    w, h, rgb = decode_ppm(header + PIXELS)
    assert (w, h, rgb) == (W, H, PIXELS)
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\0")


def make_wav(samples: list[int], rate: int = 8000, channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def test_wav_decode_mono_and_stereo():
    rate, mono = decode_wav(make_wav([100, -200, 300, 0]))
    assert rate == 8000 and mono == [100, -200, 300, 0]
    # stereo interleaved L R L R -> averaged per frame
    rate, avg = decode_wav(make_wav([100, 200, -100, -300], channels=2))
    assert avg == [150, -200]


def test_decode_media_feature_values():
    feat = decode_media(encode_bmp(W, H, PIXELS), "image/bmp")
    n_px = W * H
    exp = [
        float(W),
        float(H),
        sum(PIXELS[0::3]) / n_px,
        sum(PIXELS[1::3]) / n_px,
        sum(PIXELS[2::3]) / n_px,
    ]
    assert feat == exp
    audio = decode_media(make_wav([3, -4]), "audio/wav")
    assert audio[0] == 2.0 and audio[1] == 8000.0
    assert audio[2] == pytest.approx(-0.5)
    assert audio[3] == pytest.approx((12.5) ** 0.5)
    # JPEG is a real decoder now: malformed bytes are a data error...
    with pytest.raises(ValueError):
        decode_media(b"\xff\xd8\xff", "image/jpeg")
    # ...while genuinely codec-less formats still refuse honestly
    with pytest.raises(NotImplementedError):
        decode_media(b"RIFFxxxxWEBP", "image/webp")


import pathlib

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def _rgb_pixel(x: int, y: int) -> tuple[int, int, int]:
    return ((x * 31 + y * 7) % 256, (x * 11 + y * 53) % 256, (x * 3 + y * 97) % 256)


def _rgba_rgb_pixel(x: int, y: int) -> tuple[int, int, int]:
    return ((x * 97 + y * 13) % 256, (x * 5 + y * 71) % 256, (x * 29 + y * 3) % 256)


def test_png_decode_rgb_all_filters_exact():
    """tiny_rgb.png: 6x5 RGB, one scanline per filter type 0-4 (generated
    with independent forward-filter code). Every pixel must match the
    generator's formula exactly."""
    from dbms_data_anonymity_differential_privacy_spark.operators.multimodal import decode_png

    data = (FIXTURES / "tiny_rgb.png").read_bytes()
    w, h, rgb = decode_png(data)
    assert (w, h) == (6, 5)
    for y in range(h):
        for x in range(w):
            i = (y * w + x) * 3
            assert tuple(rgb[i : i + 3]) == _rgb_pixel(x, y), (x, y)


def test_png_decode_rgba_drops_alpha_exact():
    from dbms_data_anonymity_differential_privacy_spark.operators.multimodal import decode_png

    data = (FIXTURES / "tiny_rgba.png").read_bytes()
    w, h, rgb = decode_png(data)
    assert (w, h) == (4, 4)
    for y in range(h):
        for x in range(w):
            i = (y * w + x) * 3
            assert tuple(rgb[i : i + 3]) == _rgba_rgb_pixel(x, y), (x, y)


def test_png_unsupported_flavors_raise():
    import struct as _struct
    import zlib as _zlib

    from dbms_data_anonymity_differential_privacy_spark.operators.multimodal import decode_png

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            _struct.pack(">I", len(payload))
            + ctype
            + payload
            + _struct.pack(">I", _zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    with pytest.raises(ValueError):
        decode_png(b"not a png")
    # grayscale (color type 0) is unsupported
    ihdr = _struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    gray = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    with pytest.raises(NotImplementedError):
        decode_png(gray)


def test_spark_png_pipeline_exact(spark):
    """The committed PNG through the real Spark path: extract_features
    computes exact channel means; resize_media decodes the PNG, resamples,
    and re-encodes as a decodable BMP with exact nearest-neighbor pixels."""
    from dbms_data_anonymity_differential_privacy_spark.operators.multimodal import decode_png

    data = (FIXTURES / "tiny_rgb.png").read_bytes()
    media = spark.createDataFrame(
        [(11, data, "image/png", (len(data), "x"))], MEDIA_SCHEMA
    )
    w, h, rgb = decode_png(data)
    n_px = w * h
    feats = {r.media_id: r.feature for r in extract_features(media).collect()}
    assert feats[11] == [
        float(w),
        float(h),
        sum(rgb[0::3]) / n_px,
        sum(rgb[1::3]) / n_px,
        sum(rgb[2::3]) / n_px,
    ]
    resized = resize_media(media, width=3, height=3).collect()
    assert resized[0].mime == "image/bmp"
    rw, rh, rrgb = decode_bmp(bytes(resized[0].content))
    assert (rw, rh) == (3, 3)
    assert rrgb == resize_nearest(rgb, w, h, 3, 3)


def test_resize_nearest_exact():
    # downsample 3x2 -> 1x1 picks the top-left source pixel (0,0)
    assert resize_nearest(PIXELS, W, H, 1, 1) == bytes([255, 0, 0])
    # upsample 1x1 -> 2x2 replicates
    one = bytes([9, 8, 7])
    assert resize_nearest(one, 1, 1, 2, 2) == one * 4


def test_spark_pixel_pipeline_exact(spark):
    """BMP blobs through mapInPandas: features exact, resize decodable."""
    data = encode_bmp(W, H, PIXELS)
    media = spark.createDataFrame(
        [(1, data, "image/bmp", (len(data), "x"))], MEDIA_SCHEMA
    )
    feats = {r.media_id: r.feature for r in extract_features(media).collect()}
    assert feats[1][:2] == [float(W), float(H)]
    resized = resize_media(media, width=2, height=2).collect()
    assert len(resized) == 1 and resized[0].width == 2
    w, h, rgb = decode_bmp(bytes(resized[0].content))
    assert (w, h) == (2, 2)
    # nearest-neighbor: output pixel (0,0) is source (0,0), (1,0) is source (1,0)
    assert rgb[0:3] == PIXELS[0:3]
    assert rgb[3:6] == PIXELS[3:6]


def test_spark_wav_frame_sample(spark):
    samples = list(range(-50, 50))  # 100 samples
    data = make_wav(samples)
    media = spark.createDataFrame(
        [(7, data, "audio/wav", (len(data), "x"))], MEDIA_SCHEMA
    )
    frames = frame_sample(media, every_n_bytes=40, max_frames=2).collect()
    assert [r.frame_idx for r in frames] == [0, 1]
    got = struct.unpack("<40h", bytes(frames[0].frame))
    assert list(got) == samples[:40]  # REAL sample windows, not byte windows


def test_documents_as_bmp_end_to_end(spark, sf0001):
    from dbms_data_anonymity_differential_privacy_spark import load_table

    docs = load_table(spark, sf0001, "documents").limit(20)
    media = documents_as_bmp(docs, width=16, height=16)
    out = extract_features(resize_media(media, width=8, height=8)).collect()
    assert len(out) == 20
    for r in out:
        assert len(r.feature) == 5
        assert r.feature[:2] == [8.0, 8.0]


# --- Baseline JPEG (encode_jpeg / decode_jpeg) ---------------------------


def _gradient(w, h):
    out = bytearray()
    for y in range(h):
        for x in range(w):
            out += bytes((x * 255 // max(w - 1, 1), y * 255 // max(h - 1, 1), 128))
    return bytes(out)


def test_jpeg_idct_dc_only_block():
    """A DC-only coefficient block must decode to a constant plane:
    IDCT(F) with F[0,0]=c, rest 0 → every sample = c/8 + 128 (T.81 A.3.3
    normalization) — pins the transform scaling independent of the
    entropy layer."""
    from dbms_data_anonymity_differential_privacy_spark.operators.multimodal import _idct8x8

    coef = [0.0] * 64
    coef[0] = 400.0
    px = _idct8x8(coef)
    assert all(p == round(400 / 8) + 128 for p in px)
    # and the zero block is mid-gray
    assert all(p == 128 for p in _idct8x8([0.0] * 64))


def test_jpeg_huffman_canonical_codes():
    """DHT canonical code assignment (T.81 Annex C): two 2-bit codes and
    one 3-bit code get codes 00, 01, 100."""
    from dbms_data_anonymity_differential_privacy_spark.operators.multimodal import _build_huff

    bits = [0, 2, 1] + [0] * 13
    table = _build_huff(bits, [7, 8, 9])
    assert table == {(2, 0b00): 7, (2, 0b01): 8, (3, 0b100): 9}


def test_jpeg_flat_color_near_exact():
    from dbms_data_anonymity_differential_privacy_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rgb = bytes([200, 60, 30] * 256)
    w, h, out = decode_jpeg(encode_jpeg(16, 16, rgb, quality=90))
    assert (w, h) == (16, 16)
    assert max(abs(a - b) for a, b in zip(rgb, out)) <= 2


def test_jpeg_roundtrip_all_modes():
    """Every encoder mode the decoder claims: 4:4:4 + 4:2:0, with and
    without restart markers, non-multiple-of-8 dimensions."""
    from dbms_data_anonymity_differential_privacy_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rgb = _gradient(21, 13)
    for sub in ("4:4:4", "4:2:0"):
        for ri in (0, 2):
            w, h, out = decode_jpeg(
                encode_jpeg(21, 13, rgb, quality=90, subsampling=sub, restart_interval=ri)
            )
            assert (w, h) == (21, 13), (sub, ri)
            errs = [abs(a - b) for a, b in zip(rgb, out)]
            assert max(errs) <= 20, (sub, ri, max(errs))
            # chroma downsampling on a steep small gradient costs more
            assert sum(errs) / len(errs) <= (5 if sub == "4:4:4" else 8), (sub, ri)


def test_jpeg_unsupported_flavors_raise():
    from dbms_data_anonymity_differential_privacy_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    data = bytearray(encode_jpeg(8, 8, bytes([10, 20, 30] * 64)))
    # flip SOF0 (0xC0) to SOF2 (progressive): must refuse, not misdecode
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_spark_jpeg_pipeline(spark):
    """image/jpeg blobs flow through the same mapInPandas feature/resize
    plumbing as the lossless codecs: features = [w, h, meanR, meanG,
    meanB] within JPEG tolerance of the source; resize re-encodes as a
    decodable BMP."""
    import hashlib

    from dbms_data_anonymity_differential_privacy_spark.operators.multimodal import (
        decode_bmp,
        encode_jpeg,
        extract_features,
        resize_media,
    )

    rgb = bytes([120, 200, 40] * 256)
    blob = encode_jpeg(16, 16, rgb, quality=95)
    media = spark.createDataFrame(
        [
            (
                1,
                bytearray(blob),
                "image/jpeg",
                {"n_bytes": len(blob), "checksum": hashlib.md5(blob).hexdigest()},
            )
        ],
        MEDIA_SCHEMA,
    )
    feat = extract_features(media).collect()[0]["feature"]
    assert feat[0] == 16.0 and feat[1] == 16.0
    assert abs(feat[2] - 120) <= 2 and abs(feat[3] - 200) <= 2 and abs(feat[4] - 40) <= 2
    resized = resize_media(media, 8, 8).collect()[0]
    assert resized["mime"] == "image/bmp"
    w, h, out = decode_bmp(bytes(resized["content"]))
    assert (w, h) == (8, 8)
    assert max(abs(a - b) for a, b in zip(bytes([120, 200, 40] * 64), out)) <= 3


def test_dhash_known_bits_and_invariance():
    """dHash of a crafted gradient: brighter-to-the-right rows give
    all-ones bits; a vertically-flipped encode of the same pixels gives
    the same hash (dHash reads decoded pixels, not file bytes)."""
    from dbms_data_anonymity_differential_privacy_spark.operators.multimodal import (
        dhash64,
        encode_bmp,
    )

    # 9x8 left-to-right gradient: every right neighbor is brighter
    rgb = bytearray()
    for y in range(8):
        for x in range(9):
            v = x * 28
            rgb += bytes((v, v, v))
    img = encode_bmp(9, 8, bytes(rgb))
    assert dhash64(img, "image/bmp") == -1  # 64 one-bits = -1 in two's complement
    # reversed gradient -> all zero bits
    rgb2 = bytearray()
    for y in range(8):
        for x in range(9):
            v = (8 - x) * 28
            rgb2 += bytes((v, v, v))
    assert dhash64(encode_bmp(9, 8, bytes(rgb2)), "image/bmp") == 0


def test_image_near_dup_pairs_finds_perturbed_copy(spark):
    """A lightly perturbed copy hashes within the Hamming budget and is
    paired; an unrelated image is not. Banding candidates == brute-force
    verified pairs (pigeonhole exactness)."""
    import random

    from dbms_data_anonymity_differential_privacy_spark.operators.multimodal import (
        dhash64,
        encode_bmp,
        image_near_dup_pairs,
    )

    rng = random.Random(7)
    base = bytes(rng.randrange(256) for _ in range(18 * 16 * 3))
    # perturb a few bytes slightly
    pert = bytearray(base)
    for i in range(0, 30, 7):
        pert[i] = min(255, pert[i] + 8)
    other = bytes(rng.randrange(256) for _ in range(18 * 16 * 3))
    rows = [
        (1, encode_bmp(18, 16, base), "image/bmp", {}),
        (2, encode_bmp(18, 16, bytes(pert)), "image/bmp", {}),
        (3, encode_bmp(18, 16, other), "image/bmp", {}),
        (4, b"not an image", "text/plain", {}),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, content binary, mime string, meta map<string,string>"
    )
    got = {(r.id_a, r.id_b): r.hamming for r in image_near_dup_pairs(media, max_hamming=6).collect()}
    # brute-force expectation from the scalar hash
    h = {i: dhash64(rows[i - 1][1], "image/bmp") for i in (1, 2, 3)}
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    want = {
        (i, j): ham(h[i], h[j])
        for i in (1, 2, 3)
        for j in (1, 2, 3)
        if i < j and ham(h[i], h[j]) <= 6
    }
    assert got == want
    assert (1, 2) in got  # the perturbed copy is found
    assert all(4 not in p for p in got)


def test_audio_fingerprint_contour_and_wav_roundtrip():
    """Energy-delta fingerprint of a crafted contour: strictly rising
    frame energies give all-one bits, falling give all-zero; encode_wav
    round-trips through decode_wav sample-exact."""
    from dbms_data_anonymity_differential_privacy_spark.operators.multimodal import (
        audio_fingerprint64,
        decode_wav,
        encode_wav,
    )

    # 65 frames x 10 samples, amplitude grows per frame -> rising energy
    rising = [((i // 10) + 1) * 100 for i in range(650)]
    assert audio_fingerprint64(encode_wav(rising)) == -1
    falling = [(65 - i // 10) * 100 for i in range(650)]
    assert audio_fingerprint64(encode_wav(falling)) == 0
    rate, back = decode_wav(encode_wav(rising, framerate=16000))
    assert rate == 16000 and back == rising


def test_audio_near_dup_pairs_matches_brute_force(spark):
    """Perturbed clip pairs with its original within the Hamming budget;
    banding candidates == brute-force verified pairs."""
    import random

    from dbms_data_anonymity_differential_privacy_spark.operators.multimodal import (
        audio_fingerprint64,
        audio_near_dup_pairs,
        encode_wav,
    )

    rng = random.Random(11)
    base = [rng.randrange(-3000, 3000) for _ in range(650)]
    pert = list(base)
    for i in range(0, 50, 9):
        pert[i] += 40
    other = [rng.randrange(-3000, 3000) for _ in range(650)]
    rows = [
        (1, encode_wav(base), "audio/wav", {}),
        (2, encode_wav(pert), "audio/wav", {}),
        (3, encode_wav(other), "audio/wav", {}),
        (4, b"not audio", "text/plain", {}),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, content binary, mime string, meta map<string,string>"
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in audio_near_dup_pairs(media, max_hamming=8).collect()
    }
    h = {i: audio_fingerprint64(rows[i - 1][1]) for i in (1, 2, 3)}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    want = {
        (i, j): ham(h[i], h[j])
        for i in (1, 2, 3)
        for j in (1, 2, 3)
        if i < j and ham(h[i], h[j]) <= 8
    }
    assert got == want
    assert (1, 2) in got
    assert all(4 not in p for p in got)


def test_extract_features_quarantine_progressive_jpeg(spark):
    """quarantine=True: a progressive (SOF2) JPEG lands as a
    (feature=NULL, error=...) row instead of failing the task, while
    decodable neighbors in the same Arrow batch keep full features —
    per-file skip accounting, the 100 TB degradation contract. Default
    strict mode must still raise for the same input."""
    import hashlib

    import pytest

    from dbms_data_anonymity_differential_privacy_spark.operators.multimodal import (
        encode_jpeg,
        extract_features,
    )

    good = encode_jpeg(8, 8, bytes([10, 20, 30] * 64), quality=90)
    bad = bytearray(good)
    i = bytes(bad).find(b"\xff\xc0")
    bad[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    bad = bytes(bad)

    def row(mid, blob):
        return (
            mid,
            bytearray(blob),
            "image/jpeg",
            {"n_bytes": len(blob), "checksum": hashlib.md5(blob).hexdigest()},
        )

    media = spark.createDataFrame([row(1, good), row(2, bad)], MEDIA_SCHEMA)

    out = {r.media_id: r for r in extract_features(media, quarantine=True).collect()}
    assert set(out) == {1, 2}
    assert out[1].feature is not None and out[1].error is None
    assert out[1].feature[0] == 8.0 and out[1].feature[1] == 8.0
    assert out[2].feature is None
    assert "NotImplementedError" in out[2].error and "SOF0" in out[2].error

    # strict mode: the same corpus is a task error (curated-fixture posture)
    with pytest.raises(Exception, match="SOF0|PythonException"):
        extract_features(media).collect()


def test_media_curation_stats_quarantine_split(spark, sf0001):
    """x96: the mixed-media rollup reports exactly the planted corrupt
    blobs (doc_id % 50 == 3) as quarantined and everything else as ok,
    with byte volumes consistent with the blob sizes."""
    from dbms_data_anonymity_differential_privacy_spark.operators.multimodal import (
        documents_as_mixed_media,
        media_curation_stats,
    )

    docs = spark.read.parquet(f"{sf0001}/documents.parquet")
    n = docs.count()
    n_bad = docs.filter("doc_id % 50 = 3").count()
    out = {r.outcome: (r.n_blobs, r.total_bytes) for r in
           media_curation_stats(documents_as_mixed_media(docs)).collect()}
    assert out["ok"][0] == n - n_bad
    bad = {k: v for k, v in out.items() if k != "ok"}
    assert sum(v[0] for v in bad.values()) == n_bad
    assert all(v[1] == 10 * v[0] for v in bad.values())  # truncated to 10 bytes
    assert out["ok"][1] == (n - n_bad) * (54 + 16 * 16 * 3)  # full BMPs


# ---------------------------------------------------------------------------
# GIF codec (decode_gif / encode_gif, real LZW)
# ---------------------------------------------------------------------------


def test_gif_decodes_canonical_external_fixture():
    """The ubiquitous 1x1 spacer GIF from the wild (not our own encoder):
    header, GCE skip, GCT lookup, LZW all on the spec's byte layout."""
    import base64

    from dbms_data_anonymity_differential_privacy_spark.operators.multimodal import decode_gif

    data = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAICRAEAOw=="
    )
    assert decode_gif(data) == (1, 1, b"\x00\x00\x00")


def test_gif_roundtrip_plain_and_interlaced():
    import random

    from dbms_data_anonymity_differential_privacy_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    random.seed(11)
    w, h = 17, 13  # odd size: interlace pass rows don't divide evenly
    rgb = bytes(random.randrange(6) * 40 for _ in range(w * h * 3))
    for interlaced in (False, True):
        blob = encode_gif(w, h, rgb, interlaced=interlaced)
        assert decode_gif(blob) == (w, h, rgb)


def test_gif_lzw_growth_and_reset():
    """Code width must widen in encoder/decoder lockstep, and the 4096-entry
    dictionary reset must round-trip (200k symbols over a 2-symbol alphabet
    forces several resets)."""
    import random

    from dbms_data_anonymity_differential_privacy_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    random.seed(3)
    for alpha, n in [(4, 50), (8, 5000), (2, 200_000), (256, 10_000)]:
        idx = [random.randrange(alpha) for _ in range(n)]
        mcs = max(2, (alpha - 1).bit_length())
        assert _lzw_decode(_lzw_encode(idx, mcs), mcs) == idx


def test_gif_error_paths():
    import pytest

    from dbms_data_anonymity_differential_privacy_spark.operators.multimodal import decode_gif, encode_gif

    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG........")
    with pytest.raises(ValueError, match="no image frame"):
        decode_gif(b"GIF89a" + (1).to_bytes(2, "little") * 2 + b"\x00\x00\x00" + b"\x3b")
    with pytest.raises(ValueError, match="256 distinct"):
        # 257 distinct colors (0..256 encoded base-8 into RGB triples)
        rgb = b"".join(bytes([v % 8 * 16, v // 8 % 8 * 16, v // 64 * 16]) for v in range(257))
        encode_gif(257, 1, rgb)


def test_spark_gif_pipeline(spark):
    """GIF blobs through the real Arrow path: extract_features sees the
    decoded dimensions, resize_media re-rasters through decode_image."""
    import random

    from dbms_data_anonymity_differential_privacy_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_bmp,
        encode_gif,
        extract_features,
        resize_media,
    )

    random.seed(5)
    w, h = 8, 6
    rgb = bytes(random.randrange(4) * 80 for _ in range(w * h * 3))
    blob = encode_gif(w, h, rgb)
    media = spark.createDataFrame(
        [(1, blob, "image/gif", (len(blob), "x"))], MEDIA_SCHEMA
    )
    feats = {r.media_id: r.feature for r in extract_features(media).collect()}
    assert feats[1][:2] == [float(w), float(h)]
    resized = resize_media(media, width=4, height=3).collect()
    assert len(resized) == 1
    rw, rh, rrgb = decode_bmp(bytes(resized[0].content))
    assert (rw, rh) == (4, 3)
    # nearest-neighbor keeps source pixel (0,0)
    assert rrgb[:3] == rgb[:3]
