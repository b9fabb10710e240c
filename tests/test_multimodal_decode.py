"""Real (non-fake) media decode: WAV/PPM/BMP header parsing over
genuine bytes — golden payloads round-trip exactly, unknown formats
still raise the codec stub, and the end-to-end synthetic_media →
decode_media_headers path is oracle-checked via q_media_decode in
tests/test_oracle_parity.py."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from myasynstreamjoin_spark.functions.multimodal import (
    _parse_bmp,
    _parse_ppm,
    _parse_wav,
    decode_media_headers,
    synthetic_media,
)


def _golden_wav(n_samples: int = 160, rate: int = 8000) -> bytes:
    body = bytes(range(256)) * (n_samples // 256 + 1)
    body = body[:n_samples]
    return (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate, 1, 8)
        + b"data" + struct.pack("<I", len(body)) + body
    )


def test_wav_golden_roundtrip():
    meta = _parse_wav(_golden_wav(16000, 8000))
    assert meta == {
        "fmt": "wav", "width": None, "height": None, "n_channels": 1,
        "bit_depth": 8, "n_frames": 16000, "sample_rate_hz": 8000,
        "duration_ms": 2000,
        "_data_off": 44, "_data_len": 16000,
    }


def test_wav_stereo_16bit_frames():
    # 2 channels × 16-bit → 4 bytes per frame
    body = b"\x00" * 400
    b = (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 176400, 4, 16)
        + b"data" + struct.pack("<I", len(body)) + body
    )
    meta = _parse_wav(b)
    assert meta["n_channels"] == 2
    assert meta["bit_depth"] == 16
    assert meta["n_frames"] == 100
    assert meta["sample_rate_hz"] == 44100


def test_ppm_header_with_comment():
    b = b"P6\n# a comment\n640 480\n255\n" + b"\x00" * 10
    meta = _parse_ppm(b)
    assert (meta["width"], meta["height"], meta["bit_depth"]) == (640, 480, 8)


def test_bmp_header():
    px = b"\x00" * 24
    b = (
        b"BM" + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 8, 1, 1, 24, 0, len(px),
                      2835, 2835, 0, 0)
        + px
    )
    meta = _parse_bmp(b)
    assert (meta["width"], meta["height"], meta["bit_depth"]) == (8, 1, 24)


def test_bmp_bottom_up_height_is_positive():
    b = (
        b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 4, -7, 1, 24, 0, 0, 0, 0, 0, 0)
    )
    assert _parse_bmp(b)["height"] == 7


def test_garbage_does_not_parse():
    with pytest.raises(ValueError):
        _parse_wav(b"RIFFxxxxJUNK")
    with pytest.raises(ValueError):
        _parse_ppm(b"P6")
    with pytest.raises(ValueError):
        _parse_bmp(b"BMshort")


def test_unknown_magic_raises_codec_stub(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\n\x1a\n...."))], "media_id LONG, content BINARY"
    )
    with pytest.raises(Exception, match="NotImplementedError|only WAV/PPM/BMP"):
        decode_media_headers(df).collect()


def test_synthetic_media_decodes_for_real(spark, sf_dir):
    """End-to-end over the driver fixture: real headers built, real
    bytes parsed, no stub raise — and the WAV rows carry exactly the
    text byte count as frames (the body IS the text)."""
    from myasynstreamjoin_spark.sources import tables
    from pyspark.sql import functions as F

    docs = tables.load_table(spark, sf_dir, "documents")
    out = decode_media_headers(synthetic_media(docs))
    wav = out.where("fmt = 'wav'")
    joined = wav.join(
        docs.select(
            F.col("doc_id").alias("media_id"),
            F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("nb"),
        ),
        "media_id",
    )
    assert joined.where("n_frames <> nb").count() == 0
    assert out.count() == docs.count()


def test_audio_sample_stats_known_bytes(spark):
    """Hand-built doc: stats computable by hand from the text bytes."""
    from myasynstreamjoin_spark.functions.multimodal import (
        audio_sample_stats,
        synthetic_media,
    )

    text = "abc"  # ords 97 98 99 → devs -31 -30 -29
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    media = synthetic_media(docs)
    r = audio_sample_stats(media).collect()[0]
    assert (r.media_id, r.n_samples) == (0, 3)
    assert r.sum_dev_sq == 31 * 31 + 30 * 30 + 29 * 29
    assert r.peak_dev == 31
    assert abs(r.rms - (r.sum_dev_sq / 3) ** 0.5) < 1e-12


def _ppm(w, h, px: bytes) -> bytes:
    assert len(px) == w * h * 3
    return b"P6\n%d %d\n255\n" % (w, h) + px


def _bmp(w, h, rows_topdown: list[bytes]) -> bytes:
    stride = (w * 3 + 3) & ~3
    body = b"".join(
        r + b"\x00" * (stride - len(r)) for r in reversed(rows_topdown)
    )
    return (
        b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
        + body
    )


def _reference_ahash(gray) -> int:
    """Plain-Python aHash with the same integer comparisons."""
    h, w = len(gray), len(gray[0])
    bsum = [[0] * 8 for _ in range(8)]
    bcnt = [[0] * 8 for _ in range(8)]
    gsum = gcnt = 0
    for r in range(h):
        for c in range(w):
            br, bc = min(r * 8 // h, 7), min(c * 8 // w, 7)
            bsum[br][bc] += gray[r][c]
            bcnt[br][bc] += 1
            gsum += gray[r][c]
            gcnt += 1
    val = 0
    for i in range(64):
        br, bc = i // 8, i % 8
        if bsum[br][bc] * gcnt > gsum * bcnt[br][bc]:
            val |= 1 << i
    return val - (1 << 64) if val >= 1 << 63 else val


def test_image_ahash_matches_reference_on_both_formats(spark):
    from myasynstreamjoin_spark.functions.multimodal import image_ahash

    import numpy as np

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=16 * 16 * 3, dtype=np.int64).astype(
        "uint8"
    ).tobytes()
    gray = [
        [sum(px[(r * 16 + c) * 3 + k] for k in range(3)) for c in range(16)]
        for r in range(16)
    ]
    rows_topdown = [px[r * 48 : (r + 1) * 48] for r in range(16)]
    media = spark.createDataFrame(
        [(0, bytearray(_ppm(16, 16, px))), (1, bytearray(_bmp(16, 16, rows_topdown)))],
        "media_id long, content binary",
    )
    got = {r["media_id"]: r["ahash"] for r in image_ahash(media).collect()}
    want = _reference_ahash(gray)
    # same pixels through either container hash identically (BMP's
    # bottom-up rows are flipped back upright before hashing)
    assert got == {0: want, 1: want}


def test_image_neardup_lossless_vs_brute_force(spark, sf_dir):
    """Pigeonhole guarantee: banded candidates find EVERY pair at
    Hamming distance ≤ 3 — checked against all-pairs brute force over
    the synthetic corpus (duplicated docs ⇒ distance-0 pairs exist)."""
    from myasynstreamjoin_spark.functions.multimodal import (
        image_ahash,
        image_neardup_pairs,
        synthetic_media,
    )
    from myasynstreamjoin_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    # plant exact perceptual duplicates: same text, new ids, same
    # format class (offset divisible by 3 keeps doc_id % 3 ⇒ same format)
    dups = docs.where(F.col("doc_id") % 3 == 1).limit(5).select(
        (F.col("doc_id") + 9999).alias("doc_id"), "text"
    )
    media = synthetic_media(docs.select("doc_id", "text").union(dups))
    pairs = {
        (r["a"], r["b"], r["hamming"])
        for r in image_neardup_pairs(media, max_dist=3).collect()
    }
    hashes = {
        r["media_id"]: r["ahash"] for r in image_ahash(media).collect()
    }
    brute = set()
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                brute.add((a, b, d))
    assert pairs == brute
    # the planted duplicates all surface at distance 0
    planted = {
        (r["doc_id"] - 9999, r["doc_id"]) for r in dups.collect()
    }
    assert planted and all((a, b, 0) in pairs for a, b in planted)


def test_image_neardup_wider_radius_stays_lossless(spark, sf_dir):
    """max_dist=7 auto-selects 8 bands; the candidate scheme must
    still find EVERY pair within the radius (pigeonhole with 8-bit
    band keys)."""
    from myasynstreamjoin_spark.functions.multimodal import (
        image_ahash,
        image_neardup_pairs,
        synthetic_media,
    )
    from myasynstreamjoin_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(150)
    media = synthetic_media(docs.select("doc_id", "text"))
    pairs = {
        (r["a"], r["b"], r["hamming"])
        for r in image_neardup_pairs(media, max_dist=7).collect()
    }
    hashes = {
        r["media_id"]: r["ahash"] for r in image_ahash(media).collect()
    }
    ids = sorted(hashes)
    brute = {
        (a, b, bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1") <= 7
    }
    assert pairs == brute


def test_image_neardup_rejects_lossy_banding():
    import pytest as _pytest

    from myasynstreamjoin_spark.functions.multimodal import (
        image_neardup_pairs,
    )

    with _pytest.raises(ValueError):
        image_neardup_pairs(None, max_dist=4, n_bands=4)
    with _pytest.raises(ValueError):
        image_neardup_pairs(None, max_dist=3, n_bands=6)


def _reference_afp(samples: list[int]) -> int:
    """Plain-Python energy-trend fingerprint (65 frames, 64 bits)."""
    n = len(samples)
    bounds = [i * n // 65 for i in range(66)]
    e = [
        sum((s - 128) ** 2 for s in samples[bounds[i] : bounds[i + 1]])
        for i in range(65)
    ]
    val = 0
    for k in range(64):
        if e[k + 1] > e[k]:
            val |= 1 << k
    return val - (1 << 64) if val >= 1 << 63 else val


def test_audio_fingerprint_matches_reference(spark):
    from myasynstreamjoin_spark.functions.multimodal import (
        audio_fingerprint,
    )

    import numpy as np

    rng = np.random.RandomState(11)
    samples = rng.randint(0, 256, size=1300, dtype=np.int64).tolist()
    wav = _golden_wav_from(bytes(samples))
    media = spark.createDataFrame(
        [(0, bytearray(wav))], "media_id long, content binary"
    )
    got = audio_fingerprint(media).collect()
    assert len(got) == 1
    assert got[0]["afp"] == _reference_afp(samples)


def _golden_wav_from(body: bytes, rate: int = 8000) -> bytes:
    return (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate, 1, 8)
        + b"data" + struct.pack("<I", len(body)) + body
    )


def test_audio_neardup_lossless_vs_brute_force(spark, sf_dir):
    """Banded audio candidates find every pair within the radius —
    brute-force parity over the synthetic WAV corpus, with planted
    exact duplicates at distance 0."""
    from myasynstreamjoin_spark.functions.multimodal import (
        audio_fingerprint,
        audio_neardup_pairs,
        synthetic_media,
    )
    from myasynstreamjoin_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    dups = docs.where(F.col("doc_id") % 3 == 0).limit(5).select(
        (F.col("doc_id") + 9999).alias("doc_id"), "text"
    )
    media = synthetic_media(docs.select("doc_id", "text").union(dups))
    pairs = {
        (r["a"], r["b"], r["hamming"])
        for r in audio_neardup_pairs(media, max_dist=3).collect()
    }
    fps = {
        r["media_id"]: r["afp"] for r in audio_fingerprint(media).collect()
    }
    ids = sorted(fps)
    brute = {
        (a, b, bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1") <= 3
    }
    assert pairs == brute
    planted = {(r["doc_id"] - 9999, r["doc_id"]) for r in dups.collect()}
    assert planted and all((a, b, 0) in pairs for a, b in planted)
