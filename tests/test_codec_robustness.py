"""Adversarial-bytes hardening: the corpus payload columns are untrusted
web bytes, and the Spark stages treat ValueError as skip-this-row. Under
seeded byte fuzzing (truncation, mutation, garbage splices of valid
files) every decoder must raise ONLY ValueError — a zlib.error /
IndexError / KeyError / OverflowError escaping would kill the whole
task — and header-declared dimension bombs must be refused before any
plane allocation."""

import random

import numpy as np
import pytest


def _samples():
    from whoiswho_spark.operators.audio_codec import encode_wav
    from whoiswho_spark.operators.gif_codec import encode_gif
    from whoiswho_spark.operators.jpeg_codec import encode_jpeg
    from whoiswho_spark.operators.png_codec import encode_png
    from whoiswho_spark.operators.video_codec import encode_avi_mjpeg

    rs = np.random.RandomState(0)
    arr = rs.randint(0, 256, size=(12, 12, 3), dtype=np.uint8)
    pal = rs.randint(0, 256, size=(8, 3), dtype=np.uint8)
    return {
        "png": encode_png(arr),
        "gif": encode_gif(rs.randint(0, 8, size=(12, 12), dtype=np.uint8), pal),
        "jpg": encode_jpeg(arr, subsampling="420"),
        "wav": encode_wav(rs.randint(-100, 100, size=200, dtype=np.int16), 8000),
        "avi": encode_avi_mjpeg(arr[None].repeat(3, axis=0)),
    }


def _decoders():
    from whoiswho_spark.operators.audio_codec import decode_wav
    from whoiswho_spark.operators.gif_codec import decode_gif
    from whoiswho_spark.operators.jpeg_codec import decode_jpeg
    from whoiswho_spark.operators.png_codec import decode_png
    from whoiswho_spark.operators.video_codec import decode_avi_frames

    return {
        "png": decode_png, "gif": decode_gif, "jpg": decode_jpeg,
        "wav": decode_wav, "avi": decode_avi_frames,
    }


@pytest.mark.parametrize("name", ["png", "gif", "jpg", "wav", "avi"])
def test_fuzzed_bytes_raise_only_valueerror(name):
    data = _samples()[name]
    decode = _decoders()[name]
    rng = random.Random(hash(name) & 0xFFFF)
    escaped = set()
    for _ in range(600):
        m = bytearray(data)
        op = rng.randrange(3)
        if op == 0 and len(m) > 20:
            m = m[: rng.randrange(10, len(m))]
        elif op == 1:
            for _ in range(rng.randrange(1, 6)):
                m[rng.randrange(len(m))] = rng.randrange(256)
        else:
            i = rng.randrange(len(m))
            m = m[:i] + bytes(rng.randrange(256) for _ in range(8)) + m[i:]
        try:
            decode(bytes(m))
        except ValueError:
            pass
        except Exception as e:  # noqa: BLE001 — the property under test
            escaped.add(type(e).__name__)
    assert not escaped, escaped


def test_dimension_bombs_refused_before_allocation():
    """Corrupt headers declaring absurd dimensions must raise, not
    zero-fill multi-GB planes on the executor."""
    import struct
    import zlib

    from whoiswho_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg
    from whoiswho_spark.operators.png_codec import _chunk, _PNG_SIG, decode_png

    # PNG claiming 60000x60000
    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, 0)
    bomb = (
        _PNG_SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 100))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="implausible"):
        decode_png(bomb)

    # JPEG SOF mutated to claim 65000x65000
    arr = np.zeros((8, 8), dtype=np.uint8)
    jpg = bytearray(encode_jpeg(arr))
    sof_at = bytes(jpg).index(b"\xff\xc0")
    jpg[sof_at + 5 : sof_at + 9] = struct.pack(">HH", 65000, 65000)
    with pytest.raises(ValueError, match="implausible"):
        decode_jpeg(bytes(jpg))


def test_pixel_stage_skips_fuzzed_rows_without_crashing(spark):
    """End-to-end: a batch mixing valid and corrupted payloads yields
    stats for the valid rows and silently skips the rest."""
    from whoiswho_spark.operators.multimodal import image_pixel_stats
    from whoiswho_spark.operators.png_codec import encode_png

    rs = np.random.RandomState(9)
    good = encode_png(rs.randint(0, 256, size=(6, 6, 3), dtype=np.uint8))
    rng = random.Random(7)
    rows = [(0, bytearray(good))]
    for i in range(1, 30):
        m = bytearray(good)
        for _ in range(rng.randrange(1, 8)):
            m[rng.randrange(len(m))] = rng.randrange(256)
        rows.append((i, m))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = image_pixel_stats(df).collect()
    assert any(r["doc_id"] == 0 for r in got)  # the pristine row decoded
    assert all(0 <= r["doc_id"] < 30 for r in got)
