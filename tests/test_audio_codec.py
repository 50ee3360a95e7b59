"""RIFF/WAVE PCM codec: byte-exact roundtrip (PCM is lossless), stdlib
``wave``-module cross-validation, loud rejection of compressed formats,
and the audio_features Spark stage against numpy."""

import io
import struct
import wave

import numpy as np
import pytest

from whoiswho_spark.operators.audio_codec import (
    audio_features,
    decode_wav,
    encode_wav,
)


def test_pcm16_roundtrip_exact_mono_and_stereo():
    rs = np.random.RandomState(1)
    for shape in ((800,), (512, 2), (100, 6)):
        s = rs.randint(-32768, 32768, size=shape, dtype=np.int16)
        got, rate = decode_wav(encode_wav(s, rate=16000))
        want = (s[:, None] if s.ndim == 1 else s).astype(np.float64) / 32768.0
        assert rate == 16000
        assert np.array_equal(got, want)


def test_float32_roundtrip_exact():
    rs = np.random.RandomState(2)
    s = (rs.rand(300, 2).astype(np.float32) * 2 - 1)
    got, rate = decode_wav(encode_wav(s, rate=44100, float32=True))
    assert rate == 44100
    assert np.array_equal(got, s.astype(np.float64))


def test_cross_validates_against_stdlib_wave_module():
    """Our encoder's bytes parse with the stdlib wave reader and vice
    versa — independent implementations of the same container."""
    rs = np.random.RandomState(3)
    s = rs.randint(-32768, 32768, size=(256, 2), dtype=np.int16)
    ours = encode_wav(s, rate=8000)
    with wave.open(io.BytesIO(ours)) as w:
        assert (w.getnchannels(), w.getframerate(), w.getsampwidth()) == (2, 8000, 2)
        frames = np.frombuffer(w.readframes(256), dtype="<i2").reshape(-1, 2)
        assert np.array_equal(frames, s)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(s.astype("<i2").tobytes())
    got, rate = decode_wav(buf.getvalue())
    assert rate == 8000 and np.array_equal(got, s.astype(np.float64) / 32768.0)


def test_unsupported_formats_raise_loudly():
    s = np.zeros(64, dtype=np.int16)
    good = bytearray(encode_wav(s, rate=8000))
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"OggS vorbis-ish")
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"")
    # flip the format tag to ADPCM (2)
    fmt_at = bytes(good).index(b"fmt ") + 8
    bad = bytearray(good)
    bad[fmt_at : fmt_at + 2] = struct.pack("<H", 2)
    with pytest.raises(ValueError, match="unsupported format"):
        decode_wav(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(bytes(good[:100]))  # cut inside the data chunk body
    with pytest.raises(ValueError, match="missing fmt/data"):
        decode_wav(bytes(good[:40]))  # cut inside the data chunk HEADER


def test_audio_features_stage_matches_numpy(spark):
    rs = np.random.RandomState(5)
    tone = (np.sin(np.arange(16000) / 16000 * 2 * np.pi * 440) * 20000).astype(np.int16)
    noise = rs.randint(-32768, 32768, size=(4000, 2), dtype=np.int16)
    rows = [
        (1, bytearray(encode_wav(tone, rate=16000))),
        (2, bytearray(encode_wav(noise, rate=8000))),
        (3, bytearray(b"\x89PNG not audio")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in audio_features(df).collect()}
    assert set(got) == {1, 2}
    t = tone.astype(np.float64)[:, None] / 32768.0
    assert got[1]["sample_rate"] == 16000 and got[1]["channels"] == 1
    assert got[1]["duration_s"] == 1.0
    assert got[1]["rms"] == round(float(np.sqrt((t**2).mean())), 6)
    assert got[1]["peak"] == round(float(np.abs(t).max()), 6)
    signs = np.signbit(t)
    assert got[1]["zero_crossing_rate"] == round(
        float((signs[1:] != signs[:-1]).mean()), 6
    )
    assert got[2]["channels"] == 2 and got[2]["duration_s"] == 0.5
