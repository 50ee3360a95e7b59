"""Real audio decode for the one container that needs no codec: RIFF/
WAVE PCM. Extends the multimodal stage family (png/gif/jpeg codecs) to
the audio modality — WAV is length-prefixed chunks + raw little-endian
PCM, entirely decodable with struct/numpy.

Scope: PCM 16-bit (format tag 1) and IEEE float32 (tag 3), any channel
count/rate; compressed tags (ADPCM, MP3-in-WAV, a-law/mu-law) and other
bit depths are refused with ValueError — the same loud-reject rule as
the image codecs. The matching encoder gives the decoder a byte-exact
roundtrip gate (PCM is lossless).

``audio_features`` is the Spark surface: mapInPandas over BINARY
payloads → per-clip (sample_rate, channels, duration, RMS, peak,
zero-crossing rate) — the audio feature-extract step of the driver
mandate, computed from genuinely decoded samples.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whoiswho_spark.operators.codec_common import corrupt_input_guard

AUDIO_FEATURES_SCHEMA = (
    "doc_id bigint, sample_rate int, channels int, n_samples bigint, "
    "duration_s double, rms double, peak double, zero_crossing_rate double"
)


def encode_wav(samples: np.ndarray, rate: int, float32: bool = False) -> bytes:
    """(n,) or (n, ch) int16 (or float32 in [-1, 1] with float32=True)
    → RIFF/WAVE bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if float32:
        data = samples.astype("<f4").tobytes()
        tag, width = 3, 4
    else:
        if samples.dtype != np.int16:
            raise ValueError("encode_wav: int16 samples (or float32=True)")
        data = samples.astype("<i2").tobytes()
        tag, width = 1, 2
    byte_rate = rate * ch * width
    fmt = struct.pack("<HHIIHH", tag, ch, rate, byte_rate, ch * width, width * 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


@corrupt_input_guard
def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n, ch) float64 samples in [-1, 1], sample_rate).
    int16 PCM is scaled by 1/32768; float32 passes through. Raises
    ValueError on compressed formats or other bit depths."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav: not a RIFF/WAVE stream")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("wav: truncated chunk")
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("wav: missing fmt/data chunk")
    audio_fmt, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_fmt == 1 and bits == 16:
        a = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif audio_fmt == 3 and bits == 32:
        a = np.frombuffer(raw, dtype="<f4").astype(np.float64)
    else:
        raise ValueError(
            f"wav: unsupported format tag {audio_fmt} / {bits}-bit "
            "(PCM16 and float32 only)"
        )
    if ch < 1 or len(a) % ch:
        raise ValueError("wav: data size not a multiple of the frame size")
    return a.reshape(-1, ch), int(rate)


def audio_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """BINARY WAV payloads → per-clip features from REAL samples
    (mapInPandas; non-WAV / unsupported payloads yield no row). RMS and
    peak are over all channels; zero-crossing rate is the mean fraction
    of sign changes per channel."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "sample_rate", "channels", "n_samples",
                "duration_s", "rms", "peak", "zero_crossing_rate",
            )}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    samples, rate = decode_wav(
                        bytes(payload) if payload is not None else b""
                    )
                except ValueError:
                    continue
                n, ch = samples.shape
                out["doc_id"].append(int(did))
                out["sample_rate"].append(rate)
                out["channels"].append(ch)
                out["n_samples"].append(n)
                out["duration_s"].append(round(n / rate, 6) if rate else 0.0)
                out["rms"].append(round(float(np.sqrt((samples**2).mean())), 6))
                out["peak"].append(round(float(np.abs(samples).max(initial=0.0)), 6))
                zc = 0.0
                if n > 1:
                    signs = np.signbit(samples)
                    zc = float((signs[1:] != signs[:-1]).mean())
                out["zero_crossing_rate"].append(round(zc, 6))
            yield pd.DataFrame(out)

    return df.select(
        F.col(id_col).cast("long").alias(id_col), payload_col
    ).mapInPandas(feats, schema=AUDIO_FEATURES_SCHEMA)
