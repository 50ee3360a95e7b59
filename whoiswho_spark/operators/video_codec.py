"""Real video frame decode for MJPEG-in-AVI — the video container the
sandbox CAN decode honestly.

AVI is RIFF (the WAV container, nested): LIST 'hdrl' carries the 'avih'
main header (frame period, count, dims); LIST 'movi' carries one
'00dc'/'00db' chunk per frame. In an MJPEG stream each frame chunk is a
complete baseline JPEG, so jpeg_codec decodes pixels for real — no
ffmpeg. Inter-frame codecs (H.264 etc.: motion compensation + CABAC)
stay honestly out of scope and are refused loudly by fourcc.

The matching encoder wraps this module family's own JPEG frames into a
minimal spec-shaped AVI (hdrl with avih + one 'vids/MJPG' strl, movi,
word-aligned chunks), giving the container layer an exact gate: every
frame decoded from the AVI must byte-equal decoding the source JPEG
directly (the lossy math is the jpeg_codec layer, already gated there).

``video_frame_stats`` is the Spark surface: the frame-SAMPLING plan of
``multimodal.sample_frames`` executed with real pixels — decode ONLY
the sampled frame indices (chunk offsets let us skip undecoded frames),
emit per-frame channel stats.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whoiswho_spark.operators.codec_common import corrupt_input_guard
from whoiswho_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg

FRAME_STATS_SCHEMA = (
    "doc_id bigint, frame_idx int, n_frames int, fps double, "
    "width int, height int, channels int, px_mean double, px_std double"
)


def encode_avi_mjpeg(frames: "np.ndarray | list", fps: float = 10.0) -> bytes:
    """(n, h, w[, 3]) uint8 frames (or a list of same-shape arrays) →
    MJPEG AVI bytes; each frame is encoded with this repo's baseline
    JPEG encoder."""
    frames = [np.asarray(f) for f in frames]
    if not frames:
        raise ValueError("encode_avi_mjpeg: no frames")
    h, w = frames[0].shape[:2]
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("encode_avi_mjpeg: frames must share one shape")
    payloads = [encode_jpeg(f) for f in frames]

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    usec = int(round(1_000_000 / fps))
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec, 0, 0, 0x10, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1,
                                        int(round(fps)), 0, len(frames), 0, 0, 0, 0)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, w * h * 3, 0, 0, 0, 0)
    # 'MJPG' compression fourcc lives at BITMAPINFOHEADER.biCompression
    strf = strf[:16] + b"MJPG" + strf[20:]
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body_start = pos + 8
        if body_start + size > end:
            raise ValueError("avi: truncated chunk")
        yield tag, body_start, size
        pos = body_start + size + (size & 1)


@corrupt_input_guard
def avi_frame_index(data: bytes) -> tuple[list[tuple[int, int]], float, int]:
    """AVI bytes → ([(offset, size)] per video frame chunk, fps,
    declared frame count) WITHOUT decoding any frame — the cheap pass
    that makes sampled decode O(sampled), not O(video)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("avi: not a RIFF/AVI stream")
    fps, declared = 0.0, 0
    frames: list[tuple[int, int]] = []
    for tag, off, size in _walk_chunks(data, 12, len(data)):
        if tag != b"LIST":
            continue
        kind = data[off : off + 4]
        if kind == b"hdrl":
            for t2, o2, s2 in _walk_chunks(data, off + 4, off + size):
                if t2 == b"avih":
                    usec, declared = struct.unpack("<I", data[o2 : o2 + 4])[0], \
                        struct.unpack("<I", data[o2 + 16 : o2 + 20])[0]
                    fps = 1_000_000 / usec if usec else 0.0
                if t2 == b"LIST" and data[o2 : o2 + 4] == b"strl":
                    for t3, o3, s3 in _walk_chunks(data, o2 + 4, o2 + s2):
                        if t3 == b"strh":
                            if data[o3 : o3 + 4] == b"vids" and data[o3 + 4 : o3 + 8] not in (b"MJPG", b"mjpg"):
                                raise ValueError(
                                    "avi: only MJPEG video streams supported"
                                )
        elif kind == b"movi":
            for t2, o2, s2 in _walk_chunks(data, off + 4, off + size):
                if t2[2:4] in (b"dc", b"db"):
                    frames.append((o2, s2))
    if not frames:
        raise ValueError("avi: no video frame chunks")
    return frames, fps, declared


@corrupt_input_guard
def decode_avi_frames(
    data: bytes, indices: list[int] | None = None
) -> tuple[list[np.ndarray], float]:
    """Decode the sampled frame indices (all frames when None) through
    the real JPEG decoder. Returns ([frame arrays], fps)."""
    frames, fps, _ = avi_frame_index(data)
    if indices is None:
        indices = list(range(len(frames)))
    out = []
    for i in indices:
        if not 0 <= i < len(frames):
            raise ValueError(f"avi: frame index {i} out of range")
        off, size = frames[i]
        out.append(decode_jpeg(data[off : off + size]))
    return out, fps


def video_frame_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_k: int = 5,
) -> DataFrame:
    """The sample_frames PLAN executed with real pixels: for each AVI
    payload, decode every k-th frame (first frame always) via the chunk
    index — cost O(sampled frames) — and emit per-frame channel stats.
    Non-AVI / non-MJPEG payloads yield no row."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "frame_idx", "n_frames", "fps",
                "width", "height", "channels", "px_mean", "px_std",
            )}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    index, fps, _ = avi_frame_index(raw)
                    picks = list(range(0, len(index), every_k))
                    decoded, _ = decode_avi_frames(raw, picks)
                except ValueError:
                    continue
                for idx, arr in zip(picks, decoded):
                    h, w, ch = arr.shape
                    out["doc_id"].append(int(did))
                    out["frame_idx"].append(idx)
                    out["n_frames"].append(len(index))
                    out["fps"].append(round(fps, 6))
                    out["width"].append(w)
                    out["height"].append(h)
                    out["channels"].append(ch)
                    out["px_mean"].append(round(float(arr.mean()), 6))
                    out["px_std"].append(round(float(arr.std()), 6))
            yield pd.DataFrame(out)

    return df.select(
        F.col(id_col).cast("long").alias(id_col), payload_col
    ).mapInPandas(stats, schema=FRAME_STATS_SCHEMA)
