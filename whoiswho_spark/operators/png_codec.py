"""Real PNG pixel decode/encode on stdlib zlib — no PIL/ffmpeg.

Closes the pixel-level half of the multimodal gap for the one container
whose compression IS in the Python standard library: PNG's IDAT stream
is raw zlib (RFC 1950) and the five scanline filters are pure
arithmetic, so a complete, dependency-free 8-bit decoder (gray / gray+
alpha / RGB / RGBA, non-interlaced) and a matching encoder fit in this
module. JPEG/GIF pixel decode stays honestly gated — their entropy
coders (Huffman-DCT, LSZW) are not in the sandbox's stdlib-only budget —
while their header metadata remains covered by
``multimodal.parse_media_header``.

Decoder contract: byte-exact reconstruction (the filters are lossless
integer arithmetic) — gated by roundtrip tests through the encoder at
every (filter, channels) combination and by dimension agreement with the
header parser. Unsupported shapes (16-bit, palette, interlaced) raise
``ValueError`` loudly rather than guessing.

Spark surface: ``png_pixel_stats`` runs the decoder inside mapInPandas
(Arrow batches of BINARY payloads, the same stage shape every multimodal
op here uses), emitting per-image channel statistics — the
feature-extraction step that was previously stubbed at the pixel level.
SQL oracle: none possible (DuckDB has no zlib inflate), so this operator
is pytest-gated (exact roundtrip + stats-vs-numpy) and deliberately NOT
in the oracle query suite, preserving its zero-rows-only property.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whoiswho_spark.operators.codec_common import (
    check_dimensions,
    corrupt_input_guard,
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color type → channel count (8-bit, non-palette)
_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_CHANNELS_COLOR = {v: k for k, v in _COLOR_CHANNELS.items()}

PIXEL_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, "
    "px_mean double, px_std double, px_min int, px_max int"
)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PaethPredictor (PNG spec §9.4) vectorized over a scanline."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w[, ch]) uint8 array → PNG bytes. ``filter_type`` applies one
    filter (0..4) to EVERY scanline — the encoder's job here is to give
    the decoder's five unfilter paths a spec-true counterpart, not to
    optimize compression."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype != np.uint8:
        raise ValueError("encode_png: 8-bit arrays only")
    h, w, ch = arr.shape
    if ch not in _CHANNELS_COLOR:
        raise ValueError(f"encode_png: unsupported channel count {ch}")
    if filter_type not in range(5):
        raise ValueError(f"encode_png: bad filter {filter_type}")
    raw = arr.reshape(h, w * ch).astype(np.uint8)
    prior = np.zeros(w * ch, dtype=np.uint8)
    lines = []
    for y in range(h):
        cur = raw[y]
        left = np.zeros_like(cur)
        left[ch:] = cur[:-ch]
        pleft = np.zeros_like(prior)
        pleft[ch:] = prior[:-ch]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:  # Sub
            filt = cur - left
        elif filter_type == 2:  # Up
            filt = cur - prior
        elif filter_type == 3:  # Average
            filt = cur - (
                (left.astype(np.uint16) + prior.astype(np.uint16)) // 2
            ).astype(np.uint8)
        else:  # Paeth
            filt = cur - _paeth(left, prior, pleft)
        lines.append(bytes([filter_type]) + filt.tobytes())
        prior = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CHANNELS_COLOR[ch], 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk(b"IEND", b"")
    )


@corrupt_input_guard
def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, ch) uint8 array. Supports bit depth 8, color
    types 0/2/4/6, non-interlaced, any IDAT split. Raises ValueError on
    anything else — no silent approximation."""
    if not data or not data.startswith(_PNG_SIG):
        raise ValueError("decode_png: not a PNG")
    pos, ihdr, idat = len(_PNG_SIG), None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("decode_png: truncated chunk")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("decode_png: missing IHDR/IDAT")
    w, h, depth, color, comp, filt_m, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8:
        raise ValueError(f"decode_png: unsupported bit depth {depth}")
    if color not in _COLOR_CHANNELS:
        raise ValueError(f"decode_png: unsupported color type {color}")
    if comp != 0 or filt_m != 0:
        raise ValueError("decode_png: nonstandard compression/filter method")
    if interlace != 0:
        raise ValueError("decode_png: interlaced images unsupported")
    check_dimensions(w, h, "decode_png")
    ch = _COLOR_CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("decode_png: IDAT size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype, line = int(raw[y, 0]), raw[y, 1:].copy()
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up — no intra-row dependency, vector add
            cur = line + prior
        elif ftype in (1, 3, 4):
            # Sub/Average/Paeth recur on the reconstructed left pixel;
            # recur per PIXEL with the ch-byte lanes vectorized
            cur = line
            left = np.zeros(ch, dtype=np.uint8)
            for x in range(0, stride, ch):
                pl = prior[x : x + ch]
                plf = prior[x - ch : x] if x else np.zeros(ch, dtype=np.uint8)
                if ftype == 1:
                    cur[x : x + ch] += left
                elif ftype == 3:
                    cur[x : x + ch] += (
                        (left.astype(np.uint16) + pl.astype(np.uint16)) // 2
                    ).astype(np.uint8)
                else:
                    cur[x : x + ch] += _paeth(left, pl, plf)
                left = cur[x : x + ch]
        else:
            raise ValueError(f"decode_png: bad filter byte {ftype}")
        out[y] = cur
        prior = out[y]
    return out.reshape(h, w, ch)


def png_pixel_stats(
    media: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """BINARY PNG payloads → per-image channel statistics via the real
    decoder (mapInPandas, Arrow-batched — the multimodal stage shape).
    Non-PNG / unsupported payloads yield no row (count the difference
    against ``parse_media_header`` output to audit skips)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "width", "height", "channels",
                "px_mean", "px_std", "px_min", "px_max",
            )}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    arr = decode_png(bytes(payload) if payload is not None else b"")
                except ValueError:
                    continue
                h, w, ch = arr.shape
                out["doc_id"].append(int(did))
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["px_mean"].append(round(float(arr.mean()), 6))
                out["px_std"].append(round(float(arr.std()), 6))
                out["px_min"].append(int(arr.min()))
                out["px_max"].append(int(arr.max()))
            yield pd.DataFrame(out)

    return media.select(
        F.col(id_col).cast("long").alias(id_col), payload_col
    ).mapInPandas(stats, schema=PIXEL_STATS_SCHEMA)
