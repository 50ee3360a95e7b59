"""Real PNG pixel decode/encode on stdlib zlib — no PIL/ffmpeg.

Closes the pixel-level half of the multimodal gap for the one container
whose compression IS in the Python standard library: PNG's IDAT stream
is raw zlib (RFC 1950) and the five scanline filters are pure
arithmetic, so a complete, dependency-free decoder and a matching
encoder fit in this module.

Coverage (the real-world web-PNG shapes):

- color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA) at bit depth
  8 AND 16 (16-bit returns exact uint16 samples — no silent 8-bit
  truncation);
- color type 3 (palette) at bit depths 1/2/4/8, PLTE lookup + optional
  tRNS per-index alpha (output RGB, or RGBA when tRNS is present);
- tRNS color-key transparency on types 0/2 (the matching color becomes
  alpha 0; output gains an alpha channel);
- Adam7 interlacing for every supported combination (each pass is an
  independently filtered sub-image, de-interlaced by strided scatter);
- any IDAT split.

Still refused loudly (ValueError, never approximated): gray at sub-byte
depths 1/2/4 (legal but vanishingly rare on the web vs palette), and
nonstandard compression/filter methods.

Decoder contract: byte-exact reconstruction (the filters are lossless
integer arithmetic) — gated by roundtrip tests through the encoder at
every (filter, color type, depth, interlace) combination and by
dimension agreement with the header parser.

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
#: PNG color type → channel count (non-palette)
_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_CHANNELS_COLOR = {v: k for k, v in _COLOR_CHANNELS.items()}
#: color type → allowed bit depths (spec §11.2.2, minus gray sub-byte)
_ALLOWED_DEPTHS = {0: {8, 16}, 2: {8, 16}, 3: {1, 2, 4, 8}, 4: {8, 16}, 6: {8, 16}}
#: Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)

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


# --- scanline filtering (byte-level; bpp = filter unit in BYTES, ≥1) ---------


def _filter_rows(raw: np.ndarray, bpp: int, filter_type: int) -> bytes:
    """(h, stride) uint8 sample bytes → filtered scanline stream (one
    filter byte + stride filtered bytes per row). Filters operate on
    bytes with the left neighbor ``bpp`` bytes back (spec §9)."""
    h, stride = raw.shape
    prior = np.zeros(stride, dtype=np.uint8)
    lines = []
    for y in range(h):
        cur = raw[y]
        left = np.zeros_like(cur)
        left[bpp:] = cur[:-bpp]
        pleft = np.zeros_like(prior)
        pleft[bpp:] = prior[:-bpp]
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
    return b"".join(lines)


def _unfilter_rows(raw: np.ndarray, bpp: int) -> np.ndarray:
    """(h, stride+1) uint8 filtered rows (leading filter byte) →
    (h, stride) reconstructed sample bytes."""
    h, stride1 = raw.shape
    stride = stride1 - 1
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype, line = int(raw[y, 0]), raw[y, 1:].copy()
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up — no intra-row dependency, vector add
            cur = line + prior
        elif ftype in (1, 3, 4):
            # Sub/Average/Paeth recur on the reconstructed left unit;
            # recur per unit with the bpp-byte lanes vectorized
            cur = line
            left = np.zeros(bpp, dtype=np.uint8)
            for x in range(0, stride, bpp):
                pl = prior[x : x + bpp]
                plf = prior[x - bpp : x] if x else np.zeros(bpp, dtype=np.uint8)
                if ftype == 1:
                    cur[x : x + bpp] += left
                elif ftype == 3:
                    cur[x : x + bpp] += (
                        (left.astype(np.uint16) + pl.astype(np.uint16)) // 2
                    ).astype(np.uint8)
                else:
                    cur[x : x + bpp] += _paeth(left, pl, plf)
                left = cur[x : x + bpp]
        else:
            raise ValueError(f"decode_png: bad filter byte {ftype}")
        out[y] = cur
        prior = out[y]
    return out


# --- sample (un)packing -------------------------------------------------------


def _rows_to_samples(rows: np.ndarray, w: int, ch: int, depth: int) -> np.ndarray:
    """(h, stride) reconstructed bytes → (h, w, ch) samples (uint8 for
    depth ≤ 8 — sub-byte values are palette INDICES, not scaled — uint16
    big-endian combined for depth 16)."""
    h = rows.shape[0]
    if depth == 8:
        return rows.reshape(h, w, ch)
    if depth == 16:
        pairs = rows.reshape(h, w * ch, 2).astype(np.uint16)
        return ((pairs[:, :, 0] << 8) | pairs[:, :, 1]).reshape(h, w, ch)
    # sub-byte (palette indices): MSB-first bit groups of ``depth`` bits
    bits = np.unpackbits(rows, axis=1)
    usable = (bits.shape[1] // depth) * depth
    groups = bits[:, :usable].reshape(h, -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (groups * weights).sum(axis=2).astype(np.uint8)
    return vals[:, :w].reshape(h, w, 1)


def _samples_to_rowbytes(arr: np.ndarray, depth: int) -> np.ndarray:
    """(h, w, ch) samples → (h, stride) scanline bytes for filtering."""
    h, w, ch = arr.shape
    if depth == 8:
        return arr.reshape(h, w * ch).astype(np.uint8)
    if depth == 16:
        a = arr.astype(np.uint16)
        out = np.zeros((h, w * ch, 2), dtype=np.uint8)
        flat = a.reshape(h, w * ch)
        out[:, :, 0] = flat >> 8
        out[:, :, 1] = flat & 0xFF
        return out.reshape(h, w * ch * 2)
    # sub-byte palette indices, MSB-first packing with row padding
    weights = np.arange(depth - 1, -1, -1)
    bits = ((arr.reshape(h, w, 1) >> weights) & 1).reshape(h, w * depth)
    return np.packbits(bits.astype(np.uint8), axis=1)


def _pass_geometry(w: int, h: int) -> list[tuple[int, int, int, int, int, int]]:
    """Adam7 pass list as (x0, y0, dx, dy, w_pass, h_pass), empty passes
    excluded (they contribute zero bytes, not even filter bytes)."""
    out = []
    for x0, y0, dx, dy in _ADAM7:
        wp = (w - x0 + dx - 1) // dx if w > x0 else 0
        hp = (h - y0 + dy - 1) // dy if h > y0 else 0
        if wp > 0 and hp > 0:
            out.append((x0, y0, dx, dy, wp, hp))
    return out


# --- encode -------------------------------------------------------------------


def _emit_png(
    samples: np.ndarray,
    color: int,
    depth: int,
    filter_type: int,
    interlace: bool,
    extra_chunks: list[bytes],
) -> bytes:
    h, w, ch = samples.shape
    bits_pp = depth * ch
    bpp = max(1, bits_pp // 8)
    if interlace:
        stream = b"".join(
            _filter_rows(
                _samples_to_rowbytes(samples[y0::dy, x0::dx], depth), bpp, filter_type
            )
            for x0, y0, dx, dy, _wp, _hp in _pass_geometry(w, h)
        )
    else:
        stream = _filter_rows(_samples_to_rowbytes(samples, depth), bpp, filter_type)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 1 if interlace else 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + b"".join(extra_chunks)
        + _chunk(b"IDAT", zlib.compress(stream))
        + _chunk(b"IEND", b"")
    )


def encode_png(
    arr: np.ndarray, filter_type: int = 0, interlace: bool = False
) -> bytes:
    """(h, w[, ch]) uint8 or uint16 array → PNG bytes (depth 8 / 16).
    ``filter_type`` applies one filter (0..4) to EVERY scanline — the
    encoder's job here is to give the decoder's five unfilter paths a
    spec-true counterpart, not to optimize compression. ``interlace``
    emits Adam7 (each pass filtered independently)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype == np.uint8:
        depth = 8
    elif arr.dtype == np.uint16:
        depth = 16
    else:
        raise ValueError("encode_png: uint8 or uint16 arrays only")
    h, w, ch = arr.shape
    if ch not in _CHANNELS_COLOR:
        raise ValueError(f"encode_png: unsupported channel count {ch}")
    if filter_type not in range(5):
        raise ValueError(f"encode_png: bad filter {filter_type}")
    return _emit_png(arr, _CHANNELS_COLOR[ch], depth, filter_type, interlace, [])


def encode_png_palette(
    indices: np.ndarray,
    palette: np.ndarray,
    trns: np.ndarray | None = None,
    depth: int = 8,
    filter_type: int = 0,
    interlace: bool = False,
) -> bytes:
    """(h, w) uint8 palette indices + (n, 3) uint8 palette → color-type-3
    PNG at bit depth 1/2/4/8, optional tRNS per-index alpha (length ≤ n;
    missing entries are opaque per spec)."""
    if depth not in (1, 2, 4, 8):
        raise ValueError(f"encode_png_palette: bad palette depth {depth}")
    indices = np.asarray(indices, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    if indices.ndim != 2 or palette.ndim != 2 or palette.shape[1] != 3:
        raise ValueError("encode_png_palette: indices (h,w), palette (n,3)")
    n = palette.shape[0]
    if n > (1 << depth) or indices.max(initial=0) >= n:
        raise ValueError("encode_png_palette: index/palette size mismatch")
    chunks = [_chunk(b"PLTE", palette.tobytes())]
    if trns is not None:
        trns = np.asarray(trns, dtype=np.uint8)
        if trns.ndim != 1 or len(trns) > n:
            raise ValueError("encode_png_palette: tRNS longer than palette")
        chunks.append(_chunk(b"tRNS", trns.tobytes()))
    return _emit_png(
        indices[:, :, None], 3, depth, filter_type, interlace, chunks
    )


# --- decode -------------------------------------------------------------------


@corrupt_input_guard
def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, ch) array: uint8 for depth ≤ 8, uint16 for
    16-bit (exact samples, never truncated). Palette images are looked
    up through PLTE (+ tRNS alpha → RGBA); tRNS color keys on types 0/2
    add an alpha channel. Adam7 interlace and any IDAT split supported.
    Raises ValueError on anything else — no silent approximation."""
    if not data or not data.startswith(_PNG_SIG):
        raise ValueError("decode_png: not a PNG")
    pos, ihdr, idat, plte, trns = len(_PNG_SIG), None, [], None, None
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
        elif tag == b"PLTE":
            plte = body
        elif tag == b"tRNS":
            trns = body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("decode_png: missing IHDR/IDAT")
    w, h, depth, color, comp, filt_m, interlace = struct.unpack(">IIBBBBB", ihdr)
    if color not in _ALLOWED_DEPTHS or depth not in _ALLOWED_DEPTHS[color]:
        raise ValueError(
            f"decode_png: unsupported color type {color} at depth {depth}"
        )
    if comp != 0 or filt_m != 0:
        raise ValueError("decode_png: nonstandard compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"decode_png: unknown interlace method {interlace}")
    check_dimensions(w, h, "decode_png")
    ch = 1 if color == 3 else _COLOR_CHANNELS[color]
    bits_pp = depth * ch
    bpp = max(1, bits_pp // 8)
    raw = zlib.decompress(b"".join(idat))

    def stride_of(wp: int) -> int:
        return (wp * bits_pp + 7) // 8

    sample_dtype = np.uint16 if depth == 16 else np.uint8
    if interlace == 0:
        stride = stride_of(w)
        if len(raw) != h * (stride + 1):
            raise ValueError("decode_png: IDAT size mismatch")
        rows = _unfilter_rows(
            np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1), bpp
        )
        samples = _rows_to_samples(rows, w, ch, depth).astype(sample_dtype)
    else:
        passes = _pass_geometry(w, h)
        expected = sum(hp * (stride_of(wp) + 1) for *_xy, wp, hp in passes)
        if len(raw) != expected:
            raise ValueError("decode_png: IDAT size mismatch (interlaced)")
        samples = np.zeros((h, w, ch), dtype=sample_dtype)
        off = 0
        for x0, y0, dx, dy, wp, hp in passes:
            sp = stride_of(wp)
            block = np.frombuffer(
                raw[off : off + hp * (sp + 1)], dtype=np.uint8
            ).reshape(hp, sp + 1)
            off += hp * (sp + 1)
            rows = _unfilter_rows(block, bpp)
            samples[y0::dy, x0::dx] = _rows_to_samples(rows, wp, ch, depth)

    if color == 3:
        if plte is None or len(plte) % 3 != 0 or len(plte) == 0:
            raise ValueError("decode_png: palette image missing/invalid PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = samples[:, :, 0]
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("decode_png: palette index out of range")
        rgb = pal[idx]
        if trns is None:
            return rgb
        alpha_tab = np.full(pal.shape[0], 255, dtype=np.uint8)
        ta = np.frombuffer(trns, dtype=np.uint8)
        if len(ta) > pal.shape[0]:
            raise ValueError("decode_png: tRNS longer than palette")
        alpha_tab[: len(ta)] = ta
        return np.concatenate([rgb, alpha_tab[idx][:, :, None]], axis=2)

    if trns is not None and color in (0, 2):
        # color-key transparency: the matching color becomes alpha 0
        if len(trns) != 2 * ch:
            raise ValueError("decode_png: bad tRNS length for color type")
        key = np.frombuffer(trns, dtype=">u2").astype(sample_dtype)
        opaque = sample_dtype(65535 if depth == 16 else 255)
        mask = np.all(samples == key.reshape(1, 1, ch), axis=2)
        alpha = np.where(mask, sample_dtype(0), opaque).astype(sample_dtype)
        return np.concatenate([samples, alpha[:, :, None]], axis=2)
    return samples


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
