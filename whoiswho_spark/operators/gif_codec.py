"""Real GIF pixel decode in pure Python — LZW is an algorithm, not a
library dependency.

Companion to png_codec.py: decodes the FIRST frame of an 87a/89a GIF —
header + logical screen descriptor, global/local color table, optional
extension blocks, LSB-first variable-width LZW code stream across
sub-blocks (clear/end codes, KwKwK case, deferred-clear full table),
Adam-free GIF interlace reordering — to an (h, w, 3) uint8 RGB array.
The matching encoder (palette + index array → GIF bytes, real LZW with
table growth and resets, optional interlace) exists to give the decoder
a spec-true roundtrip gate, mirroring the PNG module's discipline.
Animation (later frames), transparency compositing, and disposal
methods are out of scope and documented, not guessed: the decoder
returns frame 1's pixels.

(jpeg_codec.py has since joined the family with its own math-twin
gating discipline — every container now decodes for real.)
"""

from __future__ import annotations

import struct

import numpy as np

from whoiswho_spark.operators.codec_common import (
    check_dimensions,
    corrupt_input_guard,
)

_MAX_CODE_WIDTH = 12


# --- LZW ---------------------------------------------------------------------


def _lzw_decode(mcs: int, data: bytes, n_expected: int) -> bytes:
    """GIF-flavor LZW: LSB-first codes, width mcs+1..12, clear resets,
    deferred clear when the table is full. Stops at the end code or when
    ``n_expected`` indices are produced."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    table: list[bytes] = []

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
        width = mcs + 1
        prev = None

    width, prev = mcs + 1, None
    reset()
    out = bytearray()
    acc = n_bits = 0
    for byte in data:
        acc |= byte << n_bits
        n_bits += 8
        while n_bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            n_bits -= width
            if code == clear:
                reset()
                continue
            if code == end:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("gif: first code not a literal")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < (1 << _MAX_CODE_WIDTH):
                    table.append(prev + entry[:1])
            elif code == len(table) and len(table) < (1 << _MAX_CODE_WIDTH):
                entry = prev + prev[:1]  # the KwKwK case
                table.append(entry)
            else:
                raise ValueError("gif: corrupt LZW code")
            out += entry
            prev = entry
            if (
                len(table) == (1 << width)
                and width < _MAX_CODE_WIDTH
            ):
                width += 1
            if len(out) >= n_expected:
                return bytes(out)
    return bytes(out)


def _lzw_encode(mcs: int, indices: bytes) -> bytes:
    """The encoder mirror: emits a leading clear code, grows widths in
    lockstep with the decoder, resets when the table fills."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = n_bits = 0

    def emit(code: int, width: int):
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    def fresh():
        return (
            {bytes([i]): i for i in range(1 << mcs)},
            clear + 2,
            mcs + 1,
        )

    table, next_code, width = fresh()
    emit(clear, width)
    prefix = b""
    for b in indices:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        if next_code < (1 << _MAX_CODE_WIDTH):
            table[cand] = next_code
            next_code += 1
            # decoder widens when ITS table length hits 1<<width; its
            # table trails the encoder's by the entry it builds from the
            # code we just emitted, so widen at the same boundary
            if next_code == (1 << width) + 1 and width < _MAX_CODE_WIDTH:
                width += 1
        else:
            emit(clear, width)
            table, next_code, width = fresh()
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], width)
    emit(end, width)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


# --- container ---------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


def encode_gif(
    indices: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """(h, w) uint8 index array + (n≤256, 3) uint8 palette → GIF89a
    bytes (global color table, single frame, real LZW)."""
    h, w = indices.shape
    n = len(palette)
    if n < 2 or n > 256:
        raise ValueError("encode_gif: palette size must be 2..256")
    if int(indices.max(initial=0)) >= n:
        raise ValueError("encode_gif: index outside palette")
    gct_bits = max(1, int(np.ceil(np.log2(n))))
    gct = np.zeros((1 << gct_bits, 3), dtype=np.uint8)
    gct[:n] = palette
    mcs = max(2, gct_bits)
    rows = indices[_interlace_order(h)] if interlace else indices
    lzw = _lzw_encode(mcs, rows.astype(np.uint8).tobytes())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (gct_bits - 1), 0, 0)
    out += gct.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    out.append(mcs)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


@corrupt_input_guard
def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → FIRST frame as (h, w, 3) uint8 RGB. Raises ValueError
    on malformed streams; skips extension blocks; honors a local color
    table and interlacing. Transparency/animation intentionally ignored
    (frame 1 pixels only — see module docstring)."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("decode_gif: not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + size * 3], dtype=np.uint8).reshape(
            size, 3
        )
        pos += size * 3
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x3B:  # trailer before any image
            raise ValueError("decode_gif: no image data")
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"decode_gif: unexpected block 0x{b0:02x}")
        _x, _y, w, h, iflags = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
        check_dimensions(w, h, "decode_gif")
        pos += 10
        table = gct
        if iflags & 0x80:
            size = 2 << (iflags & 0x07)
            table = np.frombuffer(
                data[pos : pos + size * 3], dtype=np.uint8
            ).reshape(size, 3)
            pos += size * 3
        if table is None:
            raise ValueError("decode_gif: no color table")
        mcs = data[pos]
        pos += 1
        if not 2 <= mcs <= 8:
            raise ValueError(f"decode_gif: bad LZW min code size {mcs}")
        stream = bytearray()
        while True:
            blen = data[pos]
            pos += 1
            if blen == 0:
                break
            stream += data[pos : pos + blen]
            pos += blen
        idx = np.frombuffer(
            _lzw_decode(mcs, bytes(stream), w * h), dtype=np.uint8
        )
        if len(idx) < w * h:
            raise ValueError("decode_gif: short pixel stream")
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("decode_gif: index outside color table")
        rows = idx[: w * h].reshape(h, w)
        if iflags & 0x40:
            out_rows = np.zeros_like(rows)
            out_rows[_interlace_order(h)] = rows
            rows = out_rows
        return table[rows]
    raise ValueError("decode_gif: truncated stream")
