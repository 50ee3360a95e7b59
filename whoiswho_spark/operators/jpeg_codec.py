"""Real baseline + progressive JPEG pixel decode in pure numpy.

Scope (rejected loudly otherwise): baseline sequential DCT (SOF0) AND
progressive DCT (SOF2 — spectral selection + successive approximation,
both DC and AC refinement passes, EOB runs), 8-bit, grayscale or YCbCr
with sampling factors 1-2 — 4:4:4 AND the real-world subsampled shapes
4:2:0 / 4:2:2 / 4:4:0 (chroma decimated by block mean on encode,
upsampled by sample replication on decode) — Huffman entropy coding,
with DRI/RSTn restart intervals (T.81 E.1.4/E.2.4: byte-aligned RSTn
markers every n restart units, DC predictors and EOB runs reset, marker
index verified modulo 8). Larger sampling factors, 12-bit, and
arithmetic-coded streams (SOF9-SOF11) are refused with ValueError rather
than approximately decoded — the png_codec/gif_codec honesty rule.

Progressive decoding keeps one quantized-coefficient store per component
(zigzag domain) that successive scans accumulate into: DC first scans
write predicted diffs shifted by Al, DC refinement scans OR in one bit
per block, AC first scans run-length decode a spectral band with EOB-run
skips, and AC refinement scans replay the spec's correction-bit walk
(T.81 G.1.2.3): every nonzero-history coefficient passed consumes a
correction bit, newly significant coefficients insert ±1<<Al. The final
IDCT happens once, after all scans.

Gating strategy (tests/test_jpeg_codec.py): JPEG is lossy, so roundtrip
cannot be byte-gated end-to-end like PNG/GIF. Instead the test computes
the expected pixels INDEPENDENTLY from the mathematical pipeline alone —
level shift → exact DCT-II → quantize(np.round) → dequantize → IDCT →
round/clip, no bitstream — and requires decode(encode(x)) to equal that
EXACTLY. Any defect in the marker framing, Huffman tables, bit packing,
byte stuffing, DC prediction, or zigzag breaks exact equality, while the
shared lossy math cancels out. A PSNR sanity bound against the original
pixels guards the math itself.

Quantization and Huffman tables are the JPEG standard's public Annex K
examples (ITU-T T.81 tables K.1-K.6) — spec constants, reproduced as
data.
"""

from __future__ import annotations

import struct

import numpy as np

from whoiswho_spark.operators.codec_common import (
    check_dimensions,
    corrupt_input_guard,
)

# --- spec constants (ITU-T T.81 Annex K) -------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# (BITS counts per code length 1..16, HUFFVAL symbol list)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis (float64)."""
    C = np.zeros((8, 8))
    for k in range(8):
        a = np.sqrt(0.125) if k == 0 else 0.5
        for n in range(8):
            C[k, n] = a * np.cos((2 * n + 1) * k * np.pi / 16)
    return C

_C = _dct_matrix()


def dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF full-range BT.601 (float64 — rounding happens at the block
    level shift so the test's independent math can mirror exactly)."""
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack([r, g, b], axis=-1)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """BITS/HUFFVAL → {symbol: (code, length)} per T.81 C.2."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    return {(l, c): s for s, (c, l) in _canonical_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = self.n = 0
        return bytes(self.out)

    def restart_marker(self, m: int) -> None:
        """Byte-align (1-padded, stuffed like flush) and emit RSTm —
        the encoder side of a restart-interval boundary (T.81 E.1.4)."""
        self.flush()  # out accumulates; acc/n reset for the next interval
        self.out += bytes([0xFF, 0xD0 + (m & 7)])


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("jpeg: entropy stream exhausted")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                raise ValueError("jpeg: marker inside entropy stream")
            self.pos += 1  # skip the stuffed 0x00
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v

    def restart(self, m: int) -> None:
        """Consume the RSTm marker at a restart boundary (T.81 E.2.4):
        discard any partial-byte bits, skip pad/stuffed bytes up to the
        next marker, and verify its modulo-8 index — a wrong index means
        lost sync, which the spec treats as a corrupt stream."""
        self.acc = 0
        self.n = 0
        d = self.data
        # the encoder's byte-align padding may leave an unread pad byte
        # (possibly a stuffed FF 00) before the marker — skip to it
        while self.pos + 1 < len(d) and not (
            d[self.pos] == 0xFF and d[self.pos + 1] != 0x00
        ):
            self.pos += 1
        while self.pos + 1 < len(d) and d[self.pos + 1] == 0xFF:
            self.pos += 1  # spec-legal FF fill bytes before the marker
        if self.pos + 2 > len(d) or d[self.pos + 1] != 0xD0 + (m & 7):
            raise ValueError("jpeg: missing/out-of-order restart marker")
        self.pos += 2


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude_bits(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def quantize_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(h8, w8) float plane (level-shifted) → (n_blocks_y, n_blocks_x,
    8, 8) int quantized DCT coefficients — the shared lossy math the
    exactness gate recomputes independently."""
    h8, w8 = plane.shape
    by, bx = h8 // 8, w8 // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    out = np.zeros((by, bx, 8, 8), dtype=np.int64)
    for y in range(by):
        for x in range(bx):
            out[y, x] = np.round(dct2(blocks[y, x]) / q).astype(np.int64)
    return out


def _pad_edge(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    h8, w8 = -(-h // 8) * 8, -(-w // 8) * 8
    return np.pad(plane, ((0, h8 - h), (0, w8 - w)), mode="edge")


#: subsampling name → per-component (h, v) factors for (Y, Cb, Cr)
SUBSAMPLING = {
    "444": ((1, 1), (1, 1), (1, 1)),
    "422": ((2, 1), (1, 1), (1, 1)),
    "420": ((2, 2), (1, 1), (1, 1)),
    "440": ((1, 2), (1, 1), (1, 1)),
}


def _mean_downsample(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Block-mean decimation by integer factors (the encoder's chroma
    filter; the decoder's matching upsample is sample replication)."""
    if fy == fx == 1:
        return plane
    h, w = plane.shape
    return plane.reshape(h // fy, fy, w // fx, fx).mean(axis=(1, 3))


def component_planes(arr: np.ndarray, subsampling: str):
    """RGB/gray uint8 → per-component MCU-padded (possibly downsampled)
    float planes + quant tables + (h, v) factors. Shared by encode_jpeg
    and the test's no-bitstream math twin, so the lossy geometry
    (edge padding at full res, THEN block-mean decimation) is identical
    by construction."""
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        full = [arr.astype(np.float64)]
        quants = [QUANT_LUMA]
        hv = ((1, 1),)
    else:
        ycc = rgb_to_ycbcr(arr)
        full = [ycc[..., i] for i in range(3)]
        quants = [QUANT_LUMA, QUANT_CHROMA, QUANT_CHROMA]
        hv = SUBSAMPLING[subsampling]
    hmax = max(f[0] for f in hv)
    vmax = max(f[1] for f in hv)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    pw, ph = -(-w // mcu_w) * mcu_w, -(-h // mcu_h) * mcu_h
    planes = []
    for p, (fh, fv) in zip(full, hv):
        padded = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        planes.append(_mean_downsample(padded, vmax // fv, hmax // fh))
    return planes, quants, hv, hmax, vmax


def encode_jpeg(
    arr: np.ndarray,
    scan_order: tuple | None = None,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 → baseline JPEG.

    ``subsampling``: '444' (default), '422', or '420' — chroma is
    block-mean decimated after full-resolution edge padding.
    ``scan_order`` permutes the SOS component declaration AND the
    interleaved entropy emission in lockstep (spec-legal; the scan
    declaration IS the interleave order). Default natural (Y, Cb, Cr);
    a permuted order exercises the decoder's scan-vs-frame reordering.
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker +
    DC-predictor reset every that many MCUs (T.81 E.1.4)."""
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg: 8-bit arrays only")
    if subsampling not in SUBSAMPLING:
        raise ValueError(f"encode_jpeg: unknown subsampling {subsampling}")
    if not 0 <= restart_interval <= 0xFFFF:
        raise ValueError("encode_jpeg: restart_interval out of range")
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    planes, quants, hv, hmax, vmax = component_planes(arr, subsampling)
    coefs = [quantize_blocks(p - 128.0, q) for p, q in zip(planes, quants)]

    dc_tabs = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_tabs = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        dc_tabs.append(_canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS))
        ac_tabs.append(_canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS))

    order = tuple(scan_order) if scan_order is not None else tuple(range(len(planes)))
    if sorted(order) != list(range(len(planes))):
        raise ValueError("encode_jpeg: scan_order must permute the components")
    bw = _BitWriter()
    mcu_by = coefs[0].shape[0] // hv[0][1]
    mcu_bx = coefs[0].shape[1] // hv[0][0]
    prev_dc = [0] * len(planes)
    rst_m = 0
    for my in range(mcu_by):
        for mx in range(mcu_bx):
            mcu = my * mcu_bx + mx
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.restart_marker(rst_m)
                rst_m = (rst_m + 1) % 8
                prev_dc = [0] * len(planes)
            for ci in order:
                fh, fv = hv[ci]
                for r in range(fv):
                    for c in range(fh):
                        _emit_block(
                            bw,
                            coefs[ci][my * fv + r, mx * fh + c],
                            prev_dc,
                            ci,
                            dc_tabs[0 if ci == 0 else 1],
                            ac_tabs[0 if ci == 0 else 1],
                        )
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFDB, bytes([0]) + bytes(QUANT_LUMA.reshape(64)[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xFFDB, bytes([1]) + bytes(QUANT_CHROMA.reshape(64)[ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        fh, fv = hv[ci]
        sof += bytes([ci + 1, (fh << 4) | fv, 0 if ci == 0 else 1])
    out += seg(0xFFC0, sof)
    for cls, tid, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    )[: 2 * ncomp if not gray else 2]:
        out += seg(0xFFC4, bytes([(cls << 4) | tid] + bits + vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in order:  # SOS lists components in the interleave order
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _emit_block(bw, block, prev_dc, ci, dc_tab, ac_tab) -> None:
    """Huffman-encode one quantized 8×8 block (DC differential per
    component + run-length AC with ZRL/EOB)."""
    zz = block.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - prev_dc[ci]
    prev_dc[ci] = int(zz[0])
    s = _category(diff)
    code, ln = dc_tab[s]
    bw.write(code, ln)
    if s:
        bw.write(_amplitude_bits(diff, s), s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(_amplitude_bits(v, s), s)
        run = 0
    if run:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)



# --- progressive encoding (the decoder's roundtrip twin) ----------------------


def _uniform_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """Canonical Huffman table giving every symbol the same code length
    L = bit_length(len(symbols)) — valid (2^L > n, the all-ones code of
    the max length stays unassigned) and trivially correct; compression
    optimality is not this encoder's job."""
    n = len(symbols)
    ln = max(1, n.bit_length())
    bits = [0] * 16
    bits[ln - 1] = n
    return bits, list(symbols)


#: AC first-scan symbols: (run 0-15, size 1-10), ZRL, EOBn for n 0-14
_AC_FIRST_SYMBOLS = (
    [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [0xF0]
    + [r << 4 for r in range(15)]
)
#: AC refinement symbols: (run 0-15, size 1), ZRL, EOBn for n 0-14
_AC_REFINE_SYMBOLS = (
    [(r << 4) | 1 for r in range(16)] + [0xF0] + [r << 4 for r in range(15)]
)


def _shift_ac(v: int, al: int) -> int:
    """AC point transform: sign-magnitude shift (T.81 G.1.2.2)."""
    return -((-v) >> al) if v < 0 else v >> al


def encode_jpeg_progressive(
    arr: np.ndarray,
    subsampling: str = "444",
    bands: tuple = ((1, 5), (6, 63)),
    al: int = 1,
    restart_interval: int = 0,
) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 → progressive (SOF2) JPEG.

    Scan script (exercises every progressive decode path):
      1. interleaved DC first scan at Al=``al``
      2. per component × per spectral band in ``bands``: AC first scan
         at Al=``al`` (EOB-run coding across blocks)
      3. per approximation level down to 0: DC refinement (raw bits,
         no Huffman) then per component × band AC refinement scans
         (correction-bit walk).

    Same quantized coefficients as ``encode_jpeg`` — so the decode
    roundtrip is gated by the SAME no-bitstream math twin, and
    progressive-vs-baseline decode equality is a free second gate. AC
    scans use purpose-built uniform Huffman tables (incl. EOBn symbols,
    redefined between first and refinement scans via mid-stream DHT).

    ``restart_interval`` > 0 emits a DRI segment and restart boundaries
    in EVERY scan: each interleaved scan restarts every that many MCUs,
    each non-interleaved AC scan every that many blocks (the T.81
    restart unit per scan kind). EOB runs and pending correction bits
    are flushed before each marker — they cannot cross a restart.
    """
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg_progressive: 8-bit arrays only")
    if subsampling not in SUBSAMPLING:
        raise ValueError(f"encode_jpeg_progressive: unknown subsampling {subsampling}")
    if al < 0 or al > 10:
        raise ValueError("encode_jpeg_progressive: al out of range")
    if not 0 <= restart_interval <= 0xFFFF:
        raise ValueError("encode_jpeg_progressive: restart_interval out of range")
    lo, hi = zip(*bands)
    if list(lo) + [64] != [1] + [h + 1 for h in hi]:
        raise ValueError("encode_jpeg_progressive: bands must tile 1..63")
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    planes, quants, hv, hmax, vmax = component_planes(arr, subsampling)
    coefs = [quantize_blocks(p - 128.0, q) for p, q in zip(planes, quants)]
    ncomp = len(planes)
    # zigzag-domain coefficient blocks per component
    zz = [c.reshape(c.shape[0], c.shape[1], 64)[:, :, ZIGZAG] for c in coefs]

    dc_tabs = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    if not gray:
        dc_tabs.append(_canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS))
    first_bits, first_vals = _uniform_table(_AC_FIRST_SYMBOLS)
    refine_bits, refine_vals = _uniform_table(_AC_REFINE_SYMBOLS)
    ac_first = _canonical_codes(first_bits, first_vals)
    ac_refine = _canonical_codes(refine_bits, refine_vals)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB, bytes([0]) + bytes(QUANT_LUMA.reshape(64)[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xFFDB, bytes([1]) + bytes(QUANT_CHROMA.reshape(64)[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        fh, fv = hv[ci]
        sof += bytes([ci + 1, (fh << 4) | fv, 0 if ci == 0 else 1])
    out += seg(0xFFC2, sof)  # SOF2: progressive DCT
    out += seg(0xFFC4, bytes([0x00] + DC_LUMA_BITS + DC_LUMA_VALS))
    if not gray:
        out += seg(0xFFC4, bytes([0x01] + DC_CHROMA_BITS + DC_CHROMA_VALS))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    ri = restart_interval

    def sos_header(comp_ids: list[tuple[int, int, int]], ss: int, se: int,
                   ah: int, al_: int) -> bytes:
        body = bytes([len(comp_ids)])
        for cid, dc_t, ac_t in comp_ids:
            body += bytes([cid, (dc_t << 4) | ac_t])
        body += bytes([ss, se, (ah << 4) | al_])
        return seg(0xFFDA, body)

    mcu_by = zz[0].shape[0] // hv[0][1]
    mcu_bx = zz[0].shape[1] // hv[0][0]

    def interleaved_walk():
        for my in range(mcu_by):
            for mx in range(mcu_bx):
                mcu = my * mcu_bx + mx
                for ci in range(ncomp):
                    fh, fv = hv[ci]
                    for r in range(fv):
                        for c in range(fh):
                            yield mcu, ci, my * fv + r, mx * fh + c

    def comp_blocks(ci: int):
        """Non-interleaved grid: ceil(comp_dim/8), NOT MCU-padded."""
        fh, fv = hv[ci]
        nbx = (-(-(w * fh) // hmax) + 7) // 8
        nby = (-(-(h * fv) // vmax) + 7) // 8
        for by in range(nby):
            for bx in range(nbx):
                yield by, bx

    # scan 1: DC first, interleaved, Al=al (DC point transform is the
    # ARITHMETIC shift — T.81 G.1.2.1)
    out += sos_header(
        [(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(ncomp)], 0, 0, 0, al
    )
    bw = _BitWriter()
    prev = [0] * ncomp
    next_rst, rst_m = (ri, 0) if ri else (-1, 0)
    for mcu, ci, by, bx in interleaved_walk():
        if mcu == next_rst:
            bw.restart_marker(rst_m)
            rst_m = (rst_m + 1) % 8
            prev = [0] * ncomp
            next_rst += ri
        val = int(zz[ci][by, bx, 0]) >> al
        diff = val - prev[ci]
        prev[ci] = val
        s = _category(diff)
        code, ln = dc_tabs[0 if ci == 0 else 1][s]
        bw.write(code, ln)
        if s:
            bw.write(_amplitude_bits(diff, s), s)
    out += bw.flush()

    # AC first scans (single-component, per band), table tid 0
    out += seg(0xFFC4, bytes([0x10] + first_bits + first_vals))
    for ci in range(ncomp):
        for ss, se in bands:
            out += sos_header([(ci + 1, 0, 0)], ss, se, 0, al)
            bw = _BitWriter()
            eobrun = 0

            def emit_eobrun():
                nonlocal eobrun
                if eobrun:
                    n = eobrun.bit_length() - 1
                    code, ln = ac_first[n << 4]
                    bw.write(code, ln)
                    if n:
                        bw.write(eobrun - (1 << n), n)
                    eobrun = 0

            next_rst, rst_m = (ri, 0) if ri else (-1, 0)
            for blk, (by, bx) in enumerate(comp_blocks(ci)):
                if blk == next_rst:
                    emit_eobrun()  # EOB runs cannot cross a restart
                    bw.restart_marker(rst_m)
                    rst_m = (rst_m + 1) % 8
                    next_rst += ri
                vals = [_shift_ac(int(zz[ci][by, bx, k]), al) for k in range(ss, se + 1)]
                if not any(vals):
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        emit_eobrun()
                    continue
                emit_eobrun()
                run = 0
                for v in vals:
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_first[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = ac_first[(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(_amplitude_bits(v, s), s)
                    run = 0
                if run:
                    eobrun = 1  # trailing zeros: pending EOB, may merge on
            emit_eobrun()
            out += bw.flush()

    # refinement levels: a = al-1 .. 0, each Ah = a+1, Al = a
    redefined = False
    for a in range(al - 1, -1, -1):
        # DC refinement: interleaved, one raw bit per block, NO Huffman
        out += sos_header(
            [(ci + 1, 0, 0) for ci in range(ncomp)], 0, 0, a + 1, a
        )
        bw = _BitWriter()
        next_rst, rst_m = (ri, 0) if ri else (-1, 0)
        for mcu, ci, by, bx in interleaved_walk():
            if mcu == next_rst:
                bw.restart_marker(rst_m)  # resync only: raw bits, no state
                rst_m = (rst_m + 1) % 8
                next_rst += ri
            # DC point transform is the ARITHMETIC shift: the refinement
            # bit is the two's-complement bit, not the magnitude bit
            bw.write((int(zz[ci][by, bx, 0]) >> a) & 1, 1)
        out += bw.flush()
        if not redefined:
            # redefine AC tid 0 mid-stream for the refinement scans
            out += seg(0xFFC4, bytes([0x10] + refine_bits + refine_vals))
            redefined = True
        for ci in range(ncomp):
            for ss, se in bands:
                out += sos_header([(ci + 1, 0, 0)], ss, se, a + 1, a)
                bw = _BitWriter()
                eobrun = 0
                pending: list[int] = []  # correction bits queued in the EOB run

                def emit_eobrun_r():
                    nonlocal eobrun, pending
                    if eobrun:
                        n = eobrun.bit_length() - 1
                        code, ln = ac_refine[n << 4]
                        bw.write(code, ln)
                        if n:
                            bw.write(eobrun - (1 << n), n)
                        eobrun = 0
                    for b in pending:
                        bw.write(b, 1)
                    pending = []

                next_rst, rst_m = (ri, 0) if ri else (-1, 0)
                for blk, (by, bx) in enumerate(comp_blocks(ci)):
                    if blk == next_rst:
                        emit_eobrun_r()  # flush EOB run + pending bits
                        bw.restart_marker(rst_m)
                        rst_m = (rst_m + 1) % 8
                        next_rst += ri
                    temps = [abs(int(zz[ci][by, bx, k])) >> a for k in range(ss, se + 1)]
                    signs = [int(zz[ci][by, bx, k]) > 0 for k in range(ss, se + 1)]
                    eob = -1  # index (in band) of last newly-significant coef
                    for i, t in enumerate(temps):
                        if t == 1:
                            eob = i
                    run = 0
                    br_bits: list[int] = []
                    for i, t in enumerate(temps):
                        if t == 0:
                            run += 1
                            continue
                        while run > 15 and i <= eob:
                            emit_eobrun_r()
                            code, ln = ac_refine[0xF0]
                            bw.write(code, ln)
                            run -= 16
                            for b in br_bits:
                                bw.write(b, 1)
                            br_bits = []
                        if t > 1:
                            br_bits.append(t & 1)
                            continue
                        emit_eobrun_r()
                        code, ln = ac_refine[(run << 4) | 1]
                        bw.write(code, ln)
                        bw.write(1 if signs[i] else 0, 1)
                        for b in br_bits:
                            bw.write(b, 1)
                        br_bits = []
                        run = 0
                    if run > 0 or br_bits:
                        eobrun += 1
                        pending.extend(br_bits)
                        if eobrun == 0x7FFF:
                            emit_eobrun_r()
                emit_eobrun_r()
                out += bw.flush()

    out += b"\xff\xd9"
    return bytes(out)


# --- decode -------------------------------------------------------------------


def _entropy_end(data: bytes, start: int) -> int:
    """First position ≥ start holding a real marker (0xFF followed by
    anything but 0x00 stuffing, RSTn, or another 0xFF fill byte) — the
    end of a scan's entropy-coded segment."""
    i, n = start, len(data)
    while i + 1 < n:
        if data[i] == 0xFF:
            nxt = data[i + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                i += 2
                continue
            if nxt == 0xFF:
                i += 1
                continue
            return i
        i += 1
    return n


@corrupt_input_guard
def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline (SOF0) or progressive (SOF2) JPEG bytes → (h, w, ch)
    uint8 (ch = 1 or 3, RGB). Sampling factors 1 and 2 are supported
    (4:4:4, 4:2:2, 4:2:0, 4:4:0; chroma upsampled by sample
    replication), as are DRI/RSTn restart intervals (predictor + EOB-run
    reset, marker index checked). Raises ValueError for other SOF types
    (incl. arithmetic-coded SOF9-SOF11), larger sampling factors,
    12-bit, or out-of-sync restart markers."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: not a JPEG")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    progressive = False
    coef: list[np.ndarray] | None = None  # per-comp (by, bx, 64) zigzag
    geom = None
    scans_seen = 0
    restart_interval = 0  # MCUs between RSTn markers (0 = disabled)

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg: bad marker alignment")
        # spec-legal 0xFF fill bytes may pad before any marker (T.81
        # B.1.1.2) — skip them rather than misparse as length segments
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(data):
            break
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2  # TEM / RSTn are standalone: no length segment
            continue
        if pos + 4 > len(data):
            raise ValueError("jpeg: truncated marker segment")
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + length]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                quant[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                (huff_dc if cls == 0 else huff_ac)[tid] = _decode_table(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC2):
            progressive = marker == 0xC2
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = body[6 + ci * 3 : 9 + ci * 3]
                fh, fv = samp >> 4, samp & 0x0F
                if not (1 <= fh <= 2 and 1 <= fv <= 2):
                    raise ValueError(
                        f"jpeg: sampling factors {fh}x{fv} unsupported "
                        "(1 and 2 only)"
                    )
                comps.append((cid, tq, fh, fv))
            check_dimensions(w, h, "decode_jpeg")
            frame = (h, w, comps)
            hmax = max(c[2] for c in comps)
            vmax = max(c[3] for c in comps)
            mcu_by = -(-h // (8 * vmax))
            mcu_bx = -(-w // (8 * hmax))
            coef = [
                np.zeros((mcu_by * fv, mcu_bx * fh, 64), dtype=np.int32)
                for _cid, _tq, fh, fv in comps
            ]
            # non-interleaved block grids: ceil(comp_dim/8), NOT padded
            nb = [
                ((-(-(h * fv) // vmax) + 7) // 8, (-(-(w * fh) // hmax) + 7) // 8)
                for _cid, _tq, fh, fv in comps
            ]
            geom = (hmax, vmax, mcu_by, mcu_bx, nb)
        elif marker in (0xC9, 0xCA, 0xCB):
            raise ValueError("jpeg: arithmetic coding unsupported")
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC8):
            raise ValueError("jpeg: only baseline SOF0 / progressive SOF2 supported")
        elif marker == 0xDD:
            if len(body) < 2:
                raise ValueError("jpeg: truncated DRI segment")
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            if frame is None or coef is None:
                raise ValueError("jpeg: SOS before SOF")
            h, w, comps = frame
            hmax, vmax, mcu_by, mcu_bx, nb = geom
            ns = body[0]
            scan = [(body[1 + i * 2], body[2 + i * 2]) for i in range(ns)]
            ss, se = body[1 + ns * 2], body[2 + ns * 2]
            ah, al = body[3 + ns * 2] >> 4, body[3 + ns * 2] & 0x0F
            frame_idx = {cid: i for i, (cid, _tq, _fh, _fv) in enumerate(comps)}
            order = []
            for sid, tabs in scan:
                if sid not in frame_idx:
                    raise ValueError(f"jpeg: scan references unknown component {sid}")
                order.append((frame_idx[sid], tabs >> 4, tabs & 0x0F))
            entropy_start = pos + 2 + length
            end = _entropy_end(data, entropy_start)
            br = _BitReader(data[entropy_start:end])
            _decode_scan(
                br, coef, comps, order, ss, se, ah, al, progressive,
                huff_dc, huff_ac, mcu_by, mcu_bx, nb, restart_interval,
            )
            scans_seen += 1
            pos = end
            continue
        pos += 2 + length

    if frame is None or coef is None or scans_seen == 0:
        raise ValueError("jpeg: missing SOF/SOS")
    h, w, comps = frame
    hmax, vmax, mcu_by, mcu_bx, nb = geom
    # dequantize + IDCT once, after all scans (per block, bit-exact with
    # the single-scan baseline path and the no-bitstream math twin)
    planes = []
    for ci, (_cid, tq, fh, fv) in enumerate(comps):
        if tq not in quant:
            raise ValueError("jpeg: missing quantization table")
        q = quant[tq]
        by_t, bx_t = coef[ci].shape[:2]
        plane = np.zeros((by_t * 8, bx_t * 8))
        for by in range(by_t):
            for bx in range(bx_t):
                c64 = np.zeros(64, dtype=np.int64)
                c64[ZIGZAG] = coef[ci][by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    idct2(c64.reshape(8, 8) * q) + 128.0
                )
        planes.append(plane)
    full = []
    for p, (_cid, _tq, fh, fv) in zip(planes, comps):
        if fv < vmax:
            p = np.repeat(p, vmax // fv, axis=0)
        if fh < hmax:
            p = np.repeat(p, hmax // fh, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[:, :, None]
    rgb = ycbcr_to_rgb(np.stack(full, axis=-1))
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _read_symbol(br: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _decode_scan(
    br, coef, comps, order, ss, se, ah, al, progressive,
    huff_dc, huff_ac, mcu_by, mcu_bx, nb, ri=0,
) -> None:
    """Decode one scan's entropy data into the coefficient stores.
    ``order`` = [(frame component index, dc table id, ac table id)] in
    SCAN order (the interleave order for multi-component scans).
    ``ri`` = restart interval in MCUs (0 = none); at each boundary the
    reader byte-aligns over the RSTn marker and DC predictors / EOB
    runs reset (T.81 E.2.4) — in a non-interleaved scan the restart
    unit is one block."""

    # walks yield (mcu_no, ...) so restart boundaries are visible; the
    # restart triggers on the FIRST block of each boundary MCU
    def interleaved_walk():
        for my in range(mcu_by):
            for mx in range(mcu_bx):
                mcu = my * mcu_bx + mx
                for ci, dc_t, ac_t in order:
                    _cid, _tq, fh, fv = comps[ci]
                    for r in range(fv):
                        for c in range(fh):
                            yield mcu, ci, my * fv + r, mx * fh + c, dc_t, ac_t

    def single_walk():
        ci, dc_t, ac_t = order[0]
        nby, nbx = nb[ci]
        for by in range(nby):
            for bx in range(nbx):
                yield by * nbx + bx, ci, by, bx, dc_t, ac_t

    walk = interleaved_walk if len(order) > 1 else single_walk

    if not progressive:
        if (ss, se, ah, al) != (0, 63, 0, 0):
            raise ValueError("jpeg: baseline scan must cover 0..63 at Ah=Al=0")
        prev = [0] * len(comps)
        next_rst, rst_m = (ri, 0) if ri else (-1, 0)
        for mcu, ci, by, bx, dc_t, ac_t in walk():
            if mcu == next_rst:
                br.restart(rst_m)
                rst_m = (rst_m + 1) % 8
                prev = [0] * len(comps)
                next_rst += ri
            zz = coef[ci][by, bx]
            s = _read_symbol(br, huff_dc[dc_t])
            diff = _extend(br.bits(s), s) if s else 0
            prev[ci] += diff
            zz[0] = prev[ci]
            k = 1
            while k < 64:
                sym = _read_symbol(br, huff_ac[ac_t])
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, s = sym >> 4, sym & 0x0F
                k += run
                if k > 63:
                    raise ValueError("jpeg: AC run past block end")
                zz[k] = _extend(br.bits(s), s)
                k += 1
        return

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("jpeg: progressive DC scan must have Se=0")
        if ah == 0:  # first pass: predicted diffs at approximation Al
            prev = [0] * len(comps)
            next_rst, rst_m = (ri, 0) if ri else (-1, 0)
            for mcu, ci, by, bx, dc_t, _ac_t in walk():
                if mcu == next_rst:
                    br.restart(rst_m)
                    rst_m = (rst_m + 1) % 8
                    prev = [0] * len(comps)
                    next_rst += ri
                s = _read_symbol(br, huff_dc[dc_t])
                diff = _extend(br.bits(s), s) if s else 0
                prev[ci] += diff
                coef[ci][by, bx, 0] = prev[ci] << al
        else:  # refinement: one raw bit per block, ORed in at Al
            bit = 1 << al
            next_rst, rst_m = (ri, 0) if ri else (-1, 0)
            for mcu, ci, by, bx, _dc_t, _ac_t in walk():
                if mcu == next_rst:
                    br.restart(rst_m)  # resync only: no DC predictors here
                    rst_m = (rst_m + 1) % 8
                    next_rst += ri
                if br.bit():
                    coef[ci][by, bx, 0] |= bit
        return

    # AC scans are single-component by spec
    if len(order) != 1:
        raise ValueError("jpeg: progressive AC scan must be single-component")
    if se > 63 or ss > se:
        raise ValueError("jpeg: bad spectral band")
    ci, _dc_t, ac_t = order[0]
    nby, nbx = nb[ci]
    eobrun = 0
    next_rst, rst_m = (ri, 0) if ri else (-1, 0)
    if ah == 0:  # AC first pass over the band
        for by in range(nby):
            for bx in range(nbx):
                if by * nbx + bx == next_rst:
                    br.restart(rst_m)
                    rst_m = (rst_m + 1) % 8
                    eobrun = 0  # EOB runs cannot cross a restart
                    next_rst += ri
                if eobrun:
                    eobrun -= 1
                    continue
                zz = coef[ci][by, bx]
                k = ss
                while k <= se:
                    sym = _read_symbol(br, huff_ac[ac_t])
                    run, s = sym >> 4, sym & 0x0F
                    if s == 0:
                        if run == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << run) - 1
                        if run:
                            eobrun += br.bits(run)
                        break
                    k += run
                    if k > se:
                        raise ValueError("jpeg: AC run past band end")
                    zz[k] = _extend(br.bits(s), s) << al
                    k += 1
        return

    # AC refinement (T.81 G.1.2.3): correction-bit walk
    p1, m1 = 1 << al, -(1 << al)

    def correct(zz, k) -> None:
        if br.bit() and (int(zz[k]) & p1) == 0:
            zz[k] += p1 if zz[k] > 0 else m1

    for by in range(nby):
        for bx in range(nbx):
            if by * nbx + bx == next_rst:
                br.restart(rst_m)
                rst_m = (rst_m + 1) % 8
                eobrun = 0  # EOB runs cannot cross a restart
                next_rst += ri
            zz = coef[ci][by, bx]
            k = ss
            if eobrun == 0:
                while k <= se:
                    sym = _read_symbol(br, huff_ac[ac_t])
                    run, s = sym >> 4, sym & 0x0F
                    newval = 0
                    if s == 0:
                        if run < 15:  # EOBn: run of end-of-bands
                            # INCLUDES the current block (its remaining
                            # correction bits are read below) — unlike
                            # the first pass, where break consumes it
                            eobrun = 1 << run
                            if run:
                                eobrun += br.bits(run)
                            break
                        # run == 15: ZRL — skip 16 zero-history coefs
                    else:
                        if s != 1:
                            raise ValueError("jpeg: bad refinement magnitude")
                        newval = p1 if br.bit() else m1
                    while k <= se:
                        if zz[k] != 0:
                            correct(zz, k)
                        else:
                            if run == 0:
                                if newval:
                                    zz[k] = newval
                                k += 1
                                break
                            run -= 1
                        k += 1
            if eobrun > 0:
                # blocks inside the EOB run still refine their nonzero
                # history coefficients (one correction bit each)
                while k <= se:
                    if zz[k] != 0:
                        correct(zz, k)
                    k += 1
                eobrun -= 1
