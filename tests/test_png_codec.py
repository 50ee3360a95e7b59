"""Real PNG pixel decode on stdlib zlib: byte-exact roundtrip through
every (filter, color type, depth, interlace) combination — including
palette (PLTE+tRNS), 16-bit, and Adam7 — loud rejection of unsupported
shapes, dimension agreement with the header parser, and the Spark
pixel-stats stage against numpy."""

import struct
import zlib

import numpy as np
import pytest

from whoiswho_spark.operators.png_codec import (
    _chunk,
    _PNG_SIG,
    decode_png,
    encode_png,
    encode_png_palette,
)


def _rand(h, w, ch, seed):
    rs = np.random.RandomState(seed)
    a = rs.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    return a[:, :, 0] if ch == 1 else a


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_roundtrip_exact_all_filters_and_channels(ch, ftype):
    arr = _rand(13, 17, ch, seed=ch * 10 + ftype)
    got = decode_png(encode_png(arr, filter_type=ftype))
    want = arr[:, :, None] if arr.ndim == 2 else arr
    assert got.dtype == np.uint8 and got.shape == want.shape
    assert np.array_equal(got, want)


def test_roundtrip_edge_geometries():
    for h, w in ((1, 1), (1, 64), (64, 1), (2, 3)):
        arr = _rand(h, w, 3, seed=h * 100 + w)
        assert np.array_equal(decode_png(encode_png(arr, 4)), arr)


def test_multi_idat_split_decodes():
    """IDAT may be split across chunks at ANY byte boundary."""
    arr = _rand(9, 11, 3, seed=7)
    png = encode_png(arr, filter_type=2)
    # rebuild with the zlib stream split into 5-byte IDATs
    body = zlib.compress(
        b"".join(
            bytes([2]) + (arr[y] - (arr[y - 1] if y else np.zeros_like(arr[y]))).tobytes()
            for y in range(9)
        )
    )
    ihdr_chunk = png[len(_PNG_SIG) : len(_PNG_SIG) + 12 + 13]
    rebuilt = _PNG_SIG + ihdr_chunk
    for i in range(0, len(body), 5):
        rebuilt += _chunk(b"IDAT", body[i : i + 5])
    rebuilt += _chunk(b"IEND", b"")
    assert np.array_equal(decode_png(rebuilt), arr)


def test_unsupported_shapes_raise_loudly():
    arr = _rand(4, 4, 3, seed=1)
    png = bytearray(encode_png(arr))
    ihdr_off = len(_PNG_SIG) + 8

    def mutated(field_off, value):
        m = bytearray(png)
        m[ihdr_off + field_off] = value
        body = bytes(m[ihdr_off : ihdr_off + 13])
        crc = struct.pack(">I", zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF)
        m[ihdr_off + 13 : ihdr_off + 17] = crc
        return bytes(m)

    with pytest.raises(ValueError, match="depth"):
        decode_png(mutated(8, 4))  # sub-byte depth on RGB: spec-illegal
    with pytest.raises(ValueError, match="color type"):
        decode_png(mutated(9, 5))  # invalid color type
    with pytest.raises(ValueError, match="interlace"):
        decode_png(mutated(12, 2))  # unknown interlace method
    with pytest.raises(ValueError, match="compression"):
        decode_png(mutated(10, 1))  # nonstandard compression method
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\xff\xd8\xff\xe0 jpeg-ish")
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"")
    # gray sub-byte stays refused (palette sub-byte is supported)
    gray = encode_png(_rand(4, 4, 1, seed=2))
    g = bytearray(gray)
    g[ihdr_off + 8] = 2  # depth 2, color 0
    body = bytes(g[ihdr_off : ihdr_off + 13])
    g[ihdr_off + 13 : ihdr_off + 17] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="depth"):
        decode_png(bytes(g))
    # palette image without PLTE
    pal_png = encode_png_palette(
        np.zeros((2, 2), dtype=np.uint8), np.zeros((1, 3), dtype=np.uint8)
    )
    stripped = bytearray()
    pos = len(_PNG_SIG)
    stripped += pal_png[:pos]
    while pos + 8 <= len(pal_png):
        (ln,) = struct.unpack(">I", pal_png[pos : pos + 4])
        tag = pal_png[pos + 4 : pos + 8]
        if tag != b"PLTE":
            stripped += pal_png[pos : pos + 12 + ln]
        pos += 12 + ln
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(bytes(stripped))


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_roundtrip_interlaced_all_filters(ftype, interlace):
    """Adam7: every pass is an independently filtered sub-image; the
    de-interlaced scatter must be byte-exact for every filter."""
    for ch in (1, 3, 4):
        arr = _rand(13, 17, ch, seed=ch + ftype)
        want = arr[:, :, None] if arr.ndim == 2 else arr
        got = decode_png(encode_png(arr, filter_type=ftype, interlace=interlace))
        assert np.array_equal(got, want), (ch, ftype, interlace)


def test_roundtrip_interlaced_edge_geometries():
    """Adam7 passes vanish entirely for tiny images (a 1x1 image has
    only pass 1) — empty passes contribute zero bytes, not filter bytes."""
    for h, w in ((1, 1), (1, 8), (8, 1), (2, 3), (7, 7), (9, 5)):
        arr = _rand(h, w, 3, seed=h * 31 + w)
        assert np.array_equal(
            decode_png(encode_png(arr, 4, interlace=True)), arr
        ), (h, w)


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_roundtrip_16bit_exact(ch):
    """16-bit samples decode to exact uint16 — never truncated to 8."""
    rs = np.random.RandomState(60 + ch)
    arr = rs.randint(0, 65536, size=(9, 11, ch), dtype=np.uint16)
    for interlace in (False, True):
        got = decode_png(encode_png(arr, filter_type=4, interlace=interlace))
        assert got.dtype == np.uint16
        assert np.array_equal(got, arr)


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_roundtrip_palette_all_depths(depth):
    """Color type 3 at every legal bit depth: PLTE lookup (→ RGB) and
    tRNS per-index alpha (→ RGBA, absent entries opaque per spec)."""
    rs = np.random.RandomState(70 + depth)
    n = 1 << depth
    pal = rs.randint(0, 256, size=(n, 3), dtype=np.uint8)
    idx = rs.randint(0, n, size=(10, 23), dtype=np.uint8)
    for interlace in (False, True):
        got = decode_png(encode_png_palette(idx, pal, depth=depth, interlace=interlace))
        assert np.array_equal(got, pal[idx]), (depth, interlace)
        trns = rs.randint(0, 256, size=max(1, n // 2), dtype=np.uint8)
        got2 = decode_png(
            encode_png_palette(idx, pal, trns=trns, depth=depth, interlace=interlace)
        )
        alpha_tab = np.full(n, 255, dtype=np.uint8)
        alpha_tab[: len(trns)] = trns
        want = np.concatenate([pal[idx], alpha_tab[idx][:, :, None]], axis=2)
        assert np.array_equal(got2, want), (depth, interlace)


def test_color_key_trns_adds_alpha():
    """tRNS on color types 0/2 marks ONE color fully transparent; the
    decoder surfaces that as an alpha channel instead of dropping it."""

    def manual(samples, color, depth, trns):
        from whoiswho_spark.operators.png_codec import (
            _filter_rows,
            _samples_to_rowbytes,
        )

        h, w, ch = samples.shape
        stream = _filter_rows(
            _samples_to_rowbytes(samples, depth), max(1, depth * ch // 8), 0
        )
        ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
        return (
            _PNG_SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"tRNS", trns)
            + _chunk(b"IDAT", zlib.compress(stream))
            + _chunk(b"IEND", b"")
        )

    g = np.array([[10, 20], [10, 30]], dtype=np.uint8)[:, :, None]
    got = decode_png(manual(g, 0, 8, struct.pack(">H", 10)))
    assert got.shape == (2, 2, 2)
    assert list(got[:, :, 1].ravel()) == [0, 255, 0, 255]

    rgb = np.zeros((2, 2, 3), dtype=np.uint16)
    rgb[0, 0] = (1000, 2000, 3000)
    got = decode_png(manual(rgb, 2, 16, struct.pack(">HHH", 1000, 2000, 3000)))
    assert got.shape == (2, 2, 4)
    assert got[0, 0, 3] == 0 and got[1, 1, 3] == 65535


def test_dimensions_agree_with_header_parser():
    from whoiswho_spark.operators.multimodal import parse_media_header

    arr = _rand(21, 34, 4, seed=3)
    png = encode_png(arr, filter_type=1)
    meta = parse_media_header(png)
    assert (meta["width"], meta["height"]) == (34, 21)
    assert meta["media_type"] == "image/png"
    assert decode_png(png).shape == (21, 34, 4)


def test_png_pixel_stats_matches_numpy(spark):
    """The Spark stage decodes REAL pixels: stats equal numpy's over the
    source arrays; non-PNG payloads are skipped, not guessed."""
    from whoiswho_spark.operators.png_codec import png_pixel_stats

    arrs = {i: _rand(6 + i, 9 + i, (i % 4) + 1, seed=40 + i) for i in range(6)}
    rows = [
        (i, bytearray(encode_png(a, filter_type=i % 5))) for i, a in arrs.items()
    ]
    rows.append((99, bytearray(b"GIF89a not a png")))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in png_pixel_stats(df).collect()}
    assert set(got) == set(arrs)  # the GIF row skipped
    for i, a in arrs.items():
        full = a[:, :, None] if a.ndim == 2 else a
        r = got[i]
        assert (r["height"], r["width"], r["channels"]) == full.shape
        assert r["px_mean"] == round(float(full.mean()), 6)
        assert r["px_std"] == round(float(full.std()), 6)
        assert (r["px_min"], r["px_max"]) == (int(full.min()), int(full.max()))
