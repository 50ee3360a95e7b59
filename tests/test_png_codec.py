"""Real PNG pixel decode on stdlib zlib: byte-exact roundtrip through
every (filter, channels) combination, loud rejection of unsupported
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

    with pytest.raises(ValueError, match="bit depth"):
        decode_png(mutated(8, 16))  # 16-bit
    with pytest.raises(ValueError, match="color type"):
        decode_png(mutated(9, 3))  # palette
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(mutated(12, 1))  # Adam7
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\xff\xd8\xff\xe0 jpeg-ish")
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"")


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
