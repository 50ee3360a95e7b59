"""Real GIF pixel decode (pure-Python LZW): exact roundtrip through the
spec-true encoder across palette sizes / interlace / table-reset
regimes, loud rejection of malformed streams, and the dispatching
image_pixel_stats stage over mixed PNG/GIF/JPEG payloads."""

import numpy as np
import pytest

from whoiswho_spark.operators.gif_codec import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def _palette(n, seed):
    return np.random.RandomState(seed).randint(0, 256, size=(n, 3), dtype=np.uint8)


@pytest.mark.parametrize("n_colors", [2, 5, 16, 200, 256])
def test_roundtrip_exact_palette_sizes(n_colors):
    rs = np.random.RandomState(n_colors)
    pal = _palette(n_colors, seed=n_colors + 1)
    idx = rs.randint(0, n_colors, size=(14, 23), dtype=np.uint8)
    got = decode_gif(encode_gif(idx, pal))
    assert got.shape == (14, 23, 3)
    assert np.array_equal(got, pal[idx])


def test_roundtrip_interlaced():
    """GIF interlace reorders rows in 4 passes (0::8, 4::8, 2::4, 1::2);
    the decoder must un-shuffle them — use h > 8 so every pass fires."""
    rs = np.random.RandomState(9)
    pal = _palette(8, seed=2)
    idx = rs.randint(0, 8, size=(21, 10), dtype=np.uint8)
    plain = decode_gif(encode_gif(idx, pal, interlace=False))
    laced = decode_gif(encode_gif(idx, pal, interlace=True))
    assert np.array_equal(plain, laced)
    assert np.array_equal(laced, pal[idx])


def test_lzw_kwkwk_and_table_growth():
    """Adversarial streams: runs of one symbol hit the KwKwK code-equals-
    next-entry case immediately; long mixed streams grow the code width
    past every boundary; huge streams force a table-full reset."""
    for mcs in (2, 4, 8):
        run = bytes([1]) * 500  # KwKwK from the second code on
        assert _lzw_decode(mcs, _lzw_encode(mcs, run), len(run)) == run
    rs = np.random.RandomState(3)
    mixed = bytes(rs.randint(0, 200, size=30_000, dtype=np.uint8).tolist())
    assert _lzw_decode(8, _lzw_encode(8, mixed), len(mixed)) == mixed
    # width growth for a small alphabet: 3 bits → 12 bits and beyond
    small = bytes(rs.randint(0, 4, size=120_000, dtype=np.uint8).tolist())
    assert _lzw_decode(2, _lzw_encode(2, small), len(small)) == small


def test_full_image_through_table_reset():
    """An image large enough that the 4096-entry table fills and the
    encoder emits a mid-stream clear — end-to-end pixels still exact."""
    rs = np.random.RandomState(5)
    pal = _palette(256, seed=6)
    idx = rs.randint(0, 256, size=(120, 160), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(idx, pal)), pal[idx])


def test_extension_blocks_are_skipped():
    pal = _palette(4, seed=8)
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    png = bytearray(encode_gif(idx, pal))
    # splice a Graphic Control Extension right before the image block
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    img_at = bytes(png).index(b"\x2c")
    spliced = bytes(png[:img_at]) + gce + bytes(png[img_at:])
    assert np.array_equal(decode_gif(spliced), pal[idx])


def test_malformed_streams_raise_loudly():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"\x89PNG\r\n\x1a\n rest")
    with pytest.raises(ValueError, match="no image data"):
        decode_gif(b"GIF89a" + bytes(7) + b"\x3b")
    pal = _palette(4, seed=1)
    idx = np.zeros((3, 3), dtype=np.uint8)
    good = encode_gif(idx, pal)
    with pytest.raises(ValueError):
        decode_gif(good[:20])  # truncated mid-stream
    with pytest.raises(ValueError, match="palette size"):
        encode_gif(idx, pal[:1])
    with pytest.raises(ValueError, match="index outside"):
        encode_gif(np.full((2, 2), 9, dtype=np.uint8), pal)


def test_image_pixel_stats_dispatches_png_and_gif(spark):
    """One stage, both real decoders: mixed PNG/GIF payloads produce
    per-image stats equal to numpy over the source pixels; a JPEG-ish
    payload (still codec-gated) is skipped, not guessed."""
    from whoiswho_spark.operators.multimodal import image_pixel_stats
    from whoiswho_spark.operators.png_codec import encode_png

    rs = np.random.RandomState(77)
    png_arr = rs.randint(0, 256, size=(8, 11, 3), dtype=np.uint8)
    pal = _palette(16, seed=78)
    gif_idx = rs.randint(0, 16, size=(7, 9), dtype=np.uint8)
    gif_rgb = pal[gif_idx]
    rows = [
        (1, bytearray(encode_png(png_arr, filter_type=3))),
        (2, bytearray(encode_gif(gif_idx, pal))),
        (3, bytearray(b"\xff\xd8\xff\xe0 jpeg bytes")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in image_pixel_stats(df).collect()}
    assert set(got) == {1, 2}
    assert got[1]["media_type"] == "image/png"
    assert got[2]["media_type"] == "image/gif"
    for did, arr in ((1, png_arr), (2, gif_rgb)):
        r = got[did]
        assert (r["height"], r["width"], r["channels"]) == arr.shape
        assert r["px_mean"] == round(float(arr.mean()), 6)
        assert r["px_std"] == round(float(arr.std()), 6)
