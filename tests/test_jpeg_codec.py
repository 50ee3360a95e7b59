"""Baseline-JPEG codec: the bitstream layer (markers, Huffman, bit
packing, byte stuffing, DC prediction, zigzag) is gated EXACTLY by
recomputing the expected pixels from the mathematical pipeline alone —
no bitstream — and requiring decode(encode(x)) to match byte-for-byte.
The shared lossy math is sanity-bounded by PSNR on smooth images."""

import numpy as np
import pytest

from whoiswho_spark.operators.jpeg_codec import (
    decode_jpeg,
    encode_jpeg,
    idct2,
    quantize_blocks,
    ycbcr_to_rgb,
)


def _expected(arr: np.ndarray, subsampling: str = "444") -> np.ndarray:
    """The no-bitstream twin of encode→decode: identical math (via the
    module's own component_planes geometry), zero entropy coding — any
    divergence isolates a bitstream bug."""
    from whoiswho_spark.operators.jpeg_codec import component_planes

    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    planes, quants, hv, hmax, vmax = component_planes(arr, subsampling)
    recon = []
    for p, q, (fh, fv) in zip(planes, quants, hv):
        cf = quantize_blocks(p - 128.0, q)
        by, bx = cf.shape[:2]
        plane = np.zeros((by * 8, bx * 8))
        for y in range(by):
            for x in range(bx):
                plane[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8] = (
                    idct2(cf[y, x] * q) + 128.0
                )
        if fv < vmax:
            plane = np.repeat(plane, vmax // fv, axis=0)
        if fh < hmax:
            plane = np.repeat(plane, hmax // fh, axis=1)
        recon.append(plane[:h, :w])
    if gray:
        return np.clip(np.round(recon[0]), 0, 255).astype(np.uint8)[:, :, None]
    rgb = ycbcr_to_rgb(np.stack(recon, axis=-1))
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("shape", [(16, 24), (17, 23), (8, 8), (5, 75)])
def test_gray_bitstream_exact(shape):
    rs = np.random.RandomState(shape[0] * 100 + shape[1])
    arr = rs.randint(0, 256, size=shape, dtype=np.uint8)
    got = decode_jpeg(encode_jpeg(arr))
    assert got.shape == (*shape, 1)
    assert np.array_equal(got, _expected(arr))


@pytest.mark.parametrize("shape", [(16, 16, 3), (19, 30, 3), (64, 48, 3)])
def test_rgb_bitstream_exact(shape):
    rs = np.random.RandomState(shape[0] + shape[1])
    arr = rs.randint(0, 256, size=shape, dtype=np.uint8)
    got = decode_jpeg(encode_jpeg(arr))
    assert got.shape == shape
    assert np.array_equal(got, _expected(arr))


def test_adversarial_coefficient_patterns_exact():
    """Constant blocks (all-EOB path), saturated values (max DC diffs),
    and a delta image (long zero runs → ZRL chains) through the exact
    bitstream gate."""
    for arr in (
        np.zeros((24, 24), dtype=np.uint8),
        np.full((24, 24), 255, dtype=np.uint8),
        np.kron(
            np.arange(9, dtype=np.uint8).reshape(3, 3) * 28,
            np.ones((8, 8), dtype=np.uint8),
        ),
        np.eye(32, dtype=np.uint8) * 255,
    ):
        assert np.array_equal(decode_jpeg(encode_jpeg(arr)), _expected(arr))


def test_lossy_quality_sane_on_smooth_image():
    """PSNR bound on the shared math: a smooth gradient must survive the
    Annex-K tables far above artifact territory."""
    y, x = np.mgrid[0:64, 0:64]
    arr = ((y * 2 + x * 2) % 256).astype(np.uint8)
    smooth = np.stack([arr, arr[::-1], arr.T], axis=-1).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(smooth)).astype(np.float64)
    mse = float(((got - smooth) ** 2).mean())
    psnr = 10 * np.log10(255.0**2 / mse)
    assert psnr > 30, psnr


def test_unsupported_streams_raise_loudly():
    arr = np.random.RandomState(0).randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    png = encode_jpeg(arr)
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    sof_at = png.index(b"\xff\xc0")
    # a baseline stream relabeled SOF2 is NOT valid progressive (its
    # scan covers 0..63, but a progressive DC scan must have Se=0)
    prog = png[:sof_at] + b"\xff\xc2" + png[sof_at + 2 :]
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(prog)
    # arithmetic-coded frames (SOF9-SOF11) are refused BY NAME — the
    # loud-reject gate for the one entropy coder we don't implement
    for sof in (b"\xff\xc9", b"\xff\xca", b"\xff\xcb"):
        arith = png[:sof_at] + sof + png[sof_at + 2 :]
        with pytest.raises(ValueError, match="arithmetic"):
            decode_jpeg(arith)
    # other SOF types (lossless, differential, hierarchical) stay out
    for sof in (b"\xff\xc3", b"\xff\xc5", b"\xff\xc7"):
        other = png[:sof_at] + sof + png[sof_at + 2 :]
        with pytest.raises(ValueError, match="SOF0"):
            decode_jpeg(other)
    # sampling factors beyond 2 stay out of scope
    m = bytearray(png)
    m[sof_at + 11] = 0x33  # first component's sampling byte
    with pytest.raises(ValueError, match="sampling factors"):
        decode_jpeg(bytes(m))
    with pytest.raises(ValueError):
        decode_jpeg(png[: len(png) // 2])  # truncated (no EOI)


def test_dimensions_agree_with_header_parser():
    from whoiswho_spark.operators.multimodal import parse_media_header

    arr = np.random.RandomState(4).randint(0, 256, size=(21, 34, 3), dtype=np.uint8)
    jpg = encode_jpeg(arr)
    meta = parse_media_header(jpg)
    assert (meta["width"], meta["height"]) == (34, 21)
    assert meta["media_type"] == "image/jpeg"


def test_image_pixel_stats_dispatches_all_three(spark):
    """The pixel stage now covers every container: PNG (truecolor,
    palette+tRNS, interlaced, 16-bit), GIF, AND JPEG payloads all
    produce stats from genuinely decoded pixels."""
    from whoiswho_spark.operators.gif_codec import encode_gif
    from whoiswho_spark.operators.multimodal import image_pixel_stats
    from whoiswho_spark.operators.png_codec import encode_png, encode_png_palette

    rs = np.random.RandomState(55)
    png_arr = rs.randint(0, 256, size=(8, 11, 3), dtype=np.uint8)
    pal = rs.randint(0, 256, size=(16, 3), dtype=np.uint8)
    gif_idx = rs.randint(0, 16, size=(7, 9), dtype=np.uint8)
    jpg_arr = rs.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    pal_idx = rs.randint(0, 16, size=(5, 6), dtype=np.uint8)
    trns = rs.randint(0, 256, size=8, dtype=np.uint8)
    arr16 = rs.randint(0, 65536, size=(4, 7, 3), dtype=np.uint16)
    rows = [
        (1, bytearray(encode_png(png_arr, filter_type=4))),
        (2, bytearray(encode_gif(gif_idx, pal))),
        (3, bytearray(encode_jpeg(jpg_arr))),
        (4, bytearray(b"\x00\x01 opaque")),
        (5, bytearray(encode_png_palette(pal_idx, pal, trns=trns, depth=4))),
        (6, bytearray(encode_png(png_arr, filter_type=2, interlace=True))),
        (7, bytearray(encode_png(arr16))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in image_pixel_stats(df).collect()}
    assert set(got) == {1, 2, 3, 5, 6, 7}
    assert got[3]["media_type"] == "image/jpeg"
    exp = _expected(jpg_arr)
    assert got[3]["px_mean"] == round(float(exp.mean()), 6)
    assert (got[3]["height"], got[3]["width"], got[3]["channels"]) == exp.shape
    # palette+tRNS decodes to RGBA; stats over the looked-up pixels
    alpha_tab = np.full(16, 255, dtype=np.uint8)
    alpha_tab[:8] = trns
    rgba = np.concatenate(
        [pal[pal_idx], alpha_tab[pal_idx][:, :, None]], axis=2
    )
    assert got[5]["channels"] == 4
    assert got[5]["px_mean"] == round(float(rgba.mean()), 6)
    # interlaced decodes to the same pixels as the plain encoding
    assert got[6]["px_mean"] == got[1]["px_mean"]
    assert got[6]["px_std"] == got[1]["px_std"]
    # 16-bit stats are over exact uint16 samples
    assert got[7]["px_max"] == int(arr16.max())
    assert got[7]["px_mean"] == round(float(arr16.mean()), 6)


def test_resize_images_executes_the_plan_with_real_pixels(spark):
    """resize_images is resize_plan's execution: target dims equal the
    plan's half-up formula, nearest-neighbor output equals numpy index
    sampling exactly, output payloads are decodable PNGs, and
    no-downscale-needed images pass through pixel-identical."""
    from whoiswho_spark.operators.multimodal import resize_images, resize_plan
    from whoiswho_spark.operators.png_codec import decode_png, encode_png

    rs = np.random.RandomState(66)
    big = rs.randint(0, 256, size=(40, 100, 3), dtype=np.uint8)   # downscale
    small = rs.randint(0, 256, size=(6, 9, 3), dtype=np.uint8)    # passthrough
    gray = rs.randint(0, 256, size=(80, 20), dtype=np.uint8)      # 1-channel
    deep = rs.randint(0, 65536, size=(6, 9, 3), dtype=np.uint16)  # 16-bit
    rows = [
        (1, bytearray(encode_png(big))),
        (2, bytearray(encode_png(small))),
        (3, bytearray(encode_jpeg(gray))),
        (4, bytearray(b"not an image")),
        (5, bytearray(encode_png(deep))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in resize_images(df, max_side=50, method="nearest").collect()
    }
    assert set(got) == {1, 2, 3, 5}
    # 16-bit input is spec-downsampled to the 8-bit output container
    assert np.array_equal(
        decode_png(bytes(got[5]["payload"])),
        np.round(deep.astype(np.float64) * (255.0 / 65535.0)).astype(np.uint8),
    )

    # target dims match the Catalyst plan formula
    meta = spark.createDataFrame(
        [(1, 100, 40), (2, 9, 6), (3, 20, 80)], "doc_id long, width int, height int"
    )
    plan = {r["doc_id"]: r for r in resize_plan(meta, max_side=50).collect()}
    for did in (1, 2, 3):
        assert (got[did]["width"], got[did]["height"]) == (
            plan[did]["target_width"], plan[did]["target_height"]
        )

    # nearest == numpy index sampling, exactly
    tw, th = plan[1]["target_width"], plan[1]["target_height"]
    ys = np.minimum(((np.arange(th) + 0.5) * 40 / th).astype(int), 39)
    xs = np.minimum(((np.arange(tw) + 0.5) * 100 / tw).astype(int), 99)
    assert np.array_equal(
        decode_png(bytes(got[1]["payload"])), big[ys][:, xs]
    )
    # passthrough is pixel-identical
    assert np.array_equal(decode_png(bytes(got[2]["payload"])), small)
    # JPEG-sourced grayscale comes out as the decoded pixels, resized
    jdec = decode_jpeg(encode_jpeg(gray))
    ys3 = np.minimum(((np.arange(50) + 0.5) * 80 / 50).astype(int), 79)
    xs3 = np.minimum(((np.arange(13) + 0.5) * 20 / 13).astype(int), 19)
    assert np.array_equal(decode_png(bytes(got[3]["payload"])), jdec[ys3][:, xs3])

    # bilinear: smooth ramp resized stays a ramp (monotone rows), exact
    # midpoint average on a 2x downscale of a two-pixel checker
    checker = np.zeros((2, 4, 3), dtype=np.uint8)
    checker[:, 1::2] = 255
    df2 = spark.createDataFrame(
        [(9, bytearray(encode_png(checker)))], "doc_id long, payload binary"
    )
    r9 = resize_images(df2, max_side=2, method="bilinear").collect()[0]
    out = decode_png(bytes(r9["payload"]))
    assert out.shape == (1, 2, 3)
    assert np.all(out == 128)  # (0+255)/2 rounded half-up


def test_permuted_scan_order_decodes_correctly():
    """A foreign baseline file may declare scan components in any order;
    the decoder must follow the SOS interleave order while assembling
    frame-ordered Y/Cb/Cr planes — permuted-scan bytes decode to the
    SAME pixels as the natural order."""
    rs = np.random.RandomState(12)
    arr = rs.randint(0, 256, size=(24, 17, 3), dtype=np.uint8)
    natural = decode_jpeg(encode_jpeg(arr))
    for order in ((2, 0, 1), (1, 2, 0), (2, 1, 0)):
        permuted = decode_jpeg(encode_jpeg(arr, scan_order=order))
        assert np.array_equal(permuted, natural), order
    with pytest.raises(ValueError, match="permute"):
        encode_jpeg(arr, scan_order=(0, 0, 1))


@pytest.mark.parametrize("sub", ["420", "422", "440"])
@pytest.mark.parametrize("shape", [(16, 16, 3), (17, 23, 3), (32, 9, 3)])
def test_subsampled_bitstream_exact(sub, shape):
    """4:2:0 / 4:2:2 / 4:4:0 — the real-world JPEG shapes: the MCU interleave
    (multiple Y blocks per MCU), chroma decimation geometry, and
    replication upsampling all flow through the exact no-bitstream
    gate, including non-multiple-of-MCU dimensions."""
    rs = np.random.RandomState(sum(shape) + len(sub))
    arr = rs.randint(0, 256, size=shape, dtype=np.uint8)
    got = decode_jpeg(encode_jpeg(arr, subsampling=sub))
    assert got.shape == shape
    assert np.array_equal(got, _expected(arr, subsampling=sub))


def test_subsampled_permuted_scan_order():
    rs = np.random.RandomState(31)
    arr = rs.randint(0, 256, size=(24, 18, 3), dtype=np.uint8)
    natural = decode_jpeg(encode_jpeg(arr, subsampling="420"))
    permuted = decode_jpeg(
        encode_jpeg(arr, subsampling="420", scan_order=(2, 0, 1))
    )
    assert np.array_equal(natural, permuted)


def test_fill_bytes_and_standalone_markers_accepted():
    """Spec-legal framing real encoders emit: 0xFF fill bytes may pad
    before any marker (T.81 B.1.1.2), and TEM (0x01) is a standalone
    marker with NO length segment. Misparsing either as a
    length-prefixed segment silently rejects valid files (recall loss
    in the Spark stages)."""
    rs = np.random.RandomState(77)
    arr = rs.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    data = encode_jpeg(arr)
    expected = decode_jpeg(data)
    # inject fill bytes + a TEM marker between SOI and the first segment
    padded = data[:2] + b"\xff\xff\xff" + b"\xff\x01" + b"\xff\xff" + data[2:]
    assert np.array_equal(decode_jpeg(padded), expected)
    # fill bytes immediately before the SOS segment too
    sos = data.index(b"\xff\xda")
    padded2 = data[:sos] + b"\xff\xff" + data[sos:]
    assert np.array_equal(decode_jpeg(padded2), expected)


def test_subsampled_quality_sane_on_smooth_image():
    y, x = np.mgrid[0:64, 0:64]
    base = ((y * 2 + x * 2) % 256).astype(np.uint8)
    smooth = np.stack([base, base[::-1], base.T], axis=-1).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(smooth, subsampling="420")).astype(np.float64)
    mse = float(((got - smooth) ** 2).mean())
    psnr = 10 * np.log10(255.0**2 / mse)
    assert psnr > 26, psnr  # chroma decimation costs a few dB vs 4:4:4


# --- progressive (SOF2) ------------------------------------------------------


@pytest.mark.parametrize("sub", ["444", "420", "422", "440"])
def test_progressive_bitstream_exact_vs_math_twin(sub):
    """Progressive encodes the SAME quantized coefficients as baseline,
    just reordered across scans — so decode(encode_progressive(x)) must
    equal the no-bitstream math twin EXACTLY, through spectral selection,
    successive approximation, DC+AC refinement, and EOB runs."""
    from whoiswho_spark.operators.jpeg_codec import encode_jpeg_progressive

    rs = np.random.RandomState(17 + len(sub))
    arr = rs.randint(0, 256, size=(17, 23, 3), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg_progressive(arr, subsampling=sub))
    assert np.array_equal(got, _expected(arr, subsampling=sub)), sub


def test_progressive_equals_baseline_decode():
    """Free second gate: progressive and baseline streams of the same
    image decode to identical pixels (gray + color, odd dims)."""
    from whoiswho_spark.operators.jpeg_codec import encode_jpeg_progressive

    rs = np.random.RandomState(21)
    color = rs.randint(0, 256, size=(19, 29, 3), dtype=np.uint8)
    gray = rs.randint(0, 256, size=(17, 23), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(color)),
        decode_jpeg(encode_jpeg(color)),
    )
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(gray)),
        decode_jpeg(encode_jpeg(gray)),
    )


@pytest.mark.parametrize("al", [0, 1, 2, 3])
def test_progressive_approximation_levels(al):
    """al=0 is pure spectral selection (no refinement scans); higher al
    exercises al successive-approximation refinement passes for both DC
    (raw-bit) and AC (correction-bit walk) paths."""
    from whoiswho_spark.operators.jpeg_codec import encode_jpeg_progressive

    rs = np.random.RandomState(31 + al)
    arr = rs.randint(0, 256, size=(24, 18, 3), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg_progressive(arr, al=al))
    assert np.array_equal(got, _expected(arr))


def test_progressive_band_splits_and_eob_runs():
    """Finer spectral bands change scan structure but not pixels; a
    smooth image produces long zero runs across blocks (EOBn > 0 with
    extension bits) and a flat image is the EOB-run extreme."""
    from whoiswho_spark.operators.jpeg_codec import encode_jpeg_progressive

    rs = np.random.RandomState(41)
    arr = rs.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    got = decode_jpeg(
        encode_jpeg_progressive(arr, bands=((1, 2), (3, 10), (11, 63)))
    )
    assert np.array_equal(got, _expected(arr))
    y, x = np.mgrid[0:48, 0:48]
    smooth = np.stack(
        [(y * 2 + x) % 256, (x * 3) % 256, ((y + x) * 2) % 256], axis=-1
    ).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(smooth, subsampling="420")),
        _expected(smooth, subsampling="420"),
    )
    flat = np.full((40, 40, 3), 77, dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(flat)), _expected(flat)
    )
    with pytest.raises(ValueError, match="bands"):
        encode_jpeg_progressive(arr, bands=((1, 5), (7, 63)))  # gap at 6


def test_progressive_dispatches_in_pixel_stage(spark):
    """image_pixel_stats no longer skips the majority web-JPEG encoding:
    progressive payloads produce the same stats as their baseline twins."""
    from whoiswho_spark.operators.jpeg_codec import encode_jpeg_progressive
    from whoiswho_spark.operators.multimodal import image_pixel_stats

    rs = np.random.RandomState(51)
    arr = rs.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_jpeg(arr))),
        (2, bytearray(encode_jpeg_progressive(arr, subsampling="420"))),
        (3, bytearray(encode_jpeg(arr, subsampling="420"))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in image_pixel_stats(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[2]["media_type"] == "image/jpeg"
    assert got[2]["px_mean"] == got[3]["px_mean"]  # same pixels as baseline
    assert got[2]["px_std"] == got[3]["px_std"]


def test_progressive_fuzzed_bytes_raise_only_valueerror():
    """The multi-scan decode path holds the corrupt-input contract: any
    mutation either decodes (harmless bit damage) or raises ValueError —
    never an uncaught exception type that would kill a Spark task."""
    import random

    from whoiswho_spark.operators.jpeg_codec import encode_jpeg_progressive

    rs = np.random.RandomState(61)
    good = encode_jpeg_progressive(
        rs.randint(0, 256, size=(16, 16, 3), dtype=np.uint8), subsampling="420"
    )
    rng = random.Random(13)
    for _ in range(300):
        m = bytearray(good)
        for _ in range(rng.randrange(1, 8)):
            m[rng.randrange(len(m))] = rng.randrange(256)
        try:
            decode_jpeg(bytes(m))
        except ValueError:
            pass

# --- restart intervals (DRI / RSTn) -------------------------------------------


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("ri", [1, 2, 5])
def test_restart_interval_baseline_bitstream_exact(sub, ri):
    """DRI/RSTn streams — standard output of hardware encoders and
    libjpeg's error-resilience mode — through the exact gate: byte
    alignment at each boundary, DC predictor reset on BOTH sides, and
    the modulo-8 marker sequence must all agree for byte equality.
    ri=5 with fewer MCUs also checks a DRI with zero emitted markers."""
    rs = np.random.RandomState(101 + ri + len(sub))
    arr = rs.randint(0, 256, size=(24, 18, 3), dtype=np.uint8)
    data = encode_jpeg(arr, subsampling=sub, restart_interval=ri)
    if ri <= 2:
        assert b"\xff\xd0" in data  # at least one boundary actually fired
    got = decode_jpeg(data)
    assert np.array_equal(got, _expected(arr, subsampling=sub))
    assert np.array_equal(
        got, decode_jpeg(encode_jpeg(arr, subsampling=sub))
    )


def test_restart_interval_gray_and_many_markers():
    """A gray image with ri=1 rolls the marker index through the full
    D0..D7 cycle (> 8 boundaries) — the modulo-8 wraparound path."""
    rs = np.random.RandomState(113)
    arr = rs.randint(0, 256, size=(40, 40), dtype=np.uint8)  # 25 MCUs
    data = encode_jpeg(arr, restart_interval=1)
    assert b"\xff\xd0" in data and b"\xff\xd7" in data  # full cycle
    assert np.array_equal(decode_jpeg(data), _expected(arr))


@pytest.mark.parametrize("ri,al", [(1, 1), (3, 2)])
def test_restart_interval_progressive_exact(ri, al):
    """Progressive + restarts: every scan kind restarts — interleaved DC
    first (predictor reset), DC refinement (resync only), AC first
    (EOB runs cannot cross), AC refinement (pending correction bits
    flushed) — and the result still byte-matches the math twin."""
    from whoiswho_spark.operators.jpeg_codec import encode_jpeg_progressive

    rs = np.random.RandomState(127 + ri)
    arr = rs.randint(0, 256, size=(24, 18, 3), dtype=np.uint8)
    data = encode_jpeg_progressive(
        arr, subsampling="420", al=al, restart_interval=ri
    )
    assert b"\xff\xdd" in data
    assert np.array_equal(decode_jpeg(data), _expected(arr, subsampling="420"))
    flat = np.full((32, 24, 3), 190, dtype=np.uint8)  # EOB-run extreme
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(flat, restart_interval=ri)),
        _expected(flat),
    )


def test_restart_marker_out_of_sync_raises():
    """A wrong RSTn index means lost sync (T.81 E.2.4) — must reject,
    not resynchronize into garbage pixels."""
    rs = np.random.RandomState(131)
    arr = rs.randint(0, 256, size=(24, 24), dtype=np.uint8)
    data = encode_jpeg(arr, restart_interval=2)
    sos = data.index(b"\xff\xda")
    first_rst = data.index(b"\xff\xd0", sos)
    broken = data[:first_rst + 1] + b"\xd4" + data[first_rst + 2:]
    with pytest.raises(ValueError):
        decode_jpeg(broken)
    with pytest.raises(ValueError, match="restart_interval"):
        encode_jpeg(arr, restart_interval=-1)
