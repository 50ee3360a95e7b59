"""Multimodal column plumbing: opaque BINARY payloads + typed metadata.

The decode stage is a REAL, dependency-free container-header parser —
PNG (IHDR), JPEG (SOF-family marker scan), GIF (logical screen
descriptor) — so width/height/media-type extraction needs no PIL/ffmpeg.
Pixel-level work is REAL for all three containers — PNG
(operators/png_codec.py: stdlib-zlib decoder), GIF (operators/
gif_codec.py: pure-Python LZW), and baseline 4:4:4 JPEG (operators/
jpeg_codec.py: numpy Huffman-DCT) — dispatched in the image_pixel_stats
mapInPandas stage with no codec libraries. Out-of-scope shapes
(progressive/subsampled JPEG, interlace-free limits documented per
module) are refused loudly; the Spark-side contract (schema, Arrow
batch shape, partitioning) is identical with or without system codecs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, media_type string, "
    "width int, height int, checksum string"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# every SOF marker that carries dimensions (C4/C8/CC are huffman/arith
# tables, not frames)
_JPEG_SOF = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def parse_media_header(payload: bytes | None) -> dict:
    """Container-format sniff + dimension extraction from raw bytes.

    - PNG: width/height are the two big-endian u32s of the IHDR chunk
      (bytes 16-24 — IHDR is mandatory-first per the PNG spec).
    - JPEG: walk the marker segments from SOI until a SOF-family marker;
      its payload is [len u16][precision u8][height u16][width u16].
    - GIF: logical-screen width/height, little-endian u16s at bytes 6-10.
    - anything else: octet-stream with null dimensions.
    """
    if not payload:
        return {"media_type": "application/octet-stream", "width": None, "height": None}
    if (
        payload[:8] == _PNG_SIG
        and len(payload) >= 24
        and payload[12:16] == b"IHDR"
    ):
        return {
            "media_type": "image/png",
            "width": int.from_bytes(payload[16:20], "big"),
            "height": int.from_bytes(payload[20:24], "big"),
        }
    if payload[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(payload):
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker in _JPEG_SOF:
                return {
                    "media_type": "image/jpeg",
                    "width": int.from_bytes(payload[i + 7 : i + 9], "big"),
                    "height": int.from_bytes(payload[i + 5 : i + 7], "big"),
                }
            if marker == 0xFF:  # fill byte — resync on the next 0xFF
                i += 1
                continue
            if marker == 0xD9:  # EOI, no frame seen
                break
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            i += 2 + seg_len
        return {"media_type": "image/jpeg", "width": None, "height": None}
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        return {
            "media_type": "image/gif",
            "width": int.from_bytes(payload[6:8], "little"),
            "height": int.from_bytes(payload[8:10], "little"),
        }
    return {"media_type": "application/octet-stream", "width": None, "height": None}


def decode_media(payload: bytes | None) -> dict:
    """Full per-payload metadata record: header parse + size + checksum."""
    meta = parse_media_header(payload)
    b = payload or b""
    meta["n_bytes"] = len(b)
    meta["checksum"] = hashlib.md5(b).hexdigest()
    return meta


def extract_media_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """(id, payload BINARY) → typed metadata via mapInPandas — one Arrow
    batch per call, pure-Python header parse per payload (no pixel
    decode, so the per-row cost is O(header), not O(image))."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_media(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [m["n_bytes"] for m in metas],
                    "media_type": [m["media_type"] for m in metas],
                    "width": pd.array([m["width"] for m in metas], dtype="Int32"),
                    "height": pd.array([m["height"] for m in metas], dtype="Int32"),
                    "checksum": [m["checksum"] for m in metas],
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        decode_batches, schema=MEDIA_META_SCHEMA
    )


def synthetic_media_payload_col(kind_col, width_col, height_col):
    """Catalyst-only synthetic media binaries (PNG/JPEG/GIF headers with
    the given dimensions) — the deterministic fixture generator for tests
    and the contract query; unhex(concat(hex fragments)) stays in codegen.
    kind: 0 = PNG, 1 = JPEG, 2 = GIF."""
    be4 = lambda c: F.lpad(F.hex(c.cast("bigint")), 8, "0")
    be2 = lambda c: F.lpad(F.hex(c.cast("bigint")), 4, "0")
    le2 = lambda c: F.concat(
        F.lpad(F.hex(F.pmod(c.cast("bigint"), F.lit(256))), 2, "0"),
        F.lpad(F.hex(F.floor(c.cast("bigint") / F.lit(256)).cast("bigint")), 2, "0"),
    )
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A0000000D49484452"), be4(width_col), be4(height_col)
    )
    jpg_hex = F.concat(F.lit("FFD8FFC0001108"), be2(height_col), be2(width_col))
    gif_hex = F.concat(F.lit("474946383961"), le2(width_col), le2(height_col))
    return F.unhex(
        F.when(kind_col == 0, png_hex).when(kind_col == 1, jpg_hex).otherwise(gif_hex)
    )


def image_pixel_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL pixel statistics for every container — PNG (png_codec:
    stdlib zlib + unfilters), GIF (gif_codec: pure-Python LZW), and
    baseline 4:4:4 JPEG (jpeg_codec: numpy Huffman-DCT) — dispatched by
    signature inside one mapInPandas stage. Emits (doc_id, media_type,
    width, height, channels, px_mean, px_std, px_min, px_max); malformed
    or out-of-scope payloads (e.g. progressive/subsampled JPEG) yield no
    row, so an anti-join against parse_media_header audits exactly what
    was skipped."""
    from whoiswho_spark.operators.gif_codec import decode_gif
    from whoiswho_spark.operators.jpeg_codec import decode_jpeg
    from whoiswho_spark.operators.png_codec import decode_png

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "media_type", "width", "height", "channels",
                "px_mean", "px_std", "px_min", "px_max",
            )}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    if raw.startswith(_PNG_SIG):
                        arr, mt = decode_png(raw), "image/png"
                    elif raw[:6] in (b"GIF87a", b"GIF89a"):
                        arr, mt = decode_gif(raw), "image/gif"
                    elif raw[:2] == b"\xff\xd8":
                        arr, mt = decode_jpeg(raw), "image/jpeg"
                    else:
                        continue
                except ValueError:
                    continue
                h, w, ch = arr.shape
                out["doc_id"].append(int(did))
                out["media_type"].append(mt)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["px_mean"].append(round(float(arr.mean()), 6))
                out["px_std"].append(round(float(arr.std()), 6))
                out["px_min"].append(int(arr.min()))
                out["px_max"].append(int(arr.max()))
            yield pd.DataFrame(out)

    return df.select(
        F.col(id_col).cast("long").alias(id_col), payload_col
    ).mapInPandas(
        stats,
        schema=(
            "doc_id bigint, media_type string, width int, height int, "
            "channels int, px_mean double, px_std double, px_min int, "
            "px_max int"
        ),
    )


def media_byte_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Content feature-extract over opaque binaries — (doc_id, n_bytes,
    byte_entropy, printable_ratio) via mapInPandas with a vectorized
    numpy kernel (np.frombuffer + bincount per payload; no Python loop
    over bytes). Shannon entropy is log2; -0.0 is normalized to 0.0 for
    engine portability. The DuckDB oracle re-derives both features from
    hex-pair exploding (a bijection of the byte stream)."""
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ents, prints, sizes = [], [], []
            for p in pdf[payload_col]:
                a = np.frombuffer(p or b"", dtype=np.uint8)
                sizes.append(len(a))
                if len(a) == 0:
                    ents.append(0.0)
                    prints.append(0.0)
                    continue
                cnt = np.bincount(a, minlength=256)
                pr = cnt[cnt > 0] / len(a)
                ents.append(round(float(-(pr * np.log2(pr)).sum()) + 0.0, 6))
                prints.append(
                    round(float(((a >= 0x20) & (a <= 0x7E)).mean()), 6)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pd.array(sizes, dtype="int64"),
                    "byte_entropy": ents,
                    "printable_ratio": prints,
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        feats,
        schema="doc_id bigint, n_bytes bigint, byte_entropy double, printable_ratio double",
    )


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_size: int = 8,
    stride: int = 16,
    max_frames: int = 4,
) -> DataFrame:
    """Frame sampling over opaque binaries — the video/audio
    frame-extraction PLUMBING (fixed-size windows at stride offsets),
    pure Catalyst: hex once, posexplode a bounded offset sequence,
    substring per frame. No Python anywhere; frames come out hex-encoded
    (portable to the DuckDB oracle and to any downstream decoder).
    Returns (doc_id, frame_idx INT, frame_hex STRING); short tails are
    kept (substring clamps), empty payloads produce no frames."""
    hexed = df.select(
        F.col(id_col).alias("doc_id"),
        F.hex(F.col(payload_col)).alias("_hex"),
        F.length(F.col(payload_col)).alias("_n"),
    ).where(F.col("_n") > 0)
    offsets = F.sequence(
        F.lit(0),
        F.least(
            F.lit((max_frames - 1) * stride),
            (F.col("_n") - 1) - F.pmod(F.col("_n") - 1, F.lit(stride)),
        ),
        F.lit(stride),
    )
    return (
        hexed.select(
            "doc_id", "_hex", F.posexplode(offsets).alias("frame_idx", "_off")
        )
        .select(
            "doc_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.substring(
                F.col("_hex"), F.col("_off") * 2 + 1, F.lit(frame_size * 2)
            ).alias("frame_hex"),
        )
    )


def resize_plan(meta: DataFrame, max_side: int = 512) -> DataFrame:
    """Metadata-level resize planning (the stage BEFORE pixel decode):
    aspect-preserving target dims capped at ``max_side``. Pure Catalyst
    integer math — floor(dim*scale + 0.5) on both engines (portable
    half-up without relying on engine round() semantics). Upscaling
    never happens (scale capped at 1)."""
    w = F.col("width").cast("double")
    h = F.col("height").cast("double")
    scale = F.least(F.lit(1.0), F.lit(float(max_side)) / F.greatest(w, h))
    return meta.select(
        "doc_id",
        "width",
        "height",
        F.floor(w * scale + F.lit(0.5)).cast("int").alias("target_width"),
        F.floor(h * scale + F.lit(0.5)).cast("int").alias("target_height"),
    )


def resize_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_side: int = 512,
    method: str = "bilinear",
) -> DataFrame:
    """REAL pixel resize — the execution of ``resize_plan``: decode any
    supported container (PNG/GIF/baseline-JPEG via the real codecs),
    resample to the plan's aspect-preserving target (same half-up dim
    formula, upscale never), and re-encode as PNG (the lossless output
    container). ``method``: 'nearest' (index sampling) or 'bilinear'
    (separable, edge-clamped; numpy, vectorized per image). Emits
    (doc_id, media_type src, width, height, payload PNG BINARY);
    undecodable payloads yield no row (audit via parse_media_header)."""
    import numpy as np

    from whoiswho_spark.operators.gif_codec import decode_gif
    from whoiswho_spark.operators.jpeg_codec import decode_jpeg
    from whoiswho_spark.operators.png_codec import encode_png, decode_png

    if method not in ("nearest", "bilinear"):
        raise ValueError(f"resize_images: unknown method {method}")

    def _target(w: int, h: int) -> tuple[int, int]:
        scale = min(1.0, float(max_side) / max(w, h))
        return int(w * scale + 0.5), int(h * scale + 0.5)

    def _resize(arr: "np.ndarray", tw: int, th: int) -> "np.ndarray":
        h, w = arr.shape[:2]
        if (tw, th) == (w, h):
            return arr
        if method == "nearest":
            # PIL-style half-open sampling: source center of target px
            ys = np.minimum(((np.arange(th) + 0.5) * h / th).astype(int), h - 1)
            xs = np.minimum(((np.arange(tw) + 0.5) * w / tw).astype(int), w - 1)
            return arr[ys][:, xs]
        # bilinear, edge-clamped, align-corners=False convention
        fy = (np.arange(th) + 0.5) * h / th - 0.5
        fx = (np.arange(tw) + 0.5) * w / tw - 0.5
        y0 = np.clip(np.floor(fy).astype(int), 0, h - 1)
        x0 = np.clip(np.floor(fx).astype(int), 0, w - 1)
        y1 = np.minimum(y0 + 1, h - 1)
        x1 = np.minimum(x0 + 1, w - 1)
        wy = np.clip(fy - y0, 0.0, 1.0)[:, None, None]
        wx = np.clip(fx - x0, 0.0, 1.0)[None, :, None]
        a = arr.astype(np.float64)
        top = a[y0][:, x0] * (1 - wx) + a[y0][:, x1] * wx
        bot = a[y1][:, x0] * (1 - wx) + a[y1][:, x1] * wx
        out = top * (1 - wy) + bot * wy
        return np.clip(np.round(out), 0, 255).astype(np.uint8)

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "media_type", "width", "height", "payload")}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    if raw.startswith(_PNG_SIG):
                        arr, mt = decode_png(raw), "image/png"
                    elif raw[:6] in (b"GIF87a", b"GIF89a"):
                        arr, mt = decode_gif(raw), "image/gif"
                    elif raw[:2] == b"\xff\xd8":
                        arr, mt = decode_jpeg(raw), "image/jpeg"
                    else:
                        continue
                except ValueError:
                    continue
                if arr.dtype == np.uint16:
                    # 16-bit PNG: exact spec downsample to the 8-bit
                    # output container (round(v * 255 / 65535))
                    arr = np.round(
                        arr.astype(np.float64) * (255.0 / 65535.0)
                    ).astype(np.uint8)
                h, w = arr.shape[:2]
                tw, th = _target(w, h)
                res = _resize(arr, tw, th)
                out["doc_id"].append(int(did))
                out["media_type"].append(mt)
                out["width"].append(tw)
                out["height"].append(th)
                out["payload"].append(encode_png(res))
            yield pd.DataFrame(out)

    return df.select(
        F.col(id_col).cast("long").alias(id_col), payload_col
    ).mapInPandas(
        work,
        schema=(
            "doc_id bigint, media_type string, width int, height int, "
            "payload binary"
        ),
    )
