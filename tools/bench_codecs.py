"""Throughput evidence for the real-decode multimodal stages: generate a
distributed corpus of genuine PNG/GIF/JPEG/WAV/AVI payloads (seeded
per-id, encoded with the repo's own codecs inside mapInPandas), then
time image_pixel_stats, resize_images, audio_features, and
video_frame_stats on local[$SPARK_GRAFT_CPUS]. One JSON line; recorded
in BASELINE.md.

Usage: python tools/bench_codecs.py [--images 20000] [--clips 2000]
       [--side 32] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=20_000)
    ap.add_argument("--clips", type=int, default=2_000)
    ap.add_argument("--side", type=int, default=32)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import numpy as np
    import pandas as pd
    import pyspark.sql.functions as F

    from whoiswho_spark.operators.audio_codec import audio_features, encode_wav
    from whoiswho_spark.operators.gif_codec import encode_gif
    from whoiswho_spark.operators.jpeg_codec import encode_jpeg, encode_jpeg_progressive
    from whoiswho_spark.operators.multimodal import image_pixel_stats, resize_images
    from whoiswho_spark.operators.png_codec import encode_png, encode_png_palette
    from whoiswho_spark.operators.video_codec import encode_avi_mjpeg, video_frame_stats
    from whoiswho_spark.session import get_spark

    spark = get_spark(
        app_name="whoiswho_spark_bench_codecs",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    side = args.side

    def gen_images(batches):
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf["id"]:
                i = int(i)
                rs = np.random.RandomState(1000 + i)
                arr = rs.randint(0, 256, size=(side, side, 3), dtype=np.uint8)
                kind = i % 5
                if kind == 0:
                    p = encode_png(arr, filter_type=i % 5)
                elif kind == 1:
                    pal = rs.randint(0, 256, size=(64, 3), dtype=np.uint8)
                    p = encode_gif(
                        rs.randint(0, 64, size=(side, side), dtype=np.uint8), pal
                    )
                elif kind == 2:
                    p = encode_jpeg(arr, subsampling="420")
                elif kind == 3:
                    # the majority real-world web encoding
                    p = encode_jpeg_progressive(arr, subsampling="420")
                else:
                    pal = rs.randint(0, 256, size=(64, 3), dtype=np.uint8)
                    p = encode_png_palette(
                        rs.randint(0, 64, size=(side, side), dtype=np.uint8),
                        pal, depth=8, interlace=bool(i % 2),
                    )
                ids.append(i)
                payloads.append(p)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    imgs = (
        spark.range(0, args.images, numPartitions=args.cpus * 2)
        .mapInPandas(gen_images, schema="doc_id long, payload binary")
        .persist()
    )
    n_img = imgs.count()
    img_bytes = imgs.agg(F.sum(F.length("payload"))).collect()[0][0]

    def timed(df) -> tuple[float, int]:
        t0 = time.monotonic()
        n = df.count()
        return time.monotonic() - t0, n

    px_wall, px_rows = timed(image_pixel_stats(imgs))
    rz_wall, rz_rows = timed(resize_images(imgs, max_side=side // 2))

    # dedicated progressive-JPEG row (the multi-scan decode path alone)
    def gen_progressive(batches):
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf["id"]:
                i = int(i)
                rs = np.random.RandomState(9000 + i)
                arr = rs.randint(0, 256, size=(side, side, 3), dtype=np.uint8)
                ids.append(i)
                payloads.append(encode_jpeg_progressive(arr, subsampling="420"))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    prog = (
        spark.range(0, args.images // 4, numPartitions=args.cpus * 2)
        .mapInPandas(gen_progressive, schema="doc_id long, payload binary")
        .persist()
    )
    prog.count()
    pg_wall, pg_rows = timed(image_pixel_stats(prog))

    def gen_media(batches):
        for pdf in batches:
            ids, payloads, kinds = [], [], []
            for i in pdf["id"]:
                i = int(i)
                rs = np.random.RandomState(5000 + i)
                if i % 2 == 0:
                    s = (rs.randn(8000) * 8000).astype(np.int16)
                    p, k = encode_wav(s, rate=16000), "wav"
                else:
                    frames = rs.randint(0, 256, size=(6, 16, 16, 3), dtype=np.uint8)
                    p, k = encode_avi_mjpeg(frames, fps=10), "avi"
                ids.append(i)
                payloads.append(p)
                kinds.append(k)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads, "kind": kinds})

    media = (
        spark.range(0, args.clips, numPartitions=args.cpus)
        .mapInPandas(gen_media, schema="doc_id long, payload binary, kind string")
        .persist()
    )
    media.count()
    au_wall, au_rows = timed(audio_features(media.where(F.col("kind") == "wav")))
    vf_wall, vf_rows = timed(
        video_frame_stats(media.where(F.col("kind") == "avi"), every_k=2)
    )

    result = {
        "metric": "codec_stage_throughput",
        "cpus": args.cpus,
        "images": n_img,
        "image_mb": round(img_bytes / 1e6, 1),
        "image_pixel_stats": {
            "wall_s": round(px_wall, 2),
            "images_per_sec": round(px_rows / px_wall, 1),
        },
        "resize_images": {
            "wall_s": round(rz_wall, 2),
            "images_per_sec": round(rz_rows / rz_wall, 1),
        },
        "image_pixel_stats_progressive": {
            "wall_s": round(pg_wall, 2),
            "images_per_sec": round(pg_rows / pg_wall, 1),
        },
        "audio_features": {
            "wall_s": round(au_wall, 2),
            "clips_per_sec": round(au_rows / au_wall, 1),
        },
        "video_frame_stats": {
            "wall_s": round(vf_wall, 2),
            "frames_per_sec": round(vf_rows / vf_wall, 1),
        },
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
