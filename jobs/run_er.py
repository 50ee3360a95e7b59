"""spark-submit entrypoint for the ER pipeline (north rule: the job runs
via ``spark-submit --py-files`` at N and 4N executors).

Usage:
    python tools/package.py                          # builds dist/whoiswho_spark.zip
    spark-submit --py-files dist/whoiswho_spark.zip \
        jobs/run_er.py --pages <parquet> --embeddings <parquet> \
        --workdir <dir> [--labels <parquet>] [--salts 8] [--threshold 1.5]

On a cluster, size executors via the usual spark-submit conf; the job
only assumes a SparkSession, parquet-readable inputs, and a writable
workdir (object stores fine — checkpointing uses the Hadoop FS API).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--embeddings", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--labels", default=None)
    ap.add_argument("--salts", type=int, default=0)
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--num-hashes", type=int, default=8)
    ap.add_argument("--block-cap", type=int, default=5000)
    ap.add_argument(
        "--cluster-method",
        choices=("cc", "dbscan", "consensus"),
        default="cc",
        help="cc (default), dbscan (+post_match reference-parity path), "
        "or consensus (cc threshold grid + dbscan, co-association vote)",
    )
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from whoiswho_spark.plans.pipeline import ERConfig, evaluate_run, run_pipeline

    spark = SparkSession.builder.appName("whoiswho_spark_er").getOrCreate()
    cfg = ERConfig(
        num_hashes=args.num_hashes,
        bands=args.bands,
        block_cap=args.block_cap,
        n_salts=args.salts,
        threshold=args.threshold,
        cluster_method=args.cluster_method,
        resume=not args.no_resume,
    )
    pages = spark.read.parquet(args.pages)
    embeddings = spark.read.parquet(args.embeddings)
    clusters = run_pipeline(spark, pages, embeddings, args.workdir, cfg)
    out = {"clusters": clusters.count(),
           "distinct": clusters.select("cluster_id").distinct().count()}
    if args.labels:
        labels = spark.read.parquet(args.labels)
        out["pairwise_f1"] = evaluate_run(spark, args.workdir, labels)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
