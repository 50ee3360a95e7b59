"""spark-submit entrypoint for the STREAMING operators: drain a parquet
directory through incremental MinHash/LSH dedup or incremental ER with
availableNow, checkpointed state (a re-run with the same checkpoint
resumes the state store and processes only new files — the north rule's
mid-stage resumability for the streaming side), per-micro-batch counters
to the metrics table, and optional event-time retention + maintenance
sweeps.

Usage:
    python tools/package.py
    spark-submit --py-files dist/whoiswho_spark.zip \
        jobs/run_incremental.py dedup --source <dir> --checkpoint <dir> \
        --out <dir> [--metrics <dir>] [--ts-col ts --retention 86400] \
        [--maintenance <dir>] [--max-bucket 256]

    spark-submit --py-files dist/whoiswho_spark.zip \
        jobs/run_incremental.py er --source <dir> --checkpoint <dir> \
        --out <dir> [--metrics <dir>] [--threshold 0.5] [--max-members N] \
        [--ts-col ts --retention 86400] [--maintenance <dir>]

dedup source schema: (doc_id string, text string[, <ts-col> bigint]);
er source schema: (url string, block_key string, toks array<string>
[, <ts-col> bigint]); maintenance dirs hold (band int, bucket string,
ts bigint) for dedup / (block_key string, ts bigint) for er.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["dedup", "er"])
    ap.add_argument("--source", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--metrics", default=None)
    ap.add_argument("--maintenance", default=None)
    ap.add_argument("--ts-col", default=None)
    ap.add_argument("--retention", type=int, default=None)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--max-bucket", type=int, default=256)
    ap.add_argument("--max-members", type=int, default=None)
    ap.add_argument("--files-per-trigger", type=int, default=16)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(
        f"whoiswho_spark_incremental_{args.mode}"
    ).getOrCreate()

    if args.mode == "dedup":
        from whoiswho_spark.streaming.incremental_dedup import (
            run_incremental_dedup_once,
        )

        schema = "doc_id string, text string" + (
            f", {args.ts_col} bigint" if args.ts_col else ""
        )
        out = run_incremental_dedup_once(
            spark, args.source, args.checkpoint,
            schema=schema,
            max_bucket_size=args.max_bucket,
            ts_col=args.ts_col,
            retention_seconds=args.retention,
            max_files_per_trigger=args.files_per_trigger,
            output_dir=args.out,
            metrics_dir=args.metrics,
            maintenance_dir=args.maintenance,
        )
        print(json.dumps({"pairs": out.count()}))
    else:
        from whoiswho_spark.streaming.incremental_er import (
            final_assignments,
            run_incremental_er_once,
        )

        schema = "url string, block_key string, toks array<string>" + (
            f", {args.ts_col} bigint" if args.ts_col else ""
        )
        events = run_incremental_er_once(
            spark, args.source, args.checkpoint,
            threshold=args.threshold,
            schema=schema,
            max_block_members=args.max_members,
            ts_col=args.ts_col,
            retention_seconds=args.retention,
            max_files_per_trigger=args.files_per_trigger,
            maintenance_dir=args.maintenance,
            output_dir=args.out,
            metrics_dir=args.metrics,
        )
        print(
            json.dumps(
                {
                    "events": events.count(),
                    "assigned_urls": final_assignments(events).count(),
                }
            )
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
