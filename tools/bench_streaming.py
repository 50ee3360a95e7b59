"""Streaming drain throughput evidence: push the documents corpus
through both stateful operators (incremental MinHash/LSH dedup and
incremental ER) as a multi-file availableNow drain and report docs/sec,
emitted rows, micro-batch count, and peak state rows. One JSON line;
results recorded in BASELINE.md.

The corpus is the driver's sf table (default sf0.1 documents, 5,000
docs — dense near-dup corpus, so buckets are large and the
max_bucket_size cap genuinely fires on the dedup side: the run also
exercises the cap-observability path at its production bound).

Usage: python tools/bench_streaming.py [--sf-dir DIR] [--files 8]
       [--cpus 32] [--max-bucket-size 256]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import warnings

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--files", type=int, default=8)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--max-bucket-size", type=int, default=256)
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from whoiswho_spark.operators.dedup import tokens_col
    from whoiswho_spark.plans.metrics import read_streaming_metrics
    from whoiswho_spark.session import get_spark
    from whoiswho_spark.streaming.incremental_dedup import run_incremental_dedup_once
    from whoiswho_spark.streaming.incremental_er import run_incremental_er_once

    spark = get_spark(
        app_name="whoiswho_spark_bench_streaming",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    n_docs = docs.count()
    work = tempfile.mkdtemp(prefix="bench_streaming_")
    out: dict = {"metric": "streaming_drain", "docs": n_docs, "files": args.files,
                 "cpus": args.cpus, "sf": args.sf_dir}

    # --- dedup drain -------------------------------------------------
    dd_src = f"{work}/dd_src"
    docs.select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    ).repartition(args.files).write.mode("overwrite").parquet(dd_src)
    t0 = time.monotonic()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # cap warning expected
        pairs = run_incremental_dedup_once(
            spark, dd_src, f"{work}/dd_ckpt", name="bench_dd",
            max_bucket_size=args.max_bucket_size,
            metrics_dir=f"{work}/dd_metrics", run_id="bench",
        )
        n_pairs = pairs.count()
    dd_wall = time.monotonic() - t0
    m = read_streaming_metrics(spark, f"{work}/dd_metrics")
    out["dedup"] = {
        "wall_s": round(dd_wall, 2),
        "docs_per_sec": round(n_docs / dd_wall, 1),
        "pair_rows": n_pairs,
        "micro_batches": m.count(),
        "peak_state_rows": m.agg(F.max("state_rows")).collect()[0][0],
    }

    # --- ER drain ----------------------------------------------------
    er_src = f"{work}/er_src"
    docs.select(
        F.col("doc_id").cast("string").alias("url"),
        F.col("source").alias("block_key"),
        F.array_distinct(tokens_col(F.col("text"))).alias("toks"),
    ).repartition(args.files).write.mode("overwrite").parquet(er_src)
    t0 = time.monotonic()
    events = run_incremental_er_once(
        spark, er_src, f"{work}/er_ckpt", name="bench_er", threshold=0.5,
        metrics_dir=f"{work}/er_metrics", run_id="bench",
    )
    n_events = events.count()
    er_wall = time.monotonic() - t0
    m2 = read_streaming_metrics(spark, f"{work}/er_metrics")
    out["er"] = {
        "wall_s": round(er_wall, 2),
        "docs_per_sec": round(n_docs / er_wall, 1),
        "event_rows": n_events,
        "micro_batches": m2.count(),
        "peak_state_rows": m2.agg(F.max("state_rows")).collect()[0][0],
    }
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
