"""spark-submit entrypoint for the RND flow: assign NEW pages to an
existing cluster table (+ NIL), optionally with the fuzzy name-battery
fallback and the ego-graph channel; or, with ``--train-pairs``, run the
RND trainer orchestration (k-fold cells → vote → top-1/NIL) over a
labeled pair-feature table instead.

Usage:
    python tools/package.py                          # builds dist/whoiswho_spark.zip
    spark-submit --py-files dist/whoiswho_spark.zip \
        jobs/run_rnd.py --new <parquet> --profiles <parquet> \
        --clusters <parquet> --out <dir> [--threshold 1.5] \
        [--fuzzy] [--ego] [--ego-weight 0.5]

    spark-submit --py-files dist/whoiswho_spark.zip \
        jobs/run_rnd.py --train-pairs <parquet> --eval-pairs <parquet> \
        --features f_a,f_b --out <dir> [--kfold 5] [--nil 0.65]

Payload tables need columns (url, title, title_tokens, text_tokens,
embedding); clusters is (url, cluster_id); pair tables need
(pid, aid, <features...>, label).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--new")
    ap.add_argument("--profiles")
    ap.add_argument("--clusters")
    ap.add_argument("--out", required=True)
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--fuzzy", action="store_true")
    ap.add_argument("--ego", action="store_true")
    ap.add_argument("--ego-weight", type=float, default=0.5)
    ap.add_argument("--train-pairs")
    ap.add_argument("--eval-pairs")
    ap.add_argument("--features")
    ap.add_argument("--kfold", type=int, default=5)
    ap.add_argument("--nil", type=float, default=0.65)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("whoiswho_spark_rnd").getOrCreate()

    if args.train_pairs:
        from whoiswho_spark.plans.rnd_train import rnd_train_predict

        feats = [f for f in (args.features or "").split(",") if f]
        if not feats:
            raise SystemExit("--features is required with --train-pairs")
        train = spark.read.parquet(args.train_pairs)
        eval_pairs = (
            spark.read.parquet(args.eval_pairs) if args.eval_pairs else train
        )
        assigned, fitted = rnd_train_predict(
            train, eval_pairs, feats, k=args.kfold, nil_threshold=args.nil
        )
        assigned.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"assigned": assigned.count(), "cells": len(fitted)}))
        spark.stop()
        return 0

    if not (args.new and args.profiles and args.clusters):
        raise SystemExit("--new/--profiles/--clusters are required")
    from whoiswho_spark.plans.rnd_pipeline import assign_pages

    assigned = assign_pages(
        spark.read.parquet(args.new),
        spark.read.parquet(args.profiles),
        spark.read.parquet(args.clusters),
        threshold=args.threshold,
        fuzzy_fallback=args.fuzzy,
        use_ego=args.ego,
        ego_weight=args.ego_weight,
    )
    assigned.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"assigned": assigned.count()}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
