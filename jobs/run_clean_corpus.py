"""spark-submit entrypoint for the corpus-cleaning pipeline: quality
gates (language / quality score / Gopher repetition / cross-doc dup)
followed by optional duplicate-span removal on the survivors.

Usage:
    python tools/package.py                          # builds dist/whoiswho_spark.zip
    spark-submit --py-files dist/whoiswho_spark.zip \
        jobs/run_clean_corpus.py --docs <parquet> --out <dir> \
        [--id-col doc_id] [--text-col text] \
        [--min-quality 0.5] [--lang-threshold 0.08] \
        [--max-top2gram 0.25] [--max-dup2gram 0.35] \
        [--span-n 8] [--remove-spans] [--flags-out <dir>]

Writes the cleaned corpus (original columns; with --remove-spans the
text column is replaced by clean_text) to --out, optionally the full
per-gate verdict table to --flags-out, and prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--flags-out", default=None)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--lang-threshold", type=float, default=0.08)
    ap.add_argument("--max-top2gram", type=float, default=0.25)
    ap.add_argument("--max-dup2gram", type=float, default=0.35)
    ap.add_argument("--span-n", type=int, default=8)
    ap.add_argument("--remove-spans", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from whoiswho_spark.functions.quality_filter import quality_filter_flags
    from whoiswho_spark.operators.span_dedup_remove import remove_duplicated_spans

    spark = SparkSession.builder.appName("whoiswho_spark_clean").getOrCreate()
    docs = spark.read.parquet(args.docs)
    n_in = docs.count()

    kw = dict(
        id_col=args.id_col,
        text_col=args.text_col,
        min_quality=args.min_quality,
        lang_threshold=args.lang_threshold,
        max_top2gram_frac=args.max_top2gram,
        max_dup2gram_frac=args.max_dup2gram,
        span_n=args.span_n,
    )
    flags = quality_filter_flags(docs, **kw)
    if args.flags_out:
        flags.write.mode("overwrite").parquet(args.flags_out)
        flags = spark.read.parquet(args.flags_out)  # reuse, don't recompute

    kept = docs.join(
        flags.filter(F.col("keep") == 1).select(args.id_col), args.id_col, "semi"
    )
    if args.remove_spans:
        cleaned = remove_duplicated_spans(
            kept, n=args.span_n, id_col=args.id_col, text_col=args.text_col
        ).select(args.id_col, F.col("clean_text").alias(args.text_col))
        kept = kept.drop(args.text_col).join(cleaned, args.id_col)
    kept.write.mode("overwrite").parquet(args.out)
    n_out = spark.read.parquet(args.out).count()

    print(
        json.dumps(
            {
                "docs_in": n_in,
                "docs_kept": n_out,
                "kept_frac": round(n_out / n_in, 4) if n_in else 0.0,
                "out": args.out,
                "removed_spans": bool(args.remove_spans),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
