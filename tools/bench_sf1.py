"""sf1-scale evidence run: generate an sf1-SHAPED corpus (10× sf0.1,
same distributional law as the driver's testdata) and run the headline
query subset + the ER flagship on it, printing one JSON line.

The driver's documents law, measured from /root/testdata (TESTDATA.md
tables): 20 fixed sources, doc count ∝ sf, text = uniform(10..100)
tokens drawn uniformly from a 31-word vocabulary (30 common + a rare
'dup' marker on ~5% of docs), lang ∈ {en 40%, fr/de/zh/es 15%}. The
embeddings law: 64-dim float vectors, count ∝ sf, clustered so a
near-dup threshold of 0.35 finds ~linear-in-sf pair counts. Block sizes
therefore grow LINEARLY with sf and within-block pair counts
QUADRATICALLY — the point of the evidence run: throughput
(pairs-scored/sec) must hold within 2× of the sf0.1 rate while the pair
count grows ~100×.

Skipped at sf1 (tables exist only in the driver's testdata):
lineitem_pricing_summary, revenue_by_nation, window_topk, events_hourly.

Usage: python tools/bench_sf1.py [--outdir DIR] [--docs 50000]
       [--vecs 20000] [--skip-gen]
Results are recorded in BASELINE.md (sf1 evidence section).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "fr", "de", "zh", "es"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]


def generate_corpus(spark, outdir: str, n_docs: int, n_vecs: int) -> None:
    """Deterministic distributed generation (per-row RNG keyed by id, so
    the corpus is identical for any partitioning — the generate_pages
    discipline)."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.functions as F

    def gen_docs(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rs = np.random.RandomState(12345 + i)
                n_tok = rs.randint(10, 101)
                toks = [VOCAB[j] for j in rs.randint(0, len(VOCAB), n_tok)]
                if rs.rand() < 0.05:
                    toks.append("dup")
                text = " ".join(toks)
                lang = LANGS[rs.choice(len(LANGS), p=LANG_P)]
                rows.append((i, text, lang, f"src{i % 20}", len(text)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
            )

    (
        spark.range(0, n_docs, numPartitions=64)
        .mapInPandas(
            gen_docs,
            schema="doc_id bigint, text string, lang string, source string, n_chars bigint",
        )
        .write.mode("overwrite")
        .parquet(f"{outdir}/documents.parquet")
    )

    def gen_vecs(batches):
        for pdf in batches:
            out = {"vec_id": [], "embedding": [], "label": []}
            for i in pdf["id"]:
                i = int(i)
                label = i // 4  # clusters of 4 → near-dup density ∝ sf
                center = np.random.RandomState(900_000 + label).randn(64)
                v = center + 0.6 * np.random.RandomState(7_777 + i).randn(64)
                out["vec_id"].append(i)
                out["embedding"].append([float(x) for x in v.astype(np.float32)])
                out["label"].append(label)
            yield pd.DataFrame(out)

    (
        spark.range(0, n_vecs, numPartitions=32)
        .mapInPandas(
            gen_vecs, schema="vec_id bigint, embedding array<float>, label int"
        )
        .write.mode("overwrite")
        .parquet(f"{outdir}/embeddings.parquet")
    )


HEADLINE_SF1 = [
    "minhash_dup_candidates",
    "ngram_jaccard_pairs",
    "exact_dedup",
    "embedding_neardup",
    "ann_topk",
    "pairwise_f1",
    "token_stats",
    "simhash_pairs",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default=f"{REPO}/.bench_sf1")
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--vecs", type=int, default=20_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()

    from whoiswho_spark.session import get_spark

    import __spark_entry__ as entrymod
    from bench import _er_pipeline_bench, _materialize

    spark = get_spark(
        app_name="whoiswho_spark_bench_sf1",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    if not args.skip_gen:
        t0 = time.monotonic()
        generate_corpus(spark, args.outdir, args.docs, args.vecs)
        print(f"generated sf1 corpus in {time.monotonic()-t0:.1f}s", file=sys.stderr)

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE_SF1:
        t0 = time.monotonic()
        _materialize(qs[name](spark, args.outdir))
        timings[name] = round(time.monotonic() - t0, 3)
        print(f"{name}: {timings[name]}s", file=sys.stderr)

    pairs_scored, er_sec = _er_pipeline_bench(spark, args.outdir)
    timings["er_pipeline"] = round(er_sec, 3)
    result = {
        "metric": "sf1_evidence_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": args.outdir,
        "docs": args.docs,
        "vecs": args.vecs,
        "cpus": args.cpus,
        "er_pairs_scored": pairs_scored,
        "er_pairs_per_sec": round(pairs_scored / er_sec, 1) if er_sec else 0.0,
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
