"""Dump .explain('formatted') for the round-6-touched queries into
plans/r06/<name>_{before,after}.txt.

Run from the tree whose plans you want (the round-6 tree for _after;
a git worktree of the round-start commit for _before), e.g.:

    python tools/dump_plans_r06.py after
    git worktree add /tmp/r06_before <round-start-sha>
    (cd /tmp/r06_before && python tools/dump_plans_r06.py before /root/repo/plans/r06)

The er pair stage is not a declared query (it lives in the frozen
bench.py); its plan is dumped from the same DataFrame shape bench.py
builds, via the library entry points it calls.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "ngram_jaccard_pairs",
    "minhash_dup_candidates",
    "simhash_pairs",
    "crossdoc_span_dedup",
    "exact_dedup",
    "revenue_by_nation",
]

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")


def explain_formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def er_pairs_df(spark):
    import pyspark.sql.functions as F

    from whoiswho_spark.operators.blocking import minhash_signature_cols
    from whoiswho_spark.operators.dedup import _jaccard_sets_memo_udf, tokens_col

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base = docs.select(
        F.col("doc_id").cast("string").alias("url"),
        "source",
        F.array_distinct(tokens_col(F.col("text"))).alias("toks"),
    )
    sig = minhash_signature_cols(F.col("toks"), 4)
    blocks = base.select(
        "url",
        F.concat_ws(
            "|",
            F.col("source"),
            F.substring(
                F.md5(F.concat_ws("_", *[s.cast("string") for s in sig[:2]])), 1, 16
            ),
        ).alias("block_key"),
        F.col("toks"),
    )
    a = blocks.select("block_key", F.col("url").alias("url_a"), F.col("toks").alias("toks_a"))
    b = blocks.select("block_key", F.col("url").alias("url_b"), F.col("toks").alias("toks_b"))
    jac = _jaccard_sets_memo_udf()
    return (
        a.join(b, "block_key")
        .where(F.col("url_a") < F.col("url_b"))
        .select(
            "url_a", "url_b",
            jac(F.col("url_a"), F.col("toks_a"), F.col("url_b"), F.col("toks_b")).alias("score"),
        )
    )


def cc_large_star_df(spark, suffix: str):
    """Plan shape of one CC large-star round. 'before' = the string-id
    loop (what ran before the round-6 node encode); 'after' = the loop
    body over dictionary-encoded long ids. The shape difference under
    audit: min() over strings plans SortAggregate (var-length buffer),
    over longs HashAggregate with map-side partial aggregation."""
    import pyspark.sql.functions as F

    from whoiswho_spark.operators.clustering import _large_star

    if suffix == "before":
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c")], "src string, dst string"
        )
    else:
        edges = spark.range(2).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
    return _large_star(edges)


def main():
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    outdir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    )
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entrymod

    from whoiswho_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="dump_plans_r06", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    qs = entrymod.queries()
    for name in QUERIES:
        df = qs[name](spark, SF)
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(explain_formatted(df))
        print("dumped", name, suffix)
    with open(os.path.join(outdir, f"er_pairs_{suffix}.txt"), "w") as fh:
        fh.write(explain_formatted(er_pairs_df(spark)))
    print("dumped er_pairs", suffix)
    # cc round shape: write BOTH regimes from one tree (the loop operators
    # are unchanged; only the node id type differs — see cc_large_star_df)
    if suffix == "after":
        for sfx in ("before", "after"):
            with open(os.path.join(outdir, f"cc_large_star_{sfx}.txt"), "w") as fh:
                fh.write(explain_formatted(cc_large_star_df(spark, sfx)))
            print("dumped cc_large_star", sfx)
    spark.stop()


if __name__ == "__main__":
    main()
