"""Round-6 optimization measurement harness (bench.py is FROZEN — this
file carries the extra evidence runs: per-stage isolation via the noop
sink, variant A/B timing inside ONE JVM, and .explain("formatted") dumps
for plans/r06/).

Usage:
    python bench_extra.py er [sf_dir]        # er pipeline stage breakdown
    python bench_extra.py jaccard [sf_dir]   # memo-UDF vs Catalyst verify A/B
    python bench_extra.py queries name [name...]  # noop-timed declared queries
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def get_spark():
    import json

    from whoiswho_spark.session import get_spark as gs

    extra = json.loads(os.environ.get("BENCH_EXTRA_CONF", "{}")) or None
    return gs(
        app_name="bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf=extra,
    )


def timed(label, fn, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    print(f"{label}: {best:.3f}s")
    return best


def er_parts(spark, sf_dir):
    """Stage isolation of bench.py's _er_pipeline_bench (same code shape)."""
    import pyspark.sql.functions as F

    from whoiswho_spark.operators.blocking import minhash_signature_cols
    from whoiswho_spark.operators.clustering import connected_components
    from whoiswho_spark.operators.dedup import _jaccard_sets_memo_udf, tokens_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
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
    pairs = (
        a.join(b, "block_key")
        .where(F.col("url_a") < F.col("url_b"))
        .select(
            "url_a",
            "url_b",
            jac(F.col("url_a"), F.col("toks_a"), F.col("url_b"), F.col("toks_b")).alias(
                "score"
            ),
        )
    )
    spark.sparkContext.setJobDescription("er: blocks only")
    timed("er/blocks_noop", lambda: noop(blocks), reps=2)
    spark.sparkContext.setJobDescription("er: join no score")
    nojac = (
        a.join(b, "block_key")
        .where(F.col("url_a") < F.col("url_b"))
        .select("url_a", "url_b")
    )
    timed("er/join_pairs_no_score", lambda: noop(nojac), reps=1)
    spark.sparkContext.setJobDescription("er: pairs scored (current memo UDF)")
    timed("er/pairs_scored_noop", lambda: noop(pairs), reps=1)
    spark.sparkContext.setJobDescription("er: full (persist+count+cc)")

    def full():
        p = pairs.persist()
        n = p.count()
        edges = p.where(F.col("score") >= 0.5).select(
            F.col("url_a").alias("src"), F.col("url_b").alias("dst")
        )
        clusters = connected_components(edges, vertices=blocks.select("url").distinct())
        noop(clusters)
        p.unpersist()
        print("  n_pairs:", n)

    timed("er/full", full, reps=1)
    spark.sparkContext.setJobDescription(None)


def jaccard_ab(spark, sf_dir):
    """A/B: pairs scored via memo pandas UDF vs Catalyst array_intersect,
    same join, same JVM, interleaved. Also asserts bit-identical scores."""
    import pyspark.sql.functions as F

    from whoiswho_spark.operators.blocking import minhash_signature_cols
    from whoiswho_spark.operators.dedup import (
        _jaccard_sets_memo_pandas_udf,
        _jaccard_sets_memo_udf,
        tokens_col,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
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
    joined = a.join(b, "block_key").where(F.col("url_a") < F.col("url_b"))

    jac_udf = _jaccard_sets_memo_pandas_udf()
    udf_pairs = joined.select(
        "url_a", "url_b",
        jac_udf(F.col("url_a"), F.col("toks_a"), F.col("url_b"), F.col("toks_b")).alias("score"),
    )
    jac_cat = _jaccard_sets_memo_udf()
    cat_pairs = joined.select(
        "url_a", "url_b",
        jac_cat(F.col("url_a"), F.col("toks_a"), F.col("url_b"), F.col("toks_b")).alias("score"),
    )
    jac_reps = int(os.environ.get("JAC_REPS", "2"))
    run_udf = os.environ.get("JAC_SKIP_UDF", "") != "1"
    for rep in range(jac_reps):
        if run_udf:
            spark.sparkContext.setJobDescription("jac A: memo UDF")
            timed(f"jac/memo_udf[{rep}]", lambda: noop(udf_pairs), reps=1)
        spark.sparkContext.setJobDescription("jac B: catalyst")
        timed(f"jac/catalyst[{rep}]", lambda: noop(cat_pairs), reps=1)
    spark.sparkContext.setJobDescription("jac: bit-parity check")
    diff = (
        udf_pairs.alias("u")
        .join(
            cat_pairs.alias("c"),
            (F.col("u.url_a") == F.col("c.url_a")) & (F.col("u.url_b") == F.col("c.url_b")),
        )
        .where(F.col("u.score").cast("string") != F.col("c.score").cast("string"))
        .count()
    )
    print("bitwise-mismatched scores:", diff)
    spark.sparkContext.setJobDescription(None)


def jaccard_micro(spark, sf_dir):
    """Isolate the pair-scoring kernel cost at scale: transfer floor,
    raw JVM intersect, let-bound expression, bitmask-memo pandas kernel."""
    import pandas as pd
    import numpy as np
    import pyspark.sql.functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    from whoiswho_spark.operators.blocking import minhash_signature_cols
    from whoiswho_spark.operators.dedup import tokens_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
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
    joined = a.join(b, "block_key").where(F.col("url_a") < F.col("url_b"))

    def zero(ida, x, idb, y):
        return pd.Series(np.zeros(len(x)))

    zero.__annotations__ = {
        "ida": pd.Series, "x": pd.Series, "idb": pd.Series, "y": pd.Series,
        "return": pd.Series,
    }
    zero_udf = pandas_udf(zero, DoubleType())

    def bitmask(ida, x, idb, y):
        # per-batch dictionary-encode tokens -> bit positions; per-doc
        # arbitrary-precision int masks memoized by id; per pair one
        # AND + popcount.
        codes: dict = {}
        masks: dict = {}
        out = np.zeros(len(x))

        def mask_of(i, arr):
            m = masks.get(i)
            if m is None:
                m = 0
                for t in arr:
                    c = codes.get(t)
                    if c is None:
                        c = len(codes)
                        codes[t] = c
                    m |= 1 << c
                masks[i] = m
            return m

        xa, ya, ia, ib = x.values, y.values, ida.values, idb.values
        for i in range(len(out)):
            ma = mask_of(ia[i], xa[i])
            mb = mask_of(ib[i], ya[i])
            inter = (ma & mb).bit_count()
            u = ma.bit_count() + mb.bit_count() - inter
            out[i] = inter / u if u else 0.0
        return pd.Series(out)

    bitmask.__annotations__ = zero.__annotations__
    bitmask_udf = pandas_udf(bitmask, DoubleType())

    inter_raw = F.size(F.array_intersect("toks_a", "toks_b"))
    let_bound = F.get(
        F.transform(
            F.array(F.size(F.array_intersect("toks_a", "toks_b"))),
            lambda i: F.when(
                F.size("toks_a") + F.size("toks_b") - i > 0,
                i / (F.size("toks_a") + F.size("toks_b") - i),
            ).otherwise(F.lit(0.0)),
        ),
        0,
    )
    variants = {
        "zero_kernel(transfer floor)": joined.select(
            "url_a", "url_b",
            zero_udf(F.col("url_a"), F.col("toks_a"), F.col("url_b"), F.col("toks_b")).alias("score"),
        ),
        "raw_intersect_size": joined.select(
            "url_a", "url_b", inter_raw.cast("double").alias("score")
        ),
        "let_bound_expr": joined.select("url_a", "url_b", let_bound.alias("score")),
        "bitmask_memo": joined.select(
            "url_a", "url_b",
            bitmask_udf(F.col("url_a"), F.col("toks_a"), F.col("url_b"), F.col("toks_b")).alias("score"),
        ),
    }
    order = os.environ.get("JACMICRO", "zero_kernel(transfer floor),raw_intersect_size,let_bound_expr,bitmask_memo")
    for name in order.split(","):
        df = variants[name.strip()]
        spark.sparkContext.setJobDescription(f"jacmicro: {name}")
        timed(f"jacmicro/{name}", lambda d=df: noop(d), reps=1)
    spark.sparkContext.setJobDescription(None)


def jaccard_diag(spark, sf_dir):
    """Where does the per-pair cost come from: the intersect itself, or
    per-pair re-evaluation of the (CodegenFallback) token-array
    expressions inside the join stage?"""
    import pyspark.sql.functions as F

    from whoiswho_spark.operators.blocking import minhash_signature_cols
    from whoiswho_spark.operators.dedup import tokens_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
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

    def joined_from(bl):
        a = bl.select("block_key", F.col("url").alias("url_a"), F.col("toks").alias("toks_a"))
        b = bl.select("block_key", F.col("url").alias("url_b"), F.col("toks").alias("toks_b"))
        return a.join(b, "block_key").where(F.col("url_a") < F.col("url_b"))

    sizes = (F.size("toks_a") + F.size("toks_b")).cast("double")
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")

    lazy = joined_from(blocks)
    spark.sparkContext.setJobDescription("jacdiag: sizes only, lazy blocks")
    timed("jacdiag/sizes_lazy", lambda: noop(lazy.select("url_a", "url_b", sizes.alias("s"))), reps=1)

    ckpt = joined_from(blocks.localCheckpoint())
    spark.sparkContext.setJobDescription("jacdiag: sizes only, ckpt blocks")
    timed("jacdiag/sizes_ckpt", lambda: noop(ckpt.select("url_a", "url_b", sizes.alias("s"))), reps=1)
    spark.sparkContext.setJobDescription("jacdiag: intersect, ckpt blocks")
    timed("jacdiag/intersect_ckpt", lambda: noop(ckpt.select("url_a", "url_b", inter.alias("s"))), reps=1)

    out = lazy.select("url_a", "url_b", inter.alias("s"))
    with open("/tmp/jacdiag_lazy_intersect_plan.txt", "w") as fh:
        fh.write(out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"))
    spark.sparkContext.setJobDescription(None)


def er_score_only(spark, sf_dir):
    """pairs_scored + full er with the CURRENT library jac — for conf A/Bs."""
    import pyspark.sql.functions as F

    from whoiswho_spark.operators.blocking import minhash_signature_cols
    from whoiswho_spark.operators.clustering import connected_components
    from whoiswho_spark.operators.dedup import _jaccard_sets_memo_udf, tokens_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
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
    pairs = (
        a.join(b, "block_key")
        .where(F.col("url_a") < F.col("url_b"))
        .select(
            "url_a", "url_b",
            jac(F.col("url_a"), F.col("toks_a"), F.col("url_b"), F.col("toks_b")).alias("score"),
        )
    )
    spark.sparkContext.setJobDescription("erscore: pairs scored")
    timed("erscore/pairs_scored_noop", lambda: noop(pairs), reps=1)

    def full():
        p = pairs.persist()
        n = p.count()
        edges = p.where(F.col("score") >= 0.5).select(
            F.col("url_a").alias("src"), F.col("url_b").alias("dst")
        )
        clusters = connected_components(edges, vertices=blocks.select("url").distinct())
        noop(clusters)
        p.unpersist()
        print("  n_pairs:", n)

    spark.sparkContext.setJobDescription("erscore: full")
    timed("erscore/full", full, reps=1)
    spark.sparkContext.setJobDescription(None)


def jaccard_diag2(spark, sf_dir):
    """Hashed-primitive intersect variants."""
    import pyspark.sql.functions as F

    from whoiswho_spark.operators.blocking import minhash_signature_cols
    from whoiswho_spark.operators.dedup import tokens_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
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

    def joined_from(bl):
        a = bl.select("block_key", F.col("url").alias("url_a"), F.col("toks").alias("toks_a"))
        b = bl.select("block_key", F.col("url").alias("url_b"), F.col("toks").alias("toks_b"))
        return a.join(b, "block_key").where(F.col("url_a") < F.col("url_b"))

    def hashed_jac(x, y):
        xh = F.transform(x, lambda t: F.xxhash64(t))
        yh = F.transform(y, lambda t: F.xxhash64(t))
        return F.get(
            F.transform(
                F.array(F.size(F.array_intersect(xh, yh))),
                lambda i: F.when(
                    F.size(x) + F.size(y) - i > 0,
                    i / (F.size(x) + F.size(y) - i),
                ).otherwise(F.lit(0.0)),
            ),
            0,
        )

    lazy = joined_from(blocks)
    ckpt = joined_from(blocks.localCheckpoint())
    spark.sparkContext.setJobDescription("jacdiag2: hashed intersect, ckpt blocks")
    timed(
        "jacdiag2/hashed_ckpt",
        lambda: noop(ckpt.select("url_a", "url_b", hashed_jac(F.col("toks_a"), F.col("toks_b")).alias("s"))),
        reps=1,
    )
    spark.sparkContext.setJobDescription("jacdiag2: hashed intersect, lazy blocks")
    timed(
        "jacdiag2/hashed_lazy",
        lambda: noop(lazy.select("url_a", "url_b", hashed_jac(F.col("toks_a"), F.col("toks_b")).alias("s"))),
        reps=1,
    )
    spark.sparkContext.setJobDescription(None)


def minhash_parts(spark, sf_dir):
    """Stage isolation of minhash_dup_pairs (the declared query)."""
    import pyspark.sql.functions as F

    from whoiswho_spark.operators.blocking import minhash_signature_cols
    from whoiswho_spark.operators.dedup import (
        _distinct_tokens_first,
        band_bucket_cols,
        minhash_dup_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = _distinct_tokens_first(docs, "text", "doc_id")
    sig = minhash_signature_cols(F.col("_toks"), 4)
    buckets = band_bucket_cols(sig, 2)
    wide = base.select(
        F.col("doc_id"), *[c.alias(f"_bk{b}") for b, c in enumerate(buckets)]
    )
    spark.sparkContext.setJobDescription("minhash: wide signature table")
    timed("minhash/wide_noop", lambda: noop(wide), reps=2)
    spark.sparkContext.setJobDescription("minhash: full query")
    timed("minhash/full", lambda: noop(minhash_dup_pairs(docs)), reps=1)
    spark.sparkContext.setJobDescription(None)


def ngram_parts(spark, sf_dir):
    """Stage isolation of ngram_jaccard_pairs_prefix (the declared query)."""
    import pyspark.sql.functions as F

    from whoiswho_spark.operators.dedup import (
        _dense_token_ranks,
        ngram_jaccard_pairs_prefix,
        tokens_col,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = docs.select(
        F.col("source").alias("block"),
        F.col("doc_id"),
        F.array_distinct(tokens_col(F.col("text"))).alias("toks"),
    ).withColumn("sz", F.size("toks"))
    df_tbl = (
        t.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("_df"))
    )
    ranks, _nv = _dense_token_ranks(df_tbl)
    ti = (
        t.select("block", "doc_id", "sz", F.explode("toks").alias("tok"))
        .join(ranks, "tok")
        .groupBy("block", "doc_id", "sz")
        .agg(F.sort_array(F.collect_list("rk")).alias("rks"))
    )
    spark.sparkContext.setJobDescription("ngram: ti build")
    timed("ngram/ti_noop", lambda: noop(ti), reps=2)

    ti_c = ti.localCheckpoint()
    threshold = 0.5

    def _plen(frac):
        return F.greatest(
            F.lit(1),
            (F.col("sz") - F.ceil(F.round(F.lit(frac) * F.col("sz"), 9)) + 1).cast(
                "int"
            ),
        )

    idx_frac = 2.0 * threshold / (1.0 + threshold)
    a = ti_c.select(
        "block",
        F.col("doc_id").alias("id_a"),
        F.col("sz").alias("sz_a"),
        F.explode(F.slice("rks", 1, _plen(idx_frac))).alias("tok"),
    )
    b = ti_c.select(
        "block",
        F.col("doc_id").alias("id_b"),
        F.col("sz").alias("sz_b"),
        F.explode(F.slice("rks", 1, _plen(threshold))).alias("tok"),
    )
    meets = a.join(b, ["block", "tok"]).where(
        (
            (F.col("sz_a") < F.col("sz_b"))
            | ((F.col("sz_a") == F.col("sz_b")) & (F.col("id_a") < F.col("id_b")))
        )
        & (F.col("sz_a") >= F.lit(float(threshold)) * F.col("sz_b"))
    )
    spark.sparkContext.setJobDescription("ngram: meets only (no distinct)")
    timed(
        "ngram/meets_noop",
        lambda: noop(meets.select("id_a", "id_b")),
        reps=1,
    )
    cands = meets.select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
    ).distinct()
    spark.sparkContext.setJobDescription("ngram: cands (meets+distinct)")
    timed("ngram/cands_noop", lambda: noop(cands), reps=1)

    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cands_rp = (
        meets.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .repartition(nparts, "id_a", "id_b")
        .distinct()
    )
    spark.sparkContext.setJobDescription("ngram: cands repartition+distinct")
    timed("ngram/cands_repart_noop", lambda: noop(cands_rp), reps=1)

    # positional-filter variant: prune meet rows whose matched positions
    # already prove the overlap bound unreachable (first-common rows
    # always survive, so the distinct result is identical)
    ap = ti_c.select(
        "block",
        F.col("doc_id").alias("id_a"),
        F.col("sz").alias("sz_a"),
        F.posexplode(F.slice("rks", 1, _plen(idx_frac))).alias("pa", "tok"),
    )
    bp = ti_c.select(
        "block",
        F.col("doc_id").alias("id_b"),
        F.col("sz").alias("sz_b"),
        F.posexplode(F.slice("rks", 1, _plen(threshold))).alias("pb", "tok"),
    )
    o_min = F.ceil(
        F.round(
            F.lit(threshold / (1.0 + threshold))
            * (F.col("sz_a") + F.col("sz_b")),
            9,
        )
    )
    meets_pf = (
        ap.join(bp, ["block", "tok"])
        .where(
            (
                (F.col("sz_a") < F.col("sz_b"))
                | ((F.col("sz_a") == F.col("sz_b")) & (F.col("id_a") < F.col("id_b")))
            )
            & (F.col("sz_a") >= F.lit(float(threshold)) * F.col("sz_b"))
            & (
                1
                + F.least(
                    F.col("sz_a") - (F.col("pa") + 1), F.col("sz_b") - (F.col("pb") + 1)
                )
                >= o_min
            )
        )
    )
    spark.sparkContext.setJobDescription("ngram: meets posfilter count")
    timed(
        "ngram/meets_posfilter_noop",
        lambda: noop(meets_pf.select("id_a", "id_b")),
        reps=1,
    )
    cands_pf = (
        meets_pf.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .repartition(nparts, "id_a", "id_b")
        .distinct()
    )
    spark.sparkContext.setJobDescription("ngram: cands posfilter+repart+distinct")
    timed("ngram/cands_posfilter_noop", lambda: noop(cands_pf), reps=1)
    same = cands_pf.count() == cands.count() and cands_pf.exceptAll(cands).count() == 0
    print("  posfilter candidate set identical:", same)
    spark.sparkContext.setJobDescription("ngram: full query")
    timed(
        "ngram/full",
        lambda: noop(
            ngram_jaccard_pairs_prefix(docs, block_col="source")
        ),
        reps=1,
    )
    spark.sparkContext.setJobDescription(None)


def ngram_distinct_sweep(spark, sf_dir):
    """Partition-count sweep for the candidate pair-distinct exchange —
    the remaining ngram wall (guide §2.2: fewer/larger vs more/smaller
    reduce partitions; the input is ~500M narrow rows at sf1)."""
    import pyspark.sql.functions as F

    from whoiswho_spark.operators.dedup import (
        _dense_token_ranks,
        tokens_col,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = docs.select(
        F.col("source").alias("block"),
        F.col("doc_id"),
        F.array_distinct(tokens_col(F.col("text"))).alias("toks"),
    ).withColumn("sz", F.size("toks"))
    df_tbl = (
        t.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("_df"))
    )
    ranks, _nv = _dense_token_ranks(df_tbl)
    ti = (
        t.select("block", "doc_id", "sz", F.explode("toks").alias("tok"))
        .join(ranks, "tok")
        .groupBy("block", "doc_id", "sz")
        .agg(F.sort_array(F.collect_list("rk")).alias("rks"))
    ).localCheckpoint()
    threshold = 0.5

    def _plen(frac):
        return F.greatest(
            F.lit(1),
            (F.col("sz") - F.ceil(F.round(F.lit(frac) * F.col("sz"), 9)) + 1).cast(
                "int"
            ),
        )

    idx_frac = 2.0 * threshold / (1.0 + threshold)
    a = ti.select(
        "block",
        F.col("doc_id").alias("id_a"),
        F.col("sz").alias("sz_a"),
        F.explode(F.slice("rks", 1, _plen(idx_frac))).alias("tok"),
    )
    b = ti.select(
        "block",
        F.col("doc_id").alias("id_b"),
        F.col("sz").alias("sz_b"),
        F.explode(F.slice("rks", 1, _plen(threshold))).alias("tok"),
    )
    meets = a.join(b, ["block", "tok"]).where(
        (
            (F.col("sz_a") < F.col("sz_b"))
            | ((F.col("sz_a") == F.col("sz_b")) & (F.col("id_a") < F.col("id_b")))
        )
        & (F.col("sz_a") >= F.lit(float(threshold)) * F.col("sz_b"))
    )
    pairs = meets.select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
    )
    sweep = os.environ.get("NGRAM_PARTS", "32,96,192")
    for n in [int(x) for x in sweep.split(",")]:
        cands = pairs.repartition(n, "id_a", "id_b").distinct()
        spark.sparkContext.setJobDescription(f"ngramsweep: n={n}")
        timed(f"ngramsweep/cands_n{n}", lambda c=cands: noop(c), reps=2)
    spark.sparkContext.setJobDescription(None)


def er_cc_parts(spark, sf_dir):
    """Isolate the er tail: persist+count of scored pairs, then CC over
    the thresholded edges, with a local_finish_threshold sweep."""
    import pyspark.sql.functions as F

    from whoiswho_spark.operators.blocking import minhash_signature_cols
    from whoiswho_spark.operators.clustering import connected_components
    from whoiswho_spark.operators.dedup import _jaccard_sets_memo_udf, tokens_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
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
    pairs = (
        a.join(b, "block_key")
        .where(F.col("url_a") < F.col("url_b"))
        .select(
            "url_a", "url_b",
            jac(F.col("url_a"), F.col("toks_a"), F.col("url_b"), F.col("toks_b")).alias("score"),
        )
    )
    p = pairs.persist()
    spark.sparkContext.setJobDescription("ercc: persist+count")
    t0 = time.monotonic()
    n = p.count()
    print(f"ercc/persist_count: {time.monotonic()-t0:.3f}s  n_pairs={n}")
    edges = p.where(F.col("score") >= 0.5).select(
        F.col("url_a").alias("src"), F.col("url_b").alias("dst")
    )
    spark.sparkContext.setJobDescription("ercc: edges count")
    t0 = time.monotonic()
    ne = edges.count()
    print(f"ercc/edges_count: {time.monotonic()-t0:.3f}s  n_edges={ne}")
    verts = blocks.select("url").distinct()
    sweep = os.environ.get("CC_THRESH", "1000000")
    for th in [int(x) for x in sweep.split(",")]:
        spark.sparkContext.setJobDescription(f"ercc: cc threshold={th}")
        timed(
            f"ercc/cc_local_finish_{th}",
            lambda t=th: noop(
                connected_components(edges, vertices=verts, local_finish_threshold=t)
            ),
            reps=2,
        )
    p.unpersist()
    spark.sparkContext.setJobDescription(None)


def cc_round_parts(spark, sf_dir):
    """Phase isolation of connected_components round 1 on the er edges."""
    import pyspark.sql.functions as F

    from whoiswho_spark.operators.blocking import minhash_signature_cols
    from whoiswho_spark.operators.clustering import (
        _large_star,
        _small_star,
        _local_union_find_star,
    )
    from whoiswho_spark.operators.dedup import _jaccard_sets_memo_udf, tokens_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
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
    pairs = (
        a.join(b, "block_key")
        .where(F.col("url_a") < F.col("url_b"))
        .select(
            "url_a", "url_b",
            jac(F.col("url_a"), F.col("toks_a"), F.col("url_b"), F.col("toks_b")).alias("score"),
        )
    )
    p = pairs.persist()
    p.count()
    edges0 = p.where(F.col("score") >= 0.5).select(
        F.col("url_a").alias("src"), F.col("url_b").alias("dst")
    ).where(F.col("src") != F.col("dst"))

    spark.sparkContext.setJobDescription("ccparts: input localCheckpoint")
    t0 = time.monotonic()
    edges = edges0.localCheckpoint()
    print(f"ccparts/input_ckpt: {time.monotonic()-t0:.3f}s")

    def checksum(e):
        return e.agg(
            F.count("*").alias("n"), F.expr("bit_xor(xxhash64(src, dst))").alias("h")
        ).collect()[0]

    spark.sparkContext.setJobDescription("ccparts: checksum input")
    t0 = time.monotonic()
    cs = checksum(edges)
    print(f"ccparts/checksum0: {time.monotonic()-t0:.3f}s n={cs['n']}")

    spark.sparkContext.setJobDescription("ccparts: large_star")
    t0 = time.monotonic()
    ls = _large_star(edges).localCheckpoint()
    print(f"ccparts/large_star: {time.monotonic()-t0:.3f}s n={ls.count()}")

    spark.sparkContext.setJobDescription("ccparts: small_star(large)")
    t0 = time.monotonic()
    ss = _small_star(ls).localCheckpoint()
    print(f"ccparts/small_star: {time.monotonic()-t0:.3f}s n={ss.count()}")

    spark.sparkContext.setJobDescription("ccparts: checksum round1")
    t0 = time.monotonic()
    cs1 = checksum(ss)
    print(f"ccparts/checksum1: {time.monotonic()-t0:.3f}s n={cs1['n']}")

    spark.sparkContext.setJobDescription("ccparts: local finish tail")
    t0 = time.monotonic()
    fin = _local_union_find_star(ss).localCheckpoint()
    print(f"ccparts/local_finish: {time.monotonic()-t0:.3f}s n={fin.count()}")
    p.unpersist()
    spark.sparkContext.setJobDescription(None)


def cc_large_star_variants(spark, sf_dir):
    """A/B of _large_star formulations on the er edge set."""
    import pyspark.sql.functions as F

    from whoiswho_spark.operators.blocking import minhash_signature_cols
    from whoiswho_spark.operators.clustering import _large_star, _symmetrize
    from whoiswho_spark.operators.dedup import _jaccard_sets_memo_udf, tokens_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
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
    pairs = (
        a.join(b, "block_key")
        .where(F.col("url_a") < F.col("url_b"))
        .select(
            "url_a", "url_b",
            jac(F.col("url_a"), F.col("toks_a"), F.col("url_b"), F.col("toks_b")).alias("score"),
        )
    )
    p = pairs.persist()
    p.count()
    edges = (
        p.where(F.col("score") >= 0.5)
        .select(F.col("url_a").alias("src"), F.col("url_b").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .localCheckpoint()
    )

    def v_current():
        return _large_star(edges)

    def v_prefiltered():
        # probe side filtered BEFORE the join (only dst>src rows survive)
        sym = _symmetrize(edges)
        mins = sym.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        return (
            sym.where(F.col("dst") > F.col("src"))
            .join(mins, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .distinct()
        )

    for name, fn in [("current", v_current), ("prefiltered", v_prefiltered),
                     ("current2", v_current)]:
        spark.sparkContext.setJobDescription(f"lsvar: {name}")
        timed(f"lsvar/{name}", lambda f=fn: noop(f()), reps=2)
    # identity check (filter-then-join == join-then-filter on probe cols)
    c, pf = v_current(), v_prefiltered()
    same_pf = pf.exceptAll(c).count() == 0 and c.exceptAll(pf).count() == 0
    print("  prefiltered identical:", same_pf)
    p.unpersist()
    spark.sparkContext.setJobDescription(None)


def crossdoc_parts(spark, sf_dir):
    """Stage isolation of crossdoc_duplicate_spans."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from whoiswho_spark.functions.repetition import _ngram_array
    from whoiswho_spark.functions.textstats import ws_tokens_col
    from whoiswho_spark.operators.span_dedup import crossdoc_duplicate_spans
    from whoiswho_spark.session import spread_small_input

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = spread_small_input(docs.select("doc_id", "text"))
    arr = ws_tokens_col(F.col("text"))
    base = d.select(
        F.col("doc_id").alias("_id"),
        F.size(arr).cast("bigint").alias("n_tokens"),
        F.transform(_ngram_array(arr, 8), lambda g: F.xxhash64(g)).alias("_ghs"),
    )
    spark.sparkContext.setJobDescription("crossdoc: gram hash build")
    timed("crossdoc/base_noop", lambda: noop(base), reps=2)
    grams = base.select("_id", F.posexplode("_ghs").alias("_pos", "_gh"))
    spark.sparkContext.setJobDescription("crossdoc: grams exploded")
    timed("crossdoc/grams_noop", lambda: noop(grams), reps=2)
    counts = grams.groupBy("_gh").agg(
        F.countDistinct("_id").cast("bigint").alias("_ndocs")
    )
    spark.sparkContext.setJobDescription("crossdoc: counts agg")
    timed("crossdoc/counts_noop", lambda: noop(counts), reps=2)
    dup = grams.join(
        counts.filter(F.col("_ndocs") >= 2).select("_gh"), "_gh", "inner"
    ).select("_id", F.col("_pos").alias("_start"), (F.col("_pos") + 7).alias("_end"))
    spark.sparkContext.setJobDescription("crossdoc: dup join")
    timed("crossdoc/dupjoin_noop", lambda: noop(dup), reps=2)
    ws = Window.partitionBy("_id").orderBy("_start", "_end")
    prev_max = F.max("_end").over(ws.rowsBetween(Window.unboundedPreceding, -1))
    contrib = F.greatest(
        F.lit(0),
        F.col("_end") - F.greatest(F.col("_start") - 1, F.coalesce(prev_max, F.lit(-1))),
    )
    cov = (
        dup.withColumn("_contrib", contrib)
        .groupBy("_id")
        .agg(F.sum("_contrib").cast("bigint").alias("dup_tokens"))
    )
    spark.sparkContext.setJobDescription("crossdoc: coverage window")
    timed("crossdoc/coverage_noop", lambda: noop(cov), reps=2)
    spark.sparkContext.setJobDescription("crossdoc: full")
    timed(
        "crossdoc/full",
        lambda: noop(crossdoc_duplicate_spans(docs, n=8, min_docs=2, flag_threshold=0.5)),
        reps=2,
    )
    spark.sparkContext.setJobDescription(None)


def minhash_salts(spark, sf_dir):
    """n_salts sweep for minhash_dup_pairs."""
    from whoiswho_spark.operators.dedup import minhash_dup_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for ns in (8, 16, 32):
        spark.sparkContext.setJobDescription(f"minhash: n_salts={ns}")
        timed(
            f"minhash/full_salts{ns}",
            lambda n=ns: noop(minhash_dup_pairs(docs, n_salts=n)),
            reps=2,
        )
    spark.sparkContext.setJobDescription(None)


def cc_int_encode_proto(spark, sf_dir):
    """Prototype A/B: connected components on STRING node ids (current)
    vs dense-LONG-encoded ids (string-sort-order-preserving ranks, so
    min-rank ↔ min-string and the final labels are identical).

    Motivation (plans/r06 + executed-plan read): min(dst) over STRINGS
    cannot use HashAggregate (var-length buffer) → every star round
    SORT-aggregates the full symmetrized edge list (48M string rows at
    the sf1 stand-in), and every exchange carries strings. On longs the
    same aggregate is a partial-agg HashAggregate (48M → ~n_nodes rows
    before the exchange) and rows are 16 bytes.
    """
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from whoiswho_spark.operators.blocking import minhash_signature_cols
    from whoiswho_spark.operators.clustering import (
        _local_union_find_star,
        _symmetrize,
        connected_components,
    )
    from whoiswho_spark.operators.dedup import _jaccard_sets_memo_udf, tokens_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
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
    pairs = (
        a.join(b, "block_key")
        .where(F.col("url_a") < F.col("url_b"))
        .select(
            "url_a", "url_b",
            jac(F.col("url_a"), F.col("toks_a"), F.col("url_b"), F.col("toks_b")).alias("score"),
        )
    )
    p = pairs.persist()
    p.count()
    edges = p.where(F.col("score") >= 0.5).select(
        F.col("url_a").alias("src"), F.col("url_b").alias("dst")
    )
    verts = blocks.select("url").distinct()

    reps = int(os.environ.get("CCINT_REPS", "2"))
    spark.sparkContext.setJobDescription("ccint: connected_components as shipped")
    timed(
        "ccint/cc_current",
        lambda: noop(connected_components(edges, vertices=verts)),
        reps=reps,
    )

    def cc_int():
        e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
        nodes = e.select(F.col("src").alias("node")).union(
            e.select(F.col("dst").alias("node"))
        ).distinct()
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        parted = nodes.repartitionByRange(n_parts, "node").withColumn(
            "_p", F.spark_partition_id()
        )
        w = Window.partitionBy("_p").orderBy("node")
        local = parted.select(
            "node", "_p", F.row_number().over(w).alias("_rn")
        ).localCheckpoint()
        counts = {
            r["_p"]: r["n"]
            for r in local.groupBy("_p").agg(F.count("*").alias("n")).collect()
        }
        offsets, acc = {}, 0
        for q in sorted(counts):
            offsets[q] = acc
            acc += counts[q]
        off = F.create_map(
            *[F.lit(x) for p_o in sorted(offsets.items()) for x in p_o]
        )
        ranks = local.select(
            "node", (off[F.col("_p")] + F.col("_rn")).cast("long").alias("rk")
        )
        ranks = F.broadcast(ranks)
        ei = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .withColumnRenamed("rk", "si")
            .join(
                ranks.withColumnRenamed("node", "dst").withColumnRenamed("rk", "di"),
                "dst",
            )
            .select(F.col("si").alias("src"), F.col("di").alias("dst"))
        )
        ei = ei.localCheckpoint()
        # star loop on longs (inline, no checkpoint protocol — prototype)
        prev = ei.agg(
            F.count("*").alias("n"), F.expr("bit_xor(xxhash64(src, dst))").alias("h")
        ).collect()[0]
        cur_edges = ei
        from whoiswho_spark.operators.clustering import _large_star, _small_star

        while True:
            if prev["n"] <= 1_000_000:
                cur_edges = _local_union_find_star(cur_edges).localCheckpoint()
                break
            cur_edges = _small_star(_large_star(cur_edges)).localCheckpoint()
            cur = cur_edges.agg(
                F.count("*").alias("n"),
                F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
            ).collect()[0]
            if (cur["n"], cur["h"]) == (prev["n"], prev["h"]):
                break
            prev = cur
        labels_i = (
            _symmetrize(cur_edges)
            .groupBy("src")
            .agg(F.least(F.min("dst"), F.first("src")).alias("cid"))
        )
        # decode: node rank → url, cluster rank → min url
        labels = (
            labels_i.join(ranks.withColumnRenamed("rk", "src"), "src")
            .withColumnRenamed("node", "url")
            .join(
                ranks.withColumnRenamed("rk", "cid").withColumnRenamed(
                    "node", "cluster_id"
                ),
                "cid",
            )
            .select("url", "cluster_id")
        )
        out = (
            verts.join(labels, "url", "left")
            .select("url", F.coalesce("cluster_id", F.col("url")).alias("cluster_id"))
        )
        noop(out)
        return out

    spark.sparkContext.setJobDescription("ccint: int-encoded CC")
    timed("ccint/cc_ints", lambda: cc_int(), reps=reps)
    spark.sparkContext.setJobDescription("ccint: identity check")
    cur = connected_components(edges, vertices=verts)
    new = cc_int()
    same = cur.count() == new.count() and cur.exceptAll(new).count() == 0
    print("  int-encoded CC labels identical:", same)
    p.unpersist()
    spark.sparkContext.setJobDescription(None)


def jaccard_expr_variants(spark, sf_dir):
    """A/B the er scoring EXPRESSION forms (guide §1.2 step 2), same join,
    interleaved in one JVM:

    - let: current transform-let (intersect evaluated once, but the HOF
      is CodegenFallback → the projection runs interpreted).
    - trydiv: coalesce(try_divide(i, sx+sy-i), 0.0) — i referenced twice
      but both references are UNCONDITIONAL, so whole-stage codegen's
      subexpression elimination can bind the intersect once while the
      stage stays codegen'd (conditional branches block CSE, which is
      why the naive when-form measured 389 s in round-6 session 1).
    - whensz: when(sx+sy > 0, i/(sx+sy-i)).otherwise(0.0) — the
      condition no longer references i; both i references sit in ONE
      branch (CSE eligibility within a branch is the question).
    """
    import pyspark.sql.functions as F

    from whoiswho_spark.operators.blocking import minhash_signature_cols
    from whoiswho_spark.operators.dedup import _jaccard_sets_memo_udf, tokens_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
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
    joined = a.join(b, "block_key").where(F.col("url_a") < F.col("url_b"))

    def let_form(x, y):
        return _jaccard_sets_memo_udf()(F.lit(0), x, F.lit(0), y)

    def trydiv_form(x, y):
        i = F.size(F.array_intersect(x, y))
        return F.coalesce(
            F.try_divide(i, F.size(x) + F.size(y) - i), F.lit(0.0)
        )

    def whensz_form(x, y):
        i = F.size(F.array_intersect(x, y))
        return F.when(
            F.size(x) + F.size(y) > 0, i / (F.size(x) + F.size(y) - i)
        ).otherwise(F.lit(0.0))

    forms = {"let": let_form, "trydiv": trydiv_form, "whensz": whensz_form}
    reps = int(os.environ.get("JACVAR_REPS", "2"))
    for rep in range(reps):
        for name, form in forms.items():
            pairs = joined.select(
                "url_a", "url_b",
                form(F.col("toks_a"), F.col("toks_b")).alias("score"),
            )
            spark.sparkContext.setJobDescription(f"jacvar: {name}")
            timed(f"jacvar/{name}[{rep}]", lambda p=pairs: noop(p), reps=1)
    # bit-parity of the alternates vs the current let form
    ref = joined.select(
        "url_a", "url_b", let_form(F.col("toks_a"), F.col("toks_b")).alias("score")
    )
    for name in ("trydiv", "whensz"):
        alt = joined.select(
            "url_a", "url_b",
            forms[name](F.col("toks_a"), F.col("toks_b")).alias("score"),
        )
        spark.sparkContext.setJobDescription(f"jacvar: parity {name}")
        diff = (
            ref.alias("r")
            .join(
                alt.alias("t"),
                (F.col("r.url_a") == F.col("t.url_a"))
                & (F.col("r.url_b") == F.col("t.url_b")),
            )
            .where(F.col("r.score").cast("string") != F.col("t.score").cast("string"))
            .count()
        )
        print(f"  {name} bitwise-mismatched scores vs let:", diff)
    spark.sparkContext.setJobDescription(None)


def ngram_verify_variants(spark, sf_dir):
    """A/B the ngram VERIFY leg (the ~37 s residual at the sf1 stand-in:
    full 60.9 s − cands 23.8 s). Variants:

    - arrays/id_ab: round-5 shape — distinct keyed (id_a,id_b), verify
      attaches the int-rank ARRAYS to 44M pairs (wide mid-exchange).
    - arrays/id_a: distinct repartitioned on id_a ONLY (coarser
      partitioning still satisfies the (id_a,id_b) aggregate, and the
      first verify join can reuse it — one exchange removed).
    - mask/id_ab, mask/id_a: vocab ≤ 63 ⇒ each doc's rank set is one
      64-bit BITMASK; verify joins attach 8-byte masks instead of
      arrays and |∩| = bit_count(mask_a & mask_b) — same integer
      counts, same division, bit-identical doubles.
    """
    import pyspark.sql.functions as F

    from whoiswho_spark.operators.dedup import _dense_token_ranks, tokens_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = docs.select(
        F.col("source").alias("block"),
        F.col("doc_id"),
        F.array_distinct(tokens_col(F.col("text"))).alias("toks"),
    ).withColumn("sz", F.size("toks"))
    df_tbl = (
        t.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("_df"))
    )
    ranks, _nv = _dense_token_ranks(df_tbl)
    mask_bit = F.expr("shiftleft(cast(1 as bigint), cast(rk as int))")
    ti = (
        t.select("block", "doc_id", "sz", F.explode("toks").alias("tok"))
        .join(ranks, "tok")
        .groupBy("block", "doc_id", "sz")
        .agg(
            F.sort_array(F.collect_list("rk")).alias("rks"),
            F.bit_or(mask_bit).alias("mask"),
        )
    ).localCheckpoint()
    threshold = 0.5

    def _plen(frac):
        return F.greatest(
            F.lit(1),
            (F.col("sz") - F.ceil(F.round(F.lit(frac) * F.col("sz"), 9)) + 1).cast(
                "int"
            ),
        )

    idx_frac = 2.0 * threshold / (1.0 + threshold)
    a = ti.select(
        "block",
        F.col("doc_id").alias("id_a"),
        F.col("sz").alias("sz_a"),
        F.explode(F.slice("rks", 1, _plen(idx_frac))).alias("tok"),
    )
    b = ti.select(
        "block",
        F.col("doc_id").alias("id_b"),
        F.col("sz").alias("sz_b"),
        F.explode(F.slice("rks", 1, _plen(threshold))).alias("tok"),
    )
    meets = a.join(b, ["block", "tok"]).where(
        (
            (F.col("sz_a") < F.col("sz_b"))
            | ((F.col("sz_a") == F.col("sz_b")) & (F.col("id_a") < F.col("id_b")))
        )
        & (F.col("sz_a") >= F.lit(float(threshold)) * F.col("sz_b"))
    )
    pairs = meets.select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
    )
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def verify_arrays(cands):
        inter = F.size(F.array_intersect("rks_a", "rks_b"))
        union = F.size("rks_a") + F.size("rks_b") - inter
        return (
            cands.join(
                ti.select(
                    F.col("doc_id").alias("id_a"), "block", F.col("rks").alias("rks_a")
                ),
                "id_a",
            )
            .join(
                ti.select(F.col("doc_id").alias("id_b"), F.col("rks").alias("rks_b")),
                "id_b",
            )
            .select(
                "block",
                "id_a",
                "id_b",
                F.round(inter.cast("double") / union, 6).alias("jaccard"),
            )
            .where(F.col("jaccard") >= threshold)
        )

    def verify_mask(cands):
        inter = F.bit_count(F.col("mask_a").bitwiseAND(F.col("mask_b")))
        union = F.col("sz_a") + F.col("sz_b") - inter
        return (
            cands.join(
                ti.select(
                    F.col("doc_id").alias("id_a"),
                    "block",
                    F.col("sz").alias("sz_a"),
                    F.col("mask").alias("mask_a"),
                ),
                "id_a",
            )
            .join(
                ti.select(
                    F.col("doc_id").alias("id_b"),
                    F.col("sz").alias("sz_b"),
                    F.col("mask").alias("mask_b"),
                ),
                "id_b",
            )
            .select(
                "block",
                "id_a",
                "id_b",
                F.round(inter.cast("double") / union, 6).alias("jaccard"),
            )
            .where(F.col("jaccard") >= threshold)
        )

    variants = {
        "arrays/id_ab": lambda: verify_arrays(
            pairs.repartition(n, "id_a", "id_b").distinct()
        ),
        "arrays/id_a": lambda: verify_arrays(pairs.repartition(n, "id_a").distinct()),
        "mask/id_ab": lambda: verify_mask(
            pairs.repartition(n, "id_a", "id_b").distinct()
        ),
        "mask/id_a": lambda: verify_mask(pairs.repartition(n, "id_a").distinct()),
    }
    reps = int(os.environ.get("NGRAMV2_REPS", "2"))
    for name, fn in variants.items():
        spark.sparkContext.setJobDescription(f"ngramv2: {name}")
        timed(f"ngramv2/{name}", lambda f=fn: noop(f()), reps=reps)
    # identity check: mask verify == array verify, row for row
    cur = verify_arrays(pairs.repartition(n, "id_a", "id_b").distinct())
    new = verify_mask(pairs.repartition(n, "id_a").distinct())
    spark.sparkContext.setJobDescription("ngramv2: identity check")
    same = (
        cur.count() == new.count()
        and cur.exceptAll(new).count() == 0
    )
    print("  mask/id_a result identical to arrays/id_ab:", same)
    spark.sparkContext.setJobDescription(None)


def ngram_ownership_variant(spark, sf_dir):
    """Prototype: mask-regime ngram WITHOUT the pair-distinct exchange
    and WITHOUT verify joins. Each meet row carries (id, sz, prefix
    mask, full mask) for both sides; a pair is emitted only from its
    MINIMUM shared prefix token (lowest set bit of pmask_a & pmask_b ==
    this meet's token bit) — exactly-once by construction, the minhash
    first-colliding-band trick made affordable by 8-byte masks — and the
    Jaccard verify runs inline on the full masks. The 500M-row meet
    output then never crosses an Exchange at all."""
    import pyspark.sql.functions as F

    from whoiswho_spark.operators.dedup import (
        _dense_token_ranks,
        ngram_jaccard_pairs_prefix,
        tokens_col,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    threshold = 0.5
    t = docs.select(
        F.col("source").alias("block"),
        F.col("doc_id"),
        F.array_distinct(tokens_col(F.col("text"))).alias("toks"),
    ).withColumn("sz", F.size("toks"))
    df_tbl = (
        t.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("_df"))
    )
    ranks, n_vocab = _dense_token_ranks(df_tbl)
    assert n_vocab <= 63, n_vocab

    def _plen(frac):
        return F.greatest(
            F.lit(1),
            (F.col("sz") - F.ceil(F.round(F.lit(frac) * F.col("sz"), 9)) + 1).cast(
                "int"
            ),
        )

    idx_frac = 2.0 * threshold / (1.0 + threshold)
    mask_full = F.expr(
        "aggregate(rks, cast(0 as bigint), (acc, r) -> acc | shiftleft(cast(1 as bigint), cast(r as int)))"
    )
    ti = (
        t.select("block", "doc_id", "sz", F.explode("toks").alias("tok"))
        .join(ranks, "tok")
        .groupBy("block", "doc_id", "sz")
        .agg(F.sort_array(F.collect_list("rk")).alias("rks"))
        .withColumn("fmask", mask_full)
    ).localCheckpoint()

    def prefix_side(frac, suffix):
        pmask = F.expr(
            "aggregate(slice(rks, 1, _pl), cast(0 as bigint), "
            "(acc, r) -> acc | shiftleft(cast(1 as bigint), cast(r as int)))"
        )
        return (
            ti.withColumn("_pl", _plen(frac))
            .withColumn("pmask", pmask)
            .select(
                "block",
                F.col("doc_id").alias(f"id_{suffix}"),
                F.col("sz").alias(f"sz_{suffix}"),
                F.col("pmask").alias(f"pm_{suffix}"),
                F.col("fmask").alias(f"fm_{suffix}"),
                F.explode(F.slice("rks", 1, F.col("_pl"))).alias("tok"),
            )
        )

    a = prefix_side(idx_frac, "a")
    b = prefix_side(threshold, "b")
    shared = F.col("pm_a").bitwiseAND(F.col("pm_b"))
    # emit only from the minimum shared prefix token: no shared bit
    # strictly below this meet's token bit (unsigned-shift mask — the
    # shiftleft(1,tok)-1 form ARITHMETIC_OVERFLOWs under ANSI at tok=63)
    own = shared.bitwiseAND(
        F.expr("shiftrightunsigned(cast(-1 as bigint), 64 - cast(tok as int))")
    ) == 0
    inter = F.bit_count(F.col("fm_a").bitwiseAND(F.col("fm_b")))
    union = F.col("sz_a") + F.col("sz_b") - inter
    out = (
        a.join(b, ["block", "tok"])
        .where(
            (
                (F.col("sz_a") < F.col("sz_b"))
                | ((F.col("sz_a") == F.col("sz_b")) & (F.col("id_a") < F.col("id_b")))
            )
            & (F.col("sz_a") >= F.lit(float(threshold)) * F.col("sz_b"))
            & own
        )
        .select(
            "block",
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    reps = int(os.environ.get("NGRAMV3_REPS", "2"))
    spark.sparkContext.setJobDescription("ngramv3: ownership, no distinct")
    timed("ngramv3/ownership_full", lambda: noop(out), reps=reps)
    spark.sparkContext.setJobDescription("ngramv3: current query")
    timed(
        "ngramv3/current_full",
        lambda: noop(ngram_jaccard_pairs_prefix(docs, block_col="source")),
        reps=reps,
    )
    spark.sparkContext.setJobDescription("ngramv3: identity check")
    cur = ngram_jaccard_pairs_prefix(docs, block_col="source")
    same = cur.count() == out.count() and cur.exceptAll(out).count() == 0
    print("  ownership result identical:", same)
    spark.sparkContext.setJobDescription(None)


def run_queries(spark, names):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"q: {name}")
        timed(f"query/{name}", lambda n=name: noop(qs[n](spark, SF)), reps=2)
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "er"
    spark = get_spark()
    print(f"# sf={SF} cpus={CPUS} mode={mode}")
    if mode == "er":
        er_parts(spark, SF)
    elif mode == "jaccard":
        jaccard_ab(spark, SF)
    elif mode == "erscore":
        er_score_only(spark, SF)
    elif mode == "jacdiag2":
        jaccard_diag2(spark, SF)
    elif mode == "jacdiag":
        jaccard_diag(spark, SF)
    elif mode == "jacmicro":
        jaccard_micro(spark, SF)
    elif mode == "ngramsweep":
        ngram_distinct_sweep(spark, SF)
    elif mode == "ercc":
        er_cc_parts(spark, SF)
    elif mode == "ccparts":
        cc_round_parts(spark, SF)
    elif mode == "lsvar":
        cc_large_star_variants(spark, SF)
    elif mode == "crossdoc":
        crossdoc_parts(spark, SF)
    elif mode == "minhashsalts":
        minhash_salts(spark, SF)
    elif mode == "minhash":
        minhash_parts(spark, SF)
    elif mode == "ngram":
        ngram_parts(spark, SF)
    elif mode == "ngramv2":
        ngram_verify_variants(spark, SF)
    elif mode == "jacvar":
        jaccard_expr_variants(spark, SF)
    elif mode == "ccint":
        cc_int_encode_proto(spark, SF)
    elif mode == "ngramv3":
        ngram_ownership_variant(spark, SF)
    elif mode == "queries":
        run_queries(spark, sys.argv[2:])
    spark.stop()
