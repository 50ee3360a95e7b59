"""Relational-similarity channel: walks → Word2Vec → mean cosine distance
→ blend — reference relational_features.py:144-173 + AutoTrainSND.py:
239-243 semantics."""

import numpy as np
from pyspark.sql import functions as F

from whoiswho_spark.operators.relational import (
    blend_pair_distances,
    cluster_blocks_dbscan_pairs,
    relational_outliers,
    relational_pair_distances,
)


def _toy_graph(spark):
    # two token-communities: {a,b,c} share tokens, {x,y} share tokens
    edges = spark.createDataFrame(
        [
            ("a", "t1"), ("a", "t2"), ("b", "t1"), ("b", "t2"),
            ("c", "t2"), ("x", "t9"), ("y", "t9"),
        ],
        "pid string, token string",
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "x"), ("x", "y"), ("a", "zz")],
        "url_a string, url_b string",
    )
    return edges, pairs


def test_relational_distances_deterministic_and_bounded(spark):
    edges, pairs = _toy_graph(spark)
    got1 = {
        (r["url_a"], r["url_b"]): r["rel_dist"]
        for r in relational_pair_distances(edges, pairs, repeat_num=2).collect()
    }
    got2 = {
        (r["url_a"], r["url_b"]): r["rel_dist"]
        for r in relational_pair_distances(edges, pairs, repeat_num=2).collect()
    }
    assert got1 == got2  # seeded walks + seeded w2v → identical reruns
    assert set(got1) == {("a", "b"), ("a", "x"), ("x", "y"), ("a", "zz")}
    for d in got1.values():
        assert -1e-9 <= d <= 2.0 + 1e-9
    # zz has no walk embedding → zero-vector convention, distance exactly 1
    assert got1[("a", "zz")] == 1.0
    # same-community pairs should be closer than cross-community
    assert got1[("a", "b")] < got1[("a", "x")]


def test_relational_outliers(spark):
    edges, _ = _toy_graph(spark)
    uni = spark.createDataFrame([("a",), ("x",), ("zz",)], "pid string")
    got = {r["url"] for r in relational_outliers(edges, uni).collect()}
    assert got == {"zz"}


def test_blend_pair_distances_formula(spark):
    rel = spark.createDataFrame(
        [("a", "b", 0.2), ("a", "c", 0.4)], "url_a string, url_b string, rel_dist double"
    )
    sem = spark.createDataFrame(
        [("a", "b", 0.6), ("a", "d", 0.0)], "url_a string, url_b string, sem_dist double"
    )
    got = {
        (r["url_a"], r["url_b"]): r["dist"]
        for r in blend_pair_distances(rel, sem, text_weight=2.0).collect()
    }
    assert abs(got[("a", "b")] - (0.2 + 2.0 * 0.6) / 3.0) < 1e-12
    # missing sem side defaults to 1.0 (matrix default)
    assert abs(got[("a", "c")] - (0.4 + 2.0 * 1.0) / 3.0) < 1e-12
    assert abs(got[("a", "d")] - (1.0 + 2.0 * 0.0) / 3.0) < 1e-12


def test_dbscan_pairs_matches_embedding_path(spark):
    """Feeding the precomputed-pairs DBSCAN the same cosine distances the
    embedding path computes internally must give identical labels."""
    from whoiswho_spark.operators.clustering_dbscan import cluster_blocks_dbscan

    rng = np.random.RandomState(5)
    base = rng.randn(3, 8)
    rows = []
    for i in range(12):
        v = base[i % 3] + rng.randn(8) * 0.01
        rows.append(("blk", f"u{i:02d}", [float(x) for x in v]))
    df = spark.createDataFrame(rows, "block_key string, url string, embedding array<double>")

    want = {
        (r["url"]): r["label"]
        for r in cluster_blocks_dbscan(df, eps=0.2, min_samples=3).collect()
    }

    a = df.select("block_key", F.col("url").alias("url_a"), F.col("embedding").alias("ea"))
    b = df.select("block_key", F.col("url").alias("url_b"), F.col("embedding").alias("eb"))
    from whoiswho_spark.operators.ann import cosine_batch_udf

    pair_d = (
        a.join(b, "block_key")
        .where(F.col("url_a") < F.col("url_b"))
        .select(
            "block_key", "url_a", "url_b",
            (F.lit(1.0) - cosine_batch_udf(F.col("ea"), F.col("eb"))).alias("dist"),
        )
    )
    got = {
        (r["url"]): r["label"]
        for r in cluster_blocks_dbscan_pairs(
            df.select("block_key", "url"),
            pair_d.localCheckpoint(),  # sever the self-join lineage
            eps=0.2,
            min_samples=3,
        ).collect()
    }
    assert got == want and len(got) == 12
