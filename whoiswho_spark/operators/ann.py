"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k (exact). Scale path: LSH-bucketed
(random-hyperplane signs, deterministic seeded planes) so candidate
generation shuffles on a bucket key instead of replicating the corpus to
every query. The reference's analog is the per-block dense cosine matrix
(/root/reference/whoiswho/featureGenerator/sndFeature/
semantic_features.py:149-156) — which cannot exist at 10^12 rows; these
operators are the sparse re-expression.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType
from pyspark.sql.window import Window

from whoiswho_spark.functions.similarity import cosine_col


@pandas_udf(DoubleType())
def cosine_batch_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """One numpy matmul per Arrow batch — the fast path for 64+ dim
    embeddings (element-wise Catalyst aggregate walks arrays ~10× slower)."""
    ma = np.asarray([np.asarray(v, dtype=np.float64) for v in a])
    mb = np.asarray([np.asarray(v, dtype=np.float64) for v in b])
    na = np.maximum(np.linalg.norm(ma, axis=1), 1e-12)
    nb = np.maximum(np.linalg.norm(mb, axis=1), 1e-12)
    return pd.Series((ma * mb).sum(axis=1) / (na * nb))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    use_catalyst_cosine: bool = False,
) -> DataFrame:
    """(query_id, neighbor_id, cos, rank) exact top-k by cosine.

    Cross-join then window top-k; Catalyst broadcasts the smaller side.
    Ranking uses round(cos, 6) with id tie-break so results are stable
    across engines and runs. Exact baseline — quadratic by design; use
    lsh_bucketed_topk at scale.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("c_emb")
    )
    cos = (
        cosine_col(F.col("q_emb"), F.col("c_emb"))
        if use_catalyst_cosine
        else cosine_batch_udf(F.col("q_emb"), F.col("c_emb"))
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rs = np.random.RandomState(seed)
    return rs.randn(n_planes, dim).tolist()


def lsh_bucket_col(emb, planes: list[list[float]]):
    """Sign-bucket: bit b = 1 iff emb·plane_b > 0 — pure Catalyst (dot via
    zip_with/aggregate over broadcast plane literals)."""
    bits = []
    for p in planes:
        dot = F.aggregate(
            F.zip_with(
                emb,
                F.array(*[F.lit(float(x)) for x in p]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: join only within matching sign-buckets (the IVF/
    LSH scale path — shuffle on bucket, corpus never replicated). Recall
    is tunable via n_planes (fewer planes → bigger buckets → higher
    recall, more compute)."""
    planes = _hyperplanes(dim, n_planes)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        lsh_bucket_col(F.col(emb_col), planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("c_emb"),
        lsh_bucket_col(F.col(emb_col), planes).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_batch_udf(F.col("q_emb"), F.col("c_emb")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def brute_force_topk_blas(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact top-k via broadcast-corpus matmul: the corpus matrix rides a
    broadcast variable; each query partition does ONE BLAS matmul and a
    partial top-k — no pair-row materialization, no shuffle except the
    final (tiny) result. This is the plan shape that survives scale-up:
    the broadcast side becomes IVF centroids / a bucketed corpus shard.

    Result-identical to brute_force_topk (same round(cos,6) + id
    tie-break ordering), pytest-verified.
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    corpus_rows = corpus.select(id_col, emb_col).collect()
    c_ids = np.asarray([r[id_col] for r in corpus_rows])
    c_mat = np.asarray([np.asarray(r[emb_col], dtype=np.float64) for r in corpus_rows])
    c_mat /= np.maximum(np.linalg.norm(c_mat, axis=1, keepdims=True), 1e-12)
    bc = spark.sparkContext.broadcast((c_ids, c_mat))

    def topk_batches(batches):
        ids, mat = bc.value
        order_ids = np.argsort(ids, kind="stable")
        for pdf in batches:
            q_ids = pdf[id_col].to_numpy()
            q = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[emb_col]])
            q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
            sims = np.round(q @ mat.T, 6)
            out = {"query_id": [], "neighbor_id": [], "cos": [], "rank": []}
            for i, qid in enumerate(q_ids):
                row = sims[i]
                mask = ids != qid
                cand = np.flatnonzero(mask)
                # top-k by (-cos, id): partial-select then exact sort
                take = min(k + 1, len(cand))
                part = cand[np.argpartition(-row[cand], take - 1)[:take]]
                part = sorted(part, key=lambda j: (-row[j], ids[j]))[:k]
                for r, j in enumerate(part, 1):
                    out["query_id"].append(qid)
                    out["neighbor_id"].append(ids[j])
                    out["cos"].append(float(row[j]))
                    out["rank"].append(r)
            yield pd.DataFrame(out)

    return queries.select(id_col, emb_col).mapInPandas(
        topk_batches,
        schema="query_id bigint, neighbor_id bigint, cos double, rank int",
    )


def embedding_neardup_pairs_blas(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact near-dup pairs via broadcast matmul: each partition multiplies
    its slice against the broadcast corpus and emits only (id_a < id_b,
    cos ≥ τ) survivors — the 12.5M-row pair shuffle of the join plan
    becomes a few-thousand-row result. Result-identical to
    embedding_neardup_pairs (pytest-verified).

    Scale note: broadcast works to ~10^7 vectors (GBs); beyond that,
    LSH-bucket first (embedding_neardup_pairs with n_planes>0) and run
    this kernel per bucket.
    """
    import numpy as np
    import pandas as pd

    spark = vectors.sparkSession
    rows = vectors.select(id_col, emb_col).collect()
    ids = np.asarray([r[id_col] for r in rows])
    mat = np.asarray([np.asarray(r[emb_col], dtype=np.float64) for r in rows])
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    bc = spark.sparkContext.broadcast((ids, mat))

    def neardup_batches(batches):
        c_ids, c_mat = bc.value
        for pdf in batches:
            q_ids = pdf[id_col].to_numpy()
            q = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[emb_col]])
            q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
            sims = np.round(q @ c_mat.T, 6)
            ii, jj = np.nonzero((sims >= threshold) & (q_ids[:, None] < c_ids[None, :]))
            yield pd.DataFrame(
                {
                    "id_a": q_ids[ii],
                    "id_b": c_ids[jj],
                    "cos": sims[ii, jj],
                }
            )

    return vectors.select(id_col, emb_col).mapInPandas(
        neardup_batches, schema="id_a bigint, id_b bigint, cos double"
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    n_centroids: int = 16,
    n_probe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: Spark ML KMeans coarse quantizer (seeded) →
    corpus sharded by nearest centroid → each query probes its n_probe
    nearest centroids → exact cosine within probed shards → window top-k.

    The inverted-file scale path: corpus shuffles ONCE on centroid id;
    queries fan out n_probe× (not |corpus|×). Recall is tunable via
    n_probe (= n_centroids → exact). Deterministic given the seed.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.window import Window as W

    corpus_v = corpus.select(
        id_col, emb_col, array_to_vector(F.col(emb_col).cast("array<double>")).alias("_v")
    )
    km = KMeans(k=n_centroids, seed=seed, featuresCol="_v", predictionCol="_c")
    model = km.fit(corpus_v)
    centroids = model.clusterCenters()

    c_assigned = model.transform(corpus_v).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("c_emb"),
        F.col("_c").alias("centroid"),
    )

    import numpy as np

    cents = np.asarray([np.asarray(c) for c in centroids])
    bc = queries.sparkSession.sparkContext.broadcast(cents)

    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType

    def probes(emb: pd.Series) -> pd.Series:
        cs = bc.value
        out = []
        for v in emb:
            q = np.asarray(v, dtype=np.float64)
            d = ((cs - q) ** 2).sum(axis=1)
            out.append(np.argsort(d, kind="stable")[:n_probe].astype("int32").tolist())
        return pd.Series(out)

    probes.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    probes_udf = pandas_udf(probes, ArrayType(IntegerType()))

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        F.explode(probes_udf(F.col(emb_col))).alias("centroid"),
    )
    scored = (
        q.join(c_assigned, "centroid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_batch_udf(F.col("q_emb"), F.col("c_emb")), 6).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ann_recall_at_k(approx: DataFrame, exact: DataFrame, k: int = 5) -> float:
    """recall@k of an approximate ANN result vs the exact top-k
    (both (query_id, neighbor_id, rank))."""
    a = approx.where(F.col("rank") <= k).select("query_id", "neighbor_id")
    e = exact.where(F.col("rank") <= k).select("query_id", "neighbor_id")
    hit = a.join(e, ["query_id", "neighbor_id"]).count()
    total = e.count()
    return hit / total if total else 0.0


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 0,
    dim: int = 64,
) -> DataFrame:
    """(id_a, id_b, cos) pairs with cosine ≥ threshold.

    n_planes=0 → exact all-pairs (test scale); n_planes>0 → LSH-bucketed
    (near-dups almost surely share the sign bucket at high thresholds).
    """
    if n_planes > 0:
        planes = _hyperplanes(dim, n_planes)
        v = vectors.select(
            F.col(id_col),
            F.col(emb_col),
            lsh_bucket_col(F.col(emb_col), planes).alias("bucket"),
        )
        join_keys = ["bucket"]
    else:
        v = vectors.select(F.col(id_col), F.col(emb_col), F.lit(0).alias("bucket"))
        join_keys = ["bucket"]
    a = v.select(
        *join_keys, F.col(id_col).alias("id_a"), F.col(emb_col).alias("emb_a")
    )
    b = v.select(
        *join_keys, F.col(id_col).alias("id_b"), F.col(emb_col).alias("emb_b")
    )
    return (
        a.join(b, join_keys)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_batch_udf(F.col("emb_a"), F.col("emb_b")), 6).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )
