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


def _topk_tie_safe(row: "np.ndarray", cand: "np.ndarray", ids: "np.ndarray", k: int):
    """Indices (into ``ids``) of the top-k candidates by (-cos, id).

    Tie-safe: argpartition selects by value only, so the k-th boundary
    value's ties are all widened into the exact (-cos, id) sort — a
    value-only k+1 partial select can drop the smallest-id tied neighbor
    (duplicate/zero embeddings after round-to-6dp make boundary ties
    real)."""
    if len(cand) > k:
        part_idx = np.argpartition(-row[cand], k - 1)[:k]
        kth = row[cand[part_idx]].min()
        cand = cand[row[cand] >= kth]
    return sorted(cand, key=lambda j: (-row[j], ids[j]))[:k]


def _norm_rows(vals) -> "np.ndarray":
    m = np.asarray([np.asarray(v, dtype=np.float64) for v in vals])
    if m.size == 0:
        return m.reshape(0, 0)
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def sharded_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_shards: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k with NO driver-side corpus collect — the
    distributed twin of brute_force_topk_blas and the contract plan.

    Shape: corpus hash-shards ONCE on ``pmod(xxhash64(id), n_shards)``;
    queries replicate n_shards× (queries ≪ corpus by assumption). Each
    shard group runs one BLAS matmul + per-query tie-safe partial top-k
    (applyInPandas), emitting ≤ k candidates per (query, shard); a final
    window top-k over the n_shards·k-row candidate table gives the global
    answer. Exactness: (-cos, id) is a strict total order, so every global
    top-k member is in its shard's top-k. Per-task memory = |corpus| /
    n_shards — tune n_shards to the executor, never the driver.

    Result-identical to brute_force_topk (same round(cos,6) + id
    tie-break), pytest-verified.
    """
    c = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(emb_col).alias("_emb"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).alias("_shard"),
        F.lit("c").alias("_role"),
    )
    q = queries.select(
        F.col(id_col).alias("_id"),
        F.col(emb_col).alias("_emb"),
        F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1))).alias("_shard"),
        F.lit("q").alias("_role"),
    )

    def shard_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": [], "neighbor_id": [], "cos": []})
        cm = pdf[pdf["_role"] == "c"]
        qm = pdf[pdf["_role"] == "q"]
        if cm.empty or qm.empty:
            return empty
        ids = cm["_id"].to_numpy()
        mat = _norm_rows(cm["_emb"])
        q_ids = qm["_id"].to_numpy()
        q_mat = _norm_rows(qm["_emb"])
        sims = np.round(q_mat @ mat.T, 6)
        out = {"query_id": [], "neighbor_id": [], "cos": []}
        for i, qid in enumerate(q_ids):
            row = sims[i]
            cand = np.flatnonzero(ids != qid)
            for j in _topk_tie_safe(row, cand, ids, k):
                out["query_id"].append(qid)
                out["neighbor_id"].append(ids[j])
                out["cos"].append(float(row[j]))
        return pd.DataFrame(out)

    # id type follows the input schema (string-keyed corpora serialize
    # through Arrow exactly like bigint ones; the tie-break order is the
    # column type's natural order on both sides)
    _idt = corpus.schema[id_col].dataType.simpleString()
    cands = (
        c.unionByName(q)
        .groupBy("_shard")
        .applyInPandas(
            shard_topk, schema=f"query_id {_idt}, neighbor_id {_idt}, cos double"
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return cands.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def sharded_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_shards: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bucket: "F.Column | None" = None,
) -> DataFrame:
    """Exact cosine near-dup pairs with NO driver-side collect — the
    blocked all-pairs matmul and the contract plan.

    Shape: hash-shard on id into n_shards pieces; every unordered pair of
    shards (i ≤ j) is one group, so each row replicates n_shards+1× and
    each task multiplies two shard matrices (memory 2·|corpus|/n_shards).
    n_shards trades replication O(P) against per-task memory O(n/P) —
    the classic exact blocked scheme. ``bucket`` (any Column over the
    input row, e.g. an LSH sign bucket) composes the bound: the blocked
    kernel runs WITHIN each bucket and per-task memory becomes
    2·|bucket|/n_shards — the 100 TB composition
    ``lsh_sharded_neardup_pairs`` wraps. Exact over all pairs when
    ``bucket`` is None (the oracle-checked default).

    Result-identical to embedding_neardup_pairs_blas (pytest-verified).
    """
    bkt = F.lit(0) if bucket is None else bucket
    v = vectors.select(
        F.col(id_col).alias("_id"),
        F.col(emb_col).alias("_emb"),
        bkt.alias("_bkt"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).alias("_s"),
    )
    # row with shard s is the A side of blocks (s, j≥s) and the B side of
    # blocks (i≤s, s); each unordered pair of rows meets in exactly one block
    a_side = v.select(
        "_id",
        "_emb",
        "_bkt",
        F.col("_s").alias("_bi"),
        F.explode(F.sequence(F.col("_s"), F.lit(n_shards - 1))).alias("_bj"),
        F.lit("a").alias("_role"),
    )
    b_side = v.select(
        "_id",
        "_emb",
        "_bkt",
        F.explode(F.sequence(F.lit(0), F.col("_s"))).alias("_bi"),
        F.col("_s").alias("_bj"),
        F.lit("b").alias("_role"),
    )

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
        am = pdf[pdf["_role"] == "a"]
        bm = pdf[pdf["_role"] == "b"]
        if am.empty or bm.empty:
            return empty
        same_block = pdf["_bi"].iat[0] == pdf["_bj"].iat[0]
        a_ids = am["_id"].to_numpy()
        b_ids = bm["_id"].to_numpy()
        a_mat = _norm_rows(am["_emb"])
        b_mat = _norm_rows(bm["_emb"])
        sims = np.round(a_mat @ b_mat.T, 6)
        keep = sims >= threshold
        if same_block:
            # A set == B set here: the id inequality takes each pair once
            keep &= a_ids[:, None] < b_ids[None, :]
        ii, jj = np.nonzero(keep)
        lo = np.minimum(a_ids[ii], b_ids[jj])
        hi = np.maximum(a_ids[ii], b_ids[jj])
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cos": sims[ii, jj]})

    _idt = vectors.schema[id_col].dataType.simpleString()
    return (
        a_side.unionByName(b_side)
        .groupBy("_bkt", "_bi", "_bj")
        .applyInPandas(block_pairs, schema=f"id_a {_idt}, id_b {_idt}, cos double")
    )


def lsh_sharded_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    n_shards: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """THE 100 TB embedding-near-dup composition: LSH sign-bucket first
    (near-dups almost surely agree on every plane sign at high
    thresholds), then the blocked shard-pair matmul WITHIN each bucket —
    per-task memory 2·|bucket|/n_shards, no driver collect, no per-pair
    row materialization (the join-plan LSH path pays a pandas-UDF call
    per pair and puts a mega-bucket's quadratic on one task; here a hot
    bucket is split across n_shards² block tasks, the same defusal the
    exact plan uses globally).

    Result-identical to ``embedding_neardup_pairs(n_planes=n_planes)``
    (same bucket definition, exact within buckets — pytest-gated);
    recall vs the exact all-pairs answer is the usual LSH trade,
    measured by the recall test."""
    planes = _hyperplanes(dim, n_planes)
    return sharded_neardup_pairs(
        vectors,
        threshold=threshold,
        n_shards=n_shards,
        id_col=id_col,
        emb_col=emb_col,
        bucket=lsh_bucket_col(F.col(emb_col), planes),
    )


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
                part = _topk_tie_safe(row, cand, ids, k)
                for r, j in enumerate(part, 1):
                    out["query_id"].append(qid)
                    out["neighbor_id"].append(ids[j])
                    out["cos"].append(float(row[j]))
                    out["rank"].append(r)
            yield pd.DataFrame(out)

    # id type follows the input schema, like the sharded contract plans
    _idt = corpus.schema[id_col].dataType.simpleString()
    return queries.select(id_col, emb_col).mapInPandas(
        topk_batches,
        schema=f"query_id {_idt}, neighbor_id {_idt}, cos double, rank int",
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

    # id type follows the input schema, like the sharded contract plans
    _idt = vectors.schema[id_col].dataType.simpleString()
    return vectors.select(id_col, emb_col).mapInPandas(
        neardup_batches, schema=f"id_a {_idt}, id_b {_idt}, cos double"
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
