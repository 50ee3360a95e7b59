"""Relational similarity from meta-path walks (SURVEY.md §2.8 'Meta-path
random walks' — the CONSUMER side that round 1 left unwired).

Reference chain (/root/reference/whoiswho/featureGenerator/sndFeature/
relational_features.py:144-173): repeat 10× { write walk corpus → gensim
Word2Vec(size=100, min_count=1, window=10) → per-paper vector (zeros +
outlier when absent) } → mean of the 10 cosine-DISTANCE matrices; blended
with the semantic matrix as ``(rel + w·sem) / (1 + w)``
(training/AutoTrainSND.py:239-243) and fed to DBSCAN.

Spark re-expression — sparse and pairwise, never a dense N×N matrix:

- walks come from operators.walks.meta_path_walks (seeded hash picks →
  deterministic, unlike the reference's unseeded random.choice;
  SURVEY §7.3 determinism note). Each repeat uses a distinct derived seed.
- Word2Vec is Spark ML (hierarchical softmax; the reference's gensim
  ``negative=25`` sampling has no Spark ML twin — substitution noted).
- distances are computed ONLY for the candidate pairs the blocking stage
  produced: vectors join the pair table on each side, one Arrow-batched
  cosine per repeat, mean across repeats. A node the walk corpus never
  saw (no edges — the reference's zero-vector case) contributes
  distance 1.0, sklearn's zero-norm cosine convention.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whoiswho_spark.operators.ann import cosine_batch_udf
from whoiswho_spark.operators.clustering_dbscan import dbscan_precomputed
from whoiswho_spark.operators.embeddings import train_word2vec
from whoiswho_spark.operators.walks import meta_path_walks


def relational_pair_distances(
    edges: DataFrame,
    pairs: DataFrame,
    repeat_num: int = 2,
    num_walks: int = 5,
    walk_len: int = 20,
    rw_dim: int = 100,
    window: int = 10,
    seed: int = 42,
    starts: DataFrame | None = None,
    src: str = "url_a",
    dst: str = "url_b",
    deterministic: bool = True,
) -> DataFrame:
    """edges(pid, token) + pairs(url_a, url_b) → (url_a, url_b, rel_dist).

    rel_dist = mean over ``repeat_num`` seeded repeats of the cosine
    distance between the two nodes' walk embeddings — the pairwise slice
    of the reference's averaged matrix (relational_features.py:166-171).
    Deterministic: repeat k uses seed ``seed + 1000·k`` for both the walk
    corpus and the Word2Vec fit.
    """
    pair_keys = pairs.select(src, dst).distinct()
    per_repeat = []
    for k in range(repeat_num):
        rep_seed = seed + 1000 * k
        walks = meta_path_walks(
            edges,
            n_walks=num_walks,
            walk_len=walk_len,
            seed=rep_seed,
            starts=starts,
        )
        corpus = walks.select("walk_id", F.col("path").alias("tokens"))
        if deterministic:
            # Word2Vec is sensitive to row ORDER, and shuffle fetch order
            # is nondeterministic run-to-run — a total sort collapsed to
            # one partition pins it (w2v's internal repartition is then
            # deterministic too). Exactness mode for tests/moderate
            # corpora; pass False at full scale to keep the sort out and
            # accept the reference's own level of run jitter (its walks
            # are unseeded random).
            corpus = corpus.orderBy("walk_id").coalesce(1)
        model = train_word2vec(
            corpus.select("tokens"),
            vector_size=rw_dim,
            min_count=1,
            window=window,
            seed=rep_seed,
            # single-partition fit in deterministic mode: multi-partition
            # w2v merges float gradients in task-completion order
            num_partitions=1 if deterministic else 4,
        )
        from pyspark.ml.functions import vector_to_array

        vecs = model.getVectors().select(
            F.col("word").alias("_node"), vector_to_array("vector").alias("_vec")
        )
        d = (
            pair_keys.join(
                vecs.select(
                    F.col("_node").alias(src), F.col("_vec").alias("_vec_a")
                ),
                src,
                "left",
            )
            .join(
                vecs.select(
                    F.col("_node").alias(dst), F.col("_vec").alias("_vec_b")
                ),
                dst,
                "left",
            )
            .select(
                src,
                dst,
                # a node the corpus never saw gets the zero vector, which
                # the clamped-norm cosine maps to similarity 0 → distance 1
                # (sklearn's zero-norm convention). Coalesce rather than a
                # when() guard: pandas UDFs are evaluated for every row of
                # the batch regardless of the branch.
                (
                    F.lit(1.0)
                    - cosine_batch_udf(
                        F.coalesce("_vec_a", F.array_repeat(F.lit(0.0), rw_dim)),
                        F.coalesce("_vec_b", F.array_repeat(F.lit(0.0), rw_dim)),
                    )
                ).alias("_d"),
            )
        )
        per_repeat.append(d)
    unioned = per_repeat[0]
    for d in per_repeat[1:]:
        unioned = unioned.unionByName(d)
    return unioned.groupBy(src, dst).agg(
        F.avg("_d").alias("rel_dist")
    )


def relational_outliers(edges: DataFrame, universe: DataFrame,
                        node_col: str = "pid") -> DataFrame:
    """Nodes with no relations — the reference's rel_outliers set
    (zeros-vector rows at relational_features.py:159-163): universe
    members absent from the edge table. (url)."""
    return (
        universe.select(F.col(node_col).alias("url"))
        .distinct()
        .join(
            edges.select(F.col(node_col).alias("url")).distinct(),
            "url",
            "left_anti",
        )
    )


def blend_pair_distances(
    rel: DataFrame,
    sem: DataFrame,
    text_weight: float = 1.0,
    src: str = "url_a",
    dst: str = "url_b",
) -> DataFrame:
    """(rel + w·sem) / (1 + w) per pair (AutoTrainSND.py:239-243).
    Full-outer on the pair key; a side missing a pair contributes the
    max distance 1.0 (the matrices' default for never-compared pairs)."""
    j = rel.join(sem, [src, dst], "outer")
    w = float(text_weight)
    return j.select(
        src,
        dst,
        (
            (F.coalesce("rel_dist", F.lit(1.0)) + F.lit(w) * F.coalesce("sem_dist", F.lit(1.0)))
            / F.lit(1.0 + w)
        ).alias("dist"),
    )


def cluster_blocks_dbscan_pairs(
    members: DataFrame,
    pair_dists: DataFrame,
    eps: float = 0.2,
    min_samples: int = 4,
    id_col: str = "url",
) -> DataFrame:
    """Per-block DBSCAN on PRECOMPUTED pair distances — the reference's
    exact shape (``self.model.fit(dis)``, AutoTrainSND.py:245): members
    (block_key, url) + pair_dists (block_key, url_a, url_b, dist) →
    (block_key, url, label).

    Cogrouped applyInPandas: one task assembles a block's dense matrix
    (default distance 1.0, diagonal 0, symmetric fill) and runs the
    sklearn-parity DBSCAN. Same memory contract as cluster_blocks_dbscan:
    cap block sizes upstream.
    """

    def _cluster(mem: pd.DataFrame, pd_pairs: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(mem[id_col].unique())
        if not ids:
            return pd.DataFrame({"block_key": [], id_col: [], "label": []})
        idx = {u: i for i, u in enumerate(ids)}
        n = len(ids)
        D = np.ones((n, n))
        np.fill_diagonal(D, 0.0)
        for a, b, d in zip(pd_pairs["url_a"], pd_pairs["url_b"], pd_pairs["dist"]):
            ia, ib = idx.get(a), idx.get(b)
            if ia is None or ib is None:
                continue
            D[ia, ib] = D[ib, ia] = d
        labels = dbscan_precomputed(D, eps, min_samples)
        return pd.DataFrame(
            {
                "block_key": [mem["block_key"].iat[0]] * n,
                id_col: ids,
                "label": labels,
            }
        )

    return (
        members.select("block_key", id_col)
        .distinct()
        .groupBy("block_key")
        .cogroup(pair_dists.groupBy("block_key"))
        .applyInPandas(_cluster, schema=f"block_key string, {id_col} string, label bigint")
    )
