"""Semantic embedding stage — Word2Vec + mean-pooled doc vectors.

The reference trains gensim word2vec (size 100, window 5, neg 5,
min_count 5) over the plain-text corpus and mean-pools token vectors per
paper, flagging papers with no in-vocabulary tokens as outliers
(/root/reference/whoiswho/featureGenerator/sndFeature/
semantic_features.py:32-40, 124-132; BOND 256-dim variant
bond/train_w2v.py:97-104, 188-198).

Spark-first: ``pyspark.ml.feature.Word2Vec`` (distributed skip-gram) for
training; mean-pooling via explode → broadcast vocab join →
``Summarizer.mean`` grouped aggregate (no dense matrices on the driver,
no per-row Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_word2vec(
    corpus: DataFrame,
    tokens_col: str = "tokens",
    vector_size: int = 100,
    min_count: int = 5,
    window: int = 5,
    seed: int = 42,
    num_partitions: int = 4,
):
    """Fit Spark ML Word2Vec with the reference hyperparameters
    (semantic_features.py:33-39); returns the fitted model.

    ``num_partitions=1`` makes the fit bit-reproducible (multi-partition
    training merges float gradients in task-completion order); >1 trades
    exact reproducibility for parallel training."""
    from pyspark.ml.feature import Word2Vec

    w2v = Word2Vec(
        vectorSize=vector_size,
        minCount=min_count,
        windowSize=window,
        seed=seed,
        inputCol=tokens_col,
        outputCol="_w2v",
        numPartitions=num_partitions,
        maxIter=1,
    )
    return w2v.fit(corpus.select(tokens_col))


def doc_embeddings(
    docs: DataFrame,
    model,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """(id, tokens) → (id, embedding ARRAY<DOUBLE>, is_outlier).

    Mean of token vectors over in-vocab tokens (semantic_features.py:
    124-132): explode tokens → broadcast-join vocab vectors →
    Summarizer.mean per doc. Docs with no in-vocab token get a zero
    vector + outlier flag (the outlier set that feeds post_match).
    """
    from pyspark.ml.functions import vector_to_array
    from pyspark.ml.stat import Summarizer

    vecs = model.getVectors().select("word", F.col("vector").alias("_vec"))
    dim = model.getVectorSize()

    exploded = docs.select(
        F.col(id_col), F.explode_outer(F.col(tokens_col)).alias("word")
    )
    joined = exploded.join(F.broadcast(vecs), "word")  # inner: in-vocab only
    pooled = joined.groupBy(id_col).agg(
        vector_to_array(Summarizer.mean(F.col("_vec"))).alias("embedding"),
        F.count("*").alias("_n"),
    )
    zero = F.array(*[F.lit(0.0) for _ in range(dim)])
    return (
        docs.select(id_col)
        .distinct()
        .join(pooled, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("embedding", zero).alias("embedding"),
            F.col("_n").isNull().alias("is_outlier"),
        )
    )
