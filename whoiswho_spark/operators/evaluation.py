"""Distributed pairwise precision/recall/F1 (SNDeval semantics).

The reference metric (/root/reference/whoiswho/evaluation/SNDeval.py:47-70)
counts, per name-block, over all labeled item pairs:
    TP_FN = # same-truth pairs, TP_FP = # same-pred pairs,
    TP    = # pairs same in both; P = TP/TP_FP, R = TP/TP_FN,
    F1    = 2PR/(P+R); all three = 0 when TP == 0,
then macro-averages F1 over blocks (SNDeval.py:9-43).

The O(N²) loops decompose into pure aggregations (SURVEY.md §2.5):
    Σ_cluster C(n,2)  via groupBy(...).count()
so the metric itself scales — no pair materialization, three shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pairs(n):  # C(n,2)
    return (n * (n - 1) / 2).cast("double")


def pairwise_scores_per_block(labeled: DataFrame) -> DataFrame:
    """labeled(block_key, url, truth, pred) →
    (block_key, precision, recall, f1) with exact SNDeval zero-handling."""
    tp_fn = (
        labeled.groupBy("block_key", "truth")
        .agg(F.count("*").alias("n"))
        .groupBy("block_key")
        .agg(F.sum(_pairs(F.col("n"))).alias("tp_fn"))
    )
    tp_fp = (
        labeled.groupBy("block_key", "pred")
        .agg(F.count("*").alias("n"))
        .groupBy("block_key")
        .agg(F.sum(_pairs(F.col("n"))).alias("tp_fp"))
    )
    tp = (
        labeled.groupBy("block_key", "truth", "pred")
        .agg(F.count("*").alias("n"))
        .groupBy("block_key")
        .agg(F.sum(_pairs(F.col("n"))).alias("tp"))
    )
    # Blocks with no same-truth pair (tp_fn == 0) are excluded: SNDeval is
    # only ever applied to name blocks that contain multi-paper authors, so
    # its TP==0 → F1=0 rule never fires on a block with zero positive pairs;
    # LSH produces many singleton/all-distinct blocks where that rule would
    # spuriously zero a perfect prediction.
    j = (
        tp_fn.where(F.col("tp_fn") > 0)
        .join(tp_fp, "block_key")
        .join(tp, "block_key")
    )
    p = F.when(F.col("tp") == 0, F.lit(0.0)).otherwise(F.col("tp") / F.col("tp_fp"))
    r = F.when(F.col("tp") == 0, F.lit(0.0)).otherwise(F.col("tp") / F.col("tp_fn"))
    f1 = F.when(F.col("tp") == 0, F.lit(0.0)).otherwise(
        2 * p * r / (p + r)
    )
    return j.select(
        "block_key",
        p.alias("precision"),
        r.alias("recall"),
        f1.alias("f1"),
    )


def macro_pairwise_f1(labeled: DataFrame) -> float:
    """Macro-average F1 over blocks — the reference's Average Pairwise F1
    (SNDeval.py:39-42). Driver-side scalar; one extra aggregate."""
    row = (
        pairwise_scores_per_block(labeled)
        .agg(F.avg("f1").alias("avg_f1"))
        .collect()[0]
    )
    return float(row["avg_f1"]) if row["avg_f1"] is not None else 0.0


def labeled_block_view(
    blocks: DataFrame, labels: DataFrame, clusters: DataFrame
) -> DataFrame:
    """Assemble the eval input: labeled urls restricted to their blocking
    keys (the F1 gate evaluates only labeled pairs sharing a blocking key,
    BASELINE.json) with truth = entity_id and pred = cluster_id."""
    return (
        blocks.select("block_key", "url")
        .join(labels.select("url", F.col("entity_id").alias("truth")), "url")
        .join(clusters.select("url", F.col("cluster_id").alias("pred")), "url")
    )
