"""RND weighted-F1 evaluation + lv2 stacking features (SURVEY.md §2.5).

- ``weighted_f1``: the reference's assignment metric
  (/root/reference/whoiswho/evaluation/RNDeval.py:3-45): per ground-truth
  author, precision = |gt ∩ pred|/max(|pred|,1) and recall =
  |gt ∩ pred|/max(|gt|,1) (each rounded to 6), weight = round(|gt|/total,6);
  weighted P/R are weight-sums, weighted F1 their harmonic mean.
  Re-expressed as joins + one aggregate — no per-author Python.

- ``stacking_features``: the lv2 score features
  (whoiswho/loadmodel/ClassficationModels.py:274-301): per candidate
  group — max, mean, (max−2nd)/(max−mean+1e-8), (max−2nd)/(max−min+1e-8)
  (both rounded to 5), with the single-candidate special case
  [max, max, 0, 0] — as window aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def weighted_f1(
    truth: DataFrame,  # (aid, pid)
    pred: DataFrame,  # (aid, pid)
) -> float:
    """RNDeval.py:13-44 semantics, distributed. Authors present in truth
    only (pred.get(aid, []) → empty set behavior preserved by left join)."""
    gt_sizes = truth.groupBy("aid").agg(F.count("*").alias("n_gt"))
    pred_sizes = pred.groupBy("aid").agg(F.count("*").alias("n_pred"))
    inter = (
        truth.join(pred, ["aid", "pid"])
        .groupBy("aid")
        .agg(F.count("*").alias("n_inter"))
    )
    per_author = (
        gt_sizes.join(pred_sizes, "aid", "left")
        .join(inter, "aid", "left")
        .select(
            "aid",
            "n_gt",
            F.round(
                F.coalesce("n_inter", F.lit(0))
                / F.greatest(F.coalesce("n_pred", F.lit(0)), F.lit(1)),
                6,
            ).alias("precision"),
            F.round(
                F.coalesce("n_inter", F.lit(0)) / F.greatest(F.col("n_gt"), F.lit(1)), 6
            ).alias("recall"),
        )
    )
    # two actions read per_author (the scalar `total` feeds the second
    # pass's reference-exact rounding, so they can't fold into one agg);
    # materialize once instead of re-running the 3-join lineage twice
    per_author = per_author.localCheckpoint()
    total = per_author.agg(F.sum("n_gt").alias("t")).collect()[0]["t"] or 0
    if total == 0:
        return 0.0
    row = per_author.select(
        (F.col("precision") * F.round(F.col("n_gt") / F.lit(float(total)), 6)).alias("wp"),
        (F.col("recall") * F.round(F.col("n_gt") / F.lit(float(total)), 6)).alias("wr"),
    ).agg(F.sum("wp").alias("wp"), F.sum("wr").alias("wr")).collect()[0]
    wp, wr = row["wp"] or 0.0, row["wr"] or 0.0
    if wp + wr <= 0:
        return 0.0
    return 2 * wp * wr / (wp + wr)


def stacking_features(
    scored: DataFrame,
    group_col: str = "pid",
    score_col: str = "score",
) -> DataFrame:
    """lv2 features per candidate group (ClassficationModels.py:284-295)."""
    w = Window.partitionBy(group_col)
    w_rank = Window.partitionBy(group_col).orderBy(F.desc(score_col))
    ranked = scored.withColumn("_rk", F.row_number().over(w_rank))
    stats = ranked.withColumn("max_score", F.max(score_col).over(w)).withColumn(
        "min_score", F.min(score_col).over(w)
    ).withColumn("mean_score", F.avg(score_col).over(w)).withColumn(
        "n_cand", F.count("*").over(w)
    ).withColumn(
        "second_score",
        F.max(F.when(F.col("_rk") == 2, F.col(score_col))).over(w),
    )
    single = F.col("n_cand") == 1
    gap_mean = F.round(
        (F.col("max_score") - F.col("second_score"))
        / (F.lit(1e-8) + F.col("max_score") - F.col("mean_score")),
        5,
    )
    gap_range = F.round(
        (F.col("max_score") - F.col("second_score"))
        / (F.lit(1e-8) + F.col("max_score") - F.col("min_score")),
        5,
    )
    return stats.select(
        *scored.columns,
        F.col("max_score"),
        F.when(single, F.col("max_score")).otherwise(F.col("mean_score")).alias("mean_score"),
        F.when(single, F.lit(0.0)).otherwise(gap_mean).alias("gap_over_mean"),
        F.when(single, F.lit(0.0)).otherwise(gap_range).alias("gap_over_range"),
    )
