"""RND trainer orchestration (plans/rnd_train.py): k-fold cells → lv2
stacking → cell-weight vote → top-1/NIL, gated by the reference's own
weighted-F1 metric (RNDeval.py) on a synthetic labeled instance set."""

import numpy as np
import pyspark.sql.functions as F


def _labeled_pairs(spark, n_papers, n_cands=5, seed=7):
    """Each paper has one positive candidate with a separable feature
    profile plus noise candidates — the train-instance expansion shape
    (pos_aid + neg_aids per unass_pid, AutoTrainRND train_ins)."""
    rs = np.random.RandomState(seed)
    rows = []
    for p in range(n_papers):
        true_a = p % 17
        for c in range(n_cands):
            aid = (p + c) % 17
            pos = aid == true_a
            f_sim = (0.85 if pos else 0.25) + 0.1 * rs.rand()
            f_gap = (0.7 if pos else 0.3) + 0.2 * rs.rand()
            f_noise = rs.rand()
            rows.append(
                (f"p{p:03d}", f"a{aid:02d}", float(f_sim), float(f_gap),
                 float(f_noise), float(pos))
            )
    return spark.createDataFrame(
        rows, "pid string, aid string, f_sim double, f_gap double, "
              "f_noise double, label double"
    )


def test_rnd_train_predict_weighted_f1(spark):
    from whoiswho_spark.operators.rnd_eval import weighted_f1
    from whoiswho_spark.plans.rnd_train import default_cells, rnd_train_predict

    feats = ["f_sim", "f_gap", "f_noise"]
    train = _labeled_pairs(spark, 60, seed=7)
    eval_pairs = _labeled_pairs(spark, 40, seed=99)
    assigned, fitted = rnd_train_predict(
        train, eval_pairs, feats,
        cells=default_cells(feats, emb_cols=["f_sim", "f_gap"]),
        k=3, nil_threshold=0.5,
    )
    assert len(fitted) == 5  # 3 full + 2 emb cells
    got = assigned.select("pid", "aid").withColumnRenamed("aid", "pred_aid")
    truth = eval_pairs.where("label = 1.0").select(
        "pid", F.col("aid").alias("aid")
    )
    joined = truth.join(got, "pid", "left")
    n = joined.count()
    correct = joined.where(F.col("pred_aid") == F.col("aid")).count()
    assert n == 40 and correct >= 38, (n, correct)

    # the reference's weighted-F1 gate over the same assignment
    f1 = weighted_f1(
        truth.select(F.col("aid"), F.col("pid")),
        got.select(F.col("pred_aid").alias("aid"), F.col("pid")),
    )
    assert f1 >= 0.95, f1


def test_rnd_lv2_stacking_cell(spark):
    """A use_lv2 cell runs the full CellModel path: out-of-fold lv1
    scores → stacking features per candidate group → lv2 fit; scoring
    windows the stats and applies the lv2 cascade. The stacked cell must
    still separate positives from negatives."""
    from whoiswho_spark.plans.rnd_train import (
        CellConfig,
        fit_cells,
        rnd_assign,
        score_cells,
    )

    feats = ("f_sim", "f_gap")
    pairs = _labeled_pairs(spark, 50, seed=3)
    cell = CellConfig("stacked", feats, 4.0, n_trees=10, use_lv2=True)
    fitted = fit_cells(pairs, [cell], k=3)
    assert fitted[0]["lv2_model"] is not None
    scored = score_cells(pairs, fitted)
    row = scored.agg(
        F.avg(F.when(F.col("label") == 1.0, F.col("score__stacked"))).alias("pos"),
        F.avg(F.when(F.col("label") == 0.0, F.col("score__stacked"))).alias("neg"),
        F.min("score__stacked").alias("lo"),
        F.max("score__stacked").alias("hi"),
    ).collect()[0]
    assert 0.0 <= row["lo"] <= row["hi"] <= 1.0
    assert row["pos"] > row["neg"] + 0.3, (row["pos"], row["neg"])

    # and the vote/top-1 layer consumes the lv2 cell like any other
    assigned = rnd_assign(scored, fitted, nil_threshold=0.5)
    assert assigned.count() > 0


def test_rnd_train_deterministic(spark):
    """Two fits over the same input give byte-identical assignments —
    the fit_gbdt deterministic-sample contract composed across folds
    and cells."""
    from whoiswho_spark.plans.rnd_train import CellConfig, rnd_train_predict

    feats = ["f_sim", "f_gap", "f_noise"]
    pairs = _labeled_pairs(spark, 30, seed=11)
    cells = [
        CellConfig("a", tuple(feats), 5.0, n_trees=8),
        CellConfig("b", ("f_sim", "f_gap"), 2.0, n_trees=12, max_depth=2),
    ]
    outs = []
    for _ in range(2):
        assigned, _fitted = rnd_train_predict(
            pairs, pairs, feats, cells=cells, k=3, nil_threshold=0.5
        )
        outs.append(
            sorted(
                (r["pid"], r["aid"], round(r["vote_score"], 9))
                for r in assigned.collect()
            )
        )
    assert outs[0] == outs[1] and len(outs[0]) > 0
