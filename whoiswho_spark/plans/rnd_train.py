"""RND trainer orchestration — k-fold GBDT cells → lv2 stacking →
cell-weighted vote → top-1/NIL.

Mirrors the reference's RNDTrainer.fit/predict
(/root/reference/whoiswho/training/AutoTrainRND.py:246-324) over the
CellModel/GBDTModel machinery
(/root/reference/whoiswho/loadmodel/ClassficationModels.py:151-331,
335-650): each CELL is a (feature subset, hyperparams, weight) config;
a cell fits one lv1 model per fold; prediction averages the fold
models; an optional lv2 stage stacks the per-candidate-group score
statistics (max/mean/gap-over-mean/gap-over-range,
ClassficationModels.py:274-301) onto the base features; the final
assignment score is the cell-weight vote (AutoTrainRND.py get_result →
deal_nil_threshold_new, NIL at 0.65). The reference's default cell list
varies gbd_type (lgbm/cat/xgb) and the 'bert' feature subset with lv2
EMPTY — here cells vary hyperparameters and feature subsets over the
single numpy GBDT (operators/gbdt.py), the honest one-engine analog,
and lv2 is opt-in per cell exactly like ``has_lv2``.

Spark-first shape: FITTING is a driver-side numpy loop over a bounded
deterministic sample per fold (fit_gbdt's seeded-hash-order limit() —
k·|cells| small models, the same trade the reference makes running
sklearn-style GBDTs on one node); INFERENCE is pure Catalyst — every
fold model compiles to a when-cascade column (gbdt_score_col), fold
averaging and the vote are column arithmetic, and the lv2 stacking
features are window functions (rnd_eval.stacking_features). Nothing
per-row touches Python at scoring time, so scoring scales with the
cluster, which is where the 10^12-row cost lives.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whoiswho_spark.operators.gbdt import ensemble_vote_col, fit_gbdt, gbdt_score_col
from whoiswho_spark.operators.rnd import kfold_col, top1_assign
from whoiswho_spark.operators.rnd_eval import stacking_features

#: columns appended by rnd_eval.stacking_features — the lv2 feature block
STACK_COLS = ("max_score", "mean_score", "gap_over_mean", "gap_over_range")

#: the reference's NIL threshold (AutoTrainRND.py:322 deal_nil 0.65)
NIL_THRESHOLD = 0.65


@dataclass(frozen=True)
class CellConfig:
    """One ensemble cell (ClassficationModels.py cell_list_config entry):
    a feature subset + hyperparams + vote weight; ``use_lv2`` mirrors
    ``has_lv2`` (lv2 list non-empty)."""

    name: str
    feature_cols: tuple[str, ...]
    cell_weight: float = 5.0
    n_trees: int = 20
    max_depth: int = 3
    learning_rate: float = 0.2
    use_lv2: bool = False


def default_cells(
    feature_cols: list[str], emb_cols: list[str] | None = None
) -> list[CellConfig]:
    """The reference's 6-semantic-cell shape (3 gbd_types × 2 feature
    lists, weight 5 each) re-expressed as hyperparam diversity × feature
    subsets; ``emb_cols`` plays the 'bert' feature_list role."""
    fc = tuple(feature_cols)
    cells = [
        CellConfig("full_deep", fc, 5.0, n_trees=20, max_depth=3),
        CellConfig("full_shallow", fc, 5.0, n_trees=40, max_depth=2,
                   learning_rate=0.1),
        CellConfig("full_coarse", fc, 5.0, n_trees=12, max_depth=4,
                   learning_rate=0.3),
    ]
    if emb_cols:
        ec = tuple(emb_cols)
        cells += [
            CellConfig("emb_deep", ec, 5.0, n_trees=20, max_depth=3),
            CellConfig("emb_shallow", ec, 5.0, n_trees=40, max_depth=2,
                       learning_rate=0.1),
        ]
    return cells


def fit_cells(
    train_pairs: DataFrame,
    cells: list[CellConfig],
    k: int = 5,
    pid_col: str = "pid",
    label_col: str = "label",
    sample_n: int = 100_000,
) -> list[dict]:
    """CellModel.train_model analog: per cell, one lv1 GBDT per fold
    (fit on the out-of-fold rows, folded by ``kfold_col(pid)`` — the
    reference's per-fold train splits, data_process.py:535-576), plus an
    optional lv2 fit on the OUT-OF-FOLD lv1 scores' stacking features
    (each fold's held-out rows scored by the model that never saw them —
    the step-two training data of ClassficationModels.py:232-264).

    Returns artifacts: {"cell", "fold_models", "lv2_model"}.
    """
    tp = train_pairs.withColumn(
        "_fold", kfold_col(F.col(pid_col).cast("string"), k)
    )
    # the fold table feeds k fits per cell — materialize once
    tp = tp.localCheckpoint()
    # The cells×k lv1 fits are INDEPENDENT (each samples its own
    # out-of-fold rows and fits in the driver) — submit them from a
    # small thread pool so the per-fit Spark sample jobs overlap instead
    # of serializing their scheduling latency (guide §2.6 "overlap
    # independent jobs"; actions are only sequential because the driver
    # calls them sequentially). Determinism unchanged: every fit is a
    # pure function of (fold table, config), and results are collected
    # back in (cell, fold) order. Measured at sf0.1: fit_cells 5.8 s →
    # ~3.5 s for the rnd_ensemble_scores 2-cell × 3-fold grid.
    from concurrent.futures import ThreadPoolExecutor

    def _fit_one(cell: CellConfig, i: int) -> dict:
        return fit_gbdt(
            tp.where(F.col("_fold") != i),
            list(cell.feature_cols),
            label_col=label_col,
            n_trees=cell.n_trees,
            max_depth=cell.max_depth,
            learning_rate=cell.learning_rate,
            sample_n=sample_n,
        )

    with ThreadPoolExecutor(max_workers=min(8, max(1, len(cells) * k))) as pool:
        futures = {
            (ci, i): pool.submit(_fit_one, cell, i)
            for ci, cell in enumerate(cells)
            for i in range(k)
        }
        lv1 = {key: f.result() for key, f in futures.items()}
    fitted: list[dict] = []
    for ci, cell in enumerate(cells):
        fold_models = [lv1[(ci, i)] for i in range(k)]
        lv2_model = None
        if cell.use_lv2:
            oof = tp.withColumn(
                "_lv1",
                _fold_dispatch_col(fold_models, F.col("_fold")),
            )
            stacked = stacking_features(oof, group_col=pid_col, score_col="_lv1")
            lv2_model = fit_gbdt(
                stacked,
                [*cell.feature_cols, *STACK_COLS],
                label_col=label_col,
                n_trees=cell.n_trees,
                max_depth=cell.max_depth,
                learning_rate=cell.learning_rate,
                sample_n=sample_n,
            )
        fitted.append(
            {"cell": cell, "fold_models": fold_models, "lv2_model": lv2_model}
        )
    return fitted


def _fold_dispatch_col(fold_models: list[dict], fold_col) -> "F.Column":
    """score of the model whose fold index matches ``fold_col`` — the
    out-of-fold score column (row in fold i was held out of model i)."""
    expr = None
    for i, m in enumerate(fold_models):
        branch = gbdt_score_col(m)
        expr = (
            F.when(fold_col == i, branch)
            if expr is None
            else expr.when(fold_col == i, branch)
        )
    return expr.otherwise(F.lit(None))


def _fold_mean_col(fold_models: list[dict]) -> "F.Column":
    """CellModel.predict no-lv2 path: mean of the k fold models' scores
    (ClassficationModels.py:321-331) as one Catalyst expression."""
    expr = None
    for m in fold_models:
        c = gbdt_score_col(m)
        expr = c if expr is None else expr + c
    return expr / F.lit(float(len(fold_models)))


def score_cells(
    pairs: DataFrame,
    fitted: list[dict],
    pid_col: str = "pid",
) -> DataFrame:
    """Attach one ``score__<cell>`` column per cell. No-lv2 cells are a
    single Catalyst expression (fold-mean of when-cascades); lv2 cells
    window the fold-mean lv1 score into stacking features per candidate
    group and score with the lv2 cascade (predict path of
    ClassficationModels.py:303-320, with the fold-mean pulled before the
    stats — one window pass instead of k)."""
    out = pairs
    for art in fitted:
        cell: CellConfig = art["cell"]
        col_name = f"score__{cell.name}"
        lv1_mean = _fold_mean_col(art["fold_models"])
        if art["lv2_model"] is None:
            out = out.withColumn(col_name, lv1_mean)
            continue
        out = out.withColumn("_lv1", lv1_mean)
        out = stacking_features(out, group_col=pid_col, score_col="_lv1")
        out = out.withColumn(col_name, gbdt_score_col(art["lv2_model"])).drop(
            "_lv1", *STACK_COLS
        )
    return out


def rnd_assign(
    scored: DataFrame,
    fitted: list[dict],
    pid_col: str = "pid",
    aid_col: str = "aid",
    nil_threshold: float = NIL_THRESHOLD,
) -> DataFrame:
    """Cell-weight vote (AutoTrainRND.py:36-48 score accumulation) →
    top-1 per paper with the NIL threshold (deal_nil_threshold_new,
    AutoTrainRND.py:319-324). Returns (pid, aid, score) — NIL papers
    are absent, as in the reference's unassigned bucket."""
    vote = ensemble_vote_col(
        [f"score__{a['cell'].name}" for a in fitted],
        weights=[a["cell"].cell_weight for a in fitted],
    )
    voted = scored.withColumn("vote_score", vote)
    return top1_assign(
        voted, item_col=pid_col, cand_col=aid_col,
        score_col="vote_score", threshold=nil_threshold,
    )


def rnd_train_predict(
    train_pairs: DataFrame,
    eval_pairs: DataFrame,
    feature_cols: list[str],
    cells: list[CellConfig] | None = None,
    k: int = 5,
    pid_col: str = "pid",
    aid_col: str = "aid",
    label_col: str = "label",
    nil_threshold: float = NIL_THRESHOLD,
) -> tuple[DataFrame, list[dict]]:
    """RNDTrainer.fit + predict end-to-end: fit the cell ensemble on the
    labeled pair-feature table, score the eval pairs, vote, assign.
    Returns (assignments, fitted_cells)."""
    cells = cells or default_cells(feature_cols)
    fitted = fit_cells(
        train_pairs, cells, k=k, pid_col=pid_col, label_col=label_col
    )
    scored = score_cells(eval_pairs, fitted, pid_col=pid_col)
    return (
        rnd_assign(scored, fitted, pid_col=pid_col, aid_col=aid_col,
                   nil_threshold=nil_threshold),
        fitted,
    )
