"""Ego-graph relational feature channel (operators/ego_graph.py):
graph construction as joins, paper-ego mean pooling, capped author node
sets, and kernel scoring — numpy-parity-gated."""

import numpy as np
import pyspark.sql.functions as F


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "url bigint, embedding array<double>",
    )


def test_ego_edge_table_types(spark):
    from whoiswho_spark.operators.ego_graph import ego_edge_table

    mem = spark.createDataFrame(
        [("a1", 10), ("a1", 11), ("a2", 12)], "aid string, url bigint"
    )
    refs = spark.createDataFrame([(10, 99)], "url bigint, ref_url bigint")
    orgs = spark.createDataFrame([("a1", "acme")], "aid string, org string")
    e = ego_edge_table(mem, refs=refs, orgs=orgs)
    got = {(r["src"], r["dst"], r["etype"]) for r in e.collect()}
    assert got == {
        ("a1", "10", "author--paper"),
        ("a1", "11", "author--paper"),
        ("a2", "12", "author--paper"),
        ("a1", "acme", "author--org"),
        ("10", "99", "paper--refpaper"),
    }


def test_attach_ego_features_numpy_parity(spark):
    """max/mean cosine and the KNRM vector against a direct numpy
    recomputation — including the paper-ego mean pool over refs and the
    author cap."""
    from whoiswho_spark.functions.similarity import _KNRM_MUS, _KNRM_SIGMAS
    from whoiswho_spark.operators.ego_graph import attach_ego_features

    rs = np.random.RandomState(4)
    vecs = rs.randn(12, 6)
    emb = _emb_df(spark, vecs)
    # author a0 owns pages 0..4 (cap 3 keeps 0,1,2); a1 owns 5,6
    mem = spark.createDataFrame(
        [("a0", u) for u in range(5)] + [("a1", 5), ("a1", 6)],
        "aid string, url bigint",
    )
    # paper 10 references pages 7 and 8 → paper rep = mean(v10, v7, v8)
    refs = spark.createDataFrame(
        [(10, 7), (10, 8)], "url bigint, ref_url bigint"
    )
    cands = spark.createDataFrame(
        [(10, "a0"), (10, "a1"), (11, "a0"), (10, "a_missing")],
        "pid bigint, aid string",
    )
    out = attach_ego_features(
        cands, mem, emb, refs=refs, url_col="url", max_author_papers=3
    )
    rows = {(r["pid"], r["aid"]): r for r in out.collect()}
    assert set(rows) == {(10, "a0"), (10, "a1"), (11, "a0"), (10, "a_missing")}

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na > 0 and nb > 0 else 0.0

    def knrm(paper, nodes):
        ma = paper / max(np.linalg.norm(paper), 1e-12)
        mb = np.asarray(nodes)
        mb = mb / np.maximum(np.linalg.norm(mb, axis=1, keepdims=True), 1e-12)
        s = (ma[None, :] @ mb.T)
        k = np.exp(-((s[..., None] - _KNRM_MUS) ** 2) / (2 * _KNRM_SIGMAS**2))
        return np.log1p(k.sum(axis=1)).sum(axis=0)

    rep10 = np.mean([vecs[10], vecs[7], vecs[8]], axis=0)
    for (pid, aid), rep, nodes in [
        ((10, "a0"), rep10, [vecs[0], vecs[1], vecs[2]]),   # cap=3 of 5
        ((10, "a1"), rep10, [vecs[5], vecs[6]]),
        ((11, "a0"), vecs[11], [vecs[0], vecs[1], vecs[2]]),
    ]:
        r = rows[(pid, aid)]
        cs = [cos(rep, n) for n in nodes]
        assert abs(r["f_ego_max_cos"] - max(cs)) < 1e-9, (pid, aid)
        assert abs(r["f_ego_mean_cos"] - np.mean(cs)) < 1e-9, (pid, aid)
        got_k = np.asarray(r["f_ego_knrm"])
        assert np.allclose(got_k, knrm(rep, nodes), atol=1e-9), (pid, aid)

    # author with no embedded members → zero features, no crash
    miss = rows[(10, "a_missing")]
    assert miss["f_ego_max_cos"] == 0.0 and miss["f_ego_mean_cos"] == 0.0
    assert all(v == 0.0 for v in miss["f_ego_knrm"])


def test_ego_features_land_in_rnd_pair_table(spark):
    """The feature columns compose with the RND trainer's pair-feature
    table: attach → fit a cell on them → scores separate the true
    author (same-cluster embeddings are close by construction)."""
    from whoiswho_spark.operators.ego_graph import attach_ego_features
    from whoiswho_spark.plans.rnd_train import CellConfig, fit_cells, score_cells

    rs = np.random.RandomState(9)
    centers = rs.randn(4, 8) * 3
    vec_rows, mem_rows = [], []
    uid = 0
    for a in range(4):
        for _ in range(6):
            vec_rows.append((uid, [float(x) for x in centers[a] + 0.2 * rs.randn(8)]))
            mem_rows.append((f"a{a}", uid))
            uid += 1
    emb = spark.createDataFrame(vec_rows, "url bigint, embedding array<double>")
    mem = spark.createDataFrame(mem_rows, "aid string, url bigint")
    # each paper (one per author, held out of memberships) × all authors
    papers = []
    for a in range(4):
        papers.append((uid, f"a{a}"))
        vec_rows.append((uid, [float(x) for x in centers[a] + 0.2 * rs.randn(8)]))
        uid += 1
    emb = spark.createDataFrame(vec_rows, "url bigint, embedding array<double>")
    cands = spark.createDataFrame(
        [(p, f"a{c}", float(truth == f"a{c}"))
         for p, truth in papers for c in range(4)],
        "pid bigint, aid string, label double",
    )
    feats = attach_ego_features(cands, mem, emb, url_col="url")
    cell = CellConfig("ego", ("f_ego_max_cos", "f_ego_mean_cos"), 5.0, n_trees=8)
    fitted = fit_cells(feats, [cell], k=2)
    scored = score_cells(feats, fitted)
    row = scored.agg(
        F.avg(F.when(F.col("label") == 1.0, F.col("score__ego"))).alias("pos"),
        F.avg(F.when(F.col("label") == 0.0, F.col("score__ego"))).alias("neg"),
    ).collect()[0]
    # 16 labeled rows × 2 folds is a weak fit by design — the gate is
    # separation, not calibration
    assert row["pos"] > row["neg"] + 0.25, (row["pos"], row["neg"])
