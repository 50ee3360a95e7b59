"""Graph-propagation embedding (the torch-free BOND GAE analog):
per-iteration closed-form parity vs numpy, layout determinism, and the
channel's reason to exist — recovering clusters DBSCAN loses on noisy
embeddings, lifting pipeline F1 over the non-propagated channel."""

import numpy as np
import pyspark.sql.functions as F
import pytest


def _numpy_propagate(emb: dict, edges: list, iterations: int, beta: float):
    """The module docstring's recurrence, independently in numpy."""

    def norm(v):
        n = np.sqrt((v * v).sum())
        return v if n == 0 else v / n

    x = {k: norm(np.asarray(v, dtype=np.float64)) for k, v in emb.items()}
    adj = {}
    for a, b, w in edges:
        if w > 0:
            adj.setdefault(a, []).append((b, w))
            adj.setdefault(b, []).append((a, w))
    for _ in range(iterations):
        nxt = {}
        for k, v in x.items():
            if k not in adj:
                nxt[k] = v
                continue
            sw = sum(w for _n, w in adj[k])
            nbr = sum(w * x[n] for n, w in adj[k]) / sw
            nxt[k] = norm((1 - beta) * v + beta * nbr)
        x = nxt
    return x


def test_propagation_matches_numpy_closed_form(spark):
    """CORRECTNESS-style parity: the Spark loop equals the per-iteration
    closed form recomputed with numpy on one block, exactly (float64)."""
    from whoiswho_spark.operators.propagation import propagate_embeddings

    rs = np.random.RandomState(5)
    ids = [f"u{i}" for i in range(12)]
    emb = {u: rs.randn(6).tolist() for u in ids}
    edges = []
    for i in range(12):
        for j in range(i + 1, 12):
            if rs.rand() < 0.3:
                edges.append((ids[i], ids[j], float(rs.rand())))
    edges.append((ids[0], ids[1], 0.0))  # zero-weight edge: ignored
    edf = spark.createDataFrame(edges, "url_a string, url_b string, score double")
    vdf = spark.createDataFrame(
        list(emb.items()), "url string, embedding array<double>"
    )
    for iterations, beta in ((0, 0.5), (1, 0.5), (3, 0.3), (2, 1.0)):
        got = {
            r["url"]: np.array(r["embedding"])
            for r in propagate_embeddings(
                vdf, edf, iterations=iterations, beta=beta
            ).collect()
        }
        want = _numpy_propagate(emb, edges, iterations, beta)
        assert set(got) == set(want)
        for u in ids:
            np.testing.assert_allclose(got[u], want[u], rtol=0, atol=1e-12)


def test_propagation_is_layout_deterministic(spark):
    """Same rows, different partitioning → bit-identical embeddings
    (the determinism BOND's SGD training cannot offer)."""
    from whoiswho_spark.operators.propagation import propagate_embeddings

    rs = np.random.RandomState(9)
    vdf = spark.createDataFrame(
        [(f"u{i}", rs.randn(8).tolist()) for i in range(40)],
        "url string, embedding array<double>",
    )
    edf = spark.createDataFrame(
        [
            (f"u{i}", f"u{j}", float(rs.rand()))
            for i in range(40)
            for j in range(i + 1, 40)
            if rs.rand() < 0.2
        ],
        "url_a string, url_b string, score double",
    )
    a = {
        r["url"]: tuple(r["embedding"])
        for r in propagate_embeddings(vdf, edf, iterations=2).collect()
    }
    b = {
        r["url"]: tuple(r["embedding"])
        for r in propagate_embeddings(
            vdf.repartition(13), edf.repartition(7), iterations=2
        ).collect()
    }
    assert a == b


def test_propagation_contracts_clusters_dbscan_recovers(spark):
    """The channel's raison d'être, isolated: entity embeddings too noisy
    for DBSCAN at a tight eps fragment into singletons; after smoothing
    along the (correct, token-derived) threshold graph the same DBSCAN
    recovers the entities — strictly better pairwise agreement."""
    from whoiswho_spark.operators.clustering_dbscan import cluster_blocks_dbscan
    from whoiswho_spark.operators.propagation import propagate_embeddings

    rs = np.random.RandomState(11)
    n_ent, members, dim = 6, 5, 16
    centers = rs.randn(n_ent, dim) * 3
    rows, edges = [], []
    for e in range(n_ent):
        urls = [f"e{e}_m{m}" for m in range(members)]
        for m, u in enumerate(urls):
            noisy = centers[e] + rs.randn(dim) * 1.8  # heavy noise
            rows.append((u, "blk", noisy.tolist()))
        # the relational signal: intra-entity edges at high weight
        for i in range(members):
            for j in range(i + 1, members):
                edges.append((urls[i], urls[j], 0.9))
    vdf = spark.createDataFrame(rows, "url string, block_key string, embedding array<double>")
    edf = spark.createDataFrame(edges, "url_a string, url_b string, score double")

    def n_good_pairs(labels):
        good = 0
        by_label = {}
        for r in labels:
            by_label.setdefault((r["block_key"], r["label"]), []).append(r["url"])
        for (_b, lab), urls in by_label.items():
            if lab < 0:
                continue
            for i in range(len(urls)):
                for j in range(i + 1, len(urls)):
                    good += urls[i].split("_")[0] == urls[j].split("_")[0]
        return good

    # at eps=0.25 the raw embeddings fragment (28/60 good pairs, 13
    # outliers); the smoothed ones recover all 60 — measured fixture
    eps, ms = 0.25, 3
    raw = cluster_blocks_dbscan(vdf, eps=eps, min_samples=ms).collect()
    smoothed = propagate_embeddings(
        vdf.select("url", "embedding"), edf, iterations=3, beta=0.7
    )
    sm = cluster_blocks_dbscan(
        vdf.select("url", "block_key").join(smoothed, "url"),
        eps=eps,
        min_samples=ms,
    ).collect()
    total = n_ent * members * (members - 1) // 2
    assert n_good_pairs(sm) > n_good_pairs(raw)
    assert n_good_pairs(sm) == total  # full recovery on the fixture


def test_pipeline_propagation_channel_f1(spark, tmp_path):
    """ERConfig(use_propagation=True) end-to-end: on a noisy-embedding
    corpus at a tight eps the dbscan path's F1 with propagation is
    STRICTLY above the non-propagated channel and reaches 1.0 (the
    plain channel stalls just below — the pipeline's token-score
    post_match rescues most of the damage, so the big operator-level
    delta shows in test_propagation_contracts_clusters_dbscan_recovers;
    here the claim is strict end-to-end improvement + determinism of
    the integration)."""
    from whoiswho_spark.plans.pipeline import ERConfig, evaluate_run, run_pipeline
    from whoiswho_spark.sources.pages import generate_pages

    corpus = generate_pages(spark, 120).cache()
    pages = corpus.select("url", "warc_ts", "html", "text", "lang")
    rs = np.random.RandomState(23)

    # corrupt the synthetic embeddings: same entity centers, heavy noise
    emb = corpus.select("url", "embedding", "entity_id").collect()
    dim = len(emb[0]["embedding"])
    centers = {}
    noisy = []
    for r in emb:
        c = centers.setdefault(r["entity_id"], rs.randn(dim))
        noisy.append((r["url"], (c + rs.randn(dim) * 1.5).tolist()))
    ndf = spark.createDataFrame(noisy, "url string, embedding array<double>")

    def f1_with(use_prop, sub):
        cfg = ERConfig(
            cluster_method="dbscan",
            dbscan_eps=0.1,
            dbscan_min_samples=3,
            use_propagation=use_prop,
            propagation_iterations=3,
            propagation_beta=0.7,
        )
        wd = str(tmp_path / sub)
        run_pipeline(spark, pages, ndf, wd, cfg=cfg)
        return evaluate_run(spark, wd, corpus.select("url", "entity_id"))

    plain = f1_with(False, "plain")
    prop = f1_with(True, "prop")
    assert prop > plain, (prop, plain)  # strict end-to-end improvement
    assert prop == 1.0, prop
    assert plain < 1.0, plain  # the fixture genuinely hurts the raw path
