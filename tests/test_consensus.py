"""Consensus clustering ensemble (BOND ESB co-association voting →
connected components). Contracts: strict majority vote over K runs,
transitive closure of the voted pairs, and — the reason the mechanism
exists (autotrain_bond_ensemble.py:240-261) — consensus at least as good
as every individual noisy run on a labeled fixture."""

import numpy as np
import pyspark.sql.functions as F


def _stack(spark, runs: dict[str, dict[str, str]]):
    rows = [
        (r, url, cid) for r, labels in runs.items() for url, cid in labels.items()
    ]
    return spark.createDataFrame(
        rows, "run_id string, url string, cluster_id string"
    )


def test_majority_vote_is_strict_and_transitive(spark):
    """agree/K must be STRICTLY > min_agree (the reference votes j > 0.5),
    and the voted graph is closed transitively: a-b and b-c majorities
    pull a and c together even when a-c itself loses the vote (the
    order-free replacement for matx2list's first-index labeling)."""
    from whoiswho_spark.operators.consensus import (
        coassociation_edges,
        consensus_clusters,
    )

    # K=4. a-b agree in 3 (>0.5), b-c in 3, a-c in 1; d-e in exactly 2
    # (= 0.5, must NOT pass a strict vote)
    runs = {
        "r1": {"a": "x", "b": "x", "c": "y", "d": "p", "e": "p"},
        "r2": {"a": "x", "b": "x", "c": "x", "d": "p", "e": "q"},
        "r3": {"a": "y", "b": "x", "c": "x", "d": "p", "e": "p"},
        "r4": {"a": "x", "b": "x", "c": "x", "d": "p", "e": "q"},
    }
    stacked = _stack(spark, runs)
    edges = {
        (r["url_a"], r["url_b"]): r["agree_runs"]
        for r in coassociation_edges(stacked).collect()
    }
    assert edges == {("a", "b"): 3, ("b", "c"): 3}  # a-c 1/4 and d-e 2/4 out
    part = {
        r["url"]: r["cluster_id"] for r in consensus_clusters(stacked).collect()
    }
    assert part == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "e"}


def test_consensus_beats_every_noisy_run(spark):
    """The ensemble's raison d'être: K independent noisy clusterings of a
    200-url truth (random splits + run-specific merges) each score
    < 1.0 pairwise-F1; the majority-vote consensus recovers the truth
    exactly, so consensus F1 >= every single run's F1."""
    from whoiswho_spark.operators.consensus import consensus_clusters
    from whoiswho_spark.operators.evaluation import macro_pairwise_f1

    n_entities, members, K = 40, 5, 5
    urls = [
        (f"u{e:02d}_{m}", f"e{e:02d}") for e in range(n_entities) for m in range(members)
    ]
    runs: dict[str, dict[str, str]] = {}
    for r in range(K):
        # base seed picked so no split/merge reaches a 3-of-5 majority
        # (splits are entity-correlated: one forked entity breaks all its
        # front-back pairs at once) while every run still carries noise
        rs = np.random.RandomState(50 + r)
        labels = {}
        # run-specific merges: entity e absorbed into e-1 with prob .1
        merge_to = {}
        for e in range(1, n_entities):
            if rs.rand() < 0.1:
                merge_to[f"e{e:02d}"] = f"e{e-1:02d}"
        for e in range(n_entities):
            cid = f"e{e:02d}"
            cid = merge_to.get(cid, cid)
            split = rs.rand() < 0.15  # split: back half forks off
            for m in range(members):
                u = f"u{e:02d}_{m}"
                labels[u] = f"{cid}_s{r}" if (split and m >= members // 2) else cid
        runs[f"run{r}"] = labels
    stacked = _stack(spark, runs)

    truth = {u: e for u, e in urls}

    def f1_of(pred: dict[str, str]) -> float:
        rows = [("blk", u, truth[u], pred[u]) for u, _ in urls]
        return macro_pairwise_f1(
            spark.createDataFrame(
                rows, "block_key string, url string, truth string, pred string"
            )
        )

    single_f1s = [f1_of(labels) for labels in runs.values()]
    assert all(f < 1.0 for f in single_f1s), single_f1s  # noise is real

    cons = {
        r["url"]: r["cluster_id"] for r in consensus_clusters(stacked).collect()
    }
    consensus_f1 = f1_of(cons)
    assert consensus_f1 >= max(single_f1s), (consensus_f1, single_f1s)
    assert consensus_f1 == 1.0  # majority of independent noise = truth


def test_consensus_partition_is_partitioning_invariant(spark):
    """Same input rows, different physical layout → identical consensus
    (the determinism matx2list's index-order rule cannot offer)."""
    from whoiswho_spark.operators.consensus import consensus_clusters

    runs = {
        "r1": {f"u{i}": f"c{i // 3}" for i in range(30)},
        "r2": {f"u{i}": f"c{(i + 1) // 3}" for i in range(30)},
        "r3": {f"u{i}": f"c{i // 3}" for i in range(30)},
    }
    stacked = _stack(spark, runs)
    p1 = {
        (r["url"], r["cluster_id"])
        for r in consensus_clusters(stacked).collect()
    }
    p2 = {
        (r["url"], r["cluster_id"])
        for r in consensus_clusters(stacked.repartition(13)).collect()
    }
    assert p1 == p2 and len(p1) == 30


def test_consensus_pins_input_to_single_evaluation(spark):
    """consensus_clusters must materialize the stacked clusterings ONCE:
    the ensemble can include a DBSCAN run whose border labels are
    row-order-dependent, so if the n_runs count, the self-join's a/b
    sides, and the vertex set each re-evaluated the plan, agree_runs
    would be silently corrupted. Guard: an accumulator-counting
    mapInPandas upstream sees every row exactly once."""
    from whoiswho_spark.operators.consensus import consensus_clusters

    runs = {
        "r1": {f"u{i}": f"c{i // 3}" for i in range(30)},
        "r2": {f"u{i}": f"c{(i + 1) // 3}" for i in range(30)},
        "r3": {f"u{i}": f"c{i // 3}" for i in range(30)},
    }
    stacked = _stack(spark, runs)
    n_rows = stacked.count()
    acc = spark.sparkContext.accumulator(0)

    def counting(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    instrumented = stacked.mapInPandas(counting, schema=stacked.schema)
    out = consensus_clusters(instrumented)
    assert out.count() == 30
    # 2 joins + n_runs count + vertices: un-pinned this would be ~4x
    assert acc.value == n_rows, (acc.value, n_rows)


def test_consensus_over_threshold_grid(spark):
    """The reference's actual usage: the K runs are a threshold grid over
    the same scored pairs (ESBTrainer's th_a/th_o/th_v loop). Feed the
    repo's own threshold_edges+CC at three thresholds; the consensus is
    a valid partition covering every url and sits between the loosest
    and tightest runs' granularity."""
    from whoiswho_spark.functions.similarity import tanimoto_col
    from whoiswho_spark.operators.clustering import (
        connected_components,
        threshold_edges,
    )
    from whoiswho_spark.operators.consensus import consensus_clusters
    from whoiswho_spark.operators.dedup import tokens_col

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").cast("string").alias("url"),
        F.col("source").alias("block_key"),
        F.array_distinct(tokens_col(F.col("text"))).alias("toks"),
    )
    a = docs.select("block_key", F.col("url").alias("url_a"), F.col("toks").alias("ta"))
    b = docs.select("block_key", F.col("url").alias("url_b"), F.col("toks").alias("tb"))
    scored = (
        a.join(b, "block_key")
        .where(F.col("url_a") < F.col("url_b"))
        .select("url_a", "url_b", tanimoto_col(F.col("ta"), F.col("tb")).alias("score"))
        .localCheckpoint()
    )
    verts = docs.select("url")
    grid = []
    for i, th in enumerate((0.35, 0.5, 0.65)):
        cc = connected_components(threshold_edges(scored, threshold=th), vertices=verts)
        grid.append(
            cc.select(
                F.lit(f"th{i}").alias("run_id"), "url",
                F.col("cluster_id").alias("cluster_id"),
            )
        )
    stacked = grid[0].unionByName(grid[1]).unionByName(grid[2])
    cons = consensus_clusters(stacked)
    n_urls = docs.count()
    assert cons.count() == n_urls
    n_loose = grid[0].select("cluster_id").distinct().count()
    n_tight = grid[2].select("cluster_id").distinct().count()
    n_cons = cons.select("cluster_id").distinct().count()
    assert n_loose <= n_cons <= n_tight


def test_consensus_identity_and_median_laws(spark):
    """Two algebraic laws: (1) consensus of K copies of one clustering is
    that clustering (canonicalized to min member); (2) over a MONOTONE
    run family (same-cluster at tighter ⊆ same-cluster at looser, as a
    cc threshold grid produces) the strict majority of an odd K equals
    the MEDIAN run — the reason the pipeline's consensus path includes
    dbscan rather than voting a cc-only grid."""
    from whoiswho_spark.operators.consensus import consensus_clusters

    base = {f"u{i:02d}": f"c{i // 4}" for i in range(24)}
    runs = {f"r{k}": dict(base) for k in range(3)}
    stacked = _stack(spark, runs)
    part = {
        r["url"]: r["cluster_id"] for r in consensus_clusters(stacked).collect()
    }
    want = {u: min(v for v, c2 in base.items() if c2 == c) for u, c in base.items()}
    assert part == want

    # monotone family: loose merges pairs of base clusters, tight splits
    loose = {u: f"m{int(c[1:]) // 2}" for u, c in base.items()}      # coarser
    tight = {u: f"{c}_{0 if int(u[1:]) % 4 < 2 else 1}" for u, c in base.items()}  # finer
    med = consensus_clusters(
        _stack(spark, {"lo": loose, "mid": base, "hi": tight})
    )
    med_part = {r["url"]: r["cluster_id"] for r in med.collect()}
    assert med_part == want  # the median (base) partition, canonicalized
