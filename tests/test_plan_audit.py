"""Physical-plan audits: the properties that keep these queries fast at
100 TB must be visible in the plan, not just hoped for — predicate
pushdown to the parquet scan, column pruning, broadcast joins for small
dims, and no accidental cartesian products."""

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = entrymod.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def _scans(plan):
    return [ln for ln in plan.splitlines() if "FileScan parquet" in ln]


def test_filter_pushed_to_lineitem_scan(spark):
    plan = _plan(spark, "lineitem_pricing_summary")
    scan = next(s for s in _scans(plan) if "lineitem" in s)
    assert "l_shipdate" in scan.split("DataFilters")[1].split("]")[0], (
        "shipdate filter must reach the scan"
    )


def test_column_pruning_on_documents_scan(spark):
    # documents has (doc_id, url, source, lang, n_chars, text, ...); the
    # token_stats projection needs exactly doc_id + text
    plan = _plan(spark, "token_stats")
    scan = next(s for s in _scans(plan) if "documents" in s)
    cols = scan.split("FileScan parquet [")[1].split("]")[0]
    names = {c.split("#")[0] for c in cols.split(",")}
    assert names == {"doc_id", "text"}, names


def test_small_dims_broadcast_in_revenue_join(spark):
    plan = _plan(spark, "revenue_by_nation")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_no_cartesian_products_in_headline_plans(spark):
    # knrm_features is a 20x20 crossJoin BY CONSTRUCTION — excluded.
    for name in (
        "minhash_dup_candidates",
        "ngram_jaccard_pairs",
        "exact_dedup",
        "embedding_neardup",
        "ann_topk",
        "top1_threshold",
        "window_topk",
        "revenue_by_nation",
        "events_hourly",
        "bond_threshold_edges",
        "name_match_pairs",
        "gopher_repetition",
        "crossdoc_span_dedup",
        "crossdoc_span_removed",
        "quality_filter",
        "url_canonical",
        "user_sessions",
        "bpe_pair_counts",
    ):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_gopher_fused_plan_has_no_shuffle(spark):
    # the fused kernel's whole point: one Arrow map pass, zero exchanges
    # other than the small-input spread repartition
    plan = _plan(spark, "gopher_repetition")
    body = plan.split("ArrowEvalPython") if "ArrowEvalPython" in plan else [plan]
    after_kernel = body[0]  # plan prints top-down: result side first
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "Window" not in after_kernel


def test_crossdoc_span_column_pruning(spark):
    plan = _plan(spark, "crossdoc_span_dedup")
    scan = next(s for s in plan.splitlines() if "FileScan parquet" in s)
    cols = scan.split("FileScan parquet [")[1].split("]")[0]
    names = {c.split("#")[0] for c in cols.split(",")}
    assert names == {"doc_id", "text"}, names


def test_exact_dedup_shuffles_hash_only(spark):
    # the 100 TB contract: text never moves — the scan may read it to
    # hash, but no Exchange carries the text column
    plan = _plan(spark, "exact_dedup")
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "text#" not in ln, ln


def test_ego_graph_features_narrow_shuffles(spark):
    """The ego feature joins must not cartesian and must not carry the
    embedding arrays through more Exchanges than the two side
    aggregations need (paper rep + author node sets meet candidates on
    equi-keys)."""
    plan = _plan(spark, "ego_graph_features")
    assert "CartesianProduct" not in plan
    # crossJoin(pids × distinct aids) is a 20×10 candidate grid built
    # via broadcast — allowed; the FEATURE joins are hash equi-joins
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan


def test_rnd_ensemble_inference_is_catalyst_only(spark):
    """The vote/top-1 inference path compiles entirely to JVM-side
    expressions: no Python workers (BatchEvalPython / ArrowEvalPython /
    FlatMapGroupsInPandas) anywhere in the scoring plan."""
    plan = _plan(spark, "rnd_ensemble_scores")
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan, marker


def test_simhash_adaptive_plan_regimes(spark):
    """k=16 (narrow chunks) keeps the block-bounded join — exactly one
    self-join on the block key, no chunk explode; k=3 runs the chunk
    join — the explode + (block, ci, cv) meet appears."""
    import pyspark.sql.functions as F

    from whoiswho_spark.operators.dedup import simhash_dup_pairs_bucketed

    docs = entrymod._t(spark, SF, "documents")
    loose = simhash_dup_pairs_bucketed(docs, "source", max_hamming=16)
    loose_plan = loose._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" not in loose_plan  # block join, no chunks

    tight = simhash_dup_pairs_bucketed(docs, "source", max_hamming=3)
    tight_plan = tight._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in tight_plan  # chunk meet
    assert "CartesianProduct" not in tight_plan


def test_ngram_prefix_meet_is_equi_join_catalyst_verify(spark):
    """Flagship guard: the set-similarity join must meet on the (block,
    token-rank) equi-key — never a nested-loop — and the Jaccard verify
    must stay JVM-side (no Python eval stage in the plan)."""
    plan = _plan(spark, "ngram_jaccard_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan, marker


def test_minhash_ownership_kills_global_pair_distinct(spark):
    """Flagship guard: first-colliding-band ownership replaces the global
    (id_a, id_b) distinct — the plan must contain NO Exchange that
    repartitions on the pair key (that shuffle is the scale bottleneck
    the ownership predicate exists to remove)."""
    plan = _plan(spark, "minhash_dup_candidates")
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln and "id_a" in ln:
            assert "id_b" not in ln, ln


def test_er_candidate_pairs_meet_on_block_key(spark):
    """Flagship guard (er_pipeline's pair stage): the within-block self
    join must be an equi-join on the block key with no nested-loop
    fallback, so pair generation stays Σ m_b² — never N²."""
    import pyspark.sql.functions as F

    from whoiswho_spark.operators.pairs import candidate_pairs

    docs = entrymod._t(spark, SF, "documents")
    blocks = docs.select(
        F.col("doc_id").cast("string").alias("url"),
        F.col("source").alias("block_key"),
    )
    plan = (
        candidate_pairs(blocks)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    )


def test_consensus_agreement_meets_on_run_cluster_key(spark):
    """The co-association expansion must meet on (run_id, cluster_id) —
    quadratic only WITHIN a cluster, never a cartesian across the input —
    and the vote must be a single hash aggregate on the pair key."""
    import pyspark.sql.functions as F

    from whoiswho_spark.operators.consensus import coassociation_edges

    runs = spark.createDataFrame(
        [(f"r{k}", f"u{i}", f"c{i // 5}") for k in range(3) for i in range(50)],
        "run_id string, url string, cluster_id string",
    )
    df = coassociation_edges(runs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the self-join is keyed (sort-merge or hash on the run+cluster key)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    ), plan
    assert df.count() > 0
