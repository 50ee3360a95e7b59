"""Stateful streaming incremental ER: member registry as group state,
carried across micro-batches (applyInPandasWithState). Attach = argmax
member above threshold + transitive cluster merge (AutoTrainSND.py:
163-206), so the final partition equals batch connected components —
gated here by the batch-parity test."""

import os
import time


def test_incremental_er_state_carries_across_microbatches(spark, tmp_path):
    from whoiswho_spark.streaming.incremental_er import run_incremental_er_once

    src = str(tmp_path / "pages_stream")
    ckpt = str(tmp_path / "ckpt")

    batch1 = spark.createDataFrame(
        [
            ("A1", "blk1", ["alpha", "beta", "gamma", "delta"]),
            ("A2", "blk1", ["alpha", "beta", "gamma", "epsilon"]),
            ("B1", "blk1", ["one", "two", "three"]),
            ("D1", "blk2", ["alpha", "beta", "gamma", "delta"]),
        ],
        "url string, block_key string, toks array<string>",
    )
    batch1.coalesce(1).write.mode("append").parquet(src)
    # ensure the second file sorts after the first (one file per trigger)
    time.sleep(1.1)
    batch2 = spark.createDataFrame(
        [
            ("A3", "blk1", ["alpha", "beta", "gamma", "zeta"]),
            ("C1", "blk1", ["nine", "ten", "eleven"]),
        ],
        "url string, block_key string, toks array<string>",
    )
    batch2.coalesce(1).write.mode("append").parquet(src)
    parts = [f for f in os.listdir(src) if f.endswith(".parquet")]
    assert len(parts) == 2

    out = run_incremental_er_once(spark, src, ckpt, name="inc_er_t1", threshold=0.5)
    rows = {r["url"]: r for r in out.collect()}
    assert len(rows) == 6  # no merges in this corpus → one event per url

    # batch 1: A1 founds the cluster (url order), A2 attaches, B1 founds
    assert rows["A1"]["is_new"] and rows["A1"]["cluster_id"] == "A1"
    assert not rows["A2"]["is_new"] and rows["A2"]["cluster_id"] == "A1"
    assert abs(rows["A2"]["matched_score"] - 0.6) < 1e-12  # |∩|=3, |∪|=5
    assert rows["B1"]["is_new"] and rows["B1"]["cluster_id"] == "B1"
    # blk2 state is isolated: same tokens, different block → own cluster
    assert rows["D1"]["is_new"] and rows["D1"]["cluster_id"] == "D1"

    # batch 2 (separate micro-batch): A3 attaches to the cluster minted in
    # batch 1 — the state genuinely persisted across micro-batches
    assert not rows["A3"]["is_new"] and rows["A3"]["cluster_id"] == "A1"
    assert rows["C1"]["is_new"] and rows["C1"]["cluster_id"] == "C1"


def test_incremental_er_resumes_from_checkpoint(spark, tmp_path):
    """A SECOND availableNow run over the same checkpoint picks up only
    the new file and still attaches to clusters from the first run (the
    registry survives the restart via the state store)."""
    from whoiswho_spark.streaming.incremental_er import run_incremental_er_once

    src = str(tmp_path / "pages_stream2")
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "assignments")

    spark.createDataFrame(
        [("A1", "blk", ["alpha", "beta", "gamma", "delta"])],
        "url string, block_key string, toks array<string>",
    ).coalesce(1).write.mode("append").parquet(src)
    first = run_incremental_er_once(spark, src, ckpt, output_dir=out)
    assert {r["url"] for r in first.collect()} == {"A1"}

    time.sleep(1.1)
    spark.createDataFrame(
        [("A9", "blk", ["alpha", "beta", "gamma", "eta"])],
        "url string, block_key string, toks array<string>",
    ).coalesce(1).write.mode("append").parquet(src)
    second = run_incremental_er_once(spark, src, ckpt, output_dir=out)
    rows = {r["url"]: r for r in second.collect()}
    # the restarted query processed ONLY the new file, against the
    # RESTORED state store: A9 attaches to the run-1 cluster
    assert set(rows) == {"A1", "A9"}
    assert not rows["A9"]["is_new"] and rows["A9"]["cluster_id"] == "A1"


def test_incremental_er_multi_chunk_group_deterministic(spark, tmp_path):
    """A group larger than one Arrow batch arrives as SEVERAL pandas
    chunks whose order is shuffle-dependent; the assign fn must concat
    before the url sort (per-chunk sorting founded clusters at whichever
    url led its chunk). Gate: the founder of the big cluster is the
    globally-min url, and two fresh runs agree exactly."""
    from whoiswho_spark.streaming.incremental_er import run_incremental_er_once

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "32")
    try:
        # DESCENDING url order in ONE file/micro-batch: with per-chunk
        # sorting the first Arrow chunk holds only high urls, so the
        # cluster founder would be u0199-ish instead of the global min
        rows = [
            (f"u{i:04d}", "big", ["tok", "shared", f"x{i % 3}"])
            for i in range(199, -1, -1)
        ]
        results = []
        for run in ("r1", "r2"):
            src = str(tmp_path / f"src_{run}")
            spark.createDataFrame(
                rows, "url string, block_key string, toks array<string>"
            ).coalesce(1).write.mode("append").parquet(src)
            out = run_incremental_er_once(
                spark, src, str(tmp_path / f"ck_{run}"),
                name=f"inc_er_chunks_{run}", threshold=0.2,
            )
            results.append(sorted((r["url"], r["cluster_id"]) for r in out.collect()))
        assert results[0] == results[1]
        founders = {cid for _, cid in results[0]}
        # u0000 founds the first cluster (url order), and every founder
        # must be the minimal url of its members
        assert "u0000" in founders
        members: dict = {}
        for u, c in results[0]:
            members.setdefault(c, []).append(u)
        for c, ms in members.items():
            assert c == min(ms), (c, min(ms))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_incremental_er_merges_clusters_transitively(spark, tmp_path):
    """Two clusters form from mutually-dissimilar seeds; a later bridge
    page is above threshold to members of BOTH — the assigner must merge
    them (re-emitting the losers as correction events), so the final
    partition is the connected component, not the greedy split."""
    from whoiswho_spark.streaming.incremental_er import (
        canonical_partition,
        final_assignments,
        run_incremental_er_once,
    )

    src = str(tmp_path / "pages_merge")
    ckpt = str(tmp_path / "ckpt_merge")
    # A: {a b c d}, B: {w x y z} — tanimoto(A,B)=0 → two clusters.
    # Bridge M: {a b c d w x y z} → tan(M,A)=tan(M,B)=0.5 ≥ τ → merge.
    spark.createDataFrame(
        [
            ("pA", "blk", ["a", "b", "c", "d"]),
            ("pB", "blk", ["w", "x", "y", "z"]),
        ],
        "url string, block_key string, toks array<string>",
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(
        [("pM", "blk", ["a", "b", "c", "d", "w", "x", "y", "z"])],
        "url string, block_key string, toks array<string>",
    ).coalesce(1).write.mode("append").parquet(src)

    events = run_incremental_er_once(
        spark, src, ckpt, name="inc_er_merge", threshold=0.5
    )
    ev = sorted(events.collect(), key=lambda r: r["seq"])
    # 3 assignment events + 1 correction (the losing cluster's member)
    assert len(ev) == 4
    fin = {r["url"]: r["cluster_id"] for r in final_assignments(events).collect()}
    assert len(set(fin.values())) == 1  # one merged cluster
    part = {(r["url"], r["cluster"]) for r in canonical_partition(events).collect()}
    assert part == {("pA", "pA"), ("pB", "pA"), ("pM", "pA")}


def test_incremental_er_matches_batch_partition(spark, tmp_path):
    """THE batch-parity gate: drain the sf0.001 documents corpus through
    the stateful assigner, canonicalize cluster ids to the min member,
    and assert set-equality with the batch pipeline's partition
    (tanimoto-threshold edges + large-star/small-star connected
    components) on the same blocks/threshold. The merge rule makes the
    streaming partition the components of the ≥τ graph for ANY
    micro-batch split, so this holds for the arbitrary repartition(4)
    file layout."""
    from pyspark.sql import functions as F

    from whoiswho_spark.functions.similarity import tanimoto_col
    from whoiswho_spark.operators.clustering import (
        connected_components,
        threshold_edges,
    )
    from whoiswho_spark.operators.dedup import tokens_col
    from whoiswho_spark.streaming.incremental_er import (
        canonical_partition,
        run_incremental_er_once,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").cast("string").alias("url"),
        F.col("source").alias("block_key"),
        F.array_distinct(tokens_col(F.col("text"))).alias("toks"),
    )
    src = str(tmp_path / "docs_stream")
    docs.repartition(4).write.mode("overwrite").parquet(src)
    events = run_incremental_er_once(
        spark, src, str(tmp_path / "ckpt_parity"), name="inc_er_parity",
        threshold=0.5,
    )
    stream_part = {
        (r["url"], r["cluster"])
        for r in canonical_partition(events).collect()
    }

    a = docs.select(
        F.col("block_key"), F.col("url").alias("url_a"), F.col("toks").alias("ta")
    )
    b = docs.select(
        F.col("block_key"), F.col("url").alias("url_b"), F.col("toks").alias("tb")
    )
    scored = (
        a.join(b, "block_key")
        .where(F.col("url_a") < F.col("url_b"))
        .select(
            "url_a", "url_b",
            tanimoto_col(F.col("ta"), F.col("tb")).alias("score"),
        )
    )
    edges = threshold_edges(scored, threshold=0.5)
    cc = connected_components(edges, vertices=docs.select("url"))
    batch_part = {(r["url"], r["cluster_id"]) for r in cc.collect()}

    assert len(stream_part) == docs.count()
    assert stream_part == batch_part


def test_incremental_er_member_cap_bounds_state(spark, tmp_path):
    """max_block_members: beyond the cap new pages are still assigned and
    emitted but NOT stored, so later pages cannot attach to uncapped
    members — per-batch cost and state stay O(cap) and the partition is
    a refinement of CC above the cap (documented caveat)."""
    from whoiswho_spark.streaming.incremental_er import (
        final_assignments,
        run_incremental_er_once,
    )

    src = str(tmp_path / "pages_cap")
    rows = [
        # c00/c01 fill the cap; c02 is dissimilar → new cluster, unstored
        ("c00", "blk", ["a", "b", "c", "d"]),
        ("c01", "blk", ["a", "b", "c", "e"]),
        ("c02", "blk", ["q", "r", "s", "t"]),
        # c03 matches ONLY the uncapped c02 (tan=0.6) — with the cap it
        # must found its own cluster; without the cap it would attach
        ("c03", "blk", ["q", "r", "s", "z"]),
    ]
    spark.createDataFrame(
        rows, "url string, block_key string, toks array<string>"
    ).coalesce(1).write.mode("append").parquet(src)
    events = run_incremental_er_once(
        spark, src, str(tmp_path / "ckpt_cap"), name="inc_er_cap",
        threshold=0.5, max_block_members=2,
    )
    fin = {r["url"]: r for r in final_assignments(events).collect()}
    assert len(fin) == 4
    assert fin["c01"]["cluster_id"] == "c00" and not fin["c01"]["is_new"]
    assert fin["c02"]["cluster_id"] == "c02" and fin["c02"]["is_new"]
    # the cap kept c02 out of the registry → c03 can't see it
    assert fin["c03"]["cluster_id"] == "c03" and fin["c03"]["is_new"]


def test_incremental_er_event_time_retention(spark, tmp_path):
    """The dedup twin's event-time bound on the ER registry: a member
    outside the trailing window is evicted when its block is touched, so
    a later look-alike page founds a NEW cluster instead of attaching —
    and without retention it attaches (control)."""
    from whoiswho_spark.streaming.incremental_er import (
        final_assignments,
        run_incremental_er_once,
    )

    # "a_old" sorts before "b_new" → processed first in the url-order
    # (no-retention) regime as well as the (ts, url) regime
    rows = [
        ("a_old", "blk", ["alpha", "beta", "gamma", "delta"], 0),
        ("b_new", "blk", ["alpha", "beta", "gamma", "epsilon"], 1000),
    ]
    schema = "url string, block_key string, toks array<string>, ts bigint"

    for ret, expect_new in ((None, False), (100, True)):
        src = str(tmp_path / f"src_{ret}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        events = run_incremental_er_once(
            spark, src, str(tmp_path / f"ck_{ret}"),
            name=f"inc_er_ret_{ret}", threshold=0.5, schema=schema,
            ts_col="ts", retention_seconds=ret,
        )
        fin = {r["url"]: r for r in final_assignments(events).collect()}
        assert fin["b_new"]["is_new"] is expect_new, ret
        assert fin["b_new"]["cluster_id"] == ("b_new" if expect_new else "a_old")


def test_incremental_er_maintenance_sweep_bounds_state(spark, tmp_path):
    """Cold-block trim: a maintenance sweep at a late ts evicts every
    retained member and REMOVES emptied block state rows — state key
    count drops to zero, emitted assignments untouched."""
    import os as _os

    import pyspark.sql.functions as F

    from whoiswho_spark.plans.metrics import read_streaming_metrics
    from whoiswho_spark.streaming.incremental_er import run_incremental_er_once

    src = str(tmp_path / "src_sweep")
    maint = str(tmp_path / "maint_sweep")
    ckpt = str(tmp_path / "ck_sweep")
    outd = str(tmp_path / "out_sweep")
    mdir = str(tmp_path / "metrics_sweep")
    _os.makedirs(maint, exist_ok=True)  # present-but-empty on drain 1

    schema = "url string, block_key string, toks array<string>, ts bigint"
    rows = [
        (f"u{i:02d}", f"blk{i % 3}", ["shared", "alpha", f"w{i}"], 100 + i)
        for i in range(12)
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
    kw = dict(
        schema=schema, ts_col="ts", retention_seconds=100,
        output_dir=outd, metrics_dir=mdir, maintenance_dir=maint,
    )
    run_incremental_er_once(spark, src, ckpt, name="inc_er_sw1", **kw)
    m1 = read_streaming_metrics(spark, mdir)
    assert m1.agg(F.max("state_rows")).collect()[0][0] >= 3  # 3 blocks live

    time.sleep(1.1)
    spark.createDataFrame(
        [(f"blk{b}", 10_000) for b in range(3)], "block_key string, ts bigint"
    ).coalesce(1).write.mode("append").parquet(maint)
    run_incremental_er_once(spark, src, ckpt, name="inc_er_sw2", **kw)
    m2 = read_streaming_metrics(spark, mdir)
    last = (
        m2.where(F.col("query") == "inc_er_sw2")
        .orderBy(F.desc("batch_id"))
        .limit(1)
        .collect()[0]
    )
    assert last["state_rows"] == 0, last
    ev = spark.read.parquet(outd)
    assert ev.where(F.col("url").startswith("\x00")).count() == 0
    assert ev.count() == 12


def test_retention_without_ts_col_raises(spark):
    """retention_seconds with no ts_col would silently disable eviction
    (every row gets ts=0, negative cutoff) — must fail loudly instead."""
    import pytest

    from whoiswho_spark.streaming.incremental_er import incremental_er_stream

    pages = spark.createDataFrame(
        [("u1", "b1", ["x"])], "url string, block_key string, toks array<string>"
    )
    with pytest.raises(ValueError, match="ts_col"):
        incremental_er_stream(pages, retention_seconds=60)


def test_cap_hits_surface_counter_and_warning(spark, tmp_path):
    """Blocks hitting max_block_members must be VISIBLE at run time: a
    CAP_ID sentinel event per un-stored member, a RuntimeWarning, and
    blocks_at_cap / cap_dropped_members rows in the run-counters table
    (parity degradation must not live only in a docstring)."""
    import warnings

    import pyspark.sql.functions as F

    from whoiswho_spark.plans.metrics import read_run_counters
    from whoiswho_spark.streaming.incremental_er import (
        CAP_ID,
        final_assignments,
        run_incremental_er_once,
    )

    src = str(tmp_path / "pages_capw")
    mdir = str(tmp_path / "m_capw")
    rows = [
        ("c00", "blk", ["a", "b", "c", "d"]),
        ("c01", "blk", ["a", "b", "c", "e"]),
        ("c02", "blk", ["q", "r", "s", "t"]),   # at cap: not stored
        ("c03", "blk", ["q", "r", "s", "z"]),   # at cap: not stored
        ("d00", "blk2", ["x", "y"]),            # uncapped block: no hits
    ]
    spark.createDataFrame(
        rows, "url string, block_key string, toks array<string>"
    ).coalesce(1).write.mode("append").parquet(src)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        events = run_incremental_er_once(
            spark, src, str(tmp_path / "ckpt_capw"), name="inc_er_capw",
            threshold=0.5, max_block_members=2, metrics_dir=mdir,
            run_id="rcap",
        )
        assert any("REFINEMENT" in str(x.message) for x in w)
    # two sentinel events, one per un-stored member, naming the member
    caps = events.where(F.col("url") == CAP_ID).collect()
    assert {r["cluster_id"] for r in caps} == {"c02", "c03"}
    assert all(r["matched_score"] == 2.0 for r in caps)  # registry size
    # the counters lineage rows
    c = {
        r["key"]: r["value"]
        for r in read_run_counters(spark, mdir).where(
            F.col("query") == "inc_er_capw"
        ).collect()
    }
    assert c == {
        "blocks_at_cap_cumulative": 1,
        "cap_dropped_members_cumulative": 2,
        "blocks_at_cap_this_run": 1,
        "cap_dropped_members_this_run": 2,
    }
    # sentinels are observability rows, not assignments
    fin = final_assignments(events)
    assert fin.where(F.col("url").startswith("\x00")).count() == 0
    assert fin.count() == 5


def test_retention_partition_equals_cc_over_retained_window(spark, tmp_path):
    """The event-time retention contract, test-backed instead of
    asserted: with retention ON and ts-ordered arrival, the final
    partition equals batch connected components over the RESTRICTED
    graph — only edges whose older endpoint was still retained when the
    newer one arrived (ts_new − ts_old ≤ retention_seconds) — which is a
    PROPER refinement of full batch CC whenever eviction actually splits
    a chain. (Retention OFF is the exact-CC contract, gated by
    test_incremental_er_matches_batch_partition.)"""
    from pyspark.sql import functions as F

    from whoiswho_spark.functions.similarity import tanimoto_col
    from whoiswho_spark.operators.clustering import (
        connected_components,
        threshold_edges,
    )
    from whoiswho_spark.streaming.incremental_er import (
        canonical_partition,
        run_incremental_er_once,
    )

    retention = 100
    # b1: a token chain (consecutive tan = 0.5) with ts gaps that cross
    # the retention boundary at two places (Δ180) and sit ON it once
    # (Δ100, kept: older endpoint exactly at the cutoff survives)
    ts_b1 = [0, 60, 120, 300, 400, 460, 640, 700]
    rows = [
        (f"a{i}", "b1", [f"t{i}", f"t{i+1}", f"t{i+2}"], ts_b1[i])
        for i in range(8)
    ]
    # b2: eviction prevents a MERGE — a2 would bridge a0 and a1 in full
    # CC, but a0 is outside the window when a2 arrives
    rows += [
        ("m0", "b2", ["a", "b"], 0),
        ("m1", "b2", ["c", "d"], 50),
        ("m2", "b2", ["a", "b", "c", "d"], 120),
    ]
    schema = "url string, block_key string, toks array<string>, ts bigint"
    docs = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "ret_stream")
    docs.orderBy("ts").coalesce(1).write.mode("overwrite").parquet(src)
    events = run_incremental_er_once(
        spark, src, str(tmp_path / "ckpt_ret"), name="inc_er_retpar",
        threshold=0.5, schema=schema, ts_col="ts", retention_seconds=retention,
    )
    stream_part = {
        (r["url"], r["cluster"]) for r in canonical_partition(events).collect()
    }

    a = docs.select("block_key", F.col("url").alias("url_a"),
                    F.col("toks").alias("ta"), F.col("ts").alias("ts_a"))
    b = docs.select("block_key", F.col("url").alias("url_b"),
                    F.col("toks").alias("tb"), F.col("ts").alias("ts_b"))
    scored = (
        a.join(b, "block_key")
        .where(F.col("url_a") < F.col("url_b"))
        .select(
            "url_a", "url_b",
            tanimoto_col(F.col("ta"), F.col("tb")).alias("score"),
            F.abs(F.col("ts_b") - F.col("ts_a")).alias("dts"),
        )
    )
    full_cc = connected_components(
        threshold_edges(scored, threshold=0.5), vertices=docs.select("url")
    )
    restricted_cc = connected_components(
        threshold_edges(
            scored.where(F.col("dts") <= retention), threshold=0.5
        ),
        vertices=docs.select("url"),
    )
    full_part = {(r["url"], r["cluster_id"]) for r in full_cc.collect()}
    restr_part = {(r["url"], r["cluster_id"]) for r in restricted_cc.collect()}

    assert stream_part == restr_part
    assert stream_part != full_part  # the refinement is PROPER here
    # and the splits are exactly where the ts gaps exceed retention
    clusters = {}
    for url, c in sorted(stream_part):
        clusters.setdefault(c, []).append(url)
    assert sorted(clusters.values()) == [
        ["a0", "a1", "a2"], ["a3", "a4", "a5"], ["a6", "a7"],
        ["m0"], ["m1", "m2"],
    ]


def test_multi_key_blocking_global_partition_matches_batch(spark, tmp_path):
    """Lifting the one-block-key-per-url precondition: stream every url
    under BOTH of its LSH-style band keys, then merge the per-block
    partitions with global_partition — the result must equal batch CC
    over the union of all blocks' ≥τ tanimoto graphs (which merges
    components ACROSS blocks through shared urls, something no
    per-block registry can do alone)."""
    from pyspark.sql import functions as F

    from whoiswho_spark.functions.similarity import tanimoto_col
    from whoiswho_spark.operators.clustering import (
        connected_components,
        threshold_edges,
    )
    from whoiswho_spark.operators.dedup import tokens_col
    from whoiswho_spark.streaming.incremental_er import (
        global_partition,
        run_incremental_er_once,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").cast("string").alias("url"),
        F.col("source").alias("b1"),
        # second, coarser band key: urls in different sources can share it
        (F.crc32(F.col("source")) % 7).cast("string").alias("b2"),
        F.array_distinct(tokens_col(F.col("text"))).alias("toks"),
    )
    multi = docs.select(
        "url", F.explode(F.array("b1", "b2")).alias("block_key"), "toks"
    )
    src = str(tmp_path / "mk_stream")
    multi.repartition(3).write.mode("overwrite").parquet(src)
    events = run_incremental_er_once(
        spark, src, str(tmp_path / "ckpt_mk"), name="inc_er_mk", threshold=0.5,
    )
    stream_part = {
        (r["url"], r["cluster_id"])
        for r in global_partition(
            events, vertices=docs.select("url")
        ).collect()
    }

    a = multi.select("block_key", F.col("url").alias("url_a"), F.col("toks").alias("ta"))
    b = multi.select("block_key", F.col("url").alias("url_b"), F.col("toks").alias("tb"))
    scored = (
        a.join(b, "block_key")
        .where(F.col("url_a") < F.col("url_b"))
        .select("url_a", "url_b", tanimoto_col(F.col("ta"), F.col("tb")).alias("score"))
    )
    cc = connected_components(
        threshold_edges(scored, threshold=0.5), vertices=docs.select("url")
    )
    batch_part = {(r["url"], r["cluster_id"]) for r in cc.collect()}
    assert len(stream_part) == docs.count()
    assert stream_part == batch_part
