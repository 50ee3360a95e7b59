"""Stateful streaming incremental ER: cluster registry as group state,
carried across micro-batches (applyInPandasWithState)."""

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
    assert len(rows) == 6

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
