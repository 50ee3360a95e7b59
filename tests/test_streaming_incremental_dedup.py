"""Stateful streaming incremental MinHash/LSH dedup: bucket membership
as group state carried across micro-batches; streamed candidate-pair set
must equal the batch minhash_dup_pairs set on the same corpus."""

import os
import time


def _docs(i, words):
    return (f"d{i:03d}", " ".join(words))


def test_incremental_dedup_matches_batch_pairs(spark, tmp_path):
    """The streaming matcher over two micro-batches emits EXACTLY the
    batch operator's candidate pairs (same tokenize/signature/band
    chain), including cross-batch pairs that only exist because bucket
    membership persisted."""
    from whoiswho_spark.operators.dedup import minhash_dup_pairs
    from whoiswho_spark.streaming.incremental_dedup import (
        run_incremental_dedup_once,
    )

    src = str(tmp_path / "docs_stream")
    ckpt = str(tmp_path / "ckpt")

    rows1 = [
        _docs(0, ["the", "quick", "brown", "fox", "jumps"]),
        _docs(1, ["the", "quick", "brown", "fox", "jumps"]),  # exact dup of d000
        _docs(2, ["completely", "unrelated", "text", "body"]),
        _docs(3, ["lorem", "ipsum", "dolor", "sit", "amet"]),
    ]
    rows2 = [
        _docs(4, ["the", "quick", "brown", "fox", "jumps"]),  # dup across batches
        _docs(5, ["lorem", "ipsum", "dolor", "sit", "amet"]),
        _docs(6, ["nothing", "like", "anything", "else"]),
    ]
    schema = "doc_id string, text string"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)

    streamed = run_incremental_dedup_once(spark, src, ckpt, name="inc_dd_t1")
    got = {
        (r["id_a"], r["id_b"])
        for r in streamed.dropDuplicates(["id_a", "id_b"]).collect()
    }

    batch = minhash_dup_pairs(
        spark.createDataFrame(rows1 + rows2, schema), n_salts=2, salt_min_bucket=2
    )
    want = {(r["id_a"], r["id_b"]) for r in batch.collect()}
    assert got == want and ("d000", "d004") in got  # cross-batch pair present

    # exact duplicates agree on every hash → est_jaccard 1.0
    ej = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in streamed.dropDuplicates(["id_a", "id_b"]).collect()
    }
    assert ej[("d000", "d001")] == 1.0 and ej[("d003", "d005")] == 1.0


def test_incremental_dedup_randomized_batch_parity(spark, tmp_path):
    """Seeded random corpus from a tiny vocabulary (high bucket-collision
    probability), split across three micro-batch files in shuffled
    order: the streamed candidate-pair set must equal the batch operator
    exactly — no pair invented, none lost across batch boundaries."""
    import random

    from whoiswho_spark.operators.dedup import minhash_dup_pairs
    from whoiswho_spark.streaming.incremental_dedup import (
        run_incremental_dedup_once,
    )

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (f"r{i:03d}", " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 6))))
        for i in range(45)
    ]
    rng.shuffle(rows)
    src = str(tmp_path / "docs_rand")
    schema = "doc_id string, text string"
    for chunk in (rows[:15], rows[15:30], rows[30:]):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    streamed = run_incremental_dedup_once(
        spark, src, str(tmp_path / "ckpt_rand"), name="inc_dd_rand"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in streamed.dropDuplicates(["id_a", "id_b"]).collect()
    }
    batch = minhash_dup_pairs(
        spark.createDataFrame(rows, schema), n_salts=2, salt_min_bucket=4
    )
    want = {(r["id_a"], r["id_b"]) for r in batch.collect()}
    assert got == want and len(want) > 50  # collisions actually occurred


def test_incremental_dedup_resumes_from_checkpoint(spark, tmp_path):
    """A second availableNow run over the same checkpoint processes only
    the new file and still pairs against members ingested in run 1 (the
    bucket membership survives the restart via the state store)."""
    from whoiswho_spark.streaming.incremental_dedup import (
        run_incremental_dedup_once,
    )

    src = str(tmp_path / "docs_stream2")
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "pairs_out")
    schema = "doc_id string, text string"

    spark.createDataFrame(
        [_docs(0, ["alpha", "beta", "gamma", "delta"])], schema
    ).coalesce(1).write.mode("append").parquet(src)
    first = run_incremental_dedup_once(spark, src, ckpt, output_dir=out)
    assert first.count() == 0  # nothing to pair with yet

    time.sleep(1.1)
    spark.createDataFrame(
        [_docs(9, ["alpha", "beta", "gamma", "delta"])], schema
    ).coalesce(1).write.mode("append").parquet(src)
    second = run_incremental_dedup_once(spark, src, ckpt, output_dir=out)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in second.dropDuplicates(["id_a", "id_b"]).collect()
    }
    assert pairs == {("d000", "d009")}


def test_incremental_dedup_duplicate_id_rows_match_batch(spark, tmp_path):
    """Two rows sharing a doc_id with DIFFERENT text (recrawl shape):
    membership and the `known` skip are per-(band,bucket), so the second
    row's new buckets still process it and the pair set stays equal to
    the batch operator's (a same-bucket duplicate-id row is a no-op for
    the distinct pair set in both engines)."""
    from whoiswho_spark.operators.dedup import minhash_dup_pairs
    from whoiswho_spark.streaming.incremental_dedup import (
        run_incremental_dedup_once,
    )

    rows = [
        ("d1", "alpha beta gamma delta"),
        ("d2", "alpha beta gamma delta"),
        ("d1", "umber vole wren yak"),  # recrawled d1, different text
        ("d3", "umber vole wren yak"),
        ("d1", "alpha beta gamma delta"),  # identical re-delivery
    ]
    schema = "doc_id string, text string"
    src = str(tmp_path / "docs_dupid")
    spark.createDataFrame(rows[:3], schema).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(rows[3:], schema).coalesce(1).write.mode("append").parquet(src)

    streamed = run_incremental_dedup_once(
        spark, src, str(tmp_path / "ckpt_dupid"), name="inc_dd_dupid"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in streamed.dropDuplicates(["id_a", "id_b"]).collect()
    }
    batch = minhash_dup_pairs(spark.createDataFrame(rows, schema))
    want = {(r["id_a"], r["id_b"]) for r in batch.collect()}
    # both text identities of d1 must pair: d2 via the first text,
    # d3 via the recrawl text
    assert {("d1", "d2"), ("d1", "d3")} <= want
    assert got == want


def test_streaming_metrics_counters_per_microbatch(spark, tmp_path):
    """metrics_dir wiring: one counters row PER MICRO-BATCH in the
    streaming metrics table (the north rule's lineage contract applied
    to the stateful operators) — input rows sum to the corpus size and
    the state-store row count is carried."""
    from whoiswho_spark.plans.metrics import read_streaming_metrics
    from whoiswho_spark.streaming.incremental_dedup import (
        run_incremental_dedup_once,
    )

    src = str(tmp_path / "docs_metrics")
    schema = "doc_id string, text string"
    spark.createDataFrame(
        [_docs(0, ["alpha", "beta", "gamma"]), _docs(1, ["alpha", "beta", "gamma"])],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(
        [_docs(2, ["alpha", "beta", "gamma"])], schema
    ).coalesce(1).write.mode("append").parquet(src)

    mdir = str(tmp_path / "work")
    run_incremental_dedup_once(
        spark, src, str(tmp_path / "ckpt_m"), name="inc_dd_metrics",
        metrics_dir=mdir, run_id="testrun",
    )
    m = read_streaming_metrics(spark, mdir)
    rows = sorted(
        (r["batch_id"], r["input_rows"], r["state_rows"]) for r in m.collect()
    )
    batches_with_input = [r for r in rows if r[1] > 0]
    assert len(batches_with_input) == 2  # one per drained file
    assert sum(r[1] for r in rows) == 3
    # state rows = state KEYS: identical docs share one bucket per band
    # → 2 (band,bucket) groups in the store after the final batch
    assert max(r[2] for r in rows) == 2
    assert {r["run_id"] for r in m.collect()} == {"testrun"}
    assert {r["query"] for r in m.collect()} == {"inc_dd_metrics"}


def test_incremental_dedup_event_time_retention(spark, tmp_path):
    """retention_seconds bounds membership by EVENT time: a member whose
    ingest timestamp falls outside the new doc's trailing window is
    evicted before pairing. Deterministic — no wall clock, no sleeps.
    d0(ts=100) pairs with d4(ts=140) (inside the 60 s window); d9
    (ts=190) evicts d0 (cutoff 130) and pairs only with d4. Without
    retention the same input yields all three pairs."""
    from whoiswho_spark.streaming.incremental_dedup import (
        run_incremental_dedup_once,
    )

    schema = "doc_id string, text string, ts bigint"
    same = "alpha beta gamma delta"
    rows1 = [("d0", same, 100)]
    rows2 = [("d4", same, 140), ("d9", same, 190)]

    def run(tag, retention):
        src = str(tmp_path / f"docs_{tag}")
        spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
        spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        got = run_incremental_dedup_once(
            spark, src, str(tmp_path / f"ckpt_{tag}"), name=f"inc_dd_{tag}",
            schema=schema, ts_col="ts", retention_seconds=retention,
        )
        return {
            (r["id_a"], r["id_b"])
            for r in got.dropDuplicates(["id_a", "id_b"]).collect()
        }

    assert run("ret", 60) == {("d0", "d4"), ("d4", "d9")}
    assert run("noret", None) == {("d0", "d4"), ("d0", "d9"), ("d4", "d9")}


def test_incremental_dedup_retention_readmits_recrawled_member(spark, tmp_path):
    """An id evicted earlier in the SAME micro-batch and re-delivered
    with a fresh timestamp must re-admit and pair (the membership skip
    set is kept in sync with eviction): d9(ts=190) evicts d0(ts=100),
    then the d0 recrawl at ts=195 pairs with d9 and rejoins the
    bucket."""
    from whoiswho_spark.streaming.incremental_dedup import (
        run_incremental_dedup_once,
    )

    schema = "doc_id string, text string, ts bigint"
    same = "alpha beta gamma delta"
    src = str(tmp_path / "docs_readmit")
    spark.createDataFrame([("d0", same, 100)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(
        [("d9", same, 190), ("d0", same, 195)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    got = run_incremental_dedup_once(
        spark, src, str(tmp_path / "ckpt_readmit"), name="inc_dd_readmit",
        schema=schema, ts_col="ts", retention_seconds=60,
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in got.dropDuplicates(["id_a", "id_b"]).collect()
    }
    assert pairs == {("d0", "d9")}


def test_incremental_dedup_bucket_cap_bounds_state(spark, tmp_path):
    """Beyond max_bucket_size a bucket stops accumulating members but
    still reports new-vs-retained pairs: with cap=2 and four identical
    docs, later docs pair with the two retained members only."""
    from whoiswho_spark.streaming.incremental_dedup import (
        run_incremental_dedup_once,
    )

    src = str(tmp_path / "docs_stream3")
    schema = "doc_id string, text string"
    same = ["same", "text", "every", "time"]
    spark.createDataFrame(
        [_docs(i, same) for i in range(4)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    import warnings

    from whoiswho_spark.streaming.incremental_dedup import (
        distinct_candidate_pairs,
    )

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # cap warning expected
        streamed = run_incremental_dedup_once(
            spark, src, str(tmp_path / "ckpt3"), name="inc_dd_t3", max_bucket_size=2
        )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in distinct_candidate_pairs(streamed).collect()
    }
    # d002/d003 each pair with retained d000,d001; the (d002,d003) pair
    # is the documented under-report for over-cap boilerplate buckets
    assert pairs == {
        ("d000", "d001"), ("d000", "d002"), ("d001", "d002"),
        ("d000", "d003"), ("d001", "d003"),
    }


def test_maintenance_sweep_bounds_state(spark, tmp_path):
    """Cold-bucket trim: buckets that stop receiving docs keep their
    tails until touched — a maintenance sweep (sentinel rows touching
    every known bucket at a late ts) evicts them and REMOVES emptied
    state rows, so after the sweep the state key count is exactly the
    within-window buckets (here: zero). The ingest-rate × window bound
    becomes strict."""
    import pyspark.sql.functions as F

    from whoiswho_spark.operators.dedup import minhash_band_buckets
    from whoiswho_spark.plans.metrics import read_streaming_metrics
    from whoiswho_spark.streaming.incremental_dedup import (
        run_incremental_dedup_once,
    )

    src = str(tmp_path / "docs_m")
    maint = str(tmp_path / "maint_m")
    ckpt = str(tmp_path / "ckpt_m")
    outd = str(tmp_path / "out_m")
    mdir = str(tmp_path / "metrics_m")
    os.makedirs(maint, exist_ok=True)  # present-but-empty on drain 1

    docs = [
        (f"d{i:02d}", f"tok{i % 7} shared alpha beta w{i}", 100 + i)
        for i in range(20)
    ]
    docs_df = spark.createDataFrame(docs, "doc_id string, text string, ts bigint")
    docs_df.coalesce(1).write.mode("append").parquet(src)

    kw = dict(
        schema="doc_id string, text string, ts bigint",
        ts_col="ts", retention_seconds=100,
        output_dir=outd, metrics_dir=mdir, maintenance_dir=maint,
    )
    run_incremental_dedup_once(spark, src, ckpt, name="inc_dd_m1", **kw)
    m1 = read_streaming_metrics(spark, mdir)
    peak = m1.agg(F.max("state_rows")).collect()[0][0]
    assert peak and peak > 0  # buckets populated

    # sweep: touch EVERY bucket the corpus ever produced, far past the
    # window → everything evicts, emptied keys leave the store
    time.sleep(1.1)
    minhash_band_buckets(docs_df, text_col="text", id_col="doc_id").select(
        "band", "bucket"
    ).distinct().withColumn("ts", F.lit(10_000).cast("bigint")).coalesce(
        1
    ).write.mode("append").parquet(maint)
    run_incremental_dedup_once(spark, src, ckpt, name="inc_dd_m2", **kw)

    m2 = read_streaming_metrics(spark, mdir)
    last = (
        m2.where(F.col("query") == "inc_dd_m2")
        .orderBy(F.desc("batch_id"))
        .limit(1)
        .collect()[0]
    )
    assert last["state_rows"] == 0, last
    # the sweep emitted no pairs and disturbed none of the earlier output
    pairs = spark.read.parquet(outd)
    assert pairs.where(F.col("id_a").startswith("\x00")).count() == 0
    assert pairs.count() > 0


def test_retention_without_ts_col_raises(spark):
    """Same guard as the ER twin: retention_seconds without ts_col means
    nothing ever evicts — fail loudly, not silently."""
    import pytest

    from whoiswho_spark.streaming.incremental_dedup import incremental_dedup_stream

    docs = spark.createDataFrame([("d1", "a b c")], "doc_id string, text string")
    with pytest.raises(ValueError, match="ts_col"):
        incremental_dedup_stream(docs, retention_seconds=60)


def test_dedup_cap_hits_surface_counter_and_warning(spark, tmp_path):
    """The dedup twin of the ER cap observability: buckets hitting
    max_bucket_size emit a CAP_ID sentinel per un-stored doc, the drain
    warns, and buckets_at_cap / cap_dropped_members land in the
    run-counters table; distinct_candidate_pairs excludes sentinels."""
    import warnings

    import pyspark.sql.functions as F

    from whoiswho_spark.plans.metrics import read_run_counters
    from whoiswho_spark.streaming.incremental_dedup import (
        CAP_ID,
        distinct_candidate_pairs,
        run_incremental_dedup_once,
    )

    src = str(tmp_path / "docs_capw")
    mdir = str(tmp_path / "m_capw")
    schema = "doc_id string, text string"
    same = ["same", "text", "every", "time"]
    spark.createDataFrame(
        [_docs(i, same) for i in range(4)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        streamed = run_incremental_dedup_once(
            spark, src, str(tmp_path / "ckpt_capw"), name="inc_dd_capw",
            max_bucket_size=2, metrics_dir=mdir, run_id="rcapd",
            output_dir=str(tmp_path / "out_capw"),
        )
        assert any("UNDER-REPORTED" in str(x.message) for x in w)
    caps = streamed.where(F.col("id_a") == CAP_ID)
    # d002 and d003 hit the cap in every band's bucket (2 bands)
    assert {r["id_b"] for r in caps.collect()} == {"d002", "d003"}
    assert caps.count() == 4  # 2 docs × 2 band buckets
    c = {
        r["key"]: r["value"]
        for r in read_run_counters(spark, mdir).where(
            F.col("query") == "inc_dd_capw"
        ).collect()
    }
    assert c == {
        "buckets_at_cap_cumulative": 2,
        "cap_dropped_members_cumulative": 4,
        "buckets_at_cap_this_run": 2,
        "cap_dropped_members_this_run": 4,
    }
    assert distinct_candidate_pairs(streamed).where(
        F.col("id_a").startswith("\x00")
    ).count() == 0

    # resumed drain over the same sink: cumulative rows re-count the
    # whole pair log, but *_this_run counts only the new drain's hits
    spark.createDataFrame(
        [_docs(i, same) for i in range(4, 6)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        run_incremental_dedup_once(
            spark, src, str(tmp_path / "ckpt_capw"), name="inc_dd_capw",
            max_bucket_size=2, metrics_dir=mdir, run_id="rcapd2",
            output_dir=str(tmp_path / "out_capw"),
        )
    c2 = {
        r["key"]: r["value"]
        for r in read_run_counters(spark, mdir).where(
            (F.col("query") == "inc_dd_capw") & (F.col("run_id") == "rcapd2")
        ).collect()
    }
    assert c2["cap_dropped_members_cumulative"] == 8  # 4 prior + 2 docs × 2 bands
    assert c2["cap_dropped_members_this_run"] == 4
    assert c2["buckets_at_cap_this_run"] == 0  # same 2 buckets, none new
