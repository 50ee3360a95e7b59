"""Streaming incremental entity resolution (SURVEY.md §2.11 extension).

The reference's "real-time" RND is bulk recomputation over the full
candidate set (SURVEY.md §1.3); the batch twin here is
plans/rnd_pipeline.py (new pages → existing clusters + NIL). This module
is the genuinely-streaming version: pages arrive as a stream and each
micro-batch assigns them to existing entity clusters or mints new ones,
with the cluster registry held as OPERATOR STATE — a custom stateful
operator via ``applyInPandasWithState``.

Attach semantics mirror the reference's post_match rules
(/root/reference/whoiswho/training/AutoTrainSND.py:163-206): an incoming
page is scored against EVERY stored member (not a cluster leader), joins
the argmax member's cluster when the best score clears the threshold
(``pred[i] = pred[j]`` of the argmax j), and ALL clusters holding a
member above threshold are merged into the winner — the streaming form
of the reference's outlier-outlier transitive chaining
(``pred[j] = pred[i]`` for every above-threshold pair, AutoTrainSND.py:
199-206). Merging makes the FINAL PARTITION exactly the connected
components of the ≥-threshold tanimoto graph, for ANY arrival order /
micro-batch split — the same partition the batch pipeline computes with
threshold_edges + connected_components. That equivalence is the
operator's correctness contract (oracle-checked: the DuckDB twin
computes the components with a recursive CTE; pytest
test_incremental_er_matches_batch_partition drives the batch operators).

Shape and scale notes:
- state is keyed by ``block_key`` (the same LSH/host blocking key the
  batch pipeline shuffles on); the shuffle is the one Spark already does
  to co-locate a key's rows with its state.
- state holds one row per MEMBER (url, token string, cluster id, ts) —
  bounded by ``max_block_members`` (the incremental_dedup
  max_bucket_size discipline): beyond the cap new pages are still
  assigned and emitted, but not stored, so they cannot attract future
  attachments and per-batch cost stays O(cap). CC-parity is exact below
  the cap; above it the partition is a refinement (documented caveat,
  cap lifted at test scale). ``ts_col`` + ``retention_seconds`` add the
  dedup twin's EVENT-TIME bound (members outside the trailing window
  evict on touch; partition becomes the trailing-window refinement),
  and maintenance sentinel rows sweep cold blocks, removing emptied
  state rows — the same strict rate × window bound.
- cluster merges re-emit the relabeled members as correction events;
  every event carries a per-block ``seq`` so the LAST event per url is
  its final assignment (``final_assignments``) — the append-mode log
  stays valid for the parquet sink / checkpoint-recovery lineage
  contract.
- within a micro-batch rows are processed in url order → deterministic
  assignments for a given file/batch split (the partition itself is
  order-independent; scores/labels of individual events are not).

PRECONDITION — one block key per url: the registry is PER-BLOCK (state is
keyed by ``block_key`` and blocks never see each other), so the batch-CC
parity contract assumes each url is streamed under exactly ONE blocking
key. Feed a url under several keys (as multi-band LSH blocking emits) and
(a) batch CC would merge components ACROSS blocks sharing the url, which
no per-block registry can do, and (b) ``final_assignments`` — which
windows by url over the per-block seq — picks an arbitrary cross-block
winner, since seq is only monotonic within a block. For multi-key
blocking use ``global_partition`` — it reduces per-(url, block) finals
and merges the per-block partitions with connected components, restoring
exact batch parity over the union of the blocks' ≥τ graphs — or
pre-reduce to one canonical key per url (a coarser blocking, documented
recall trade).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType
from pyspark.sql.window import Window

OUTPUT_SCHEMA = (
    "url string, block_key string, cluster_id string, "
    "matched_score double, is_new boolean, seq bigint"
)
# one entry per member: url, space-joined sorted token string, cluster
# id, ingest ts. State schema v2 (tss landed with event-time retention);
# a v1 checkpoint cannot resume against this build — start a fresh
# checkpoint dir (the event OUTPUT is append-only parquet and survives).
STATE_SCHEMA = (
    "urls array<string>, reps array<string>, cids array<string>, "
    "tss array<bigint>, seq bigint"
)

#: sentinel url for maintenance rows (maintenance_touch_rows_er):
#: touches a block_key so event-time eviction runs without assignment.
MAINTENANCE_ID = "\x00__maintenance__"

#: sentinel url for cap-hit events: emitted (never stored) whenever a
#: member is assigned but NOT added to the registry because the block is
#: at ``max_block_members`` — the runtime tell that the partition has
#: degraded from exact batch-CC parity to a refinement for this block.
#: Row shape: url=CAP_ID, cluster_id=the un-stored member's url,
#: matched_score=the registry size (the cap). run_incremental_er_once
#: tallies these into the run-counters table (``blocks_at_cap``,
#: ``cap_dropped_members``) and warns; ``final_assignments`` filters the
#: ``\x00`` sentinel namespace out of the reduced view.
CAP_ID = "\x00__at_cap__"


def _tanimoto(a: set, b: set) -> float:
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def make_assigner(
    threshold: float = 0.5,
    max_block_members: int | None = None,
    retention_seconds: int | None = None,
):
    """Build the per-group stateful assigner (threshold / cap /
    retention ride the closure, like broadcast scalars).

    ``retention_seconds`` bounds state by EVENT TIME exactly like the
    dedup twin (incremental_dedup.make_bucket_matcher): members whose
    ingest ts falls outside ``row.ts − retention`` are evicted before
    scoring, so a block's registry stays within its trailing-window
    occupancy. Under retention the final partition is the
    trailing-window form — components of the graph restricted to edges
    whose older endpoint was still retained when the newer one arrived
    (ts_new − ts_old ≤ retention, for ts-ordered arrival) — a refinement
    of batch CC (exact CC parity is the default
    ``retention_seconds=None`` contract, which the oracle checks). Both
    halves are test-backed: test_retention_partition_equals_cc_over_
    retained_window pins the restricted-graph equality (and that the
    refinement is proper when eviction splits a chain);
    test_incremental_er_matches_batch_partition pins exact parity with
    retention off.
    Maintenance rows (url == MAINTENANCE_ID) evict at their ts without
    assigning, and a fully-evicted block's state row is REMOVED."""

    def assign(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        block_key = key[0]
        if state.exists:
            urls, reps, cids, tss, seq = state.get
            urls, reps, cids, tss = (
                list(urls), list(reps), list(cids), list(tss)
            )
            seq = int(seq)
        else:
            urls, reps, cids, tss, seq = [], [], [], [], 0
        rep_sets = [set(r.split(" ")) if r else set() for r in reps]

        out = {
            "url": [], "block_key": [], "cluster_id": [],
            "matched_score": [], "is_new": [], "seq": [],
        }

        def emit(url: str, cid: str, score: float, is_new: bool) -> None:
            nonlocal seq
            out["url"].append(url)
            out["block_key"].append(block_key)
            out["cluster_id"].append(cid)
            out["matched_score"].append(score)
            out["is_new"].append(is_new)
            out["seq"].append(seq)
            seq += 1

        def evict(now: int) -> None:
            nonlocal urls, reps, cids, tss, rep_sets
            cutoff = now - retention_seconds
            keep = [i for i, t in enumerate(tss) if t >= cutoff]
            if len(keep) != len(urls):
                urls = [urls[i] for i in keep]
                reps = [reps[i] for i in keep]
                cids = [cids[i] for i in keep]
                tss = [tss[i] for i in keep]
                rep_sets = [rep_sets[i] for i in keep]

        # materialize ALL Arrow chunks before sorting: a group larger
        # than one Arrow batch arrives as several frames whose order is
        # shuffle-dependent — sorting each chunk independently would
        # break the documented processed-in-url-order determinism.
        # Memory is bounded by the group (this stateful op already holds
        # the group's member registry).
        chunks = list(pdfs)
        whole = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        if len(whole):
            # event-time order when retention is on (eviction must see
            # rows oldest-first); plain url order otherwise
            sort_keys = ["ts", "url"] if retention_seconds is not None else ["url"]
            pdf = whole.sort_values(sort_keys)
            for url, toks, row_ts in zip(pdf["url"], pdf["toks"], pdf["ts"]):
                if url == MAINTENANCE_ID:
                    if retention_seconds is not None:
                        evict(int(row_ts))
                    continue
                if retention_seconds is not None:
                    evict(int(row_ts))
                ts = set(toks) if toks is not None else set()
                best_i, best_s = -1, -1.0
                qual_cids: set[str] = set()
                for i, rs in enumerate(rep_sets):
                    s = _tanimoto(ts, rs)
                    if s >= threshold:
                        qual_cids.add(cids[i])
                    # reference argmax (first max index); members are in
                    # insertion order, ties broken by smaller url below
                    if s > best_s or (s == best_s and best_i >= 0 and urls[i] < urls[best_i]):
                        best_i, best_s = i, s
                if best_i >= 0 and best_s >= threshold:
                    cid, score, is_new = cids[best_i], best_s, False
                    losers = qual_cids - {cid}
                    if losers:
                        # transitive merge: relabel every member of the
                        # other qualifying clusters and re-emit them as
                        # correction events (newer seq wins per url)
                        for i, member in enumerate(urls):
                            if cids[i] in losers:
                                cids[i] = cid
                                emit(member, cid, float("nan"), False)
                else:
                    cid, score, is_new = url, 1.0, True
                if max_block_members is None or len(urls) < max_block_members:
                    urls.append(url)
                    reps.append(" ".join(sorted(ts)))
                    cids.append(cid)
                    tss.append(int(row_ts))
                    rep_sets.append(ts)
                else:
                    # cap hit: the page is assigned + emitted but NOT
                    # stored — surface it as a sentinel event so parity
                    # degradation is visible at run time, not only in
                    # the docstring (cluster_id records WHICH member was
                    # dropped; matched_score the registry size)
                    emit(CAP_ID, url, float(len(urls)), False)
                emit(url, cid, float(score), is_new)
        if urls:
            state.update((urls, reps, cids, tss, seq))
        elif state.exists:
            # fully evicted (maintenance sweep or retention): drop the
            # state row so cold blocks stop occupying the store
            state.remove()
        yield pd.DataFrame(out)

    return assign


def maintenance_touch_rows_er(
    blocks: DataFrame, ts_col: str = "ts"
) -> DataFrame:
    """(block_key[, ts]) → sentinel rows in the page-stream shape: union
    these into the stream (``maintenance`` arg / ``maintenance_dir``) to
    sweep cold block registries under retention."""
    return blocks.select(
        F.lit(MAINTENANCE_ID).alias("url"),
        # the block_key is the STATE KEY — pin it non-nullable like the
        # main chain's, or the union widens the state key schema and a
        # resumed checkpoint rejects it
        F.coalesce(F.col("block_key").cast("string"), F.lit("")).alias(
            "block_key"
        ),
        F.array().cast("array<string>").alias("toks"),
        F.coalesce(F.col(ts_col).cast("bigint"), F.lit(0).cast("bigint")).alias(
            "ts"
        ),
    )


def incremental_er_stream(
    pages: DataFrame,
    threshold: float = 0.5,
    max_block_members: int | None = None,
    ts_col: str | None = None,
    retention_seconds: int | None = None,
    maintenance: DataFrame | None = None,
) -> DataFrame:
    """pages stream (url, block_key, toks ARRAY<STRING>[, ts]) →
    (url, block_key, cluster_id, matched_score, is_new, seq) append
    stream of ASSIGNMENT EVENTS (merge corrections re-emit members with
    a newer seq; reduce with ``final_assignments``).

    The member registry lives in per-block-key group state and persists
    across micro-batches (and across restarts via the checkpoint dir).
    ``ts_col`` + ``retention_seconds`` bound it by event time;
    ``maintenance`` (sentinel rows from maintenance_touch_rows_er)
    sweeps cold blocks (see make_assigner)."""
    if retention_seconds is not None and ts_col is None:
        # without a ts column every row gets ts=0, the eviction cutoff is
        # negative, and nothing ever evicts — the caller would believe the
        # event-time state bound is active when it is silently OFF
        raise ValueError(
            "retention_seconds requires ts_col: with no event-time column "
            "every member gets ts=0 and retention never evicts"
        )
    ts = (
        F.coalesce(F.col(ts_col).cast("bigint"), F.lit(0).cast("bigint"))
        if ts_col
        else F.lit(0).cast("bigint")
    )
    shaped = pages.select("url", "block_key", "toks", ts.alias("ts"))
    if maintenance is not None:
        shaped = shaped.unionByName(maintenance)
    return (
        shaped.groupBy("block_key")
        .applyInPandasWithState(
            make_assigner(threshold, max_block_members, retention_seconds),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def final_assignments(events: DataFrame) -> DataFrame:
    """Reduce the assignment-event log to the final row per url (the
    newest seq wins — merge corrections supersede earlier labels).
    Sentinel events (``\\x00`` url namespace: cap hits) are excluded —
    they are observability rows, not assignments."""
    w = Window.partitionBy("url").orderBy(F.desc("seq"))
    return (
        events.where(~F.col("url").startswith("\x00"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "seq")
    )


def final_assignments_per_block(events: DataFrame) -> DataFrame:
    """Final row per (url, block_key) — the multi-key-blocking form of
    ``final_assignments`` (seq is monotonic per block, so the global
    per-url window is only valid under the one-key-per-url
    precondition; this window is always valid)."""
    w = Window.partitionBy("url", "block_key").orderBy(F.desc("seq"))
    return (
        events.where(~F.col("url").startswith("\x00"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "seq")
    )


def global_partition(
    events: DataFrame, vertices: DataFrame | None = None
) -> DataFrame:
    """Multi-key blocking composition (lifts the module docstring's
    one-block-key-per-url PRECONDITION): when a url is streamed under
    SEVERAL blocking keys (as multi-band LSH emits), each block's
    registry resolves its own partition; this helper merges them into
    the global one — per-(url, block) final assignments → co-membership
    edges (url ↔ min member of its block cluster, the dbscan path's
    merge idiom) → ``connected_components``.

    Equality contract: each block's streamed partition equals batch CC
    of that block's ≥τ graph (the module contract), and CC of the union
    of per-block co-membership edge sets equals CC of the union of the
    blocks' ≥τ graphs — so this output equals the BATCH pipeline's
    partition over multi-key blocking (pytest
    test_multi_key_blocking_global_partition_matches_batch)."""
    fin = final_assignments_per_block(events)
    # alias the grouping keys before the self-join (the canonical_partition
    # workaround: both branches would otherwise share attribute ids)
    canon = (
        fin.select(
            F.col("block_key").alias("_bk"),
            F.col("cluster_id").alias("_cid"),
            "url",
        )
        .groupBy("_bk", "_cid")
        .agg(F.min("url").alias("_root"))
    )
    edges = (
        fin.join(
            canon,
            (fin["block_key"] == canon["_bk"])
            & (fin["cluster_id"] == canon["_cid"]),
        )
        .where(F.col("url") != F.col("_root"))
        .select(F.col("url").alias("src"), F.col("_root").alias("dst"))
    )
    from whoiswho_spark.operators.clustering import connected_components

    if vertices is None:
        vertices = fin.select("url").distinct()
    return connected_components(edges, vertices=vertices)


def canonical_partition(events: DataFrame) -> DataFrame:
    """(url, block_key, cluster) with cluster canonicalized to the
    MIN MEMBER url — the arrival-order-independent form of the final
    partition (equals the batch threshold-graph connected components;
    see module docstring)."""
    fin = final_assignments(events)
    # rename the grouping key before the self-join so the two branches of
    # the plan don't share the cluster_id attribute (analyzer conflict)
    canon = (
        fin.select(F.col("cluster_id").alias("_cid"), "url")
        .groupBy("_cid")
        .agg(F.min("url").alias("cluster"))
    )
    return fin.join(
        canon, fin["cluster_id"] == canon["_cid"]
    ).select("url", "block_key", "cluster")


def _surface_cap_hits(
    spark, events: DataFrame, name: str, metrics_dir: str | None, run_id: str | None
) -> None:
    """Tally CAP_ID sentinel events after a drain: warn when any block
    hit max_block_members (the partition is now a refinement of batch CC
    for those blocks — operators should see that at run time, not read
    it in a docstring) and record ``blocks_at_cap`` /
    ``cap_dropped_members`` in the run-counters lineage table, as BOTH
    ``*_cumulative`` (tallied over the whole event log — a resumed
    parquet sink holds prior runs' events too) and ``*_this_run``
    (delta vs the previous recorded cumulative, so per-run rows sum
    correctly across resumed drains)."""
    import warnings

    from whoiswho_spark.plans.metrics import append_cumulative_counters, new_run_id

    cap = events.where(F.col("url") == F.lit(CAP_ID))
    agg = cap.agg(
        F.count("*").alias("dropped"),
        F.count_distinct("block_key").alias("blocks"),
    ).collect()[0]
    dropped, blocks = int(agg["dropped"]), int(agg["blocks"])
    if dropped:
        warnings.warn(
            f"incremental_er[{name}]: {blocks} block(s) at max_block_members "
            f"({dropped} member(s) assigned but not stored) — the final "
            "partition is a REFINEMENT of batch connected components for "
            "those blocks",
            RuntimeWarning,
            stacklevel=3,
        )
    if metrics_dir is not None:
        append_cumulative_counters(
            spark, metrics_dir, run_id or new_run_id(), name,
            {"blocks_at_cap": blocks, "cap_dropped_members": dropped},
        )


def run_incremental_er_once(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    name: str = "inc_er",
    threshold: float = 0.5,
    schema: str | StructType = "url string, block_key string, toks array<string>",
    max_files_per_trigger: int = 1,
    max_block_members: int | None = None,
    ts_col: str | None = None,
    retention_seconds: int | None = None,
    maintenance_dir: str | None = None,
    output_dir: str | None = None,
    metrics_dir: str | None = None,
    run_id: str | None = None,
) -> DataFrame:
    """Drain a parquet directory through the stateful assigner with
    availableNow (one file per micro-batch → state genuinely carries
    across batches). Sink: memory table by default (single-run tests);
    pass ``output_dir`` for a parquet sink, which — unlike the memory
    sink — supports CHECKPOINT RECOVERY, so a later call with the same
    checkpoint resumes the state store and processes only new files.
    Pass ``metrics_dir`` to append per-micro-batch counters (input/
    output/state rows, batch wall) to the streaming metrics table — the
    north rule's lineage contract applied to the stateful operator.
    Returns the full assignment-EVENT table (reduce with
    ``final_assignments``)."""
    from whoiswho_spark.plans.metrics import append_streaming_metrics, new_run_id

    prev_cap = None
    if metrics_dir is not None:
        # recentProgress keeps only the last N events (default 100); the
        # per-micro-batch counters contract needs every batch (session-
        # wide setting, read at query start; restored after the drain)
        prev_cap = spark.conf.get(
            "spark.sql.streaming.numRecentProgressUpdates", "100"
        )
        spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")

    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_dir)
        )
        maintenance = None
        if maintenance_dir is not None:
            # second file source of (block_key, ts) touch requests —
            # appended between drains to sweep cold block registries
            maintenance = maintenance_touch_rows_er(
                spark.readStream.schema("block_key string, ts bigint")
                .option("maxFilesPerTrigger", max_files_per_trigger)
                .parquet(maintenance_dir)
            )
        assigned = incremental_er_stream(
            stream,
            threshold,
            max_block_members,
            ts_col=ts_col,
            retention_seconds=retention_seconds,
            maintenance=maintenance,
        )
        if output_dir is not None:
            q = (
                assigned.writeStream.format("parquet")
                .queryName(name)
                .option("path", output_dir)
                .option("checkpointLocation", checkpoint_dir)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            out = spark.read.parquet(output_dir)
            _surface_cap_hits(
                spark, out, name, metrics_dir, run_id
            )
            if metrics_dir is not None:
                append_streaming_metrics(spark, metrics_dir, run_id or new_run_id(), q)
            return out
        q = (
            assigned.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.table(name)
        _surface_cap_hits(spark, out, name, metrics_dir, run_id)
        if metrics_dir is not None:
            append_streaming_metrics(spark, metrics_dir, run_id or new_run_id(), q)
        return out
    finally:
        if prev_cap is not None:
            spark.conf.set(
                "spark.sql.streaming.numRecentProgressUpdates", prev_cap
            )
