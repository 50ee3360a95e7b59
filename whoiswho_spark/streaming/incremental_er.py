"""Streaming incremental entity resolution (SURVEY.md §2.11 extension).

The reference's "real-time" RND is bulk recomputation over the full
candidate set (SURVEY.md §1.3); the batch twin here is
plans/rnd_pipeline.py (new pages → existing clusters + NIL). This module
is the genuinely-streaming version: pages arrive as a stream and each
micro-batch assigns them to existing entity clusters or mints new ones,
with the cluster registry held as OPERATOR STATE — a custom stateful
operator via ``applyInPandasWithState``.

Shape and scale notes:
- state is keyed by ``block_key`` (the same LSH/host blocking key the
  batch pipeline shuffles on), so state size per key is bounded by the
  block-cap discipline, and the shuffle is the one Spark already does to
  co-locate a key's rows with its state.
- each cluster is represented by its FIRST member's token set (leader
  representative — deterministic, O(1) state growth per cluster; the
  batch pipeline's transitive closure is the offline compaction step).
- within a micro-batch rows are processed in url order → deterministic
  assignments for a given file/batch split.
- new pages attach to the best-scoring representative with token-set
  Tanimoto ≥ threshold (AutoTrainSND's tanimoto, the same scorer the
  flagship uses), else they found a new cluster labeled by their url.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

OUTPUT_SCHEMA = (
    "url string, block_key string, cluster_id string, "
    "matched_score double, is_new boolean"
)
# reps stored as space-joined sorted token strings (flat state schema)
STATE_SCHEMA = "ids array<string>, reps array<string>"


def _tanimoto(a: set, b: set) -> float:
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def make_assigner(threshold: float = 0.5):
    """Build the per-group stateful assigner (threshold rides the
    closure, like a broadcast scalar)."""

    def assign(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        block_key = key[0]
        if state.exists:
            ids, reps = state.get
            ids, reps = list(ids), list(reps)
        else:
            ids, reps = [], []
        rep_sets = [set(r.split(" ")) if r else set() for r in reps]

        out = {
            "url": [], "block_key": [], "cluster_id": [],
            "matched_score": [], "is_new": [],
        }
        # materialize ALL Arrow chunks before sorting: a group larger
        # than one Arrow batch arrives as several frames whose order is
        # shuffle-dependent — sorting each chunk independently would
        # break the documented processed-in-url-order determinism.
        # Memory is bounded by the group (this stateful op already holds
        # the group's cluster registry).
        chunks = list(pdfs)
        whole = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        if len(whole):
            pdf = whole.sort_values("url")
            for url, toks in zip(pdf["url"], pdf["toks"]):
                ts = set(toks) if toks is not None else set()
                best_i, best_s = -1, -1.0
                for i, rs in enumerate(rep_sets):
                    s = _tanimoto(ts, rs)
                    if s > best_s:
                        best_i, best_s = i, s
                if best_i >= 0 and best_s >= threshold:
                    cid, score, is_new = ids[best_i], best_s, False
                else:
                    cid, score, is_new = url, 1.0, True
                    ids.append(url)
                    reps.append(" ".join(sorted(ts)))
                    rep_sets.append(ts)
                out["url"].append(url)
                out["block_key"].append(block_key)
                out["cluster_id"].append(cid)
                out["matched_score"].append(float(score))
                out["is_new"].append(is_new)
        state.update((ids, reps))
        yield pd.DataFrame(out)

    return assign


def incremental_er_stream(
    pages: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """pages stream (url, block_key, toks ARRAY<STRING>) →
    (url, block_key, cluster_id, matched_score, is_new) append stream.

    The cluster registry lives in per-block-key group state and persists
    across micro-batches (and across restarts via the checkpoint dir).
    """
    return (
        pages.groupBy("block_key")
        .applyInPandasWithState(
            make_assigner(threshold),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_incremental_er_once(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    name: str = "inc_er",
    threshold: float = 0.5,
    schema: str | StructType = "url string, block_key string, toks array<string>",
    max_files_per_trigger: int = 1,
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
    Returns the full assignment table."""
    from whoiswho_spark.plans.metrics import append_streaming_metrics, new_run_id

    if metrics_dir is not None:
        # recentProgress keeps only the last N events (default 100); the
        # per-micro-batch counters contract needs every batch (session-
        # wide setting, read at query start)
        spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    assigned = incremental_er_stream(stream, threshold)
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
        if metrics_dir is not None:
            append_streaming_metrics(spark, metrics_dir, run_id or new_run_id(), q)
        return spark.read.parquet(output_dir)
    q = (
        assigned.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if metrics_dir is not None:
        append_streaming_metrics(spark, metrics_dir, run_id or new_run_id(), q)
    return spark.table(name)
