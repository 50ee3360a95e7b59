"""Per-stage / per-partition lineage counters + stage checkpointing.

The north rule requires every stage to write per-partition lineage and
counters to a metrics table and to checkpoint its output so the pipeline
resumes mid-stage after failure. The reference has no such layer (its
"resume" is file-existence checks, /root/reference/whoiswho/dataset/
load_utils.py:25-173); ours is a thin deterministic table protocol:

- stage output  → parquet dir (``_SUCCESS`` is the completion marker —
  written atomically by Spark's committer, so a killed write never looks
  complete).
- metrics rows  → append-mode parquet ``metrics`` table with
  (run_id, stage, partition_id, rows_out, wall_ms, ts).

``stage()`` is the only entry point: skip-if-complete, else compute,
write, count per partition, append metrics. Partition counts come from
``spark_partition_id`` — one cheap extra aggregate on the already-written
table, not an accumulator (deterministic under retries).

At cluster scale the same protocol targets Iceberg tables
(``writeTo(...).append()``); parquet-dir is the local stand-in with
identical semantics.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRICS_SCHEMA = (
    "run_id string, stage string, partition_id int, rows_out bigint, "
    "wall_ms bigint, ts timestamp"
)


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]


def _success_exists(spark: SparkSession, path: str) -> bool:
    # Use Hadoop FS (works for local paths and object stores alike).
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path + "/_SUCCESS")
    return p.getFileSystem(conf).exists(p)


def append_metrics(
    spark: SparkSession,
    workdir: str,
    run_id: str,
    stage_name: str,
    out_df: DataFrame,
    wall_ms: int,
) -> None:
    counts = (
        out_df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count("*").alias("rows_out"))
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage_name).alias("stage"),
            "partition_id",
            "rows_out",
            F.lit(wall_ms).cast("bigint").alias("wall_ms"),
            F.current_timestamp().alias("ts"),
        )
    )
    counts.write.mode("append").parquet(f"{workdir}/metrics")


def stage(
    spark: SparkSession,
    workdir: str,
    run_id: str,
    name: str,
    compute,
    resume: bool = True,
) -> DataFrame:
    """Checkpointed stage: returns the stage's output DataFrame, reading
    the existing checkpoint when complete (resume), else computing via
    ``compute() -> DataFrame``, writing, and recording lineage."""
    path = f"{workdir}/{name}"
    if resume and _success_exists(spark, path):
        persisted = spark.read.parquet(path)
        # Crash window: the checkpoint committer wrote _SUCCESS but the
        # process died before the lineage append. A resumed run would
        # otherwise return here and the (stage) metrics rows would be
        # missing FOREVER — backfill them from the checkpoint (wall_ms=0
        # marks a backfilled row; partition counts re-derived from the
        # stored table are the same lineage the original append records).
        try:
            have = (
                read_metrics(spark, workdir)
                .where(F.col("stage") == name)
                .limit(1)
                .count()
                > 0
            )
        except Exception:
            have = False
        if not have:
            append_metrics(spark, workdir, run_id, name, persisted, wall_ms=0)
        return persisted
    t0 = time.monotonic()
    out = compute()
    out.write.mode("overwrite").parquet(path)
    wall_ms = int((time.monotonic() - t0) * 1000)
    persisted = spark.read.parquet(path)
    append_metrics(spark, workdir, run_id, name, persisted, wall_ms)
    return persisted


def read_metrics(spark: SparkSession, workdir: str) -> DataFrame:
    return spark.read.schema(METRICS_SCHEMA).parquet(f"{workdir}/metrics")


# --- bucketed stage checkpoints ----------------------------------------------


def _bucket_table_name(workdir: str, name: str) -> str:
    """Deterministic catalog name for a workdir's bucketed stage table
    (the metastore needs a name; the data lives under the workdir)."""
    import hashlib

    h = hashlib.md5(workdir.encode()).hexdigest()[:10]
    return f"wiws_{h}_{name}"


_BUCKET_SPEC_FILE = "_bucket_spec.json"


def _write_bucket_spec(
    spark: SparkSession, path: str, bucket_col: str, n_buckets: int
) -> None:
    """Persist the bucket layout beside the data (Hadoop FS, so the spec
    travels with the checkpoint on object stores too). Resume validates
    against it: the files, not the caller's current config, are the truth
    about how the parquet is clustered."""
    import json

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/{_BUCKET_SPEC_FILE}")
    fs = p.getFileSystem(conf)
    out = fs.create(p, True)
    out.write(
        bytearray(
            json.dumps({"bucket_col": bucket_col, "n_buckets": n_buckets}).encode()
        )
    )
    out.close()


def _read_bucket_spec(spark: SparkSession, path: str) -> dict | None:
    import json

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/{_BUCKET_SPEC_FILE}")
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        # per-byte py4j reads: the spec is ~60 bytes, no classpath deps
        data = bytearray()
        b = stream.read()
        while b != -1:
            data.append(b)
            b = stream.read()
    finally:
        stream.close()
    try:
        return json.loads(bytes(data).decode())
    except ValueError:
        return None


def _ensure_bucket_table(
    spark: SparkSession, tbl: str, path: str, bucket_col: str, n_buckets: int
) -> None:
    """Re-register an EXTERNAL bucketed table over an existing stage
    checkpoint (a fresh session's metastore doesn't know last run's
    tables; the parquet files + this DDL carry the full bucket layout)."""
    if spark.catalog.tableExists(tbl):
        return
    schema = spark.read.parquet(path).schema
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )
    spark.sql(
        f"CREATE TABLE {tbl} ({cols}) USING PARQUET "
        f"CLUSTERED BY (`{bucket_col}`) SORTED BY (`{bucket_col}`) "
        f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
    )


def stage_bucketed(
    spark: SparkSession,
    workdir: str,
    run_id: str,
    name: str,
    compute,
    bucket_col: str,
    n_buckets: int = 16,
    resume: bool = True,
) -> DataFrame:
    """``stage()`` with a BUCKETED checkpoint: the output is written as
    an external parquet table bucketed (and sorted) on ``bucket_col``
    under ``{workdir}/{name}``, and consumers get ``spark.table(...)``
    so every later join on the bucket key — in this run or a resumed
    one — reads the stored layout with ZERO Exchange on this side
    (test_bucketed_join_is_shuffle_free is the plan contract; Iceberg's
    bucket partition transform is the cluster twin). Plain
    ``spark.read.parquet(path)`` still works for bucket-agnostic
    readers (evaluate_run), it just doesn't see the layout."""
    path = f"{workdir}/{name}"
    tbl = _bucket_table_name(workdir, name)
    if resume and _success_exists(spark, path):
        spec = _read_bucket_spec(spark, path)
        if spec == {"bucket_col": bucket_col, "n_buckets": n_buckets}:
            _ensure_bucket_table(spark, tbl, path, bucket_col, n_buckets)
            persisted = spark.table(tbl)
        else:
            # the checkpoint was written with a DIFFERENT layout (other
            # bucket_stages config, or by plain stage() with no spec):
            # registering CLUSTERED BY metadata the files don't satisfy
            # would silently drop join matches (bucketed joins skip the
            # Exchange) or fail with 'Invalid bucket file'. Fall back to
            # a plain parquet read — correct, just with an Exchange —
            # and drop any stale catalog entry so no one else trusts it.
            import warnings

            warnings.warn(
                f"stage_bucketed('{name}'): checkpoint bucket spec {spec} "
                f"!= requested ({bucket_col}, {n_buckets}); resuming as a "
                "plain (unbucketed) parquet read",
                RuntimeWarning,
                stacklevel=2,
            )
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            persisted = spark.read.parquet(path)
        try:
            have = (
                read_metrics(spark, workdir)
                .where(F.col("stage") == name)
                .limit(1)
                .count()
                > 0
            )
        except Exception:
            have = False
        if not have:  # same crash-window backfill as stage()
            append_metrics(spark, workdir, run_id, name, persisted, wall_ms=0)
        return persisted
    t0 = time.monotonic()
    out = compute()
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    (
        out.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .saveAsTable(tbl)
    )
    _write_bucket_spec(spark, path, bucket_col, n_buckets)
    wall_ms = int((time.monotonic() - t0) * 1000)
    persisted = spark.table(tbl)
    append_metrics(spark, workdir, run_id, name, persisted, wall_ms)
    return persisted


# --- streaming counters -------------------------------------------------------

STREAMING_METRICS_SCHEMA = (
    "run_id string, query string, batch_id bigint, input_rows bigint, "
    "output_rows bigint, state_rows bigint, wall_ms bigint, ts timestamp"
)


def append_streaming_metrics(
    spark: SparkSession, workdir: str, run_id: str, query
) -> None:
    """Per-MICRO-BATCH counters for a finished streaming query — the
    streaming twin of ``append_metrics`` (the north rule's metrics-table
    contract applied to the stateful operators). One row per progress
    event from ``query.recentProgress``: input/output row counts, the
    state-store row total (registry/membership size), and batch wall.
    Appended to ``{workdir}/metrics_streaming``; at cluster scale the
    same rows target an Iceberg table.

    ``recentProgress`` retains the LAST ``spark.sql.streaming.
    numRecentProgressUpdates`` events (default 100) — the run_*_once
    helpers raise it before starting when a metrics_dir is passed; for
    hand-rolled long-running queries raise it yourself or attach a
    StreamingQueryListener. A drain with more micro-batches than the cap
    silently loses the OLDEST batches; that truncation is surfaced here
    as a loud warning (len(recentProgress) == cap is the tell) so the
    'every batch' contract can never fail silently."""
    import warnings

    progress = list(query.recentProgress)
    try:
        cap = int(
            spark.conf.get("spark.sql.streaming.numRecentProgressUpdates", "100")
        )
    except Exception:
        cap = 100
    if progress and len(progress) >= cap:
        warnings.warn(
            f"streaming metrics for {query.name or query.id}: recentProgress "
            f"holds {len(progress)} events == the numRecentProgressUpdates "
            f"cap ({cap}) — the oldest micro-batches' counter rows were "
            "dropped; raise the cap (or attach a StreamingQueryListener) "
            "for a complete metrics table",
            RuntimeWarning,
            stacklevel=2,
        )
    rows = []
    for p in progress:
        state = p.get("stateOperators") or []
        state_rows = sum(int(s.get("numRowsTotal", 0)) for s in state)
        sink_rows = int((p.get("sink") or {}).get("numOutputRows", -1))
        rows.append(
            (
                run_id,
                str(p.get("name") or p.get("id") or "query"),
                int(p.get("batchId", -1)),
                int(p.get("numInputRows", 0)),
                sink_rows,
                state_rows,
                int((p.get("durationMs") or {}).get("triggerExecution", 0)),
            )
        )
    if not rows:
        return
    # write schema = read schema minus the ts column (stamped below) —
    # derived, not re-declared, so the two cannot drift
    write_schema = STREAMING_METRICS_SCHEMA.rsplit(", ts timestamp", 1)[0]
    df = spark.createDataFrame(rows, write_schema).withColumn(
        "ts", F.current_timestamp()
    )
    df.coalesce(1).write.mode("append").parquet(f"{workdir}/metrics_streaming")


def read_streaming_metrics(spark: SparkSession, workdir: str) -> DataFrame:
    return spark.read.schema(STREAMING_METRICS_SCHEMA).parquet(
        f"{workdir}/metrics_streaming"
    )


RUN_COUNTERS_SCHEMA = (
    "run_id string, query string, key string, value bigint, ts timestamp"
)


def append_run_counters(
    spark: SparkSession,
    workdir: str,
    run_id: str,
    query: str,
    counters: dict[str, int],
) -> None:
    """Append named per-run counters (key → value) to the lineage store —
    the generic channel for operator-level observability the progress
    events can't carry (e.g. the streaming-ER ``blocks_at_cap`` count:
    applyInPandasWithState exposes no custom metrics to Python, so the
    operator surfaces cap hits as sentinel events and the run helper
    tallies them here). One row per key; read with read_run_counters."""
    if not counters:
        return
    rows = [(run_id, query, k, int(v)) for k, v in sorted(counters.items())]
    write_schema = RUN_COUNTERS_SCHEMA.rsplit(", ts timestamp", 1)[0]
    df = spark.createDataFrame(rows, write_schema).withColumn(
        "ts", F.current_timestamp()
    )
    df.coalesce(1).write.mode("append").parquet(f"{workdir}/counters")


def read_run_counters(spark: SparkSession, workdir: str) -> DataFrame:
    return spark.read.schema(RUN_COUNTERS_SCHEMA).parquet(f"{workdir}/counters")


def append_cumulative_counters(
    spark: SparkSession,
    workdir: str,
    run_id: str,
    query: str,
    cumulative: dict[str, int],
) -> None:
    """Record counters tallied over a GROWING log (e.g. a resumed
    streaming parquet sink, where each drain's tally re-counts every
    prior run's rows). Writes two rows per key: ``{key}_cumulative``
    (the tally as given) and ``{key}_this_run`` (the delta vs the
    largest previously recorded cumulative for this query — valid
    because a grow-only log makes the cumulative tally monotone).
    Summing ``*_this_run`` across runs equals the latest cumulative;
    summing the raw cumulative rows would overstate (the bug this
    helper exists to prevent)."""
    from pyspark.errors import AnalysisException

    prev: dict[str, int] = {}
    try:
        rows = (
            read_run_counters(spark, workdir)
            .where(F.col("query") == F.lit(query))
            .groupBy("key")
            .agg(F.max("value").alias("v"))
            .collect()
        )
        prev = {r["key"]: int(r["v"]) for r in rows}
    except AnalysisException:
        pass  # first run: no counters table yet
    out: dict[str, int] = {}
    for k, v in cumulative.items():
        out[f"{k}_cumulative"] = int(v)
        out[f"{k}_this_run"] = max(0, int(v) - prev.get(f"{k}_cumulative", 0))
    append_run_counters(spark, workdir, run_id, query, out)
