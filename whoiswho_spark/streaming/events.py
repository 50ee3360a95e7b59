"""Structured Streaming extension (SURVEY.md §2.11).

The reference is batch-only — its "real-time" RND is bulk recomputation
(SURVEY.md §1.3) — so streaming is an extension, not parity: the same
event aggregations as the batch `events_hourly` query, expressed as a
stream with watermarked tumbling windows, plus session windows. Tested
with a file source + availableNow trigger (exactly-once over a static
directory), which is also how a backfill over Iceberg snapshots runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def hourly_counts(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h windows with late-data watermark — the streaming twin
    of the batch events_hourly oracle query."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def user_sessions(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (stateful; watermark bounds state)."""
    return (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def run_once_to_memory(
    spark: SparkSession, agg: DataFrame, name: str, mode: str = "complete"
) -> DataFrame:
    """Drain all available input into an in-memory sink (availableNow) —
    deterministic single-pass execution for tests/backfills."""
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
