"""Source/sink surface (SURVEY §2.1): round-trips for the thin wrappers
that replace the reference's file I/O (utils.py:25-69,
data_process.py:60-84)."""

import os

from pyspark.sql import functions as F

from whoiswho_spark.sources.catalog import (
    read_json,
    read_table,
    read_text_corpus,
    read_tsv,
    write_json,
    write_partitioned,
    write_table,
)


def test_json_roundtrip_and_schema(spark, tmp_path):
    p = str(tmp_path / "j")
    df = spark.createDataFrame(
        [(1, "a", [1.0, 2.0]), (2, "b", [3.0, 4.0])],
        "id bigint, name string, vec array<double>",
    )
    write_json(df, p)
    back = read_json(spark, p, schema="id bigint, name string, vec array<double>")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # schema'd read keeps types (no string-inference drift)
    assert dict(back.dtypes)["vec"] == "array<double>"


def test_tsv_scan_with_set_dedupe(spark, tmp_path):
    p = tmp_path / "rel.tsv"
    p.write_text("p1\tt1\np1\tt1\np2\tt2\n")  # duplicate line, reference set() drops it
    df = read_tsv(spark, str(p), "pid string, token string").distinct()
    assert sorted(map(tuple, df.collect())) == [("p1", "t1"), ("p2", "t2")]


def test_text_corpus_scan(spark, tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_text("alpha beta\ngamma delta epsilon\n")
    df = read_text_corpus(spark, str(p)).select(
        F.split("value", " ").alias("tokens")
    )
    got = sorted(len(r["tokens"]) for r in df.collect())
    assert got == [2, 3]


def test_partitioned_sink_prunes_partitions(spark, tmp_path):
    p = str(tmp_path / "blocks")
    df = spark.createDataFrame(
        [("b1", 1), ("b1", 2), ("b2", 3)], "block string, v int"
    )
    write_partitioned(df, p, "block")
    # one directory per block — the per-name-file sink's replacement
    assert sorted(
        d for d in os.listdir(p) if d.startswith("block=")
    ) == ["block=b1", "block=b2"]
    # partition PRUNING: a block filter must not scan the other partition
    one = spark.read.parquet(p).where(F.col("block") == "b1")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "block=b1" not in plan or "block=b2" not in plan
    assert {r["v"] for r in one.collect()} == {1, 2}


def test_parquet_table_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    df = spark.createDataFrame([(1, "x")], "id bigint, s string")
    write_table(df, p)
    assert read_table(spark, str(tmp_path), "t").collect() == df.collect()


def test_bucketed_join_is_shuffle_free(spark):
    """Two tables bucketed identically on the join key must join WITHOUT
    any Exchange (the co-location contract write_bucketed exists for);
    the same join on plain tables shuffles both sides."""
    from whoiswho_spark.sources.catalog import write_bucketed

    left = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    write_bucketed(left, "t_bkt_left", "k", n_buckets=8)
    write_bucketed(right, "t_bkt_right", "k", n_buckets=8)
    try:
        bl, br = spark.table("t_bkt_left"), spark.table("t_bkt_right")
        # disable auto-broadcast so the join strategy is the bucketed SMJ
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = bl.join(br, "k")
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert j.count() == 2000

            plain = left.join(right, "k")
            plain_plan = plain._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" in plain_plan  # the baseline DOES shuffle
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("drop table if exists t_bkt_left")
        spark.sql("drop table if exists t_bkt_right")
