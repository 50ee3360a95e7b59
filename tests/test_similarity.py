"""Similarity kernels vs independent oracles (pure Python / DuckDB)."""

import random

import duckdb
import numpy as np
import pyspark.sql.functions as F
import pytest

from whoiswho_spark.functions.similarity import (
    cosine_col,
    dot_col,
    intersect_count_col,
    jaro_winkler,
    jaro_winkler_udf,
    knrm_pool,
    ngram_cosine_udf,
    tanimoto_col,
)


def _ref_tanimoto(p, q):
    """The reference's tanimoto (/root/reference/whoiswho/training/
    AutoTrainSND.py:24-32), called on two sets."""
    c = [v for v in p if v in q]
    return float(len(c) / (len(p) + len(q) - len(c)))


def test_tanimoto_matches_reference(spark):
    rng = random.Random(7)
    rows = []
    for _ in range(50):
        a = sorted({f"t{rng.randint(0, 20)}" for _ in range(rng.randint(1, 10))})
        b = sorted({f"t{rng.randint(0, 20)}" for _ in range(rng.randint(1, 10))})
        rows.append((a, b, _ref_tanimoto(set(a), set(b))))
    df = spark.createDataFrame(rows, "a array<string>, b array<string>, want double")
    got = df.select(
        (F.abs(tanimoto_col(F.col("a"), F.col("b")) - F.col("want")) < 1e-12).alias("ok")
    )
    assert got.where(~F.col("ok")).count() == 0


def test_intersect_count(spark):
    df = spark.createDataFrame(
        [(["a", "b", "c"], ["b", "c", "d"])], "a array<string>, b array<string>"
    )
    assert df.select(intersect_count_col(F.col("a"), F.col("b")).alias("n")).collect()[
        0
    ]["n"] == 2.0


def test_dot_and_cosine_vs_numpy(spark):
    rng = np.random.RandomState(3)
    rows = []
    for _ in range(30):
        a = rng.randn(16)
        b = rng.randn(16)
        rows.append((a.tolist(), b.tolist(), float(a @ b),
                     float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))))
    df = spark.createDataFrame(rows, "a array<double>, b array<double>, d double, c double")
    bad = df.where(
        (F.abs(dot_col(F.col("a"), F.col("b")) - F.col("d")) > 1e-9)
        | (F.abs(cosine_col(F.col("a"), F.col("b")) - F.col("c")) > 1e-9)
    ).count()
    assert bad == 0


def test_jaro_winkler_matches_duckdb(spark):
    cases = [
        ("martha", "marhta"),
        ("dixon", "dicksonx"),
        ("jellyfish", "smellyfish"),
        ("", "abc"),
        ("abc", "abc"),
        ("web page title", "web page titel"),
    ]
    for a, b in cases:
        want = duckdb.sql(
            "select jaro_winkler_similarity(?, ?)", params=[a, b]
        ).fetchone()[0]
        assert abs(jaro_winkler(a, b) - want) < 1e-9, (a, b)
    df = spark.createDataFrame(cases, "a string, b string")
    got = df.select("a", "b", jaro_winkler_udf(F.col("a"), F.col("b")).alias("jw")).collect()
    for r in got:
        want = duckdb.sql(
            "select jaro_winkler_similarity(?, ?)", params=[r["a"], r["b"]]
        ).fetchone()[0]
        assert abs(r["jw"] - want) < 1e-9


def test_ngram_cosine_basics(spark):
    df = spark.createDataFrame(
        [("abcdef", "abcdef"), ("abcdef", "uvwxyz"), ("", "abc")],
        "a string, b string",
    )
    got = [r["c"] for r in df.select(ngram_cosine_udf("a", "b").alias("c")).collect()]
    assert abs(got[0] - 1.0) < 1e-12
    assert got[1] == 0.0
    assert got[2] == 0.0


def test_knrm_pool_properties():
    # identical singleton vectors → similarity 1 → exact-match kernel fires
    s = np.array([[1.0]])
    v = knrm_pool(s)
    assert v.shape[0] == 41  # 40 soft kernels + exact match (model.py:103-135)
    assert v[-1] > 0.5  # exact-match kernel
    # empty matrix → zeros
    assert (knrm_pool(np.zeros((0, 0))) == 0).all()


def test_get_jaro_distance_pyjarowinkler_parity():
    """The reference call-site function (feature_process.py:368):
    pyjarowinkler applies the Winkler boost UNCONDITIONALLY and rounds to
    2dp — published library values, incl. a sub-0.7-threshold case where
    it diverges from DuckDB/standard JW."""
    from whoiswho_spark.functions.similarity import get_jaro_distance

    assert get_jaro_distance("martha", "marhta") == 0.96
    assert get_jaro_distance("dixon", "dicksonx") == 0.81
    assert get_jaro_distance("hello", "haloa") == 0.76
    # jaro('00','01') = 2/3 ≤ 0.7: pyjarowinkler still boosts (→ 0.7),
    # DuckDB does not (→ 0.6667)
    assert get_jaro_distance("00", "01") == 0.7
    import duckdb as dd

    assert abs(dd.sql("select jaro_winkler_similarity('00','01')").fetchone()[0] - 2 / 3) < 1e-12
