"""Byte-identity contract tests for the normalization surface (SURVEY.md §5.2).

Goldens are minted by running the reference's exact pattern/recipes
(constants mirrored from /root/reference/whoiswho/dataset/data_process.py:19-31;
recipe call sites cited in whoiswho_spark/functions/normalize.py) — both the
Python UDF path and the Catalyst expr path must agree with them byte-for-byte.
"""

import re

import pyspark.sql.functions as F
import pytest

from whoiswho_spark.constants import PUNCS, PUNCS_REFERENCE_PY
from whoiswho_spark.functions.normalize import (
    corpus_tokens_col,
    norm_text_col,
    org_tokens_col,
    ref_extract_text,
    ref_norm_text,
    title_tokens_col,
    venue_tokens_col,
    year_sanitize_col,
)

ADVERSARIAL = [
    "Hello, World! (Test) [brackets] {braces} — em–dash ～tilde’",
    "  leading and trailing   ",
    "multi   spaces\tand\ttabs",
    "UPPER lower MiXeD",
    'quotes "straight" “curly” ’apostrophe’',
    "a.b.c/d:e;f<g>h?i@j",
    "back\\slash and ^caret _underscore `backtick",
    "unicode: naïve café 北京 äöü",
    "",
    "....",
    "one",
]


def test_portable_puncs_equals_reference_pattern():
    ref = re.compile(PUNCS_REFERENCE_PY)
    ours = re.compile(PUNCS)
    for s in ADVERSARIAL:
        assert ours.sub(" ", s) == ref.sub(" ", s), repr(s)


def test_ref_norm_text_literal_goldens():
    # hand-computed from the reference chain: strip → lower → puncs→' ' →
    # collapse 2+ ws → strip
    assert ref_norm_text("Hello, World!") == "hello world"
    assert ref_norm_text("  A  B  ") == "a b"
    assert ref_norm_text("foo—bar～baz’qux") == "foo bar baz qux"
    assert ref_norm_text("a-b") == "a b"
    assert ref_norm_text("....") == ""
    # single spaces are NOT collapsed by \s{2,}; puncs→' ' can create one
    assert ref_norm_text("x.y") == "x y"


def test_catalyst_norm_matches_reference_chain(spark):
    df = spark.createDataFrame([(s,) for s in ADVERSARIAL], "s string")
    got = [r["n"] for r in df.select(norm_text_col(F.col("s")).alias("n")).collect()]
    want = [ref_norm_text(s) for s in ADVERSARIAL]
    assert got == want


def test_token_filter_recipes(spark):
    # title keeps duplicates, len>1, drops STOPWORDS + STOPWORDS_CHECK
    # org    dedupes (set()),   len>1, drops STOPWORDS + STOPWORDS_EXTEND
    # venue  empty → ['null']
    df = spark.createDataFrame(
        [("deep deep learning at university x1 a", "university lab lab of x1", "the of at")],
        "title string, org string, venue string",
    )
    row = df.select(
        title_tokens_col(norm_text_col(F.col("title"))).alias("t"),
        org_tokens_col(norm_text_col(F.col("org"))).alias("o"),
        venue_tokens_col(norm_text_col(F.col("venue"))).alias("v"),
    ).collect()[0]
    # 'at' stopword, 'a' len 1, 'x1' kept, duplicate 'deep' kept;
    # 'university' survives the TITLE filter (STOPWORDS_EXTEND applies to
    # org/venue only — data_process.py:129-130 vs :182-183)
    assert row["t"] == ["deep", "deep", "learning", "university", "x1"]
    # 'university' in STOPWORDS_EXTEND dropped, 'lab' dropped, 'of' stopword,
    # set() dedupe leaves just x1
    assert sorted(row["o"]) == ["x1"]
    assert row["v"] == ["null"]


def test_corpus_tokens_len_threshold(spark):
    # embedding corpus uses len>2 (semantic_features.py:117), not len>1
    df = spark.createDataFrame([("ab abc abcd",)], "s string")
    row = df.select(corpus_tokens_col(F.col("s")).alias("c")).collect()[0]
    assert row["c"] == ["abc", "abcd"]


def test_year_sanitize(spark):
    df = spark.createDataFrame(
        [(None,), (1499,), (1500,), (2023,), (2024,), (0,)], "y int"
    )
    got = [r["s"] for r in df.select(year_sanitize_col(F.col("y")).alias("s")).collect()]
    assert got == [0, 0, 1500, 2023, 0, 0]


def test_extract_text_literal_golden():
    html = "<html><head><title>A, Title!</title></head><body><p>Body text.</p></body></html>".encode()
    # title ('A, Title!') + ' ' + tag-stripped body ('Body text.') →
    # normalized chain; note the len-1 'a' survives (stopword/token filters
    # are a separate stage, not part of the extraction contract)
    assert ref_extract_text(html) == "a title body text"


def test_extract_text_golden_exact():
    html = "<html><head><title>A, Title!</title></head><body><p>Body text.</p></body></html>".encode()
    raw = html.decode()
    m = re.search(r"<title>(.*?)</title>", raw, re.DOTALL | re.IGNORECASE)
    body = re.sub(r"<title>(.*?)</title>", " ", raw, flags=re.DOTALL | re.IGNORECASE)
    body = re.sub(r"<[^>]+>", " ", body)
    expected = (m.group(1) + " " + body).strip().lower()
    expected = re.sub(PUNCS_REFERENCE_PY, " ", expected)
    expected = re.sub(r"\s{2,}", " ", expected).strip()
    assert ref_extract_text(html) == expected


def test_spark_extract_byte_identical_to_stored_text(spark, corpus):
    """The pipeline's re-derived text must equal the corpus's contract
    column for every url (the per-row invariant in BASELINE.json)."""
    from whoiswho_spark.plans.pipeline import extract_stage

    pages = corpus.select("url", "warc_ts", "html", "text", "lang")
    derived = extract_stage(pages).select("url", F.col("text").alias("derived"))
    joined = pages.select("url", "text").join(derived, "url")
    mismatches = joined.where(F.col("text") != F.col("derived")).count()
    assert mismatches == 0


def test_year_sanitize_string_junk_ansi_safe(spark):
    """data_process.py:330-337: '' and junk strings map to 0 — under
    Spark 4 ANSI mode (ON here) this requires try_cast, not cast."""
    from whoiswho_spark.functions.normalize import year_sanitize_col

    df = spark.createDataFrame(
        [("",), ("n/a",), ("2010",), ("1200",), (None,)], "year string"
    )
    got = [r["y"] for r in df.select(year_sanitize_col(F.col("year")).alias("y")).collect()]
    assert got == [0, 0, 2010, 0, 0]
