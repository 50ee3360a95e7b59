"""Composed corpus-quality gates (functions/quality_filter.py): each
gate fires on the document crafted to fail it and only that one, the
keep conjunction holds, and filter_documents returns the original rows
of exactly the keepers.
"""

from pyspark.sql import functions as F

from whoiswho_spark.functions.quality_filter import (
    filter_documents,
    quality_filter_flags,
)

# one doc per failure mode + one clean doc (the en stopword density and
# length keep the clean doc inside every gate)
CLEAN = (
    "the data is in the table and the query can scan the rows for the "
    "join with the hash keys and the sort order is fast by design"
)
ROWS = [
    (1, CLEAN),
    (2, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk"),  # no markers -> lang
    (3, "the the the the the the the the the the the the"),  # repetition
    (4, CLEAN),  # cross-doc dup of 1 (doc 1 owns; doc 4 flags)
]


def _flags(spark):
    docs = spark.createDataFrame(ROWS, "doc_id bigint, text string")
    return {
        r.doc_id: r
        for r in quality_filter_flags(docs, lang_threshold=0.08).collect()
    }


def test_each_gate_fires_on_its_document(spark):
    out = _flags(spark)
    assert out[1].asDict() == {
        "doc_id": 1, "flag_lang": 0, "flag_quality": 0,
        "flag_repetition": 0, "flag_dup": 1, "keep": 0,
    }  # doc 1 shares every 8-gram with doc 4 -> both flag as dups
    assert out[2].flag_lang == 1 and out[2].keep == 0
    assert out[3].flag_repetition == 1 and out[3].keep == 0
    assert out[4].flag_dup == 1 and out[4].keep == 0


def test_clean_doc_without_duplicate_keeps(spark):
    docs = spark.createDataFrame(ROWS[:3], "doc_id bigint, text string")
    out = {
        r.doc_id: r
        for r in quality_filter_flags(docs, lang_threshold=0.08).collect()
    }
    assert out[1].asDict() == {
        "doc_id": 1, "flag_lang": 0, "flag_quality": 0,
        "flag_repetition": 0, "flag_dup": 0, "keep": 1,
    }


def test_filter_documents_semi_join_preserves_columns(spark):
    docs = spark.createDataFrame(
        [(i, t, f"extra{i}") for i, t in ROWS[:3]],
        "doc_id bigint, text string, extra string",
    )
    kept = filter_documents(docs, lang_threshold=0.08).collect()
    assert [r.doc_id for r in kept] == [1]
    assert kept[0].extra == "extra1"  # original row, original columns


def test_quality_gate_threshold_param(spark):
    docs = spark.createDataFrame(ROWS[:1], "doc_id bigint, text string")
    strict = quality_filter_flags(docs, min_quality=0.99).collect()[0]
    assert strict.flag_quality == 1 and strict.keep == 0