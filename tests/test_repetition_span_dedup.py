"""Gopher repetition metrics (functions/repetition.py) and cross-doc
duplicate-span coverage (operators/span_dedup.py) — hand-computed
coverage values, the n >= 5 regimes the sf-corpus can't exercise, and
the within-doc-vs-cross-doc separation contract.
"""

import pytest
from pyspark.sql import functions as F

from whoiswho_spark.functions.repetition import (
    dup_ngram_char_frac,
    gopher_repetition_stats,
    top_ngram_frac,
)
from whoiswho_spark.operators.span_dedup import crossdoc_duplicate_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _one(df, doc_id):
    return df.filter(F.col("doc_id") == doc_id).collect()[0]


def test_top_ngram_frac_hand_computed(spark):
    # "x y x y z": norm_len 9; mode 2-gram "x y" x2, chars 3 -> 6/9
    df = top_ngram_frac(_docs(spark, [(1, "x y x y z")]), 2)
    r = _one(df, 1)
    assert (r.top_ngram, r.occurrences) == ("x y", 2)
    assert r.frac == pytest.approx(6 / 9, abs=1e-6)


def test_top_ngram_tie_breaks_lexicographically(spark):
    # "b a b a": "b a" x2... make a true tie: "a b c a b c" has
    # "a b" x2, "b c" x2, "c a" x1 -> tie between "a b" and "b c",
    # lexicographic ascending picks "a b" on both engines.
    r = _one(top_ngram_frac(_docs(spark, [(1, "a b c a b c")]), 2), 1)
    assert r.top_ngram == "a b"


def test_top_ngram_weighted_can_exceed_one(spark):
    # "a a a a": 3 overlapping occurrences x 3 chars / 7 chars > 1 —
    # the documented occurrence-weighted (Dolma/NeMo) semantics.
    r = _one(top_ngram_frac(_docs(spark, [(1, "a a a a")]), 2), 1)
    assert r.frac == pytest.approx(9 / 7, abs=1e-6)


def test_top_ngram_short_doc_keeps_row(spark):
    df = top_ngram_frac(_docs(spark, [(1, "only"), (2, "")]), 2)
    assert df.count() == 2
    assert {r.frac for r in df.collect()} == {0.0}


def test_dup_ngram_coverage_hand_computed(spark):
    # "x y x y z": dup 2-gram "x y" at char [0,2] and [4,6] -> 6/9
    r = _one(dup_ngram_char_frac(_docs(spark, [(1, "x y x y z")]), 2), 1)
    assert r.dup_chars == 6
    assert r.frac == pytest.approx(6 / 9, abs=1e-6)


def test_dup_ngram_coverage_unions_overlaps(spark):
    # "a a a a": dup "a a" intervals [0,2],[2,4],[4,6] union to the
    # whole 7-char stream — coverage is capped at 1.0 by construction.
    r = _one(dup_ngram_char_frac(_docs(spark, [(1, "a a a a")]), 2), 1)
    assert r.dup_chars == 7
    assert r.frac == pytest.approx(1.0, abs=1e-6)


def test_dup_ngram_n5_gopher_regime(spark):
    # 11 tokens, the 5-gram "p q r s t" at positions 0 and 6:
    # chars [0,8] and [12,20] -> 18 of 21.
    r = _one(
        dup_ngram_char_frac(_docs(spark, [(1, "p q r s t u p q r s t")]), 5), 1
    )
    assert r.dup_chars == 18
    assert r.frac == pytest.approx(18 / 21, abs=1e-6)


def test_dup_ngram_no_duplicates_is_zero(spark):
    r = _one(dup_ngram_char_frac(_docs(spark, [(1, "a b c d e f")]), 3), 1)
    assert (r.dup_chars, r.frac) == (0, 0.0)


def test_gopher_stats_frame_shape(spark):
    df = gopher_repetition_stats(
        _docs(spark, [(1, "x y x y z"), (2, "a b c")]),
        top_ns=(2,),
        dup_ns=(2, 5),
    )
    assert set(df.columns) == {"doc_id", "top2gram_frac", "dup2gram_frac", "dup5gram_frac"}
    assert df.count() == 2
    r = _one(df, 1)
    assert r.top2gram_frac == pytest.approx(6 / 9, abs=1e-6)
    assert r.dup5gram_frac == 0.0


def test_fused_kernel_matches_catalyst_twins(spark):
    """The contract plan (one Arrow map pass) must equal the
    explode+window formulation value-for-value — incl. the mode
    tie-break, overlap unions and short-doc zero rows."""
    from whoiswho_spark.functions.repetition import gopher_repetition_stats_fused

    rows = [
        (1, "x y x y z"),
        (2, "a a a a"),
        (3, "p q r s t u p q r s t"),
        (4, "a b c a b c"),
        (5, "only"),
        (6, ""),
        (7, "a b c d e f g h i j"),
        (8, "m n m n m n m n o p q m n"),
    ]
    docs = _docs(spark, rows)
    kw = dict(top_ns=(2, 3), dup_ns=(2, 3, 5))
    fused = {r.doc_id: r for r in gopher_repetition_stats_fused(docs, **kw).collect()}
    ref = {r.doc_id: r for r in gopher_repetition_stats(docs, **kw).collect()}
    assert set(fused) == set(ref)
    for k in fused:
        assert fused[k].asDict() == ref[k].asDict(), (k, fused[k], ref[k])


def test_fused_kernel_matches_on_sf_corpus(spark):
    from whoiswho_spark.functions.repetition import gopher_repetition_stats_fused

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kw = dict(top_ns=(2,), dup_ns=(2,))
    a = gopher_repetition_stats_fused(docs, **kw)
    b = gopher_repetition_stats(docs, **kw)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_repetition_rejects_bad_n(spark):
    with pytest.raises(ValueError, match="n must be"):
        top_ngram_frac(_docs(spark, [(1, "a b")]), 0).collect()


SHARED = "w1 w2 w3 w4 w5 w6 w7 w8"


def test_crossdoc_span_coverage_and_flag(spark):
    docs = _docs(
        spark,
        [
            (1, SHARED + " tail1"),          # 9 toks, span at pos 0..7
            (2, "head " + SHARED),           # 9 toks, span at pos 1..8
            (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),  # unrelated
        ],
    )
    out = {r.doc_id: r for r in crossdoc_duplicate_spans(docs, n=8).collect()}
    assert out[1].dup_tokens == 8 and out[1].is_dup == 1
    assert out[1].dup_token_frac == pytest.approx(8 / 9, abs=1e-6)
    assert out[2].dup_tokens == 8 and out[2].is_dup == 1
    assert out[3].dup_tokens == 0 and out[3].is_dup == 0


def test_crossdoc_ignores_within_doc_repetition(spark):
    # The same 8-gram twice in ONE doc only: count(distinct doc) == 1,
    # so nothing flags — within-doc repetition is repetition.py's job.
    docs = _docs(
        spark,
        [
            (1, "v1 v2 v3 v4 v5 v6 v7 v8 v1 v2 v3 v4 v5 v6 v7 v8"),
            (2, "z1 z2 z3 z4 z5 z6 z7 z8 z9"),
        ],
    )
    out = {r.doc_id: r for r in crossdoc_duplicate_spans(docs, n=8).collect()}
    assert out[1].dup_tokens == 0 and out[1].is_dup == 0


def test_crossdoc_short_docs_and_guards(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "a b c")])  # < n tokens
    out = {r.doc_id: r for r in crossdoc_duplicate_spans(docs, n=8).collect()}
    assert out[1].dup_tokens == 0 and out[2].dup_tokens == 0
    with pytest.raises(ValueError, match="min_docs"):
        crossdoc_duplicate_spans(docs, n=2, min_docs=1)
    with pytest.raises(ValueError, match="n must be"):
        crossdoc_duplicate_spans(docs, n=0)


def test_crossdoc_full_duplicate_hits_one(spark):
    docs = _docs(spark, [(1, SHARED + " x9 x10"), (2, SHARED + " x9 x10")])
    out = {r.doc_id: r for r in crossdoc_duplicate_spans(docs, n=8).collect()}
    assert out[1].dup_token_frac == 1.0 and out[1].is_dup == 1
    assert out[2].dup_token_frac == 1.0 and out[2].is_dup == 1


def test_remove_spans_keeps_owner_strips_others(spark):
    from whoiswho_spark.operators.span_dedup_remove import remove_duplicated_spans

    docs = _docs(
        spark,
        [
            (1, SHARED + " tail1"),
            (2, "head " + SHARED),
            (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),
            (4, SHARED + " tail1"),  # exact dup of 1
        ],
    )
    out = {r.doc_id: r for r in remove_duplicated_spans(docs, n=8).collect()}
    # doc 1 owns every shared gram (smallest id) — untouched
    assert out[1].clean_text == SHARED + " tail1" and out[1].removed_tokens == 0
    # doc 2 loses the 8 shared tokens, keeps its own prefix
    assert out[2].clean_text == "head" and out[2].removed_tokens == 8
    # unrelated doc untouched
    assert out[3].removed_tokens == 0 and out[3].kept_tokens == 9
    # exact dup of doc 1: every gram owned by doc 1 -> emptied
    assert out[4].clean_text == "" and out[4].kept_tokens == 0


def test_remove_spans_overlapping_windows_union(spark):
    from whoiswho_spark.operators.span_dedup_remove import remove_duplicated_spans

    # doc 2 contains the shared 8-gram at two OVERLAPPING alignments
    # (positions 1..8 and 2..9 both shared with doc 1 via w2..w8 w1? no:
    # construct two shared 8-grams overlapping by 7 tokens)
    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9"  # grams: w1..w8 (pos0), w2..w9 (pos1)
    docs = _docs(spark, [(1, a), (2, "pre " + a + " post")])
    out = {r.doc_id: r for r in remove_duplicated_spans(docs, n=8).collect()}
    assert out[1].removed_tokens == 0
    # doc 2 loses the union of [1,8] and [2,9] = 9 tokens
    assert out[2].removed_tokens == 9
    assert out[2].clean_text == "pre post"


def test_remove_spans_removal_consistent_with_detector(spark):
    """For every doc, removed_tokens <= dup_tokens (owners keep spans),
    and a doc that owns nothing removes exactly its dup coverage."""
    from whoiswho_spark.operators.span_dedup_remove import remove_duplicated_spans

    docs = _docs(
        spark,
        [
            (1, SHARED + " a1 a2"),
            (2, SHARED + " b1 b2"),
            (3, "c0 " + SHARED + " c1"),
        ],
    )
    det = {r.doc_id: r for r in crossdoc_duplicate_spans(docs, n=8).collect()}
    rem = {r.doc_id: r for r in remove_duplicated_spans(docs, n=8).collect()}
    for k in det:
        assert rem[k].removed_tokens <= det[k].dup_tokens
    assert rem[1].removed_tokens == 0  # owner
    assert rem[2].removed_tokens == det[2].dup_tokens == 8
    assert rem[3].removed_tokens == det[3].dup_tokens == 8


def test_remove_spans_then_detector_finds_nothing_on_exact_dups(spark):
    """After removal, exact-duplicate docs no longer share any 8-gram
    (the owner keeps the only surviving copy), so a second detector
    pass over the cleaned corpus reports zero coverage."""
    from whoiswho_spark.operators.span_dedup_remove import remove_duplicated_spans

    docs = _docs(
        spark,
        [(1, SHARED + " x9"), (2, SHARED + " x9"), (3, SHARED + " x9")],
    )
    cleaned = remove_duplicated_spans(docs, n=8).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    again = crossdoc_duplicate_spans(cleaned, n=8)
    assert again.agg(F.sum("dup_tokens")).collect()[0][0] == 0


def test_remove_spans_guards(spark):
    import pytest as _pt

    from whoiswho_spark.operators.span_dedup_remove import remove_duplicated_spans

    docs = _docs(spark, [(1, "a b")])
    with _pt.raises(ValueError, match="min_docs"):
        remove_duplicated_spans(docs, n=2, min_docs=1)
    with _pt.raises(ValueError, match="n must be"):
        remove_duplicated_spans(docs, n=0)
