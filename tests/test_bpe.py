"""Distributed BPE training/encoding (operators/bpe.py): exact
merge-sequence parity vs the pure-Python reference trainer (the gate
for the data-dependent iteration that no static SQL oracle can
replay), encode properties, and the reference twin's own hand golden.
"""

import pytest
from pyspark.sql import functions as F

from whoiswho_spark.operators.bpe import (
    END,
    bpe_encode_tokens,
    bpe_merges_df,
    fit_bpe,
    ref_bpe_encode,
    ref_fit_bpe,
    word_count_table,
)

CORPUS = [
    (1, "low lower lowest low low"),
    (2, "new newer newest new"),
    (3, "low newer wider wide"),
]


def _docs(spark, rows=None):
    return spark.createDataFrame(rows or CORPUS, "doc_id bigint, text string")


def test_ref_trainer_hand_golden():
    # Sennrich's canonical example family: 'lo' forms first (count 5 via
    # low x5... in doc set: low appears 5 times, lower 1, lowest 1 -> 'l","o' = 7)
    wc = {"low": 5, "lower": 1, "lowest": 1}
    merges = ref_fit_bpe(wc, 3)
    assert merges[0][1:] == ("l", "o")
    assert merges[1][1:] == ("lo", "w")
    # ties break lexicographically: after 'low', pairs ('low','</w>') n=5 wins
    assert merges[2][1:] == ("low", END)


def test_spark_trainer_matches_reference_exactly(spark):
    docs = _docs(spark)
    wc = {r.word: r["count"] for r in word_count_table(docs).collect()}
    assert fit_bpe(docs, num_merges=15) == ref_fit_bpe(wc, 15)


def test_spark_trainer_partitioning_invariant(spark):
    docs = _docs(spark).repartition(7)
    wc = {r.word: r["count"] for r in word_count_table(docs).collect()}
    assert fit_bpe(docs, num_merges=8) == ref_fit_bpe(wc, 8)


def test_trainer_early_stop_on_singletons(spark):
    # every word unique, every pair count 1 -> no merge generalizes
    docs = _docs(spark, [(1, "ab cd ef")])
    assert fit_bpe(docs, num_merges=10) == []
    # ...through the distributed loop too (local finish would mask it)
    assert fit_bpe(docs, num_merges=10, local_vocab_threshold=0) == []


def test_trainer_distributed_loop_matches_local_finish(spark):
    """Round 6: small word tables finish locally via ref_fit_bpe (the
    CC local_finish_threshold pattern). The DISTRIBUTED loop must stay
    merge-for-merge identical — forced with local_vocab_threshold=0 —
    or the hybrid would silently fork the trainer semantics."""
    docs = _docs(spark).repartition(5)
    local = fit_bpe(docs, num_merges=12)
    dist = fit_bpe(docs, num_merges=12, local_vocab_threshold=0)
    assert dist == local
    # threshold just below the vocab size also forces the distributed path
    n_words = word_count_table(docs).count()
    assert (
        fit_bpe(docs, num_merges=12, local_vocab_threshold=n_words - 1) == local
    )


def test_trainer_sf_corpus_parity(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wc = {r.word: r["count"] for r in word_count_table(docs).collect()}
    assert fit_bpe(docs, num_merges=10) == ref_fit_bpe(wc, 10)


def test_encode_reproduces_trained_segmentation(spark):
    docs = _docs(spark)
    merges = fit_bpe(docs, num_merges=20)
    ranks = {(a, b): r for r, a, b in merges}
    # standard BPE property: a trained word encodes to its final symbols
    wc = {r.word: r["count"] for r in word_count_table(docs).collect()}
    vocab = {w: list(w) + [END] for w in wc}
    for _r, a, b in merges:
        from whoiswho_spark.operators.bpe import _merge_once

        vocab = {w: _merge_once(s, a, b) for w, s in vocab.items()}
    for w, syms in vocab.items():
        assert ref_bpe_encode(w, ranks) == syms, w
    enc = {r.doc_id: r for r in bpe_encode_tokens(docs, merges).collect()}
    assert enc[1].n_pieces <= sum(len(w) + 1 for w in "low lower lowest low low".split())
    joined = "".join(enc[3].pieces).replace(END, " ").strip()
    assert joined == "low newer wider wide"


def test_merges_df_shape_and_guard(spark):
    docs = _docs(spark)
    df = bpe_merges_df(docs, num_merges=5)
    rows = df.orderBy("rank").collect()
    assert [r.rank for r in rows] == list(range(len(rows)))
    assert all(r.merged == r.a + r.b for r in rows)
    with pytest.raises(ValueError, match="num_merges"):
        fit_bpe(docs, num_merges=-1)


def test_encode_unseen_word_falls_back_to_chars(spark):
    docs = _docs(spark)
    merges = fit_bpe(docs, num_merges=5)
    out = bpe_encode_tokens(
        _docs(spark, [(9, "zzz")]), merges
    ).collect()[0]
    assert out.pieces[-1] == END or out.pieces[-1].endswith(END)
    assert "".join(out.pieces).replace(END, "") == "zzz"