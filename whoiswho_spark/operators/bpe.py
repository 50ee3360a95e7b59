"""Distributed BPE training and encoding (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") — the
tokenizer-training operator of a training-data pipeline.

The classic trick makes this distributable: BPE statistics live on the
WORD-FREQUENCY table, not the corpus. One corpus-wide shuffle builds
``(word, count)``; every merge iteration then runs on that (much
smaller) vocabulary table:

1. explode adjacent symbol pairs per word, weighted by word count;
   aggregate pair totals (partial aggregation map-side);
2. pick the best pair — max total, ties broken lexicographically
   (``(a, b)`` ascending) so training is deterministic on any
   partitioning; one driver-side scalar per iteration (the CC-fixpoint
   pattern);
3. rewrite ONLY the words that contain the pair adjacently (a
   Catalyst ``exists`` prefilter; the rewrite itself is an
   Arrow-batched left-to-right non-overlapping merge — 'aaa' under
   ('a','a') becomes ['aa','a']);
4. localCheckpoint the vocabulary periodically to truncate the
   iteration lineage (the walks/CC discipline).

Word symbols start as characters plus a trailing ``</w>`` end-of-word
symbol (the paper's convention, kept as a SEPARATE symbol).  Training
stops early when the best pair occurs only once (merging it cannot
generalize).

``ref_fit_bpe`` / ``ref_bpe_encode`` are the driver-side pure-Python
twins (the ``ref_norm_text`` pattern): the Spark trainer must produce
the exact same merge sequence — pytest-gated since the data-dependent
iteration is not expressible as a static SQL oracle (the per-iteration
pair-count core IS oracle-checked via the ``bpe_pair_counts`` query).

At 100 TB: the corpus is touched once (word count); iterations scan
only the vocabulary (distinct words), rewrite only matching rows, and
ship one row to the driver per merge.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from whoiswho_spark.functions.textstats import ws_tokens_col

END = "</w>"


# --- pure-Python twins ---------------------------------------------------------


def _merge_once(syms: list, a: str, b: str) -> list:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def ref_fit_bpe(word_counts: dict, num_merges: int) -> list:
    """Reference trainer over a {word: count} dict. Returns
    [(rank, a, b)] with the exact tie-breaks the Spark trainer uses."""
    vocab = {w: list(w) + [END] for w in word_counts}
    merges = []
    for rank in range(num_merges):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < 2:
            break
        merges.append((rank, a, b))
        vocab = {w: _merge_once(s, a, b) for w, s in vocab.items()}
    return merges


def ref_bpe_encode(word: str, ranks: dict) -> list:
    """Encode one word with a trained {(a, b): rank} table: repeatedly
    merge the lowest-ranked adjacent pair (ties impossible — ranks are
    unique). Standard property: a word seen in training reproduces its
    trained segmentation."""
    syms = list(word) + [END]
    while len(syms) > 1:
        cands = [
            (ranks[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not cands:
            break
        _r, i = min(cands)
        syms = _merge_once(syms, syms[i], syms[i + 1])
    return syms


# --- distributed trainer -------------------------------------------------------


@pandas_udf(ArrayType(StringType()))
def _merge_udf(syms: pd.Series, a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [_merge_once(list(s), x, y) for s, x, y in zip(syms, a, b)]
    )


def word_count_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, count) over the whitespace-token stream — the one
    corpus-wide shuffle BPE training needs."""
    return (
        docs.select(F.explode(ws_tokens_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("count"))
    )


def _adjacent_pairs(syms_col, count_col):
    pair = F.transform(
        F.sequence(F.lit(1), F.size(syms_col) - 1),
        lambda i: F.struct(
            F.element_at(syms_col, i).alias("a"),
            F.element_at(syms_col, i + 1).alias("b"),
        ),
    )
    return F.explode(F.when(F.size(syms_col) >= 2, pair)).alias("_pair"), count_col


def fit_bpe(
    docs: DataFrame,
    num_merges: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_every: int = 5,
    local_vocab_threshold: int = 100_000,
) -> list:
    """Train BPE merges on a corpus. Returns [(rank, a, b)] —
    deterministic for any partitioning (tie-break (count desc, a asc,
    b asc), matching ``ref_fit_bpe`` exactly).

    HYBRID local finish (round 6, the CC ``local_finish_threshold``
    pattern): when the distinct-word table fits comfortably in driver
    memory (≤ ``local_vocab_threshold`` rows; probed with a bounded
    ``take``), the merge loop runs as ``ref_fit_bpe`` over the collected
    counts — the trainer the distributed loop is pytest-pinned to match
    merge-for-merge — instead of one Spark job (plus Arrow worker spawn
    for the rewrite lineage) per merge. Measured at sf0.1 (31-word
    vocabulary, 30 merges): 20.1 s of per-iteration scheduling latency →
    0.6 s, identical merge sequence. A real corpus' word table (billions
    of distinct words) exceeds the bound and keeps the distributed
    iteration; ``local_vocab_threshold=0`` forces it (the parity test
    does)."""
    if num_merges < 0:
        raise ValueError("num_merges must be >= 0")
    wc = word_count_table(docs, id_col, text_col)
    if local_vocab_threshold > 0:
        head = wc.take(local_vocab_threshold + 1)
        if len(head) <= local_vocab_threshold:
            return ref_fit_bpe(
                {r["word"]: r["count"] for r in head}, num_merges
            )
    vocab = wc.select(
        "count",
        F.concat(
            F.split(F.col("word"), "").cast("array<string>"),
            F.array(F.lit(END)),
        ).alias("syms"),
    )
    vocab = vocab.localCheckpoint()
    merges: list = []
    for rank in range(num_merges):
        pair_col, cnt = _adjacent_pairs(F.col("syms"), F.col("count"))
        best = (
            vocab.select(pair_col, cnt)
            .groupBy("_pair")
            .agg(F.sum("count").alias("n"))
            .orderBy(F.desc("n"), F.asc("_pair.a"), F.asc("_pair.b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < 2:
            break
        a, b = best[0]["_pair"]["a"], best[0]["_pair"]["b"]
        merges.append((rank, a, b))
        has_pair = F.exists(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: (F.element_at("syms", i) == F.lit(a))
            & (F.element_at("syms", i + 1) == F.lit(b)),
        )
        hit = F.size("syms") >= 2
        vocab = vocab.withColumn(
            "syms",
            F.when(
                hit & has_pair, _merge_udf("syms", F.lit(a), F.lit(b))
            ).otherwise(F.col("syms")),
        )
        if (rank + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()
    return merges


def bpe_merges_df(docs: DataFrame, num_merges: int = 50, **kw) -> DataFrame:
    """fit_bpe as a DataFrame (rank, a, b, merged) — the artifact a
    pipeline persists beside its corpus."""
    spark = docs.sparkSession
    merges = fit_bpe(docs, num_merges=num_merges, **kw)
    return spark.createDataFrame(
        [(r, a, b, a + b) for r, a, b in merges],
        "rank int, a string, b string, merged string",
    )


def bpe_encode_tokens(
    docs: DataFrame,
    merges: list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained merge list to a corpus: (id, n_words, n_pieces,
    pieces array). Arrow-batched; the ranks table is a broadcast-sized
    Python dict (exactly what real tokenizers ship)."""
    ranks = {(a, b): r for r, a, b in merges}

    @pandas_udf(ArrayType(StringType()))
    def _encode(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            pieces: list = []
            for w in (t or "").split(" "):
                if w:
                    pieces.extend(ref_bpe_encode(w, ranks))
            out.append(pieces)
        return pd.Series(out)

    return docs.select(
        F.col(id_col),
        F.size(ws_tokens_col(F.col(text_col))).cast("bigint").alias("n_words"),
        _encode(F.col(text_col)).alias("pieces"),
    ).withColumn("n_pieces", F.size("pieces").cast("bigint"))
