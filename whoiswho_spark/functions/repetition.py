"""Gopher-style within-document repetition metrics (Rae et al. 2021,
"Scaling Language Models: ... Gopher", Appendix A1.1 repetition
removal) — the standard quality filters a web-scale training-data
pipeline applies before dedup:

- ``top_ngram_frac``: fraction of (normalized) characters contained in
  the single most frequent token n-gram (Gopher applies this for
  n = 2..4).  Following the public implementations (Dolma, NeMo
  Curator), the fraction is occurrences x n-gram-chars / total chars —
  self-overlap of the mode n-gram is not union-ed.
- ``dup_ngram_char_frac``: fraction of characters covered by token
  n-grams that occur MORE THAN ONCE in the document (Gopher applies
  this for n = 5..10).  This one is the exact character-coverage
  definition: overlapping duplicate occurrences are union-ed with an
  interval sweep, so each character counts at most once.

Both metrics are defined over the normalized token stream (whitespace
tokens, empties dropped, single-space joined) so they are reproducible
regardless of the source document's raw spacing; the denominator is
the normalized character length sum(len(tok)) + (n_toks - 1).

Everything is pure Catalyst: one explode per metric family, ordered
window functions (lead / running sum / running max) for n-gram keys,
character offsets and the coverage sweep — no Python workers, no
driver state.  Per-doc window frames are bounded by document length,
so the plan scales with executors: the only shuffle is the hash
partition on the document id, exactly once per metric call.

The reference repo has no corpus-quality stage (this module is part of
the training-data-pipeline mandate, not SURVEY parity); the metric
definitions follow the published Gopher rules.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from whoiswho_spark.functions.textstats import ws_tokens_col


def _norm_len_col(arr: Column) -> Column:
    """Characters in the single-space-joined token stream (0 when empty)."""
    return F.when(
        F.size(arr) > 0,
        F.aggregate(arr, F.lit(0), lambda acc, tok: acc + F.length(tok) + 1) - 1,
    ).otherwise(F.lit(0))


def _ngram_array(arr: Column, n: int) -> Column:
    """Array of space-joined token n-grams (empty when < n tokens)."""
    if n < 1:
        raise ValueError("ngram n must be >= 1")
    return F.when(
        F.size(arr) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(arr, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def top_ngram_frac(
    docs: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document most-frequent-n-gram character fraction.

    Returns (id, top_ngram, occurrences, frac); documents with fewer
    than ``n`` tokens keep frac = 0.0 with top_ngram = '' so the output
    has exactly one row per input document.  Ties break by n-gram text
    ascending (deterministic across engines and partitionings).
    """
    arr = ws_tokens_col(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("_id"),
        _ngram_array(arr, n).alias("_grams"),
        _norm_len_col(arr).alias("_norm_len"),
    )
    counts = (
        base.select("_id", F.explode("_grams").alias("_gram"))
        .groupBy("_id", "_gram")
        .agg(F.count("*").cast("bigint").alias("occurrences"))
    )
    w = Window.partitionBy("_id").orderBy(F.desc("occurrences"), F.asc("_gram"))
    top = counts.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") == 1)
    return (
        base.select("_id", "_norm_len")
        .join(top, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("_gram"), F.lit("")).alias("top_ngram"),
            F.coalesce(F.col("occurrences"), F.lit(0)).cast("bigint").alias("occurrences"),
            F.round(
                F.when(
                    F.col("_norm_len") > 0,
                    F.coalesce(
                        F.col("occurrences") * F.length("_gram"), F.lit(0)
                    ).cast("double")
                    / F.col("_norm_len").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("frac"),
        )
    )


def dup_ngram_char_frac(
    docs: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document duplicated-n-gram character coverage (exact).

    A character of the normalized token stream is "covered" when it
    lies inside at least one occurrence of an n-gram that occurs more
    than once in the document; coverage is the union over all such
    occurrences (interval sweep: running max of interval ends), so the
    fraction is always in [0, 1].  Returns (id, dup_chars, frac) with
    one row per input document (0.0 when nothing is duplicated or the
    document has fewer than ``n`` tokens).
    """
    if n < 1:
        raise ValueError("ngram n must be >= 1")
    arr = ws_tokens_col(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("_id"),
        arr.alias("_toks"),
        _norm_len_col(arr).alias("_norm_len"),
    )
    toks = base.select(
        "_id", "_norm_len", F.posexplode("_toks").alias("_pos", "_tok")
    )
    w = Window.partitionBy("_id").orderBy("_pos")
    cum = F.sum(F.length("_tok") + 1).over(w)  # end-of-token + 2 (0-based)
    leads = [F.col("_tok")] + [F.lead("_tok", k).over(w) for k in range(1, n)]
    gram = F.when(
        F.lead("_tok", n - 1).over(w).isNotNull() if n > 1 else F.lit(True),
        F.concat_ws(" ", *leads),
    )
    occ = toks.select(
        "_id",
        "_norm_len",
        gram.alias("_gram"),
        (cum - F.length("_tok") - 1).alias("_start"),  # 0-based char start
        ((F.lead(cum, n - 1).over(w) if n > 1 else cum) - 2).alias("_end"),
    ).filter(F.col("_gram").isNotNull())
    wg = Window.partitionBy("_id", "_gram")
    dup = occ.withColumn("_cnt", F.count("*").over(wg)).filter(F.col("_cnt") > 1)
    ws = Window.partitionBy("_id").orderBy("_start", "_end")
    prev_max = F.max("_end").over(ws.rowsBetween(Window.unboundedPreceding, -1))
    contrib = F.greatest(
        F.lit(0),
        F.col("_end")
        - F.greatest(F.col("_start") - 1, F.coalesce(prev_max, F.lit(-1))),
    )
    cov = (
        dup.withColumn("_contrib", contrib)
        .groupBy("_id")
        .agg(F.sum("_contrib").cast("bigint").alias("dup_chars"))
    )
    return (
        base.select("_id", "_norm_len")
        .join(cov, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("dup_chars"), F.lit(0)).cast("bigint").alias("dup_chars"),
            F.round(
                F.when(
                    F.col("_norm_len") > 0,
                    F.coalesce(F.col("dup_chars"), F.lit(0)).cast("double")
                    / F.col("_norm_len").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("frac"),
        )
    )


def gopher_repetition_stats_fused(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """All Gopher repetition metrics in ONE Arrow-batched map pass —
    the contract plan.

    Every metric is per-document, so the explode+window formulation
    (`top_ngram_frac` / `dup_ngram_char_frac`, kept as the
    oracle-shaped reference twins) pays one token explode plus three
    corpus-wide sorts PER metric for work that never crosses a
    document boundary.  This kernel computes every requested n in one
    ``mapInPandas`` over the raw docs: zero shuffles, zero joins,
    per-task memory = one document's token list — the plan that stays
    linear at 100 TB.  The kernel emits INTEGER numerators
    (counts/char-coverages) and the final fractions are derived in
    Catalyst with the same round(·, 6) the SQL oracle uses, so
    engine-portable rounding is preserved.  Output schema and values
    are identical to ``gopher_repetition_stats`` (parity-tested).
    """
    from collections import Counter

    for n in (*top_ns, *dup_ns):
        if n < 1:
            raise ValueError("ngram n must be >= 1")
    top_ns = tuple(top_ns)
    dup_ns = tuple(dup_ns)
    int_cols = (
        ["norm_len"]
        + [f"_top{n}_{k}" for n in top_ns for k in ("cnt", "len")]
        + [f"_dup{n}_chars" for n in dup_ns]
    )
    schema = f"{id_col} bigint, " + ", ".join(f"{c} bigint" for c in int_cols)

    def kernel(batches):
        import pandas as pd  # noqa: F811 — worker-side import

        def one(text: str) -> list:
            toks = [t for t in (text or "").split(" ") if t]
            nt = len(toks)
            norm_len = sum(map(len, toks)) + nt - 1 if nt else 0
            starts = [0] * nt
            for i in range(1, nt):
                starts[i] = starts[i - 1] + len(toks[i - 1]) + 1
            row = [norm_len]
            for n in top_ns:
                grams = [" ".join(toks[i : i + n]) for i in range(nt - n + 1)]
                if grams:
                    c = Counter(grams)
                    mx = max(c.values())
                    best = min(g for g, k in c.items() if k == mx)
                    row += [mx, len(best)]
                else:
                    row += [0, 0]
            for n in dup_ns:
                grams = [" ".join(toks[i : i + n]) for i in range(nt - n + 1)]
                c = Counter(grams)
                covered, prev_end = 0, -1
                for i, g in enumerate(grams):
                    if c[g] < 2:
                        continue
                    s, e = starts[i], starts[i + n - 1] + len(toks[i + n - 1]) - 1
                    if e > prev_end:
                        covered += e - max(s - 1, prev_end)
                        prev_end = e
                row.append(covered)
            return row

        for pdf in batches:
            rows = [one(t) for t in pdf[text_col]]
            out = {id_col: pdf[id_col].astype("int64")}
            for j, c in enumerate(int_cols):
                out[c] = pd.array([r[j] for r in rows], dtype="int64")
            yield pd.DataFrame(out)

    from whoiswho_spark.session import spread_small_input

    ints = spread_small_input(docs.select(id_col, text_col)).mapInPandas(
        kernel, schema=schema
    )

    def _frac(num):
        return F.round(
            F.when(
                F.col("norm_len") > 0,
                num.cast("double") / F.col("norm_len").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        )

    sel = [F.col(id_col)]
    for n in top_ns:
        sel.append(
            _frac(F.col(f"_top{n}_cnt") * F.col(f"_top{n}_len")).alias(
                f"top{n}gram_frac"
            )
        )
    for n in dup_ns:
        sel.append(_frac(F.col(f"_dup{n}_chars")).alias(f"dup{n}gram_frac"))
    return ints.select(*sel)


def gopher_repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """All Gopher repetition metrics in one frame: one column
    ``top{n}gram_frac`` per ``top_ns`` and ``dup{n}gram_frac`` per
    ``dup_ns``, one row per document.  Each metric is an independent
    explode+window pass joined back on the id (the joins are co-
    partitioned on the id hash, so AQE coalesces them without extra
    exchanges in practice)."""
    out = docs.select(F.col(id_col).alias(id_col))
    for n in top_ns:
        t = top_ngram_frac(docs, n, id_col, text_col).select(
            id_col, F.col("frac").alias(f"top{n}gram_frac")
        )
        out = out.join(t, id_col, "left")
    for n in dup_ns:
        d = dup_ngram_char_frac(docs, n, id_col, text_col).select(
            id_col, F.col("frac").alias(f"dup{n}gram_frac")
        )
        out = out.join(d, id_col, "left")
    return out
