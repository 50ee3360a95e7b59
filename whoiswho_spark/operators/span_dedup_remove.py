"""Duplicate-span REMOVAL — the action half of cross-document span
dedup (operators/span_dedup.py computes the coverage stats; this module
rewrites the corpus, the operation Lee et al. 2022 actually apply:
delete every duplicated span but keep one canonical occurrence).

Ownership rule: every duplicated n-gram keeps its occurrence(s) in the
single document with the SMALLEST id among the documents sharing it
(deterministic, engine-portable, join-free to decide — the min is a
by-product of the same distinct-doc aggregation the detector already
runs).  In every other document, the tokens covered by that n-gram's
occurrences are dropped; a document's surviving text is its remaining
tokens re-joined by single spaces, preserving order.

Plan shape (the 100 TB posture is the detector's): one shuffle on the
64-bit gram hash for the (distinct-doc count, min-doc) aggregation, an
AQE-broadcastable join back of the duplicated hashes, one per-document
interval-union pass, then a positions anti-filter done with an ordered
collect per document (bounded by document length — the same bound the
detector's sweep window already assumes).  Text crosses no Exchange:
the surviving tokens are re-derived from the original text column in
the final map-side projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from whoiswho_spark.functions.repetition import _ngram_array
from whoiswho_spark.functions.textstats import ws_tokens_col
from whoiswho_spark.session import spread_small_input


def remove_duplicated_spans(
    docs: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rewrite the corpus with cross-document duplicated spans removed.

    Output: one row per input document —
    (id, n_tokens, kept_tokens, removed_tokens, clean_text) where
    ``clean_text`` is the surviving tokens joined by single spaces
    (empty string when the whole document was a duplicate).  Documents
    owning a span (smallest id among its sharers) keep it; the others
    lose exactly the union of the covering windows.
    """
    if n < 1:
        raise ValueError("span ngram n must be >= 1")
    if min_docs < 2:
        raise ValueError("min_docs < 2 would remove within-document repetition")
    docs = spread_small_input(docs.select(id_col, text_col))
    arr = ws_tokens_col(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("_id"),
        arr.alias("_toks"),
        # single-param lambda: xxhash64 is variadic and transform()
        # binds (element, index) to 2-arg callables
        F.transform(_ngram_array(arr, n), lambda g: F.xxhash64(g)).alias("_ghs"),
    )
    grams = base.select("_id", F.posexplode("_ghs").alias("_pos", "_gh"))
    counts = grams.groupBy("_gh").agg(
        F.countDistinct("_id").alias("_ndocs"), F.min("_id").alias("_owner")
    )
    # occurrences of shared grams in every NON-owner document
    doomed = (
        grams.join(
            counts.filter(F.col("_ndocs") >= min_docs).select("_gh", "_owner"),
            "_gh",
            "inner",
        )
        .filter(F.col("_id") != F.col("_owner"))
        .select("_id", F.col("_pos").alias("_start"), (F.col("_pos") + n - 1).alias("_end"))
    )
    # per-doc union of covered token positions, as merged intervals
    ws = Window.partitionBy("_id").orderBy("_start", "_end")
    prev_max = F.max("_end").over(ws.rowsBetween(Window.unboundedPreceding, -1))
    merged = (
        doomed.withColumn("_pm", F.coalesce(prev_max, F.lit(-1)))
        .withColumn(
            "_s", F.greatest(F.col("_start"), F.col("_pm") + 1)
        )
        .filter(F.col("_end") > F.col("_pm"))
        .groupBy("_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_s"), F.col("_end")))
            ).alias("_cuts")
        )
    )
    # two-param lambda ON PURPOSE: this is the documented (element,
    # index) binary form of F.filter — the position IS the predicate
    kept = F.filter(
        F.col("_toks"),
        lambda _t, _i: ~F.exists(
            F.col("_cuts"), lambda c: (c["_s"] <= _i) & (_i <= c["_end"])
        ),
    )
    out = (
        base.select("_id", "_toks")
        .join(merged, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.size("_toks").cast("bigint").alias("n_tokens"),
            F.when(F.col("_cuts").isNull(), F.col("_toks"))
            .otherwise(kept)
            .alias("_kept"),
        )
    )
    return out.select(
        id_col,
        "n_tokens",
        F.size("_kept").cast("bigint").alias("kept_tokens"),
        (F.col("n_tokens") - F.size("_kept")).cast("bigint").alias("removed_tokens"),
        F.concat_ws(" ", F.col("_kept")).alias("clean_text"),
    )
