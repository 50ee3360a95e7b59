"""Corpus quality filtering — the composed KEEP/DROP decision a
training-data pipeline executes after computing its per-document
signals (the Gopher/C4/CCNet pattern: independent rule gates, a
document survives only if it passes all of them).

Composes the repo's own signal operators, each already
oracle/parity-gated on its own:

- language gate      — ``textstats.lang_id_col`` != 'und'
- quality gate       — ``textstats.quality_score_col`` >= min_quality
- repetition gate    — fused Gopher metrics (``repetition``): the
                       top-2-gram character fraction and duplicated-
                       2-gram coverage under their thresholds
- cross-doc dup gate — ``span_dedup.crossdoc_duplicate_spans`` flag

Output keeps every per-gate verdict (flag_* = 1 means FAILED that
gate) so downstream consumers can audit WHY a document was dropped —
the lineage practice every stage of this repo follows.  ``keep`` is 1
iff every flag is 0.

Plan shape: the language/quality gates are pure Catalyst columns; the
repetition gate is the one-pass Arrow kernel; the span gate is the
hash-meet plan — joined back on the doc id.  Nothing here adds a
shuffle beyond what the component operators already do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whoiswho_spark.functions.repetition import gopher_repetition_stats_fused
from whoiswho_spark.functions.textstats import lang_id_col, quality_score_col
from whoiswho_spark.operators.span_dedup import crossdoc_duplicate_spans


def quality_filter_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    max_top2gram_frac: float = 0.25,
    max_dup2gram_frac: float = 0.35,
    span_n: int = 8,
    span_flag_threshold: float = 0.5,
    lang_threshold: float = 0.08,
) -> DataFrame:
    """Per-document gate verdicts + the composed keep decision.

    Returns (id, flag_lang, flag_quality, flag_repetition, flag_dup,
    keep), one row per input document, every column int 0/1.
    """
    base = docs.select(
        F.col(id_col),
        F.when(lang_id_col(F.col(text_col), threshold=lang_threshold) == "und", 1)
        .otherwise(0)
        .cast("int")
        .alias("flag_lang"),
        F.when(quality_score_col(F.col(text_col)) < F.lit(float(min_quality)), 1)
        .otherwise(0)
        .cast("int")
        .alias("flag_quality"),
    )
    rep = gopher_repetition_stats_fused(
        docs, id_col=id_col, text_col=text_col, top_ns=(2,), dup_ns=(2,)
    ).select(
        id_col,
        F.when(
            (F.col("top2gram_frac") > F.lit(float(max_top2gram_frac)))
            | (F.col("dup2gram_frac") > F.lit(float(max_dup2gram_frac))),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("flag_repetition"),
    )
    dup = crossdoc_duplicate_spans(
        docs,
        n=span_n,
        flag_threshold=span_flag_threshold,
        id_col=id_col,
        text_col=text_col,
    ).select(id_col, F.col("is_dup").cast("int").alias("flag_dup"))
    out = base.join(rep, id_col).join(dup, id_col)
    return out.select(
        id_col,
        "flag_lang",
        "flag_quality",
        "flag_repetition",
        "flag_dup",
        F.when(
            (F.col("flag_lang") == 0)
            & (F.col("flag_quality") == 0)
            & (F.col("flag_repetition") == 0)
            & (F.col("flag_dup") == 0),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("keep"),
    )


def filter_documents(docs: DataFrame, id_col: str = "doc_id", **kw) -> DataFrame:
    """The corpus-cleaning action: input rows that pass every gate,
    original columns intact (semi-join on the keep set — the doc id is
    the only thing the decision subtree sends back)."""
    keep = quality_filter_flags(docs, id_col=id_col, **kw).filter(
        F.col("keep") == 1
    )
    return docs.join(keep.select(id_col), id_col, "semi")
