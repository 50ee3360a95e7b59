"""Pairwise scoring stage — WhoIsWho-style similarity features per
candidate pair, computed columnar.

The reference scores a pair as a weighted sum of field similarities
(/root/reference/whoiswho/training/AutoTrainSND.py:141-160):
    score = w_author·|coauthors∩| + w_venue·tanimoto(venue)
          + w_org·tanimoto(org)  + w_title·|title words∩|
with weights 1.5/1.0/1.0/0.33 (AutoTrainSND.py:50-52) and attach
threshold 1.5. Retargeted to web pages (SURVEY.md §7.0):

    coauthor-count  → SBERT-style embedding dot product   (×W_AUTHOR)
    org tanimoto    → body-token tanimoto                 (×W_ORG)
    venue tanimoto  → char-3gram cosine of titles         (×W_VENUE)
    title-word count→ common title tokens (capped)        (×W_TITLE)

Everything except the 3-gram cosine and Jaro-Winkler is a Catalyst expr;
those two are Arrow-batched pandas UDFs. Feature columns are kept
alongside the blended score (the pairs checkpoint table is the training
surface for any later learned scorer, mirroring the reference's
hand+semantic feature stack, ClassficationModels.py:138-148).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whoiswho_spark.constants import W_AUTHOR, W_ORG, W_TITLE, W_VENUE
from whoiswho_spark.functions.similarity import (
    dot_col,
    intersect_count_col,
    jaro_winkler_udf,
    ngram_cosine_udf,
    tanimoto_col,
)


def score_pairs(
    pairs: DataFrame,
    with_jaro: bool = False,
) -> DataFrame:
    """pairs with payload columns (title_X, title_tokens_X, text_tokens_X,
    embedding_X for X in {a, b}) → + feature columns + ``score``."""
    emb_dot = dot_col(F.col("embedding_a"), F.col("embedding_b"))
    text_tan = tanimoto_col(F.col("text_tokens_a"), F.col("text_tokens_b"))
    title_cos3 = ngram_cosine_udf(F.col("title_a"), F.col("title_b"))
    title_common = intersect_count_col(F.col("title_tokens_a"), F.col("title_tokens_b"))

    out = (
        pairs.withColumn("f_emb_dot", emb_dot)
        .withColumn("f_text_tanimoto", text_tan)
        .withColumn("f_title_cos3", title_cos3)
        .withColumn("f_title_common", title_common)
    )
    if with_jaro:
        out = out.withColumn(
            "f_title_jw", jaro_winkler_udf(F.col("title_a"), F.col("title_b"))
        )
    score = (
        F.lit(W_AUTHOR) * F.col("f_emb_dot")
        + F.lit(W_ORG) * F.col("f_text_tanimoto")
        + F.lit(W_VENUE) * F.col("f_title_cos3")
        + F.lit(W_TITLE) * F.least(F.col("f_title_common"), F.lit(3.0))
    )
    return out.withColumn("score", score)


PAIR_PAYLOAD_COLS = [
    "url",
    "title",
    "title_tokens",
    "text_tokens",
    "embedding",
]
