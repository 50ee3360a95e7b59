"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All pure Catalyst exprs (portable to the DuckDB oracle) except where
noted. The stopword lists are the reference's own (constants.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from whoiswho_spark.constants import STOPWORDS
from whoiswho_spark.operators.blocking import hash60

# Minimal per-language function-word sets for the n-gram/stopword
# heuristic language ID (deliberately tiny + deterministic).
LANG_MARKERS = {
    "en": STOPWORDS,  # reference English stopword list
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "pas", "pour", "que", "dans"],
}


def ws_tokens_col(text: Column) -> Column:
    """Whitespace tokens, empties dropped (oracle-portable tokenizer)."""
    return F.filter(F.split(text, " "), lambda _tk: F.length(_tk) > 0)


def token_count_col(text: Column) -> Column:
    return F.size(ws_tokens_col(text)).cast("bigint")


BPEISH_PATTERN = r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"


def bpeish_token_count_col(text: Column) -> Column:
    """BPE-ish proxy token count: word-piece matches (runs of
    letters/digits, single other non-space chars) — a cheap deterministic
    stand-in for a real tokenizer's count. Pattern avoids lookarounds so
    the DuckDB (RE2) oracle matches Java regex exactly."""
    return F.size(F.regexp_extract_all(text, F.lit(BPEISH_PATTERN), 0)).cast("bigint")


def stopword_ratio_col(text: Column, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are language markers."""
    toks = ws_tokens_col(text)
    markers = LANG_MARKERS[lang]
    hits = F.size(F.filter(toks, lambda _tk: _tk.isin(*markers)))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def lang_id_col(text: Column, threshold: float = 0.08) -> Column:
    """Heuristic language ID: argmax marker-ratio across languages, 'und'
    when no language clears the threshold; ties break by explicit
    precedence en > de > fr (an oracle-mirrorable when-chain)."""
    r_en = stopword_ratio_col(text, "en")
    r_de = stopword_ratio_col(text, "de")
    r_fr = stopword_ratio_col(text, "fr")
    t = F.lit(float(threshold))
    return (
        F.when((r_en >= r_de) & (r_en >= r_fr) & (r_en > t), F.lit("en"))
        .when((r_de >= r_fr) & (r_de > t), F.lit("de"))
        .when(r_fr > t, F.lit("fr"))
        .otherwise(F.lit("und"))
    )


def distinct_token_ratio_col(text: Column) -> Column:
    toks = ws_tokens_col(text)
    n = F.size(toks)
    return F.when(
        n > 0, F.size(F.array_distinct(toks)).cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))


def quality_score_col(text: Column) -> Column:
    """Deterministic quality heuristic in [0,1]:
    0.4·min(1, tokens/100) + 0.3·distinct-token ratio + 0.3·(1 − |stopword
    ratio − 0.4|) — length, lexical diversity, natural-language-ness."""
    toks = token_count_col(text).cast("double")
    length_term = F.least(F.lit(1.0), toks / F.lit(100.0))
    diversity = distinct_token_ratio_col(text)
    stop = stopword_ratio_col(text, "en")
    natural = F.lit(1.0) - F.abs(stop - F.lit(0.4))
    return F.round(
        F.lit(0.4) * length_term + F.lit(0.3) * diversity + F.lit(0.3) * natural, 6
    )


def fingerprint_col(text: Column) -> Column:
    """64-bit-ish document fingerprint (md5-based hash60 — engine-portable;
    the rolling-hash analog for exact-dup detection and stable sampling)."""
    return hash60(text, "fp")
