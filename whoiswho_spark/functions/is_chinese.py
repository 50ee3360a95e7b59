"""The reference's romanized-Chinese-name detector (SURVEY.md §2.2 row
'is_chinese_name + CN dicts').

Semantics re-derived from
/root/reference/whoiswho/character/name_match/tool/is_chinese.py:22-97;
the romanization inventories (surname and syllable tables across
pinyin / Wade-Giles / Cantonese / Korean / Vietnamese romanizations,
plus the shared 45-entry ban list) are behavioral-contract data tables
transcribed from tool/const.py:1-3310 into
``whoiswho_spark/data/cn_romanizations.json`` — data-as-code, same
footing as the stopword lists in ``constants.py``.

Algorithm (is_chinese.py:70-97): clean the name, keep tokens longer
than one char ("full" tokens), then

- 1-2 full tokens: Chinese iff any token is a known surname
  romanization, or (any token is a known syllable AND any token is on
  the ban list — the ban list holds romanizations that double as
  Western name fragments, so a second corroborating signal is required);
- >=3 full tokens: count surname hits ``cname`` and syllable-only hits
  ``ctoken`` (syllable hits that are also surnames count once, as
  surnames); if there is at least one hit of either kind, ban-list hits
  are added back (surname-side and token-side respectively); Chinese iff
  ``cname + ctoken >= full_size - 1`` (all but one token romanized).

Cleaning (is_chinese.py:22-43): split the raw string into its ASCII and
non-ASCII character planes; three pinyin special-case full names map by
table; a mostly-non-ASCII name (<3 ASCII chars, >1 non-ASCII) romanizes
via pinyin; a mixed name (>3 ASCII, >1 non-ASCII) keeps only the
ASCII plane; then unidecode -> lowercase -> alpha-only fold. Parity
notes: unidecode is absent here -> same NFKD fold as name_match.py;
pypinyin is absent -> the romanization runs on the VENDORED contract
table (functions/pinyin.py + data/cjk_pinyin.json; characters outside
the table survive the fold as opaque tokens that hit no romanization
table — honest unknowns). CJK goldens are minted from the reference
with the same table as the package stub
(tools/mint_cjk_pinyin_goldens.py); the Latin-name goldens remain
pinyin-free (tools/mint_is_chinese_goldens.py).
"""

from __future__ import annotations

import json
import os
import unicodedata
from functools import lru_cache

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from whoiswho_spark.functions.pinyin import pinyin_normal
from whoiswho_spark.functions.translit import ascii_fold

def _load_tables() -> dict:
    """zipimport-safe (spark-submit --py-files ships the package as a
    zip): importlib.resources first, plain path as fallback."""
    try:
        from importlib.resources import files

        return json.loads(
            files("whoiswho_spark.data")
            .joinpath("cn_romanizations.json")
            .read_text()
        )
    except Exception:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data",
            "cn_romanizations.json",
        )
        with open(path) as f:
            return json.load(f)


_TABLES = _load_tables()

BAN_LIST_NAME = frozenset(_TABLES["ban_list_name"])
BAN_LIST_TOKEN = frozenset(_TABLES["ban_list_token"])
# The dicts the reference builds at const.py:3303-3310: inventory minus
# the ban list.
CHINESE_NAME = frozenset(_TABLES["all_chinese_name"]) - BAN_LIST_NAME
CHINESE_TOKEN = frozenset(_TABLES["all_chinese_token"]) - BAN_LIST_TOKEN

# is_chinese.py:8 — CJK full names whose pypinyin output needed pinning.
PINYIN_SPECIAL_CASE = {
    "周晟": "zhou sheng",
    "胡英": "hu ying",
    "郭强": "guo qiang",
}

def _ascii_fold(s: str) -> str:
    """unidecode stand-in (is_chinese.py:34): NFKD + vendored
    transliteration — see functions/translit.py."""
    return ascii_fold(s)


def cleaning_name_cn(name: str) -> str:
    """is_chinese.py:22-43 — the cleaner the predicate feeds on (distinct
    from feature_process clean_name: this one splits ASCII/non-ASCII
    planes first)."""
    name = name or ""
    en_name = " ".join("".join(c if ord(c) < 128 else " " for c in name).split())
    cn_name = " ".join("".join(c if ord(c) > 128 else " " for c in name).split())
    if cn_name in PINYIN_SPECIAL_CASE:
        name = PINYIN_SPECIAL_CASE[cn_name]
    elif len(en_name) < 3 and len(cn_name) > 1:
        # is_chinese.py:12-19 pinyin() on the vendored contract table
        # (functions/pinyin.py; pypinyin is absent — goldens minted from
        # the reference with the same table as the package stub)
        name = pinyin_normal(cn_name)
    elif len(en_name) > 3 and len(cn_name) > 1:
        name = en_name
    s = _ascii_fold(name).lower()
    # the reference keeps isalpha() chars, NOT [a-z] (is_chinese.py:36-42):
    # NFKD-surviving letters like ß/ø/ł/æ stay token-internal ('ßen' is
    # one unknown token, not a stray 'en' syllable hit) — [^a-z] here
    # diverged from the reference on real German/Nordic/Polish names.
    s = "".join(c if c.isalpha() else " " for c in s)
    return " ".join(s.split())


@lru_cache(maxsize=1 << 17)
def is_chinese_name(name: str) -> bool:
    """is_chinese.py:70-97. Cached: the battery probes the same cleaned
    names 14x per pair (2 sides x 7 matchers)."""
    full = [t for t in cleaning_name_cn(name).split() if len(t) > 1]
    full_size = len(full)
    if full_size == 0:
        return False

    cname = sum(1 for t in full if t in CHINESE_NAME)
    ctoken_total = sum(1 for t in full if t in CHINESE_TOKEN)

    if full_size <= 2:
        if cname >= 1:
            return True
        if ctoken_total >= 1 and any(t in BAN_LIST_NAME for t in full):
            return True
        return False

    # full_size >= 3: syllable-only hits exclude surname hits
    # (list_excluding at :88 removes every token also matched as a
    # surname — membership-equivalent to "in token table, not in name
    # table" since both match lists draw from the same full-token list).
    ctoken = sum(1 for t in full if t in CHINESE_TOKEN and t not in CHINESE_NAME)
    if cname >= 1 or ctoken_total >= 1:
        cname += sum(1 for t in full if t in BAN_LIST_NAME)
        ctoken += sum(1 for t in full if t in BAN_LIST_TOKEN)
    return cname + ctoken >= full_size - 1


@pandas_udf(BooleanType())
def is_chinese_name_udf(names: pd.Series) -> pd.Series:
    return pd.Series(
        [is_chinese_name(n or "") for n in names], dtype=bool, index=names.index
    )
