"""Vendored CJK→pinyin romanization (data-as-code).

The reference romanizes Chinese names with two packages — ``pypinyin``
(whoiswho/character/name_match/tool/is_chinese.py:4-19, NORMAL style)
and ``pinyin`` (whoiswho/character/match_name.py:2,40 ``pinyin.get(name,
format='strip')``; bond/character/match_name.py:2,40; mind/tool/
is_chinese.py:4-8). Neither package ships in this environment, so the
character→syllable mapping is vendored as contract data
(``whoiswho_spark/data/cjk_pinyin.json``, same footing as
``cn_romanizations.json``): the surname inventory plus frequent
given-name characters, toneless, NORMAL-style (ü → v). The CJK goldens
are minted by running the reference code with these very readings as
the package stub (tools/mint_cjk_pinyin_goldens.py), so repo↔reference
parity is exact by construction; characters OUTSIDE the table pass
through unchanged — an honest unknown that can never produce a wrong
romanization, only a conservative non-match.

API mirrors the call shapes the reference uses:

- ``lazy_pinyin(s)`` — pypinyin.lazy_pinyin parity: one item per Han
  character (its syllable, or the character itself when unknown);
  consecutive non-Han characters grouped into one item.
- ``pinyin_normal(s)`` — the reference's ``pinyin(word)`` helper
  (is_chinese.py:12-19): syllables space-joined, whitespace collapsed.
- ``pinyin_get(s, delimiter="")`` — ``pinyin.get(..., format='strip')``
  parity: segments joined by the delimiter.
"""

from __future__ import annotations

import json
import os


def _load_table() -> dict[str, str]:
    """zipimport-safe (spark-submit --py-files ships the package as a
    zip): importlib.resources first, plain path as fallback."""
    try:
        from importlib.resources import files

        payload = json.loads(
            files("whoiswho_spark.data").joinpath("cjk_pinyin.json").read_text()
        )
    except Exception:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data",
            "cjk_pinyin.json",
        )
        with open(path) as f:
            payload = json.load(f)
    return payload["char_to_pinyin"]


CHAR_TO_PINYIN: dict[str, str] = _load_table()


def is_han(ch: str) -> bool:
    return "一" <= ch <= "鿿"


def has_han(s: str) -> bool:
    return any(is_han(ch) for ch in s)


def lazy_pinyin(s: str) -> list[str]:
    out: list[str] = []
    buf: list[str] = []
    for ch in s:
        if is_han(ch):
            if buf:
                out.append("".join(buf))
                buf = []
            out.append(CHAR_TO_PINYIN.get(ch, ch))
        else:
            buf.append(ch)
    if buf:
        out.append("".join(buf))
    return out


def pinyin_normal(s: str) -> str:
    """' '.join of per-character syllables with whitespace collapsed —
    the exact output shape of the reference's pinyin() helper
    (is_chinese.py:12-19: ''.join(i) + ' ' per pypinyin item, then
    ' '.join(split()))."""
    return " ".join(" ".join(lazy_pinyin(s)).split())


def pinyin_get(s: str, delimiter: str = "") -> str:
    return delimiter.join(lazy_pinyin(s))
