"""ASCII fold for name normalization — the ``unidecode`` stand-in.

The reference folds names with ``unidecode`` (token.py:110,
feature_process.py:150,162, tool/is_chinese.py:34, mind/utils.py:82);
that package is absent here, so the fold is:

1. NFKD-decompose and drop combining marks (handles every Latin
   diacritic: ć→c, å→a, ö→o, ...);
2. map the NFKD-surviving non-ASCII letters through a vendored
   transliteration table (``whoiswho_spark/data/translit.json``):
   Cyrillic (Russian core + Ukrainian/Belarusian/Serbian extras),
   Greek, and the Latin-extended letters with no decomposition
   (ß→ss, ø→o, ł→l, æ→ae, đ→d, þ→th, ...);
3. romanize Hangul jamo arithmetically (NFKD already decomposed any
   precomposed syllable) with the Revised Romanization transliteration
   variant — letter-level, no phonological assimilation;
4. pass anything still unmapped through unchanged — an honest unknown
   that can only produce a conservative non-match, never a wrong
   romanization (the pinyin-table rule).

The table uses standard romanization conventions, each a documented
choice (х→kh, щ→shch, й→i, ё→e, ъ/ь dropped — BGN/PCGN-style Russian;
χ→ch, φ→ph, η→e — name-practice Greek). NFKD runs FIRST, so
decomposable Cyrillic reduces to its base letter before the table sees
it (й=и+breve→i, ё=е+diaeresis→e — same result as their table entries;
ї=і+diaeresis→i, making the table's 'yi' entry unreachable — the
minted goldens pin the composed behavior). It does NOT claim bit-parity
with the real ``unidecode``: the name goldens are minted by running the
REFERENCE code with THIS fold as the unidecode stub
(tools/mint_is_chinese_goldens.py, tools/mint_cjk_pinyin_goldens.py),
so repo↔reference parity is exact by construction, and the behavioral
contract is this documented table. Before this table the stand-in was
NFKD alone, which left Cyrillic/Greek names un-romanized (declared in
round-4 VERDICT as the last name-engine gap); cross-script matching
('Ivan Petrov' vs 'Иван Петров') now works through every fold site
the reference routes through unidecode.

``bond/character/match_name.py:47`` is NOT routed here: the reference
itself uses a plain NFKD+ascii-ignore fold there, and
``functions/names.py match_name`` mirrors that exactly.
"""

from __future__ import annotations

import json
import os
import unicodedata


def _load_table() -> dict[str, str]:
    """zipimport-safe (spark-submit --py-files ships the package as a
    zip): importlib.resources first, plain path as fallback."""
    try:
        from importlib.resources import files

        return json.loads(
            files("whoiswho_spark").joinpath("data/translit.json").read_text("utf-8")
        )
    except Exception:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "..", "data", "translit.json"), encoding="utf-8") as f:
            return json.load(f)


TRANSLIT = _load_table()

# Hangul needs no vendored table: NFKD canonically decomposes every
# precomposed syllable (U+AC00..) into conjoining jamo (U+1100 block,
# Unicode ch. 3.12), and compatibility jamo (U+3131..) NFKD-map there
# too — so the fold only has to romanize the three jamo ranges
# arithmetically. The values are the Revised Romanization
# TRANSLITERATION variant (letter-level, no phonological assimilation:
# 박 → bag, 김정은 → gimjeongeun) — the documented-standard analog of
# the letter-level Cyrillic/Greek tables.
_HANGUL_L = ["g", "kk", "n", "d", "tt", "r", "m", "b", "pp", "s", "ss", "",
             "j", "jj", "ch", "k", "t", "p", "h"]          # U+1100..U+1112
_HANGUL_V = ["a", "ae", "ya", "yae", "eo", "e", "yeo", "ye", "o", "wa", "wae",
             "oe", "yo", "u", "wo", "we", "wi", "yu", "eu", "ui", "i"]  # U+1161..U+1175
_HANGUL_T = ["g", "kk", "gs", "n", "nj", "nh", "d", "l", "lg", "lm", "lb",
             "ls", "lt", "lp", "lh", "m", "b", "bs", "s", "ss", "ng", "j",
             "ch", "k", "t", "p", "h"]                     # U+11A8..U+11C2


def ascii_fold(s: str) -> str:
    """NFKD → strip combining marks → vendored transliteration (+
    arithmetic Hangul jamo romanization) → pass-through for unknowns
    (see module docstring)."""
    out = []
    for ch in unicodedata.normalize("NFKD", s):
        if unicodedata.combining(ch):
            continue
        if ch < "\x80":
            out.append(ch)
        elif "ᄀ" <= ch <= "ᄒ":
            out.append(_HANGUL_L[ord(ch) - 0x1100])
        elif "ᅡ" <= ch <= "ᅵ":
            out.append(_HANGUL_V[ord(ch) - 0x1161])
        elif "ᆨ" <= ch <= "ᇂ":
            out.append(_HANGUL_T[ord(ch) - 0x11A8])
        else:
            out.append(TRANSLIT.get(ch, ch))
    return "".join(out)
