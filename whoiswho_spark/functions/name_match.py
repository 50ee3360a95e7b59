"""The reference's name-matching engine (SURVEY.md §2.2 rows
'tokenize_name + nickname dict', 'clean_name', '7-matcher name engine').

Semantics re-derived from:
- tokenize_name: /root/reference/whoiswho/character/name_match/tool/
  token.py:102-119 (nickname dict + stopwords at :4-101, duplicated at
  feature_process.py:47-140);
- clean_name:    /root/reference/whoiswho/character/feature_process.py:
  161-173 (alpha-only fold — digits become separators, unlike the
  ``[\\W_]`` cleaner used by other_features at :354);
- matcher battery + dispatch: tool/util.py:14-252, tool/match_name.py:
  7-15,55-128.

Parity notes:
- ``unidecode`` is absent in this environment → NFKD fold + the vendored
  Cyrillic/Greek/Latin-extended transliteration table
  (``functions/translit.py``, documented conventions, no unidecode
  bit-parity claim). Latin diacritics agree with unidecode by
  construction (the reference's own ``__main__`` case 'm ćwiok' →
  'm cwiok' holds); Cyrillic/Greek names now romanize through every
  unidecode call site, so cross-script matching works; goldens are
  minted from the reference with this same fold as the stub.
- ``is_chinese_name`` (tool/is_chinese.py:70-97) is implemented to
  reference parity in ``whoiswho_spark/functions/is_chinese.py`` (with
  the const.py romanization tables as contract data) and is the DEFAULT
  predicate for every matcher and the dispatch, as in the reference; it
  stays injectable (``_never_chinese`` selects the 非中文/non-Chinese
  branches, used by the stub-minted goldens).

All functions are plain Python (unit-tested against reference-minted
goldens) plus Arrow-batched pandas UDF wrappers for DataFrame use.
"""

from __future__ import annotations

import re
import unicodedata
from collections import Counter
from collections.abc import Callable

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, StringType

from whoiswho_spark.constants import NAME_STOPWORDS, NICKNAME_DICT
from whoiswho_spark.functions.is_chinese import is_chinese_name
from whoiswho_spark.functions.translit import ascii_fold

_NON_WORD_DOT = re.compile(r"[^\w.]")
_MULTI_SPACE = re.compile(" +")


def _ascii_fold(s: str) -> str:
    """The unidecode stand-in: NFKD fold + vendored Cyrillic/Greek/
    Latin-extended transliteration (functions/translit.py — goldens are
    minted from the reference with the same fold; see parity note)."""
    return ascii_fold(s)


def tokenize_name(name: str) -> str:
    """token.py:102-119: split bare 2-letter uppercase runs ('JX'→'J X'),
    strip apostrophes, non-[word.]→space, lowercase, ascii-fold, drop
    name stopwords (dots ignored for the check), map nicknames, expand
    multi-dot words ('j.x.'→'j x'), collapse spaces."""
    words = [
        " ".join(w) if len(w) == 2 and "." not in w and w.isupper() else w
        for w in (name or "").split()
    ]
    s = " ".join(words).replace("'", "").replace("’", "")
    s = _NON_WORD_DOT.sub(" ", s).lower()
    s = _ascii_fold(s)
    kept = []
    for w in s.split():
        if w.replace(".", "") in NAME_STOPWORDS:
            continue
        w = NICKNAME_DICT.get(w, w)
        if w.count(".") > 1:
            w = " ".join(w.split("."))
        kept.append(w)
    out = " ".join(kept).encode("ascii", "ignore").decode("ascii")
    return _MULTI_SPACE.sub(" ", out)


def clean_name(name: str) -> str:
    """feature_process.py:161-173: ascii-fold, lowercase, keep ALPHA runs
    only — every non-alpha char (digits included) collapses to a single
    space."""
    s = _ascii_fold(name or "").lower()
    out = ""
    for ch in s:
        if ch.isalpha():
            out += ch
        else:
            out = out.rstrip() + " "
    return out.strip()


# --- matcher battery (tool/util.py) -----------------------------------------


def _name_counts(name: str) -> Counter:
    return Counter(name.split())


def same_name(a: str, b: str) -> bool:
    """util.py:14-15: dot-blind token multiset equality."""
    return _name_counts(a.replace(".", " ")) == _name_counts(b.replace(".", " "))


def is_abbr_word(w: str) -> bool:
    return w.endswith(".") or len(w) == 1


def split_abbr_full(name: str) -> tuple[list[str], list[str]]:
    abbr, full = [], []
    for w in name.split():
        (abbr if is_abbr_word(w) else full).append(w)
    return abbr, full


def get_first_chars(name) -> Counter:
    if isinstance(name, list):
        name = " ".join(name)
    return Counter(w[0] for w in name.split())


def is_abbr_of(a: str, b: str, partial: bool = False, loose: bool = False) -> bool:
    """util.py:49-127: is ``a`` an abbreviation of ``b``?

    Shared full words (len ≥ 2) cancel first; then every full word of a
    must be found in (strict: equal / partial: prefix of) b's full words,
    and every abbr word of a must prefix SOME remaining abbr-or-full word
    of b. Quirk preserved: one abbr word may consume both an abbr AND a
    full word of b in the same step (the reference runs both scans
    unconditionally). ``loose`` swaps the consumption check for
    first-char-set containment + 3-char prefix/suffix overlap.
    """
    if same_name(a, b):
        return True
    abbr_a, full_a = split_abbr_full(a)
    abbr_b, full_b = split_abbr_full(b)
    for w in set(abbr_a + full_a) & set(abbr_b + full_b):
        if len(w) < 2:
            continue
        for part in (abbr_a, full_a, abbr_b, full_b):
            if w in part:
                part.remove(w)

    if loose:
        fc_a = get_first_chars(abbr_a + full_a)
        fc_b = get_first_chars(abbr_b + full_b)
        if not (set(fc_b) <= set(fc_a) or set(fc_a) <= set(fc_b)):
            return False
        if full_a and full_b:
            for wa in full_a:
                prefix = wa if len(wa) < 4 else wa[:3]
                suffix = wa if len(wa) < 4 else wa[-3:]
                if not any(
                    wb.startswith(prefix) or wb.endswith(suffix) for wb in full_b
                ):
                    return False
        return True

    for wa in full_a:
        if partial:
            hit = next((wb for wb in full_b if wb.startswith(wa)), None)
            if hit is None:
                return False
            full_b.remove(hit)
        else:
            if wa not in full_b:
                return False
            full_b.remove(wa)
    for wa in abbr_a:
        hit = False
        hit_abbr = next((wb for wb in abbr_b if wb.startswith(wa)), None)
        if hit_abbr is not None:
            abbr_b.remove(hit_abbr)
            hit = True
        hit_full = next((wb for wb in full_b if wb.startswith(wa)), None)
        if hit_full is not None:
            full_b.remove(hit_full)
            hit = True
        if not hit:
            return False
    return True


def may_be_duplicates_partial(a: str, b: str, loose: bool = False) -> bool:
    """util.py:32-37."""
    ret = same_name(a, b) or is_abbr_of(a, b, True) or is_abbr_of(b, a, True)
    if loose:
        ret = ret or is_abbr_of(a, b, True, True) or is_abbr_of(b, a, True, True)
    return ret


def has_middle_name(name: str) -> bool:
    abbr, full = split_abbr_full(name)
    return len(abbr) == 1 and len(full) == 2


def remove_middle_name(name: str) -> str:
    return " ".join(w for w in name.split() if not is_abbr_word(w))


def _never_chinese(_: str) -> bool:
    return False


def match_name_one(a: str, b: str, loose: bool = False, is_chinese=is_chinese_name) -> bool:
    """util.py:141-166: equal full-part mass and one side's concatenated
    full words contain the other's words as substrings."""
    if same_name(a, b):
        return True
    _, full_a = split_abbr_full(a)
    _, full_b = split_abbr_full(b)
    if full_a and len("".join(full_a)) == len("".join(full_b)):
        if len(full_a) > len(full_b):
            joined, probe = "".join(full_a), full_b
        else:
            joined, probe = "".join(full_b), full_a
        return all(joined.find(w) != -1 for w in probe)
    return False


def match_name_two(a: str, b: str, loose: bool = False, is_chinese=is_chinese_name) -> bool:
    """util.py:169-186: abbreviation match with CN guards; strict mode
    additionally requires identical first-char multisets."""
    a_cn, b_cn = is_chinese(a), is_chinese(b)
    full_a, full_b = [], []
    if a_cn and b_cn:
        abbr_a, full_a = split_abbr_full(a)
        abbr_b, full_b = split_abbr_full(b)
        if not abbr_a and not abbr_b:
            return False
    if (a_cn and len(a.split()) < 2) or (b_cn and len(b.split()) < 2):
        return False
    if loose:
        if (a_cn or b_cn) and (not full_a or not full_b):
            return False
        return is_abbr_of(a, b, loose=True)
    return is_abbr_of(a, b, loose=False) and get_first_chars(a) == get_first_chars(b)


def match_name_three(a: str, b: str, loose: bool = False, is_chinese=is_chinese_name) -> bool:
    """util.py:189-193 (non-Chinese only): strict abbreviation."""
    if is_chinese(a) and is_chinese(b):
        return False
    return is_abbr_of(a, b)


def match_name_four(a: str, b: str, loose: bool = False, is_chinese=is_chinese_name) -> bool:
    """util.py:197-201 (non-Chinese only): prefix-partial abbreviation."""
    if is_chinese(a) and is_chinese(b):
        return False
    return is_abbr_of(a, b, True)


def match_name_five(a: str, b: str, loose: bool = False, is_chinese=is_chinese_name) -> bool:
    """util.py:204-212: ≥3-word names equal except one trailing char on
    the last word."""
    if not a or not b:
        return False
    wa, wb = a.split(), b.split()
    if len(wa) < 3 or len(wb) < 3:
        return False
    if "".join(wa[:-1]) != "".join(wb[:-1]):
        return False
    return wa[-1] == wb[-1][:-1] or wb[-1] == wa[-1][:-1]


def match_name_six(a: str, b: str, loose: bool = False, is_chinese=is_chinese_name) -> bool:
    """util.py:216-229 (non-Chinese only): exactly one side has a middle
    initial — drop it, concatenate, and prefix-compare (the reference's
    operator-precedence quirk — the length-gap guard binds only to the
    second startswith — is preserved)."""
    if is_chinese(a) and is_chinese(b):
        return False
    if has_middle_name(a) == has_middle_name(b):
        return False
    if has_middle_name(a):
        a = remove_middle_name(a)
    if has_middle_name(b):
        b = remove_middle_name(b)
    a, b = a.replace(" ", ""), b.replace(" ", "")
    return a != b and (
        a.startswith(b) or (b.startswith(a) and abs(len(a) - len(b)) < 3)
    )


def match_name_seven(a: str, b: str, loose: bool = False, is_chinese=is_chinese_name) -> bool:
    """util.py:233-252 (Chinese-pinyin only): ≥3 full words, shorter side's
    words all present in the longer's."""
    if not is_chinese(a) or not is_chinese(b):
        return False
    wa, wb = a.split(), b.split()
    if len(wa) < 3 or len(wb) < 3:
        return False
    abbr_a, full_a = split_abbr_full(a)
    abbr_b, full_b = split_abbr_full(b)
    if abbr_a or abbr_b:
        return False
    probe, pool = (full_b, full_a) if len(full_a) > len(full_b) else (full_a, full_b)
    return all(w in pool for w in probe)


MATCHERS = (
    match_name_one,
    match_name_two,
    match_name_three,
    match_name_four,
    match_name_five,
    match_name_six,
    match_name_seven,
)


def names_match(
    a: str,
    b: str,
    loose: bool = False,
    is_chinese: Callable[[str], bool] = is_chinese_name,
) -> bool:
    """First-match dispatch over the 7-matcher battery
    (tool/match_name.py:7-15 funcs list, applied in order as at :82-86).
    Inputs are CLEANED names (clean_name output)."""
    return any(f(a, b, loose, is_chinese) for f in MATCHERS)


def matched_coauthors(
    paper_names: list[str],
    cand_names: list[str],
    name2clean: dict[str, str] | None = None,
    loose: bool = True,
) -> set[str]:
    """tool/match_name.py:55-88 (``match_name``): for every paper author
    name, collect candidate names whose cleaned forms pass the battery;
    return the matched candidates' CLEANED forms (the reference maps the
    matched raw set through name2clean at :86-87)."""
    if not paper_names:
        return set()
    clean = name2clean if name2clean is not None else {}

    def _c(n: str) -> str:
        if n not in clean:
            clean[n] = clean_name(n)
        return clean[n]

    hit_raw: set[str] = set()
    for p in paper_names:
        p_l = _c(p)
        for d in cand_names:
            if d in hit_raw:
                continue
            if names_match(p_l, _c(d), loose):
                hit_raw.add(d)
    return {_c(d) for d in hit_raw}


def dry_run(names: set[str] | list[str]) -> bool:
    """tool/match_name.py:18-48 (``dryRun``): validate that a candidate
    cluster of CLEANED names is self-consistent — the most token-complex
    names must pairwise pass ``may_be_duplicates_partial`` (loose), and
    every remaining name must partially match at least one of them."""
    names = list(names)
    if len(names) <= 1:
        return True
    max_len, complex_names = len(names[0].split()), set()
    for n in names:
        length = len(n.split())
        if length == max_len:
            complex_names.add(n)
        elif length > max_len:
            max_len = length
            complex_names = {n}
    cx = sorted(complex_names)
    for i, a in enumerate(cx):
        for b in cx[i + 1:]:
            if not may_be_duplicates_partial(a, b, True):
                return False
    return all(
        n in complex_names
        or any(may_be_duplicates_partial(n, c, True) for c in complex_names)
        for n in names
    )


def find_main(
    name: str, names: list[str], loose: bool = False
) -> tuple[list[tuple[str, int]], set[str]]:
    """tool/match_name.py:91-128 (``findMain``): match ``name`` against a
    candidate list, trying cleaned forms first, then the tokenize_name
    (nickname-expanded) forms; returns ([(matched, index)…], leftovers)."""
    pt: set[str] = set()
    pt_list: list[tuple[str, int]] = []
    name_l = clean_name(name)
    token_l = clean_name(tokenize_name(name))
    for idx, dname in enumerate(names):
        if dname in pt:
            pt_list.append((dname, idx))
            continue
        if names_match(name_l, clean_name(dname), loose):
            pt.add(dname)
            pt_list.append((dname, idx))
        elif names_match(token_l, clean_name(tokenize_name(dname)), loose):
            pt.add(dname)
            pt_list.append((dname, idx))
    return pt_list, {d for d in names if d not in pt}


# --- DataFrame surface -------------------------------------------------------


def cluster_name_consistency(
    df, cluster_col: str = "cluster_id", name_col: str = "name"
):
    """Per-cluster ``dry_run`` validation as a grouped DataFrame op
    (tool/match_name.py:18-48; pretreat_unass uses dryRun to decide
    whether a candidate cluster's author names are self-consistent
    before trusting it). Input: (cluster, raw name) rows; output one row
    per cluster with the member count and the dryRun verdict over the
    members' CLEANED names. groupBy().applyInPandas — the same grouped
    shape as per-block DBSCAN, so it scales by cluster key."""
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        StructField,
        StructType,
    )

    in_type = df.schema[cluster_col].dataType
    out_schema = StructType(
        [
            StructField(cluster_col, in_type),
            StructField("n_members", IntegerType()),
            StructField("consistent", BooleanType()),
        ]
    )

    def _check(pdf: pd.DataFrame) -> pd.DataFrame:
        cleaned = {clean_name(n or "") for n in pdf[name_col]}
        cleaned.discard("")
        return pd.DataFrame(
            {
                cluster_col: [pdf[cluster_col].iloc[0]],
                "n_members": [len(pdf)],
                "consistent": [dry_run(cleaned)],
            }
        )

    return df.groupBy(cluster_col).applyInPandas(_check, out_schema)


@pandas_udf(StringType())
def tokenize_name_udf(names: pd.Series) -> pd.Series:
    return names.map(tokenize_name)


@pandas_udf(StringType())
def clean_name_udf(names: pd.Series) -> pd.Series:
    return names.map(clean_name)


@pandas_udf(BooleanType())
def names_match_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Battery dispatch over CLEANED name pairs (strict mode)."""
    return pd.Series(
        [names_match(x or "", y or "") for x, y in zip(a, b)], dtype=bool
    )


@pandas_udf(BooleanType())
def names_match_loose_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [names_match(x or "", y or "", loose=True) for x, y in zip(a, b)], dtype=bool
    )


def names_match_with_token_fallback(a: str, b: str, loose: bool = True) -> bool:
    """findMain's two-stage try (tool/match_name.py:95-116) for RAW
    strings: battery on cleaned forms first, then on the
    tokenize_name-expanded (nickname/stopword/initial-split) forms."""
    if names_match(clean_name(a), clean_name(b), loose):
        return True
    return names_match(
        clean_name(tokenize_name(a)), clean_name(tokenize_name(b)), loose
    )


@pandas_udf(BooleanType())
def names_match_fallback_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [names_match_with_token_fallback(x or "", y or "") for x, y in zip(a, b)],
        dtype=bool,
    )
