"""Cross-script name folding (functions/translit.py) — reference-minted
goldens plus direct table semantics.

goldens_name_translit.json is MINTED BY RUNNING THE REFERENCE CODE
(token.py tokenize_name, tool/is_chinese.py is_chinese_name, the
7-matcher battery) with unidecode stubbed by the package fold and
pypinyin stubbed by the vendored pinyin shim — re-mint with
tools/mint_is_chinese_goldens.py. The fold itself is the documented
behavioral contract (standard romanization conventions, NO unidecode
bit-parity claim; see the translit module docstring).
"""

import json
import os

from whoiswho_spark.functions.name_match import (
    MATCHERS,
    clean_name,
    names_match,
    tokenize_name,
)
from whoiswho_spark.functions.translit import TRANSLIT, ascii_fold


def _goldens():
    path = os.path.join(os.path.dirname(__file__), "goldens_name_translit.json")
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def test_translit_names_match_reference_mint():
    from whoiswho_spark.functions.is_chinese import is_chinese_name

    bad = []
    for raw, tok, chin in _goldens()["names"]:
        if tokenize_name(raw) != tok or is_chinese_name(raw) != chin:
            bad.append((raw, tokenize_name(raw), tok))
    assert not bad, bad


def test_translit_matcher_pairs_match_reference_mint():
    bad = []
    for a, b, strict, loose in _goldens()["pairs"]:
        ta, tb = tokenize_name(a), tokenize_name(b)
        got_s = [int(bool(f(ta, tb, False))) for f in MATCHERS]
        got_l = [int(bool(f(ta, tb, True))) for f in MATCHERS]
        if got_s != strict or got_l != loose:
            bad.append((a, b, got_s, strict, got_l, loose))
    assert not bad, bad


def test_cross_script_names_now_match():
    # the headline capability the table unlocks: same person, two
    # scripts — before the table these tokenized to '' (ascii-ignore
    # dropped un-romanized Cyrillic) and could never match
    assert tokenize_name("Иван Петров") == "ivan petrov"
    # names_match takes CLEANED forms (the engine dispatch contract)
    assert names_match(clean_name("Ivan Petrov"), clean_name("Иван Петров"))
    assert names_match(
        clean_name("Γιώργος Παπαδόπουλος"), clean_name("Giorgos Papadopoulos")
    )
    assert not names_match(clean_name("Иван Петров"), clean_name("Дмитрий Жуков"))


def test_fold_conventions():
    # documented per-choice conventions (module docstring)
    assert ascii_fold("щ") == "shch" and ascii_fold("Щ") == "Shch"
    assert ascii_fold("хц") == "khts"
    assert ascii_fold("ъь") == ""
    assert ascii_fold("ß") == "ss" and ascii_fold("Łø") == "Lo"
    assert ascii_fold("θφχ") == "thphch"
    assert ascii_fold("ς") == "s" and ascii_fold("Σ") == "S"
    # NFKD runs FIRST: decomposable Cyrillic reduces to its base letter
    # before the table (й→i, ё→e, ї→i — NOT the table's dead 'yi' entry)
    assert ascii_fold("йёї") == "iei"
    # Latin diacritics keep working through NFKD alone
    assert ascii_fold("m ćwiok") == "m cwiok"
    # unknowns pass through — conservative non-match, never wrong
    assert ascii_fold("ב") == "ב"


def test_hangul_arithmetic_decomposition():
    # RR transliteration variant (letter-level): NFKD decomposes the
    # syllable to conjoining jamo, the fold romanizes each arithmetically
    assert ascii_fold("김정은") == "gimjeongeun"
    assert ascii_fold("서울") == "seoul"
    assert ascii_fold("박") == "bag"  # letter-level: final ㄱ = g, not coda k
    assert ascii_fold("밟") == "balb"  # cluster coda ㄼ = lb
    assert ascii_fold("한글 Name") == "hangeul Name"
    # compatibility jamo NFKD-route through the same tables
    assert ascii_fold("ㄱ") == "g"
    assert tokenize_name("문재인") == "munjaein"
    assert names_match(clean_name("문재인"), clean_name("munjaein"))


def test_table_is_ascii_valued_and_nonascii_keyed():
    for k, v in TRANSLIT.items():
        assert len(k) == 1 and ord(k) >= 128, k
        assert all(ord(c) < 128 for c in v), (k, v)


def test_clean_name_folds_cyrillic():
    # clean_name = fold → lower → alpha-filter (feature_process.py:
    # 161-173); the fold is the shared contract minted above
    assert clean_name("Иван Петров") == "ivan petrov"
    assert clean_name("Jürgen Straßmann") == "jurgen strassmann"
