"""Reference parity for is_chinese_name (tool/is_chinese.py:70-97) and
the 7-matcher battery running with the REAL predicate wired in.

All goldens are MINTED BY RUNNING THE REFERENCE CODE with the unidecode
->NFKD stub and a poison pypinyin stub (no battery name reaches the
pinyin branch) — harness: tools/mint_is_chinese_goldens.py. Never edit
the JSON files by hand; re-mint.
"""

import json
import os

from whoiswho_spark.functions.is_chinese import (
    BAN_LIST_NAME,
    CHINESE_NAME,
    CHINESE_TOKEN,
    cleaning_name_cn,
    is_chinese_name,
)
from whoiswho_spark.functions.name_match import MATCHERS

_HERE = os.path.dirname(__file__)


def _load(name):
    with open(os.path.join(_HERE, name)) as f:
        return json.load(f)


def test_is_chinese_reference_goldens():
    cases = _load("goldens_is_chinese.json")
    assert len(cases) == 92
    bad = [(n, want) for n, want in cases if is_chinese_name(n) != want]
    assert not bad, bad[:10]


def test_matcher_battery_cn_reference_sweep():
    """198 romanized-CN name-pair variants (initials, drops,
    permutations, concatenations) through the battery with the DEFAULT
    (real) predicate — the CJK branches of matchers two/three/four/six/
    seven that the stub-minted sweep cannot reach."""
    cases = _load("goldens_name_battery_cn.json")
    assert len(cases) == 198
    # the sweep must actually exercise the CJK paths
    assert sum(1 for c in cases if any(c[2]) or any(c[3])) >= 50
    mismatches = []
    for a, b, strict, loose in cases:
        got_s = [int(f(a, b, False)) for f in MATCHERS]
        got_l = [int(f(a, b, True)) for f in MATCHERS]
        if got_s != strict or got_l != loose:
            mismatches.append((a, b, got_s, strict, got_l, loose))
    assert not mismatches, mismatches[:5]


def test_contract_tables_shape():
    """const.py:3303-3310 — the dicts are the inventories minus the ban
    list; spot-membership from both romanization planes."""
    assert len(BAN_LIST_NAME) == 45
    assert "wang" in CHINESE_NAME and "baek" in CHINESE_NAME
    assert "zhi" in CHINESE_TOKEN
    # ban-listed romanizations that double as Western fragments are
    # excluded from the dicts but still corroborate via the ban rule
    assert "kim" not in CHINESE_NAME and "kim" in BAN_LIST_NAME
    assert "van" not in CHINESE_NAME


def test_cleaning_name_cn_planes():
    """is_chinese.py:22-43 — ASCII/non-ASCII plane split + special-case
    table + alpha fold."""
    assert cleaning_name_cn("Jing-3 Zhang") == "jing zhang"
    # mixed name with >3 ASCII chars and >1 non-ASCII keeps ASCII plane
    assert cleaning_name_cn("李明 David Wang") == "david wang"
    # single stray diacritic falls through to fold of the raw string
    assert cleaning_name_cn("m ćwiok") == "m cwiok"
    # CJK special-case full names map via the pinned table
    assert cleaning_name_cn("周晟") == "zhou sheng"
    assert cleaning_name_cn("") == ""


def test_cleaning_name_cn_pinyin_branch():
    """The mostly-CJK branch (is_chinese.py:30-31: <3 ASCII chars, >1
    non-ASCII) romanizes on the VENDORED contract table (functions/
    pinyin.py; the CJK golden battery in tests/test_cjk_pinyin.py is the
    full reference-parity gate — this pins the branch routing)."""
    from whoiswho_spark.functions.is_chinese import cleaning_name_cn

    assert cleaning_name_cn("李明") == "li ming"
    # out-of-table CJK chars pass through as opaque isalpha tokens —
    # honest unknowns, the same shape the reference-with-stub regime
    # exhibits for characters the table doesn't cover
    assert cleaning_name_cn("李䶮") == "li 䶮"
    # the pinned special-case table bypasses the char table entirely
    assert cleaning_name_cn("周晟") == "zhou sheng"


def test_predicate_edges():
    # mononym surname romanization is enough at full_size 1
    assert is_chinese_name("zhang")
    # ban-listed token alone is not ("kim" needs corroboration and
    # 'basinger' provides none)
    assert not is_chinese_name("kim basinger")
    # but syllable + ban-name corroboration flips it
    assert is_chinese_name("kim jong il")
    assert not is_chinese_name("")
    assert not is_chinese_name("x y")  # no full tokens


def test_is_chinese_udf_matches_python(spark):
    from pyspark.sql import functions as F

    from whoiswho_spark.functions.is_chinese import is_chinese_name_udf

    names = [n for n, _ in _load("goldens_is_chinese.json")]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        r["name"]: r["cn"]
        for r in df.select("name", is_chinese_name_udf(F.col("name")).alias("cn")).collect()
    }
    for n, want in _load("goldens_is_chinese.json"):
        assert got[n] == want, n
