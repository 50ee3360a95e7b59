"""CJK→pinyin parity goldens (vendored romanization table).

Every expected value in goldens_cjk_pinyin.json was MINTED BY RUNNING
THE REFERENCE CODE (whoiswho/character/name_match/tool/is_chinese.py
cleaning_name + is_chinese_name, mind/tool/is_chinese.py cleaning_name,
whoiswho/character/match_name.py match_name) with the pypinyin/pinyin
packages stubbed by this repo's vendored contract table
(whoiswho_spark/data/cjk_pinyin.json) and unidecode stubbed by the NFKD
fold — re-mint with tools/mint_cjk_pinyin_goldens.py. The table is
shared contract data; these goldens gate the surrounding LOGIC (plane
split, pinned special cases, alpha fold, CJK concat compare).
"""

import json
import os

import pytest

GOLDENS = json.load(
    open(os.path.join(os.path.dirname(__file__), "goldens_cjk_pinyin.json"))
)


def test_lazy_pinyin_shapes():
    from whoiswho_spark.functions.pinyin import lazy_pinyin, pinyin_get, pinyin_normal

    assert lazy_pinyin("李伟") == ["li", "wei"]
    # consecutive non-Han chars group into ONE item (pypinyin parity)
    assert lazy_pinyin("abc李x y王") == ["abc", "li", "x y", "wang"]
    # out-of-table Han chars pass through unchanged (honest unknowns)
    assert lazy_pinyin("李䶮") == ["li", "䶮"]
    assert pinyin_get("李伟") == "liwei"
    assert pinyin_get("李 伟", delimiter=" ") == "li   wei"
    assert pinyin_normal("李 伟") == "li wei"
    assert lazy_pinyin("") == []


@pytest.mark.parametrize("name,expected", GOLDENS["cleaning_name_tool"])
def test_cleaning_name_cn_matches_reference(name, expected):
    from whoiswho_spark.functions.is_chinese import cleaning_name_cn

    assert cleaning_name_cn(name) == expected, name


@pytest.mark.parametrize("name,expected", GOLDENS["cleaning_name_mind"])
def test_cleaning_name_matches_reference(name, expected):
    from whoiswho_spark.functions.names import cleaning_name

    assert cleaning_name(name) == expected, name


@pytest.mark.parametrize("name,expected", GOLDENS["is_chinese"])
def test_is_chinese_cjk_matches_reference(name, expected):
    from whoiswho_spark.functions.is_chinese import is_chinese_name

    assert is_chinese_name(name) is expected, name


@pytest.mark.parametrize("name,target,expected", GOLDENS["match_name"])
def test_match_name_cjk_matches_reference(name, target, expected):
    from whoiswho_spark.functions.names import match_name

    assert match_name(name, target) is expected, (name, target)
