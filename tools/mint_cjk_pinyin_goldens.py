"""Mint reference goldens for the CJK→pinyin name branches.

Dev-only harness: runs the read-only reference checkout with the
romanization PACKAGES stubbed by this repo's vendored contract table
(whoiswho_spark/data/cjk_pinyin.json → functions/pinyin.py), plus the
usual unidecode→NFKD fold stub — the same regime as
tools/mint_is_chinese_goldens.py, extended to the branches that were
previously gated out:

- ``pypinyin`` → pinyin(word, style=NORMAL) backed by the vendored
  table (whoiswho/character/name_match/tool/is_chinese.py:12-19);
- ``pinyin``   → get(name, format='strip') backed by the same table
  (whoiswho/character/match_name.py:40, mind/tool/is_chinese.py:8).

Because the stub IS the vendored table, repo↔reference parity on these
goldens checks the surrounding LOGIC (plane split, special cases,
alpha fold, CJK compare) — the table itself is shared contract data,
exactly like the cn_romanizations.json regime.

Outputs tests/goldens_cjk_pinyin.json:
  {"cleaning_name_tool":  [[name, cleaned], ...],   # whoiswho tool variant
   "cleaning_name_mind":  [[name, cleaned], ...],   # mind variant
   "is_chinese":          [[name, bool], ...],
   "match_name":          [[name, target, bool], ...]}
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import types
import unicodedata

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_TOOL = "/root/reference/whoiswho/character/name_match/tool"
REF_MATCH_NAME = "/root/reference/whoiswho/character/match_name.py"
REF_MIND_TOOL = "/root/reference/mind/tool"
TESTS = os.path.join(REPO, "tests")

from whoiswho_spark.functions.pinyin import lazy_pinyin  # noqa: E402
from whoiswho_spark.functions.translit import ascii_fold  # noqa: E402

# the package fold (NFKD + vendored transliteration) — the same
# unidecode stand-in every golden is minted with
_ascii_fold = ascii_fold


def install_stubs() -> None:
    uni = types.ModuleType("unidecode")
    uni.unidecode = _ascii_fold
    sys.modules["unidecode"] = uni

    pyp = types.ModuleType("pypinyin")
    pyp.NORMAL = 0

    def _pyp_pinyin(word, style=None):
        return [[seg] for seg in lazy_pinyin(word)]

    pyp.pinyin = _pyp_pinyin
    pyp.lazy_pinyin = lazy_pinyin
    sys.modules["pypinyin"] = pyp

    pin = types.ModuleType("pinyin")

    def _pin_get(s, delimiter="", format=None):
        return delimiter.join(lazy_pinyin(s))

    pin.get = _pin_get
    sys.modules["pinyin"] = pin


def load_pkg(pkg_name: str, path: str, mod_names: list[str]) -> dict:
    pkg = types.ModuleType(pkg_name)
    pkg.__path__ = [path]
    sys.modules[pkg_name] = pkg
    mods = {}
    for name in mod_names:
        spec = importlib.util.spec_from_file_location(
            f"{pkg_name}.{name}", os.path.join(path, f"{name}.py")
        )
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"{pkg_name}.{name}"] = m
        spec.loader.exec_module(m)
        mods[name] = m
    return mods


def load_file(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


# Full-CJK, mixed, special-case, and out-of-table names. Every golden is
# deterministic under the stub regime above.
CJK_BATTERY = [
    # full-CJK two/three-char names (table-covered)
    "李伟", "王芳", "张伟", "刘洋", "陈静", "杨秀英", "赵敏", "黄志强",
    "周晓明", "吴建国", "徐丽", "孙悦" , "马超", "朱琳", "胡军", "郭涛",
    "欧阳锋", "司马光" , "王小红", "李晓晨", "张雨晨", "刘德华",
    # the three pinned special cases (is_chinese.py:8)
    "周晟", "胡英", "郭强",
    # CJK with spaces / western order
    "李 伟", "王 小 红",
    # mixed ASCII + CJK planes (exercise the en/cn split thresholds)
    "John 李", "李 wei", "w 李伟", "Li 伟", "李伟 Zhang Wei",
    # out-of-table CJK characters (honest unknowns)
    "䶮玊", "李䶮", "龘龘",
    # Latin controls (must not regress the pinyin-free goldens)
    "jing zhang", "Ernest Jordan", "Na Li", "m ćwiok",
]


def _table_sweep_battery() -> list[str]:
    """Deterministic names covering EVERY char in the vendored table:
    sorted table chars chunked into two-char names (289 names for the
    578-char table), so the minted goldens exercise the full vendored
    inventory, not just the hand battery. The goldens file stores the
    names themselves — tests never regenerate this."""
    from whoiswho_spark.functions.pinyin import CHAR_TO_PINYIN

    chars = sorted(CHAR_TO_PINYIN)
    return ["".join(chars[i : i + 2]) for i in range(0, len(chars), 2)]


def _table_sweep_match_battery() -> list[tuple[str, str]]:
    """match_name CJK-branch pairs over the sweep: every 8th two-char
    name gets a correctly-reversed pinyin target (should match via the
    last+first concat rule) and a same-order target (should not, except
    for palindromic readings — the reference decides)."""
    from whoiswho_spark.functions.pinyin import lazy_pinyin

    out = []
    for name in _table_sweep_battery()[::8]:
        syls = lazy_pinyin(name)
        if len(syls) != 2 or not all(s.isascii() for s in syls):
            continue
        first, last = syls  # name = surname char + given char
        out.append((name, f"{last}_{first}"))
        out.append((name, f"{first}_{last}"))
    return out

# (name, first_last target) pairs for the regex-form match_name CJK
# branch (whoiswho/character/match_name.py:36-44): CJK name vs pinyin
# target — true when concat pinyin equals last+first.
MATCH_BATTERY = [
    ("李伟", "wei_li"),            # match: li+wei vs last+first=li wei → 'liwei'
    ("李伟", "li_wei"),            # reversed target → no
    ("王芳", "fang_wang"),
    ("王芳", "wang_fang"),
    ("张小明", "xiaoming_zhang"),
    ("张小明", "ming_zhangxiao"),
    ("欧阳锋", "feng_ouyang"),
    ("李 伟", "wei_li"),           # space inside CJK name is stripped
    ("䶮玊", "x_y"),               # unknown chars → conservative no
    ("李伟w", "wei_li"),           # non-CJK chars stripped before compare
]


def main() -> None:
    install_stubs()
    tool = load_pkg("reftool", REF_TOOL, ["const", "is_chinese"])
    mind = load_pkg("refmind", REF_MIND_TOOL, ["const", "is_chinese"])
    mn = load_file("refmatch", REF_MATCH_NAME)

    battery = CJK_BATTERY + _table_sweep_battery()
    match_battery = MATCH_BATTERY + _table_sweep_match_battery()
    cleaning_tool = [[n, tool["is_chinese"].cleaning_name(n)] for n in battery]
    cleaning_mind = [[n, mind["is_chinese"].cleaning_name(n)] for n in battery]
    pred = [[n, bool(tool["is_chinese"].is_chinese_name(n))] for n in battery]
    match = [[a, t, bool(mn.match_name(a, t))] for a, t in match_battery]

    out = {
        "cleaning_name_tool": cleaning_tool,
        "cleaning_name_mind": cleaning_mind,
        "is_chinese": pred,
        "match_name": match,
    }
    with open(os.path.join(TESTS, "goldens_cjk_pinyin.json"), "w") as f:
        json.dump(out, f, ensure_ascii=False, indent=0)
    print(
        f"cleaning {len(cleaning_tool)}x2, is_chinese {len(pred)} "
        f"({sum(1 for _, v in pred if v)} True), match {len(match)} "
        f"({sum(1 for *_, v in match if v)} True)"
    )


if __name__ == "__main__":
    main()
