"""Mint reference goldens for is_chinese_name and the 7-matcher battery
running with the REAL predicate (not the never-Chinese stub).

Dev-only harness: reads the read-only reference checkout at
/root/reference (tool/is_chinese.py, tool/const.py, tool/util.py,
tool/match_name.py) with two import stubs:

- ``unidecode`` -> the package's own fold (functions/translit.py: NFKD
  + vendored Cyrillic/Greek/Latin-extended transliteration — parity
  note in whoiswho_spark/functions/name_match.py);
- ``pypinyin`` -> a shim over the package's vendored pinyin table with
  real pypinyin's shape (one segment per Han char, non-Han passed
  through grouped). Latin battery names never reach it; Cyrillic/Greek
  names route their non-ASCII plane through it untouched, exactly like
  real pypinyin, before unidecode folds the result.

Outputs:
- tests/goldens_is_chinese.json     [[name, bool], ...]
- tests/goldens_name_battery_cn.json [[a, b, strict7, loose7], ...]
  (battery vectors with the real is_chinese_name wired in)
- tests/goldens_name_translit.json  [[raw, tokenized, is_chinese], ...]
  (cross-script names through reference tokenize_name + predicate)
and prints the 13-pair name_match_pairs dispatch truth (strict/loose)
used by the frozen oracle in __spark_entry__.py.
"""

from __future__ import annotations

import itertools
import json
import os
import random
import sys
import types

REF_TOOL = "/root/reference/whoiswho/character/name_match/tool"
HERE = os.path.dirname(os.path.abspath(__file__))
TESTS = os.path.join(HERE, "..", "tests")


sys.path.insert(0, os.path.join(HERE, ".."))

from whoiswho_spark.functions.pinyin import lazy_pinyin  # noqa: E402
from whoiswho_spark.functions.translit import ascii_fold  # noqa: E402

# The SAME fold the package uses (NFKD + vendored Cyrillic/Greek/
# Latin-extended transliteration) — goldens are reference-code,
# package-fold by construction.
_ascii_fold = ascii_fold


def load_reference_tool():
    uni = types.ModuleType("unidecode")
    uni.unidecode = _ascii_fold
    sys.modules["unidecode"] = uni

    # pypinyin.pinyin(word, NORMAL) stub = the package's vendored table,
    # mirroring real pypinyin's shape: one [segment] per Han char,
    # consecutive non-Han chars grouped and PASSED THROUGH (this is the
    # branch Cyrillic/Greek names take in cleaning_name: the non-ASCII
    # plane goes through pinyin() untouched, then unidecode folds it).
    pin = types.ModuleType("pypinyin")
    pin.pinyin = lambda word, style=0, **k: [[seg] for seg in lazy_pinyin(word)]
    pin.NORMAL = 0
    sys.modules["pypinyin"] = pin

    import importlib.util

    pkg = types.ModuleType("reftool")
    pkg.__path__ = [REF_TOOL]
    sys.modules["reftool"] = pkg
    mods = {}
    for name in ["const", "is_chinese", "token", "util", "match_name"]:
        spec = importlib.util.spec_from_file_location(
            f"reftool.{name}", os.path.join(REF_TOOL, f"{name}.py")
        )
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"reftool.{name}"] = m
        spec.loader.exec_module(m)
        mods[name] = m
    return mods


# The reference's own __main__ battery (is_chinese.py:100-147) plus
# romanized-CN, Korean/Cantonese-romanization, ban-list and size edge
# cases. ASCII-safe or Latin-diacritic only (see module docstring).
PREDICATE_BATTERY = [
    "Ernest Jordan", "K. MORIBE", "D. Jakominich", "William H. Nailon",
    "P. B. Littlewood", "A. Kuroiwa", "Jose Pereira", "Buzz Aldrin",
    "M. Till-berg", "E.c.c. Tsang", "E. A. Uliana", "Shankar Sa Y",
    "KAIPING HAN", "Xiaotao Wu", "Anneke A. Sohoone", "Harry Dankowicz",
    "Gebreselassie Baraki", "Yufeng Xin", "Mass-market Dynamics",
    "Ph. Mathieu", "Robert A. Granat", "Hafez Hadinejad-mahram",
    "H. De Hoop", "Mark L. Manwaring", "Andrew L. Goldberg",
    "Julian Brad Eld", "Bruce A. Rosenblatt", "Mitchell D. Theys",
    "Olaf E. Flippo", "Elisabeth Umkehrer", "Balasubramanian Sethuraman",
    "BARRY K. WITHERSPOON", "Natalia Jimeno", "Zhen Song",
    "Edmund Pierzchala", "Halina Przymusinska", "Jae-Hoon Kim",
    "Jonathan M. Borwein", "Victor M. Kureichick", "P Ludvigsen",
    "Mahir Hassan", "Na Li",
    # romanized CN (pinyin) in both orders, initials, 3+ tokens
    "jing zhang", "zhang jing", "wei wang li", "li hua", "zhang wei",
    "xiaoming wang", "chen jie", "liu yang", "wang xiaohong",
    "ouyang feng", "sima qian", "li wei chen", "wang li zhang ming",
    "j zhang", "jing z", "hua li ming", "xu zhi hong", "qian long",
    # Korean / Cantonese / Vietnamese romanizations present in the tables
    "kim jong il", "park chan wook", "wong kar wai", "chan tai man",
    "nguyen van a", "baek seung ho", "moon jae in", "bae doona",
    # mixed west+CN and ban-list edge cases
    "john zhang", "mary li", "juan carlos", "jean de la fontaine",
    "kim basinger", "van der sar", "tim duncan", "dean kim",
    "yu gi oh", "de long", "le van", "du bois",
    # mononyms and empties
    "zhang", "wang", "smith", "li", "yu", "x", "", "  ",
    # diacritics (en/cn-split exercises: ord>128 chars scattered)
    "m ćwiok", "ÅSA Öberg", "José Niño", "Tôn Thất Tùng",
]

# Cross-script names the vendored transliteration table unlocks
# (functions/translit.py): Cyrillic and Greek route their non-ASCII
# plane through the pinyin pass-through then the fold; Latin-extended
# letters (ł/ø/ß/æ/þ) have no NFKD decomposition and fold by table.
TRANSLIT_BATTERY = [
    "Иван Петров", "ИВАН ПЕТРОВ", "Дмитрий Жуков", "Фёдор Щербаков",
    "Юрий Яковлев", "Эдуард Хиль", "Олександр Ґонґадзе", "Їжак Євген",
    "Владимир В. Путинцев", "А. С. Пушкин", "Njegoš Đorđević",
    "Γιώργος Παπαδόπουλος", "Θεόδωρος Κολοκοτρώνης", "Χρήστος Ψωμάς",
    "Ωμέγα Ξενάκης", "Łukasz Gołąb", "Søren Kierkegaard",
    "Björn Þórsson", "Ðorđe Æbelø", "Jürgen Straßmann",
    # mixed-script: ASCII plane > 3 chars wins the en_name branch
    "Ivan Петров", "Anna Καραμανλή",
    # Hangul (arithmetic jamo decomposition, RR transliteration variant)
    "김정은", "박찬욱", "문재인", "김 민수", "이서연 Lee",
]


def main() -> None:
    mods = load_reference_tool()
    ic = mods["is_chinese"]
    util = mods["util"]
    mn = mods["match_name"]

    pred = [[n, bool(ic.is_chinese_name(n))] for n in PREDICATE_BATTERY]
    n_true = sum(1 for _, v in pred if v)
    with open(os.path.join(TESTS, "goldens_is_chinese.json"), "w") as f:
        json.dump(pred, f, indent=0)
    print(f"is_chinese goldens: {len(pred)} names, {n_true} True")

    matchers = [
        util.match_name_one, util.match_name_two, util.match_name_three,
        util.match_name_four, util.match_name_five, util.match_name_six,
        util.match_name_seven,
    ]

    def battery(a: str, b: str):
        strict = [int(bool(f(a, b, False))) for f in matchers]
        loose = [int(bool(f(a, b, True))) for f in matchers]
        return strict, loose

    # CN-heavy pair sweep: cleaned romanized-CN names through drops,
    # initialisms, permutations, concatenations — the branches the real
    # predicate unlocks (matchers two/three/four/six/seven CJK paths).
    rng = random.Random(20260816)
    base = [
        "jing zhang", "jing xuan zhang", "wei wang li", "li hua",
        "zhang wei", "xiao ming wang", "chen jie", "liu yang",
        "wang xiao hong", "ouyang feng", "li wei chen", "hua li ming",
        "xu zhi hong", "wong kar wai", "kim jong il", "qian mu long",
    ]

    def variants(name: str):
        toks = name.split()
        out = {name}
        out.add(" ".join(reversed(toks)))
        for i in range(len(toks)):
            t2 = list(toks)
            t2[i] = t2[i][0]
            out.add(" ".join(t2))  # initialism
            if len(toks) > 2:
                out.add(" ".join(toks[:i] + toks[i + 1:]))  # drop
        if len(toks) >= 2:
            out.add(toks[0] + toks[1] + " " + " ".join(toks[2:]))  # concat
            out.add(" ".join(toks[:-1]) + " " + toks[-1][:-1])  # truncate
        # sorted: set iteration is hash-seed-dependent, and rng.choice
        # over an unstable order made re-mints spuriously differ
        return sorted(" ".join(v.split()) for v in out)

    pairs = set()
    for nm in base:
        vs = variants(nm)
        for a, b in itertools.product(vs, vs):
            if a != b:
                pairs.add((a, b))
    pairs = sorted(pairs)
    rng.shuffle(pairs)
    pairs = pairs[:160]
    # plus cross-name negatives
    for i in range(40):
        a = rng.choice(base)
        b = rng.choice(base)
        if a != b:
            pairs.append((rng.choice(variants(a)), rng.choice(variants(b))))
    cn_goldens = [[a, b, *battery(a, b)] for a, b in pairs]
    with open(os.path.join(TESTS, "goldens_name_battery_cn.json"), "w") as f:
        json.dump(cn_goldens, f, indent=0)
    n_hit = sum(1 for g in cn_goldens if any(g[2]) or any(g[3]))
    print(f"cn battery goldens: {len(cn_goldens)} pairs, {n_hit} with a match")

    # Cross-script goldens: reference tokenize_name (token.py:102-119,
    # unidecode call at :110 stubbed with the package fold) + the real
    # predicate, plus matcher vectors over TOKENIZED cross-script pairs
    # (same-name-different-script, initialed, and negative pairs).
    tok = mods["token"]
    translit_names = [
        [n, tok.tokenize_name(n), bool(ic.is_chinese_name(n))]
        for n in TRANSLIT_BATTERY
    ]
    cross_pairs = [
        ("Ivan Petrov", "Иван Петров"),
        ("И. Петров", "Иван Петров"),
        ("Иван Петров", "Петров Иван"),
        ("G. Papadopoulos", "Γιώργος Παπαδόπουλος"),
        ("Γιώργος Παπαδόπουλος", "Giorgos Papadopoulos"),
        ("Lukasz Golab", "Łukasz Gołąb"),
        ("Soren Kierkegaard", "Søren Kierkegaard"),
        ("Jurgen Strassmann", "Jürgen Straßmann"),
        ("Иван Петров", "Дмитрий Жуков"),
        ("Θεόδωρος Κολοκοτρώνης", "Γιώργος Παπαδόπουλος"),
        ("문재인", "munjaein"),
        ("김정은", "박찬욱"),
    ]
    translit_pairs = [
        [a, b, *battery(tok.tokenize_name(a), tok.tokenize_name(b))]
        for a, b in cross_pairs
    ]
    with open(os.path.join(TESTS, "goldens_name_translit.json"), "w") as f:
        json.dump({"names": translit_names, "pairs": translit_pairs}, f,
                  indent=0, ensure_ascii=False)
    n_match = sum(1 for g in translit_pairs if any(g[2]) or any(g[3]))
    print(f"translit goldens: {len(translit_names)} names, "
          f"{len(translit_pairs)} pairs ({n_match} with a match)")

    # Existing 400-pair sweep: how many vectors change under the real
    # predicate (informational — that test now pins the stub explicitly).
    old = json.load(open(os.path.join(TESTS, "goldens_name_battery.json")))
    changed = 0
    for a, b, strict, loose in old:
        s2, l2 = battery(a, b)
        if s2 != strict or l2 != loose:
            changed += 1
    print(f"400-pair sweep: {changed} vectors change under the real predicate")

    # name_match_pairs frozen-oracle truth (13 synthetic names, dispatch
    # over cleaned forms, pairs (i, (i+3)%13)) — match_name.py applies
    # the battery first-match over CLEANED names.
    synth = [
        "m ćwiok", "m. ćwiok", "JX Wang", "Dr. Bill O'Neil Jr", "j.x. wang",
        "Liz  van der Berg", "A. B. chuck III", "  ", "Tom-Hanks 3rd",
        "PAT smith", "ted", "jan k. nowak", "ÅSA Öberg",
    ]
    sys.path.insert(0, os.path.join(HERE, ".."))
    from whoiswho_spark.functions.name_match import clean_name

    strict_idx, loose_idx = [], []
    for i in range(13):
        a = clean_name(synth[i])
        b = clean_name(synth[(i + 3) % 13])
        s = any(f(a, b, False) for f in matchers)
        l = any(f(a, b, True) for f in matchers)
        if s:
            strict_idx.append(i)
        if l:
            loose_idx.append(i)
    print(f"name_match_pairs truth with real predicate: strict={strict_idx} loose={loose_idx}")

    # cluster_name_check frozen-oracle truth: reference dryRun over each
    # spec cluster's CLEANED member names (the flags frozen in
    # __spark_entry__._cluster_check_spec).
    from __spark_entry__ import _cluster_check_spec

    clusters, frozen = _cluster_check_spec()
    minted = []
    for c in clusters:
        names = {clean_name(n) for n in c}
        names.discard("")
        minted.append(bool(mods["match_name"].dryRun(set(names))))
    drift = [i for i, (a, b) in enumerate(zip(minted, frozen)) if a != b]
    print(f"cluster_name_check truth: {sum(minted)}/{len(minted)} consistent; "
          f"drift vs frozen flags: {drift or 'none'}")


if __name__ == "__main__":
    main()
