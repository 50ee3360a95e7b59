"""Behavioral contract constants.

These are *data* (regex pattern + stopword lists) reproduced verbatim from
the reference so that extracted/normalized text is byte-identical per url:

- punctuation pattern: /root/reference/whoiswho/dataset/data_process.py:19
- stopwords:           data_process.py:20-21
- stopwords_extend:    data_process.py:22-26
- stopwords_check:     data_process.py:27-31

Field-specific filter recipes (which lists apply, token length threshold,
set-vs-list dedup, the 'null' venue marker) follow
data_process.py:121-207 and semantic_features.py:110-135; see
``whoiswho_spark.functions.normalize``.
"""

# Reference punctuation class (data_process.py:19). The reference pattern is
# ``'[!“”"#$%&\'()*+,-./:;<=>?@[\\]^_`{|}~—～’]+'`` handed to
# ``re.sub(puncs, ' ', s)``. Its character class contains exactly the literal
# characters below (the ``,-.`` range covers , - . ; ``[`` is literal inside a
# Python class; ``\]`` is an escaped literal ``]``). Because Java regex parses
# a bare ``[`` inside a class as a nested class union, we rebuild the class
# programmatically with every ASCII punctuation char backslash-escaped —
# that form is valid and identical in BOTH Python ``re`` and Java
# ``java.util.regex`` (golden tests assert behavioral equality with the
# reference pattern).
PUNCT_CHARS = '!“”"#$%&\'()*+,-./:;<=>?@[]^_`{|}~—～’'


def _portable_punct_class() -> str:
    out = []
    for ch in PUNCT_CHARS:
        if ord(ch) < 128 and not ch.isalnum():
            out.append('\\' + ch)
        else:
            out.append(ch)
    return '[' + ''.join(out) + ']+'


# One pattern string, usable verbatim in Python re.sub AND Spark
# regexp_replace (Java regex).
PUNCS = _portable_punct_class()
# The reference's original Python-only spelling, kept for golden parity tests.
PUNCS_REFERENCE_PY = '[!“”"#$%&\'()*+,-./:;<=>?@[\\]^_`{|}~—～’]+'

WHITESPACE_COLLAPSE = r'\s{2,}'

STOPWORDS = [
    'at', 'based', 'in', 'of', 'for', 'on', 'and', 'to', 'an', 'using',
    'with', 'the', 'by', 'we', 'be', 'is', 'are', 'can',
]

STOPWORDS_EXTEND = [
    'university', 'univ', 'china', 'department', 'dept', 'laboratory', 'lab',
    'school', 'al', 'et', 'institute', 'inst', 'college', 'chinese',
    'beijing', 'journal', 'science', 'international', 'key', 'sciences',
    'research', 'academy', 'state', 'center',
]

STOPWORDS_CHECK = [
    'a', 'was', 'were', 'that', '2', 'key', '1', 'technology', '0',
    'sciences', 'as', 'from', 'r', '3', 'academy', 'this', 'nanjing',
    'shanghai', 'state', 's', 'research', 'p', 'results', 'peoples', '4',
    'which', '5', 'high', 'materials', 'study', 'control', 'method', 'group',
    'c', 'between', 'or', 'it', 'than', 'analysis', 'system', 'sci', 'two',
    '6', 'has', 'h', 'after', 'different', 'n', 'national', 'japan', 'have',
    'cell', 'time', 'zhejiang', 'used', 'data', 'these',
]

# Pair-score weights for the post-match stage
# (/root/reference/whoiswho/training/AutoTrainSND.py:50-52; duplicated in
# bond/training/generate_pair.py:82-88).
W_AUTHOR = 1.5
W_ORG = 1.0
W_VENUE = 1.0
W_TITLE = 0.33

# Post-match attach threshold (AutoTrainSND.py:194, 205).
POST_MATCH_THRESHOLD = 1.5

# RND top-1 assignment NIL thresholds (AutoTrainRND.py:321-324).
RND_NIL_THRESHOLD = 0.65

# Year sanitization window (data_process.py:330-337).
YEAR_MIN, YEAR_MAX = 1500, 2023

# --- name tokenization contract (reference name_match/tool/token.py:4-101) ---
# Behavioral-contract data, reproduced verbatim (like STOPWORDS/PUNCS above):
# the dict's quirks are part of the contract — compound "a: b" keys are
# unreachable by single-token lookup, and duplicate keys resolve to the
# LAST literal entry (fran→frances, jan→janice, pat→patricia, ted→edward),
# exactly as Python resolves the reference's dict literal.
NAME_STOPWORDS = {"jr", "iii", "dr", "mr", "junior"}

NICKNAME_DICT = {
    "al": "albert", "andy": "andrew", "tony": "anthony", "art": "arthur",
    "arty": "arthur", "bernie": "bernard", "bern": "bernard",
    "charlie": "charles", "chuck": "charles", "danny": "daniel",
    "dan": "daniel", "don": "donald", "ed": "edward", "eddie": "edward",
    "gene": "eugene", "freddy": "frederick", "fred": "frederick",
    "hank": "henry", "irv": "irving", "jimmy": "james", "jim": "james",
    "joe": "joseph", "jacky": "john", "jack": "john", "jeff": "jeffrey",
    "ken": "kenneth", "larry": "lawrence", "leo": "leonard",
    "matt": "matthew", "mike": "michael", "nate": "nathan", "nat": "nathan",
    "nick": "nicholas", "pete": "peter", "ray": "raymond",
    "dick": "richard", "rick": "richard",
    "bob: bobby: rob": "robert", "ron: ronny": "ronald", "russ": "russell",
    "sam: sammy": "samuel", "steve": "stephan", "stu": "stuart",
    "teddy": "theodore", "tom": "thomas", "thom": "thomas",
    "tommy": "thomas", "timmy": "timothy", "tim": "timothy",
    "walt": "walter", "wally": "walter", "bill": "william",
    "billy": "william", "will": "william", "willy": "william",
    "mandy": "amanda", "cathy": "catherine", "cath": "catherine",
    "chris": "christopher", "chrissy": "christine", "cindy: cynth": "cynthia",
    "debbie": "deborah", "deb": "deborah", "betty": "elizabeth",
    "beth": "elizabeth", "liz": "elizabeth", "bess": "elizabeth",
    "flo": "florence", "francie": "frances", "fran": "frances",
    "kate": "katherine", "kathy": "katherine", "jan": "janice",
    "nan": "nancy", "pam": "pamela", "pat": "patricia",
    "bobbie": "roberta", "sophie": "sophia", "sue": "susan",
    "suzie": "susan", "terry": "teresa", "val": "valerie",
    "ronnie": "veronica", "vonna": "yvonne", "peggy": "margaret",
    "ted": "edward", "sally": "sarah", "harry": "henry",
}


# Known-wrong romanized given-name variants → the regex that the correct
# matching should use instead of the plain prefix chain — behavioral
# contract data copied from the reference's curated table
# (/root/reference/whoiswho/character/match_name.py:5-18; entries were
# found by the reference authors in their train/valid/test splits).
NAMES_WRONG: tuple[tuple[tuple[str, ...], str], ...] = (
    (("takahiro", "toshiyuki", "takeshi", "toshiyuki", "tomohiro",
      "takamitsu", "takahisa", "takashi", "takahiko", "takayuki"),
     "ta(d|k)ashi"),
    (("akimasa", "akio", "akito"), "akira"),
    (("kentarok",), "kentaro"),
    (("xiaohuatony", "tonyxiaohua"), "xiaohua"),
    (("ulrich",), "ulrike"),
    (("naoto", "naomi"), "naoki"),
    (("junko",), "junichi"),
    (("isaku",), "isao"),
)
