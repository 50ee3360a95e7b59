"""Property-based tests (hypothesis) for the contract-critical kernels.

Kept deliberately small (few examples, batched per example) — each
example that touches Spark runs a job.
"""

import duckdb
import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from whoiswho_spark.functions.normalize import norm_text_col, ref_norm_text
from whoiswho_spark.functions.similarity import jaro_winkler

TEXT = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ 019 \t!\"#$%&'()*+,-./:;<=>?@[]^_`{|}~") + ["“", "”", "—", "～", "’", "é", "北"]
    ),
    max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=25))
def test_catalyst_norm_equals_reference_property(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = [r["n"] for r in df.select(norm_text_col(F.col("s")).alias("n")).collect()]
    assert got == [ref_norm_text(t) for t in texts]


@settings(max_examples=50, deadline=None)
@given(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=20),
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=20),
)
def test_jaro_winkler_matches_duckdb_property(a, b):
    want = duckdb.sql(
        "select jaro_winkler_similarity(?, ?)", params=[a, b]
    ).fetchone()[0]
    assert abs(jaro_winkler(a, b) - want) < 1e-9


@settings(max_examples=100, deadline=None)
@given(
    st.frozensets(st.integers(0, 30), max_size=15),
    st.frozensets(st.integers(0, 30), max_size=15),
)
def test_tanimoto_properties(a, b):
    def tan(p, q):
        c = [v for v in p if v in q]
        return len(c) / (len(p) + len(q) - len(c)) if (p or q) else 0.0

    t = tan(a, b)
    assert 0.0 <= t <= 1.0
    assert tan(a, b) == tan(b, a)
    if a and a == b:
        assert t == 1.0
    if a and b and not (a & b):
        assert t == 0.0


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=0,
        max_size=40,
    )
)
def test_cc_equals_union_find_property(spark, int_edges):
    from whoiswho_spark.operators.clustering import connected_components

    edges = [(f"v{a:02d}", f"v{b:02d}") for a, b in int_edges if a != b]
    nodes = sorted({x for e in edges for x in e})
    if not edges:
        return
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in nodes}
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = {r["url"]: r["cluster_id"] for r in connected_components(edf).collect()}
    assert got == want


@given(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=120, deadline=None)
def test_simhash_chunk_decomposition_reconstructs(spark, sh, n_chunks):
    """The chunk spans are a PARTITION of the 64 bits: shifting each
    chunk back to its offset and OR-ing reconstructs the hash exactly —
    the property the pigeonhole bucket join's correctness rests on."""
    from whoiswho_spark.operators.dedup import _simhash_chunk_cols

    base, extra = divmod(64, n_chunks)
    u = sh & ((1 << 64) - 1)  # unsigned view
    acc, off = 0, 0
    for c in range(n_chunks):
        w = base + (1 if c < extra else 0)
        chunk = (u >> off) & ((1 << w) - 1)
        acc |= chunk << off
        off += w
    assert off == 64 and acc == u
    # and the Catalyst column list matches the widths (pure metadata)
    import pyspark.sql.functions as F

    cols = _simhash_chunk_cols(F.lit(sh), n_chunks)
    assert len(cols) == n_chunks


def test_cjk_pinyin_table_wellformed():
    """Contract-data sanity: every key is a single Han character, every
    value a legal toneless pinyin syllable (NORMAL style, ü→v)."""
    import re

    from whoiswho_spark.functions.pinyin import CHAR_TO_PINYIN

    syllable = re.compile(
        r"^(?:[bpmfdtnlgkhjqxrzcsywv]|zh|ch|sh)?[aeiouv]{1,3}(?:n|ng|r)?$"
    )
    assert len(CHAR_TO_PINYIN) > 500
    for ch, py in CHAR_TO_PINYIN.items():
        assert len(ch) == 1 and "一" <= ch <= "鿿", ch
        assert syllable.match(py), (ch, py)


# --- repetition / span-dedup kernels ------------------------------------------

DOC_TOKENS = st.lists(
    st.sampled_from(["aa", "b", "ccc", "dd", "e"]), min_size=0, max_size=30
)


@settings(max_examples=6, deadline=None)
@given(st.lists(DOC_TOKENS, min_size=1, max_size=8), st.integers(2, 4))
def test_fused_gopher_equals_catalyst_property(spark, docs_tokens, n):
    """The one-pass Arrow kernel and the explode+window formulation are
    the same function — on arbitrary corpora, any n (tiny vocab forces
    heavy repetition, short docs hit the < n edge)."""
    from whoiswho_spark.functions.repetition import (
        gopher_repetition_stats,
        gopher_repetition_stats_fused,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs_tokens)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    kw = dict(top_ns=(n,), dup_ns=(n,))
    fused = {r.doc_id: r.asDict() for r in gopher_repetition_stats_fused(df, **kw).collect()}
    ref = {r.doc_id: r.asDict() for r in gopher_repetition_stats(df, **kw).collect()}
    assert fused == ref


@settings(max_examples=6, deadline=None)
@given(st.lists(DOC_TOKENS, min_size=2, max_size=6))
def test_crossdoc_coverage_bounds_property(spark, docs_tokens):
    """Detector invariants on arbitrary corpora: coverage in [0,1],
    dup_tokens <= n_tokens, and removal never keeps more than the
    detector's complement allows (kept >= n_tokens - dup_tokens: owners
    keep what non-owners lose)."""
    from whoiswho_spark.operators.span_dedup import crossdoc_duplicate_spans
    from whoiswho_spark.operators.span_dedup_remove import remove_duplicated_spans

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs_tokens)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    det = {r.doc_id: r for r in crossdoc_duplicate_spans(df, n=3).collect()}
    rem = {r.doc_id: r for r in remove_duplicated_spans(df, n=3).collect()}
    for k, r in det.items():
        assert 0.0 <= r.dup_token_frac <= 1.0, r
        assert 0 <= r.dup_tokens <= r.n_tokens, r
        assert rem[k].kept_tokens >= r.n_tokens - r.dup_tokens, (r, rem[k])
        assert rem[k].kept_tokens + rem[k].removed_tokens == r.n_tokens
