"""Reference-parity operators: Word2Vec embeddings, DBSCAN-per-block,
weighted F1, stacking features, hand features, name functions, streaming."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from whoiswho_spark.functions.hand_features import (
    build_idf_table,
    coauthor_tfidf_features,
    other_features,
)
from whoiswho_spark.functions.names import (
    cleaning_name,
    get_author_index,
    unify_name_order,
)
from whoiswho_spark.operators.clustering_dbscan import (
    cluster_blocks_dbscan,
    dbscan_precomputed,
)
from whoiswho_spark.operators.embeddings import doc_embeddings, train_word2vec
from whoiswho_spark.operators.rnd_eval import stacking_features, weighted_f1


# --- names ----------------------------------------------------------------

def test_unify_name_order():
    # reference behavior (utils.py:163-178)
    assert unify_name_order("jing_zhang") == ("jingzhang", "zhangjing")
    assert unify_name_order("li_ming_hua") == ("liminghua", "hualiming")


def test_cleaning_name_ascii_fold():
    assert cleaning_name("José-María O'Brien") == "jose maria o brien"
    assert cleaning_name("ABC123def") == "abc def"


def test_match_name_names_wrong_table():
    """Curated wrong-name substitutions (ref character/match_name.py:5-18,
    79-85). Goldens MINTED BY RUNNING THE REFERENCE match_name with a
    pinyin stub (non-CJK inputs never reach it); the plain prefix chain
    would reject every positive here except the last two controls."""
    from whoiswho_spark.functions.names import match_name

    golden = [
        ("Takashi Yamada", "tadashi_yamada", True),
        ("Takahiro Yamada", "tadashi_yamada", True),
        ("Naoto Suzuki", "naoki_suzuki", True),
        ("Junko Tanaka", "junichi_tanaka", True),
        ("Isaku Sato", "isao_sato", True),
        ("Kentarok Ito", "kentaro_ito", True),
        ("Ulrich Meyer", "ulrike_meyer", True),
        ("Akimasa Kato", "akira_kato", True),
        ("Naomi Suzuki", "naoki_suzuki", True),
        ("Naoko Suzuki", "naoki_suzuki", False),  # not in the table
        ("Jing Zhang", "jing_zhang", True),        # unaffected plain path
        ("Z J", "jing_zhang", True),
        ("Tomohiro Akira Tanaka", "takamitsu_tanaka", False),
    ]
    for name, target, want in golden:
        assert match_name(name, target) is want, (name, target)


def test_match_name_cjk_branch():
    """CJK inputs route to the pinyin branch (ref match_name.py:38-44):
    romanized concat (vendored table) must equal last_name+first_name;
    out-of-table characters can only produce a conservative non-match.
    The reference-minted battery lives in tests/test_cjk_pinyin.py."""
    from whoiswho_spark.functions.names import match_name

    assert match_name("\u5f20\u6676", "jing_zhang") is True  # \u5f20\u6676
    assert match_name("\u5f20\u6676", "wei_wang") is False
    assert match_name("\u4e7e\u73ca", "shan_qian") is False  # \u4e7e not in table
    # latin names with stray CJK punctuation are NOT routed to the branch
    assert match_name("Jing Zhang", "jing_zhang") is True


def test_author_matches_block():
    """Coauthor-vs-target split (data_process.py:146-167): alpha-only
    lowercase concat of the raw author name equals the block name or its
    token-reversed form; punctuation/spacing/case must not matter."""
    from whoiswho_spark.functions.names import author_matches_block

    assert author_matches_block("Jing Zhang", "jingzhang", "zhangjing")
    assert author_matches_block("ZHANG, Jing", "jingzhang", "zhangjing")
    assert author_matches_block("Ming-Hua Li", "minghuali", "liminghua")
    assert not author_matches_block("Jing Zhao", "jingzhang", "zhangjing")
    assert not author_matches_block("", "jingzhang", "zhangjing")
    assert not author_matches_block(None, "jingzhang", "zhangjing")
    # digits are dropped by the alpha-only fold (isalpha filter)
    assert author_matches_block("Jing2 Zhang", "jingzhang", "zhangjing")


def test_match_name():
    from whoiswho_spark.functions.names import match_name

    assert match_name("Zhang Jing", "jing_zhang")        # last-first order
    assert match_name("Jing Zhang", "jing_zhang")        # first-last order
    assert match_name("J. Zhang", "jing_zhang")          # abbreviated first
    assert match_name("Zhang JW", "jingwei_zhang")       # 2-letter CN abbrev
    assert not match_name("Wang Wei", "jing_zhang")
    assert not match_name("Zhang", "jing_zhang")         # single token


def test_get_author_index_basic():
    # unique containment hit → stage 1
    assert get_author_index("jing zhang", ["wei wang", "jing zhang", "li hua"]) == 1
    # initial-style disambiguation
    assert get_author_index("j zhang", ["zhang jing", "wang wei"]) == 0


# --- hand features ----------------------------------------------------------

def test_other_features_zero_exit():
    assert other_features("", ["x"], {}, 1.0) == [0.0] * 8
    assert other_features("x", [], {}, 1.0) == [0.0] * 8


def test_other_features_identical_strings():
    f = other_features("deep learning", ["deep learning"], {}, 2.0)
    # jaro max/mean = 1, card max/mean = 1; idf overlap both sides = 2 tokens × 2.0
    assert f[0] == 1.0 and f[1] == 1.0 and f[2] == 1.0 and f[3] == 1.0
    assert f[4] == 4.0 and f[6] == 4.0
    assert abs(f[5] - 1.0) < 1e-6 and abs(f[7] - 1.0) < 1e-6


def test_coauthor_tfidf_features():
    f = coauthor_tfidf_features(
        ["alice", "bob"], ["bob", "bob", "carol"], {"bob": 5.0, "carol": 1.0}, 1.0
    )
    # matched = {bob}: tfidf 5.0; paper total = alice(1)+bob(5)=6
    assert f[0] == 5.0
    assert abs(f[1] - 5.0 / 6.0) < 1e-5
    # counted = 5*2 = 10; candidate total = 5*2 + 1 = 11
    assert f[2] == 10.0
    assert abs(f[3] - 10.0 / 11.0) < 1e-5


def test_build_idf_table(spark):
    df = spark.createDataFrame(
        [(["a", "b"],), (["a"],), (["a", "c"],)], "tokens array<string>"
    )
    got = {r["token"]: r["idf"] for r in build_idf_table(df).collect()}
    assert got["a"] == 0.0  # in all 3 docs: ln(3/3)
    assert abs(got["b"] - round(np.log(3.0), 6)) < 1e-9


# --- textstats ----------------------------------------------------------------

def test_lang_id_and_quality(spark):
    from whoiswho_spark.functions.textstats import (
        lang_id_col,
        quality_score_col,
        stopword_ratio_col,
        token_count_col,
    )

    df = spark.createDataFrame(
        [
            ("the cat is on the mat and we can see it",),   # en-heavy
            ("der hund ist nicht mit der katze und das",),  # de-heavy
            ("xyzzy plugh quux foobar",),                   # no markers
        ],
        "text string",
    )
    got = df.select(
        lang_id_col(F.col("text")).alias("lang"),
        F.round(stopword_ratio_col(F.col("text")), 6).alias("ratio"),
        token_count_col(F.col("text")).alias("n"),
        quality_score_col(F.col("text")).alias("q"),
    ).collect()
    assert got[0]["lang"] == "en" and got[0]["ratio"] > 0.5
    assert got[1]["lang"] == "de"
    assert got[2]["lang"] == "und" and got[2]["ratio"] == 0.0
    assert got[0]["n"] == 11
    assert 0.0 <= got[2]["q"] <= 1.0


# --- DBSCAN ------------------------------------------------------------------

def test_dbscan_matches_two_blobs():
    # two tight clusters + one outlier, precomputed distances
    pts = np.array([[0.0], [0.01], [0.02], [0.03], [5.0], [5.01], [5.02], [5.03], [99.0]])
    D = np.abs(pts - pts.T)
    labels = dbscan_precomputed(D, eps=0.1, min_samples=4)
    assert labels[8] == -1
    assert len({labels[0], labels[4]}) == 2
    assert all(labels[i] == labels[0] for i in range(4))
    assert all(labels[i] == labels[4] for i in range(4, 8))


def test_cluster_blocks_dbscan(spark):
    rng = np.random.RandomState(1)
    rows = []
    for b in range(2):
        for ent in range(2):
            center = rng.randn(8)
            center /= np.linalg.norm(center)
            for v in range(5):
                e = center + 0.01 * rng.randn(8)
                rows.append((f"blk{b}", f"u{b}_{ent}_{v}", [float(x) for x in e]))
    df = spark.createDataFrame(rows, "block_key string, url string, embedding array<double>")
    got = cluster_blocks_dbscan(df, eps=0.2, min_samples=4).collect()
    by_key = {}
    for r in got:
        by_key.setdefault((r["block_key"], r["label"]), set()).add(r["url"])
    # each (block, entity) grouping intact, labels ≥ 0
    clusters = [v for k, v in by_key.items() if k[1] >= 0]
    assert len(clusters) == 4
    assert all(len(c) == 5 for c in clusters)


# --- Word2Vec ---------------------------------------------------------------

def test_word2vec_doc_embeddings(spark):
    rows = [(i, (["spark", "query", "engine"] if i % 2 else ["paper", "author", "venue"]) * 3)
            for i in range(40)]
    rows.append((99, ["zzznevermind"]))  # below min_count → outlier
    df = spark.createDataFrame(rows, "doc_id bigint, tokens array<string>")
    model = train_word2vec(df, vector_size=16, min_count=5)
    emb = doc_embeddings(df, model)
    got = {r["doc_id"]: r for r in emb.collect()}
    assert len(got) == 41
    assert got[99]["is_outlier"] is True
    assert all(v == 0.0 for v in got[99]["embedding"])
    assert got[0]["is_outlier"] is False
    assert len(got[0]["embedding"]) == 16
    # identical token bags → identical mean vector
    assert got[0]["embedding"] == got[2]["embedding"]


# --- RND eval ----------------------------------------------------------------

def _ref_weighted_f1(truth: dict, pred: dict) -> float:
    # RNDeval.py:13-44 oracle
    result, total = [], 0
    for aid, papers in truth.items():
        pp = set(pred.get(aid, []))
        gt = set(papers)
        inter = len(gt & pp)
        precision = round(inter / max(len(pp), 1), 6)
        recall = round(inter / max(len(gt), 1), 6)
        result.append((precision, recall, len(gt)))
        total += len(gt)
    wp = sum(p * round(n / total, 6) for p, _, n in result)
    wr = sum(r * round(n / total, 6) for _, r, n in result)
    return 2 * wp * wr / (wp + wr) if wp + wr > 0 else 0.0


def test_weighted_f1_matches_reference(spark):
    truth = {"a1": ["p1", "p2", "p3"], "a2": ["p4"], "a3": ["p5", "p6"]}
    pred = {"a1": ["p1", "p2", "p9"], "a2": [], "a3": ["p5", "p6", "p7", "p8"]}
    tdf = spark.createDataFrame(
        [(a, p) for a, ps in truth.items() for p in ps], "aid string, pid string"
    )
    pdf = spark.createDataFrame(
        [(a, p) for a, ps in pred.items() for p in ps], "aid string, pid string"
    )
    got = weighted_f1(tdf, pdf)
    want = _ref_weighted_f1(truth, pred)
    assert abs(got - want) < 1e-9


def test_stacking_features(spark):
    scored = spark.createDataFrame(
        [("p1", "c1", 0.9), ("p1", "c2", 0.5), ("p1", "c3", 0.1), ("p2", "c4", 0.7)],
        "pid string, aid string, score double",
    )
    got = {(r["pid"], r["aid"]): r for r in stacking_features(scored).collect()}
    r = got[("p1", "c1")]
    # max=.9 2nd=.5 mean=.5 min=.1 → gap_mean=(.9-.5)/(1e-8+.9-.5)≈1, gap_range=.5
    assert r["max_score"] == 0.9
    assert abs(r["gap_over_mean"] - 1.0) < 1e-4
    assert abs(r["gap_over_range"] - 0.5) < 1e-4
    single = got[("p2", "c4")]
    assert single["mean_score"] == 0.7 and single["gap_over_mean"] == 0.0


# --- meta-path walks ----------------------------------------------------------

def test_meta_path_walks(spark):
    from whoiswho_spark.operators.walks import meta_path_walks

    # two disconnected components: walks never cross
    edges = spark.createDataFrame(
        [("p1", "ta"), ("p2", "ta"), ("p3", "tb"), ("p4", "tb")],
        "pid string, token string",
    )
    walks = meta_path_walks(edges, n_walks=2, walk_len=4).collect()
    assert len(walks) == 8  # 4 papers × 2 walks
    comp = {"p1": {"p1", "p2"}, "p2": {"p1", "p2"}, "p3": {"p3", "p4"}, "p4": {"p3", "p4"}}
    for r in walks:
        assert len(r["path"]) == 4
        assert set(r["path"]) <= comp[r["start"]]
        assert r["path"][0] == r["start"]
    # deterministic across invocations
    again = meta_path_walks(edges, n_walks=2, walk_len=4).collect()
    assert sorted(map(str, walks)) == sorted(map(str, again))
    # different walk ids explore independently: with 2 neighbors per token
    # not every step can pick the same next node for all walks
    paths = {r["walk_id"]: tuple(r["path"]) for r in walks}
    assert len(set(paths.values())) > 2


# --- streaming ----------------------------------------------------------------

def test_streaming_hourly_matches_batch(spark, tmp_path):
    import pandas as pd

    from whoiswho_spark.streaming.events import (
        hourly_counts,
        read_events_stream,
        run_once_to_memory,
    )

    rows = [
        (i, (pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=17 * i)).to_pydatetime(),
         i % 3, "click" if i % 2 else "view", float(i), "{}")
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "events")
    df.repartition(4).write.mode("overwrite").parquet(path)

    stream = read_events_stream(spark, path)
    assert stream.isStreaming
    got = run_once_to_memory(spark, hourly_counts(stream), "t_hourly")
    batch = (
        df.groupBy(
            F.date_format(F.date_trunc("HOUR", "ts"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
    )
    g = {(r["hour"], r["event_type"]): (r["n_events"], r["total_value"]) for r in got.collect()}
    w = {(r["hour"], r["event_type"]): (r["n_events"], r["total_value"]) for r in batch.collect()}
    assert g == w


def test_unify_name_order_single_token():
    assert unify_name_order("prince") == ("prince", "prince")


def test_meta_path_walks_dead_end_keeps_prefix(spark):
    """A start node with no outgoing edge freezes with its length-1 path
    instead of vanishing from the output (docstring contract)."""
    from whoiswho_spark.operators.walks import meta_path_walks

    edges = spark.createDataFrame(
        [("p1", "ta"), ("p2", "ta")], "pid string, token string"
    )
    starts = spark.createDataFrame([("p1",), ("p2",), ("p_lone",)], "pid string")
    walks = meta_path_walks(edges, n_walks=2, walk_len=4, starts=starts).collect()
    assert len(walks) == 6  # 3 starts × 2 walks — nothing dropped
    by_start = {}
    for r in walks:
        by_start.setdefault(r["start"], []).append(r["path"])
    assert all(p == ["p_lone"] for p in by_start["p_lone"])
    assert all(len(p) == 4 for s in ("p1", "p2") for p in by_start[s])
