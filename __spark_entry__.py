"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an operator from SURVEY.md §2 (or a
training-data-pipeline op) implemented through whoiswho_spark, with a
matching DuckDB ``oracle_sql()`` over the same parquet views.

Engine-portability rules used throughout (so value hashes match):
- hashing: 60-bit md5 prefix — Spark ``conv(substr(md5(x),1,15),16,10)``
  == DuckDB ``('0x' || substring(md5(x),1,15))::BIGINT`` (tested in
  tests/test_blocking_pairs.py).
- tokenization: split on single space, drop empties.
- floats rounded (4-6 dp) in BOTH engines; counts cast to BIGINT.
- every computed column aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# DuckDB twin of whoiswho_spark.operators.blocking.hash60
def _dd_hash60(expr: str, salt: str) -> str:
    return f"cast(concat('0x', substring(md5({expr} || ':{salt}'), 1, 15)) as bigint)"


_DD_TOKS = "list_filter(string_split(text, ' '), _tk -> len(_tk) > 0)"


# ---------------------------------------------------------------------------
# entry — flagship: the ER mini-pipeline over the documents table
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: block documents by (source, title-MinHash band), generate
    within-block candidate pairs, score token overlap, threshold, and
    cluster with large-star/small-star connected components."""
    from whoiswho_spark.functions.similarity import tanimoto_col
    from whoiswho_spark.operators.blocking import minhash_signature_cols
    from whoiswho_spark.operators.clustering import connected_components
    from whoiswho_spark.operators.dedup import tokens_col

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    base = docs.select(
        "doc_id",
        "source",
        F.array_distinct(tokens_col(F.col("text"))).alias("toks"),
    )
    sig = minhash_signature_cols(F.col("toks"), 2)
    blocks = base.select(
        F.col("doc_id").cast("string").alias("url"),
        F.concat_ws(
            "|", F.col("source"), F.md5(F.concat_ws("_", *[s.cast("string") for s in sig]))
        ).alias("block_key"),
        F.col("toks"),
    )
    a = blocks.select("block_key", F.col("url").alias("url_a"), F.col("toks").alias("toks_a"))
    b = blocks.select("block_key", F.col("url").alias("url_b"), F.col("toks").alias("toks_b"))
    pairs = (
        a.join(b, "block_key")
        .where(F.col("url_a") < F.col("url_b"))
        .select(
            "url_a", "url_b",
            tanimoto_col(F.col("toks_a"), F.col("toks_b")).alias("score"),
        )
    )
    edges = pairs.where(F.col("score") >= 0.5).select(
        F.col("url_a").alias("src"), F.col("url_b").alias("dst")
    )
    return connected_components(edges, vertices=blocks.select("url").distinct())


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------


def _q_block_stats(spark, sf):
    """Blocking group-by (SURVEY §2.3): block census over documents."""
    return (
        _t(spark, sf, "documents")
        .groupBy("source", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


def _q_candidate_pair_counts(spark, sf):
    """Quadratic-blowup census: C(n,2) per block (the pre-join planning
    stat that drives salting)."""
    return (
        _t(spark, sf, "documents")
        .groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .select(
            "source",
            "n_docs",
            (F.col("n_docs") * (F.col("n_docs") - 1) / 2).cast("bigint").alias("n_pairs"),
        )
    )


def _q_minhash_signatures(spark, sf):
    """Deterministic MinHash signatures (SURVEY §4 custom-work #2)."""
    from whoiswho_spark.operators.dedup import minhash_table

    return minhash_table(_t(spark, sf, "documents"), num_hashes=4)


def _q_lsh_band_buckets(spark, sf):
    """LSH banding over minhash signatures → (doc, band, bucket)."""
    from whoiswho_spark.operators.dedup import minhash_band_buckets

    return minhash_band_buckets(_t(spark, sf, "documents"))


def _q_minhash_dup_candidates(spark, sf):
    """shingle→minhash→band→bucket-join candidate pairs."""
    from whoiswho_spark.operators.dedup import minhash_dup_pairs

    return minhash_dup_pairs(_t(spark, sf, "documents"))


def _q_exact_dedup(spark, sf):
    from whoiswho_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf, "documents"))


def _q_ngram_jaccard_pairs(spark, sf):
    """Within-block token-set Jaccard ≥ 0.5 (AutoTrainSND.py:24-32
    tanimoto semantics)."""
    from whoiswho_spark.operators.dedup import ngram_jaccard_pairs_prefix

    # PPJoin-style prefix-filtered plan: candidates meet on (block, RARE
    # token) instead of the quadratic block self-join — exact, same
    # oracle (see ngram_jaccard_pairs_prefix docstring)
    return ngram_jaccard_pairs_prefix(_t(spark, sf, "documents"), block_col="source")


def _q_embedding_neardup(spark, sf):
    """Embedding-cosine near-dup pairs (SBERT-style dot products); τ=0.35
    sits in the upper tail of this testdata's cosine distribution.
    Sharded blocked-matmul plan — no driver-side corpus collect, per-task
    memory = 2·|corpus|/n_shards (result-identical to the join plan,
    tests/test_dedup_ann_textstats.py)."""
    from whoiswho_spark.operators.ann import sharded_neardup_pairs

    return sharded_neardup_pairs(
        _t(spark, sf, "embeddings"), threshold=0.35, n_shards=8
    )


def _q_ann_topk(spark, sf):
    """Exact cosine top-5 for the first 10 vectors — corpus hash-sharded
    once, per-shard BLAS partial top-k, global window merge. No
    driver-side collect (ANN exact baseline)."""
    from whoiswho_spark.operators.ann import sharded_topk

    vecs = _t(spark, sf, "embeddings")
    return sharded_topk(vecs.where(F.col("vec_id") < 10), vecs, k=5, n_shards=8)


def _q_top1_threshold(spark, sf):
    """RND top-1-with-NIL-threshold (AutoTrainRND.py:52-71) retargeted:
    best order per customer, kept if totalprice ≥ 100."""
    from whoiswho_spark.operators.rnd import top1_assign

    return top1_assign(
        _t(spark, sf, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
        item_col="o_custkey",
        cand_col="o_orderkey",
        score_col="o_totalprice",
        threshold=100.0,
    )


def _q_ordered_split(spark, sf):
    """Year-ordered ntile split (data_process.py:323-368)."""
    from whoiswho_spark.operators.rnd import ordered_split

    return ordered_split(
        _t(spark, sf, "orders").select("o_custkey", "o_orderkey", "o_orderdate"),
        part_col="o_custkey",
        order_col="o_orderdate",
        tiebreak_col="o_orderkey",
        n_buckets=5,
    ).select("o_custkey", "o_orderkey", "bucket")


def _q_kfold(spark, sf):
    """k-fold hashing (data_process.py:535-576) — fold census."""
    from whoiswho_spark.operators.rnd import kfold_col

    return (
        _t(spark, sf, "customer")
        .select(kfold_col(F.col("c_custkey"), 5).alias("fold"))
        .groupBy("fold")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def _q_deterministic_sample(spark, sf):
    """Per-key capped hash-order sampling (negative sampling / paper caps)."""
    from whoiswho_spark.operators.rnd import deterministic_sample

    return deterministic_sample(
        _t(spark, sf, "orders").select("o_custkey", "o_orderkey"),
        part_col="o_custkey",
        id_col="o_orderkey",
        n_per_part=3,
    )


def _q_pairwise_f1(spark, sf):
    """The reference pairwise P/R/F1 (SNDeval.py:47-70) as pure
    aggregations: truth = embeddings.label, pred = hash-perturbed label,
    one global block."""
    from whoiswho_spark.operators.blocking import hash60
    from whoiswho_spark.operators.evaluation import pairwise_scores_per_block

    e = _t(spark, sf, "embeddings").select(
        F.lit("all").alias("block_key"),
        F.col("vec_id").cast("string").alias("url"),
        F.col("label").alias("truth"),
        F.when(
            F.pmod(hash60(F.col("vec_id").cast("string"), "perturb"), F.lit(10)) < 1,
            F.pmod(F.col("label") + 1, F.lit(10)),
        )
        .otherwise(F.col("label"))
        .alias("pred"),
    )
    s = pairwise_scores_per_block(e)
    return s.select(
        "block_key",
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        F.round("f1", 6).alias("f1"),
    )


def _q_lineitem_pricing_summary(spark, sf):
    """TPC-H Q1-shape aggregation (scan→filter→agg pushdown check)."""
    li = _t(spark, sf, "lineitem")
    dec = lambda c: F.round(F.col(c), 4).cast("decimal(18,4)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.count("*").cast("bigint").alias("count_order"),
        )
    )


def _q_revenue_by_nation(spark, sf):
    """3-way join (orders ⋈ customer ⋈ broadcast nation) + agg."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice"), 4).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
            F.count("*").cast("bigint").alias("n_orders"),
        )
    )


def _q_window_topk(spark, sf):
    """Top-3 orders per customer (window ranking, SURVEY §2.6)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        _t(spark, sf, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("price"),
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") <= 3)
    )


def _q_token_stats(spark, sf):
    """Token counting (whitespace + BPE-ish regex proxy)."""
    from whoiswho_spark.functions.textstats import (
        bpeish_token_count_col,
        token_count_col,
    )

    return _t(spark, sf, "documents").select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_tokens"),
        bpeish_token_count_col(F.col("text")).alias("n_pieces"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
    )


def _q_stopword_ratio(spark, sf):
    """Language-marker ratio (the language-ID heuristic's core signal)."""
    from whoiswho_spark.functions.textstats import stopword_ratio_col

    return _t(spark, sf, "documents").select(
        "doc_id", F.round(stopword_ratio_col(F.col("text")), 6).alias("en_ratio")
    )


def _q_quality_score(spark, sf):
    from whoiswho_spark.functions.textstats import quality_score_col

    return _t(spark, sf, "documents").select(
        "doc_id", quality_score_col(F.col("text")).alias("quality")
    )


def _q_fingerprint(spark, sf):
    from whoiswho_spark.functions.textstats import fingerprint_col

    return _t(spark, sf, "documents").select(
        "doc_id", fingerprint_col(F.col("text")).alias("fingerprint")
    )


def _q_events_hourly(spark, sf):
    """Windowed (tumbling-hour) event aggregation — the batch twin of the
    streaming path (SURVEY §2.11: reference is batch-only)."""
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("HOUR", F.col("ts")), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.round(F.col("value"), 4).cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
        )
    )


def _q_simhash_pairs(spark, sf):
    """SimHash near-dups via the ADAPTIVE plan: pigeonhole chunk-bucket
    join (candidates meet on (block, chunk_idx, chunk_value)) whenever
    the chunks are wide enough to prune; at this query's loose k=16 the
    filter is provably near-vacuous (17 4-bit chunks), so the plan
    keeps the block-bounded join — there is no exact sub-quadratic plan
    in that regime. Chunk-join ≡ block-join equivalence is pytest-gated
    across both regimes; bit-parity vs the independent DuckDB simhash
    oracle."""
    from whoiswho_spark.operators.dedup import simhash_dup_pairs_bucketed

    return simhash_dup_pairs_bucketed(
        _t(spark, sf, "documents"), block_col="source", max_hamming=16
    )


def _q_media_meta(spark, sf):
    """Multimodal metadata extraction: synthetic PNG/JPEG/GIF binaries
    (dimensions derived from doc columns, built in pure Catalyst) →
    mapInPandas REAL header decode (IHDR / SOF scan / logical screen
    descriptor). The oracle recomputes the expected dimensions from the
    same doc columns — a true end-to-end check of the binary round-trip."""
    from whoiswho_spark.operators.multimodal import extract_media_meta

    return extract_media_meta(_media_payloads(spark, sf)).select(
        "doc_id", "n_bytes", "media_type", "width", "height"
    )


def _media_payloads(spark, sf):
    """Shared synthetic-binary builder for the multimodal queries
    (payload dims derived deterministically from doc columns)."""
    from whoiswho_spark.operators.multimodal import synthetic_media_payload_col

    return _t(spark, sf, "documents").select(
        "doc_id",
        synthetic_media_payload_col(
            F.pmod(F.col("doc_id"), F.lit(3)),
            F.lit(1) + F.pmod(F.col("n_chars"), F.lit(2048)),
            F.lit(1) + F.pmod(F.col("doc_id"), F.lit(1024)),
        ).alias("payload"),
    )


def _q_media_byte_features(spark, sf):
    """Multimodal content feature-extract: byte entropy (log2) +
    printable ratio via a vectorized numpy mapInPandas kernel. The
    oracle re-derives both from hex-pair exploding in DuckDB (hex pairs
    are a bijection of the byte stream)."""
    from whoiswho_spark.operators.multimodal import media_byte_features

    return media_byte_features(_media_payloads(spark, sf))


def _q_media_frames(spark, sf):
    """Frame sampling over opaque binaries — fixed-size windows at
    stride offsets, pure Catalyst (hex once, posexplode bounded offsets,
    substring per frame). The video/audio frame-extraction plumbing at
    its scale shape: no Python, no full-payload replication."""
    from whoiswho_spark.operators.multimodal import sample_frames

    return sample_frames(
        _media_payloads(spark, sf), frame_size=8, stride=16, max_frames=4
    )


def _q_media_resize_plan(spark, sf):
    """Metadata-level resize planning: REAL header decode → aspect-
    preserving target dims capped at 512 (floor(x*scale+0.5) integer
    math, portable across engines). The stage before pixel decode in a
    media pipeline."""
    from whoiswho_spark.operators.multimodal import extract_media_meta, resize_plan

    return resize_plan(extract_media_meta(_media_payloads(spark, sf)), max_side=512)


def _q_lsh_ann_topk(spark, sf):
    """LSH-bucketed ANN (scale path; approximate — rows-only check)."""
    from whoiswho_spark.operators.ann import lsh_bucketed_topk

    vecs = _t(spark, sf, "embeddings")
    return lsh_bucketed_topk(
        vecs.where(F.col("vec_id") < 10), vecs, dim=64, k=5, n_planes=4
    )


def _q_lsh_neardup(spark, sf):
    """The 100 TB embedding-near-dup composition (ann.
    lsh_sharded_neardup_pairs): LSH sign-bucket first, blocked
    shard-pair matmul WITHIN each bucket — no driver collect, no
    per-pair rows; result-identical to the LSH join plan
    (pytest-gated) and oracle-checked against the DuckDB sign-bucket
    pair join."""
    from whoiswho_spark.operators.ann import lsh_sharded_neardup_pairs

    return lsh_sharded_neardup_pairs(
        _t(spark, sf, "embeddings"),
        threshold=0.35,
        n_planes=4,
        dim=64,
        n_shards=3,
    )


def _q_lang_id(spark, sf):
    """Heuristic language ID over marker-word ratios."""
    from whoiswho_spark.functions.textstats import lang_id_col

    return _t(spark, sf, "documents").select(
        "doc_id", lang_id_col(F.col("text")).alias("lang_pred")
    )


def _q_idf_table(spark, sf):
    """IDF dictionary builder (the analog of the reference's precomputed
    idf JSONs, feature_process.py:34-43)."""
    from whoiswho_spark.functions.hand_features import build_idf_table
    from whoiswho_spark.operators.dedup import tokens_col

    docs = _t(spark, sf, "documents").select(tokens_col(F.col("text")).alias("tokens"))
    return build_idf_table(docs)


def _q_stacking_features(spark, sf):
    """lv2 stacking score features (ClassficationModels.py:284-295) over
    per-customer order scores."""
    from whoiswho_spark.operators.rnd_eval import stacking_features

    scored = _t(spark, sf, "orders").select(
        F.col("o_custkey").alias("pid"),
        F.col("o_orderkey").alias("aid"),
        F.round("o_totalprice", 2).alias("score"),
    )
    out = stacking_features(scored)
    return out.select(
        "pid",
        "aid",
        "score",
        F.round("max_score", 5).alias("max_score"),
        F.round("mean_score", 5).alias("mean_score"),
        "gap_over_mean",
        "gap_over_range",
    )


def _q_rnd_author_prf(spark, sf):
    """Per-author precision/recall components of the RND weighted F1
    (RNDeval.py:13-25): truth = customer's orders; pred = hash-perturbed
    assignment (10% of orders assigned to the next customer)."""
    o = _t(spark, sf, "orders").select(
        F.col("o_custkey").alias("aid"), F.col("o_orderkey").alias("pid")
    )
    from whoiswho_spark.operators.blocking import hash60

    pred = o.select(
        F.when(
            F.pmod(hash60(F.col("pid").cast("string"), "rndperturb"), F.lit(10)) < 1,
            F.col("aid") + 1,
        )
        .otherwise(F.col("aid"))
        .alias("aid"),
        "pid",
    )
    gt = o.groupBy("aid").agg(F.count("*").alias("n_gt"))
    pr = pred.groupBy("aid").agg(F.count("*").alias("n_pred"))
    inter = o.join(pred, ["aid", "pid"]).groupBy("aid").agg(F.count("*").alias("n_inter"))
    return (
        gt.join(pr, "aid", "left")
        .join(inter, "aid", "left")
        .select(
            "aid",
            F.col("n_gt").cast("bigint").alias("n_gt"),
            F.round(
                F.coalesce("n_inter", F.lit(0))
                / F.greatest(F.coalesce("n_pred", F.lit(0)), F.lit(1)),
                6,
            ).alias("precision"),
            F.round(F.coalesce("n_inter", F.lit(0)) / F.greatest("n_gt", F.lit(1)), 6).alias(
                "recall"
            ),
        )
    )


def _q_salted_distinct_count(spark, sf):
    """Two-phase salted distinct aggregation (skew-proof countDistinct);
    result must equal the plain count(distinct) oracle."""
    from whoiswho_spark.operators.blocking import salted_distinct_count

    return salted_distinct_count(
        _t(spark, sf, "lineitem"), key="l_suppkey", val="l_partkey", n_salts=16
    ).withColumnRenamed("l_suppkey", "suppkey")


def _q_ivf_topk(spark, sf):
    """IVF (KMeans coarse quantizer) top-k — the inverted-file ANN scale
    path (corpus shuffles ONCE on centroid id, queries fan out n_probe×).
    The contract query runs FULL probe (n_probe = n_centroids): every
    corpus vector sits in exactly one shard, so full probe scores the
    whole corpus exactly once → result is the exact top-k and the same
    brute-force DuckDB oracle applies, while the PLAN keeps the IVF
    shape. Approximate (n_probe < n_centroids) recall is pytest-covered
    (test_dedup_ann_textstats recall@k tests)."""
    from whoiswho_spark.operators.ann import ivf_topk

    vecs = _t(spark, sf, "embeddings")
    return ivf_topk(
        vecs.where(F.col("vec_id") < 10), vecs, n_centroids=8, n_probe=8, k=5
    )


def _q_year_sorted_profiles(spark, sf):
    """Profile papers ordered newest-first (data_process.py:462-464,
    sort_array(collect_list(struct)) form) — orders per customer sorted by
    date desc, emitted as a comma-joined id string (portable to the
    string_agg oracle)."""
    o = _t(spark, sf, "orders")
    lst = F.sort_array(
        F.collect_list(F.struct(F.col("o_orderdate"), F.col("o_orderkey"))),
        asc=False,
    )
    return (
        o.groupBy("o_custkey")
        .agg(lst.alias("_l"))
        .select(
            "o_custkey",
            F.array_join(
                F.transform(F.col("_l"), lambda s: s["o_orderkey"].cast("string")), ","
            ).alias("orderkeys_desc"),
        )
    )


def _q_knrm_features(spark, sf):
    """KNRM Gaussian-kernel pooling (model.py:103-135, 202-241) over
    singleton embedding sets per pair — rows-only (41-dim kernel math is
    not reasonably SQL-expressible)."""
    from whoiswho_spark.functions.similarity import knrm_udf

    v = _t(spark, sf, "embeddings")
    a = v.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("id_a"), F.array(F.col("embedding")).alias("set_a")
    )
    b = v.where((F.col("vec_id") >= 20) & (F.col("vec_id") < 40)).select(
        F.col("vec_id").alias("id_b"), F.array(F.col("embedding")).alias("set_b")
    )
    return (
        a.crossJoin(b)
        .select(
            "id_a", "id_b", knrm_udf(F.col("set_a"), F.col("set_b")).alias("knrm")
        )
        .select("id_a", "id_b", F.size("knrm").alias("knrm_dim"),
                F.round(F.element_at("knrm", 1), 6).alias("k0"))
    )


# Deterministic synthetic raw names for the §2.2 name-function surface —
# adversarial cases from the reference's own __main__ plus nickname/
# stopword/diacritic/initials forms. Indexed by c_custkey % 13 in BOTH
# engines; the oracle's expected values are FROZEN GOLDENS minted by
# running the reference functions (tests/test_name_match.py docstring).
_SYNTH_NAMES = [
    "m ćwiok", "m. ćwiok", "JX Wang", "Dr. Bill O'Neil Jr", "j.x. wang",
    "Liz  van der Berg", "A. B. chuck III", "  ", "Tom-Hanks 3rd",
    "PAT smith", "ted", "jan k. nowak", "ÅSA Öberg",
]


def _synth_name_col(key_col, offset: int = 0, names: list[str] | None = None):
    names = names if names is not None else _SYNTH_NAMES
    idx = F.pmod(key_col + F.lit(offset), F.lit(len(names))).cast("int")
    return F.element_at(F.array(*[F.lit(n) for n in names]), idx + F.lit(1))


# ASCII-only battery for the is_chinese_name census (the DuckDB oracle
# recomputes the predicate in SQL, which has no NFKD fold): romanized CN
# in pinyin/Cantonese/Korean/Vietnamese forms, Western names, ban-list
# edge cases, mononyms — every branch of is_chinese.py:70-97.
_SYNTH_CN_NAMES = [
    "Ernest Jordan", "KAIPING HAN", "Xiaotao Wu", "Yufeng Xin", "Na Li",
    "jing zhang", "wei wang li", "li hua", "ouyang feng", "sima qian",
    "wang li zhang ming", "kim jong il", "park chan wook", "wong kar wai",
    "nguyen van a", "kim basinger", "juan carlos", "tim duncan",
    "van der sar", "de long", "zhang", "smith", "E.c.c. Tsang",
    "Jae-Hoon Kim",
]


def _q_name_normalize_census(spark, sf):
    """tokenize_name (nickname dict + stopwords) and clean_name
    (alpha-only fold) over deterministic synthetic names — reference
    tool/token.py:102-119 / feature_process.py:161-173. Oracle = frozen
    reference-minted goldens keyed by the same name index."""
    from whoiswho_spark.functions.name_match import clean_name_udf, tokenize_name_udf

    raw = _synth_name_col(F.col("c_custkey"))
    return (
        _t(spark, sf, "customer")
        .select("c_custkey", raw.alias("raw_name"))
        .select(
            "c_custkey",
            "raw_name",
            tokenize_name_udf(F.col("raw_name")).alias("tokenized"),
            clean_name_udf(F.col("raw_name")).alias("cleaned"),
        )
    )


def _q_name_match_pairs(spark, sf):
    """7-matcher battery (tool/util.py:141-252, dispatch match_name.py:
    7-15) over cleaned synthetic name pairs, strict + loose modes.
    Oracle = frozen reference-minted goldens."""
    from whoiswho_spark.functions.name_match import (
        clean_name_udf,
        names_match_loose_udf,
        names_match_udf,
    )

    a = _synth_name_col(F.col("c_custkey"))
    b = _synth_name_col(F.col("c_custkey"), offset=3)
    df = _t(spark, sf, "customer").select(
        "c_custkey", a.alias("name_a"), b.alias("name_b")
    )
    ca = clean_name_udf(F.col("name_a"))
    cb = clean_name_udf(F.col("name_b"))
    return df.select(
        "c_custkey",
        "name_a",
        "name_b",
        names_match_udf(ca, cb).alias("matched_strict"),
        names_match_loose_udf(ca, cb).alias("matched_loose"),
    )


# 30 deterministic name clusters (4 members each, assigned to customer
# keys 1..120 by residue): 10 self-consistent persons, 10 person+intruder,
# 10 four-different-people. The per-cluster truth below is FROZEN from
# the reference's dryRun (tool/match_name.py:18-48) via the
# tools/mint_is_chinese_goldens.py harness.
_CLUSTER_CHECK = [
    ["William Smith", "W. Smith", "w smith", "william h smith"],
    ["anna maria lopez", "a m lopez", "anna lopez", "a maria lopez"],
    ["Robert De Niro", "r de niro", "robert de niro", "robert niro"],
    ["Jing Zhang", "j zhang", "jing zhang", "zhang jing"],
    ["Jane Doe", "j doe", "jane doe", "jane d doe"],
    ["Harry Dankowicz", "h dankowicz", "harry dankowicz", "h. dankowicz"],
    ["Natalia Jimeno", "n jimeno", "natalia jimeno", "natalia j jimeno"],
    ["Mark Manwaring", "m manwaring", "mark l manwaring", "mark manwaring"],
    ["Elisabeth Umkehrer", "e umkehrer", "elisabeth umkehrer", "e. umkehrer"],
    ["Victor Kureichick", "v kureichick", "victor m kureichick", "victor kureichick"],
]
_CLUSTER_CHECK_INTRUDERS = [
    "Buzz Aldrin", "K. Moribe", "Jose Pereira", "Yufeng Xin", "P Ludvigsen",
    "Mahir Hassan", "Olaf Flippo", "Edmund Pierzchala", "Zhen Song",
    "Gebreselassie Baraki",
]


def _cluster_check_spec() -> tuple[list[list[str]], list[bool]]:
    clusters = [list(p) for p in _CLUSTER_CHECK]
    for i in range(10):
        clusters.append(list(_CLUSTER_CHECK[i][:3]) + [_CLUSTER_CHECK_INTRUDERS[i]])
    for i in range(10):
        clusters.append([_CLUSTER_CHECK[(i + j) % 10][j] for j in range(4)])
    flags = [True] * 10 + [False] * 20  # reference-minted (see above)
    return clusters, flags


def _q_cluster_name_check(spark, sf):
    """Per-cluster dryRun name-consistency validation
    (tool/match_name.py:18-48, the pretreat_unass cluster gate) as a
    grouped DataFrame op over deterministic synthetic clusters. Oracle =
    frozen reference-minted dryRun verdicts."""
    from whoiswho_spark.functions.name_match import cluster_name_consistency

    clusters, _ = _cluster_check_spec()
    # flat[k] for customer key k in 0..119: cluster k%30, slot k//30
    flat = [clusters[k % 30][k // 30] for k in range(120)]
    df = (
        _t(spark, sf, "customer")
        .where(F.col("c_custkey") < 120)
        .select(
            F.pmod(F.col("c_custkey"), F.lit(30)).cast("int").alias("cluster_id"),
            F.element_at(
                F.array(*[F.lit(n) for n in flat]),
                F.col("c_custkey").cast("int") + F.lit(1),
            ).alias("name"),
        )
    )
    return cluster_name_consistency(df, "cluster_id", "name")


def _q_is_chinese_census(spark, sf):
    """is_chinese_name (tool/is_chinese.py:70-97, const.py romanization
    tables) over a deterministic ASCII name battery. The oracle is fully
    INDEPENDENT: DuckDB recomputes the predicate with list_filter/
    list_contains over the same contract tables embedded as literals."""
    from whoiswho_spark.functions.is_chinese import is_chinese_name_udf

    raw = _synth_name_col(F.col("c_custkey"), names=_SYNTH_CN_NAMES)
    return (
        _t(spark, sf, "customer")
        .select("c_custkey", raw.alias("raw_name"))
        .select(
            "c_custkey",
            "raw_name",
            is_chinese_name_udf(F.col("raw_name")).alias("is_cn"),
        )
    )


def _q_incremental_dedup(spark, sf):
    """Streaming incremental MinHash/LSH dedup (custom stateful
    operator): documents drained as a file stream, each new doc paired
    against the per-(band,bucket) membership held in group state. The
    emitted pair SET is state-order-independent and equals the batch
    bucket join, so — unlike incremental_er — this streaming query IS
    oracle-checked (same DuckDB SQL family as minhash_dup_candidates,
    with lexicographic id order to match the string-typed stream ids).
    max_bucket_size is lifted at test scale so the set is exact; the cap
    is the production state bound."""
    import tempfile

    from whoiswho_spark.streaming.incremental_dedup import incremental_dedup_stream

    src_dir = tempfile.mkdtemp(prefix="inc_dd_src_")
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    docs.repartition(4).write.mode("overwrite").parquet(src_dir)
    stream = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    ckpt = tempfile.mkdtemp(prefix="inc_dd_ckpt_")
    # PARQUET file sink, not the memory sink (round 6, guide §5): the
    # memory sink collects every micro-batch's rows onto the DRIVER —
    # fine at the sf0.01 oracle scale (~80k pairs), a GC death spiral at
    # sf0.1 (~8M pairs into an 8g driver; thread dump showed 19 GC
    # threads at ~12 s CPU each and zero task progress). The file sink
    # keeps rows on executors/disk; the read-back feeds the identical
    # reducer, so the query result is byte-identical.
    out_dir = tempfile.mkdtemp(prefix="inc_dd_out_")
    from whoiswho_spark.streaming.incremental_dedup import OUTPUT_SCHEMA

    q = (
        incremental_dedup_stream(stream, max_bucket_size=1_000_000)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # the contract reducer: drops the \x00 sentinel namespace (cap-hit
    # observability rows — none fire at this uncapped test scale, but the
    # filter keeps the oracle immune by construction) + cross-band dedupe
    from whoiswho_spark.streaming.incremental_dedup import (
        distinct_candidate_pairs,
    )

    return distinct_candidate_pairs(
        spark.read.schema(OUTPUT_SCHEMA).parquet(out_dir)
    )


def _q_bond_threshold_edges(spark, sf):
    """BOND a/o/v threshold case matrix (bond/dataset/load_data.py:
    93-171) over a synthetic typed-edge table derived from orders; the
    reference's random v-gate is the seeded-hash uniform (portable)."""
    from whoiswho_spark.operators.bond_edges import bond_threshold_edges

    o = _t(spark, sf, "orders")
    edges = o.select(
        F.col("o_custkey").alias("src"),
        F.col("o_orderkey").alias("dst"),
        (F.col("o_orderkey") % 4).alias("val_a"),
        (F.col("o_custkey") % 3).alias("val_o"),
        ((F.col("o_orderkey") % 10) / F.lit(10.0)).alias("attr_o"),
        (F.col("o_orderkey") % 5).alias("val_v"),
        ((F.col("o_custkey") % 7) / F.lit(7.0)).alias("attr_v"),
    )
    out = bond_threshold_edges(
        edges, rel_on="aov", th_a=1, th_o=0.5, th_v=1, coo_th=0.5, prob_v=0.9
    )
    return out.select(
        "src",
        "dst",
        F.round("value", 6).alias("value"),
        F.round("attr_a", 6).alias("attr_a"),
        F.round("attr_o", 6).alias("attr_o"),
        F.round("attr_v", 6).alias("attr_v"),
    )


def _q_incremental_er(spark, sf):
    """Streaming incremental ER (custom stateful operator,
    applyInPandasWithState): documents drained as a file stream, pages
    scored against every stored member per block, attached to the argmax
    member's cluster above threshold (AutoTrainSND.py:163-206 attach
    rules) with transitive cluster MERGE — so the final partition equals
    the connected components of the ≥0.5 tanimoto graph for any arrival
    order. Output is that partition canonicalized to the min member url,
    which IS SQL-expressible: the oracle recomputes the components with
    a DuckDB recursive CTE."""
    import tempfile

    from whoiswho_spark.operators.dedup import tokens_col
    from whoiswho_spark.streaming.incremental_er import (
        canonical_partition,
        incremental_er_stream,
    )

    # the file stream source needs a DIRECTORY; the sf tables are single
    # parquet files → stage a multi-file copy (4 files = several
    # micro-batches at maxFilesPerTrigger=1)
    src_dir = tempfile.mkdtemp(prefix="inc_er_src_")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    docs.repartition(4).write.mode("overwrite").parquet(src_dir)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .select(
            F.col("doc_id").cast("string").alias("url"),
            F.col("source").alias("block_key"),
            F.array_distinct(tokens_col(F.col("text"))).alias("toks"),
        )
    )
    ckpt = tempfile.mkdtemp(prefix="inc_er_ckpt_")
    # parquet sink for the same driver-safety reason as incremental_dedup
    # (memory sink = per-batch driver collect; see that query's comment)
    out_dir = tempfile.mkdtemp(prefix="inc_er_out_")
    from whoiswho_spark.streaming.incremental_er import OUTPUT_SCHEMA

    q = (
        incremental_er_stream(stream, threshold=0.5)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return canonical_partition(spark.read.schema(OUTPUT_SCHEMA).parquet(out_dir))


def _q_consensus_clusters(spark, sf):
    """Consensus clustering ensemble (BOND ESB co-association voting,
    autotrain_bond_ensemble.py:240-261 → operators/consensus.py): three
    deterministic clusterings of the documents table — exact text, text
    prefix, and a coarse (source, length-bucket) grouping — stacked as
    (run_id, url, cluster_id); pairs co-clustered in a strict majority
    (>0.5 of the 3 runs) are voted into the consensus graph and closed
    with connected_components. Fully SQL-expressible: the oracle
    replays the vote and a recursive-CTE closure in DuckDB."""
    from whoiswho_spark.operators.consensus import consensus_clusters

    d = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("url"),
        F.md5("text").alias("r_exact"),
        F.md5(F.lower(F.substring("text", 1, 64))).alias("r_prefix"),
        F.concat_ws(
            "|", F.col("source"), F.floor(F.length("text") / 32).cast("string")
        ).alias("r_coarse"),
    )
    stacked = None
    for run, col in (("exact", "r_exact"), ("prefix", "r_prefix"), ("coarse", "r_coarse")):
        part = d.select(
            F.lit(run).alias("run_id"), "url", F.col(col).alias("cluster_id")
        )
        stacked = part if stacked is None else stacked.unionByName(part)
    return consensus_clusters(stacked)


def _q_propagation_smoothed(spark, sf):
    """Graph-propagation embedding smoothing (§2.8, the torch-free BOND
    GAE analog — operators/propagation.py): 2 iterations of weighted-
    neighbor-mean smoothing + L2 renormalization over a deterministic
    chain graph (edges (v, v+1) within consecutive groups of 4, weight
    1 + v%3), emitted as exploded (vec_id, dim, val) rows. The oracle
    replays both iterations in chained DuckDB CTEs — per-node neighbor
    sums have ≤2 terms (order-exact in floats); the 64-term L2 norms
    round to 6 dp like every embedding oracle here."""
    from whoiswho_spark.operators.propagation import propagate_embeddings

    emb = _t(spark, sf, "embeddings").select(
        F.col("vec_id").alias("url"), "embedding"
    )
    edges = (
        emb.alias("a")
        .join(
            emb.select(F.col("url").alias("b_url")),
            F.col("b_url") == F.col("a.url") + 1,
        )
        .where(F.col("a.url") % 4 < 3)
        .select(
            F.col("a.url").alias("url_a"),
            F.col("b_url").alias("url_b"),
            (F.lit(1.0) + (F.col("a.url") % 3).cast("double")).alias("score"),
        )
    )
    sm = propagate_embeddings(emb, edges, iterations=2, beta=0.5)
    return sm.select(
        F.col("url").alias("vec_id"),
        F.posexplode("embedding").alias("dim", "val"),
    ).select(
        "vec_id",
        (F.col("dim") + 1).cast("int").alias("dim"),
        F.round("val", 6).alias("val"),
    )


def _q_gopher_repetition(spark, sf):
    """Gopher repetition filters (training-data pipeline mandate —
    functions/repetition.py): per document, the most-frequent-n-gram
    character fraction (n = 2, 3) and the exact duplicated-n-gram
    character COVERAGE (interval-union sweep, n = 2, 3). The published
    rule uses n = 2..4 / 5..10; this corpus's 31-word vocabulary makes
    n >= 5 duplicates vanishingly rare (0 docs at sf0.01), so the
    contract query exercises the same operators at the n where the
    output is non-degenerate (349 / 27 docs with within-doc duplicate
    2- / 3-grams); the n >= 5 semantics are pytest-covered on crafted
    fixtures. Contract plan = the FUSED zero-shuffle Arrow kernel
    (integer numerators per doc, fractions + round(6) in Catalyst);
    the explode+window twins are parity-tested against it."""
    from whoiswho_spark.functions.repetition import gopher_repetition_stats_fused

    docs = _t(spark, sf, "documents")
    return gopher_repetition_stats_fused(docs, top_ns=(2, 3), dup_ns=(2, 3))


def _q_crossdoc_span_dedup(spark, sf):
    """Cross-document duplicate-span coverage (exact-substring dedup
    analog at 8-gram granularity — operators/span_dedup.py): per
    document, the fraction of token positions covered by 8-grams that
    occur in >= 2 distinct documents, plus the >= 0.5 removal flag.
    Only a 64-bit xxhash64 gram key is shuffled (never output; the
    oracle meets on raw gram strings — exact); coverage is an
    interval-union sweep per doc. Non-degenerate here: the corpus's
    5%% 'dup' documents + their sources (47 docs at sf0.01) flag at
    1.0."""
    from whoiswho_spark.operators.span_dedup import crossdoc_duplicate_spans

    docs = _t(spark, sf, "documents")
    return crossdoc_duplicate_spans(docs, n=8, min_docs=2, flag_threshold=0.5)


def _q_crossdoc_span_removed(spark, sf):
    """Duplicate-span REMOVAL (operators/span_dedup_remove.py — the
    Lee et al. action, not just the flag): every 8-gram shared by >= 2
    distinct docs keeps its occurrences only in the smallest sharing
    doc_id; other docs lose the union of the covering windows, and
    clean_text is the surviving tokens re-joined. The oracle replays
    ownership (min doc_id per shared gram) and rebuilds clean_text with
    an ordered string_agg over surviving positions."""
    from whoiswho_spark.operators.span_dedup_remove import remove_duplicated_spans

    docs = _t(spark, sf, "documents")
    return remove_duplicated_spans(docs, n=8, min_docs=2)


def _q_quality_filter(spark, sf):
    """Composed corpus-cleaning decision (functions/quality_filter.py —
    the Gopher/C4 pattern: independent rule gates, keep iff all pass):
    language != 'und', quality >= 0.5, top-2-gram frac <= 0.25 and
    dup-2-gram coverage <= 0.35, not a cross-doc duplicate. Every gate
    verdict is emitted (flag_* = 1 means FAILED) so drops are
    auditable. The oracle re-derives all four gates from the same
    component SQL the individual queries use. lang_threshold is
    calibrated to this corpus's marker density (only 'the' of the 31
    vocab words is an en marker, mean ratio ~0.032) so the gate splits
    the population instead of failing everything — standard filter
    calibration, thresholds are operator parameters."""
    from whoiswho_spark.functions.quality_filter import quality_filter_flags

    return quality_filter_flags(_t(spark, sf, "documents"), lang_threshold=0.03)


def _q_url_canonical(spark, sf):
    """URL canonicalization (functions/urlnorm.py — RFC 3986 §6
    syntax normalization + crawl conventions: case-fold scheme/host,
    www/default-port strip, fragment drop, tracking-param drop + query
    sort, trailing-slash fold). Input URLs are synthesized
    deterministically from (doc_id, source) with every messiness the
    rules handle; both engines build the same string, then canonicalize
    with their own regex/array pipelines. Map-only: zero shuffle."""
    from whoiswho_spark.functions.urlnorm import canonical_url_col

    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 3 == 0, F.lit("HTTP://WWW.")).otherwise(F.lit("http://")),
        F.col("source"),
        F.lit(".Example.COM"),
        F.when(d % 4 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/Docs/"),
        d.cast("string"),
        F.when(d % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 2 == 0, F.lit("?utm_source=x&b=2&a=1")).otherwise(
            F.lit("?b=2&a=1&ref=t")
        ),
        F.when(d % 7 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )
    return (
        _t(spark, sf, "documents")
        .select("doc_id", url.alias("url"))
        .select("doc_id", "url", canonical_url_col(F.col("url")).alias("canon_url"))
    )


def _q_bpe_pair_counts(spark, sf):
    """BPE training's per-iteration core (operators/bpe.py): adjacent
    symbol-pair totals over the word-frequency table (chars + the
    trailing </w> end-of-word symbol) — the statistic every merge
    iteration aggregates. Fully SQL-expressible, so this one carries
    the oracle for the trainer's counting kernel."""
    from whoiswho_spark.operators.bpe import END, _adjacent_pairs, word_count_table

    wc = word_count_table(_t(spark, sf, "documents")).select(
        "count",
        F.concat(
            F.split(F.col("word"), "").cast("array<string>"),
            F.array(F.lit(END)),
        ).alias("syms"),
    )
    pair_col, cnt = _adjacent_pairs(F.col("syms"), F.col("count"))
    return (
        wc.select(pair_col, cnt)
        .groupBy(F.col("_pair.a").alias("a"), F.col("_pair.b").alias("b"))
        .agg(F.sum("count").cast("bigint").alias("n"))
    )


def _q_bpe_merges(spark, sf):
    """Full BPE training (operators/bpe.py fit_bpe): 30 merges over the
    documents word table, deterministic tie-breaks. ROWS-ONLY by
    design: the merge sequence is a data-DEPENDENT iteration (each
    step's argmax feeds the next rewrite), which no static SQL can
    replay; exact-parity vs the pure-Python reference trainer is
    pytest-gated (tests/test_bpe.py), and the per-iteration counting
    core is oracle-checked by bpe_pair_counts."""
    from whoiswho_spark.operators.bpe import bpe_merges_df

    return bpe_merges_df(_t(spark, sf, "documents"), num_merges=30)


def _q_user_sessions(spark, sf):
    """Gap-based sessionization (§2.11 extension) — the STREAMING
    operator streaming/events.user_sessions run verbatim in batch mode
    (withWatermark is a no-op on batch), so the session-window
    semantics get a SQL oracle: the DuckDB side derives sessions with
    the lag/cumsum idiom using the empirically-pinned boundary rule
    (Spark merges at exactly-gap: new session iff diff > gap; end =
    last ts + gap). Values pre-cast to decimal so per-session sums are
    order-exact in both engines."""
    from whoiswho_spark.streaming.events import user_sessions

    ev = _t(spark, sf, "events").withColumn(
        "value", F.round(F.col("value"), 4).cast("decimal(18,4)")
    )
    s = user_sessions(ev, gap="30 minutes")
    return s.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_start"
        ),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_end"
        ),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("session_value").cast("double").alias("session_value"),
    )


def _q_gbdt_scores(spark, sf):
    """GBDT ensemble scorer (§2.9): numpy histogram-boosted trees fit on
    a bounded deterministic sample, INFERENCE COMPILED TO A CATALYST
    EXPRESSION (nested when-cascades — zero Python in the hot path).
    Labels derived deterministically from order price; fit is driver-side
    numpy → non-SQL-expressible → rows-only."""
    from whoiswho_spark.operators.gbdt import fit_gbdt, gbdt_score_col

    o = _t(spark, sf, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice") % 97).alias("f_a"),
        (F.col("o_custkey") % 13).cast("double").alias("f_b"),
        F.length("o_orderpriority").cast("double").alias("f_c"),
        (F.col("o_totalprice") > 150000).cast("double").alias("label"),
    )
    model = fit_gbdt(o, ["f_a", "f_b", "f_c"], n_trees=10, max_depth=3)
    return o.select(
        "o_orderkey", F.round(gbdt_score_col(model), 6).alias("gbdt_score")
    )


def _q_ego_graph_features(spark, sf):
    """Ego-graph relational feature channel (operators/ego_graph.py —
    graph_features.py:96-180 with the GNN substituted by the embedding
    kernels per SURVEY §2.8): synthetic authorship (aid = vec_id % 10)
    over the embeddings table; 20 query vectors × 10 author node sets →
    max/mean cosine + KNRM kernel 0 (closed form in the oracle)."""
    from whoiswho_spark.operators.ego_graph import attach_ego_features

    emb = _t(spark, sf, "embeddings").select(
        F.col("vec_id").alias("url"), "embedding"
    )
    mem = emb.select(
        F.pmod(F.col("url"), F.lit(10)).cast("string").alias("aid"),
        F.col("url"),
    )
    cands = (
        emb.where("url < 20")
        .select(F.col("url").alias("pid"))
        .crossJoin(mem.select("aid").distinct())
    )
    out = attach_ego_features(
        cands, mem, emb, url_col="url", max_author_papers=8
    )
    return out.select(
        "pid",
        "aid",
        # 4dp: the pooled sums cross engines with last-ulp drift; 6dp
        # sits on a rounding boundary for one row at sf0.01
        F.round("f_ego_max_cos", 4).alias("max_cos"),
        F.round("f_ego_mean_cos", 4).alias("mean_cos"),
        F.round(F.element_at("f_ego_knrm", 1), 4).alias("knrm_k0"),
    )


def _q_rnd_ensemble_scores(spark, sf):
    """RND trainer orchestration (plans/rnd_train.py — AutoTrainRND
    fit/predict): two GBDT cells × 3 folds fit on the labeled order
    table, fold-mean per cell, cell-weight vote, top-1 per customer with
    the NIL threshold. Fit is the bounded deterministic numpy sample;
    INFERENCE (fold cascades, vote, window top-1) is pure Catalyst. The
    vote is rounded to 6dp BEFORE ranking/threshold so the argmax and
    the NIL gate compare engine-portable values (the oracle re-fits the
    identical models and compiles them to DuckDB CASE WHEN)."""
    from whoiswho_spark.operators.gbdt import ensemble_vote_col
    from whoiswho_spark.operators.rnd import top1_assign
    from whoiswho_spark.plans.rnd_train import CellConfig, fit_cells, score_cells

    o = _t(spark, sf, "orders").select(
        F.col("o_custkey").cast("string").alias("pid"),
        F.col("o_orderkey").alias("aid"),
        (F.col("o_totalprice") % 97).alias("f_a"),
        (F.col("o_custkey") % 13).cast("double").alias("f_b"),
        F.length("o_orderpriority").cast("double").alias("f_c"),
        (F.col("o_totalprice") > 150000).cast("double").alias("label"),
    )
    cells = [
        CellConfig("deep", ("f_a", "f_b", "f_c"), 5.0, n_trees=8, max_depth=3),
        CellConfig("lite", ("f_a", "f_c"), 2.0, n_trees=16, max_depth=2,
                   learning_rate=0.1),
    ]
    fitted = fit_cells(o, cells, k=3)
    scored = score_cells(o, fitted)
    voted = scored.withColumn(
        "vote_score",
        F.round(
            ensemble_vote_col(
                [f"score__{a['cell'].name}" for a in fitted],
                weights=[a["cell"].cell_weight for a in fitted],
            ),
            6,
        ),
    )
    return top1_assign(
        voted, item_col="pid", cand_col="aid",
        score_col="vote_score", threshold=0.65,
    ).select("pid", "aid", "vote_score")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "block_stats": _q_block_stats,
        "candidate_pair_counts": _q_candidate_pair_counts,
        "minhash_signatures": _q_minhash_signatures,
        "lsh_band_buckets": _q_lsh_band_buckets,
        "minhash_dup_candidates": _q_minhash_dup_candidates,
        "exact_dedup": _q_exact_dedup,
        "ngram_jaccard_pairs": _q_ngram_jaccard_pairs,
        "embedding_neardup": _q_embedding_neardup,
        "ann_topk": _q_ann_topk,
        "top1_threshold": _q_top1_threshold,
        "ordered_split": _q_ordered_split,
        "kfold": _q_kfold,
        "deterministic_sample": _q_deterministic_sample,
        "pairwise_f1": _q_pairwise_f1,
        "lineitem_pricing_summary": _q_lineitem_pricing_summary,
        "revenue_by_nation": _q_revenue_by_nation,
        "window_topk": _q_window_topk,
        "token_stats": _q_token_stats,
        "stopword_ratio": _q_stopword_ratio,
        "quality_score": _q_quality_score,
        "fingerprint": _q_fingerprint,
        "events_hourly": _q_events_hourly,
        "simhash_pairs": _q_simhash_pairs,
        "media_meta": _q_media_meta,
        "media_byte_features": _q_media_byte_features,
        "media_frames": _q_media_frames,
        "media_resize_plan": _q_media_resize_plan,
        "lsh_ann_topk": _q_lsh_ann_topk,
        "lang_id": _q_lang_id,
        "idf_table": _q_idf_table,
        "stacking_features": _q_stacking_features,
        "rnd_author_prf": _q_rnd_author_prf,
        "year_sorted_profiles": _q_year_sorted_profiles,
        "knrm_features": _q_knrm_features,
        "salted_distinct_count": _q_salted_distinct_count,
        "ivf_topk": _q_ivf_topk,
        "name_normalize_census": _q_name_normalize_census,
        "name_match_pairs": _q_name_match_pairs,
        "is_chinese_census": _q_is_chinese_census,
        "cluster_name_check": _q_cluster_name_check,
        "bond_threshold_edges": _q_bond_threshold_edges,
        "incremental_er": _q_incremental_er,
        "incremental_dedup": _q_incremental_dedup,
        "gbdt_scores": _q_gbdt_scores,
        "rnd_ensemble_scores": _q_rnd_ensemble_scores,
        "ego_graph_features": _q_ego_graph_features,
        "lsh_neardup": _q_lsh_neardup,
        "consensus_clusters": _q_consensus_clusters,
        "propagation_smoothed": _q_propagation_smoothed,
        "gopher_repetition": _q_gopher_repetition,
        "crossdoc_span_dedup": _q_crossdoc_span_dedup,
        "crossdoc_span_removed": _q_crossdoc_span_removed,
        "quality_filter": _q_quality_filter,
        "url_canonical": _q_url_canonical,
        "bpe_pair_counts": _q_bpe_pair_counts,
        # bpe_merges: rows-only (no oracle_sql entry) — data-dependent
        # iterative trainer; see the query docstring for the gate story
        "bpe_merges": _q_bpe_merges,
        "user_sessions": _q_user_sessions,
    }


# FROZEN reference-minted goldens for the name oracles (NOT computed from
# this repo's implementation — minted by running the reference functions;
# see tests/test_name_match.py). Index = c_custkey % 13.
_NAME_TOKENIZED_GOLDENS = [
    "m cwiok", "m. cwiok", "j x wang", "william oneil", "j x wang",
    "elizabeth van der berg", "a. b. charles", "", "thomas hanks 3rd",
    "patricia smith", "edward", "janice k. nowak", "asa oberg",
]
_NAME_CLEANED_GOLDENS = [
    "m cwiok", "m cwiok", "jx wang", "dr bill o neil jr", "j x wang",
    "liz van der berg", "a b chuck iii", "", "tom hanks rd",
    "pat smith", "ted", "jan k nowak", "asa oberg",
]


def _dd_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


_dd_names = "[" + ", ".join(_dd_str(n) for n in _SYNTH_NAMES) + "]"


def _dd_case(idx_expr: str, values: list[str]) -> str:
    whens = " ".join(
        f"when {i} then {_dd_str(v)}" for i, v in enumerate(values)
    )
    return f"(case {idx_expr} {whens} end)"


def _dd_cluster_check_sql() -> str:
    """DuckDB twin of the cluster_name_check query: membership counted
    in SQL, per-cluster verdict FROZEN from the reference dryRun (the
    battery itself is not SQL-expressible; same precedent as the
    name_match_pairs frozen oracle)."""
    _, flags = _cluster_check_spec()
    true_ids = ", ".join(str(i) for i, f in enumerate(flags) if f)
    return f"""
        with g as (
            select cast(c_custkey % 30 as int) as cluster_id
            from customer where c_custkey < 120)
        select cluster_id,
               cast(count(*) as int) as n_members,
               (cluster_id in ({true_ids})) as consistent
        from g group by cluster_id
    """


def _dd_is_chinese_sql() -> str:
    """DuckDB twin of is_chinese_name (tool/is_chinese.py:70-97): an
    INDEPENDENT re-computation — clean to alpha tokens, keep len>1, then
    the surname/syllable/ban counting rules with the contract tables
    (whoiswho_spark/data/cn_romanizations.json) embedded as list
    literals. ASCII-only battery, so the SQL needs no NFKD fold. The
    surname-side add-back uses ban_list_name and the token-side uses
    ban_list_token (reference is_chinese.py:92-93) — kept as two lists
    here so the oracle stays truthful even if the transcribed tables
    ever drift apart (they are identical in the reference today)."""
    from whoiswho_spark.functions.is_chinese import (
        BAN_LIST_NAME,
        BAN_LIST_TOKEN,
        CHINESE_NAME,
        CHINESE_TOKEN,
    )

    cn_name = "[" + ", ".join(_dd_str(t) for t in sorted(CHINESE_NAME)) + "]"
    cn_tok = "[" + ", ".join(_dd_str(t) for t in sorted(CHINESE_TOKEN)) + "]"
    ban = "[" + ", ".join(_dd_str(t) for t in sorted(BAN_LIST_NAME)) + "]"
    ban_t = "[" + ", ".join(_dd_str(t) for t in sorted(BAN_LIST_TOKEN)) + "]"
    names = "[" + ", ".join(_dd_str(n) for n in _SYNTH_CN_NAMES) + "]"
    n = len(_SYNTH_CN_NAMES)
    return f"""
        with k as (select c_custkey, cast(c_custkey % {n} as int) as i from customer),
        nm as (select c_custkey, list_extract({names}, i + 1) as raw_name from k),
        t as (select c_custkey, raw_name,
                list_filter(
                    string_split(trim(regexp_replace(lower(raw_name), '[^a-z]+', ' ', 'g')), ' '),
                    x -> length(x) > 1) as ft
              from nm),
        m as (select c_custkey, raw_name, len(ft) as fs,
                len(list_filter(ft, x -> list_contains({cn_name}, x))) as cname,
                len(list_filter(ft, x -> list_contains({cn_tok}, x))) as ctok_total,
                len(list_filter(ft, x -> list_contains({cn_tok}, x)
                                     and not list_contains({cn_name}, x))) as ctok_ex,
                len(list_filter(ft, x -> list_contains({ban}, x))) as nban,
                len(list_filter(ft, x -> list_contains({ban_t}, x))) as nban_t
              from t)
        select c_custkey, raw_name,
               case when fs >= 3 then
                        (case when cname >= 1 or ctok_total >= 1
                              then cname + nban else cname end)
                      + (case when cname >= 1 or ctok_total >= 1
                              then ctok_ex + nban_t else ctok_ex end)
                      >= fs - 1
                    when fs >= 1 then cname >= 1 or (ctok_total >= 1 and nban >= 1)
                    else false end as is_cn
        from m
    """


def _dd_simhash_sql() -> str:
    """DuckDB twin of dedup.simhash64_udf + simhash_dup_pairs: per-token
    64-bit fingerprint = first 8 md5 bytes unpacked MSB-first (numpy
    unpackbits order), ±1 vote per bit over ALL tokens, bit b set iff the
    vote sum is positive, two's-complement into BIGINT (bit 63 → sign)."""
    byte_exprs = ", ".join(
        f"cast(concat('0x', substring(md5(tok), {2 * i + 1}, 2)) as bigint) as b{i}"
        for i in range(8)
    )
    acc_exprs = ", ".join(
        f"sum(case when (b{b // 8} >> {7 - b % 8}) & 1 = 1 then 1 else -1 end) as a{b}"
        for b in range(64)
    )
    sh_terms = " + ".join(
        f"(case when a{b} > 0 then cast({1 << b} as bigint) else 0 end)"
        for b in range(63)
    )
    sh_expr = f"{sh_terms} + (case when a63 > 0 then cast(-9223372036854775808 as bigint) else 0 end)"
    return f"""
        with toks as (
            select doc_id, unnest({_DD_TOKS}) as tok from documents),
        bytes as (select doc_id, {byte_exprs} from toks),
        accs as (select doc_id, {acc_exprs} from bytes group by doc_id),
        sigs as (
            select d.doc_id, d.source as block, coalesce(s.sh, 0) as sh
            from documents d
            left join (select doc_id, {sh_expr} as sh from accs) s using (doc_id))
        select a.block, a.doc_id as id_a, b.doc_id as id_b,
               cast(bit_count(xor(a.sh, b.sh)) as int) as hamming
        from sigs a join sigs b on a.block = b.block and a.doc_id < b.doc_id
        where bit_count(xor(a.sh, b.sh)) <= 16
    """


def _dd_lsh_ann_sql() -> str:
    """DuckDB twin of ann.lsh_bucketed_topk: the SAME seeded hyperplanes
    (numpy RandomState(42).randn — stable legacy generator) embedded as
    literals; sign-bucket join + windowed top-5."""
    from whoiswho_spark.operators.ann import _hyperplanes

    planes = _hyperplanes(64, 4, seed=42)
    bucket = " || ".join(
        "(case when list_dot_product(embedding::DOUBLE[], ["
        + ", ".join(repr(float(x)) for x in p)
        + "]) > 0 then '1' else '0' end)"
        for p in planes
    )
    return f"""
        with b as (
            select vec_id, embedding, {bucket} as bucket from embeddings),
        scored as (
            select q.vec_id as query_id, c.vec_id as neighbor_id,
                   round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) as cos
            from b q join b c on q.bucket = c.bucket and q.vec_id != c.vec_id
            where q.vec_id < 10)
        select query_id, neighbor_id, cos, cast(rk as int) as rank
        from (select *, row_number() over
                 (partition by query_id order by cos desc, neighbor_id asc) as rk
              from scored)
        where rk <= 5
    """


def _dd_lsh_neardup_sql() -> str:
    """DuckDB twin of ann.lsh_sharded_neardup_pairs: the same seeded
    hyperplane sign buckets as _dd_lsh_ann_sql, pair join within bucket,
    6dp-rounded cosine threshold."""
    from whoiswho_spark.operators.ann import _hyperplanes

    planes = _hyperplanes(64, 4, seed=42)
    bucket = " || ".join(
        "(case when list_dot_product(embedding::DOUBLE[], ["
        + ", ".join(repr(float(x)) for x in p)
        + "]) > 0 then '1' else '0' end)"
        for p in planes
    )
    return f"""
        with b as (
            select vec_id, embedding, {bucket} as bucket from embeddings)
        select x.vec_id as id_a, y.vec_id as id_b,
               round(list_cosine_similarity(
                   x.embedding::DOUBLE[], y.embedding::DOUBLE[]), 6) as cos
        from b x join b y on x.bucket = y.bucket and x.vec_id < y.vec_id
        where round(list_cosine_similarity(
                  x.embedding::DOUBLE[], y.embedding::DOUBLE[]), 6) >= 0.35
    """


def _dd_gbdt_sql() -> str:
    """DuckDB twin of _q_gbdt_scores: re-fit the IDENTICAL model from the
    parquet directly (fit_gbdt_numpy is row-order-invariant and the
    sample bound 100k ≥ the 15k sf0.01 rows, so Spark's limit().collect()
    and a direct parquet read see the same multiset), then compile the
    trees to CASE WHEN cascades via gbdt_score_sql. The oracle's
    independence is in the INFERENCE path (DuckDB CASE WHEN vs Catalyst
    when-cascade over the distributed table); the fit is shared
    deterministic numpy. Correctness gate is defined at sf0.01
    (SPARK_GRAFT_ORACLE_SF_DIR overrides; >100k-row inputs would break
    the all-rows-sampled equivalence)."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from whoiswho_spark.operators.gbdt import fit_gbdt_numpy, gbdt_score_sql

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    t = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_totalprice", "o_custkey", "o_orderpriority"],
    )
    tp = np.asarray(t["o_totalprice"], dtype=np.float64)
    ck = np.asarray(t["o_custkey"], dtype=np.int64)
    pr = np.asarray([len(s) for s in t["o_orderpriority"].to_pylist()], dtype=np.float64)
    X = np.column_stack([np.fmod(tp, 97.0), (ck % 13).astype(np.float64), pr])
    y = (tp > 150000).astype(np.float64)
    model = fit_gbdt_numpy(X, y, ["f_a", "f_b", "f_c"], n_trees=10, max_depth=3)
    score = gbdt_score_sql(
        model,
        {
            "f_a": "o_totalprice % 97",
            "f_b": "CAST(o_custkey % 13 AS DOUBLE)",
            "f_c": "CAST(length(o_orderpriority) AS DOUBLE)",
        },
    )
    return f"select o_orderkey, round({score}, 6) as gbdt_score from orders"


# shared CTE: the synthetic media payload as a HEX string, derived from
# doc columns exactly like synthetic_media_payload_col (PNG/JPEG/GIF)
_MEDIA_HEX_CTE = """
    with p as (
      select doc_id,
             case doc_id % 3
               when 0 then '89504E470D0A1A0A0000000D49484452'
                           || lpad(hex(1 + (n_chars % 2048)), 8, '0')
                           || lpad(hex(1 + (doc_id % 1024)), 8, '0')
               when 1 then 'FFD8FFC0001108'
                           || lpad(hex(1 + (doc_id % 1024)), 4, '0')
                           || lpad(hex(1 + (n_chars % 2048)), 4, '0')
               else '474946383961'
                           || lpad(hex((1 + (n_chars % 2048)) % 256), 2, '0')
                           || lpad(hex((1 + (n_chars % 2048)) // 256), 2, '0')
                           || lpad(hex((1 + (doc_id % 1024)) % 256), 2, '0')
                           || lpad(hex((1 + (doc_id % 1024)) // 256), 2, '0')
             end as hx
      from documents)
"""


def _dd_rnd_ensemble_sql() -> str:
    """DuckDB twin of _q_rnd_ensemble_scores: recompute the fold ids
    with the same portable md5 hash, re-fit the IDENTICAL per-fold
    models from the parquet (fit_gbdt_numpy is row-order-invariant; the
    sample bound covers sf0.01 entirely — same argument as
    _dd_gbdt_sql), compile every fold cascade to CASE WHEN, then redo
    the fold mean + cell-weight vote + window top-1 + NIL threshold in
    SQL on the 6dp-rounded vote."""
    import hashlib
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from whoiswho_spark.operators.gbdt import fit_gbdt_numpy, gbdt_score_sql

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    t = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"],
    )
    tp = np.asarray(t["o_totalprice"], dtype=np.float64)
    ck = np.asarray(t["o_custkey"], dtype=np.int64)
    pr = np.asarray(
        [len(s) for s in t["o_orderpriority"].to_pylist()], dtype=np.float64
    )
    feats = {
        "f_a": np.fmod(tp, 97.0),
        "f_b": (ck % 13).astype(np.float64),
        "f_c": pr,
    }
    y = (tp > 150000).astype(np.float64)
    # hash60(pid, 'kfold') % 3 — pid is cast(o_custkey as string)
    fold = np.asarray(
        [
            int(hashlib.md5(f"{c}:kfold".encode()).hexdigest()[:15], 16) % 3
            for c in ck
        ]
    )
    feature_sql = {
        "f_a": "o_totalprice % 97",
        "f_b": "CAST(o_custkey % 13 AS DOUBLE)",
        "f_c": "CAST(length(o_orderpriority) AS DOUBLE)",
    }
    cells = [  # must mirror _q_rnd_ensemble_scores exactly
        ("deep", ["f_a", "f_b", "f_c"], 5.0, dict(n_trees=8, max_depth=3)),
        ("lite", ["f_a", "f_c"], 2.0,
         dict(n_trees=16, max_depth=2, learning_rate=0.1)),
    ]
    cell_exprs, weights = [], []
    for _name, fcols, w, hp in cells:
        fold_sqls = []
        for i in range(3):
            m = fold != i
            X = np.column_stack([feats[c][m] for c in fcols])
            model = fit_gbdt_numpy(X, y[m], fcols, **hp)
            fold_sqls.append(gbdt_score_sql(model, feature_sql))
        cell_exprs.append("((" + ") + (".join(fold_sqls) + f")) / 3.0")
        weights.append(w)
    total = sum(weights)
    vote = " + ".join(
        f"({e}) * {w / total!r}" for e, w in zip(cell_exprs, weights)
    )
    return f"""
        with s as (
            select cast(o_custkey as varchar) as pid, o_orderkey as aid,
                   round({vote}, 6) as v
            from orders)
        select pid, aid, v as vote_score from (
            select *, row_number() over
                (partition by pid order by v desc, aid asc) as rk
            from s)
        where rk = 1 and v >= 0.65
    """


def oracle_sql() -> dict[str, str]:
    h = _dd_hash60
    toks = _DD_TOKS
    stop17 = (
        "['at','based','in','of','for','on','and','to','an','using','with',"
        "'the','by','we','be','is','are','can']"
    )
    minhash_sig = ", ".join(
        f"list_min(list_transform({toks}, _tk -> {h('_tk', str(k))})) as h{k}"
        for k in range(4)
    )
    return {
        "block_stats": """
            select source, lang,
                   cast(count(*) as bigint) as n_docs,
                   cast(sum(n_chars) as bigint) as total_chars
            from documents group by source, lang
        """,
        "candidate_pair_counts": """
            select source,
                   cast(count(*) as bigint) as n_docs,
                   cast(count(*) * (count(*) - 1) / 2 as bigint) as n_pairs
            from documents group by source
        """,
        "minhash_signatures": f"""
            select doc_id, {minhash_sig} from documents
        """,
        "lsh_band_buckets": f"""
            with sig as (select doc_id, {minhash_sig} from documents)
            select doc_id, band, bucket from (
                select doc_id, 0 as band,
                       md5(cast(h0 as varchar) || '_' || cast(h1 as varchar)) as bucket
                from sig
                union all
                select doc_id, 1 as band,
                       md5(cast(h2 as varchar) || '_' || cast(h3 as varchar)) as bucket
                from sig)
        """,
        "minhash_dup_candidates": f"""
            with sig as (select doc_id, {minhash_sig} from documents),
            bk as (
                select doc_id, 0 as band,
                       md5(cast(h0 as varchar) || '_' || cast(h1 as varchar)) as bucket
                from sig
                union all
                select doc_id, 1 as band,
                       md5(cast(h2 as varchar) || '_' || cast(h3 as varchar)) as bucket
                from sig)
            select distinct a.doc_id as id_a, b.doc_id as id_b
            from bk a join bk b on a.band = b.band and a.bucket = b.bucket
            where a.doc_id < b.doc_id
        """,
        "incremental_dedup": f"""
            with sig as (select cast(doc_id as varchar) as doc_id, {minhash_sig} from documents),
            bk as (
                select doc_id, 0 as band,
                       md5(cast(h0 as varchar) || '_' || cast(h1 as varchar)) as bucket
                from sig
                union all
                select doc_id, 1 as band,
                       md5(cast(h2 as varchar) || '_' || cast(h3 as varchar)) as bucket
                from sig)
            select distinct a.doc_id as id_a, b.doc_id as id_b
            from bk a join bk b on a.band = b.band and a.bucket = b.bucket
            where a.doc_id < b.doc_id
        """,
        "exact_dedup": """
            select md5(text) as text_hash,
                   min(doc_id) as keep_id,
                   cast(count(*) as bigint) as n_dups
            from documents group by md5(text)
        """,
        "ngram_jaccard_pairs": f"""
            with t as (
                select source as block, doc_id,
                       list_distinct({toks}) as toks
                from documents)
            select a.block, a.doc_id as id_a, b.doc_id as id_b,
                   round(
                     len(list_intersect(a.toks, b.toks))::double /
                     (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))),
                     6) as jaccard
            from t a join t b on a.block = b.block and a.doc_id < b.doc_id
            where round(
                     len(list_intersect(a.toks, b.toks))::double /
                     (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))),
                     6) >= 0.5
        """,
        "embedding_neardup": """
            select a.vec_id as id_a, b.vec_id as id_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) as cos
            from embeddings a join embeddings b on a.vec_id < b.vec_id
            where round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.35
        """,
        "ann_topk": """
            with scored as (
                select q.vec_id as query_id, c.vec_id as neighbor_id,
                       round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) as cos
                from embeddings q join embeddings c on q.vec_id != c.vec_id
                where q.vec_id < 10)
            select query_id, neighbor_id, cos,
                   cast(rk as int) as rank
            from (select *, row_number() over
                     (partition by query_id order by cos desc, neighbor_id asc) as rk
                  from scored)
            where rk <= 5
        """,
        "top1_threshold": """
            select o_custkey, o_orderkey, o_totalprice from (
                select o_custkey, o_orderkey, o_totalprice,
                       row_number() over (partition by o_custkey
                           order by o_totalprice desc, o_orderkey asc) as rn
                from orders)
            where rn = 1 and o_totalprice >= 100.0
        """,
        "ordered_split": """
            select o_custkey, o_orderkey,
                   cast(ntile(5) over (partition by o_custkey
                        order by o_orderdate asc, o_orderkey asc) as int) as bucket
            from orders
        """,
        "kfold": f"""
            select cast({h("cast(c_custkey as varchar)", "kfold")} % 5 as int) as fold,
                   cast(count(*) as bigint) as n
            from customer group by 1
        """,
        "deterministic_sample": f"""
            select o_custkey, o_orderkey from (
                select o_custkey, o_orderkey,
                       row_number() over (partition by o_custkey
                           order by {h("cast(o_orderkey as varchar)", "negs")} asc,
                                    o_orderkey asc) as rn
                from orders)
            where rn <= 3
        """,
        "pairwise_f1": f"""
            with lab as (
                select 'all' as block_key, cast(vec_id as varchar) as url,
                       label as truth,
                       case when {h("cast(vec_id as varchar)", "perturb")} % 10 < 1
                            then (label + 1) % 10 else label end as pred
                from embeddings),
            tp_fn as (select block_key, sum(n * (n - 1) / 2.0) as tp_fn
                      from (select block_key, truth, count(*) as n
                            from lab group by 1, 2) group by 1),
            tp_fp as (select block_key, sum(n * (n - 1) / 2.0) as tp_fp
                      from (select block_key, pred, count(*) as n
                            from lab group by 1, 2) group by 1),
            tp as (select block_key, sum(n * (n - 1) / 2.0) as tp
                   from (select block_key, truth, pred, count(*) as n
                         from lab group by 1, 2, 3) group by 1)
            select f.block_key,
                   round(case when tp = 0 then 0.0 else tp / tp_fp end, 6) as precision,
                   round(case when tp = 0 then 0.0 else tp / tp_fn end, 6) as recall,
                   round(case when tp = 0 then 0.0
                         else 2 * (tp / tp_fp) * (tp / tp_fn) / ((tp / tp_fp) + (tp / tp_fn))
                         end, 6) as f1
            from tp_fn f join tp_fp p using (block_key) join tp using (block_key)
            where f.tp_fn > 0
        """,
        "lineitem_pricing_summary": """
            select l_returnflag, l_linestatus,
                   cast(sum(cast(round(l_quantity, 4) as decimal(18,4))) as double) as sum_qty,
                   cast(sum(cast(round(l_extendedprice, 4) as decimal(18,4))) as double) as sum_base_price,
                   cast(count(*) as bigint) as count_order
            from lineitem
            where l_shipdate <= timestamp '1998-09-02 00:00:00'
            group by l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            select n_name,
                   cast(sum(cast(round(o_totalprice, 4) as decimal(18,4))) as double) as revenue,
                   cast(count(*) as bigint) as n_orders
            from orders join customer on o_custkey = c_custkey
                        join nation on c_nationkey = n_nationkey
            group by n_name
        """,
        "window_topk": """
            select o_custkey, o_orderkey, round(o_totalprice, 4) as price,
                   cast(rk as int) as rk
            from (select o_custkey, o_orderkey, o_totalprice,
                         row_number() over (partition by o_custkey
                             order by o_totalprice desc, o_orderkey asc) as rk
                  from orders)
            where rk <= 3
        """,
        "token_stats": f"""
            select doc_id,
                   cast(len({toks}) as bigint) as n_tokens,
                   cast(len(regexp_extract_all(text,
                        '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) as bigint) as n_pieces,
                   cast(len(text) as bigint) as n_chars_actual
            from documents
        """,
        "stopword_ratio": f"""
            select doc_id,
                   round(case when len({toks}) > 0
                         then len(list_filter({toks},
                                  _tk -> list_contains({stop17}, _tk)))::double
                              / len({toks})
                         else 0.0 end, 6) as en_ratio
            from documents
        """,
        "quality_score": f"""
            with s as (
                select doc_id,
                       len({toks}) as n_toks,
                       len(list_distinct({toks})) as n_dist,
                       len(list_filter({toks},
                           _tk -> list_contains({stop17}, _tk))) as n_stop
                from documents)
            select doc_id,
                   round(0.4 * least(1.0, n_toks / 100.0)
                       + 0.3 * (case when n_toks > 0 then n_dist::double / n_toks else 0.0 end)
                       + 0.3 * (1.0 - abs((case when n_toks > 0
                                     then n_stop::double / n_toks else 0.0 end) - 0.4)),
                       6) as quality
            from s
        """,
        "fingerprint": f"""
            select doc_id, {h("text", "fp")} as fingerprint from documents
        """,
        "events_hourly": """
            select strftime(date_trunc('hour', ts), '%Y-%m-%d %H') as hour,
                   event_type,
                   cast(count(*) as bigint) as n_events,
                   cast(sum(cast(round(value, 4) as decimal(18,4))) as double) as total_value
            from events group by 1, 2
        """,
        "lang_id": f"""
            with r as (
                select doc_id,
                       case when len({toks}) > 0
                            then len(list_filter({toks}, _tk -> list_contains({stop17}, _tk)))::double / len({toks})
                            else 0.0 end as r_en,
                       case when len({toks}) > 0
                            then len(list_filter({toks}, _tk -> list_contains(
                                ['der','die','das','und','ist','nicht','mit','ein','eine','zu'], _tk)))::double / len({toks})
                            else 0.0 end as r_de,
                       case when len({toks}) > 0
                            then len(list_filter({toks}, _tk -> list_contains(
                                ['le','la','les','et','est','une','pas','pour','que','dans'], _tk)))::double / len({toks})
                            else 0.0 end as r_fr
                from documents)
            select doc_id,
                   case when r_en >= r_de and r_en >= r_fr and r_en > 0.08 then 'en'
                        when r_de >= r_fr and r_de > 0.08 then 'de'
                        when r_fr > 0.08 then 'fr'
                        else 'und' end as lang_pred
            from r
        """,
        "idf_table": f"""
            with docs as (select list_distinct({toks}) as toks from documents),
            n as (select count(*) as n_docs from documents),
            df as (select unnest(toks) as token from docs)
            select token, round(ln((select n_docs from n)::double / count(*)), 6) as idf
            from df group by token
        """,
        "stacking_features": """
            with scored as (
                select o_custkey as pid, o_orderkey as aid,
                       round(o_totalprice, 2) as score
                from orders),
            w as (
                select pid, aid, score,
                       max(score) over (partition by pid) as mx,
                       min(score) over (partition by pid) as mn,
                       avg(score) over (partition by pid) as mean_raw,
                       count(*) over (partition by pid) as n_cand,
                       max(case when rk = 2 then score end) over (partition by pid) as second
                from (select *, row_number() over
                        (partition by pid order by score desc) as rk from scored))
            select pid, aid, score,
                   round(mx, 5) as max_score,
                   round(case when n_cand = 1 then mx else mean_raw end, 5) as mean_score,
                   case when n_cand = 1 then 0.0
                        else round((mx - second) / (1e-8 + mx - mean_raw), 5) end as gap_over_mean,
                   case when n_cand = 1 then 0.0
                        else round((mx - second) / (1e-8 + mx - mn), 5) end as gap_over_range
            from w
        """,
        "rnd_author_prf": f"""
            with o as (select o_custkey as aid, o_orderkey as pid from orders),
            pred as (
                select case when {h("cast(pid as varchar)", "rndperturb")} % 10 < 1
                            then aid + 1 else aid end as aid, pid
                from o),
            gt as (select aid, count(*) as n_gt from o group by aid),
            pr as (select aid, count(*) as n_pred from pred group by aid),
            inter as (select o.aid, count(*) as n_inter
                      from o join pred on o.aid = pred.aid and o.pid = pred.pid
                      group by o.aid)
            select gt.aid,
                   cast(gt.n_gt as bigint) as n_gt,
                   round(coalesce(inter.n_inter, 0)::double
                         / greatest(coalesce(pr.n_pred, 0), 1), 6) as precision,
                   round(coalesce(inter.n_inter, 0)::double
                         / greatest(gt.n_gt, 1), 6) as recall
            from gt left join pr on gt.aid = pr.aid
                    left join inter on gt.aid = inter.aid
        """,
        "year_sorted_profiles": """
            select o_custkey,
                   string_agg(cast(o_orderkey as varchar), ','
                       order by o_orderdate desc, o_orderkey desc) as orderkeys_desc
            from orders group by o_custkey
        """,
        "salted_distinct_count": """
            select l_suppkey as suppkey,
                   cast(count(distinct l_partkey) as bigint) as n_distinct
            from lineitem group by l_suppkey
        """,
        "name_normalize_census": f"""
            with k as (select c_custkey, cast(c_custkey % 13 as int) as i from customer)
            select c_custkey,
                   list_extract({_dd_names}, i + 1) as raw_name,
                   {_dd_case('i', _NAME_TOKENIZED_GOLDENS)} as tokenized,
                   {_dd_case('i', _NAME_CLEANED_GOLDENS)} as cleaned
            from k
        """,
        "name_match_pairs": f"""
            with k as (select c_custkey, cast(c_custkey % 13 as int) as i from customer)
            select c_custkey,
                   list_extract({_dd_names}, i + 1) as name_a,
                   list_extract({_dd_names}, ((i + 3) % 13) + 1) as name_b,
                   (i = 7) as matched_strict,
                   (i = 7) as matched_loose
            from k
        """,
        "is_chinese_census": _dd_is_chinese_sql(),
        "cluster_name_check": _dd_cluster_check_sql(),
        "bond_threshold_edges": f"""
            with e as (
                select o_custkey as src, o_orderkey as dst,
                       o_orderkey % 4 as val_a,
                       o_custkey % 3 as val_o,
                       (o_orderkey % 10) / 10.0 as attr_o,
                       o_orderkey % 5 as val_v,
                       (o_custkey % 7) / 7.0 as attr_v
                from orders),
            g as (
                select src, dst, val_a, attr_o, attr_v,
                       case when attr_o >= 0.5 then val_o else 0 end as val_o,
                       case when {h("cast(src as varchar) || '#' || cast(dst as varchar)", "bondv")}
                                 / 1152921504606846976.0 >= 0.9
                            then val_v else 0 end as val_v
                from e),
            m as (
                select src, dst,
                       case when val_a > 1 then cast(val_a as double) else 0.0 end as c_a,
                       case when val_o > 0.5 then cast(val_o as double) else 0.0 end as c_o,
                       case when val_v > 1 then cast(val_v as double) else 0.0 end as c_v,
                       case when val_o > 0.5 then attr_o else 0.0 end as g_o,
                       case when val_v > 1 then attr_v else 0.0 end as g_v
                from g)
            select src, dst,
                   round(c_a + c_o + c_v, 6) as value,
                   round(c_a, 6) as attr_a,
                   round(g_o, 6) as attr_o,
                   round(g_v, 6) as attr_v
            from m
            where c_a > 0 or c_o > 0 or c_v > 0
        """,
        "media_meta": """
            select doc_id,
                   cast(case doc_id % 3 when 0 then 24 when 1 then 11 else 10 end as bigint) as n_bytes,
                   case doc_id % 3 when 0 then 'image/png'
                                   when 1 then 'image/jpeg'
                                   else 'image/gif' end as media_type,
                   cast(1 + (n_chars % 2048) as int) as width,
                   cast(1 + (doc_id % 1024) as int) as height
            from documents
        """,
        # the multimodal oracles rebuild the payload as its HEX string in
        # SQL (mirror of synthetic_media_payload_col's fragments) — hex
        # pairs are a bijection of the byte stream, so entropy/printable
        # ratio/frames over pairs equal the Spark side's byte-level math
        "media_byte_features": _MEDIA_HEX_CTE + """
            , b as (select doc_id, hx, unnest(range(0, length(hx)//2)) as g from p)
            select doc_id,
                   count(*)::bigint as n_bytes,
                   round(entropy(substring(hx, (g*2+1)::int, 2)) + 0, 6) as byte_entropy,
                   round(avg(case when substring(hx, (g*2+1)::int, 2)
                                  between '20' and '7E' then 1.0 else 0.0 end), 6)
                     as printable_ratio
            from b group by doc_id
        """,
        "media_frames": _MEDIA_HEX_CTE + """
            , f as (select doc_id, hx,
                           unnest(range(0,
                                        least(48, ((length(hx)//2 - 1)
                                                   - ((length(hx)//2 - 1) % 16))) + 1,
                                        16)) as o
                    from p where length(hx) > 0)
            select doc_id, cast(o // 16 as int) as frame_idx,
                   substring(hx, (o*2+1)::int, 16) as frame_hex
            from f
        """,
        "media_resize_plan": """
            with d as (select doc_id,
                              cast(1 + (n_chars % 2048) as double) as w,
                              cast(1 + (doc_id % 1024) as double) as h
                       from documents),
            s as (select *, least(1.0, 512.0 / greatest(w, h)) as sc from d)
            select doc_id, cast(w as int) as width, cast(h as int) as height,
                   cast(floor(w * sc + 0.5) as int) as target_width,
                   cast(floor(h * sc + 0.5) as int) as target_height
            from s
        """,
        "simhash_pairs": _dd_simhash_sql(),
        "lsh_ann_topk": _dd_lsh_ann_sql(),
        "lsh_neardup": _dd_lsh_neardup_sql(),
        # knrm over SINGLETON sets: the 1×1 sim matrix makes kernel 0 a
        # closed form of the pair cosine — k0 = ln(1 + exp(-(cos-mu0)^2 /
        # (2 sigma^2))), mu0 = -0.975, sigma = 0.1 (similarity.py KNRM grid)
        "knrm_features": """
            with a as (select vec_id as id_a, embedding as ea
                       from embeddings where vec_id < 20),
            b as (select vec_id as id_b, embedding as eb
                  from embeddings where vec_id >= 20 and vec_id < 40),
            p as (select id_a, id_b,
                         list_cosine_similarity(ea::DOUBLE[], eb::DOUBLE[]) as cos
                  from a cross join b)
            select id_a, id_b,
                   cast(41 as int) as knrm_dim,
                   round(ln(1 + exp(-((cos - (-0.975)) * (cos - (-0.975))) / (2 * 0.1 * 0.1))), 6) as k0
            from p
        """,
        # ivf_topk contract query is FULL probe (n_probe = n_centroids):
        # every corpus vector lives in exactly one shard, so the probed
        # union is the whole corpus and the exact brute-force oracle
        # applies (plan keeps the IVF shape; approximate recall is
        # pytest-covered).
        "ivf_topk": """
            with scored as (
                select q.vec_id as query_id, c.vec_id as neighbor_id,
                       round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) as cos
                from embeddings q join embeddings c on q.vec_id != c.vec_id
                where q.vec_id < 10)
            select query_id, neighbor_id, cos,
                   cast(rk as int) as rank
            from (select *, row_number() over
                     (partition by query_id order by cos desc, neighbor_id asc) as rk
                  from scored)
            where rk <= 5
        """,
        "gbdt_scores": _dd_gbdt_sql(),
        "rnd_ensemble_scores": _dd_rnd_ensemble_sql(),
        # ego_graph_features: author node sets = min-8-vec_id per (vec_id
        # % 10) author; kernel 0 closed form as in knrm_features (mu0 =
        # -0.975, sigma 0.1), pooled over the author's node set
        # consensus_clusters: replay the three deterministic clusterings,
        # count per-pair co-cluster agreement, vote strictly (>0.5 of 3
        # runs), and close transitively with a recursive CTE — the same
        # min-member canonical form as the incremental_er oracle. md5 /
        # substr / length are byte-and-char identical across engines on
        # this ASCII corpus.
        "consensus_clusters": """
            with recursive d as (
                select cast(doc_id as varchar) as url,
                       md5(text) as r_exact,
                       md5(lower(substr(text, 1, 64))) as r_prefix,
                       source || '|' ||
                         cast(cast(floor(length(text) / 32) as bigint) as varchar)
                         as r_coarse
                from documents),
            runs as (
                select 'exact' as run_id, url, r_exact as cid from d
                union all select 'prefix', url, r_prefix from d
                union all select 'coarse', url, r_coarse from d),
            voted as (
                select a.url as url_a, b.url as url_b
                from runs a join runs b
                  on a.run_id = b.run_id and a.cid = b.cid and a.url < b.url
                group by a.url, b.url
                having count(*) > 0.5 * 3),
            e as (
                select url_a as src, url_b as dst from voted
                union all
                select url_b, url_a from voted),
            reach(src, dst) as (
                select url, url from d
                union
                select r.src, e.dst from reach r join e on r.dst = e.src),
            part as (
                select src as url, min(dst) as cluster_id
                from reach group by src)
            select url, cluster_id from part
        """,
        # propagation_smoothed: both iterations replayed in chained
        # CTEs. Per-node neighbor sums have ≤2 terms (chain graph), so
        # float addition order cannot differ between engines; the only
        # order-sensitive reduction is the 64-term L2 norm, absorbed by
        # the round-6 like every embedding oracle here. Nodes without
        # neighbors are NOT renormalized (has_nb guard), matching the
        # operator's left-join passthrough exactly.
        "propagation_smoothed": """
            with e0 as (
                select vec_id, t.d, embedding[t.d]::DOUBLE as v
                from embeddings,
                     unnest(generate_series(1, len(embedding))) as t(d)),
            nrm0 as (select vec_id, sqrt(sum(v * v)) as nrm
                     from e0 group by vec_id),
            x0 as (select e0.vec_id, d,
                          case when nrm = 0 then v else v / nrm end as v
                   from e0 join nrm0 using (vec_id)),
            ed as (select a.vec_id as src, a.vec_id + 1 as dst,
                          (1.0 + (a.vec_id % 3))::DOUBLE as w
                   from embeddings a
                   join embeddings b on b.vec_id = a.vec_id + 1
                   where a.vec_id % 4 < 3),
            sym as (select src as id, dst as nb, w from ed
                    union all
                    select dst as id, src as nb, w from ed),
            n1 as (select s.id as vec_id, x.d,
                          sum(s.w * x.v) / sum(s.w) as nv
                   from sym s join x0 x on x.vec_id = s.nb
                   group by s.id, x.d),
            t1 as (select x0.vec_id, x0.d,
                          case when n1.nv is null then x0.v
                               else 0.5 * x0.v + 0.5 * n1.nv end as v,
                          n1.nv is not null as has_nb
                   from x0 left join n1 using (vec_id, d)),
            r1 as (select vec_id, sqrt(sum(v * v)) as nrm
                   from t1 group by vec_id),
            x1 as (select t1.vec_id, d,
                          case when not has_nb then v
                               when nrm = 0 then v
                               else v / nrm end as v
                   from t1 join r1 using (vec_id)),
            n2 as (select s.id as vec_id, x.d,
                          sum(s.w * x.v) / sum(s.w) as nv
                   from sym s join x1 x on x.vec_id = s.nb
                   group by s.id, x.d),
            t2 as (select x1.vec_id, x1.d,
                          case when n2.nv is null then x1.v
                               else 0.5 * x1.v + 0.5 * n2.nv end as v,
                          n2.nv is not null as has_nb
                   from x1 left join n2 using (vec_id, d)),
            r2 as (select vec_id, sqrt(sum(v * v)) as nrm
                   from t2 group by vec_id),
            x2 as (select t2.vec_id, d,
                          case when not has_nb then v
                               when nrm = 0 then v
                               else v / nrm end as v
                   from t2 join r2 using (vec_id))
            select vec_id, cast(d as int) as dim, round(v, 6) as val
            from x2
        """,
        # gopher_repetition: top-n-gram char fraction (mode n-gram,
        # occurrence-weighted — the Dolma/NeMo convention) + exact
        # duplicated-n-gram char COVERAGE (interval-union sweep over
        # 0-based char offsets of the single-space-joined token
        # stream). The sweep replays Spark's running-max window verbatim
        # (order by start, end; contrib = e - max(s-1, prev_max)).
        "gopher_repetition": f"""
            with base as (
                select doc_id, {toks} as tk,
                       case when len({toks}) > 0
                            then len(array_to_string({toks}, ' '))
                            else 0 end as norm_len
                from documents),
            g2 as (select doc_id, array_to_string(list_slice(tk, i, i + 1), ' ') as gram
                   from base, unnest(range(1, len(tk))) as u(i)
                   where len(tk) >= 2),
            c2 as (select doc_id, gram, count(*) as cnt from g2 group by 1, 2),
            top2 as (select * from (
                        select doc_id, gram, cnt,
                               row_number() over (partition by doc_id
                                   order by cnt desc, gram asc) as rk
                        from c2) where rk = 1),
            g3 as (select doc_id, array_to_string(list_slice(tk, i, i + 2), ' ') as gram
                   from base, unnest(range(1, len(tk) - 1)) as u(i)
                   where len(tk) >= 3),
            c3 as (select doc_id, gram, count(*) as cnt from g3 group by 1, 2),
            top3 as (select * from (
                        select doc_id, gram, cnt,
                               row_number() over (partition by doc_id
                                   order by cnt desc, gram asc) as rk
                        from c3) where rk = 1),
            tok as (select doc_id, norm_len, unnest(tk) as tok,
                           unnest(range(len(tk))) as pos
                    from base),
            cm as (select doc_id, norm_len, tok, pos,
                          sum(len(tok) + 1) over (partition by doc_id
                              order by pos) as cum
                   from tok),
            o2 as (select * from (
                      select doc_id, norm_len,
                             concat_ws(' ', tok, lead(tok, 1) over w) as gram,
                             cum - len(tok) - 1 as s,
                             lead(cum, 1) over w - 2 as e
                      from cm
                      window w as (partition by doc_id order by pos))
                   where e is not null),
            d2 as (select * from (
                      select o2.*, count(*) over (partition by doc_id, gram) as cnt
                      from o2) where cnt > 1),
            s2 as (select doc_id,
                          greatest(0, e - greatest(s - 1,
                              coalesce(max(e) over (partition by doc_id
                                  order by s, e rows between unbounded preceding
                                  and 1 preceding), -1))) as contrib
                   from d2),
            v2 as (select doc_id, sum(contrib) as dup_chars from s2 group by 1),
            o3 as (select * from (
                      select doc_id, norm_len,
                             concat_ws(' ', tok, lead(tok, 1) over w,
                                       lead(tok, 2) over w) as gram,
                             cum - len(tok) - 1 as s,
                             lead(cum, 2) over w - 2 as e
                      from cm
                      window w as (partition by doc_id order by pos))
                   where e is not null),
            d3 as (select * from (
                      select o3.*, count(*) over (partition by doc_id, gram) as cnt
                      from o3) where cnt > 1),
            s3 as (select doc_id,
                          greatest(0, e - greatest(s - 1,
                              coalesce(max(e) over (partition by doc_id
                                  order by s, e rows between unbounded preceding
                                  and 1 preceding), -1))) as contrib
                   from d3),
            v3 as (select doc_id, sum(contrib) as dup_chars from s3 group by 1)
            select b.doc_id,
                   round(case when b.norm_len > 0
                         then coalesce(top2.cnt * len(top2.gram), 0)::double / b.norm_len
                         else 0.0 end, 6) as top2gram_frac,
                   round(case when b.norm_len > 0
                         then coalesce(top3.cnt * len(top3.gram), 0)::double / b.norm_len
                         else 0.0 end, 6) as top3gram_frac,
                   round(case when b.norm_len > 0
                         then coalesce(v2.dup_chars, 0)::double / b.norm_len
                         else 0.0 end, 6) as dup2gram_frac,
                   round(case when b.norm_len > 0
                         then coalesce(v3.dup_chars, 0)::double / b.norm_len
                         else 0.0 end, 6) as dup3gram_frac
            from base b
            left join top2 on b.doc_id = top2.doc_id
            left join top3 on b.doc_id = top3.doc_id
            left join v2 on b.doc_id = v2.doc_id
            left join v3 on b.doc_id = v3.doc_id
        """,
        # crossdoc_span_dedup: 8-grams shared by >= 2 distinct docs,
        # token-position interval union per doc (same sweep); the flag
        # compares the ROUNDED fraction like the Spark side. The oracle
        # meets on RAW gram strings (exact); the Spark plan shuffles
        # xxhash64 keys instead — the hash never reaches the output.
        "crossdoc_span_dedup": f"""
            with base as (select doc_id, {toks} as tk from documents),
            g as (select doc_id, i - 1 as pos,
                         array_to_string(list_slice(tk, i, i + 7), ' ') as gh
                  from base, unnest(range(1, len(tk) - 6)) as u(i)
                  where len(tk) >= 8),
            c as (select gh from g group by gh
                  having count(distinct doc_id) >= 2),
            dup as (select doc_id, pos as s, pos + 7 as e
                    from g join c using (gh)),
            swp as (select doc_id,
                           greatest(0, e - greatest(s - 1,
                               coalesce(max(e) over (partition by doc_id
                                   order by s, e rows between unbounded preceding
                                   and 1 preceding), -1))) as contrib
                    from dup),
            cov as (select doc_id, sum(contrib) as dup_tokens from swp group by 1),
            fin as (select b.doc_id,
                           cast(len(b.tk) as bigint) as n_tokens,
                           cast(coalesce(cov.dup_tokens, 0) as bigint) as dup_tokens,
                           round(case when len(b.tk) > 0
                                 then coalesce(cov.dup_tokens, 0)::double / len(b.tk)
                                 else 0.0 end, 6) as dup_token_frac
                    from base b left join cov using (doc_id))
            select doc_id, n_tokens, dup_tokens, dup_token_frac,
                   cast(case when dup_token_frac >= 0.5 then 1 else 0 end as int) as is_dup
            from fin
        """,
        # crossdoc_span_removed: ownership = min(doc_id) per shared
        # gram; removed positions = union of non-owner covering windows
        # (position-exploded — the oracle needn't mirror the Spark
        # plan's interval sweep, only its result); clean_text rebuilt
        # by ordered string_agg over surviving token positions.
        "crossdoc_span_removed": f"""
            with base as (select doc_id, {toks} as tk from documents),
            tok as (select doc_id, unnest(tk) as tok,
                           unnest(range(len(tk))) as pos
                    from base),
            g as (select doc_id, i - 1 as pos,
                         array_to_string(list_slice(tk, i, i + 7), ' ') as gh
                  from base, unnest(range(1, len(tk) - 6)) as u(i)
                  where len(tk) >= 8),
            c as (select gh, min(doc_id) as owner from g
                  group by gh having count(distinct doc_id) >= 2),
            doomed as (select g.doc_id, g.pos from g join c using (gh)
                       where g.doc_id != c.owner),
            cut as (select distinct doc_id, pos + d as cutpos
                    from doomed, unnest(range(0, 8)) as r(d)),
            keptagg as (select t.doc_id,
                               count(*) filter (where cut.cutpos is null) as kept,
                               coalesce(string_agg(t.tok, ' ' order by t.pos)
                                   filter (where cut.cutpos is null), '') as clean_text
                        from tok t
                        left join cut on cut.doc_id = t.doc_id
                                     and cut.cutpos = t.pos
                        group by t.doc_id)
            select b.doc_id,
                   cast(len(b.tk) as bigint) as n_tokens,
                   cast(coalesce(k.kept, 0) as bigint) as kept_tokens,
                   cast(len(b.tk) - coalesce(k.kept, 0) as bigint) as removed_tokens,
                   coalesce(k.clean_text, '') as clean_text
            from base b left join keptagg k using (doc_id)
        """,
        # quality_filter: the composed keep decision — each gate
        # re-derived from the same SQL its standalone query uses, all
        # thresholds compared on the ROUND(6) values like the Spark
        # side. lang != 'und' <=> some when-chain clause fires.
        "quality_filter": f"""
            with base as (
                select doc_id, {toks} as tk,
                       case when len({toks}) > 0
                            then len(array_to_string({toks}, ' '))
                            else 0 end as norm_len
                from documents),
            lq as (select doc_id, len(tk) as n, len(list_distinct(tk)) as d,
                          len(list_filter(tk, _tk -> list_contains({stop17}, _tk))) as st,
                          len(list_filter(tk, _tk -> list_contains(
                              ['der','die','das','und','ist','nicht','mit','ein','eine','zu'], _tk))) as de_h,
                          len(list_filter(tk, _tk -> list_contains(
                              ['le','la','les','et','est','une','pas','pour','que','dans'], _tk))) as fr_h
                   from base),
            gates1 as (select doc_id,
                              case when n > 0 then st::double / n else 0.0 end as r_en,
                              case when n > 0 then de_h::double / n else 0.0 end as r_de,
                              case when n > 0 then fr_h::double / n else 0.0 end as r_fr,
                              round(0.4 * least(1.0, n / 100.0)
                                  + 0.3 * (case when n > 0 then d::double / n else 0.0 end)
                                  + 0.3 * (1.0 - abs((case when n > 0 then st::double / n
                                                      else 0.0 end) - 0.4)), 6) as quality
                       from lq),
            flag1 as (select doc_id,
                             case when (r_en >= r_de and r_en >= r_fr and r_en > 0.03)
                                    or (r_de >= r_fr and r_de > 0.03)
                                    or (r_fr > 0.03) then 0 else 1 end as flag_lang,
                             case when quality < 0.5 then 1 else 0 end as flag_quality
                      from gates1),
            g2 as (select doc_id, array_to_string(list_slice(tk, i, i + 1), ' ') as gram
                   from base, unnest(range(1, len(tk))) as u(i)
                   where len(tk) >= 2),
            c2 as (select doc_id, gram, count(*) as cnt from g2 group by 1, 2),
            top2 as (select * from (
                        select doc_id, gram, cnt,
                               row_number() over (partition by doc_id
                                   order by cnt desc, gram asc) as rk
                        from c2) where rk = 1),
            tok as (select doc_id, norm_len, unnest(tk) as tok,
                           unnest(range(len(tk))) as pos
                    from base),
            cm as (select doc_id, norm_len, tok, pos,
                          sum(len(tok) + 1) over (partition by doc_id
                              order by pos) as cum
                   from tok),
            o2 as (select * from (
                      select doc_id, norm_len,
                             concat_ws(' ', tok, lead(tok, 1) over w) as gram,
                             cum - len(tok) - 1 as s,
                             lead(cum, 1) over w - 2 as e
                      from cm
                      window w as (partition by doc_id order by pos))
                   where e is not null),
            d2 as (select * from (
                      select o2.*, count(*) over (partition by doc_id, gram) as cnt
                      from o2) where cnt > 1),
            s2 as (select doc_id,
                          greatest(0, e - greatest(s - 1,
                              coalesce(max(e) over (partition by doc_id
                                  order by s, e rows between unbounded preceding
                                  and 1 preceding), -1))) as contrib
                   from d2),
            v2 as (select doc_id, sum(contrib) as dup_chars from s2 group by 1),
            flag2 as (select b.doc_id,
                             case when round(case when b.norm_len > 0
                                        then coalesce(top2.cnt * len(top2.gram), 0)::double / b.norm_len
                                        else 0.0 end, 6) > 0.25
                                    or round(case when b.norm_len > 0
                                        then coalesce(v2.dup_chars, 0)::double / b.norm_len
                                        else 0.0 end, 6) > 0.35
                                  then 1 else 0 end as flag_repetition
                      from base b
                      left join top2 on b.doc_id = top2.doc_id
                      left join v2 on b.doc_id = v2.doc_id),
            g8 as (select doc_id, i - 1 as pos,
                          array_to_string(list_slice(tk, i, i + 7), ' ') as gh
                   from base, unnest(range(1, len(tk) - 6)) as u(i)
                   where len(tk) >= 8),
            c8 as (select gh from g8 group by gh
                   having count(distinct doc_id) >= 2),
            dup8 as (select doc_id, pos as s, pos + 7 as e
                     from g8 join c8 using (gh)),
            swp8 as (select doc_id,
                            greatest(0, e - greatest(s - 1,
                                coalesce(max(e) over (partition by doc_id
                                    order by s, e rows between unbounded preceding
                                    and 1 preceding), -1))) as contrib
                     from dup8),
            cov8 as (select doc_id, sum(contrib) as dup_tokens from swp8 group by 1),
            flag3 as (select b.doc_id,
                             case when round(case when len(b.tk) > 0
                                        then coalesce(cov8.dup_tokens, 0)::double / len(b.tk)
                                        else 0.0 end, 6) >= 0.5
                                  then 1 else 0 end as flag_dup
                      from base b left join cov8 on b.doc_id = cov8.doc_id)
            select f1.doc_id,
                   cast(f1.flag_lang as int) as flag_lang,
                   cast(f1.flag_quality as int) as flag_quality,
                   cast(f2.flag_repetition as int) as flag_repetition,
                   cast(f3.flag_dup as int) as flag_dup,
                   cast(case when f1.flag_lang = 0 and f1.flag_quality = 0
                              and f2.flag_repetition = 0 and f3.flag_dup = 0
                        then 1 else 0 end as int) as keep
            from flag1 f1
            join flag2 f2 on f1.doc_id = f2.doc_id
            join flag3 f3 on f1.doc_id = f3.doc_id
        """,
        # url_canonical: same synthesized messy URL, canonicalized with
        # DuckDB's own regex/list pipeline (RE2; \\1 backrefs; list_sort
        # byte-ascending matches array_sort on ASCII).
        "url_canonical": r"""
            with u as (
                select doc_id,
                       (case when doc_id % 3 = 0 then 'HTTP://WWW.'
                             else 'http://' end)
                       || source || '.Example.COM'
                       || (case when doc_id % 4 = 0 then ':80' else '' end)
                       || '/Docs/' || cast(doc_id as varchar)
                       || (case when doc_id % 5 = 0 then '/' else '' end)
                       || (case when doc_id % 2 = 0 then '?utm_source=x&b=2&a=1'
                                else '?b=2&a=1&ref=t' end)
                       || (case when doc_id % 7 = 0 then '#sec' else '' end)
                       as url
                from documents),
            p as (select doc_id, url,
                         lower(regexp_extract(url,
                             '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) as scheme,
                         lower(regexp_extract(url,
                             '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) as hostport,
                         regexp_extract(url,
                             '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)', 1) as rest
                  from u),
            q as (select *,
                         regexp_replace(regexp_replace(hostport, ':[0-9]+$', ''),
                                        '^www\.', '') as host,
                         regexp_extract(hostport, ':([0-9]+)$', 1) as port,
                         regexp_extract(rest, '^([^?]*)', 1) as path0,
                         regexp_extract(rest, '^[^?]*\?([^#]*)', 1) as query
                  from p),
            r as (select *,
                         case when path0 = '' then '/'
                              else regexp_replace(path0, '(.)/$', '\1') end as path,
                         list_sort(list_filter(string_split(query, '&'),
                             x -> len(x) > 0 and not regexp_matches(x,
                                 '^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|ref)=')))
                             as params
                  from q)
            select doc_id, url,
                   case when scheme = '' then url else
                        scheme || '://' || host
                        || (case when port != ''
                                  and not (scheme = 'http' and port = '80')
                                  and not (scheme = 'https' and port = '443')
                             then ':' || port else '' end)
                        || path
                        || (case when len(params) > 0
                             then '?' || array_to_string(params, '&')
                             else '' end)
                   end as canon_url
            from r
        """,
        # user_sessions: lag/cumsum sessionization with the pinned
        # boundary (merge at exactly-gap -> new session iff diff > 30m);
        # end = last ts + gap; decimal value sums are order-exact.
        "user_sessions": """
            with e as (select user_id, ts,
                              cast(round(value, 4) as decimal(18,4)) as v
                       from events),
            x as (select user_id, ts, v,
                         case when lag(ts) over w is null
                               or ts - lag(ts) over w > interval 30 minute
                              then 1 else 0 end as ns
                  from e window w as (partition by user_id order by ts)),
            s as (select *, sum(ns) over (partition by user_id order by ts
                         rows unbounded preceding) as sid
                  from x)
            select user_id,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') as session_start,
                   strftime(max(ts) + interval 30 minute,
                            '%Y-%m-%d %H:%M:%S.%f') as session_end,
                   cast(count(*) as bigint) as n_events,
                   cast(sum(v) as double) as session_value
            from s group by user_id, sid
        """,
        # bpe_pair_counts: chars via regexp_extract_all('.') (RE2 '.'
        # excludes newlines; the corpus words are newline-free), </w>
        # appended, adjacent pairs by 1-based list indexing.
        "bpe_pair_counts": f"""
            with w as (
                select word, count(*) as c
                from (select unnest({toks}) as word from documents)
                group by 1),
            s as (select c,
                         list_append(regexp_extract_all(word, '.'), '</w>') as syms
                  from w),
            p as (select syms[i] as a, syms[i + 1] as b, c
                  from s, unnest(range(1, len(syms))) as u(i))
            select a, b, cast(sum(c) as bigint) as n
            from p group by 1, 2
        """,
        "ego_graph_features": """
            with m as (
                select cast(vec_id % 10 as varchar) as aid, vec_id, embedding,
                       row_number() over
                           (partition by vec_id % 10 order by vec_id) as rn
                from embeddings),
            nodes as (select aid, embedding from m where rn <= 8),
            q as (select vec_id as pid, embedding from embeddings
                  where vec_id < 20),
            sc as (select q.pid, n.aid,
                          list_cosine_similarity(
                              q.embedding::DOUBLE[], n.embedding::DOUBLE[]
                          ) as cos
                   from q cross join nodes n)
            select pid, aid,
                   round(max(cos), 4) as max_cos,
                   round(avg(cos), 4) as mean_cos,
                   round(ln(1 + sum(exp(
                       -((cos - (-0.975)) * (cos - (-0.975))) / (2 * 0.1 * 0.1)
                   ))), 4) as knrm_k0
            from sc group by pid, aid
        """,
        # incremental_er: the streaming assigner's merge rule makes its
        # final partition EXACTLY the connected components of the ≥0.5
        # tanimoto graph within blocks (order-independent; see
        # streaming/incremental_er.py docstring), so the oracle is an
        # independent recursive-CTE transitive closure canonicalized to
        # the min member url. Tanimoto = |∩|/|∪| over distinct
        # whitespace tokens; both engines compare the same exact IEEE
        # double (integer ÷ integer), so no rounding is needed at the
        # threshold.
        "incremental_er": f"""
            with recursive t as (
                select source as block, cast(doc_id as varchar) as url,
                       list_distinct({toks}) as toks
                from documents),
            e as (
                select a.block, a.url as src, b.url as dst
                from t a join t b
                  on a.block = b.block and a.url <> b.url
                where (len(a.toks) + len(b.toks)
                       - len(list_intersect(a.toks, b.toks))) > 0
                  and len(list_intersect(a.toks, b.toks))::double
                      / (len(a.toks) + len(b.toks)
                         - len(list_intersect(a.toks, b.toks))) >= 0.5),
            reach(src, dst) as (
                select url, url from t
                union
                select r.src, e.dst from reach r join e on r.dst = e.src),
            part as (
                select src as url, min(dst) as cluster from reach group by src)
            select t.url, t.block as block_key, part.cluster
            from t join part on t.url = part.url
        """,
    }
