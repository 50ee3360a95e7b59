"""Blocking stage — the web analog of WhoIsWho's author-name blocks.

The reference regroups all papers under each normalized author name
(/root/reference/whoiswho/dataset/data_process.py:60-84) and runs every
downstream stage per block. Our block key is ``normalized host`` +
``MinHash/LSH band bucket over title tokens`` (BASELINE.json north_star).

Design for 100 TB:
- MinHash signatures are pure Catalyst exprs (md5-based 60-bit hash
  family → ``array_min`` over ``transform``): whole-stage codegen, zero
  Python, zero shuffle to compute. The hash family is deterministic and
  engine-portable (same values in DuckDB SQL → oracle-checkable).
- one ``explode`` over bands → (url, block_key); the only shuffle in this
  stage is the downstream self-join's exchange on block_key.
- head-domain skew: per-block size caps via ``row_number()`` windows
  (the analog of the reference's per-author paper caps,
  adhoc_features.py:38,105 / oagbert_features.py:45) plus salted
  replicate-join in pairs.py; AQE skew-join is the backstop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whoiswho_spark.functions.normalize import norm_text_col, title_tokens_col

DEFAULT_NUM_HASHES = 8
DEFAULT_BANDS = 4


def hash60(col: Column, salt: str | int) -> Column:
    """Deterministic 60-bit hash: first 15 hex chars of md5(token ':' salt).

    Portable across engines: Spark ``conv(substr(md5(..)))`` and DuckDB
    ``('0x' || substring(md5(..)))::BIGINT`` produce identical values —
    blocking keys are byte-stable across runs and engines.
    """
    return F.conv(
        F.substring(F.md5(F.concat(col, F.lit(f":{salt}"))), 1, 15), 16, 10
    ).cast("bigint")


def normalized_host_col(url: Column) -> Column:
    """Host from url, lowercased, leading 'www.' stripped. The url is
    lowercased BEFORE the scheme regex: RFC 3986 schemes are
    case-insensitive ('HTTP://…' is legal crawl data) and extracting
    from the raw string would return '' for them — collapsing every
    uppercase-scheme url into one shared empty-host block."""
    host = F.regexp_extract(F.lower(url), r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
    return F.regexp_replace(host, r"^www\.", "")


def minhash_signature_cols(tokens: Column, num_hashes: int) -> list[Column]:
    """k independent MinHash values over a token array — array_min over a
    per-hash transform; empty/null token arrays hash a sentinel so every
    row gets a block (singleton blocks are harmless)."""
    safe = F.when(
        tokens.isNull() | (F.size(tokens) == 0), F.array(F.lit("__empty__"))
    ).otherwise(tokens)

    def _hash_fn(k: int):
        # Must be a UNARY lambda: a two-parameter lambda (e.g. the
        # `lambda t, k=k:` closure idiom) is interpreted by transform() as
        # its (element, index) binary form, silently passing the index
        # column as the second arg.
        return lambda t: hash60(t, k)

    return [F.array_min(F.transform(safe, _hash_fn(k))) for k in range(num_hashes)]


def lsh_block_keys(
    df: DataFrame,
    url: str = "url",
    title: str = "title",
    host: str = "host",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """(url, ...) → (url, block_key), one row per LSH band.

    block_key = host | band_index | md5(band minhashes). Same-band equal
    signatures ⇒ same block. Multiple bands trade recall vs block size;
    downstream pair-dedup (url_a,url_b distinct) removes multi-band hits.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes={num_hashes} must be divisible by bands={bands}: "
            "the trailing hashes would be computed and silently discarded"
        )
    rows_per_band = num_hashes // bands
    # tokenize + dedupe ONCE in a prior projection so the per-hash
    # columns share the array instead of re-running the split (see
    # dedup._distinct_tokens_first — ~4× cheaper signatures)
    base = df.select(
        F.col(url),
        F.col(host),
        F.array_distinct(title_tokens_col(norm_text_col(F.col(title)))).alias("_toks"),
    )
    sig = minhash_signature_cols(F.col("_toks"), num_hashes)
    band_keys = []
    for b in range(bands):
        parts = sig[b * rows_per_band : (b + 1) * rows_per_band]
        band_hash = F.md5(F.concat_ws("_", *[p.cast("string") for p in parts]))
        band_keys.append(
            F.concat_ws("|", F.col(host), F.lit(str(b)), F.substring(band_hash, 1, 16))
        )
    return base.select(
        F.col(url),
        F.explode(F.array(*band_keys)).alias("block_key"),
    )


def cap_block_size(blocks: DataFrame, cap: int, order_col: str = "url") -> DataFrame:
    """Deterministic per-block cap — the scale guard against boilerplate
    mega-blocks (reference analog: maxPapers caps). Keeps the ``cap``
    lowest-hash members so the choice is stable across runs/engines
    (secondary key on the raw column breaks 60-bit hash-collision ties —
    same discipline as rnd.deterministic_sample)."""
    w = Window.partitionBy("block_key").orderBy(
        hash60(F.col(order_col), "cap"), F.asc(order_col)
    )
    return (
        blocks.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)
        .drop("_rn")
    )


def salted_distinct_count(
    df: DataFrame, key: str, val: str, n_salts: int = 16
) -> DataFrame:
    """Exact countDistinct per key via two-phase salted aggregation
    (SURVEY.md §4 custom-work #3): phase 1 dedupes values inside
    (key, salt) sub-groups — a heavy-hitter key's value set is split
    across n_salts reducers — phase 2 merges the per-salt sets.
    Result-identical to ``countDistinct`` (oracle-checked); use when one
    key owns enough of the data that a single reducer would spill.
    """
    salted = df.select(
        F.col(key),
        F.col(val),
        F.pmod(hash60(F.col(val).cast("string"), "aggsalt"), F.lit(n_salts)).alias(
            "_salt"
        ),
    )
    # phase 1: per (key, salt) distinct-value count — salts partition the
    # VALUE space, so per-salt counts are disjoint and simply add up
    partial = salted.groupBy(key, "_salt").agg(
        F.countDistinct(val).alias("_part")
    )
    return partial.groupBy(key).agg(
        F.sum("_part").cast("bigint").alias("n_distinct")
    )


def block_stats(blocks: DataFrame) -> DataFrame:
    """Block-size histogram — the skew diagnostic (drives salt choice)."""
    return (
        blocks.groupBy("block_key")
        .agg(F.count("*").alias("block_size"))
        .groupBy("block_size")
        .agg(F.count("*").alias("n_blocks"))
        .orderBy("block_size")
    )
