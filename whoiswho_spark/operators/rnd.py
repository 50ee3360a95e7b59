"""RND-style assignment + sampling/splitting operators (SURVEY.md §2.6-2.7).

The reference's real-time name disambiguation assigns each unassigned
paper to the argmax-scoring candidate profile above a NIL threshold
(/root/reference/whoiswho/training/AutoTrainRND.py:52-71); its data prep
does year-ordered 80/20 splits (data_process.py:323-368), k-fold hashing
(data_process.py:535-576) and per-positive negative sampling
(data_process.py:591-616). Each re-expressed as window/hash exprs —
deterministic (seeded hash order replaces unseeded random.shuffle,
allowed per SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whoiswho_spark.constants import RND_NIL_THRESHOLD
from whoiswho_spark.operators.blocking import hash60


def top1_assign(
    scored: DataFrame,
    item_col: str,
    cand_col: str,
    score_col: str = "score",
    threshold: float = RND_NIL_THRESHOLD,
) -> DataFrame:
    """argmax candidate per item, kept only if score ≥ threshold (NIL
    otherwise — the row simply drops out, AutoTrainRND.py:52-71).
    Tie-break by candidate id for determinism. NaN scores are dropped
    FIRST: Spark orders NaN above every number and evaluates
    NaN >= threshold as true, so a single 0/0-style feature would
    otherwise win the argmax and sail past the NIL gate."""
    w = Window.partitionBy(item_col).orderBy(F.desc(score_col), F.asc(cand_col))
    return (
        scored.where(~F.isnan(F.col(score_col).cast("double")))
        .withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col(score_col) >= threshold))
        .drop("_rn")
    )


def ordered_split(
    df: DataFrame,
    part_col: str,
    order_col: str,
    tiebreak_col: str,
    n_buckets: int = 5,
) -> DataFrame:
    """ntile buckets over a total order within each partition — the
    year-ordered 80/20 split (buckets 1..4 = profile, 5 = unassigned when
    n_buckets=5). Total order (order, tiebreak) keeps both engines and
    reruns identical."""
    w = Window.partitionBy(part_col).orderBy(
        F.asc(order_col), F.asc(tiebreak_col)
    )
    return df.withColumn("bucket", F.ntile(n_buckets).over(w))


def kfold_col(key: Column, k: int = 5) -> Column:
    """Deterministic fold id: portable md5-hash mod k
    (replaces random.shuffle + round-robin, data_process.py:535-576)."""
    return F.pmod(hash60(key.cast("string"), "kfold"), F.lit(k)).cast("int")


def deterministic_sample(
    df: DataFrame,
    part_col: str,
    id_col: str,
    n_per_part: int,
) -> DataFrame:
    """≤ n rows per partition key, chosen by hash order — the seeded
    replacement for `random.sample` negative sampling
    (data_process.py:591-616; per-author caps adhoc_features.py:105)."""
    w = Window.partitionBy(part_col).orderBy(
        hash60(F.col(id_col).cast("string"), "negs"), F.asc(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_part)
        .drop("_rn")
    )
