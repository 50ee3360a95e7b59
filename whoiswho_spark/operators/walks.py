"""Meta-path random walks over paper–token bipartite graphs
(SURVEY.md §2.8 'Meta-path random walks').

The reference's WMRW (/root/reference/whoiswho/featureGenerator/
sndFeature/relational_features.py:60-124) walks paper→author/org/venue→
paper chains, 5 walks × length 20 per paper, then feeds the walk corpus
to word2vec. Re-expressed as an iterative DataFrame loop:

- one hop = two sampled joins (node→token, token→node);
- "random" neighbor choice is a seeded hash pick: row_number over
  (partition by source, order by hash60(neighbor, walk#step#seed)) == 1 —
  deterministic across runs/engines, independent per (walk, step), which
  replaces the reference's unseeded random.choice (SURVEY.md §7.3
  determinism note);
- lineage cut with localCheckpoint every few hops (same discipline as
  the connected-components loop).

Output: (walk_id, start node, the node sequence as an array) — the
word2vec corpus rows. Each hop is two shuffles on bounded keys; no
driver-side graph state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whoiswho_spark.operators.blocking import hash60


def _pick_one(df: DataFrame, part_col: str, order_col: str) -> DataFrame:
    """One row per partition key, chosen by the (hash-valued) order
    column — the deterministic 'random choice'."""
    w = Window.partitionBy(part_col).orderBy(F.col(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", order_col)
    )


def meta_path_walks(
    edges: DataFrame,
    n_walks: int = 5,
    walk_len: int = 20,
    seed: int = 42,
    node_col: str = "pid",
    token_col: str = "token",
    starts: DataFrame | None = None,
) -> DataFrame:
    """edges(pid, token) bipartite → walks(walk_id, start, path ARRAY<STRING>).

    walk_len counts paper-nodes in the path (like the reference's
    numwalklength over paper hops). Dead ends terminate the walk early
    (path keeps its prefix — a frozen walk is carried forward, not
    dropped). ``starts`` (column ``node_col``) defaults to every node in
    ``edges``; pass it explicitly to walk from a universe that includes
    token-less nodes (the reference walks every paper in the block,
    relational_features.py:100-107, even ones contributing no tokens —
    those emit a length-1 path here).
    """
    if starts is None:
        starts = edges.select(node_col).distinct()
    else:
        starts = starts.select(node_col).distinct()
    cur = starts.select(
        F.col(node_col).alias("node"),
        F.explode(
            F.array(*[F.lit(i) for i in range(n_walks)])
        ).alias("walk"),
    ).select(
        F.concat_ws("#", "node", "walk").alias("walk_id"),
        F.col("node").alias("start"),
        F.col("node"),
        F.array(F.col("node")).alias("path"),
        F.lit(False).alias("done"),
    )

    fwd = edges.select(F.col(node_col).alias("node"), F.col(token_col).alias("tok"))
    bwd = edges.select(F.col(token_col).alias("tok"), F.col(node_col).alias("nxt"))

    for step in range(walk_len - 1):
        # frozen (dead-ended) walks carry their prefix forward — no joins,
        # just a union back in at the end of the step
        active = cur.where(~F.col("done")).drop("done")
        frozen = cur.where(F.col("done"))
        # hop 1: node → one token (independent pick per walk+step: the
        # hash mixes walk_id, step, seed, and the candidate). LEFT join:
        # a node with no outgoing edge yields one null-token row, which
        # freezes the walk with its prefix intact instead of dropping it.
        hop1 = _pick_one(
            active.join(fwd, "node", "left").withColumn(
                "_pick",
                hash60(
                    F.concat_ws("#", "walk_id", F.lit(str(step)), F.lit(str(seed)), "tok"),
                    "t",
                ),
            ),
            "walk_id",
            "_pick",
        ).select("walk_id", "start", "node", "path", "tok")
        newly_dead = hop1.where(F.col("tok").isNull()).select(
            "walk_id", "start", "node", "path", F.lit(True).alias("done")
        )
        # hop 2: token → one next paper (per walk). Every token reached via
        # hop 1 has at least the back-edge it came from, so hop 2 cannot
        # dead-end on a bipartite edge table.
        hop2 = _pick_one(
            hop1.where(F.col("tok").isNotNull())
            .select("walk_id", "start", "path", "tok")
            .join(bwd, "tok")
            .withColumn(
                "_pick",
                hash60(
                    F.concat_ws("#", "walk_id", F.lit(str(step)), F.lit(str(seed)), "nxt"),
                    "n",
                ),
            ),
            "walk_id",
            "_pick",
        ).select(
            "walk_id",
            "start",
            F.col("nxt").alias("node"),
            F.concat(F.col("path"), F.array(F.col("nxt"))).alias("path"),
            F.lit(False).alias("done"),
        )
        cur = hop2.unionByName(newly_dead).unionByName(frozen)
        if step % 5 == 4:
            cur = cur.localCheckpoint()

    return cur.select("walk_id", "start", "path")
