"""RND ego-graph relational feature channel (SURVEY.md §2.8/§2.9).

The reference builds, per (unassigned paper, candidate author) pair, a
GRAPH PAIR: the paper's ego graph (paper + its reference papers) and
the author's ego graph (author--paper, author--org, paper--refpaper
typed edges over the author's profile,
/root/reference/whoiswho/featureGenerator/rndFeature/
graph_dataloader.py:96-120), runs a GNN over node embeddings and scores
paper-vs-author with a learned matching model
(graph_features.py:96-180). The GNN itself is out of scope per SURVEY
§2.8; what remains — and is the load-bearing relational work at scale —
is the GRAPH CONSTRUCTION (joins) and the paper↔author-node-set scoring,
substituted here by the existing embedding kernels (max/mean cosine +
KNRM pooling, functions/similarity.py), the same substitution the
north star makes for OAG-BERT.

Shapes (all plain DataFrame joins/aggregations):
- ``ego_edge_table``   — the typed edge union (author--paper,
  author--org, paper--refpaper), the relational twin of the reference's
  edges dict; useful for walks/CC consumers.
- ``attach_ego_features`` — candidates(pid, aid) get
  ``f_ego_max_cos`` / ``f_ego_mean_cos`` (Catalyst HOFs over the
  author's node set) and ``f_ego_knrm`` (Arrow-batched kernel pooling),
  with the paper side mean-pooled over its 1-hop reference ego exactly
  where the reference mean-pools GNN outputs
  (graph_features.py:155-160).

Scale notes: the author node set is CAPPED per author
(``max_author_papers``, deterministic min-url prefix — the reference's
``author_nums_limit``), so the per-pair feature work is O(cap·dim) and
the only shuffles are the two feature joins plus one groupBy per side;
candidate fan-out (papers × candidate authors) is the same bounded
blocking join the RND pipeline already does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whoiswho_spark.functions.similarity import cosine_col, knrm_udf


def ego_edge_table(
    memberships: DataFrame,
    refs: DataFrame | None = None,
    orgs: DataFrame | None = None,
    aid_col: str = "aid",
    url_col: str = "url",
) -> DataFrame:
    """(src, dst, etype) typed ego edges — the reference's edges dict
    (graph_dataloader.py:68: author--paper, author--org,
    paper--refpaper) as one relational union.

    memberships: (aid, url) author→paper; refs: (url, ref_url)
    paper→reference-paper; orgs: (aid, org) author→org.
    """
    e = memberships.select(
        F.col(aid_col).cast("string").alias("src"),
        F.col(url_col).cast("string").alias("dst"),
        F.lit("author--paper").alias("etype"),
    )
    if orgs is not None:
        e = e.unionByName(
            orgs.select(
                F.col(aid_col).cast("string").alias("src"),
                F.col("org").cast("string").alias("dst"),
                F.lit("author--org").alias("etype"),
            )
        )
    if refs is not None:
        e = e.unionByName(
            refs.select(
                F.col(url_col).cast("string").alias("src"),
                F.col("ref_url").cast("string").alias("dst"),
                F.lit("paper--refpaper").alias("etype"),
            )
        )
    return e


def _mean_pool(emb_list) -> "F.Column":
    """Element-wise mean of an ARRAY<ARRAY<DOUBLE>> column — pure
    Catalyst (zip_with fold + transform divide)."""
    zero = F.transform(F.element_at(emb_list, 1), lambda _x: F.lit(0.0))
    summed = F.aggregate(
        emb_list, zero, lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b)
    )
    n = F.size(emb_list).cast("double")
    return F.transform(summed, lambda x: x / n)


def attach_ego_features(
    candidates: DataFrame,
    memberships: DataFrame,
    embeddings: DataFrame,
    refs: DataFrame | None = None,
    pid_col: str = "pid",
    aid_col: str = "aid",
    url_col: str = "url",
    emb_col: str = "embedding",
    max_author_papers: int = 64,
) -> DataFrame:
    """candidates(pid, aid, ...) → + f_ego_max_cos, f_ego_mean_cos,
    f_ego_knrm (ARRAY<DOUBLE> KNRM_DIM).

    Paper side: the pid's embedding mean-pooled with its 1-hop reference
    pages' embeddings (when ``refs`` given) — the paper-ego pooling of
    graph_features.py:155-160. Author side: the candidate's member-page
    embeddings, capped to the ``max_author_papers`` smallest urls
    (deterministic; the reference's author_nums_limit). Pairs whose
    author has no embedded member get zero features (the reference
    skips them with a try/except)."""
    # paper-side representation. collect_list order is shuffle-dependent
    # and float sums are order-sensitive — both sides collect (key, emb)
    # structs through sort_array so every aggregate is deterministic.
    pap = candidates.select(F.col(pid_col).alias("_pid")).distinct()
    pid_emb = embeddings.select(
        F.col(url_col).alias("_pid"), F.col(emb_col).alias("_emb")
    )
    sides = pap.join(pid_emb, "_pid").select(
        "_pid", F.col("_pid").cast("string").alias("_src"), "_emb"
    )
    if refs is not None:
        ref_emb = (
            refs.select(
                F.col(url_col).alias("_pid"), F.col("ref_url").alias("_r")
            )
            .join(
                embeddings.select(
                    F.col(url_col).alias("_r"), F.col(emb_col).alias("_emb")
                ),
                "_r",
            )
            .select("_pid", F.col("_r").cast("string").alias("_src"), "_emb")
        )
        sides = sides.unionByName(
            ref_emb.join(pap, "_pid").select("_pid", "_src", "_emb")
        )
    paper_rep = (
        sides.groupBy("_pid")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_src", "_emb"))),
                lambda s: s["_emb"],
            ).alias("_embs")
        )
        .select("_pid", _mean_pool(F.col("_embs")).alias("_paper_rep"))
    )

    # author-side node set (bounded, deterministic min-url prefix)
    w = Window.partitionBy(aid_col).orderBy(F.asc(url_col))
    author_nodes = (
        memberships.select(aid_col, url_col)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_author_papers)
        .join(
            embeddings.select(
                F.col(url_col), F.col(emb_col).alias("_emb")
            ),
            url_col,
        )
        .groupBy(aid_col)
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(F.col(url_col).cast("string").alias("_u"), "_emb")
                    )
                ),
                lambda s: s["_emb"],
            ).alias("_nodes")
        )
    )

    out = (
        candidates.join(
            paper_rep, candidates[pid_col] == paper_rep["_pid"], "left"
        )
        .drop("_pid")
        .join(author_nodes, aid_col, "left")
    )
    has = F.col("_paper_rep").isNotNull() & (F.size("_nodes") > 0)
    cos_list = F.transform(
        F.col("_nodes"), lambda n: cosine_col(F.col("_paper_rep"), n)
    )
    from whoiswho_spark.functions.similarity import KNRM_DIM

    zero_knrm = F.array(*[F.lit(0.0)] * KNRM_DIM)
    return (
        out.withColumn(
            "f_ego_max_cos",
            F.when(has, F.array_max(cos_list)).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "f_ego_mean_cos",
            F.when(
                has,
                F.aggregate(cos_list, F.lit(0.0), lambda a, b: a + b)
                / F.size("_nodes").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "f_ego_knrm",
            F.when(
                has, knrm_udf(F.array(F.col("_paper_rep")), F.col("_nodes"))
            ).otherwise(zero_knrm),
        )
        .drop("_paper_rep", "_nodes")
    )
