"""RND-style incremental assignment (SURVEY.md §3.2, batch semantics).

The reference's real-time name disambiguation scores each unassigned
paper against every candidate author profile under the same name and
assigns to the argmax above a NIL threshold (/root/reference/whoiswho/
training/AutoTrainRND.py:52-71, 259-324). Webtext analog: assign new
pages to existing entity clusters.

Stages (all plain DataFrame jobs — the reference's 'real-time' is bulk
recomputation, SURVEY.md §1.3):
1. block new pages with the same LSH keys as the profile corpus;
2. candidate pairs = new page × profile member sharing a block;
3. pair scores with the SND feature stack (scoring.score_pairs);
4. per (page, cluster): aggregate member scores (max — the reference
   ensembles per-candidate scores, ClassficationModels.py:274-301's
   max is the dominant lv2 feature);
5. top-1 with NIL threshold (rnd.top1_assign).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whoiswho_spark.constants import POST_MATCH_THRESHOLD
from whoiswho_spark.operators.blocking import lsh_block_keys
from whoiswho_spark.operators.rnd import top1_assign
from whoiswho_spark.operators.scoring import score_pairs


def assign_pages(
    new_payload: DataFrame,
    profile_payload: DataFrame,
    clusters: DataFrame,
    threshold: float = POST_MATCH_THRESHOLD,
    num_hashes: int = 8,
    bands: int = 4,
    fuzzy_fallback: bool = False,
    max_token_df: int = 256,
    use_ego: bool = False,
    ego_weight: float = 0.5,
    ego_max_author_papers: int = 64,
) -> DataFrame:
    """(new pages payload, profile payload, clusters(url, cluster_id)) →
    assignments(url, cluster_id, score); pages below threshold are NIL
    (absent — they'd seed new clusters downstream).

    Payload columns: url, title, title_tokens, text_tokens, embedding.

    ``fuzzy_fallback`` mirrors the reference's pretreat_unass candidate
    resolution (dataset/data_process.py + tool/match_name.py findMain):
    pages whose LSH keys hit NO profile candidate retry with the
    7-matcher name battery (clean_name forms first, then the
    tokenize_name nickname/initial-expanded forms). The retry's meet
    keys are df-bounded — normalized tokens carried by ≤
    ``max_token_df`` profiles, plus the full normalized name — so the
    fuzzy comparison never goes quadratic on head tokens (see the
    inline note).
    """
    # block keys must be built identically for both sides
    def keys(df):
        d = df.select("url", "title").withColumn("host", F.lit(""))
        return lsh_block_keys(d, num_hashes=num_hashes, bands=bands)

    new_keys = keys(new_payload)
    prof_keys = keys(profile_payload)

    pairs = (
        new_keys.withColumnRenamed("url", "url_new")
        .join(prof_keys.withColumnRenamed("url", "url_prof"), "block_key")
        .select("url_new", "url_prof")
        .distinct()
    )

    if fuzzy_fallback:
        from whoiswho_spark.functions.name_match import (
            clean_name_udf,
            names_match_fallback_udf,
        )

        unmatched = (
            new_payload.select("url", "title")
            .join(
                pairs.select(F.col("url_new").alias("url")).distinct(),
                "url",
                "left_anti",
            )
        )
        from whoiswho_spark.functions.name_match import tokenize_name_udf

        # coarse candidate bound: a shared normalized token (nickname-
        # expanded, so 'bill' and 'william smith …' meet on 'william');
        # the battery then decides. Token groups play the role of the
        # reference's name blocks. BOUNDED: a head token ('smith',
        # 'wang') would form a quadratic group at scale, so meet keys
        # are df-FILTERED on the profile side (tokens carried by more
        # than ``max_token_df`` profiles are dropped as keys — the
        # rare-prefix discipline of dedup.ngram_jaccard_pairs_prefix),
        # and the FULL normalized name is always a key, so exact-name
        # pairs survive even when every individual token is hot. Pairs
        # that share only hot tokens under two different full names are
        # out of the candidate bound (documented recall trade; the
        # reference's pretreat blocks by name key the same way).
        norm_name = lambda title: clean_name_udf(tokenize_name_udf(title))
        fa = unmatched.select(
            F.col("url").alias("url_new"),
            F.col("title").alias("_title_new"),
            norm_name(F.col("title")).alias("_nm"),
        ).localCheckpoint()  # feeds token + name meets; tiny (unmatched)
        fb = profile_payload.select(
            F.col("url").alias("url_prof"),
            F.col("title").alias("_title_prof"),
            norm_name(F.col("title")).alias("_nm"),
        ).localCheckpoint()
        fa_tok = fa.select(
            "url_new", "_title_new", F.explode(F.split("_nm", " ")).alias("_k")
        ).where(F.length("_k") > 1)
        fb_tok = fb.select(
            "url_prof", "_title_prof", F.explode(F.split("_nm", " ")).alias("_k")
        ).where(F.length("_k") > 1)
        rare = (
            fb_tok.groupBy("_k")
            .agg(F.count_distinct("url_prof").alias("_df"))
            .where(F.col("_df") <= max_token_df)
            .select("_k")
        )
        cand = fa_tok.join(fb_tok.join(F.broadcast(rare), "_k"), "_k").select(
            "url_new", "url_prof", "_title_new", "_title_prof"
        )
        # degeneracy guard mirroring the token keys' length filter:
        # titles that normalize to '' (or one char) would all share one
        # _nm and form a single global join group — exactly the quadratic
        # blow-up max_token_df exists to prevent
        name_cand = (
            fa.where(F.length("_nm") > 1)
            .join(fb.where(F.length("_nm") > 1), "_nm")
            .select("url_new", "url_prof", "_title_new", "_title_prof")
        )
        fuzzy_pairs = (
            cand.unionByName(name_cand)
            .distinct()
            .where(
                names_match_fallback_udf(
                    F.col("_title_new"), F.col("_title_prof")
                )
            )
            .select("url_new", "url_prof")
        )
        pairs = pairs.unionByName(fuzzy_pairs).distinct()
    a = new_payload.select(
        F.col("url").alias("url_new"),
        *[F.col(c).alias(f"{c}_a") for c in ("title", "title_tokens", "text_tokens", "embedding")],
    )
    b = profile_payload.select(
        F.col("url").alias("url_prof"),
        *[F.col(c).alias(f"{c}_b") for c in ("title", "title_tokens", "text_tokens", "embedding")],
    )
    scored = score_pairs(
        pairs.join(a, "url_new").join(b, "url_prof"),
        id_a="url_new",
        id_b="url_prof",
        # two DIFFERENT payload tables: an id in both namespaces must not
        # share a memo entry (it could alias a page with its own profile)
        memo_shared_ids=False,
    )

    per_cluster = (
        scored.join(
            clusters.withColumnRenamed("url", "url_prof"), "url_prof"
        )
        .groupBy("url_new", "cluster_id")
        .agg(F.max("score").alias("score"))
    )
    if use_ego:
        # ego-graph relational channel (operators/ego_graph.py — the
        # graph_features.py:96-180 analog): pool the candidate cluster's
        # member embeddings as a NODE SET and add the set-level max
        # cosine to the per-cluster score. Complements the pairwise
        # f_emb_dot (one member at a time) with the author-ego view the
        # reference's GNN matching model provides.
        from whoiswho_spark.operators.ego_graph import attach_ego_features

        ego = attach_ego_features(
            per_cluster.select(
                F.col("url_new").alias("pid"), F.col("cluster_id").alias("aid")
            ),
            memberships=clusters.select(
                F.col("cluster_id").alias("aid"), "url"
            ),
            embeddings=profile_payload.unionByName(new_payload)
            .select("url", "embedding")
            .dropDuplicates(["url"]),
            max_author_papers=ego_max_author_papers,
        ).select(
            F.col("pid").alias("url_new"),
            F.col("aid").alias("cluster_id"),
            "f_ego_mean_cos",
        )
        # the SET-LEVEL mean (whole-profile consistency) is the signal
        # the pairwise max can't see: a cluster with one look-alike
        # member but an inconsistent profile scores below a cluster the
        # page agrees with throughout
        per_cluster = per_cluster.join(
            ego, ["url_new", "cluster_id"], "left"
        ).withColumn(
            "score",
            F.col("score")
            + F.lit(float(ego_weight))
            * F.coalesce("f_ego_mean_cos", F.lit(0.0)),
        ).drop("f_ego_mean_cos")
    return top1_assign(
        per_cluster, item_col="url_new", cand_col="cluster_id",
        score_col="score", threshold=threshold,
    ).withColumnRenamed("url_new", "url")
