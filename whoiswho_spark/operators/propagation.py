"""Torch-free graph-propagation embedding — the BOND GAE channel analog.

The reference's BOND trainer smooths w2v node features over the block's
similarity graph with a 2-layer GAT autoencoder before DBSCAN
(/root/reference/bond/training/autotrain_bond.py:164-228 — GAE(ATTGNN)
over data.edge_index weighted by edge_attr, embeddings → cosine
pairwise_distances → DBSCAN), i.e. the load-bearing mechanism is
*neighborhood smoothing of semantic features along high-similarity
edges*; the learned attention is a per-edge reweighting on top.
SURVEY §2.8 declares the learned training out of scope; this module
implements the mechanism itself as an iterative DataFrame loop —
deterministic, pure Catalyst, no model state:

    x⁰       = L2-normalize(embedding)
    n(i)ᵗ    = Σ_j w_ij · xⱼᵗ / Σ_j w_ij        (weighted neighbor mean)
    xᵢᵗ⁺¹    = L2-normalize((1-β)·xᵢᵗ + β·n(i)ᵗ)   (no edges → xᵢᵗ)

After T iterations, same-entity vertices (densely connected at high
weight) contract toward their cluster mean while cross-entity noise
averages out — the same effect GAE's reconstruction objective rewards.
The closed form above IS the correctness contract: the parity test
recomputes each iteration with numpy on one block and requires exact
(float64) agreement.

Scale: each iteration is one equi-join (edges ⋈ current embeddings on
the neighbor key) plus one groupBy(id) whose state is the degree-bounded
``collect_list`` of neighbor arrays — the threshold graph inside an LSH
block has bounded degree by construction (block_cap). The element-wise
sum runs in Catalyst HOFs (``aggregate``/``zip_with``/``transform``), no
Python workers, no N×N matrix, no driver state; ``localCheckpoint``
truncates the iterative lineage exactly like connected_components does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _l2_normalize(arr: Column) -> Column:
    """L2-normalize a float array column; zero vectors pass through
    (guarded — ANSI mode makes x/0 an error, not null)."""
    norm = F.sqrt(
        F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    return F.when(norm == 0.0, arr).otherwise(
        F.transform(arr, lambda v: v / norm)
    )


def propagate_embeddings(
    embeddings: DataFrame,
    edges: DataFrame,
    iterations: int = 2,
    beta: float = 0.5,
    id_col: str = "url",
    emb_col: str = "embedding",
    src_col: str = "url_a",
    dst_col: str = "url_b",
    weight_col: str = "score",
) -> DataFrame:
    """(id, embedding) + weighted undirected edges → smoothed (id,
    embedding) after ``iterations`` rounds of the module-docstring
    recurrence. Deterministic for a given input (pure Catalyst; no
    sampling, no Python state)."""
    if not 0.0 <= beta <= 1.0:
        raise ValueError(f"propagate_embeddings: beta {beta} outside [0, 1]")
    if iterations < 0:
        raise ValueError("propagate_embeddings: negative iterations")
    sym = (
        edges.select(
            F.col(src_col).alias("_id"),
            F.col(dst_col).alias("_nb"),
            F.col(weight_col).cast("double").alias("_w"),
        )
        .unionByName(
            edges.select(
                F.col(dst_col).alias("_id"),
                F.col(src_col).alias("_nb"),
                F.col(weight_col).cast("double").alias("_w"),
            )
        )
        .where(F.col("_w") > 0)
    )
    x = embeddings.select(
        F.col(id_col).alias("_id"),
        _l2_normalize(F.col(emb_col).cast("array<double>")).alias("_x"),
    )
    for _ in range(iterations):
        # collect_list order is layout-dependent and float addition is
        # not bitwise-commutative — sort by neighbor id before folding
        # so the result is identical under any partitioning
        nbr = (
            sym.join(
                x.select(F.col("_id").alias("_nb"), F.col("_x").alias("_xn")),
                "_nb",
            )
            .select(
                "_id",
                F.struct(
                    F.col("_nb"),
                    F.col("_w"),
                    F.transform("_xn", lambda v: v * F.col("_w")).alias("_wx"),
                ).alias("_s"),
            )
            .groupBy("_id")
            .agg(F.array_sort(F.collect_list("_s")).alias("_l"))
            .select(
                "_id",
                F.aggregate(
                    "_l", F.lit(0.0), lambda acc, s: acc + s["_w"]
                ).alias("_sw"),
                F.col("_l"),
            )
            .select(
                "_id",
                F.transform(
                    F.aggregate(
                        "_l",
                        F.transform(
                            F.element_at("_l", 1)["_wx"], lambda _v: F.lit(0.0)
                        ),
                        lambda acc, s: F.zip_with(
                            acc, s["_wx"], lambda a, b: a + b
                        ),
                    ),
                    lambda v: v / F.col("_sw"),
                ).alias("_n"),
            )
        )
        x = (
            x.join(nbr, "_id", "left")
            .select(
                "_id",
                F.when(F.col("_n").isNull(), F.col("_x"))
                .otherwise(
                    _l2_normalize(
                        F.zip_with(
                            "_x",
                            "_n",
                            lambda a, b: F.lit(1.0 - beta) * a + F.lit(beta) * b,
                        )
                    )
                )
                .alias("_x"),
            )
            .localCheckpoint(eager=True)  # truncate the iterative lineage
        )
    return x.select(F.col("_id").alias(id_col), F.col("_x").alias(emb_col))
