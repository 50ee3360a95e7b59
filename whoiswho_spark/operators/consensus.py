"""Consensus clustering ensemble (the BOND ESB mechanism, relationally).

The reference's ESBTrainer combines K clusterings of a name block by
co-association voting (/root/reference/bond/training/
autotrain_bond_ensemble.py:240-261): each clustering's label vector is
one-hot encoded, ``class_matrix @ class_matrix.T`` gives that run's
same-cluster (co-association) matrix, the K matrices are averaged, and
pairs with average agreement > 0.5 are voted into the consensus graph.
Cluster extraction there is ``matx2list`` (:58-76): label(i) = the first
column index j with a voted 1 — an index-order-dependent one-step rule
that is not transitive (i can label to j while j labels to an earlier
k). The relational form here replaces that extraction with the repo's
``connected_components``, the order-free transitive closure of the same
voted pair set — identical whenever the voted graph is transitively
closed (which majority agreement over consistent runs produces), and
deterministic regardless of row order where matx2list is not.

Relational shape (no N×N matrix, no driver state):

    same-cluster pairs per run   join on (run_id, cluster_id)
    agreement count per pair     groupBy (url_a, url_b)
    vote                         agree / K > min_agree   (strict, the
                                 reference's ``j > 0.5``)
    consensus clusters           connected_components over voted pairs

Scale: the per-run pair expansion is quadratic IN THE CLUSTER (the same
co-association cost the reference pays N² per name block — ours is
strictly smaller, Σ m_c² ≤ N² per run), and the shuffle meets on the
bounded (run_id, cluster_id) key. The agreement groupBy shuffles once on
the pair key. Outlier convention: feed RESOLVED clusterings (the repo's
dbscan path applies post_match first, as the reference does with
``post_match=True``); a url absent from a run simply contributes no
agreement there, while K stays the total run count, so absence votes
against — the conservative reading.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whoiswho_spark.operators.clustering import connected_components


def _pin(clusterings: DataFrame) -> DataFrame:
    """Materialize the stacked clusterings once (lineage-truncating
    localCheckpoint) so every downstream evaluation — the n_runs count,
    both sides of the co-association self-join, the default vertex set —
    reads the SAME labels. The ensemble may include a DBSCAN run whose
    border-point labels are row-order-dependent; without pinning, the a-
    and b-side re-evaluations could disagree on a border url and corrupt
    per-pair agree_runs silently. Also avoids recomputing the expensive
    CC-grid + DBSCAN ensemble 3-4 times."""
    return clusterings.localCheckpoint(eager=True)


def coassociation_edges(
    clusterings: DataFrame,
    min_agree: float = 0.5,
    run_col: str = "run_id",
    id_col: str = "url",
    cluster_col: str = "cluster_id",
    pinned: bool = False,
) -> DataFrame:
    """(run_id, url, cluster_id) × K runs → voted consensus edges
    (url_a < url_b, agree_runs, n_runs): pairs co-clustered in strictly
    more than ``min_agree`` of ALL runs (the reference's > 0.5 vote over
    the averaged co-association matrix).

    ``pinned=True`` declares the caller already materialized
    ``clusterings`` (see :func:`_pin`); otherwise it is pinned here so
    the self-join's two sides cannot observe different labels from a
    nondeterministic upstream (e.g. DBSCAN border assignment)."""
    if not pinned:
        clusterings = _pin(clusterings)
    n_runs = clusterings.select(run_col).distinct().count()
    a = clusterings.select(
        F.col(run_col).alias("_r"),
        F.col(cluster_col).alias("_c"),
        F.col(id_col).alias("url_a"),
    )
    b = clusterings.select(
        F.col(run_col).alias("_r"),
        F.col(cluster_col).alias("_c"),
        F.col(id_col).alias("url_b"),
    )
    return (
        a.join(b, ["_r", "_c"])
        .where(F.col("url_a") < F.col("url_b"))
        .groupBy("url_a", "url_b")
        .agg(F.count("*").alias("agree_runs"))
        .where(F.col("agree_runs") > F.lit(min_agree) * F.lit(n_runs))
        .withColumn("n_runs", F.lit(n_runs))
    )


def consensus_clusters(
    clusterings: DataFrame,
    min_agree: float = 0.5,
    run_col: str = "run_id",
    id_col: str = "url",
    cluster_col: str = "cluster_id",
    vertices: DataFrame | None = None,
) -> DataFrame:
    """K clusterings stacked as (run_id, url, cluster_id) → the consensus
    partition (url, cluster_id = component-min member), by majority
    co-association vote + transitive closure (module docstring).
    ``vertices`` defaults to the distinct urls of the input, so every
    clustered url gets a consensus label (singletons label themselves).
    The input is pinned once (:func:`_pin`) so the vote, both join sides,
    and the default vertex set all read one materialization."""
    clusterings = _pin(clusterings)
    edges = coassociation_edges(
        clusterings, min_agree, run_col, id_col, cluster_col, pinned=True
    ).select(F.col("url_a").alias("src"), F.col("url_b").alias("dst"))
    if vertices is None:
        vertices = clusterings.select(F.col(id_col).alias("url")).distinct()
    return connected_components(edges, vertices=vertices)
