"""BOND multi-relation threshold edges (SURVEY.md §2.8 'Threshold-graph
construction', the a/o/v case matrix round 1 left as a single scalar τ).

Reference: /root/reference/bond/dataset/load_data.py:93-171 — a typed
edge row carries co-author count ``val_a``, co-org count ``val_o`` with
attribute ``attr_o``, co-venue count ``val_v`` with attribute ``attr_v``.
Modes:

- ``rel_on`` in {'a','o','v'}: keep edges with that relation's value over
  its threshold; value/attr = that relation's value.
- ``rel_on='aov'``: gate ``val_v`` by a coin flip (``random() >= prob_v``
  keeps it — deterministic here: seeded-hash uniform per edge) and
  ``val_o`` by ``attr_o >= coo_th``, then the 7-case matrix (:133-167).
  The matrix is exactly "each relation contributes its value iff it
  passes its threshold; keep the edge if ANY contributes; value = sum of
  contributing values; attr triple = (val_a, attr_o, attr_v) with
  non-contributing slots zeroed" — expressed declaratively as Catalyst
  ``when`` gates instead of 8 branches.

Pure Catalyst — no UDF; the whole cascade stays in codegen and the only
shuffle downstream is whatever consumes the edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whoiswho_spark.operators.blocking import hash60

_HASH_SPACE = float(2**60)


def deterministic_uniform(src, dst, salt: str = "bondv"):
    """U[0,1) per edge from the portable 60-bit hash — the seeded twin of
    the reference's ``random.random()`` gate (load_data.py:122)."""
    return (
        hash60(F.concat_ws("#", src.cast("string"), dst.cast("string")), salt)
        / F.lit(_HASH_SPACE)
    )


def bond_threshold_edges(
    edges: DataFrame,
    rel_on: str = "aov",
    th_a: float = 0.0,
    th_o: float = 0.5,
    th_v: float = 1.0,
    coo_th: float = 0.5,
    prob_v: float = 0.9,
    salt: str = "bondv",
) -> DataFrame:
    """edges(src, dst, val_a, val_o, attr_o, val_v, attr_v) →
    (src, dst, value, attr_a, attr_o, attr_v), rows only for edges that
    pass (the reference appends nothing for the all-below case).

    Threshold defaults follow bond/params.py (coo_th=0.5, prob_v=0.9;
    th_* grids default to their first entries).
    """
    if rel_on in ("a", "o", "v"):
        val = F.col(f"val_{rel_on}")
        th = {"a": th_a, "o": th_o, "v": th_v}[rel_on]
        kept = edges.where(val > F.lit(th))
        zero = F.lit(0.0)
        attrs = {
            "attr_a": val.cast("double") if rel_on == "a" else zero,
            "attr_o": val.cast("double") if rel_on == "o" else zero,
            "attr_v": val.cast("double") if rel_on == "v" else zero,
        }
        return kept.select(
            "src",
            "dst",
            val.cast("double").alias("value"),
            attrs["attr_a"].alias("attr_a"),
            attrs["attr_o"].alias("attr_o"),
            attrs["attr_v"].alias("attr_v"),
        )
    if rel_on != "aov":
        raise ValueError(f"rel_on must be one of a/o/v/aov, got {rel_on!r}")

    # gates (load_data.py:122-130): v by seeded coin, o by attr threshold
    val_v = F.when(
        deterministic_uniform(F.col("src"), F.col("dst"), salt) >= F.lit(prob_v),
        F.col("val_v"),
    ).otherwise(F.lit(0))
    val_o = F.when(F.col("attr_o") >= F.lit(coo_th), F.col("val_o")).otherwise(
        F.lit(0)
    )
    a_in = F.col("val_a") > F.lit(th_a)
    o_in = val_o > F.lit(th_o)
    v_in = val_v > F.lit(th_v)
    contrib = lambda cond, col: F.when(cond, col.cast("double")).otherwise(F.lit(0.0))
    return (
        edges.select(
            "src",
            "dst",
            (
                contrib(a_in, F.col("val_a"))
                + contrib(o_in, val_o)
                + contrib(v_in, val_v)
            ).alias("value"),
            contrib(a_in, F.col("val_a")).alias("attr_a"),
            contrib(o_in, F.col("attr_o")).alias("attr_o"),
            contrib(v_in, F.col("attr_v")).alias("attr_v"),
            (a_in | o_in | v_in).alias("_keep"),
        )
        .where(F.col("_keep"))
        .drop("_keep")
    )
