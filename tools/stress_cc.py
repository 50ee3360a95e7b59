"""Connected-components stress: giant pathological components.

Large-star/small-star's worst case is a long path (diameter n); this
builds a 100k-node chain + 1M random edges over 500k nodes and checks
convergence rounds + wall. Run once per round; results recorded in
BASELINE.md. (A pytest would be too slow — this is the scale-evidence
tool, like bench_scaling.)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main(chain_n: int = 100_000, rand_nodes: int = 500_000, rand_edges: int = 1_000_000):
    import pyspark.sql.functions as F

    from whoiswho_spark.operators.clustering import connected_components
    from whoiswho_spark.session import get_spark

    spark = get_spark(app_name="stress_cc", master="local[32]", shuffle_partitions=64)

    chain = spark.range(chain_n - 1).select(
        F.format_string("c%09d", F.col("id")).alias("src"),
        F.format_string("c%09d", F.col("id") + 1).alias("dst"),
    )
    rnd = spark.range(rand_edges).select(
        F.format_string(
            "r%09d", F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(rand_nodes))
        ).alias("src"),
        F.format_string(
            "r%09d", F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(rand_nodes))
        ).alias("dst"),
    )
    edges = chain.union(rnd)

    t0 = time.monotonic()
    labels = connected_components(edges)
    n_nodes = labels.count()
    n_comp = labels.select("cluster_id").distinct().count()
    wall = time.monotonic() - t0

    # chain must collapse to exactly one component rooted at c000000000
    chain_roots = (
        labels.where(F.col("url").startswith("c"))
        .select("cluster_id")
        .distinct()
        .collect()
    )
    ok = len(chain_roots) == 1 and chain_roots[0]["cluster_id"] == "c000000000"
    out = {
        "edges": chain_n - 1 + rand_edges,
        "nodes": n_nodes,
        "components": n_comp,
        "chain_single_component": ok,
        "wall_s": round(wall, 1),
    }
    print(json.dumps(out))
    spark.stop()
    assert ok, "chain did not collapse to one component"
    return out


if __name__ == "__main__":
    main()
