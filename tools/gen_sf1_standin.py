"""Generate an sf1-shaped stand-in dataset for round-6 measurement.

The driver's BENCH_r05 measurement ran at a driver-generated
/root/testdata/sf1.0 (50k docs) that does not persist between sessions.
This tool rebuilds an sf1-SHAPED dataset for the builder's own
measurements only (never read by bench.py unless SPARK_GRAFT_SF_DIR
points at it):

- documents.parquet / embeddings.parquet: the exact distributional law
  from tools/bench_sf1.py (the measured driver law — 50k docs, 20 fixed
  sources, 10..100 tokens over the 31-word vocab; 64-dim clustered
  vectors), deterministic per-row RNG.
- TPC-H-ish tables + events: 10x replication of the driver's sf0.1
  tables with per-copy key offsets applied consistently on both sides
  of every join key (orders.o_custkey and customer.c_custkey shift
  together, lineitem.l_orderkey with orders.o_orderkey), so join
  fan-outs match a true 10x table. Dimension tables (region, nation,
  supplier, part) are copied as-is — they are fixed-size in TPC-H's law.

Usage: python tools/gen_sf1_standin.py [outdir=/root/sf1gen]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
COPIES = 10


def main(outdir: str) -> None:
    import pyspark.sql.functions as F

    from tools.bench_sf1 import generate_corpus
    from whoiswho_spark.session import get_spark

    spark = get_spark(app_name="gen_sf1_standin", master="local[32]",
                      shuffle_partitions=32)

    generate_corpus(spark, outdir, n_docs=50_000, n_vecs=20_000)

    def shifted_union(name: str, keys: dict[str, int]) -> None:
        """Union COPIES copies of sf0.1/name with key offsets.

        keys maps column -> multiplier-space: each listed key column is
        shifted by copy_index * 10_000_000 so copies never collide and
        joins stay within-copy.
        """
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        out = None
        for c in range(COPIES):
            cur = df
            for col in keys:
                cur = cur.withColumn(col, F.col(col) + F.lit(c * 10_000_000))
            out = cur if out is None else out.unionByName(cur)
        out.write.mode("overwrite").parquet(f"{outdir}/{name}.parquet")

    # dimension tables: fixed size in the TPC-H law — copy as-is
    for name in ("region", "nation", "supplier", "part"):
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{outdir}/{name}.parquet")

    shifted_union("customer", {"c_custkey": 1})
    shifted_union("orders", {"o_orderkey": 1, "o_custkey": 1})
    shifted_union("lineitem", {"l_orderkey": 1})
    # events: shift ids; timestamps left as-is (group count fixed,
    # rows-per-group 10x — close enough for a 1-2 s query)
    shifted_union("events", {"event_id": 1, "user_id": 1})
    with open(f"{outdir}/_DONE", "w") as fh:
        fh.write("ok\n")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/sf1gen")
