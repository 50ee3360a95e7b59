"""Local stand-in for the driver's correctness gate: run every
queries()[k] on Spark and oracle_sql()[k] on DuckDB at sf0.01, compare
row count, column names, and an order-insensitive value hash."""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main(only: list[str] | None = None):
    import __spark_entry__ as entrymod
    from whoiswho_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows, cols={scols}")
            if len(srows) == 0:
                print(f"  WARN {name}: 0 rows")
            continue
        try:
            res = con.execute(oracles[name])
            drows = res.fetchall()
            dcols = [d[0] for d in res.description]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failed.append(name)
            continue
        ok_n = len(srows) == len(drows)
        ok_c = sorted(scols) == sorted(dcols)
        ok_v = ok_n and ok_c and value_hash(srows, scols) == value_hash(drows, dcols)
        if ok_v:
            print(f"OK   {name}: {len(srows)} rows")
        else:
            failed.append(name)
            print(
                f"FAIL {name}: rows {len(srows)} vs {len(drows)}, "
                f"cols {scols} vs {dcols}, hash_match={ok_v}"
            )
            if ok_n and ok_c:
                o = sorted(range(len(scols)), key=lambda i: scols[i])
                s_set = sorted("\x1f".join(_norm_cell(r[i]) for i in o) for r in srows)
                d_set = sorted("\x1f".join(_norm_cell(r[i]) for i in o) for r in drows)
                diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:3]
                for a, b in diffs:
                    print(f"    spark : {a[:200]}")
                    print(f"    duckdb: {b[:200]}")
    print("\nFAILED:" if failed else "\nALL OK", failed if failed else "")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
