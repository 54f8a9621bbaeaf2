"""Full oracle sweep: run every registered query on Spark AND its
DuckDB oracle on the same fixture dir, compare canonicalized rows.

Usage:
    python tools/sweep.py [sf_dir]     # default /root/testdata/sf0.01

This is the repo-local replica of the driver's correctness gate,
runnable at ANY scale factor — run it at sf0.1 after touching any
rounded/float output path (two real boundary bugs — pandas
half-even rounding, DuckDB -0.0 — only materialized above the
driver's sf0.01).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    bad: list[str] = []
    n = 0
    for name, fn in sorted(e.queries().items()):
        sp = fn(spark, sf_dir).toPandas()
        osql = e.oracle_sql().get(name)
        if osql is None:
            print(f"{name}: rows-only ({len(sp)} rows)")
            continue
        n += 1
        od = con.execute(osql).fetchdf()
        a = (
            sp[sorted(sp.columns)].astype(str)
            .apply(tuple, axis=1).sort_values().tolist()
        )
        b = (
            od[sorted(od.columns)].astype(str)
            .apply(tuple, axis=1).sort_values().tolist()
        )
        ok = a == b
        if not ok:
            bad.append(name)
        print(f"{name}: {'MATCH' if ok else 'MISMATCH'} ({len(sp)} rows)")

    # STAGED (next-round) queries get the same engine-vs-oracle check
    # under this FOREIGN session — exactly what the driver will run
    # after promotion, so a foreign-session-only regression (e.g. an
    # optimizer-rule dependence masked by session.py's conf) surfaces
    # here a round early
    from dist_map_reduce_spark import registry

    registry.load_staged()
    n_staged = 0
    for name in sorted(registry.STAGED_ORACLES):
        sp = registry.STAGED_QUERIES[name](spark, sf_dir).toPandas()
        od = con.execute(registry.STAGED_ORACLES[name]).fetchdf()
        n_staged += 1
        a = (
            sp[sorted(sp.columns)].astype(str)
            .apply(tuple, axis=1).sort_values().tolist()
        )
        b = (
            od[sorted(od.columns)].astype(str)
            .apply(tuple, axis=1).sort_values().tolist()
        )
        ok = a == b
        if not ok:
            bad.append(f"staged:{name}")
        print(f"staged:{name}: {'MATCH' if ok else 'MISMATCH'} ({len(sp)} rows)")
    print(
        f"\nchecked {n} oracles + {n_staged} staged at {sf_dir}; "
        f"mismatches: {bad}"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
