"""Fixture-table catalog.

The reference's "dataset = a directory of files" model (reference:
src/master/master.go:327-339) generalizes here to self-describing
Parquet tables (FIXTURES.md). Spark's FileSourceScanExec handles
split planning, predicate pushdown, and column pruning — the
per-file map-task enumeration the reference does by hand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The ten driver fixture tables (TESTDATA.md / FIXTURES.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor the
# schema supports (region=5 rows, nation=25 — bounded by geography,
# not sf). customer/supplier/part grow with sf but stay far below
# fact-table size; at 100 TB lineitem they may exceed the broadcast
# threshold, which is why joins below use F.broadcast only for the
# bounded dims and let AQE decide for the scaling ones.
BOUNDED_DIMS: tuple[str, ...] = ("region", "nation")


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
        # rejects (PARQUET_TYPE_ILLEGAL). Read it as int64 nanos and
        # convert with integer division — lossless to Spark's native
        # microsecond precision, fully distributed (no driver round
        # trip), and matches DuckDB, which also truncates ns → µs.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The stored nanos are NAIVE wall-clock; timestamp_micros
        # yields an ltz TIMESTAMP whose wall-clock reading depends on
        # the session timezone. Pin UTC so the reading equals the
        # stored value under ANY caller's session config. (All other
        # fixture timestamps load as timestamp_ntz — tz-independent.)
        # NOTE: this mutates the CALLING session's config — a
        # documented side effect of reading this table (see
        # session.get_spark docstring); engine-owned sessions are
        # already UTC so only foreign non-UTC sessions observe it.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each fixture table as a temp view (for the SQL API)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
