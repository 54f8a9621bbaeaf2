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
        # events.ts is stored as NAIVE parquet timestamp[us] (verified
        # with pyarrow at all three fixture scales), which Spark reads
        # as TIMESTAMP_NTZ. Normalize to TIMESTAMP (ltz): event-time
        # operators (withWatermark, window state) require it, and
        # under a pinned-UTC session the wall-clock reading is
        # identical to the stored value and to DuckDB's naive read.
        # NOTE: pinning UTC mutates the CALLING session's config — a
        # documented side effect of reading this table (see
        # session.get_spark docstring); engine-owned sessions are
        # already UTC so only foreign non-UTC sessions observe it.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") != "timestamp":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
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
