"""ETL maintenance operators: MERGE-style upsert without a
transactional table format.

Spark without Delta/Iceberg has no MERGE INTO; the equivalent
pipeline is anti-join (drop rows being replaced) ∪ changes — one
shuffle on the key. With a transactional format the same logic is
`MERGE INTO` and gets file-level pruning; the dataflow below is the
engine-portable version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query


@query(
    "dq_referential_integrity",
    oracle="""
    SELECT 'lineitem->orders' AS relation,
           (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
              (SELECT o_orderkey FROM orders)) AS n_orphans
    UNION ALL
    SELECT 'orders->customer',
           (SELECT count(*) FROM orders WHERE o_custkey NOT IN
              (SELECT c_custkey FROM customer))
    UNION ALL
    SELECT 'customer->nation',
           (SELECT count(*) FROM customer WHERE c_nationkey NOT IN
              (SELECT n_nationkey FROM nation))
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT count(*) FROM lineitem WHERE l_partkey NOT IN
              (SELECT p_partkey FROM part))
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: orphan-FK counts across the star schema —
    each relation is one left-anti join (keys-only shuffle), unioned
    into a compact report. The standard pre-ingestion consistency
    gate of an ETL pipeline."""
    def orphans(child: str, ckey: str, parent: str, pkey: str, tag: str) -> DataFrame:
        c = load_table(spark, sf_dir, child).select(ckey)
        p = load_table(spark, sf_dir, parent).select(pkey)
        return (
            c.join(p, c[ckey] == p[pkey], "left_anti")
            .agg(F.count("*").alias("n_orphans"))
            .select(F.lit(tag).alias("relation"), "n_orphans")
        )

    return (
        orphans("lineitem", "l_orderkey", "orders", "o_orderkey", "lineitem->orders")
        .unionByName(
            orphans("orders", "o_custkey", "customer", "c_custkey", "orders->customer")
        )
        .unionByName(
            orphans("customer", "c_nationkey", "nation", "n_nationkey", "customer->nation")
        )
        .unionByName(
            orphans("lineitem", "l_partkey", "part", "p_partkey", "lineitem->part")
        )
    )


def merge_upsert(dim: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """Upsert semantics: rows of ``dim`` whose key appears in
    ``changes`` are replaced; new keys are inserted. Columns must
    align by name."""
    survivors = dim.join(changes, key, "left_anti")
    return survivors.unionByName(changes)


@query(
    "merge_upsert_customers",
    oracle="""
    WITH changes AS (
      SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal, 'U' AS op
      FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION ALL
      SELECT c_custkey + 1000000, 'new-' || c_name, 0.0, 'I'
      FROM customer WHERE c_custkey < 10
    )
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal, op
    FROM (
      SELECT c_custkey, c_name, c_acctbal, 'K' AS op
      FROM customer
      WHERE c_custkey NOT IN (SELECT c_custkey FROM changes)
      UNION ALL
      SELECT * FROM changes
    )
    """,
)
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation: a deterministic change batch (balance
    bump for one segment = updates, synthetic new keys = inserts)
    applied to the customer dim. op tags: K kept, U updated,
    I inserted."""
    cust = load_table(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey",
        "c_name",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.lit("U").alias("op"),
    )
    inserts = cust.filter(F.col("c_custkey") < 10).select(
        (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
        F.concat(F.lit("new-"), F.col("c_name")).alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("I").alias("op"),
    )
    changes = updates.unionByName(inserts)
    dim = cust.select(
        "c_custkey", "c_name", "c_acctbal", F.lit("K").alias("op")
    )
    merged = merge_upsert(dim, changes, "c_custkey")
    return merged.select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"), "op"
    )