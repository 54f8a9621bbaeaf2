"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the orders⋈lineitem join shuffles both fact tables on every
run; bucketing both by the join key at write time (16 buckets here,
thousands in production) makes the join a zero-Exchange sort-merge —
the single biggest recurring-cost saving for a fact-fact join.
tests/test_bucketing.py asserts the bucketed plan has NO Exchange
while the result matches the plain-join oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query

N_BUCKETS = 16


def _ensure_bucketed(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Create bucketed managed tables for orders/lineitem once per
    (session, sf). Table names carry the sf tag so scale factors
    don't collide in the warehouse."""
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    to, tl = f"orders_b_{tag}", f"lineitem_b_{tag}"
    # the in-memory catalog dies with the session but the warehouse
    # dir survives — clear orphaned locations or saveAsTable refuses
    import shutil

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for t in (to, tl):
        loc = os.path.join(warehouse, t)
        if not spark.catalog.tableExists(t) and os.path.exists(loc):
            shutil.rmtree(loc)
    if not spark.catalog.tableExists(to):
        load_table(spark, sf_dir, "orders").write.bucketBy(
            N_BUCKETS, "o_orderkey"
        ).sortBy("o_orderkey").mode("overwrite").saveAsTable(to)
    if not spark.catalog.tableExists(tl):
        load_table(spark, sf_dir, "lineitem").write.bucketBy(
            N_BUCKETS, "l_orderkey"
        ).sortBy("l_orderkey").mode("overwrite").saveAsTable(tl)
    return to, tl


def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    to, tl = _ensure_bucketed(spark, sf_dir)
    orders = spark.table(to)
    li = spark.table(tl)
    return li.join(orders, li.l_orderkey == orders.o_orderkey)


@query(
    "bucketed_join_order_revenue",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def bucketed_join_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join through bucketed tables: both sides are
    pre-hash-partitioned and pre-sorted on the join key at write
    time, so the join runs with zero Exchange. Oracle is the plain
    join on the raw parquet — bucketing must be invisible in the
    result."""
    return bucketed_join(spark, sf_dir).groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )
