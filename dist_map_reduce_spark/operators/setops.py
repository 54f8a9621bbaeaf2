"""Set operations: union, intersect, except.

Absent from the reference (SURVEY.md §2.2 — its reduce-side multi-file
concat is a physical input union, not a relational operator). All
three are single-shuffle distributed ops in Spark (hash on full row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query


def _big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """custkeys with any order over 300k."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300_000)
        .select(F.col("o_custkey").alias("custkey"))
    )


def _building_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )


_BIG_SQL = "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000"
_BLD_SQL = "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'"


@query(
    "setop_union_customers",
    oracle=f"{_BIG_SQL} UNION {_BLD_SQL}",
)
def setop_union_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    return (
        _big_spenders(spark, sf_dir)
        .union(_building_segment(spark, sf_dir))
        .distinct()
    )


@query(
    "setop_intersect_customers",
    oracle=f"{_BIG_SQL} INTERSECT {_BLD_SQL}",
)
def setop_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: planned as a left-semi join on all columns."""
    return _big_spenders(spark, sf_dir).intersect(_building_segment(spark, sf_dir))


@query(
    "setop_except_customers",
    oracle=f"{_BIG_SQL} EXCEPT {_BLD_SQL}",
)
def setop_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): planned as a left-anti join. Note
    subtract() == EXCEPT DISTINCT; exceptAll() would keep surplus
    duplicates from the left side."""
    return _big_spenders(spark, sf_dir).subtract(_building_segment(spark, sf_dir))


@query(
    "setop_union_all_counts",
    oracle=f"""
    SELECT custkey, count(*) AS n
    FROM ({_BIG_SQL} UNION ALL {_BLD_SQL})
    GROUP BY custkey
    """,
)
def setop_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) + group count — distinguishes the
    multiset union from the distinct union above."""
    return (
        _big_spenders(spark, sf_dir)
        .unionByName(_building_segment(spark, sf_dir))
        .groupBy("custkey")
        .agg(F.count("*").alias("n"))
    )
