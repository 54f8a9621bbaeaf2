"""Approximate and exact-quantile aggregates.

Absent from the reference (SURVEY.md §2.2). The approximate sketches
(HLL++, KLL/GK) are engine-specific — their values can't hash-match a
DuckDB oracle, so they register rows-only; tests/test_approx.py bounds
them against exact answers instead. The exact interpolated percentile
matches DuckDB's quantile_cont and is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query


@query(
    "percentile_exact_event_values",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4)  AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(min(value), 4)                 AS vmin,
           round(max(value), 4)                 AS vmax
    FROM events
    GROUP BY event_type
    """,
)
def percentile_exact_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ==
    DuckDB `quantile_cont`). Exact percentile requires a per-group
    sort — fine for bounded group counts; use percentile_approx for
    unbounded cardinality at scale."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        F.round(F.min("value"), 4).alias("vmin"),
        F.round(F.max("value"), 4).alias("vmax"),
    )


@query("approx_count_distinct_users")  # rows-only: HLL++ is engine-specific
def approx_count_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct-count sketch: single pass, fixed memory — the
    scale path when exact countDistinct's shuffle is too expensive.
    Bounded vs exact in tests/test_approx.py."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count("*").alias("n"),
    )


@query("approx_percentile_prices")  # rows-only: sketch is engine-specific
def approx_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentile sketch (single pass, mergeable — the
    100 TB path). Bounded vs exact in tests/test_approx.py."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10_000).alias(
            "price_pcts"
        ),
        F.count("*").alias("n"),
    )
