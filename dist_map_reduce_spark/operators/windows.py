"""Window functions: ranking, analytic (lag/lead), aggregate frames.

Absent from the reference (SURVEY.md §2.2) — provided via Spark's
native window exec. Every ordering includes a unique tie-break column
so results are deterministic and oracle-comparable.

Scale note: a window partitioned by a key shuffles once on that key;
avoid un-partitioned (global) windows on big data — the one global
window below (ntile over orders) is ranking the *aggregated* output,
which is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.money import sum_money
from dist_map_reduce_spark.registry import query


@query(
    "window_order_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
    QUALIFY rn <= 5
    """,
)
def window_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 orders per customer by price: the canonical top-k-per-group
    pattern (window + filter), planned as a single shuffle on the
    partition key."""
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 5)
    )


@query(
    "window_running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_total
    FROM orders
    """,
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per customer over order history (ROWS frame)."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@query(
    "window_lag_lead_orders",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           round(o_totalprice - coalesce(lag(o_totalprice) OVER w, 0), 2) AS delta_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def window_lag_lead_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead across each customer's order history."""
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    price = F.col("o_totalprice")
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag(price).over(w).alias("prev_price"),
        F.lead(price).over(w).alias("next_price"),
        F.round(price - F.coalesce(F.lag(price).over(w), F.lit(0)), 2).alias(
            "delta_prev"
        ),
    )


@query(
    "window_moving_avg_events",
    oracle="""
    SELECT user_id, event_id, ts,
           round(avg(value) OVER (
             PARTITION BY user_id
             ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 4) AS mov_avg3
    FROM events
    """,
)
def window_moving_avg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 3-row moving average per user (bounded ROWS frame)."""
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-2, W.currentRow)
    )
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.avg("value").over(w), 4).alias("mov_avg3"),
    )


@query(
    "window_ntile_customer_value",
    oracle=f"""
    WITH cv AS (
      SELECT o_custkey, {sum_money("o_totalprice", "lifetime")}
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, lifetime,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume
    FROM cv
    WINDOW w AS (ORDER BY lifetime DESC, o_custkey ASC)
    """,
)
def window_ntile_customer_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution functions (ntile/percent_rank/cume_dist) over
    pre-aggregated (bounded) customer lifetime value — the global
    window is safe because it ranks #customers rows, not the fact
    table."""
    cv = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.expr(sum_money("o_totalprice", "lifetime")))
    )
    w = W.orderBy(F.col("lifetime").desc(), F.col("o_custkey").asc())
    return cv.select(
        "o_custkey",
        "lifetime",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "window_first_last_order",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER w AS last_order,
           count(*) OVER (PARTITION BY o_custkey) AS n_orders
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
)
def window_first_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with an explicit full frame (the default
    frame would truncate last_value at CURRENT ROW)."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w).alias("last_order"),
            F.count("*").over(W.partitionBy("o_custkey")).alias("n_orders"),
        )
        .distinct()
    )
