"""Statistical aggregates: dispersion, correlation, regression,
arg-min/max, ordered string aggregation.

All built-in JVM aggregates (Spark ≥3.4 has the regr_* family);
floating-point results are rounded identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query


@query(
    "stats_dispersion_lineitem",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4) AS sd_price,
           round(var_samp(l_extendedprice), 2)    AS var_price,
           round(stddev_pop(l_quantity), 6)       AS sd_qty_pop,
           round(avg(l_extendedprice), 4)         AS mean_price,
           count(*)                               AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def stats_dispersion_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("var_price"),
        F.round(F.stddev_pop("l_quantity"), 6).alias("sd_qty_pop"),
        F.round(F.avg("l_extendedprice"), 4).alias("mean_price"),
        F.count("*").alias("n"),
    )


@query(
    "stats_correlation_regression",
    oracle="""
    SELECT l_linestatus,
           -- + 0 normalizes -0.0 → 0.0 (Spark round never emits -0.0)
           round(corr(l_quantity, l_extendedprice), 6) + 0        AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) + 0  AS covar_qty_price,
           round(regr_slope(l_extendedprice, l_quantity), 4) + 0  AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2) + 0 AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)     AS r2
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def stats_correlation_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation + OLS regression aggregates (price ~ quantity)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "covar_qty_price"
        ),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias(
            "intercept"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
    )


@query(
    "stats_argmax_per_nation",
    oracle="""
    SELECT n_name,
           max(c_acctbal)                 AS top_balance,
           arg_max(c_name, c_acctbal)     AS richest_customer,
           arg_min(c_name, c_acctbal)     AS poorest_customer
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def stats_argmax_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg_max/arg_min (max_by/min_by): select the payload of the
    extremal row per group without a self-join.

    (Safe for the oracle because c_acctbal has no duplicate values
    within a nation in the fixtures; ties would be engine-dependent.)
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.max("c_acctbal").alias("top_balance"),
            F.expr("max_by(c_name, c_acctbal)").alias("richest_customer"),
            F.expr("min_by(c_name, c_acctbal)").alias("poorest_customer"),
        )
    )


@query(
    "stats_ordered_string_agg",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
           count(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def stats_ordered_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg): deterministic via
    sort_array over the distinct set."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(
            F.sort_array(F.collect_set("o_orderstatus")), ","
        ).alias("statuses"),
        F.count("*").alias("n"),
    )


@query(
    "stats_array_agg_per_customer",
    oracle="""
    SELECT o_custkey,
           string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)
             AS order_ids,
           count(*) AS n
    FROM orders
    WHERE o_totalprice > 400000
    GROUP BY o_custkey
    """,
)
def stats_array_agg_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation (collect_list), deterministically sorted.
    Serialized to a joined string for the comparison — array-typed
    result columns render differently across engines' client
    libraries even when values agree."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400_000)
    return o.groupBy("o_custkey").agg(
        F.expr(
            "array_join(transform(sort_array(collect_list(o_orderkey)),"
            " x -> CAST(x AS STRING)), ',')"
        ).alias("order_ids"),
        F.count("*").alias("n"),
    )
