"""Scalar function surface: string, date/time, math, conditional.

Generalizes the reference's single scalar operation (the tokenizer,
reference: src/worker/worker.go:271-275) to the full built-in scalar
library. Everything here is JVM-side whole-stage-codegen — zero
Python in the data path.

Oracle-parity notes: functions are restricted to ones with identical
semantics in DuckDB (1-indexed substring, same regex class syntax);
transcendentals (ln/sqrt/pow) are rounded to absorb last-ulp libm
differences between the JVM and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query


@query(
    "scalar_string_fns",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                              AS name_upper,
           length(p_name)                             AS name_len,
           substring(p_name, 1, 5)                    AS name_pre5,
           concat(p_brand, '/', p_type)               AS brand_type,
           replace(p_name, ' ', '_')                  AS name_snake,
           regexp_extract(p_name, '([a-z]+)', 1)      AS first_word,
           ltrim(rtrim(p_name))                       AS name_trim,
           lpad(CAST(p_size AS VARCHAR), 4, '0')      AS size_pad,
           reverse(p_brand)                           AS brand_rev,
           contains(p_name, 'red')                    AS has_red,
           starts_with(p_type, 'ECO')                 AS is_eco
    FROM part
    """,
)
def scalar_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions over part."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pre5"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.ltrim(F.rtrim("p_name")).alias("name_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.reverse("p_brand").alias("brand_rev"),
        F.col("p_name").contains("red").alias("has_red"),
        F.col("p_type").startswith("ECO").alias("is_eco"),
    )


@query(
    "scalar_date_fns",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                               AS yr,
           month(o_orderdate)                              AS mo,
           day(o_orderdate)                                AS dom,
           quarter(o_orderdate)                            AS qtr,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP)    AS due_date,
           datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95,
           strftime(o_orderdate, '%Y-%m')                  AS ym
    FROM orders
    """,
)
def scalar_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar functions over orders (session TZ pinned UTC)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        ).alias("days_since_95"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@query(
    "scalar_math_fns",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 0)            AS price_round,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT)  AS price_ceil,
           abs(l_extendedprice - 50000)         AS dist_50k,
           round(sqrt(l_extendedprice), 6)      AS price_sqrt,
           round(ln(l_extendedprice + 1), 6)    AS price_ln,
           round(pow(l_discount, 2), 6)         AS disc_sq,
           CAST(l_quantity AS BIGINT) % 7       AS qty_mod7,
           greatest(l_tax, l_discount)          AS max_rate,
           least(l_tax, l_discount)             AS min_rate,
           CAST(sign(l_extendedprice - 50000) AS INTEGER) AS above_50k
    FROM lineitem
    """,
)
def scalar_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar functions over lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(price, 0).alias("price_round"),
        F.floor(price).alias("price_floor"),
        F.ceil(price).alias("price_ceil"),
        F.abs(price - 50000).alias("dist_50k"),
        F.round(F.sqrt(price), 6).alias("price_sqrt"),
        F.round(F.log(price + 1), 6).alias("price_ln"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.signum(price - 50000).cast("int").alias("above_50k"),
    )


@query(
    "scalar_conditional_fns",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END                       AS price_band,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           if(o_orderpriority = '1-URGENT', 1, 0)    AS is_urgent
    FROM orders
    """,
)
def scalar_conditional_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / coalesce / nullif / if over orders."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300_000, "high")
        .when(F.col("o_totalprice") > 100_000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")
        ).alias("status_norm"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("is_urgent"),
    )
