"""Array / map scalar functions and null-handling semantics —
the remaining scalar-fn rows of SURVEY §2.2's matrix.

Arrays come from split(); maps from JSON parsing. All outputs are
scalar columns (never nested types) so the oracle comparison is
representation-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query


@query(
    "scalar_array_fns",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    SELECT doc_id,
           len(ws)                             AS n_words,
           ws[1]                               AS first_word,
           ws[len(ws)]                         AS last_word,
           list_contains(ws, 'spark')          AS has_spark,
           array_to_string(ws[1:3], '-')       AS first3_joined,
           len(list_filter(ws, w -> length(w) > 5))  AS n_long,
           coalesce(list_position(ws, 'data'), 0) AS data_pos
    FROM w
    """,
)
def scalar_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar functions: index, contains, slice+join, filter,
    position. Missing-element position: Spark array_position returns
    0, DuckDB list_position returns NULL — the oracle coalesces to
    0 to pin one semantic."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(ws).alias("n_words"),
        F.element_at(ws, 1).alias("first_word"),
        F.element_at(ws, -1).alias("last_word"),
        F.array_contains(ws, "spark").alias("has_spark"),
        F.array_join(F.slice(ws, 1, 3), "-").alias("first3_joined"),
        F.size(F.filter(ws, lambda w: F.length(w) > 5)).alias("n_long"),
        F.array_position(ws, "data").alias("data_pos"),
    )


@query(
    "scalar_map_fns",
    oracle="""
    SELECT event_id,
           CAST(props->>'k' AS INTEGER)             AS k_val,
           len(json_keys(props))                    AS n_keys,
           json_keys(props)[1]                      AS first_key,
           props->>'k' IS NOT NULL                  AS has_k
    FROM events
    """,
)
def scalar_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map functions over JSON-parsed props: from_json to a MapType,
    then key enumeration / lookup / cardinality."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.element_at(m, "k").isNotNull().alias("has_k"),
    )


@query(
    "scalar_null_semantics",
    oracle="""
    WITH j AS (
      SELECT c_custkey, c_name, c_acctbal, o_orderkey, o_totalprice
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_totalprice > 450000
    )
    SELECT c_custkey, o_orderkey,
           o_totalprice IS NULL                          AS no_big_order,
           coalesce(o_totalprice, 0.0)                   AS price_or_zero,
           CASE WHEN o_totalprice IS NOT DISTINCT FROM NULL
                THEN 'none' ELSE 'some' END              AS null_safe_tag,
           ifnull(o_orderkey, -1)                        AS key_or_neg1
    FROM j
    """,
)
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null semantics: IS NULL, coalesce/ifnull, null-safe equality
    (<=> / IS NOT DISTINCT FROM) over outer-join-introduced nulls."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    j = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey) & (orders.o_totalprice > 450_000),
        "left",
    )
    return j.select(
        "c_custkey",
        "o_orderkey",
        F.col("o_totalprice").isNull().alias("no_big_order"),
        F.coalesce(F.col("o_totalprice"), F.lit(0.0)).alias("price_or_zero"),
        F.when(F.col("o_totalprice").eqNullSafe(F.lit(None).cast("double")), "none")
        .otherwise("some")
        .alias("null_safe_tag"),
        F.coalesce(F.col("o_orderkey"), F.lit(-1)).alias("key_or_neg1"),
    )


@query(
    "setop_intersect_all_lineitems",
    oracle="""
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F'
    """,
)
def setop_intersect_all_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — keeps min multiplicity)."""
    li = load_table(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    f = li.filter(F.col("l_linestatus") == "F").select("l_partkey")
    return r.intersectAll(f)


@query(
    "setop_except_all_lineitems",
    oracle="""
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    EXCEPT ALL
    SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F'
    """,
)
def setop_except_all_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics — subtracts multiplicities)."""
    li = load_table(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    f = li.filter(F.col("l_linestatus") == "F").select("l_partkey")
    return r.exceptAll(f)


@query(
    "posexplode_tokens",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
               WHERE doc_id < 10)
    SELECT doc_id, i - 1 AS pos, ws[i] AS word
    FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) t
    """,
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: flat-map preserving element ordinality (0-based)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )
