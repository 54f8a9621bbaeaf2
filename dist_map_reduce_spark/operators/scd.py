"""Slowly-changing-dimension (SCD type 2) history building — the
warehouse-maintenance pattern beside MERGE upsert (operators/etl.py):
given a dimension snapshot and a change log, produce one row per
version with [valid_from, valid_to) ranges and a current flag.

The fixture has no change log, so the query synthesizes a
deterministic one (every 10th customer changes segment on
2000-01-01), mirrored exactly in the oracle — the operator under
test is the versioning itself: union + one lead() window per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.money import sum_money
from dist_map_reduce_spark.registry import query


def scd2_history(
    base: DataFrame, changes: DataFrame, key: str, ts_col: str
) -> DataFrame:
    """Generic SCD2: version rows = base ∪ changes; each version's
    valid_to is the NEXT version's valid_from (lead window), open
    (null) for the current row. One shuffle on the key."""
    hist = base.unionByName(changes)
    w = Window.partitionBy(key).orderBy(ts_col)
    return hist.withColumn("valid_to", F.lead(ts_col).over(w)).withColumn(
        "is_current", F.col("valid_to").isNull()
    )


@query(
    "scd2_customer_segments",
    oracle="""
    WITH hist AS (
      SELECT c_custkey, c_mktsegment,
             TIMESTAMP '1995-01-01' AS valid_from
      FROM customer
      UNION ALL
      SELECT c_custkey, 'MOVED' AS c_mktsegment,
             TIMESTAMP '2000-01-01' AS valid_from
      FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT c_custkey, c_mktsegment, valid_from,
           lead(valid_from) OVER (
             PARTITION BY c_custkey ORDER BY valid_from) AS valid_to,
           lead(valid_from) OVER (
             PARTITION BY c_custkey ORDER BY valid_from) IS NULL
             AS is_current
    FROM hist
    """,
)
def scd2_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 version history of the customer market segment. Scale
    shape: a union of two scans plus ONE lead() window partitioned
    by the dimension key — no join against the history (the naive
    formulation self-joins versions to find successors)."""
    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("1995-01-01").cast("timestamp").alias("valid_from"),
    )
    changes = (
        cust.filter(F.col("c_custkey") % 10 == 0)
        .select(
            "c_custkey",
            F.lit("MOVED").alias("c_mktsegment"),
            F.lit("2000-01-01").cast("timestamp").alias("valid_from"),
        )
    )
    return scd2_history(base, changes, "c_custkey", "valid_from")


# Declarative data-quality expectations (Delta-Live-Tables style):
# rule name → boolean SQL predicate over the orders table. The same
# strings run on both engines.
_EXPECTATIONS: list[tuple[str, str]] = [
    ("totalprice_positive", "o_totalprice > 0"),
    ("status_known", "o_orderstatus IN ('O', 'F', 'P')"),
    ("date_in_range",
     "o_orderdate >= TIMESTAMP '1990-01-01'"
     " AND o_orderdate < TIMESTAMP '2010-01-01'"),
    ("priority_nonnull", "o_orderpriority IS NOT NULL"),
    ("custkey_positive", "o_custkey > 0"),
]


@query(
    "dq_expectations_orders",
    oracle="UNION ALL".join(
        f"""
        SELECT '{name}' AS rule,
               CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_pass,
               CAST(sum(CASE WHEN {pred} THEN 0 ELSE 1 END) AS BIGINT)
                 AS n_fail
        FROM orders
        """
        for name, pred in _EXPECTATIONS
    ),
)
def dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectations audit: each rule is a boolean
    predicate evaluated as a conditional aggregate — ALL rules are
    computed in ONE pass over the scan (a single aggregation with
    2×n_rules conditional sums, then a narrow unpivot), not one job
    per rule. Adding a rule adds two counters, not a scan."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for name, pred in _EXPECTATIONS:
        p = F.expr(pred)
        aggs.append(
            F.sum(F.when(p, 1).otherwise(0)).cast("bigint").alias(f"{name}__pass")
        )
        aggs.append(
            F.sum(F.when(p, 0).otherwise(1)).cast("bigint").alias(f"{name}__fail")
        )
    wide = orders.agg(*aggs)
    # wide → long without stack() (Generate breaks codegen): a union
    # of narrow selects over the single 1-row aggregate
    arms = [
        wide.select(
            F.lit(name).alias("rule"),
            F.col(f"{name}__pass").alias("n_pass"),
            F.col(f"{name}__fail").alias("n_fail"),
        )
        for name, _ in _EXPECTATIONS
    ]
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


# Histogram parameters: [0, 500) in 20 equal-width bins; out-of-range
# values clamp to the edge bins (the standard width_bucket contract,
# expressed in portable arithmetic — DuckDB has no width_bucket).
_HIST_LO, _HIST_HI, _HIST_BINS = 0.0, 500.0, 20
_BUCKET_SQL = (
    f"CAST(least({_HIST_BINS - 1}, greatest(0, floor((value - {_HIST_LO})"
    f" * {_HIST_BINS} / ({_HIST_HI} - {_HIST_LO})))) AS BIGINT)"
)


@query(
    "histogram_event_values",
    oracle=f"""
    SELECT {_BUCKET_SQL} AS bucket,
           CAST({_HIST_LO} + {_BUCKET_SQL} * ({_HIST_HI} - {_HIST_LO})
                / {_HIST_BINS} AS DOUBLE) AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def histogram_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram of event values: ONE partial-aggregated
    shuffle of ≤ n_bins rows per map task — the building block for
    distribution profiling at any scale (the same arithmetic runs as
    a width_bucket in engines that have one)."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.expr(_BUCKET_SQL)
    return (
        ev.select(
            bucket.alias("bucket"),
            (
                F.lit(_HIST_LO)
                + bucket * (_HIST_HI - _HIST_LO) / _HIST_BINS
            ).cast("double").alias("bucket_lo"),
        )
        .groupBy("bucket", "bucket_lo")
        .agg(F.count("*").alias("n"))
    )


@query(
    "division_customers_every_year",
    oracle="""
    SELECT o_custkey AS c_custkey,
           CAST(count(DISTINCT year(o_orderdate)) AS BIGINT) AS n_years
    FROM orders
    GROUP BY o_custkey
    HAVING count(DISTINCT year(o_orderdate)) =
           (SELECT count(DISTINCT year(o_orderdate)) FROM orders)
    """,
)
def division_customers_every_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division (the "for all" quantifier): customers
    with at least one order in EVERY year the business operated.
    Expressed as the standard count-distinct-equality rewrite — a
    grouped aggregate against a 1-row scalar — instead of the
    textbook double-NOT-EXISTS, which would be two correlated anti
    joins over the fact."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.year("o_orderdate").alias("yr")
    )
    total_years = orders.agg(
        F.countDistinct("yr").alias("n_all_years")
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.countDistinct("yr").alias("n_years")
    )
    return (
        per_cust
        # 1-row aggregate: scalar-subquery crossJoin, not a data join
        .crossJoin(F.broadcast(total_years))
        .filter(F.col("n_years") == F.col("n_all_years"))
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("n_years").cast("bigint").alias("n_years"),
        )
    )


@query(
    "funnel_click_to_purchase",
    oracle="""
    WITH fc AS (
      SELECT user_id, min(ts) AS first_click
      FROM events WHERE event_type = 'click'
      GROUP BY user_id
    ),
    conv AS (
      SELECT DISTINCT e.user_id
      FROM events e JOIN fc ON e.user_id = fc.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= fc.first_click
    )
    SELECT CAST((SELECT count(*) FROM fc) AS BIGINT)   AS n_clickers,
           CAST((SELECT count(*) FROM conv) AS BIGINT) AS n_converted,
           round((SELECT count(*) FROM conv) * 1.0
                 / (SELECT count(*) FROM fc), 6)       AS conversion_rate
    """,
)
def funnel_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion: users whose first click is later
    followed by a purchase. Two aggregations and one semi join, all
    hash-partitioned on user_id — no per-user event sorting and no
    self-join of the full event log (the naive sequential-pattern
    formulation)."""
    ev = load_table(spark, sf_dir, "events")
    fc = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = fc.join(
        purchases,
        (fc.user_id == F.col("p_user")) & (F.col("p_ts") >= fc.first_click),
        "left_semi",
    )
    n_clickers = fc.agg(F.count("*").cast("bigint").alias("n_clickers"))
    n_converted = conv.agg(F.count("*").cast("bigint").alias("n_converted"))
    return (
        n_clickers.crossJoin(n_converted)  # two 1-row aggregates
        .select(
            "n_clickers",
            "n_converted",
            F.round(
                F.col("n_converted") * F.lit(1.0) / F.col("n_clickers"), 6
            ).alias("conversion_rate"),
        )
    )


@query(
    "scd2_point_in_time_revenue",
    oracle=f"""
    WITH hist AS (
      SELECT c_custkey, c_mktsegment,
             TIMESTAMP '1996-01-01' AS valid_from
      FROM customer
      UNION ALL
      SELECT c_custkey, 'MOVED', TIMESTAMP '2000-01-01'
      FROM customer WHERE c_custkey % 10 = 0
    ),
    versions AS (
      SELECT *, lead(valid_from) OVER (
        PARTITION BY c_custkey ORDER BY valid_from) AS valid_to
      FROM hist
    )
    SELECT v.c_mktsegment AS segment,
           count(*) AS n_orders,
           {sum_money("o.o_totalprice", "revenue")}
    FROM orders o
    LEFT JOIN versions v
      ON o.o_custkey = v.c_custkey
     AND v.valid_from <= o.o_orderdate
     AND (v.valid_to IS NULL OR o.o_orderdate < v.valid_to)
    GROUP BY 1
    """,
)
def scd2_point_in_time_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (AS OF event time) join of facts against SCD2
    history: each order is attributed to the segment version VALID AT
    ITS ORDER DATE — the temporal-correctness pattern that a naive
    current-dimension join silently gets wrong. The synthesized
    history starts 1996 (orders from 1995 fall before any version:
    the NULL-segment bucket proves the left-join semantics) and
    changes every 10th customer in 2000 (orders straddle the change,
    so both versions receive rows).

    Scale shape: equi-join on the dimension key with the validity
    range as a join-time filter — history is O(versions/key) rows, so
    per-key fan-out is bounded; the [valid_from, valid_to) intervals
    partition time per key, so at most ONE version survives per fact
    row (no post-join dedup needed). AQE handles the dim/fact size
    asymmetry (broadcasts when the history fits)."""
    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("1996-01-01").cast("timestamp").alias("valid_from"),
    )
    changes = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.lit("MOVED").alias("c_mktsegment"),
        F.lit("2000-01-01").cast("timestamp").alias("valid_from"),
    )
    versions = scd2_history(base, changes, "c_custkey", "valid_from")
    o = load_table(spark, sf_dir, "orders")
    cond = (
        (o.o_custkey == versions.c_custkey)
        & (versions.valid_from <= o.o_orderdate)
        & (versions.valid_to.isNull() | (o.o_orderdate < versions.valid_to))
    )
    return (
        o.join(versions, cond, "left")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_orders"),
            F.expr(sum_money("o_totalprice", "revenue")),
        )
    )
