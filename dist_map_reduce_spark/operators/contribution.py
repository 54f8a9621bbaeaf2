"""Pareto / ABC contribution classification (library operator).

The classic warehouse analysis: rank entities by a measure, compute
each entity's cumulative share of the total, and classify A (the
entities covering the first ~80% of the measure), B (to ~95%), C
(the tail). ``contribution_abc_customers`` is the registered oracle
query (customers by positive account balance).

Scale posture: ABC runs on AGGREGATED entities (parts, customers,
SKUs) — never on a raw fact table (a global window over facts is the
anti-pattern SCALE.md's window section warns about). With ``by``
partition columns the ranking window is keyed (one exchange, bounded
partitions); without them it is a single-partition sort, acceptable
only because the entity table is aggregate-sized. Both the running
share and the per-partition total come from the SAME window
partitioning, so classification adds one exchange over the input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query


def abc_classification(
    df: DataFrame,
    measure: str,
    tie_break: str | Column,
    by: list[str] | None = None,
    thresholds: tuple[float, float] = (0.80, 0.95),
    label_col: str = "abc_class",
) -> DataFrame:
    """Append ``label_col`` ('A'/'B'/'C') and ``cum_share`` columns.

    Rows are ranked by ``measure`` descending with ``tie_break``
    (required: without a unique tie-break the cumulative share —
    hence the class of boundary rows — would be nondeterministic).
    ``by`` scopes the classification within partitions (ABC per
    category); ``cum_share`` is inclusive of the current row, but the
    CLASS is decided by the share BEFORE the row: the entity that
    crosses a threshold belongs to the class it completes (on truly
    Pareto data a 96%-of-total top entity must be 'A', which an
    inclusive-share test would put in the tail class).

    Precondition: ``measure`` must be non-negative with a positive
    per-partition total. A zero total makes every share null (all
    rows fall through to 'C'), and negative measures break the
    monotonicity of ``cum_share`` that the A/B/C thresholds assume —
    filter or split signed measures before classifying.

    Engine-reproducibility: the running and whole-partition sums are
    taken on the measure as-is (DECIMAL inputs accumulate exactly),
    and only the final share is computed in float64 — one division of
    two exact values, so with a DECIMAL measure every share (hence
    every label) is bit-identical across engines regardless of
    aggregation association order.
    """
    parts = [F.col(c) for c in (by or [])]
    order = [F.col(measure).desc(), F.col(tie_break) if isinstance(tie_break, str) else tie_break]
    running = Window.partitionBy(*parts).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    whole = Window.partitionBy(*parts)
    a_cut, b_cut = thresholds
    total = F.sum(measure).over(whole).cast("double")
    cum = F.sum(measure).over(running)
    prev_share = (cum - F.col(measure)).cast("double") / total
    return df.withColumn("cum_share", cum.cast("double") / total).withColumn(
        label_col,
        F.when(prev_share < a_cut, "A")
        .when(prev_share < b_cut, "B")
        .otherwise("C"),
    )


@query(
    "contribution_abc_customers",
    oracle="""
    WITH c AS (
      SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_custkey,
           round(
             CAST(sum(bal) OVER run AS DOUBLE)
               / CAST(sum(bal) OVER () AS DOUBLE), 6
           ) AS cum_share,
           CASE
             WHEN CAST(sum(bal) OVER run - bal AS DOUBLE)
                    / CAST(sum(bal) OVER () AS DOUBLE) < 0.80 THEN 'A'
             WHEN CAST(sum(bal) OVER run - bal AS DOUBLE)
                    / CAST(sum(bal) OVER () AS DOUBLE) < 0.95 THEN 'B'
             ELSE 'C'
           END AS abc_class
    FROM c
    WINDOW run AS (
      ORDER BY bal DESC, c_custkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    )
    """,
)
def contribution_abc_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/Pareto classification of customers by positive account
    balance: each customer's cumulative share of total balance and
    the A/B/C class it falls in. The positive-balance filter
    satisfies the operator's non-negative-measure precondition
    (TPC-H acctbal can run to -999.99); the DECIMAL(18,2) cast makes
    both engines' window sums exact so shares hash-match.

    Scale posture: runs on the ENTITY table (customers), never raw
    facts; the single-partition ranking window is acceptable only
    because the input is aggregate-sized — at 100 TB classify within
    ``by`` partitions (see abc_classification docstring).
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(
            "c_custkey", F.col("c_acctbal").cast("decimal(18,2)").alias("bal")
        )
    )
    out = abc_classification(cust, "bal", "c_custkey")
    return out.select(
        "c_custkey",
        F.round("cum_share", 6).alias("cum_share"),
        "abc_class",
    )
