"""Event-sequence analytics: transition matrices and co-occurrence
graphs (triangle counting).

Product/behavioral analytics over ordered event streams — the query
family clickstream warehouses run constantly. Both operators are
deterministic compositions of windows and equi-joins; nothing here
needs an RNG, a UDF, or an unbounded state.

`event_transition_matrix`: first-order Markov transitions — for each
user, order events by time and count (from_type -> to_type) steps.
One lag() window per user + one aggregation; at 100 TB the window
partitions by user_id (millions of independent partitions), and the
result is |event_types|² rows regardless of corpus size.

`supplier_triangles`: build the co-supply graph (suppliers are
adjacent when they appear in the same order) and count its triangles
— the standard graph-clustering primitive (clustering coefficient,
community density). The scalable shape:

1. edges via a self-join WITHIN orders (per-order supplier lists are
   bounded by order size, so pair fan-out is bounded per key — never
   a global cross join), deduped, and ORIENTED a < b (each undirected
   edge stored once);
2. triangles = edges ⋈ edges on the middle vertex (wedges a<b<c)
   ⋈ edges on (a, c) — two hash joins over the edge table. Vertex
   ordering means every triangle is produced exactly once, and the
   heaviest intermediate (wedges at high-degree vertices) is the
   graph's intrinsic wedge count, the same bound every distributed
   triangle algorithm pays.

Tie to ordering (not degree) keeps the plan deterministic and
oracle-mirrorable; degree-ordered orientation is the constant-factor
optimization a production deployment would add (same plan shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query


@query(
    "event_transition_matrix",
    oracle="""
    WITH steps AS (
      SELECT event_type AS to_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS from_type
      FROM events
    )
    SELECT from_type, to_type, count(*) AS n
    FROM steps
    WHERE from_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between event types per
    user stream (ordered by ts with event_id tie-break so concurrent
    events sequence identically in both engines)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
    )
    return (
        steps.where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )


def undirected_edges(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """Distinct oriented edges (a < b) from a pair stream."""
    return (
        pairs.select(
            F.least(F.col(a), F.col(b)).alias("a"),
            F.greatest(F.col(a), F.col(b)).alias("b"),
        )
        .where(F.col("a") < F.col("b"))
        .distinct()
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Count triangles of an oriented (a < b) edge table: wedges
    a<b<c joined against the closing edge (a, c)."""
    e1 = edges
    e2 = edges.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedges = e1.join(e2, "b")  # a < b < c by construction
    closing = edges.select(F.col("a"), F.col("b").alias("c"))
    return wedges.join(closing, ["a", "c"]).agg(
        F.count("*").alias("n_triangles")
    )


@query(
    "supplier_triangles",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT least(x.l_suppkey, y.l_suppkey) AS a,
                      greatest(x.l_suppkey, y.l_suppkey) AS b
      FROM lineitem x JOIN lineitem y USING (l_orderkey)
      WHERE x.l_suppkey < y.l_suppkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM pairs e1
    JOIN pairs e2 ON e1.b = e2.a
    JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def supplier_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the co-supply graph (suppliers adjacent when they
    serve the same order): per-order self-join (bounded fan-out) →
    oriented distinct edges → wedge join → closing-edge join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = li.alias("x").join(li.alias("y"), "l_orderkey").select(
        F.col("x.l_suppkey").alias("s1"), F.col("y.l_suppkey").alias("s2")
    ).where(F.col("s1") < F.col("s2"))
    return triangle_count(undirected_edges(pairs, "s1", "s2"))
