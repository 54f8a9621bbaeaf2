"""Snapshot diff (CDC extraction): two table versions → I/U/D rows.

`etl.merge_upsert` APPLIES a change set to a target; this is the
inverse ETL primitive — given two snapshots of a table, derive the
change set (the insert/update/delete classification a CDC pipeline
emits, and what `MERGE INTO` consumes downstream). The engine shape
is one full outer join on the key with null-side classification —
one shuffle per side, no window, no sort.

The "new" snapshot is derived deterministically from the fixture
customer table so both engines build the identical pair of
versions: every 17th customer is deleted, every 10th remaining one
changes segment (update), and every 13th is re-inserted under a new
surrogate key (insert). Unchanged rows are excluded from the output
— a CDC stream carries deltas only.

Scale posture: at 100 TB both snapshots hash-partition on the key;
AQE handles size asymmetry (a small delta day joined against a big
base broadcasts the delta side). Classification is a pure
projection over the join's null pattern.

Reference parity note: the reference ships word count only
(reference: src/worker/worker.go:270-288); this exercises the same
generic map/shuffle/reduce surface (src/worker/worker.go:131-218).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query

_NEW_KEY_OFFSET = 1_000_000


@query(
    "snapshot_diff_customers",
    oracle=f"""
    WITH old AS (
      SELECT c_custkey, c_mktsegment FROM customer
    ),
    new AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 0 THEN 'MOVED'
                  ELSE c_mktsegment END AS c_mktsegment
      FROM customer WHERE c_custkey % 17 <> 0
      UNION ALL
      SELECT c_custkey + {_NEW_KEY_OFFSET}, 'ACQUIRED'
      FROM customer WHERE c_custkey % 13 = 0
    )
    SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
           CASE WHEN o.c_custkey IS NULL THEN 'insert'
                WHEN n.c_custkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           o.c_mktsegment AS old_segment,
           n.c_mktsegment AS new_segment
    FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
    WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
       OR o.c_mktsegment <> n.c_mktsegment
    """,
)
def snapshot_diff_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-set extraction between two customer snapshots: full
    outer join on the key, rows classified insert/update/delete by
    the join's null pattern; unchanged rows drop out."""
    cust = load_table(spark, sf_dir, "customer")
    old = cust.select("c_custkey", "c_mktsegment")
    new = (
        cust.where(F.col("c_custkey") % 17 != 0)
        .select(
            "c_custkey",
            F.when(F.col("c_custkey") % 10 == 0, F.lit("MOVED"))
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
        )
        .unionAll(
            cust.where(F.col("c_custkey") % 13 == 0).select(
                (F.col("c_custkey") + _NEW_KEY_OFFSET).alias("c_custkey"),
                F.lit("ACQUIRED").alias("c_mktsegment"),
            )
        )
    )
    o = old.select(
        F.col("c_custkey").alias("ok"), F.col("c_mktsegment").alias("oseg")
    )
    n = new.select(
        F.col("c_custkey").alias("nk"), F.col("c_mktsegment").alias("nseg")
    )
    joined = o.join(n, o.ok == n.nk, "full_outer")
    return joined.where(
        F.col("ok").isNull()
        | F.col("nk").isNull()
        | (F.col("oseg") != F.col("nseg"))
    ).select(
        F.coalesce(F.col("ok"), F.col("nk")).alias("c_custkey"),
        F.when(F.col("ok").isNull(), F.lit("insert"))
        .when(F.col("nk").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("change_type"),
        F.col("oseg").alias("old_segment"),
        F.col("nseg").alias("new_segment"),
    )
