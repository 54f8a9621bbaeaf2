"""Cohort retention analysis.

Completes the product-analytics family (funnel, histogram, relational
division live in ``operators/scd.py``): classic retention matrix —
assign each purchasing user to the week of their first purchase (the
cohort), then count how many of each cohort are still active N weeks
later. Weekly grain because the fixture spans one month; the month
variant is the same plan with ``date_trunc('month')`` and a
month-arithmetic offset.

Plan shape / 100 TB posture: ONE scan of events — the activity set
is one (user, week)-keyed distinct aggregate, and since date_trunc
is monotone the cohort week is just min(active_week), computed with
a user-partitioned window over that same aggregate's partitioning
(no second scan, no join). The final aggregate runs on (cohorts ×
weeks)-sized data. ``n_active`` is ``count(*)``, not
``count(DISTINCT)``: activity rows are already distinct per
(user, week) and the cohort is functional on user, so the cheap
count is exact — no Expand pass.

Reference parity: no analytics of any kind in the reference (word
count only, src/worker/worker.go:270-288); part of the engine's
extended surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query


@query(
    "cohort_retention_weekly",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    cohorts AS (
      SELECT user_id,
             CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
      FROM purchases GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week
      FROM purchases
    )
    SELECT c.cohort_week,
           CAST(date_diff('day', c.cohort_week, a.active_week) / 7 AS BIGINT)
             AS week_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM cohorts c JOIN activity a USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix over purchase events:
    (cohort_week, week_offset) → number of cohort users active that
    week. Both engines truncate weeks to Monday, and cohort weeks stay
    TIMESTAMP-typed on both sides (the repo's date-output convention,
    see scalar_fns/timeseries oracles)."""
    from pyspark.sql import Window as W

    purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts")
    )
    activity = purchases.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    # date_trunc is monotone, so the cohort week equals
    # min(active_week) — derived with a window over the (already
    # user-hash-partitioned) activity set instead of a second events
    # scan + aggregate + join
    cohorted = activity.withColumn(
        "cohort_week", F.min("active_week").over(W.partitionBy("user_id"))
    )
    return (
        cohorted.groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_active"))
    )
