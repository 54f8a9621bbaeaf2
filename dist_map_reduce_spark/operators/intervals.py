"""Interval-overlap join via grid bucketing (no equi-key).

Joins two interval sets on `overlaps(a, b)` with NO shared equi-key —
the shape Spark's join planner can only express as a broadcast
nested-loop or cartesian product, both scale-killers. The scalable
pattern (used by every spatial/temporal engine — it is 1-D spatial
binning): quantize both interval sets onto a fixed grid, explode each
interval to the cells it touches, EQUI-join on cell, then verify the
exact overlap predicate and dedup pairs that met in several cells.
The cell join shuffles on cell id like any hash join; the explode
factor is bounded by interval_length/cell_size.

Use case here: per-user activity sessions (gap-based islands over
events) vs. global error-incident windows ([error_ts, +10 min] from
every error event) — "how many live incidents did each user session
overlap", the standard ops/analytics correlation query. The incident
side carries no user key, so this is a genuine keyless interval join,
not the keyed range join of operators/timeseries.py.

The reference has no join surface at all (word-count only); both
interval SOURCES are themselves engine ops (gap-islands
sessionization, projection windows).

Scale posture (100 TB events): sessions and incidents are both
aggregates (far smaller than raw events); the only corpus-sized work
is building them — one window pass and one filter. The cell join's
skew risk is a globally hot time cell (an incident storm); AQE skew
handling splits it, and the exact-predicate verify keeps correctness
independent of cell size, so cell size is purely a perf knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query

GAP_S = 600  # session inactivity gap (matches events_session_10m)
INCIDENT_S = 600  # an error is "live" for 10 minutes
CELL_S = 600  # grid cell; explode factor = interval_len/CELL_S + 1


def user_sessions(ev: DataFrame) -> DataFrame:
    """Gap-islands sessionization to closed [first, last] epoch-second
    intervals: (user_id, session_start, s_lo, s_hi)."""
    epoch = F.unix_timestamp("ts")
    w = Window.partitionBy("user_id").orderBy("ts")
    flagged = ev.select(
        "user_id", "ts", epoch.alias("ep"),
        F.when(
            epoch - F.lag(epoch).over(w) > GAP_S, 1
        ).otherwise(0).alias("new_s"),
    )
    sid = F.sum("new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        flagged.withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.min("ep").alias("s_lo"),
            F.max("ep").alias("s_hi"),
        )
    )


def incident_windows(ev: DataFrame) -> DataFrame:
    """(incident_id, i_lo, i_hi): every error event opens a closed
    INCIDENT_S-second window."""
    return ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.unix_timestamp("ts").alias("i_lo"),
        (F.unix_timestamp("ts") + INCIDENT_S).alias("i_hi"),
    )


def _cells(lo: str, hi: str) -> F.Column:
    return F.explode(
        F.sequence(F.expr(f"{lo} div {CELL_S}"), F.expr(f"{hi} div {CELL_S}"))
    )


def overlap_counts(sessions: DataFrame, incidents: DataFrame) -> DataFrame:
    """Per session: how many incident windows overlap it (closed
    intervals: overlap iff s_lo <= i_hi AND i_lo <= s_hi)."""
    s_cells = sessions.withColumn("cell", _cells("s_lo", "s_hi"))
    i_cells = incidents.withColumn("cell", _cells("i_lo", "i_hi"))
    pairs = s_cells.join(i_cells, "cell").where(
        (F.col("s_lo") <= F.col("i_hi")) & (F.col("i_lo") <= F.col("s_hi"))
    )
    counts = pairs.groupBy("user_id", "sid").agg(
        # distinct: a pair meets once per shared cell
        F.count_distinct("incident_id").alias("n_incidents")
    )
    return (
        sessions.join(counts, ["user_id", "sid"], "left")
        .select(
            "user_id",
            "session_start",
            F.coalesce("n_incidents", F.lit(0)).alias("n_incidents"),
        )
    )


@query(
    "interval_overlap_session_incidents",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, epoch_us(ts) // 1000000 AS ep,
             CASE WHEN epoch_us(ts) // 1000000
                       - lag(epoch_us(ts) // 1000000)
                         OVER (PARTITION BY user_id ORDER BY ts) > {GAP_S}
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ),
    numbered AS (
      SELECT *, sum(new_s) OVER (
        PARTITION BY user_id ORDER BY ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    ),
    sessions AS (
      SELECT user_id, sid, min(ts) AS session_start,
             min(ep) AS s_lo, max(ep) AS s_hi
      FROM numbered GROUP BY 1, 2
    ),
    incidents AS (
      SELECT event_id AS incident_id,
             epoch_us(ts) // 1000000               AS i_lo,
             epoch_us(ts) // 1000000 + {INCIDENT_S} AS i_hi
      FROM events WHERE event_type = 'error'
    )
    SELECT s.user_id, s.session_start,
           count(i.incident_id) AS n_incidents
    FROM sessions s
    LEFT JOIN incidents i
      ON s.s_lo <= i.i_hi AND i.i_lo <= s.s_hi
    GROUP BY 1, 2
    """,
)
def interval_overlap_session_incidents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Keyless interval-overlap join: per user session, the number of
    error-incident windows live at any point during it. The oracle
    states the overlap predicate directly (DuckDB plans an IEJoin);
    the engine side grid-buckets to keep the join an equi-join."""
    ev = load_table(spark, sf_dir, "events")
    return overlap_counts(user_sessions(ev), incident_windows(ev))
