"""Fixed-bin histogram (the engine-side analytics primitive).

Histograms at scale are one map-side bucket projection + one
aggregation over at most N_BUCKETS keys — the partial aggregate does
essentially all the work and the exchange carries ≤ N_BUCKETS rows
per task. No sort, no window, no sampling. Bucket arithmetic is
integer/IEEE-exact (floor of a double division with fixed bounds), so
engine and oracle agree bit-for-bit — unlike quantile-based binning,
which would depend on a percentile sketch.

Fixed bounds are a deliberate contract: profile_table supplies
min/max when bounds are unknown, and fixing them keeps bucket edges
stable across corpus growth (comparable across runs and partitions —
what monitoring dashboards need).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query

N_BUCKETS = 24
LO, HI = 0.0, 600_000.0  # o_totalprice bounds contract
WIDTH = (HI - LO) / N_BUCKETS


def bucketize(v: Column, lo: float, width: float, n: int) -> Column:
    """Clamped fixed-width bucket id in [0, n-1]; values below lo go
    to bucket 0, at/above lo + n*width to bucket n-1."""
    raw = F.floor((v - F.lit(lo)) / F.lit(width))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)).cast("int")


def histogram(
    df: DataFrame, col: str, lo: float, hi: float, n: int
) -> DataFrame:
    width = (hi - lo) / n
    b = bucketize(F.col(col), lo, width, n)
    return (
        df.groupBy(b.alias("bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min(col).alias("min_val"),
            F.max(col).alias("max_val"),
        )
        .select(
            "bucket",
            (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("lo_edge"),
            "n_rows",
            "min_val",
            "max_val",
        )
    )


@query(
    "histogram_order_totals",
    oracle=f"""
    WITH b AS (
      SELECT CAST(least(greatest(
               floor((o_totalprice - {LO}) / {WIDTH}), 0), {N_BUCKETS - 1})
             AS INTEGER) AS bucket,
             o_totalprice
      FROM orders
    )
    SELECT bucket,
           {LO} + bucket * {WIDTH} AS lo_edge,
           count(*)                AS n_rows,
           min(o_totalprice)       AS min_val,
           max(o_totalprice)       AS max_val
    FROM b GROUP BY 1
    """,
)
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """24-bin histogram of order totals over the fixed [0, 600k)
    contract range, with per-bin observed min/max (bin edges are
    derived, not data-dependent)."""
    return histogram(load_table(spark, sf_dir, "orders"), "o_totalprice", LO, HI, N_BUCKETS)


N_QUANTILES = 8  # equi-depth bucket count


@query(
    "histogram_equidepth_prices",
    oracle=f"""
    WITH b AS (
      SELECT quantile_cont(o_totalprice,
               [x * 1.0 / {N_QUANTILES} FOR x IN
                 generate_series(1, {N_QUANTILES - 1})]) AS bnds
      FROM orders
    ),
    assigned AS (
      SELECT len(list_filter(b.bnds, x -> o.o_totalprice > x)) AS bucket,
             o.o_totalprice AS v
      FROM orders o CROSS JOIN b
    )
    SELECT CAST(bucket AS INTEGER) AS bucket,
           count(*) AS n_rows,
           min(v) AS min_val,
           max(v) AS max_val
    FROM assigned GROUP BY bucket
    """,
)
def histogram_equidepth_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile-bucketed) histogram of order totals — the
    complement of the fixed-width contract above: bucket EDGES are
    data-dependent (exact percentiles), bucket COUNTS are ~equal.
    Exactness: Spark's ``percentile`` and DuckDB's ``quantile_cont``
    both implement the standard linear-interpolation quantile (R-7),
    so the 7 boundary doubles are identical in both engines (the
    same equivalence percentile_exact_event_values pins), and bucket
    assignment is a pure comparison against identical doubles.

    Scale shape: exact percentile is a full-sort-per-group aggregate
    — expensive but single-pass (at 100 TB swap in approx_percentile
    and accept sketched edges; the assignment plan is unchanged).
    The 1-row boundary array broadcasts; assignment is a map-side
    projection into an at-most-N_QUANTILES-key aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    bnds = orders.agg(
        F.expr(
            "percentile(o_totalprice, array("
            + ", ".join(
                f"{i}D / {N_QUANTILES}" for i in range(1, N_QUANTILES)
            )
            + "))"
        ).alias("bnds")
    )
    return _equidepth_assign(orders, bnds)


def _equidepth_assign(orders: DataFrame, bnds: DataFrame) -> DataFrame:
    """Shared assignment stage: broadcast the 1-row boundary array,
    project each order to its bucket, aggregate. Identical for exact
    and sketched boundaries — swapping the boundary aggregate is the
    ONLY difference between the two paths."""
    assigned = orders.crossJoin(F.broadcast(bnds)).select(
        F.expr("size(filter(bnds, x -> o_totalprice > x))")
        .cast("int")
        .alias("bucket"),
        F.col("o_totalprice").alias("v"),
    )
    return assigned.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        F.min("v").alias("min_val"),
        F.max("v").alias("max_val"),
    )


def equidepth_approx_counts(orders: DataFrame) -> DataFrame:
    """The 100 TB equi-depth path: identical plan to
    ``histogram_equidepth_prices`` with the exact full-sort-per-group
    ``percentile`` swapped for the mergeable ``approx_percentile``
    sketch (accuracy 10⁴ ⇒ rank error ≤ n/10⁴ per boundary) — the
    swap the exact variant's docstring promises, as code. The sketch
    aggregates map-side and merges in O(accuracy) state per
    partition; no global sort anywhere. Returns the raw
    (bucket, n_rows, min_val, max_val) histogram."""
    bnds = orders.agg(
        F.expr(
            "approx_percentile(o_totalprice, array("
            + ", ".join(
                f"{i}D / {N_QUANTILES}" for i in range(1, N_QUANTILES)
            )
            + "), 10000)"
        ).alias("bnds")
    )
    return _equidepth_assign(orders, bnds)


# the sketch's boundary DOUBLES are engine- (and merge-order-)
# specific, so hashing the raw bucket counts against DuckDB cannot
# match by construction. The registered query therefore checks the
# CONTRACT instead (the approx_percentile_prices pattern): every
# bucket's depth within max(2% of n/N, 3) of ideal — sketch rank
# error is ≤ n/10⁴ per boundary, a 12× margin — with the oracle side
# a constant-true table. The count-level check against the exact path
# stays in tests/test_corpus_stats.py::test_equidepth_approx_close_to_exact.
@query(
    "histogram_equidepth_approx",
    oracle=f"""
    SELECT CAST(g AS INTEGER) AS bucket,
           true AS depth_within_band,
           (SELECT count(*) FROM orders) AS n
    FROM generate_series(0, {N_QUANTILES - 1}) t(g)
    """,
)
def histogram_equidepth_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth-contract check of the sketched path
    (``equidepth_approx_counts``): each of the N_QUANTILES buckets
    produced from ``approx_percentile`` edges must hold its fair
    share of rows within max(2% of n/N, 3) — far looser than the
    sketch's guaranteed rank error, far tighter than any broken
    plan. A bucket emptied by a degenerate sketch drops its row
    entirely and fails the driver's row-count compare."""
    orders = load_table(spark, sf_dir, "orders")
    counts = equidepth_approx_counts(orders)
    tot = orders.agg(F.count("*").alias("n"))
    ideal = F.col("n") / F.lit(N_QUANTILES)
    band = F.greatest(ideal * F.lit(0.02), F.lit(3.0))
    return counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (F.abs(F.col("n_rows") - ideal) <= band).alias("depth_within_band"),
        "n",
    )
