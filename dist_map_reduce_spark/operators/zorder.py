"""Z-order (Morton) multi-dimensional layout keys.

At 100 TB, scan cost is dominated by how much data min/max statistics
let the reader SKIP. A single-column sort gives perfect skipping on
one predicate column and none on any other; interleaving the bits of
two key columns (a Morton / Z-order curve — the layout primitive
behind Delta/Iceberg OPTIMIZE ZORDER) bounds every file's extent in
BOTH dimensions, so selective predicates on either column prune
files. The reference has no layout surface at all (its output is
unsorted "key value" text, reference: src/worker/worker.go:233-246);
this is engine extension surface for the Parquet sink.

The interleave is pure integer arithmetic — 16 bits per dimension,
built as a fixed unrolled shift/mask expression tree, fully inside
whole-stage codegen. The identical arithmetic runs in the DuckDB
oracle, so keys are bit-identical across engines. Writing the layout
is `repartitionByRange(zkey).sortWithinPartitions(zkey)` + the plain
Parquet sink: range partitioning puts contiguous curve segments in
each task, which is exactly what bounds the per-file extents.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query

BITS = 16  # per-dimension resolution; 2 dims -> 32-bit key


def interleave_bits(x: Column, y: Column, bits: int = BITS) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative BIGINT
    columns: bit i of x lands at position 2i, bit i of y at 2i+1.
    Unrolled to 2*bits AND/shift terms — constant-folded into one
    codegen expression, no UDF, no loop at runtime."""
    terms = [
        F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        for i in range(bits)
    ] + [
        F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        for i in range(bits)
    ]
    return reduce(Column.__add__, terms)


def _oracle_interleave(x: str, y: str, bits: int = BITS) -> str:
    terms = [f"(({x} >> {i}) & 1) * {1 << (2 * i)}" for i in range(bits)]
    terms += [f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}" for i in range(bits)]
    return " + ".join(terms)


def zorder_layout(df: DataFrame, zkey: Column, n_files: int) -> DataFrame:
    """Arrange ``df`` into ``n_files`` contiguous Z-curve segments:
    the layout step a sink applies before writing. Range partitioning
    samples the key distribution, so segments are equi-sized even
    when the key space is sparse/skewed."""
    return df.withColumn("zkey", zkey).repartitionByRange(
        n_files, "zkey"
    ).sortWithinPartitions("zkey")


@query(
    "zorder_events_keys",
    oracle=f"""
    SELECT event_id,
           {_oracle_interleave("user_id & 65535",
                               "(epoch_us(ts) // 60000000) & 65535")}
           AS zkey
    FROM events
    """,
)
def zorder_events_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key per event over (user_id, event-minute) — the
    two-dimensional layout key for an events table that serves both
    per-user lookups and time-range scans. Low 16 bits of each
    dimension (user-id modulo and minutes wrap at 65536: the curve
    tiles, which preserves locality within each tile — the property
    file skipping needs)."""
    ev = load_table(spark, sf_dir, "events")
    x = F.col("user_id").bitwiseAND(F.lit(65535))
    y = F.floor(F.unix_timestamp("ts") / 60).cast("bigint").bitwiseAND(
        F.lit(65535)
    )
    return ev.select("event_id", interleave_bits(x, y).alias("zkey"))
