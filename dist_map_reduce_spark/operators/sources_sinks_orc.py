"""ORC sink/source round-trip.

Completes the columnar half of the source/sink matrix (SURVEY.md
§2.2: text/CSV/JSON/parquet round-trips live in
``operators/sources_sinks.py``): ORC is Spark's other first-class
columnar format (native vectorized reader, predicate pushdown,
column pruning — the same FileSourceScanExec machinery as parquet).
Same contract as the sibling round-trips: write through the sink,
read back through the matching source, aggregate; the oracle runs on
the ORIGINAL parquet, so any round-trip type loss breaks the hash
match. DuckDB cannot read ORC, which is exactly why the oracle is
anchored on the input table rather than the sink output.

Reference parity: the reference's only sink formats are
space-separated text and ND-JSON (src/worker/worker.go:151-164,
196-212); columnar sinks are part of the engine's extended surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.money import sum_money
from dist_map_reduce_spark.registry import query
from dist_map_reduce_spark.scratch import scratch_path


@query(
    "sink_orc_roundtrip_agg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           {sum_money("l_extendedprice", "sum_price")}
    FROM lineitem
    WHERE l_quantity >= 25
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sink_orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink → ORC source (schema pinned) → aggregate. The filter
    is applied BEFORE the write and the read-back projects only the
    aggregation columns, so `.explain` on the read side shows ORC
    column pruning — the same scan discipline as the parquet path."""
    out = scratch_path(sf_dir, "lineitem_orc")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 25)
    cols = li.select(
        "l_orderkey", "l_returnflag", "l_linestatus", "l_extendedprice"
    )
    cols.write.mode("overwrite").orc(out)
    back = spark.read.schema(cols.schema).orc(out)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.expr(sum_money("l_extendedprice", "sum_price")),
    )
