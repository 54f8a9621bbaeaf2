"""Semi-structured (JSON) operators over events.props.

The reference only uses JSON as a serialization envelope
(reference: src/worker/worker.go:157-163); here JSON is a queryable
data type: extraction, typed parsing, and aggregation over parsed
values — all JVM-side (get_json_object / from_json), no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.registry import query


@query(
    "json_extract_props",
    oracle="""
    SELECT event_id, event_type,
           CAST(props->>'k' AS INTEGER) AS k
    FROM events
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path extraction from a JSON string column."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@query(
    "json_parse_and_aggregate",
    oracle="""
    SELECT event_type,
           round(avg(CAST(props->>'k' AS INTEGER)), 4) AS avg_k,
           max(CAST(props->>'k' AS INTEGER))           AS max_k,
           count(*)                                    AS n
    FROM events
    GROUP BY event_type
    """,
)
def json_parse_and_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed parse via from_json schema, then relational aggregation
    over the extracted field."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type", F.from_json("props", "k INT").alias("p")
    )
    return parsed.groupBy("event_type").agg(
        F.round(F.avg("p.k"), 4).alias("avg_k"),
        F.max("p.k").alias("max_k"),
        F.count("*").alias("n"),
    )


@query(
    "json_filter_on_extracted",
    oracle="""
    SELECT event_id, user_id, CAST(props->>'k' AS INTEGER) AS k
    FROM events
    WHERE CAST(props->>'k' AS INTEGER) >= 90
      AND event_type = 'purchase'
    """,
)
def json_filter_on_extracted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate on a JSON-extracted value combined with a column
    predicate (the column predicate still pushes to parquet)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.filter((k >= 90) & (F.col("event_type") == "purchase"))
        .select("event_id", "user_id", k.alias("k"))
    )


@query(
    "json_variant_props",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT)                        AS n,
           CAST(sum(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(min(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS min_k
    FROM events
    WHERE CAST(props->>'k' AS INTEGER) % 2 = 0
    GROUP BY event_type
    """,
)
def json_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured processing via the VARIANT type (Spark 4):
    props parses once to a variant, fields extract with typed
    variant_get paths — the open-schema alternative to from_json's
    fixed schema (new fields need no schema change, and the binary
    variant encoding skips per-access JSON re-parsing)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k") % 2 == 0)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("bigint").alias("min_k"),
        )
    )
