"""Streaming ≡ batch equivalence (SURVEY.md §7 M3 risk mitigation:
streaming has no SQL oracle, so we assert it against the batch
engine on identical input)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dist_map_reduce_spark import registry
from dist_map_reduce_spark.catalog import load_table
from tests.conftest import SF_SMOKE, canon_rows

registry.load_all()


def test_streaming_counts_equal_batch(spark):
    stream = registry.QUERIES["streaming_event_counts"](spark, SF_SMOKE).toPandas()
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .toPandas()
    )
    assert canon_rows(stream) == canon_rows(batch)


def test_streaming_watermarked_prefix_of_batch(spark):
    """Append mode emits only windows the watermark has passed — the
    emitted set must be a subset of the batch answer and cover
    everything older than max(ts) - watermark - window."""
    emitted = registry.QUERIES["streaming_watermarked_tumbling"](
        spark, SF_SMOKE
    ).toPandas()
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
        .toPandas()
    )
    emitted_rows = set(canon_rows(emitted))
    batch_rows = set(canon_rows(batch))
    assert emitted_rows <= batch_rows
    assert len(emitted_rows) > 0


def test_streaming_sessions_subset_of_batch(spark):
    emitted = registry.QUERIES["streaming_session_windows"](spark, SF_SMOKE).toPandas()
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .toPandas()
    )
    assert set(canon_rows(emitted)) <= set(canon_rows(batch))
    assert len(emitted) > 0
