"""Streaming ≡ batch equivalence (SURVEY.md §7 M3 risk mitigation:
streaming has no SQL oracle, so we assert it against the batch
engine on identical input), plus source/sink binding equivalence:
the scalable production sinks must produce the same answers as the
memory test adapter."""

from __future__ import annotations

from pyspark.sql import functions as F

from dist_map_reduce_spark import registry
from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.scratch import scratch_path as _scratch
from dist_map_reduce_spark.streaming import pipelines
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


def test_foreachbatch_merge_sink_matches_memory(spark):
    """The same complete-mode pipeline through the scalable
    ForeachBatchMergeSink (per-batch keyed MERGE, no driver state)
    must equal the memory-sink answer — the production sink is a
    code path, not documentation. maxFilesPerTrigger=1 over the
    4-chunk staging would be ideal, but the fixture is one file;
    multi-batch merge is covered by streaming_multibatch_counts."""
    fn = registry.QUERIES["streaming_event_counts"]
    via_memory = fn(spark, SF_SMOKE).toPandas()
    merge = pipelines.ForeachBatchMergeSink(
        base_dir=_scratch(SF_SMOKE, "merge_sink"), keys=("event_type",)
    )
    with pipelines.use_binding(pipelines.bind(sink=merge)):
        via_merge = fn(spark, SF_SMOKE).toPandas()
    assert canon_rows(via_merge) == canon_rows(via_memory)


def test_parquet_append_sink_matches_memory(spark):
    """The same append-mode (watermarked) pipeline through the
    scalable ParquetAppendSink (executor-written files + checkpoint)
    must emit exactly the memory-sink rows."""
    fn = registry.QUERIES["streaming_watermarked_tumbling"]
    via_memory = fn(spark, SF_SMOKE).toPandas()
    append = pipelines.ParquetAppendSink(base_dir=_scratch(SF_SMOKE, "append_sink"))
    with pipelines.use_binding(pipelines.bind(sink=append)):
        via_files = fn(spark, SF_SMOKE).toPandas()
    assert canon_rows(via_files) == canon_rows(via_memory)
    assert len(via_files) > 0


def test_update_mode_stateful_through_merge_sink(spark):
    """applyInPandasWithState (update mode) through the keyed merge
    sink: last-write-wins per user reproduces the final state."""
    fn = registry.QUERIES["streaming_stateful_user_totals"]
    via_memory = fn(spark, SF_SMOKE).toPandas()
    merge = pipelines.ForeachBatchMergeSink(
        base_dir=_scratch(SF_SMOKE, "merge_sink_state"), keys=("user_id",)
    )
    with pipelines.use_binding(pipelines.bind(sink=merge)):
        via_merge = fn(spark, SF_SMOKE).toPandas()
    assert canon_rows(via_merge) == canon_rows(via_memory)


def test_merge_sink_across_real_microbatches(spark):
    """ForeachBatchMergeSink's last-write-wins-per-key claim only
    means something across MULTIPLE batches: stage events as 4 parquet
    chunks, stream with maxFilesPerTrigger=1 (4 real micro-batches,
    update mode emits re-updated keys each batch), and assert the
    merged target equals the batch aggregate."""
    import os

    from pyspark.sql import functions as F

    from dist_map_reduce_spark.money import sum_money

    staged = _scratch(SF_SMOKE, "events_chunks_mergetest")
    if not os.path.isdir(staged):
        load_table(spark, SF_SMOKE, "events").repartition(4).write.mode(
            "overwrite"
        ).parquet(staged)
    schema = spark.read.parquet(staged).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(staged)
    )
    agg = stream.groupBy("event_type").agg(
        F.count("*").alias("n"), F.expr(sum_money("value", "sum_value"))
    )
    merge = pipelines.ForeachBatchMergeSink(
        base_dir=_scratch(SF_SMOKE, "merge_sink_multibatch"),
        keys=("event_type",),
    )
    merged = merge.run(agg, "multibatch_counts", "update").toPandas()
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.expr(sum_money("value", "sum_value")))
        .toPandas()
    )
    assert canon_rows(merged) == canon_rows(batch)


def test_kafka_source_shapes_plan(spark):
    """KafkaSource can't run here (connector jar absent), but its
    parse projection must be constructible: from_json against the
    RAW parquet schema — where ts is TIMESTAMP_NTZ, exactly what
    KafkaSource.read uses — so the _normalize_ts cast is genuinely
    exercised, not a no-op on a pre-normalized schema."""
    from dist_map_reduce_spark.catalog import table_path

    schema = spark.read.parquet(table_path(SF_SMOKE, "events")).schema
    assert dict(zip(schema.names, [f.dataType.simpleString() for f in schema.fields]))[
        "ts"
    ] == "timestamp_ntz", "precondition: raw fixture schema is NTZ"
    kafka_shaped = spark.createDataFrame(
        [('{"event_id": 1, "user_id": 2, "event_type": "click", '
          '"value": 1.5, "ts": "2024-01-01T00:00:00"}',)],
        "value string",
    )
    parsed = kafka_shaped.select(
        F.from_json(F.col("value").cast("string"), schema).alias("e")
    ).select("e.*")
    assert dict(parsed.dtypes)["ts"] == "timestamp_ntz"
    parsed = pipelines._normalize_ts(parsed)
    row = parsed.collect()[0]
    assert dict(parsed.dtypes)["ts"] == "timestamp"
    assert row.event_type == "click" and row.user_id == 2


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


def test_parquet_append_sink_zero_emission_returns_empty(spark):
    """A watermarked append stream whose input spans less than one
    window emits NOTHING at availableNow (every window withheld by
    the watermark): the sink must return an empty DataFrame with the
    pipeline's schema, not raise PATH_NOT_FOUND on the unwritten
    output dir."""
    import os

    staged = _scratch(SF_SMOKE, "events_one_window")
    if not os.path.isdir(staged):
        ev = load_table(spark, SF_SMOKE, "events")
        lo = ev.agg(F.min("ts")).collect()[0][0]
        ev.filter(
            F.col("ts") < F.lit(lo) + F.expr("INTERVAL 10 MINUTES")
        ).write.mode("overwrite").parquet(staged)
    schema = spark.read.parquet(staged).schema
    stream = spark.readStream.schema(schema).format("parquet").load(staged)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    append = pipelines.ParquetAppendSink(
        base_dir=_scratch(SF_SMOKE, "append_sink_empty")
    )
    out = append.run(agg, "zero_emission", "append")
    assert out.count() == 0
    assert out.columns == ["window_start", "event_type", "n"]


def test_merge_sink_rejects_mismatched_keys(spark):
    """The merge sink's last-write-wins contract requires its keys to
    be the pipeline's grouping columns — binding it with keys absent
    from the output must fail loudly, not silently mis-merge."""
    import pytest

    from dist_map_reduce_spark.catalog import table_path

    merge = pipelines.ForeachBatchMergeSink(
        base_dir=_scratch(SF_SMOKE, "merge_sink_badkeys"),
        keys=("not_a_column",),
    )
    path = table_path(SF_SMOKE, "events")
    agg = (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .format("parquet")
        .load(path)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    with pytest.raises(ValueError, match="not_a_column"):
        merge.run(agg, "badkeys", "update")


def test_streaming_wordcount_equals_batch(spark):
    """The reference's flagship pipeline run as a stream must land on
    the batch answer once the bounded replay drains (same tokenizer
    expression on both sides)."""
    from dist_map_reduce_spark.operators.wordcount import word_count
    from dist_map_reduce_spark.catalog import load_table
    from dist_map_reduce_spark import registry

    stream = {
        (r.word, r.cnt)
        for r in registry.QUERIES["streaming_wordcount_docs"](
            spark, SF_SMOKE
        ).collect()
    }
    batch = {
        (r.word, r.cnt)
        for r in word_count(load_table(spark, SF_SMOKE, "documents")).collect()
    }
    assert stream == batch and stream


def test_shuffle_scope_sizes_by_max_pending_and_clears(spark):
    """ADVICE r16: a stream-stream join registers TWO FileSource
    suggestions before its sink starts — the scope must size the
    state shuffle by the MAX of all pending suggestions (not the
    last-built source) and leave nothing pending after exit, so a
    source whose sink never started cannot leak its suggestion past
    the next completed stream."""
    from dist_map_reduce_spark.streaming import pipelines as P

    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    P._SUGGESTED_PARTS.clear()
    try:
        P._SUGGESTED_PARTS.extend([4, 9])  # two sources, one query
        with P.stream_shuffle_scope(spark):
            assert spark.conf.get(key) == "9"
        assert spark.conf.get(key) == prev
        assert P._SUGGESTED_PARTS == []
        # abandoned-construction suggestion is dropped at scope exit
        P._SUGGESTED_PARTS.append(7)
        with P.stream_shuffle_scope(spark):
            P._SUGGESTED_PARTS.append(3)  # built mid-stream, sink dies
        assert P._SUGGESTED_PARTS == []
        with P.stream_shuffle_scope(spark):
            assert spark.conf.get(key) == prev  # no stale suggestion
    finally:
        P._SUGGESTED_PARTS.clear()
        spark.conf.set(key, prev)
