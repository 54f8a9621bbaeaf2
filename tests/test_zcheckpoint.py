"""session.iter_checkpoint storage is conf-driven: with no checkpoint
dir set, iterative rounds use localCheckpoint; once the app sets a
reliable dir (``sc.setCheckpointDir`` — the standard Spark knob, an
HDFS/object-store path on a real cluster) the SAME loops write
reliable checkpoints, and results are unchanged.

File named to sort LAST in collection: a checkpoint dir cannot be
unset on a live SparkContext, so setting it here must not leak into
the plan/perf expectations of earlier test files.
"""

from __future__ import annotations

from pathlib import Path

from tests.conftest import SF_SMOKE


def test_reliable_checkpoint_dir_is_used_when_set(spark, tmp_path_factory):
    from dist_map_reduce_spark import caching
    from dist_map_reduce_spark.functions.graph import pagerank_dedup_graph

    before = sorted(map(tuple, pagerank_dedup_graph(spark, SF_SMOKE).collect()))
    # drop the construction-time cache so the loop actually re-runs
    caching.clear()

    ckdir = tmp_path_factory.mktemp("reliable_ck")
    spark.sparkContext.setCheckpointDir(str(ckdir))
    after = sorted(map(tuple, pagerank_dedup_graph(spark, SF_SMOKE).collect()))

    assert after == before
    rdd_dirs = list(Path(ckdir).glob("*/rdd-*"))
    assert rdd_dirs, "no reliable checkpoint data written under the set dir"


def test_append_sink_checkpoint_recovery_exactly_once(spark):
    """Streaming restart-after-crash through ParquetAppendSink: an
    availableNow run consumes the input available at start and stops;
    a later run bound to the SAME checkpoint must process ONLY input
    committed after the first run's offsets — each input row appears
    in the committed output exactly once, never replayed. This is the
    engine-fidelity analog of the reference's one fault-tolerance
    mechanism (timeout re-queue of unfinished tasks,
    src/master/master.go:251-271): Spark re-executes uncommitted
    work from the checkpoint instead of a master re-queuing it, and
    the file sink's _spark_metadata commit log makes re-execution
    invisible to readers.

    Deterministic by construction: the 'crash' is the boundary
    between two availableNow runs (first drains chunk A, second
    starts with chunk B added), so no mid-batch kill race decides
    what was committed."""
    import os

    from pyspark.sql import functions as F

    from dist_map_reduce_spark.catalog import load_table
    from dist_map_reduce_spark.scratch import scratch_path as _scratch
    from dist_map_reduce_spark.streaming import pipelines

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "event_type", "value"
    )
    staged = _scratch(SF_SMOKE, "events_recovery_staged")
    base = _scratch(SF_SMOKE, "append_sink_recovery")
    import shutil

    shutil.rmtree(staged, ignore_errors=True)
    shutil.rmtree(base, ignore_errors=True)

    chunk_a = ev.filter(F.col("event_id") % 2 == 0)
    chunk_b = ev.filter(F.col("event_id") % 2 == 1)
    chunk_a.write.mode("overwrite").parquet(staged)

    schema = spark.read.parquet(staged).schema

    def run(sink):
        stream = (
            spark.readStream.schema(schema)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(staged)
        )
        return sink.run(stream, "recovery", "append")

    first = run(pipelines.ParquetAppendSink(base_dir=base))
    n_a = first.count()
    assert n_a == chunk_a.count()

    # "crash" boundary: first run is gone; new input lands
    chunk_b.write.mode("append").parquet(staged)

    resumed = run(pipelines.ParquetAppendSink(base_dir=base, resume=True))
    got = resumed.groupBy().agg(
        F.count("*").alias("n"),
        F.count_distinct("event_id").alias("n_ids"),
    ).collect()[0]
    total = ev.count()
    assert got.n == total, "resume lost or replayed committed input"
    assert got.n_ids == total, "duplicate event rows after resume"


def test_append_sink_mid_stream_crash_then_resume(spark):
    """A genuine mid-stream crash: one availableNow run where
    micro-batch 0 (file A) COMMITS and micro-batch 1 (file B, which
    contains a poison row) THROWS, killing the query with committed
    and uncommitted work in the same run. After the poison input is
    repaired, a resume bound to the same checkpoint must emit file
    A's rows zero more times and file B's rows exactly once — the
    checkpoint + _spark_metadata commit log version of the
    reference's re-queue-only-unfinished-tasks rule
    (src/master/master.go:251-271)."""
    import shutil

    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException
    from pyspark.sql import functions as F

    from dist_map_reduce_spark.catalog import load_table
    from dist_map_reduce_spark.scratch import scratch_path as _scratch
    from dist_map_reduce_spark.streaming import pipelines

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "event_type", "value"
    )
    staged = _scratch(SF_SMOKE, "events_crash_staged")
    base = _scratch(SF_SMOKE, "append_sink_crash")
    shutil.rmtree(staged, ignore_errors=True)
    shutil.rmtree(base, ignore_errors=True)

    chunk_a = ev.filter(F.col("event_id") % 2 == 0)
    chunk_b = ev.filter(F.col("event_id") % 2 == 1)
    # file A (clean) must sort before file B (poisoned) in the file
    # source's mtime-then-path order: write A first, B second, with
    # path names that agree with the mtime order as a tie-break
    chunk_a.coalesce(1).write.mode("overwrite").parquet(staged + "/a")
    chunk_b.withColumn(
        "event_type",
        F.when(F.col("event_id") == 1, F.lit("__poison__")).otherwise(
            F.col("event_type")
        ),
    ).coalesce(1).write.mode("overwrite").parquet(staged + "/b")

    schema = spark.read.parquet(staged + "/a").schema

    def run(resume: bool):
        stream = (
            spark.readStream.schema(schema)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(staged + "/*")
        )
        # tripwire: evaluating a poison row kills the micro-batch.
        # Folded into the projected column so pruning can't drop it.
        guarded = stream.withColumn(
            "event_type",
            F.when(
                F.assert_true(
                    F.col("event_type") != F.lit("__poison__"), F.lit("poison row")
                ).isNull(),
                F.col("event_type"),
            ),
        )
        sink = pipelines.ParquetAppendSink(base_dir=base, resume=resume)
        return sink.run(guarded, "crash", "append")

    with pytest.raises(StreamingQueryException):
        run(resume=False)

    committed = spark.read.schema(schema).parquet(base + "/crash")
    n_committed = committed.count()
    assert n_committed == chunk_a.count(), (
        "expected exactly file A committed before the crash "
        f"(got {n_committed} rows)"
    )

    # repair: rewrite file B without the poison row, same path so the
    # uncommitted offsets re-read the fixed bytes
    chunk_b.coalesce(1).write.mode("overwrite").parquet(staged + "/b")

    resumed = run(resume=True)
    got = resumed.groupBy().agg(
        F.count("*").alias("n"), F.count_distinct("event_id").alias("n_ids")
    ).collect()[0]
    total = ev.count()
    assert got.n == total, "crash-resume lost or replayed committed rows"
    assert got.n_ids == total, "duplicate rows after crash-resume"
