"""Structured Streaming pipelines over the events table.

The reference is strictly batch (job ends at its Shutdown phase,
reference: src/master/master.go:206-213); streaming is part of the
engine's extended surface (SURVEY.md §2.2).

Pipelines are defined against a SOURCE/SINK BINDING, not a concrete
endpoint: every pipeline reads through ``read_events_stream`` and
emits through ``run_sink``, which dispatch to the active ``Binding``.
Available bindings:

- ``FileSource`` (default): availableNow replay of the parquet
  fixture — deterministic, which is what makes the oracle comparison
  possible. In production the same binding tails a landing directory.
- ``KafkaSource``: the production unbounded source (JSON values
  parsed against the events schema). Requires the Kafka connector
  jar, absent from this container — constructed and documented, not
  integration-tested here.
- ``MemorySink`` (default): the TEST adapter. Complete/update state
  is materialized on the driver, which is exactly what the oracle
  contract needs on bounded fixtures and exactly wrong at production
  key-cardinality — production uses the two sinks below.
- ``ParquetAppendSink``: append-mode results written by executors to
  files + checkpoint; scales with output size, no driver state.
- ``ForeachBatchMergeSink``: complete/update-mode results MERGEd
  per micro-batch into a keyed target table (the streaming-CDC
  pattern; with Delta/Iceberg the body becomes MERGE INTO).

``tests/test_streaming.py`` runs the same pipelines through the
scalable sinks and asserts they agree with the memory-sink answer,
so the production code path is exercised, not just documented.
Watermarked variants (append mode) drop nothing on replay only
because availableNow processes all input in order.

API note: arbitrary per-key state is covered via
``applyInPandasWithState`` (``streaming_stateful_user_totals``).
Its Spark 4 successor ``transformWithStateInPandas``
(StatefulProcessor + typed state handles) cannot run in this
container: its state-server protocol requires ``google.protobuf``,
which is not importable here (verified: the streaming Python runner
crashes with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). On an
environment with protobuf, the legacy query's state function ports
to a StatefulProcessor with one ValueState holding the same
(n, total_micro) tuple — same semantics, same oracle.
"""

from __future__ import annotations

import contextlib
import os
import re
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import table_path
from dist_map_reduce_spark.money import sum_money
from dist_map_reduce_spark.registry import query

# --- scale-adaptive state partitioning (optimization guide §2.2) ---
#
# Stateful streaming shuffles cannot be AQE-coalesced (AQE is
# disabled for stateful workloads), so the state-store partition
# count is pinned from spark.sql.shuffle.partitions at query start.
# Inheriting the session default (the core count) over-partitions
# small state: each state partition carries a FIXED per-batch cost
# (store open + version load + delta-file commit, ~100 ms/partition/
# batch measured for the symmetric hash join on this container), so
# the stream-stream left join at sf0.1 ran 5.9 s at 32 partitions vs
# 2.4 s at 8 with identical rows (OPTIMIZATION_r16.md has the full
# 1/2/4/8/32 curve). Size the state shuffle to the DATA instead:
# one partition per ~32 MB of source input, floored by a small
# parallelism constant (keep multi-core nodes busy without
# scattering tiny state across dozens of stores) and capped at 4x
# the cluster's default parallelism — all three terms scale with
# deployment, nothing is tuned to local[32].
_STATE_PART_BYTES = 32 << 20
_SUGGESTED_PARTS: list[int] = []  # last FileSource.read suggestion
# (path, glob) -> ((bytes, mtime), schema): footer-read memo
_SCHEMA_MEMO: dict = {}


def _mtime(path: str) -> int:
    try:
        return os.stat(path).st_mtime_ns
    except OSError:
        return 0


def _glob_bytes(path: str | None, sf_dir: str, glob: str) -> int:
    """Total bytes of the files a FileSource stream will replay."""
    import glob as globmod

    if path is None:
        files = globmod.glob(os.path.join(sf_dir, glob))
    elif os.path.isdir(path):
        files = [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(path)
            for f in fs
            if not f.startswith(("_", "."))
        ]
    else:
        files = [path]
    return sum(os.path.getsize(f) for f in files if os.path.isfile(f))


def state_partitions(spark: SparkSession, nbytes: int) -> int:
    """Scale-adaptive state-store partition count: bytes-derived,
    parallelism-floored, cluster-capped (see block comment above)."""
    cores = spark.sparkContext.defaultParallelism
    need = max(1, -(-nbytes // _STATE_PART_BYTES))
    return max(min(cores, 8), min(need, 4 * cores))


@contextlib.contextmanager
def stream_shuffle_scope(spark: SparkSession):
    """Apply the pending FileSource partition suggestion(s) around a
    streaming start()/awaitTermination() pair, restoring the session
    default afterwards so batch queries keep their AQE initial
    partition count. No-op when no suggestion is pending (e.g. a
    Kafka source, whose volume is unknowable up front).

    ADVICE r16 hardening: ALL pending suggestions are consumed and
    the state shuffle sized by their MAX — a stream-stream join
    builds two sources per invocation and its symmetric state must
    be sized by the larger input, not whichever source happened to
    be constructed last. The pending list is also cleared on scope
    EXIT, so a source whose sink never started (query construction
    failed in between) cannot leak its suggestion past the next
    completed stream. Residual window (accepted): a suggestion from
    a failed construction can still be read by a scope entered
    before any other stream completes — it only over/under-sizes
    that one stream's state shuffle, and the session value is
    restored either way."""
    key = "spark.sql.shuffle.partitions"
    suggestion = max(_SUGGESTED_PARTS) if _SUGGESTED_PARTS else None
    _SUGGESTED_PARTS.clear()
    if suggestion is None:
        yield
        return
    prev = spark.conf.get(key)
    spark.conf.set(key, str(suggestion))
    try:
        yield
    finally:
        spark.conf.set(key, prev)
        _SUGGESTED_PARTS.clear()


@dataclass(frozen=True)
class FileSource:
    """availableNow file stream over the fixture directory (or, in
    production, a landing directory files arrive into). ``path``
    overrides the directory entirely (e.g. a staged multi-chunk
    landing dir); otherwise the sf dir is streamed with a glob
    picking out the events table (the file-stream source requires a
    directory)."""

    glob: str = "events.parquet"
    max_files_per_trigger: int | None = None
    path: str | None = None

    def read(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")  # see catalog.py
        # pathGlobFilter matches FILES only: the fixture ships the
        # table as a single file named <glob>, but a synthesized or
        # production table is a DIRECTORY of part files under that
        # name (the scale-probe corpus) — stream the directory
        # itself in that case
        path = self.path
        if path is None:
            cand = os.path.join(sf_dir, self.glob)
            if os.path.isdir(cand):
                path = cand
        # pin the stream schema from a batch read of the SAME files
        # the glob selects (not hard-coded to events: the stream may
        # replay any fixture table, e.g. documents for wordcount).
        # The footer read costs ~75 ms per call and a stream-stream
        # join builds two sources per invocation — memoize per
        # (path, glob, mtime), the catalog._DF_MEMO staleness
        # contract (r16).
        skey = (path or sf_dir, self.glob)
        stamp = _glob_bytes(path, sf_dir, self.glob), _mtime(path or sf_dir)
        hit = _SCHEMA_MEMO.get(skey)
        if hit is not None and hit[0] == stamp:
            schema = hit[1]
        elif path is not None:
            schema = spark.read.parquet(path).schema
            _SCHEMA_MEMO[skey] = (stamp, schema)
        else:
            schema = (
                spark.read.option("pathGlobFilter", self.glob)
                .parquet(sf_dir)
                .schema
            )
            _SCHEMA_MEMO[skey] = (stamp, schema)
        reader = spark.readStream.schema(schema).format("parquet")
        if path is None:
            reader = reader.option("pathGlobFilter", self.glob)
        if self.max_files_per_trigger is not None:
            reader = reader.option(
                "maxFilesPerTrigger", str(self.max_files_per_trigger)
            )
        # record the bytes-derived state-partition suggestion for the
        # sink that will start this stream; APPEND, never replace —
        # a stream-stream join builds two sources before one sink
        # starts, and stream_shuffle_scope sizes by the max of all
        # pending suggestions (ADVICE r16)
        _SUGGESTED_PARTS.append(
            state_partitions(spark, _glob_bytes(path, sf_dir, self.glob))
        )
        return _normalize_ts(reader.load(path or sf_dir))


@dataclass(frozen=True)
class KafkaSource:
    """Unbounded production source: events as JSON message values,
    parsed against the batch events schema. Needs the
    spark-sql-kafka connector on the classpath; this container does
    not ship it, so the binding is exercised only on real clusters."""

    bootstrap_servers: str
    topic: str
    starting_offsets: str = "earliest"

    def read(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        schema = spark.read.parquet(table_path(sf_dir, "events")).schema
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap_servers)
            .option("subscribe", self.topic)
            .option("startingOffsets", self.starting_offsets)
            .load()
        )
        parsed = raw.select(
            F.from_json(F.col("value").cast("string"), schema).alias("e")
        ).select("e.*")
        return _normalize_ts(parsed)


def _normalize_ts(df: DataFrame) -> DataFrame:
    """Naive timestamp[us] reads as TIMESTAMP_NTZ, which
    withWatermark rejects — cast to TIMESTAMP (ltz) under the
    pinned-UTC session, exactly as the batch catalog does. Streams
    without a ts column (e.g. the documents corpus) pass through."""
    if "ts" in df.columns and dict(df.dtypes).get("ts") != "timestamp":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


_SINK_SEQ = 0
# one live memory-sink table per pipeline name: repeated invocations
# in a long-lived session drop the previous run's sink instead of
# accumulating tables in the driver (same discipline as
# caching.persist_tracked)
_LAST_SINK: dict[str, str] = {}


class MemorySink:
    """TEST adapter: drive the stream to completion (availableNow)
    into a memory sink and return the materialized result. State
    lives on the driver — right for bounded oracle fixtures, a
    driver OOM at production key-cardinality (use
    ForeachBatchMergeSink / ParquetAppendSink there)."""

    def run(self, df: DataFrame, name: str, output_mode: str) -> DataFrame:
        global _SINK_SEQ
        _SINK_SEQ += 1
        sink = f"{re.sub('[^a-zA-Z0-9_]', '_', name)}_{_SINK_SEQ}"
        spark = df.sparkSession
        prev = _LAST_SINK.get(name)
        if prev is not None:
            spark.catalog.dropTempView(prev)
        with stream_shuffle_scope(spark):
            q = (
                df.writeStream.outputMode(output_mode)
                .format("memory")
                .queryName(sink)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        _LAST_SINK[name] = sink
        return spark.table(sink)


@dataclass(frozen=True)
class ParquetAppendSink:
    """Scalable append-mode sink: executors write result files under
    ``base_dir/<name>`` with a streaming checkpoint for exactly-once
    file commits. No driver-side state — output cost scales with the
    emitted rows, not the keyspace.

    ``resume=True`` keeps the existing output/checkpoint pair, so the
    run continues from the committed offsets (the production
    restart-after-crash path: only uncommitted input is processed,
    and the read-back sees each input row's output exactly once via
    the file sink's _spark_metadata commit log). The default is a
    fresh replay — fixture pipelines are rerun on identical input,
    where a surviving checkpoint would mark everything committed and
    emit nothing into the freshly-cleared output dir."""

    base_dir: str
    resume: bool = False

    def run(self, df: DataFrame, name: str, output_mode: str) -> DataFrame:
        if output_mode != "append":
            raise ValueError(
                "ParquetAppendSink is append-only; complete/update "
                "pipelines bind ForeachBatchMergeSink"
            )
        path = os.path.join(self.base_dir, name)
        if not self.resume:
            # drop output AND checkpoint together: a surviving
            # checkpoint marks the source offsets committed, so a
            # rerun would emit nothing into the freshly-cleared
            # output dir
            shutil.rmtree(path, ignore_errors=True)
            shutil.rmtree(path + "_ckpt", ignore_errors=True)
        with stream_shuffle_scope(df.sparkSession):
            q = (
                df.writeStream.outputMode("append")
                .format("parquet")
                .option("path", path)
                .option("checkpointLocation", path + "_ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        spark = df.sparkSession
        # a watermarked append stream can legitimately emit ZERO rows
        # (input span shorter than one window ⇒ every window withheld
        # at availableNow): no parquet files exist then, and a bare
        # read would raise PATH_NOT_FOUND instead of an empty result
        wrote_files = os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        )
        if not wrote_files:
            return spark.createDataFrame([], df.schema)
        return spark.read.schema(df.schema).parquet(path)


@dataclass(frozen=True)
class ForeachBatchMergeSink:
    """Scalable complete/update-mode sink: each micro-batch's updated
    aggregate rows are MERGEd by ``keys`` into a keyed target table
    (parquet ping-pong here; MERGE INTO with Delta/Iceberg — the
    dataflow is unchanged). Update-mode rows carry cumulative values,
    so last-write-wins per key reproduces the final state without
    ever materializing it on the driver."""

    base_dir: str
    keys: tuple[str, ...]

    def run(self, df: DataFrame, name: str, output_mode: str) -> DataFrame:
        """Drive ``df`` to completion, merging each micro-batch into
        the keyed target.

        CONTRACT: the stream always runs in 'update' mode and the
        merge is last-write-wins per ``keys`` — correct exactly when
        emitted rows carry CUMULATIVE values keyed by ``keys`` (i.e.
        ``keys`` equals the pipeline's grouping columns, the shape of
        every registered complete/update pipeline). A pipeline whose
        'complete' result is not a keyed cumulative aggregate, or
        whose grouping differs from the bound ``keys``, must bind a
        different sink — the guard below rejects batches whose key
        columns are not all present."""
        if output_mode not in ("complete", "update"):
            raise ValueError(
                "ForeachBatchMergeSink serves complete/update modes; "
                "append pipelines bind ParquetAppendSink"
            )
        missing = [k for k in self.keys if k not in df.columns]
        if missing:
            raise ValueError(
                f"ForeachBatchMergeSink keys {missing} absent from the "
                f"pipeline's output columns {df.columns} — the merge "
                "would not be keyed by the aggregate's grouping"
            )
        base = os.path.join(self.base_dir, name)
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base, exist_ok=True)
        versions: list[str] = []
        keys = list(self.keys)

        def merge_batch(batch: DataFrame, batch_id: int) -> None:
            spark = batch.sparkSession
            if versions:
                target = spark.read.parquet(versions[-1])
                # the batch's rows supersede the target's for their keys
                merged = target.join(
                    batch.select(keys), on=keys, how="left_anti"
                ).unionByName(batch)
            else:
                merged = batch
            out = os.path.join(base, f"v{batch_id}")
            merged.write.mode("overwrite").parquet(out)
            versions.append(out)
            for old in versions[:-1]:
                shutil.rmtree(old, ignore_errors=True)
            del versions[:-1]

        with stream_shuffle_scope(df.sparkSession):
            q = (
                df.writeStream.outputMode("update")
                .foreachBatch(merge_batch)
                .option("checkpointLocation", os.path.join(base, "_ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        spark = df.sparkSession
        if not versions:
            return spark.createDataFrame([], df.schema)
        return spark.read.parquet(versions[-1])


@dataclass(frozen=True)
class Binding:
    """A (source, sink) pair pipelines run against."""

    source: object
    sink: object


def bind(source: object | None = None, sink: object | None = None) -> Binding:
    return Binding(source or FileSource(), sink or MemorySink())


_ACTIVE_BINDING: Binding | None = None


@contextlib.contextmanager
def use_binding(binding: Binding):
    """Run registered pipelines against a non-default binding (tests
    bind the scalable sinks; a deployment binds Kafka → merge/append)."""
    global _ACTIVE_BINDING
    prev = _ACTIVE_BINDING
    _ACTIVE_BINDING = binding
    try:
        yield
    finally:
        _ACTIVE_BINDING = prev


def active_binding() -> Binding:
    return _ACTIVE_BINDING or bind()


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of the events table through the active source
    binding (schema pinned from the batch reader; ts normalized to
    TIMESTAMP exactly as the batch catalog does)."""
    return active_binding().source.read(spark, sf_dir)


def run_sink(df: DataFrame, name: str, output_mode: str = "complete") -> DataFrame:
    """Drive a streaming DataFrame to completion through the active
    sink binding and return the materialized result."""
    return active_binding().sink.run(df, name, output_mode)


@query(
    "streaming_event_counts",
    oracle=f"""
    SELECT event_type, count(*) AS n, {sum_money("value", "sum_value")}
    FROM events
    GROUP BY event_type
    """,
)
def streaming_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming global aggregation (complete mode): after consuming
    the full input, the state equals the batch answer — checked
    against the batch oracle. value sums accumulate in DECIMAL
    (money.sum_money, identical text both dialects): a double sum is
    association-order dependent and micro-batch merge order differs
    from any batch engine's."""
    agg = (
        read_events_stream(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.expr(sum_money("value", "sum_value")))
    )
    return run_sink(agg, "streaming_event_counts")


@query(
    "streaming_tumbling_1h",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts)                   AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR AS window_end,
           count(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-window aggregation (complete mode) — same
    window semantics as the batch events_tumbling_1h."""
    agg = (
        read_events_stream(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
        )
    )
    return run_sink(agg, "streaming_tumbling_1h")


@query(
    "streaming_watermarked_tumbling",
    oracle="""
    WITH w AS (
      SELECT time_bucket(INTERVAL '1 hour', ts)                   AS window_start,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR AS window_end,
             event_type, count(*) AS n
      FROM events GROUP BY 1, 2, 3
    )
    SELECT * FROM w
    WHERE window_end <= (SELECT max(ts) - INTERVAL 30 MINUTE FROM events)
    """,
)
def streaming_watermarked_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked append-mode windows: the production late-data
    pattern (state for a window is dropped once the watermark passes
    window_end + delay).

    The append-mode output is itself deterministic here, so it gets
    a FULL oracle: the source is a single parquet file, so
    availableNow processes one data batch (no mid-stream watermark
    can drop anything) and the flush batch emits exactly the windows
    with window_end ≤ final watermark = max(ts) − 30 min. The oracle
    is the batch aggregation with that cut applied — the tail
    windows the stream legitimately withholds."""
    agg = (
        read_events_stream(spark, sf_dir)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )
    return run_sink(agg, "streaming_watermarked_tumbling", "append")


@query(
    "streaming_stateful_user_totals",
    oracle=f"""
    SELECT user_id, count(*) AS n_events, {sum_money("value", "sum_value")}
    FROM events
    GROUP BY user_id
    """,
)
def streaming_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running (count, sum) state maintained across
    micro-batches, update-mode emission. After consuming all input
    the final per-key state equals the batch aggregate, so the
    result (max of running totals per key) is oracle-checked.

    The state function is a local closure — see the pickle-by-value
    rule in functions/multimodal.py. State accumulates in integer
    micro-units (value × 10⁶, exact for the fixture's 2-dp values):
    float accumulation in micro-batch arrival order can differ from
    the oracle's association order by an ulp, and round(..., 2)
    turns that into a half-cent boundary flip — the same failure
    mode money.py's DECIMAL pattern exists to avoid.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update_user_state(key, pdf_iter, state):
        import pandas as _pd

        n, total_micro = state.get() if state.exists else (0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            # per-VALUE integerization (a float batch-sum would
            # reintroduce the accumulation error being avoided)
            total_micro += int(pdf["value"].mul(1e6).round().astype("int64").sum())
        state.update((n, total_micro))
        yield _pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "running_sum": [total_micro / 1e6],
            }
        )

    emitted = (
        read_events_stream(spark, sf_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            update_user_state,
            outputStructType="user_id long, n_events long, running_sum double",
            stateStructType="n long, total_micro long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    sink = run_sink(emitted, "streaming_stateful_user_totals", "update")
    # update-mode sink holds one row per key per batch; running totals
    # are monotone, so the per-key max is the final state
    return sink.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.round(F.max("running_sum"), 2).alias("sum_value"),
    )


@query(
    "streaming_dedup_events",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM (SELECT DISTINCT event_id, event_type FROM events)
    GROUP BY event_type
    """,
)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: dropDuplicatesWithinWatermark keys
    state by event_id and expires it once the watermark passes —
    bounded state, the streaming form of the exact-dedup operator.
    The fixture has unique event_ids, so the deduped count equals
    the distinct oracle."""
    dedup = (
        read_events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    return run_sink(dedup, "streaming_dedup_events", "complete")


@query(
    "streaming_session_windows",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             -- strictly greater: session_window merges at exactly
             -- the gap (see operators/timeseries.py boundary note)
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT *, sum(new_session) OVER (
        PARTITION BY user_id ORDER BY ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    ),
    sessions AS (
      SELECT user_id, min(ts) AS session_start,
             max(ts) + INTERVAL 10 MINUTE AS session_end,
             CAST(count(*) AS BIGINT) AS n_events
      FROM numbered GROUP BY user_id, session_id
    )
    SELECT * FROM sessions
    WHERE session_end <= (SELECT max(ts) - INTERVAL 30 MINUTE FROM events)
    """,
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization (session_window + watermark, append
    mode) — merging session state across micro-batches.

    Deterministic with a full oracle, same argument as
    streaming_watermarked_tumbling: single-file source → one data
    batch → the flush emits exactly the gap-islands sessions with
    session_end ≤ max(ts) − 30 min."""
    agg = (
        read_events_stream(spark, sf_dir)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    return run_sink(agg, "streaming_session_windows", "append")


@query(
    "streaming_static_join_enrich",
    oracle=f"""
    SELECT c_mktsegment, count(*) AS n_events,
           {sum_money("value", "sum_value")}
    FROM events JOIN customer ON user_id = c_custkey
    WHERE event_type = 'purchase'
    GROUP BY c_mktsegment
    """,
)
def streaming_static_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream is enriched against the
    static customer dimension (planned as a broadcast per
    micro-batch — the static side is re-resolved each batch, no
    stream state), then aggregated in complete mode. At scale the
    static side follows the same rules as any batch join: bounded
    dim → broadcast; unbounded → shuffled join per batch."""
    from dist_map_reduce_spark.catalog import load_table

    purchases = read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    agg = (
        purchases.join(cust, purchases.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.expr(sum_money("value", "sum_value")),
        )
    )
    return run_sink(agg, "streaming_static_join_enrich")


@query(
    "streaming_stream_stream_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS delay_sec
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with watermarks: clicks matched to
    purchases by the same user within 30 minutes. Both sides carry a
    1-hour watermark and the join has a two-sided time bound, so
    Spark can expire buffered state — the state store never grows
    beyond ~watermark+bound worth of events per side, which is what
    makes the join runnable on an unbounded stream. availableNow
    processes the fixture in one pass; the emitted matches equal the
    batch time-bounded join (the oracle)."""
    ev = read_events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTE")),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.col("p_ts").cast("long") - F.col("c_ts").cast("long")).alias(
            "delay_sec"
        ),
    )
    return run_sink(
        joined, "streaming_stream_stream_join", output_mode="append"
    )


@query(
    "streaming_foreachbatch_upsert",
    oracle="""
    SELECT user_id, round(value, 2) AS last_value, ts AS last_ts
    FROM (
      SELECT user_id, value, ts,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE event_type = 'purchase'
    ) WHERE rn = 1
    """,
)
def streaming_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch upsert sink: each micro-batch MERGEs its latest
    purchase per user into a key-versioned target table — the
    standard streaming-CDC pattern (stream → MERGE INTO dim). The
    target is plain parquet, ping-ponged between two versioned dirs
    per batch (no transactional format in this environment; with
    Delta/Iceberg the foreachBatch body becomes MERGE INTO and the
    dataflow is unchanged). Final target state is checked against
    the batch latest-event-per-user oracle."""
    import os
    import shutil

    from dist_map_reduce_spark.scratch import scratch_path

    base = scratch_path(sf_dir, "stream_upsert_target")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    versions: list[str] = []

    def upsert_batch(batch: DataFrame, batch_id: int) -> None:
        # latest purchase per user WITHIN the batch (deterministic
        # tie-break), then MERGE into the current target version
        from pyspark.sql import Window as W

        w = W.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        latest = (
            batch.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "user_id",
                F.round("value", 2).alias("last_value"),
                F.col("ts").alias("last_ts"),
                "event_id",
            )
        )
        s = batch.sparkSession
        if versions:
            target = s.read.parquet(versions[-1])
            # keep event_id through the merge so later batches win
            # ties deterministically, exactly like the oracle
            merged_w = W.partitionBy("user_id").orderBy(
                F.col("last_ts").desc(), F.col("event_id").desc()
            )
            merged = (
                target.unionByName(latest)
                .withColumn("rn", F.row_number().over(merged_w))
                .filter(F.col("rn") == 1)
                .drop("rn")
            )
        else:
            merged = latest
        out = os.path.join(base, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(out)
        versions.append(out)
        # the write above fully materialized the merge, so the
        # superseded version is dead — drop it (otherwise version
        # dirs accumulate one per micro-batch)
        for old in versions[:-1]:
            shutil.rmtree(old, ignore_errors=True)
        del versions[:-1]

    purchases = read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    with stream_shuffle_scope(spark):
        q = (
            purchases.writeStream.foreachBatch(upsert_batch)
            .option(
                "checkpointLocation", os.path.join(base, "_checkpoint")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    if not versions:
        # the filtered stream produced no micro-batches (no purchase
        # events): the target is legitimately empty
        return spark.createDataFrame(
            [], "user_id long, last_value double, last_ts timestamp"
        )
    return spark.read.parquet(versions[-1]).select(
        "user_id", "last_value", "last_ts"
    )


@query(
    "streaming_multibatch_counts",
    oracle=f"""
    SELECT user_id % 50 AS user_bucket,
           CAST(count(*) AS BIGINT) AS n,
           {sum_money("value", "sum_value")}
    FROM events
    GROUP BY user_id % 50
    """,
)
def streaming_multibatch_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation state maintained across MULTIPLE real micro-batches:
    the events table is staged as 4 parquet chunks and streamed with
    maxFilesPerTrigger=1, so availableNow executes 4 batches and the
    complete-mode state must merge increments from every batch to
    equal the batch answer — the other streaming pipelines process a
    single-file source in one batch, which this query deliberately
    does not."""
    import os

    from dist_map_reduce_spark.catalog import load_table
    from dist_map_reduce_spark.scratch import scratch_path

    staged = scratch_path(sf_dir, "events_chunks")
    if not os.path.isdir(staged):
        load_table(spark, sf_dir, "events").repartition(4).write.mode(
            "overwrite"
        ).parquet(staged)
    stream = FileSource(path=staged, max_files_per_trigger=1).read(spark, sf_dir)
    agg = (
        stream.groupBy((F.col("user_id") % 50).alias("user_bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.expr(sum_money("value", "sum_value")),
        )
    )
    return run_sink(agg, "streaming_multibatch_counts")
