"""Query registry.

Every implemented operator registers a named query callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, a DuckDB
oracle SQL string over the same fixture views. This is the engine's
equivalent of the reference's pluggable ``mapFunc``/``reduceFunc``
programming surface (reference: src/worker/worker.go:22-23) — except
queries are declarative plans, not imperative task bodies.

Column-name contract: Spark result and oracle result must have
identical column names (driver compares after sorting columns by
name), so every computed column is aliased on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is DuckDB SQL or None (rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registrations run.

    ORDER MATTERS for evidence, not semantics: the verify harness
    records correctness rows for the first 50 registrations per
    round, so modules rotate toward the stalest driver stamps (the
    guard tests in tests/test_registry.py derive staleness from the
    CORRECTNESS_r*.json files on disk). Round 5: the 10 streaming
    queries first (read_events_stream changed this round — the
    NTZ→TIMESTAMP fix — and their r3 stamps predate the Spark 4.1.2
    environment), then relational (its 13 join/distinct/rollup/pivot
    queries still carry round-1 stamps; q1/q3/q5/q6 re-confirm), then
    the r2-stamped families tpch_more, subqueries, arrays_maps, skew,
    bucketing, then the four queries NEW in r5 (never stamped) closing
    the window. Eleven r2-stamped queries spill to round 6: etl's two,
    text_chunk_windows, and the text family.
    """
    # --- inside the 50-slot correctness window (slots 1-50) ---
    from dist_map_reduce_spark.streaming import pipelines  # noqa: F401  (10: 1-10)
    from dist_map_reduce_spark.operators import relational  # noqa: F401  (17: 11-27)
    from dist_map_reduce_spark.operators import tpch_more  # noqa: F401  (6: 28-33)
    from dist_map_reduce_spark.operators import subqueries  # noqa: F401  (5: 34-38)
    from dist_map_reduce_spark.operators import arrays_maps  # noqa: F401  (6: 39-44)
    from dist_map_reduce_spark.operators import skew  # noqa: F401  (1: 45)
    from dist_map_reduce_spark.operators import bucketing  # noqa: F401  (1: 46)
    # new in r5 (never stamped — must be inside the window)
    from dist_map_reduce_spark.functions import dedup_simhash  # noqa: F401  (1: 47)
    from dist_map_reduce_spark.operators import sources_sinks_orc  # noqa: F401  (1: 48)
    from dist_map_reduce_spark.operators import timeseries_fill  # noqa: F401  (1: 49)
    from dist_map_reduce_spark.operators import cohorts  # noqa: F401  (1: 50)
    # etl (2, r2) plus chunking + text's 9 r2-stamped queries spill
    # past the window — round 6's rotation
    from dist_map_reduce_spark.operators import etl  # noqa: F401
    from dist_map_reduce_spark.functions import chunking  # noqa: F401
    from dist_map_reduce_spark.functions import text  # noqa: F401
    # --- outside the window: driver-green in r3/r4, unchanged ---
    from dist_map_reduce_spark.functions import (  # noqa: F401
        clustering,
        curation,
        graph,
        multimodal_ext,
        packing,
        python_udfs,
        similarity,
    )
    from dist_map_reduce_spark.operators import (  # noqa: F401
        approx,
        json_ops,
        scalar_fns,
        scd,
        setops,
        sources_sinks,
        stats,
        timeseries,
        tpch_full,
        windows,
        wordcount,
    )
