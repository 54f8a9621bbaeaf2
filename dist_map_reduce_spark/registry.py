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
    round, so modules rotate. Round 4: the 2 queries without any
    driver row yet (dedup_keep_drop_list, sink_sorted_parquet_ranges)
    register first, then the modules refactored in r3/r4 (clustering
    pulls in dedup's 4; all 7 similarity queries — the hot-bucket-cap
    and topk/ivf paths changed), then the r1-stamped families that
    have never been re-checked since round 1 (wordcount + the new
    unicode variant, windows, setops, scalar_fns, timeseries, stats)
    and relational's first 4 (q1/q3/q5/q6). relational's remaining
    13 r1-stamped queries are next round's rotation.
    """
    # --- inside the 50-slot correctness window (slots 1-50) ---
    # clustering imports dedup first: 4 dedup re-confirms + dedup_clusters
    # + dedup_keep_drop_list (never-stamped) (6: slots 1-6)
    from dist_map_reduce_spark.functions import clustering  # noqa: F401
    # 4 r2 sink re-confirms + sink_sorted_parquet_ranges (never-stamped)
    from dist_map_reduce_spark.operators import sources_sinks  # noqa: F401  (5: 7-11)
    from dist_map_reduce_spark.functions import similarity  # noqa: F401  (7: 12-18)
    from dist_map_reduce_spark.operators import wordcount  # noqa: F401  (3: 19-21, incl. new wordcount_unicode)
    from dist_map_reduce_spark.operators import windows  # noqa: F401  (6: 22-27)
    from dist_map_reduce_spark.operators import setops  # noqa: F401  (4: 28-31)
    from dist_map_reduce_spark.operators import scalar_fns  # noqa: F401  (4: 32-35)
    from dist_map_reduce_spark.operators import timeseries  # noqa: F401  (6: 36-41)
    from dist_map_reduce_spark.operators import stats  # noqa: F401  (5: 42-46)
    # relational registers q1, q3, q5, q6 first (47-50); its other 13
    # spill past the window for round 5
    from dist_map_reduce_spark.operators import relational  # noqa: F401
    # --- outside the window: driver-green in r2/r3, unchanged ---
    from dist_map_reduce_spark.functions import (  # noqa: F401
        chunking,
        curation,
        graph,
        multimodal_ext,
        packing,
        python_udfs,
        text,
    )
    from dist_map_reduce_spark.operators import (  # noqa: F401
        approx,
        arrays_maps,
        bucketing,
        etl,
        json_ops,
        scd,
        skew,
        subqueries,
        tpch_full,
        tpch_more,
    )
    from dist_map_reduce_spark.streaming import pipelines  # noqa: F401
