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
    round, so modules rotate. Round 3: ALL 35 queries that have never
    had a driver row (streaming, tpch_full, curation/packing/graph/
    scd, python_udfs, approx_topk_words, json_variant_props) register
    first; the ~15 spare slots re-confirm the riskiest green queries
    after this round's refactors (minhash/ngram via the curation
    import, multimodal, the json trio, approx pair, and the three
    changed/iterative similarity queries — neardup's new hot-bucket
    cap, ann-lsh, k-means — which similarity.py orders first).
    """
    # --- inside the 50-slot correctness window (slots 1-50) ---
    from dist_map_reduce_spark.operators import tpch_full  # noqa: F401  (7: slots 1-7)
    from dist_map_reduce_spark.functions import packing  # noqa: F401  (2: 8-9)
    # curation imports dedup first: 4 dedup re-confirms + 5 curation (10-18)
    from dist_map_reduce_spark.functions import curation  # noqa: F401
    # multimodal_ext imports multimodal first: 2 re-confirms + 1 (19-21)
    from dist_map_reduce_spark.functions import multimodal_ext  # noqa: F401
    from dist_map_reduce_spark.functions import graph  # noqa: F401  (1: 22)
    from dist_map_reduce_spark.operators import scd  # noqa: F401  (5: 23-27)
    from dist_map_reduce_spark.functions import python_udfs  # noqa: F401  (2: 28-29)
    from dist_map_reduce_spark.streaming import pipelines  # noqa: F401  (10: 30-39)
    from dist_map_reduce_spark.operators import approx  # noqa: F401  (4: 40-43)
    from dist_map_reduce_spark.operators import json_ops  # noqa: F401  (4: 44-47)
    # similarity registers neardup, ann_lsh, kmeans first (48-50);
    # its remaining 4 queries spill past the window (51-54)
    from dist_map_reduce_spark.functions import similarity  # noqa: F401
    # --- outside the window: driver-green in r1/r2, unchanged ---
    from dist_map_reduce_spark.functions import (  # noqa: F401
        clustering,
        chunking,
        text,
    )
    from dist_map_reduce_spark.operators import (  # noqa: F401
        tpch_more,
        subqueries,
        sources_sinks,
        arrays_maps,
        skew,
        bucketing,
        etl,
        wordcount,
        relational,
        windows,
        setops,
        scalar_fns,
        timeseries,
        stats,
    )
