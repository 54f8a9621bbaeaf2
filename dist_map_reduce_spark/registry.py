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
    CORRECTNESS_r*.json files on disk). Round 6: the eleven r2-stamped
    queries first (etl's two, chunking, the text family — last driver
    check four rounds and three refactor waves ago), then the
    r3-stamped families minus ``approx`` (curation, graph,
    multimodal_ext, packing, python_udfs, json_ops, scd — 22
    queries; tpch_full straddles the window tail, see below), then
    the queries NEW this round (never stamped):
    contribution's ABC, timeseries_fill's interp variant (its LOCF
    sibling r5-stamped rides along), the k-means IVF search, the BPE
    pre-tokenizer + merge pairs, dup-ngram fraction, unigram-LM
    scores, MAD outliers, PQ-ADC and IVF-PQ search, column
    profiling, Z-order keys, the quality classifier, and boilerplate
    n-grams. ``approx`` (4 queries, r3-stamped) and tpch_full's last
    5 rotated OUT to make room — first in line for the r7 window,
    together with whatever r6 leaves stale.
    """
    # --- inside the 50-slot correctness window (slots 1-50) ---
    from dist_map_reduce_spark.operators import etl  # noqa: F401  (2: 1-2)
    from dist_map_reduce_spark.functions import chunking  # noqa: F401  (1: 3)
    from dist_map_reduce_spark.functions import text  # noqa: F401  (8: 4-11)
    from dist_map_reduce_spark.functions import curation  # noqa: F401  (5: 12-16)
    from dist_map_reduce_spark.streaming import wordcount_stream  # noqa: F401  (1: 17)
    from dist_map_reduce_spark.functions import multimodal_ext  # noqa: F401  (3: 18-20)
    from dist_map_reduce_spark.functions import python_udfs  # noqa: F401  (2: 21-22)
    from dist_map_reduce_spark.operators import scd  # noqa: F401  (5: 25-29)
    # new in r5/r6 (freshly stamped or never stamped — stay inside)
    from dist_map_reduce_spark.operators import contribution  # noqa: F401  (1: 34)
    from dist_map_reduce_spark.operators import timeseries_fill  # noqa: F401  (2: 35-36)
    from dist_map_reduce_spark.functions import similarity_ivf_kmeans  # noqa: F401  (1: 37)
    from dist_map_reduce_spark.functions import text_bpe  # noqa: F401  (2: 38-39)
    from dist_map_reduce_spark.functions import text_dupngrams  # noqa: F401  (1: 40)
    from dist_map_reduce_spark.functions import lm_score  # noqa: F401  (1: 41)
    from dist_map_reduce_spark.operators import stats_robust  # noqa: F401  (1: 42)
    from dist_map_reduce_spark.functions import similarity_pq  # noqa: F401  (1: 43)
    from dist_map_reduce_spark.functions import similarity_ivfpq  # noqa: F401  (1: 44)
    from dist_map_reduce_spark.operators import profiling  # noqa: F401  (1: 45)
    from dist_map_reduce_spark.operators import zorder  # noqa: F401  (1: 46)
    from dist_map_reduce_spark.functions import quality_model  # noqa: F401  (1: 47)
    from dist_map_reduce_spark.functions import text_boilerplate  # noqa: F401  (1: 48)
    from dist_map_reduce_spark.operators import intervals  # noqa: F401  (1: 45)
    from dist_map_reduce_spark.operators import histogram  # noqa: F401  (1: 46)
    from dist_map_reduce_spark.functions import resample_weighted  # noqa: F401  (1: 47)
    from dist_map_reduce_spark.operators import skyline  # noqa: F401  (1: 47)
    from dist_map_reduce_spark.operators import sequences  # noqa: F401  (2: 48-49)
    # tpch_full straddles the window tail: its first query refreshes
    # its r3 stamp in slot 50, the other 6 stay out
    from dist_map_reduce_spark.operators import tpch_full  # noqa: F401  (7: 50 + 6 out)
    # --- outside the window: driver-green in r4/r5, unchanged,
    # except tpch_full's tail, json_ops, packing, and graph:
    # r3-stamped, they MUST lead the r7 window (floor reaches r4 at
    # r8) together with approx ---
    from dist_map_reduce_spark.operators import json_ops  # noqa: F401
    from dist_map_reduce_spark.functions import packing  # noqa: F401
    from dist_map_reduce_spark.functions import graph  # noqa: F401
    from dist_map_reduce_spark.operators import approx  # noqa: F401
    from dist_map_reduce_spark.functions import (  # noqa: F401
        clustering,
        dedup_simhash,
        similarity,
    )
    from dist_map_reduce_spark.operators import (  # noqa: F401
        arrays_maps,
        bucketing,
        cohorts,
        relational,
        scalar_fns,
        setops,
        skew,
        sources_sinks,
        sources_sinks_orc,
        stats,
        subqueries,
        timeseries,
        tpch_more,
        windows,
        wordcount,
    )
    from dist_map_reduce_spark.streaming import pipelines  # noqa: F401
