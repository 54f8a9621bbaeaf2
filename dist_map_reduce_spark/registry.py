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


# how many registrations the driver's per-round correctness window
# covers — load_all() asserts the window modules sum to exactly this
WINDOW = 50


def load_all() -> None:
    """Import every operator module so registrations run.

    ORDER MATTERS for evidence, not semantics: the verify harness
    records correctness rows for the first ``WINDOW`` registrations
    per round, so modules rotate toward the stalest driver stamps
    (the guard tests in tests/test_registry.py derive staleness from
    the CORRECTNESS_r*.json files on disk). The assert after the
    window imports is the rotation bookkeeping — if adding a query
    to a window module silently changed the cut line, it fires.

    Round 7: every r3-stamped query leads (approx, json_ops, graph's
    pagerank, packing, tpch_full's tail — 17 of them), then the
    queries NEW this round (tpch_partsupp's five, ANN recall, WAV
    audio + PPM image features, curation_ext's four), then the
    similarity
    family (six r4 stamps; the three r6-stamped index variants ride
    along because ann_recall imports them), then this round's late
    additions (fuzzy linkage, A-ES sampling, snapshot diff,
    equi-depth histogram riding with histogram/timeseries_fill) and
    wordcount (r4). Still r4-stamped after this round — MUST lead
    the r8 window: windows (6), timeseries (6), sources_sinks (5),
    stats (5), scalar_fns (4), setops (4), dedup (4),
    clustering (2) — 36 slots, leaving ~14 for r8 novelties; the
    authoritative list is derivable from the evidence files, which
    is what tests/test_registry.py checks.
    """
    # --- inside the WINDOW-slot correctness window ---
    pristine = not QUERIES  # tests may import operator modules first
    from dist_map_reduce_spark.operators import approx  # noqa: F401
    from dist_map_reduce_spark.operators import json_ops  # noqa: F401
    from dist_map_reduce_spark.functions import graph  # noqa: F401
    from dist_map_reduce_spark.functions import packing  # noqa: F401
    from dist_map_reduce_spark.operators import tpch_full  # noqa: F401
    from dist_map_reduce_spark.operators import tpch_partsupp  # noqa: F401
    from dist_map_reduce_spark.functions import similarity  # noqa: F401
    from dist_map_reduce_spark.functions import similarity_ivf_kmeans  # noqa: F401
    from dist_map_reduce_spark.functions import similarity_pq  # noqa: F401
    from dist_map_reduce_spark.functions import similarity_ivfpq  # noqa: F401
    from dist_map_reduce_spark.functions import ann_recall  # noqa: F401
    from dist_map_reduce_spark.functions import multimodal_audio  # noqa: F401
    from dist_map_reduce_spark.functions import multimodal_image  # noqa: F401
    from dist_map_reduce_spark.functions import curation_ext  # noqa: F401
    from dist_map_reduce_spark.operators import linkage  # noqa: F401
    from dist_map_reduce_spark.functions import sampling_aes  # noqa: F401
    from dist_map_reduce_spark.operators import snapshot_diff  # noqa: F401
    from dist_map_reduce_spark.operators import histogram  # noqa: F401
    from dist_map_reduce_spark.operators import timeseries_fill  # noqa: F401
    from dist_map_reduce_spark.operators import wordcount  # noqa: F401

    # the window cut-line guard only holds in a fresh process (the
    # driver's import path); when a test pre-imports operator
    # modules the registration order is already perturbed and the
    # count says nothing. RuntimeError, not assert — the guard must
    # survive ``python -O``.
    if pristine and len(QUERIES) != WINDOW:
        raise RuntimeError(
            f"correctness-window bookkeeping is off: the window imports "
            f"register {len(QUERIES)} queries, expected {WINDOW}"
        )

    # --- outside the window: driver-green in r5/r6, unchanged, plus
    # the r4-stamped families listed in the docstring that must lead
    # the r8 window ---
    from dist_map_reduce_spark.functions import (  # noqa: F401
        chunking,
        clustering,
        curation,
        dedup,
        dedup_simhash,
        lm_score,
        multimodal,
        multimodal_ext,
        python_udfs,
        quality_model,
        resample_weighted,
        text,
        text_boilerplate,
        text_bpe,
        text_dupngrams,
    )
    from dist_map_reduce_spark.operators import (  # noqa: F401
        arrays_maps,
        bucketing,
        cohorts,
        contribution,
        etl,
        intervals,
        profiling,
        relational,
        scalar_fns,
        scd,
        sequences,
        setops,
        skew,
        skyline,
        sources_sinks,
        sources_sinks_orc,
        stats,
        stats_robust,
        subqueries,
        timeseries,
        tpch_more,
        windows,
        zorder,
    )
    from dist_map_reduce_spark.streaming import pipelines  # noqa: F401
    from dist_map_reduce_spark.streaming import wordcount_stream  # noqa: F401
