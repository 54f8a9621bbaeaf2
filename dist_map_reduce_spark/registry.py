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
# an oracle is DuckDB SQL, or a zero-arg callable returning it —
# LAZY oracles exist for composed oracles (curation_funnel) whose
# text embeds OTHER queries' oracle SQL: building the string at
# decoration time forces the component modules to be imported before
# the composing module, which drags their registrations into the
# driver's first-WINDOW correctness window as riders and breaks the
# rotation arithmetic (the funnel's components alone are 12+ rider
# slots). A callable defers both the imports and the composition to
# first use, when load_all has long finished.

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, object] = {}


def resolve_oracle(value: object) -> str:
    """An oracle dict value → its SQL text (callables are lazy
    composers — see the Oracle note above)."""
    return value() if callable(value) else value


def oracle_for(name: str) -> str | None:
    """Resolved oracle SQL for a registered query, or None."""
    v = ORACLES.get(name)
    return None if v is None else resolve_oracle(v)


def query(name: str, oracle=None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is DuckDB SQL, a zero-arg
    callable returning it, or None (rows-only check)."""

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

# Queries STAGED for the next round's correctness window. When the
# current round's 50 window slots are already spoken for, a brand-new
# @query would have to register OUTSIDE the window and could never
# earn a driver stamp this round (tests/test_registry.py::
# test_never_stamped_queries_inside_window forbids exactly that
# state). Staging keeps the discipline without the premature
# registration: a staged query carries the same (spark, sf_dir) ->
# DataFrame callable and DuckDB oracle, is parity-checked in-process
# every test run (tests/test_staged_parity.py), and promotion next
# round is mechanical — swap the decorator to @query and move the
# module import into load_all()'s window section.
STAGED_QUERIES: dict[str, QueryFn] = {}
STAGED_ORACLES: dict[str, object] = {}


def staged_query(name: str, oracle=None) -> Callable[[QueryFn], QueryFn]:
    """Register a next-round query candidate (oracle-parity-tested
    now, driver-visible after promotion). ``oracle`` as for
    :func:`query` — SQL text or a lazy zero-arg composer."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in STAGED_QUERIES or name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        STAGED_QUERIES[name] = fn
        if oracle is not None:
            STAGED_ORACLES[name] = oracle
        return fn

    return deco


def load_staged() -> None:
    """Import the modules holding staged (next-round) queries. Kept
    OUT of load_all() so the driver's first-WINDOW registration
    bookkeeping is untouched; tests call this explicitly.

    A staged query living in a MIXED module that also registers
    @query entries (the r9-r11 text_winnow / multimodal_image case)
    would, if imported in a pristine process before load_all(), land
    those @query registrations at early QUERIES positions and
    silently shift the first-WINDOW cut line — so load_all() runs
    first here, making the call order irrelevant. The current two
    staged modules are single-query and registration-free at import,
    but the ordering guard stays."""
    if not QUERIES:
        load_all()
    # r12 state: both r11-staged queries (similarity_ann_ivfadc_topk,
    # streaming_ingest_index_compaction) were PROMOTED into the r12
    # window — their imports live in load_all() now. The two r12-
    # staged modules below fill r13's exactly-two free window slots.
    from dist_map_reduce_spark.functions import quality_ccnet_buckets  # noqa: F401
    from dist_map_reduce_spark.operators import delta_merge  # noqa: F401


def load_all() -> None:
    """Import every operator module so registrations run.

    ORDER MATTERS for evidence, not semantics: the verify harness
    records correctness rows for the first ``WINDOW`` registrations
    per round, so modules rotate toward the stalest driver stamps
    (the guard tests in tests/test_registry.py derive staleness from
    the CORRECTNESS_r*.json files on disk). The assert after the
    window imports is the rotation bookkeeping — if adding a query
    to a window module silently changed the cut line, it fires.

    Round 12 (EXECUTED this round): after CORRECTNESS_r11 the stamp
    ages are r7=47, r9=49, r10=50, r11=50 (verified programmatically
    from the evidence files; the r10-era plan said "48 r7 names" but
    ``multimodal_image_features`` was re-stamped in r11 as a mixed-
    module rider, shrinking the r7 cohort to 47 — the r11 VERDICT's
    off-by-one finding). The r12 window = the 47 r7 names, spread
    over 18 modules each registering nothing else — similarity (7),
    tpch_full (7), tpch_partsupp (5), curation_ext (4), approx (4),
    json_ops (4), wordcount (3), packing (2), timeseries_fill (2),
    and singles ann_recall / graph / multimodal_audio / sampling_aes
    / similarity_ivf_kmeans / similarity_ivfpq / similarity_pq /
    linkage / snapshot_diff — + the TWO r11-staged promotions
    (``similarity_ann_ivfadc_topk`` in
    functions/similarity_ivfadc_query.py and
    ``streaming_ingest_index_compaction`` in
    streaming/ingest_index_compaction.py, both single-query, no
    riders, flipped @staged_query -> @query this round) + ONE
    deliberately chosen filler, ``text_char_entropy``
    (functions/text_entropy.py, single-query, the only r9 name
    living alone in its module — chosen so the 50th slot is not an
    accidental import-order rider): 47 + 2 + 1 = 50 exactly.
    similarity_ivfpq imports similarity_pq at module scope — both
    in-window, so no rider leak (verified this round).

    Round 13 plan (mechanical): window = the 48 remaining r9 names
    (49 minus text_char_entropy, which re-stamps now; they must
    clear at r13 because the floor reaches r10 at r14 with cadence
    ceil(198/50) = 4) + TWO free slots for r12-staged promotions
    (``quality_ccnet_buckets`` in functions/quality_ccnet_buckets.py
    and ``cdc_merge_upsert_orders`` in operators/delta_merge.py, both
    single-query, registration-free deps). The 48 live in 12 pure-r9
    modules (4+4+4+4+5+5+6+6+3+3+2+2 = 48): dedup (4),
    text_bpe_encode (4), scalar_fns (4), setops (4), sources_sinks
    (5), stats (5), timeseries (6), windows (6), clustering (3),
    histogram (3), semdedup (2), text_bpe (2); riders NONE. r14
    re-stamps the r10 cohort (50 names, 11 modules) and r15 the r11
    cohort (50 names, 27 modules) — BOTH verified module-pure in r12
    (zero rider registrations, programmatic module-map over the
    evidence files), so the steady-state four-round cadence is
    mechanical with zero free slots in either round. The
    authoritative staleness list is derivable from the evidence
    files, which is what tests/test_registry.py checks.
    """
    # --- inside the WINDOW-slot correctness window ---
    pristine = not QUERIES  # tests may import operator modules first
    # 18 modules holding the 47 r7-stamped names (nothing else)
    from dist_map_reduce_spark.functions import ann_recall  # noqa: F401
    from dist_map_reduce_spark.functions import curation_ext  # noqa: F401
    from dist_map_reduce_spark.functions import graph  # noqa: F401
    from dist_map_reduce_spark.functions import multimodal_audio  # noqa: F401
    from dist_map_reduce_spark.functions import packing  # noqa: F401
    from dist_map_reduce_spark.functions import sampling_aes  # noqa: F401
    from dist_map_reduce_spark.functions import similarity  # noqa: F401
    from dist_map_reduce_spark.functions import similarity_ivf_kmeans  # noqa: F401
    from dist_map_reduce_spark.functions import similarity_ivfpq  # noqa: F401
    from dist_map_reduce_spark.functions import similarity_pq  # noqa: F401
    from dist_map_reduce_spark.operators import approx  # noqa: F401
    from dist_map_reduce_spark.operators import json_ops  # noqa: F401
    from dist_map_reduce_spark.operators import linkage  # noqa: F401
    from dist_map_reduce_spark.operators import snapshot_diff  # noqa: F401
    from dist_map_reduce_spark.operators import timeseries_fill  # noqa: F401
    from dist_map_reduce_spark.operators import tpch_full  # noqa: F401
    from dist_map_reduce_spark.operators import tpch_partsupp  # noqa: F401
    from dist_map_reduce_spark.operators import wordcount  # noqa: F401

    # the 2 r12 promotions + the deliberate 50th slot (stalest
    # single-module r9 name — see the rotation docstring above)
    from dist_map_reduce_spark.functions import similarity_ivfadc_query  # noqa: F401
    from dist_map_reduce_spark.streaming import ingest_index_compaction  # noqa: F401
    from dist_map_reduce_spark.functions import text_entropy  # noqa: F401

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

    # --- outside the window: driver-green in r9-r11, unchanged ---
    from dist_map_reduce_spark.functions import (  # noqa: F401
        chunking,
        clustering,
        curation,
        curation_funnel,
        dedup,
        dedup_simhash,
        embedding_pca,
        lm_bigram,
        lm_score,
        multimodal,
        multimodal_ext,
        multimodal_image,
        python_udfs,
        quality_model,
        resample_weighted,
        semdedup,
        shard_export,
        text,
        text_boilerplate,
        text_bpe,
        text_bpe_encode,
        text_dupngrams,
        text_winnow,
    )
    from dist_map_reduce_spark.operators import (  # noqa: F401
        arrays_maps,
        bucketing,
        cohorts,
        contribution,
        etl,
        histogram,
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
    from dist_map_reduce_spark.streaming import ingest_dedup_query  # noqa: F401
    from dist_map_reduce_spark.streaming import pipelines  # noqa: F401
    from dist_map_reduce_spark.streaming import wordcount_stream  # noqa: F401
