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
    from dist_map_reduce_spark.functions import similarity_ivfadc_query  # noqa: F401
    from dist_map_reduce_spark.streaming import ingest_index_compaction  # noqa: F401


def load_all() -> None:
    """Import every operator module so registrations run.

    ORDER MATTERS for evidence, not semantics: the verify harness
    records correctness rows for the first ``WINDOW`` registrations
    per round, so modules rotate toward the stalest driver stamps
    (the guard tests in tests/test_registry.py derive staleness from
    the CORRECTNESS_r*.json files on disk). The assert after the
    window imports is the rotation bookkeeping — if adding a query
    to a window module silently changed the cut line, it fires.

    Round 11 (EXECUTED this round — the plan simulated in r10 landed
    exactly as written): after CORRECTNESS_r10, the oldest stamps
    are the 41 r6 names (floor = newest - ceil(196/50) = r11 - 4 =
    r7 becomes binding at r12, so the r6 cohort must clear NOW),
    spread over 21 modules each registering nothing else --
    curation (5), text (8), scd (6), multimodal (2), python_udfs
    (2), etl (2), sequences (2), and singles chunking / lm_score /
    multimodal_ext / quality_model / resample_weighted /
    text_boilerplate / text_dupngrams / contribution / intervals /
    profiling / skyline / stats_robust / zorder /
    streaming.wordcount_stream. The r11 window = those 41 + the
    SEVEN staged promotions (all flipped @staged_query -> @query
    this round) -- ``lm_bigram_doc_scores`` (functions/lm_bigram.py),
    ``corpus_shard_manifest`` (functions/shard_export.py),
    ``embedding_gramian`` (functions/embedding_pca.py),
    ``text_winnow_match_pairs`` + ``text_winnow_decontaminate``
    (functions/text_winnow.py), ``multimodal_image_resize``
    (functions/multimodal_image.py), ``curation_funnel``
    (functions/curation_funnel.py) -- + the TWO riders the mixed
    modules drag in (``text_winnow_fingerprints`` r9,
    ``multimodal_image_features`` r7): 41 + 7 + 2 = 50 exactly.
    This only works because curation_funnel's oracle is LAZY (a
    zero-arg composer -- see the Oracle note above): module-level
    component imports would drag 12+ extra rider registrations
    (dedup, clustering, semdedup, curation_ext) into the window and
    overflow the plan to 63. Do NOT reintroduce module-scope imports
    of registering modules there.

    Round 12 plan (mechanical): window = the 48 r7 names (floor r8
    binding) + the TWO r11-staged promotions
    (``similarity_ann_ivfadc_topk`` in
    functions/similarity_ivfadc_query.py and
    ``streaming_ingest_index_compaction`` in
    streaming/ingest_index_compaction.py, both single-query modules
    with no riders) = 50 exactly. Round 13 re-stamps the 50 r9
    names; r14 the r10 cohort -- steady-state four-round cadence.
    The authoritative staleness list is derivable from the evidence
    files, which is what tests/test_registry.py checks.
    """
    # --- inside the WINDOW-slot correctness window ---
    pristine = not QUERIES  # tests may import operator modules first
    # 21 modules holding the 41 r6-stamped names (nothing else)
    from dist_map_reduce_spark.functions import curation  # noqa: F401
    from dist_map_reduce_spark.functions import text  # noqa: F401
    from dist_map_reduce_spark.operators import scd  # noqa: F401
    from dist_map_reduce_spark.functions import multimodal  # noqa: F401
    from dist_map_reduce_spark.functions import python_udfs  # noqa: F401
    from dist_map_reduce_spark.operators import etl  # noqa: F401
    from dist_map_reduce_spark.operators import sequences  # noqa: F401
    from dist_map_reduce_spark.functions import chunking  # noqa: F401
    from dist_map_reduce_spark.functions import lm_score  # noqa: F401
    from dist_map_reduce_spark.functions import multimodal_ext  # noqa: F401
    from dist_map_reduce_spark.functions import quality_model  # noqa: F401
    from dist_map_reduce_spark.functions import resample_weighted  # noqa: F401
    from dist_map_reduce_spark.functions import text_boilerplate  # noqa: F401
    from dist_map_reduce_spark.functions import text_dupngrams  # noqa: F401
    from dist_map_reduce_spark.operators import contribution  # noqa: F401
    from dist_map_reduce_spark.operators import intervals  # noqa: F401
    from dist_map_reduce_spark.operators import profiling  # noqa: F401
    from dist_map_reduce_spark.operators import skyline  # noqa: F401
    from dist_map_reduce_spark.operators import stats_robust  # noqa: F401
    from dist_map_reduce_spark.operators import zorder  # noqa: F401
    from dist_map_reduce_spark.streaming import wordcount_stream  # noqa: F401

    # the 7 r11 promotions (+ 2 riders from the mixed modules)
    from dist_map_reduce_spark.functions import lm_bigram  # noqa: F401
    from dist_map_reduce_spark.functions import shard_export  # noqa: F401
    from dist_map_reduce_spark.functions import embedding_pca  # noqa: F401
    from dist_map_reduce_spark.functions import text_winnow  # noqa: F401
    from dist_map_reduce_spark.functions import curation_funnel  # noqa: F401
    from dist_map_reduce_spark.functions import multimodal_image  # noqa: F401

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

    # --- outside the window: driver-green in r7-r10, unchanged ---
    from dist_map_reduce_spark.functions import (  # noqa: F401
        ann_recall,
        clustering,
        curation_ext,
        dedup,
        dedup_simhash,
        graph,
        multimodal_audio,
        packing,
        sampling_aes,
        semdedup,
        similarity,
        similarity_ivf_kmeans,
        similarity_ivfpq,
        similarity_pq,
        text_bpe,
        text_bpe_encode,
        text_entropy,
    )
    from dist_map_reduce_spark.operators import (  # noqa: F401
        approx,
        arrays_maps,
        bucketing,
        cohorts,
        histogram,
        json_ops,
        linkage,
        relational,
        scalar_fns,
        setops,
        skew,
        snapshot_diff,
        sources_sinks,
        sources_sinks_orc,
        stats,
        subqueries,
        timeseries,
        timeseries_fill,
        tpch_full,
        tpch_more,
        tpch_partsupp,
        windows,
        wordcount,
    )
    from dist_map_reduce_spark.streaming import ingest_dedup_query  # noqa: F401
    from dist_map_reduce_spark.streaming import pipelines  # noqa: F401
