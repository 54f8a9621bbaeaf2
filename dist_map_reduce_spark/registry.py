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
STAGED_ORACLES: dict[str, str] = {}


def staged_query(
    name: str, oracle: str | None = None
) -> Callable[[QueryFn], QueryFn]:
    """Register a next-round query candidate (oracle-parity-tested
    now, driver-visible after promotion)."""

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

    Some staged queries live in MIXED modules that also register
    @query entries (text_winnow, multimodal_image). Calling this in
    a pristine process before load_all() would land those @query
    registrations at early QUERIES positions and silently shift the
    first-WINDOW cut line — so load_all() runs first here, making
    the call order irrelevant."""
    if not QUERIES:
        load_all()
    from dist_map_reduce_spark.functions import lm_bigram  # noqa: F401
    from dist_map_reduce_spark.functions import shard_export  # noqa: F401
    from dist_map_reduce_spark.functions import embedding_pca  # noqa: F401
    from dist_map_reduce_spark.functions import text_winnow  # noqa: F401
    from dist_map_reduce_spark.functions import curation_funnel  # noqa: F401
    from dist_map_reduce_spark.functions import multimodal_image  # noqa: F401
    from dist_map_reduce_spark.streaming import ingest_dedup_query  # noqa: F401


def load_all() -> None:
    """Import every operator module so registrations run.

    ORDER MATTERS for evidence, not semantics: the verify harness
    records correctness rows for the first ``WINDOW`` registrations
    per round, so modules rotate toward the stalest driver stamps
    (the guard tests in tests/test_registry.py derive staleness from
    the CORRECTNESS_r*.json files on disk). The assert after the
    window imports is the rotation bookkeeping — if adding a query
    to a window module silently changed the cut line, it fires.

    Round 8: the 36 r4-stamped queries lead, exactly as round 7's
    rotation plan prescribed — windows (6), timeseries (6),
    sources_sinks (5), stats (5), scalar_fns (4), setops (4),
    dedup (4, incl. simhash16), clustering's two (plus this round's
    new dedup_clusters_logn). Then the queries NEW this round:
    semdedup (2), the BPE encode arm (text_bpe_encode 4, whose
    import pulls text_bpe's two r6 stamps into the window as
    riders), the approx equi-depth histogram (riding with
    histogram's two r7 stamps), text_char_entropy (1), and
    text_winnow_fingerprints (1). 36 stale + 9 new + 5 riders = 50.
    The two r5-stamped singles (dedup_simhash,
    sources_sinks_orc) sit just OUTSIDE — safe through r9 (floor
    r5). r9 planning note: after r8 evidence lands the oldest stamps
    are the 49 r5s (binding only at r10, floor r6), so r9 should
    re-stamp as many of them as fit after its novelties (~25+) and
    r10 takes the rest — they do NOT all have to fit in one round.
    Ready-made r9 novelties (the r8 window had no free slots): the
    eight STAGED queries (see staged_query below — already
    oracle-parity-tested every run via tests/test_staged_parity.py):
    ``lm_bigram_doc_scores`` (functions/lm_bigram.py),
    ``corpus_shard_manifest`` (functions/shard_export.py),
    ``embedding_gramian`` (functions/embedding_pca.py),
    ``text_winnow_match_pairs`` + ``text_winnow_decontaminate``
    (functions/text_winnow.py), ``streaming_ingest_dedup``
    (streaming/ingest_dedup_query.py), ``curation_funnel``
    (functions/curation_funnel.py — the end-to-end cascade whose
    oracle recomposes five component oracles), and
    ``multimodal_image_resize`` (functions/multimodal_image.py —
    real box-average downsampling, closed-form pixel-probe oracle). Promotion is swapping
    each decorator to @query and moving the module import into the
    window section above (load_staged() then shrinks accordingly).
    The authoritative staleness list is derivable from the evidence
    files, which is what tests/test_registry.py checks; after this
    round the oldest stamps anywhere are r5.
    """
    # --- inside the WINDOW-slot correctness window ---
    pristine = not QUERIES  # tests may import operator modules first
    from dist_map_reduce_spark.operators import windows  # noqa: F401
    from dist_map_reduce_spark.operators import timeseries  # noqa: F401
    from dist_map_reduce_spark.operators import sources_sinks  # noqa: F401
    from dist_map_reduce_spark.operators import stats  # noqa: F401
    from dist_map_reduce_spark.operators import scalar_fns  # noqa: F401
    from dist_map_reduce_spark.operators import setops  # noqa: F401
    from dist_map_reduce_spark.functions import dedup  # noqa: F401
    from dist_map_reduce_spark.functions import clustering  # noqa: F401
    from dist_map_reduce_spark.functions import semdedup  # noqa: F401
    from dist_map_reduce_spark.functions import text_bpe  # noqa: F401
    from dist_map_reduce_spark.functions import text_bpe_encode  # noqa: F401
    from dist_map_reduce_spark.operators import histogram  # noqa: F401
    from dist_map_reduce_spark.functions import text_entropy  # noqa: F401
    from dist_map_reduce_spark.functions import text_winnow  # noqa: F401

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

    # --- outside the window: driver-green in r5-r7, unchanged ---
    from dist_map_reduce_spark.functions import (  # noqa: F401
        ann_recall,
        chunking,
        curation,
        curation_ext,
        dedup_simhash,
        graph,
        lm_score,
        multimodal,
        multimodal_audio,
        multimodal_ext,
        multimodal_image,
        packing,
        python_udfs,
        quality_model,
        resample_weighted,
        sampling_aes,
        similarity,
        similarity_ivf_kmeans,
        similarity_ivfpq,
        similarity_pq,
        text,
        text_boilerplate,
        text_dupngrams,
    )
    from dist_map_reduce_spark.operators import (  # noqa: F401
        approx,
        arrays_maps,
        bucketing,
        cohorts,
        contribution,
        etl,
        intervals,
        json_ops,
        linkage,
        profiling,
        relational,
        scd,
        sequences,
        skew,
        skyline,
        snapshot_diff,
        sources_sinks_orc,
        stats_robust,
        subqueries,
        timeseries_fill,
        tpch_full,
        tpch_more,
        tpch_partsupp,
        wordcount,
        zorder,
    )
    from dist_map_reduce_spark.streaming import pipelines  # noqa: F401
    from dist_map_reduce_spark.streaming import wordcount_stream  # noqa: F401
