"""Cache-boundedness audit: repeatedly invoking the queries that
persist intermediates (or run jobs at construction time) must not
grow the set of live cached RDDs or registered sink tables. The
mechanisms under test: the one-live-entry-per-slot discipline
(caching.persist_tracked/peek), the one-sink-per-pipeline registry
(pipelines._LAST_SINK), and the eager localCheckpoint snapshots in
the iterative loops (clustering/graph), whose RDDs the context
cleaner releases once the snapshot DataFrame is garbage-collected.
"""

from __future__ import annotations

from dist_map_reduce_spark import registry
from tests.conftest import SF_SMOKE

registry.load_all()

PERSISTING = [
    "minhash_band_candidates",
    "ngram_jaccard_pairs",
    "dedup_clusters",
    "pagerank_dedup_graph",
    "streaming_event_counts",
]


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_repeat_invocations_keep_cache_bounded(spark):
    for name in PERSISTING:
        registry.QUERIES[name](spark, SF_SMOKE).count()
    baseline = _n_cached(spark)
    for _ in range(2):
        for name in PERSISTING:
            registry.QUERIES[name](spark, SF_SMOKE).count()
    assert _n_cached(spark) <= baseline, (
        "cache grew across repeat invocations: "
        f"{baseline} -> {_n_cached(spark)}"
    )


def test_repeat_streaming_keeps_one_sink_table(spark):
    for _ in range(3):
        registry.QUERIES["streaming_event_counts"](spark, SF_SMOKE).count()
    sinks = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("streaming_event_counts")
    ]
    assert len(sinks) == 1, sinks
