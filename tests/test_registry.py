"""Registration-order guard.

The verify harness records correctness rows for the FIRST 50
registered queries each round; the round's rotation decides which
queries get driver-side evidence. Appending a @query to a module
that registers inside the window silently pushes later slots out —
this pin makes that a loud test failure instead. Rotate by editing
registry.load_all() AND this pin together.
"""

from __future__ import annotations

from dist_map_reduce_spark import registry

registry.load_all()

# Round-2 window: everything unchecked in round 1 (TPC-H extras,
# subqueries, sinks, arrays/maps, skew, bucketing, etl, the LLM
# stack) plus the two repaired approx contracts at slots 49-50.
ROUND_WINDOW_TAIL = [
    "multimodal_manifest",
    "multimodal_byte_features",
    "dedup_clusters",
    "text_chunk_windows",
    "approx_percentile_prices",
    "approx_count_distinct_users",
]


def test_correctness_window_tail_is_pinned():
    names = list(registry.QUERIES)
    assert names[44:50] == ROUND_WINDOW_TAIL, (
        "registration slots 45-50 moved — a query was added to a "
        f"module that registers inside the 50-slot window: {names[44:50]}"
    )


def test_every_query_has_unique_name_and_callable():
    assert len(registry.QUERIES) == len(set(registry.QUERIES))
    for name, fn in registry.QUERIES.items():
        assert callable(fn), name
    # every oracle belongs to a registered query
    assert set(registry.ORACLES) <= set(registry.QUERIES)
