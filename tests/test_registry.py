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

# Round-3 window: every query that had no driver row after rounds
# 1-2 (35 of them), plus 15 re-confirmation slots; the tail is the
# json trio + the three similarity queries changed or riskiest this
# round (neardup's new hot-bucket cap, ann-lsh, iterative k-means).
ROUND_WINDOW_TAIL = [
    "json_parse_and_aggregate",
    "json_filter_on_extracted",
    "json_variant_props",
    "dedup_embedding_neardup",
    "similarity_ann_lsh_topk",
    "kmeans_embedding_cells",
]

# The 35 queries with no CORRECTNESS_r01/r02 row — round 3's rotation
# exists to give every one of these a driver row; none may slip out.
NEVER_DRIVER_CHECKED = [
    "q8_national_market_share",
    "q12_late_shipment_priority",
    "q13_customer_order_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q21_suppliers_who_kept_waiting",
    "q22_lapsed_customer_balance",
    "pii_redact_docs",
    "sequence_pack_docs",
    "decontaminate_against_eval",
    "stratified_sample_by_lang",
    "quality_percentile_filter",
    "text_repetition_signals",
    "corpus_mix_weights",
    "multimodal_frame_sample",
    "pagerank_dedup_graph",
    "scd2_customer_segments",
    "dq_expectations_orders",
    "histogram_event_values",
    "division_customers_every_year",
    "funnel_click_to_purchase",
    "udtf_tokenize_docs",
    "grouped_map_zscore_orders",
    "streaming_event_counts",
    "streaming_tumbling_1h",
    "streaming_watermarked_tumbling",
    "streaming_stateful_user_totals",
    "streaming_dedup_events",
    "streaming_session_windows",
    "streaming_static_join_enrich",
    "streaming_stream_stream_join",
    "streaming_foreachbatch_upsert",
    "streaming_multibatch_counts",
    "approx_topk_words",
    "json_variant_props",
]


def test_correctness_window_tail_is_pinned():
    names = list(registry.QUERIES)
    assert names[44:50] == ROUND_WINDOW_TAIL, (
        "registration slots 45-50 moved — a query was added to a "
        f"module that registers inside the 50-slot window: {names[44:50]}"
    )


def test_all_never_checked_queries_inside_window():
    window = set(list(registry.QUERIES)[:50])
    missing = [n for n in NEVER_DRIVER_CHECKED if n not in window]
    assert not missing, (
        "queries without any driver correctness row fell outside the "
        f"50-slot round-3 window: {missing}"
    )


def test_every_query_has_unique_name_and_callable():
    assert len(registry.QUERIES) == len(set(registry.QUERIES))
    for name, fn in registry.QUERIES.items():
        assert callable(fn), name
    # every oracle belongs to a registered query
    assert set(registry.ORACLES) <= set(registry.QUERIES)
