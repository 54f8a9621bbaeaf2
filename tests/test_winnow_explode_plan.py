"""Pin the fix for the InferFiltersFromGenerate blowup.

Exploding the winnow fingerprint array with plain `explode` makes
Spark infer `size(fps) > 0 AND isnotnull(fps)` and push it below the
projections with the ENTIRE fps expression inlined; inside lambda
bodies there is no common-subexpression elimination, so every window
slice re-evaluates the full k-gram md5 array — O(windows × W × grams)
per document, measured 550 s vs 4 s at sf0.001. The library uses
explode_outer (no filter inferred; fps is provably non-empty, so the
row set is identical). These tests pin both the plan shape and the
explode/explode_outer row equivalence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.functions.text_winnow import (
    winnow_fingerprints,
    winnow_match_pairs,
)
from tests.conftest import SF_SMOKE


def test_match_pairs_plan_has_no_inlined_winnow_filter(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    plan = (
        winnow_match_pairs(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the inferred-filter blowup manifests as the fps expression
    # (array_distinct over the window transform) inlined into a
    # Filter node; after the explode_outer fix no Filter mentions it
    for line in plan.splitlines():
        if "Filter" in line:
            assert "array_distinct" not in line, line[:300]


def test_explode_outer_rows_equal_explode(spark):
    """fps is never null/empty (length pre-filter guarantees >= 1
    window), so OUTER changes the plan, not the rows."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(80)
    wf = winnow_fingerprints(docs).persist()
    try:
        wf.count()  # materialize so the plain-explode arm stays fast
        a = sorted(
            (r.doc_id, r.p)
            for r in wf.select(
                "doc_id", F.explode("fps").alias("p")
            ).collect()
        )
        b = sorted(
            (r.doc_id, r.p)
            for r in wf.select(
                "doc_id", F.explode_outer("fps").alias("p")
            ).collect()
        )
        assert a == b and len(a) > 0
    finally:
        wf.unpersist()
