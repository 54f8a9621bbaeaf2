"""Grouped-map demo vs its built-in window twin (VERDICT r9 #8).

``grouped_map_zscore_orders`` exists to register the applyInPandas
surface; ``window_zscore_orders`` is the formulation a hot path
should use. Pinning the two equal (and the twin Python-free) turns
the "prefer built-ins over grouped-map" advice from prose into a
test: if the twin ever diverges, one of the two is wrong; if the
twin ever grows a Python operator, the teaching example is dead.
"""

from __future__ import annotations

import math

from dist_map_reduce_spark import registry
from dist_map_reduce_spark.functions.python_udfs import window_zscore_orders
from tests.conftest import SF_SMOKE

registry.load_all()


def _zmap(rows):
    return {(r.o_custkey, r.o_orderkey): r.z for r in rows}


def test_window_twin_equals_grouped_map_zscore(spark):
    gm = _zmap(
        registry.QUERIES["grouped_map_zscore_orders"](spark, SF_SMOKE).collect()
    )
    tw = _zmap(window_zscore_orders(spark, SF_SMOKE).collect())
    assert set(gm) == set(tw) and gm, "row keys diverge"
    for k, a in gm.items():
        b = tw[k]
        if a is None or b is None:
            # single-order customers: pandas NaN arrives as NULL via
            # Arrow, SQL stddev_samp of one row is NULL — both None
            assert a is None and b is None, (k, a, b)
        elif math.isnan(a) or math.isnan(b):
            # zero-variance multi-order customers: 0/0 is NaN on both
            # arms (isclose(NaN, NaN) is False, so test explicitly)
            assert math.isnan(a) and math.isnan(b), (k, a, b)
        else:
            # both sides round JVM-side at 4 dp; the unrounded means
            # differ only by float sum order, so post-round values
            # may sit one ULP apart at worst
            assert math.isclose(a, b, rel_tol=0, abs_tol=1e-9), (k, a, b)


def test_window_twin_plan_is_python_free(spark):
    plan = (
        window_zscore_orders(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapGroupsInPandas" not in plan
    assert "Python" not in plan
    assert "Window" in plan
    # exactly the one hash-partition exchange the window needs
    assert plan.count("Exchange") == 1, plan
