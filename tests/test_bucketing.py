"""Bucketed join: zero-Exchange plan, result identical to plain join."""

from __future__ import annotations

from dist_map_reduce_spark import registry
from dist_map_reduce_spark.operators.bucketing import bucketed_join
from tests.conftest import SF_SMOKE

registry.load_all()


def test_bucketed_join_has_no_exchange(spark):
    """At fixture scale the planner prefers broadcast (and rightly
    disables bucketed reading); force the fact-fact regime by
    disabling auto-broadcast — the regime bucketing exists for —
    and assert the join runs without any shuffle Exchange."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            bucketed_join(spark, SF_SMOKE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" in plan, plan
    assert "Bucketed: true" in plan, plan