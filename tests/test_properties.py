"""Property-based tests (hypothesis) for the composed operators whose
semantics we hand-built: generic as-of join and sessionization.
Reference strategy per SURVEY.md §5.2 — randomized inputs, compare
against an independent straightforward implementation.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import given, settings, strategies as st

from dist_map_reduce_spark.operators.timeseries import asof_join

_ts = st.integers(min_value=0, max_value=10_000)
_key = st.integers(min_value=0, max_value=3)

_events = st.lists(st.tuples(_key, _ts), min_size=1, max_size=25)


def _to_time(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@settings(max_examples=12, deadline=None)
@given(left=_events, right=_events)
def test_asof_join_matches_naive(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, _to_time(t), i) for i, (k, t) in enumerate(left)],
        "k int, lts timestamp, lid int",
    )
    rdf = spark.createDataFrame(
        [(k, _to_time(t), float(t)) for k, t in right],
        "k int, rts timestamp, rv double",
    )
    got = {
        r.lid: r.rv_asof
        for r in asof_join(ldf, rdf, "k", "lts", "rts", "rv", "rv_asof").collect()
    }
    # naive: per left row, max rv among right rows (same key, rts <= lts);
    # rv == seconds, so the latest rts has the max rv only if times are
    # unique per key — use max(rts) then its rv; ties in rts share rv.
    for i, (k, t) in enumerate(left):
        cands = [rt for rk, rt in right if rk == k and rt <= t]
        expected = float(max(cands)) if cands else None
        assert got[i] == expected, (i, k, t, got[i], expected)


@settings(max_examples=10, deadline=None)
@given(gaps=st.lists(st.integers(min_value=1, max_value=1200), min_size=1, max_size=30))
def test_session_window_matches_gap_islands(spark, gaps):
    """session_window(10 min) must equal the classic lag/cumsum
    islands on any monotone event sequence."""
    from pyspark.sql import functions as F

    times, acc = [], 0
    for g in gaps:
        acc += g
        times.append(acc)
    df = spark.createDataFrame(
        [(1, _to_time(t)) for t in times], "user_id int, ts timestamp"
    )
    spark_sessions = (
        df.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("s"), "n")
        .collect()
    )
    got = sorted((r.s, r.n) for r in spark_sessions)

    # islands reference implementation in plain python
    sessions, start, n = [], times[0], 1
    for prev, cur in zip(times, times[1:]):
        if cur - prev >= 600:
            sessions.append((start, n))
            start, n = cur, 1
        else:
            n += 1
    sessions.append((start, n))
    expected = sorted((_to_time(s), n) for s, n in sessions)
    assert got == expected
