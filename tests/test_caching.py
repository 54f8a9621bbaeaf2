"""caching slot-store contracts — in particular the session-identity
check ADVICE r10 asked for: a cache built on one live SparkSession
must never be returned to a caller holding a DIFFERENT live session
in the same process (two sessions can coexist via newSession(), and
getActiveSession() follows the most recent, not the caller)."""

from __future__ import annotations

from dist_map_reduce_spark import caching


def test_peek_rejects_foreign_session(spark):
    df = spark.range(3)
    caching.persist_tracked(df, "t_peek_slot", "k1")
    try:
        # same session, same key: hit
        assert caching.peek("t_peek_slot", "k1", session=spark) is df
        # different key: miss (entry retained)
        assert caching.peek("t_peek_slot", "k2", session=spark) is None
        assert caching.peek("t_peek_slot", "k1", session=spark) is df
        # a SECOND live session in the same process must not see the
        # first session's cache — but the owner's LIVE entry stays
        # tracked (dropping it would orphan the persisted DataFrame
        # beyond clear()'s reach — the r11 self-review finding)
        other = spark.newSession()
        assert caching.peek("t_peek_slot", "k1", session=other) is None
        assert caching.peek("t_peek_slot", "k1", session=spark) is df
    finally:
        caching.clear()


def test_persist_tracked_reuses_only_same_session(spark):
    df = spark.range(4)
    got = caching.persist_tracked(df, "t_reuse_slot", "k")
    try:
        assert got is df
        # same key + a frame from the same session: cached hit
        again = caching.persist_tracked(spark.range(4), "t_reuse_slot", "k")
        assert again is df
        # a frame built on another session must NOT get the entry
        other = spark.newSession()
        theirs = caching.persist_tracked(
            other.range(4), "t_reuse_slot", "k"
        )
        assert theirs is not df
        assert theirs.sparkSession is other
    finally:
        caching.clear()
