"""Bounded reuse of persisted intermediates.

Some operators persist an expensive intermediate (e.g. the MinHash
banded signatures) that several plan branches — and repeated
invocations of the same query — all consume. Plain ``persist()``
leaks in long-lived sessions (every invocation adds a dead cache
entry); unpersisting on every re-entry is leak-free but defeats
Spark's CacheManager, recomputing the intermediate per invocation.

``persist_tracked`` keeps AT MOST ONE cached entry per named slot:

  - same slot + same key (the fixture dir, which fully determines
    the plan): the previously cached DataFrame is returned — the
    intermediate is reused across invocations, like a materialized
    view;
  - same slot + different key: the old entry is unpersisted first,
    so total cache footprint is bounded by the number of slots.

A cached entry is bound to the SparkSession that built it: after a
session restart in a long-lived process the old DataFrame references
a stopped JVM context, so reuse checks session identity + liveness
and silently discards stale entries instead of returning (or trying
to unpersist) a dead DataFrame.

Staleness contract: reuse assumes the data under ``key`` is
immutable between invocations (true for the fixture parquet). Call
``clear()`` after mutating source data in place.

Cross-session contention (ADVICE r11): when TWO live sessions use
the same slot, ``peek`` misses for the non-owner (never hands out a
foreign cache) but the non-owner's subsequent rebuild +
``persist_tracked`` evicts the owner's entry — the owner degrades to
recompute (Spark recomputes from lineage; correctness unaffected).
That is the accepted trade: slots are keyed by name, not
(session, slot), because coexisting live sessions occur only in
tests — a long-lived process has one engine session, and the
driver's foreign session runs in its own process.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SLOTS: dict[str, tuple[str, DataFrame]] = {}


def _is_live(df: DataFrame) -> bool:
    """True iff the DataFrame's owning SparkContext is still running."""
    try:
        return not df.sparkSession.sparkContext._jsc.sc().isStopped()
    except Exception:
        return False


def _discard(df: DataFrame) -> None:
    """Unpersist if the owning session is alive; a stopped session
    already dropped its cache, so stale entries are just forgotten."""
    if _is_live(df):
        try:
            df.unpersist()
        except Exception:
            pass


def persist_tracked(df: DataFrame, slot: str, key: str) -> DataFrame:
    """Persist ``df`` under ``slot``, reusing the live cache entry
    when ``key`` matches the previous invocation's and the cached
    DataFrame belongs to the same, still-running SparkSession."""
    prev = _SLOTS.get(slot)
    if prev is not None:
        prev_key, prev_df = prev
        if (
            prev_key == key
            and prev_df.sparkSession is df.sparkSession
            and _is_live(prev_df)
        ):
            return prev_df
        _discard(prev_df)
    df = df.persist()
    _SLOTS[slot] = (key, df)
    return df


def peek(slot: str, key: str, session=None) -> DataFrame | None:
    """Return the live cached DataFrame for ``slot`` if its key
    matches and its session is still the caller's running one, else
    None — lets an operator whose CONSTRUCTION is expensive
    (iterative loops that run jobs while building the plan) skip the
    rebuild entirely on a repeat invocation. Callers holding a
    SparkSession pass it as ``session`` so a cache built on a
    DIFFERENT live session is never returned to them (ADVICE r10 —
    two sessions in one process); without it the active session is
    the reference. Stale entries (stopped or replaced session) are
    dropped rather than returned."""
    from pyspark.sql import SparkSession

    prev = _SLOTS.get(slot)
    if prev is None or prev[0] != key:
        return None
    df = prev[1]
    if not _is_live(df):
        del _SLOTS[slot]
        return None
    ref = session if session is not None else SparkSession.getActiveSession()
    if df.sparkSession is not ref:
        # a LIVE entry owned by a different session: miss for this
        # caller, but keep (and keep tracking) the owner's cache —
        # deleting the slot here would orphan a persisted DataFrame
        # the CacheManager still holds, beyond clear()'s reach
        return None
    return df


def get_or_build(slot: str, key: str, builder, session=None) -> DataFrame:
    """Peek-first slot access: return the live cached entry for
    (slot, key) if this session owns it, else call ``builder()`` and
    persist its result under the slot. The one spelling of the
    peek → build → persist_tracked sequence (r12 self-review: six
    hand-copied instances risked slot/key drift between the peek and
    the persist). ``builder`` is a zero-arg callable so a cache hit
    skips not just recompute but PLAN CONSTRUCTION — for iterative
    builds (Lloyd loops) the construction alone costs ~0.5 s of
    driver-side analysis per invocation."""
    hit = peek(slot, key, session=session)
    if hit is not None:
        return hit
    return persist_tracked(builder(), slot, key)


def clear() -> None:
    """Unpersist every tracked entry (e.g. after source data
    changed in place)."""
    for _, df in _SLOTS.values():
        _discard(df)
    _SLOTS.clear()
