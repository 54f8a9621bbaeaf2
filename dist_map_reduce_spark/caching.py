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

Staleness contract: reuse assumes the data under ``key`` is
immutable between invocations (true for the fixture parquet). Call
``clear()`` after mutating source data in place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SLOTS: dict[str, tuple[str, DataFrame]] = {}


def persist_tracked(df: DataFrame, slot: str, key: str) -> DataFrame:
    """Persist ``df`` under ``slot``, reusing the live cache entry
    when ``key`` matches the previous invocation's."""
    prev = _SLOTS.get(slot)
    if prev is not None:
        prev_key, prev_df = prev
        if prev_key == key:
            return prev_df
        prev_df.unpersist()
    df = df.persist()
    _SLOTS[slot] = (key, df)
    return df


def peek(slot: str, key: str) -> DataFrame | None:
    """Return the live cached DataFrame for ``slot`` if its key
    matches, else None — lets an operator whose CONSTRUCTION is
    expensive (iterative loops that run jobs while building the
    plan) skip the rebuild entirely on a repeat invocation."""
    prev = _SLOTS.get(slot)
    if prev is not None and prev[0] == key:
        return prev[1]
    return None


def clear() -> None:
    """Unpersist every tracked entry (e.g. after source data
    changed in place)."""
    for _, df in _SLOTS.values():
        df.unpersist()
    _SLOTS.clear()
