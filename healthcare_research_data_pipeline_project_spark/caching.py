"""Deferred-unpersist registry for query-internal persist() calls.

Several corpus queries persist an intermediate that feeds two or more
branches of the RETURNED (still lazy) DataFrame — a shared self-join
side, a TF-IDF term table feeding norms and both posting sides, a
bootstrap sample feeding every replica. The function cannot unpersist
before returning (the caller's action is what consumes the cache), so
without coordination every such block lives until LRU eviction; across
a 153-query bench or mirror run that silently squeezes the storage
pool.

`track_persist` is the drop-in replacement for those call sites: it
persists and records the frame; the harness that OWNS the action
boundary (bench.py after each timed write, tools/check_correctness.py
after each oracle compare, a pytest fixture) calls
`unpersist_tracked()` once the results are materialized. Operators
with an internal action already (graph fixpoints, k-means) keep their
matching in-function unpersist and never touch this registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() + register for later release. Returns the same frame."""
    df = df.persist() if storage_level is None else df.persist(storage_level)
    _TRACKED.append(df)
    return df


def unpersist_tracked() -> int:
    """Release every tracked frame (async unpersist — blocks nothing);
    returns how many were released. Safe to call with an empty registry
    and safe to call twice (unpersist on a non-cached frame is a no-op).
    """
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # a stopped session mid-teardown: nothing to free
            pass
    return n
