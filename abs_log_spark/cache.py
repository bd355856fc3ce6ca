"""Persist-lifecycle ownership for lazily-returned plans.

Operators like ``minhash_lsh_pairs`` persist an intermediate (the shingle /
signature relation feeds 3 plan branches) but return a LAZY DataFrame — at
persist time nobody knows when the result will be materialized, so the
operator cannot unpersist. Callers that own the action pass
``persisted_out`` and release the handles themselves; every other persist
lands here, and whoever drives actions (bench loop, a job, a test harness)
calls :func:`release_all` after materialization. Without this, a long-lived
session (the bench loop runs every query in one JVM) accumulates executor
storage for caches that will never be read again.
"""

from __future__ import annotations

_TRACKED: list = []


def track(df):
    """Register a persisted DataFrame for later :func:`release_all`."""
    _TRACKED.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked DataFrame (blocking=False — eviction is
    async; correctness never depends on the cache). Returns how many
    handles were released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped; nothing to release
    return n
