"""Session-scoped cache registry for registry-query intermediates.

Registry queries return LAZY DataFrames, so a ``persist()`` inside one
can only be released after the caller's terminal action — which, in
every harness this repo runs under (driver correctness gate, bench.py,
parity tests), is before the NEXT registry query starts. Tracking every
such persist here and dropping the lot at each query entry bounds
shared-session cache residue at ONE query's working set instead of
letting all ~190 queries accumulate each other's MEMORY_AND_DISK blocks
(round-6 verdict item 5 — exactly the JVM-state effect SCALE.md's x7
A/B measured).

Unpersisting is always correctness-safe: a consumer that is still lazy
simply recomputes. Long-running services (the streaming sinks) manage
their own per-batch persist/unpersist pairs and never route through
this registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """MEMORY_AND_DISK persist, released at the next registry-query
    entry (see module docstring)."""
    from pyspark import StorageLevel

    _LIVE.append(df)
    return df.persist(StorageLevel.MEMORY_AND_DISK)


def track(df: DataFrame) -> DataFrame:
    """Register an ALREADY-persisted DataFrame for the same scoped
    release (for call sites that pick their own storage level)."""
    _LIVE.append(df)
    return df


def drop_stale() -> None:
    """Unpersist everything a previous registry query left cached."""
    while _LIVE:
        _LIVE.pop().unpersist()
