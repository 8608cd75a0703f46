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

Concurrency contract: the ENTRY-SCOPED release assumes one registry
query runs at a time (true of every harness here — driver gate, bench,
parity tests, all sequential). A concurrent caller entering a query
can release another in-flight query's intermediates — never wrong
(lazy consumers recompute) but a performance cliff; multi-threaded
harnesses should set ``KEEP_SESSION_CACHES = True`` and manage cache
lifetime themselves. The list itself is lock-protected so concurrent
mutation can't corrupt tracking or double-unpersist.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []
_LOCK = threading.Lock()

#: When True, ``drop_stale`` is a no-op and session caches accumulate —
#: the pre-round-7 behavior. bench.py sets this: its best-of-3
#: round-robin meter has ALWAYS let Spark's CacheManager reuse a
#: same-plan cache across passes (that reuse is part of every recorded
#: round's floor), so dropping between queries would silently change
#: the meter. Measured at sf0.1: strict dropping costs d3_minhash_lsh
#: 0.94 -> 3.23 s and x7_corpus_curation 2.50 -> 3.77 s per pass —
#: that delta is cache rebuild, not engine regression (SCALE.md r7).
KEEP_SESSION_CACHES = False


def persist_tracked(df: DataFrame) -> DataFrame:
    """MEMORY_AND_DISK persist, released at the next registry-query
    entry (see module docstring)."""
    from pyspark import StorageLevel

    with _LOCK:
        _LIVE.append(df)
    return df.persist(StorageLevel.MEMORY_AND_DISK)


def track(df: DataFrame) -> DataFrame:
    """Register an ALREADY-persisted DataFrame for the same scoped
    release (for call sites that pick their own storage level)."""
    with _LOCK:
        _LIVE.append(df)
    return df


def drop_stale() -> None:
    """Unpersist everything a previous registry query left cached."""
    if KEEP_SESSION_CACHES:
        return
    with _LOCK:
        stale, _LIVE[:] = _LIVE[:], []
    for df in stale:
        df.unpersist()
