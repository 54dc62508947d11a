"""Centralized persist lifecycle for self-join intermediates.

Several operators persist a shared subtree (shingle posting tables,
LSH-bucketed projections, IVF inverted lists) because Spark re-executes
the subtree once per self-join side otherwise. A bare ``.persist()``
inside a query builder leaks: the consuming action happens in the
caller, so the builder can never unpersist, and a long-lived session
running the whole registry accumulates cached blocks.

:func:`tracked_persist` registers each persisted frame here;
:func:`release_tracked` unpersists them all. The query registry calls
``release_tracked()`` whenever a NEW registered query is invoked — at
that point the previous query's action has completed, so a session
running the 68-query suite holds at most one query's caches at a time.
Callers doing ad-hoc composition can release explicitly.

Not thread-safe by design (the registry contract is sequential
query-at-a-time execution, which is how the driver and bench run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def tracked_persist(df: DataFrame, eager: bool = True) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK default level) and track it for
    deferred release.

    ``eager`` (default, r13 — optimization round, guide §5): run a
    ``count()`` so the cache MATERIALIZES before the caller's plan
    fans out. Every site persists a frame precisely because several
    subtrees consume it (self-join sides, eligibility + posting
    reads, multi-leg unions) — but a lazy persist only fills the
    cache as partitions are FIRST scanned, and AQE launches the
    consuming query stages CONCURRENTLY: each racing stage computes
    the still-uncached partitions itself, so an expensive upstream
    (Arrow decode kernel, WARC parse, shingle pipeline) runs once
    PER CONSUMER instead of once. Measured on image_near_dup_pairs:
    six concurrent consumers, 33 CPU-seconds on the signature stage
    vs ~3 for one kernel pass — the eager count() (one cheap job)
    collapses that multiplicity. Pass ``eager=False`` only when the
    consumers are known to run in sequential actions."""
    df.persist()
    _LIVE.append(df)
    if eager:
        df.count()
    return df


def release_tracked() -> int:
    """Unpersist every tracked frame; returns how many were released."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
