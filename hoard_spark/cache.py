"""Session-scoped cache registry shared by query builders and operators.

Persisting is load-bearing in two ways: it is the InMemoryRelation
barrier that stops Catalyst from inlining expensive expressions into
both sides of a self-join, and it stops a multi-consumer subtree (a
candidate-pair table read by both the count job and the verify join)
from being recomputed per consumer. An unbounded session would otherwise
accumulate caches, so builders register here and callers (bench.py,
tests, library users) release with :func:`release_caches` after the
terminal action.

Lives outside ``hoard_spark.queries`` so library operators
(``hoard_spark.simjoin`` etc.) can use it without importing the query
registry; ``hoard_spark.queries`` re-exports both names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE_CACHES: list[DataFrame] = []


def track_cache(df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK) and register it for later release."""
    from pyspark import StorageLevel

    df.persist(StorageLevel.MEMORY_AND_DISK)
    _LIVE_CACHES.append(df)
    return df


_LIVE_CHECKPOINTS: list[DataFrame] = []


def track_checkpoint(df: DataFrame, eager: bool = False) -> DataFrame:
    """``localCheckpoint`` with registered cleanup (ADVICE r11 #3).

    For BENCH-LOCAL query bodies only: a local checkpoint materializes
    ~2x cheaper than building an InMemoryRelation's columnar batches,
    but its blocks are NOT fault-tolerant (an executor loss fails
    downstream stages instead of recomputing) and, untracked, they
    accumulate across a long suite session until the ContextCleaner
    happens to GC them. Library operators (``hoard_spark.simjoin``
    etc.) use :func:`track_cache` — the cluster-facing persist path.

    The returned frame is DEAD after :func:`release_caches` (a freed
    local-checkpoint block cannot be recomputed); callers must not
    retain it across the release boundary.
    """
    ck = df.localCheckpoint(eager=eager)
    _LIVE_CHECKPOINTS.append(ck)
    return ck


def untrack_cache(df: DataFrame) -> None:
    """Unpersist ``df`` and drop it from the registry — for a cache whose
    lifetime ended mid-build (e.g. a failed ladder rung), so the registry
    doesn't accumulate dead references until ``release_caches``."""
    df.unpersist()
    try:
        _LIVE_CACHES.remove(df)
    except ValueError:
        pass


def release_caches() -> None:
    """Unpersist every DataFrame a builder cached in this session, and
    free every tracked local checkpoint's backing blocks."""
    while _LIVE_CACHES:
        _LIVE_CACHES.pop().unpersist()
    while _LIVE_CHECKPOINTS:
        ck = _LIVE_CHECKPOINTS.pop()
        try:
            # The checkpoint's storage is the persisted internal RDD of
            # its LogicalRDD leaf — DataFrame.unpersist only talks to
            # the CacheManager and would not touch it.
            ck._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception as e:  # noqa: BLE001 — best-effort; GC will collect
            # Not silent (ADVICE r12 #3): this path goes through private
            # JVM plan internals, and if a Spark upgrade changes the
            # analyzed-plan shape, cleanup would quietly revert to
            # ContextCleaner-only collection — the exact leak ADVICE
            # r11 #3 closed. Surface the regression instead.
            import warnings

            warnings.warn(
                "release_caches: freeing a tracked local checkpoint's "
                f"blocks failed ({type(e).__name__}: {e}); its storage "
                "now waits for the ContextCleaner",
                RuntimeWarning,
                stacklevel=2,
            )
