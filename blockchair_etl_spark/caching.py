"""Deferred-release registry for plan-level persists.

Several operators persist an intermediate relation that feeds multiple
branches of the SAME returned plan (e.g. the minhash signature relation
feeding both sides of the band join, or corpus-prep stages feeding
dedup + join-back + resample). The cache must stay alive until the
CALLER runs its terminal action — the operator cannot unpersist before
returning (the cache would never materialize) and must not unpersist
never (a long-lived session accumulates MEMORY_AND_DISK blocks per
invocation; the round-5 advice flagged exactly this in the registered
pipelines and incremental dedup stores).

The contract:

- operators call :func:`tracked_persist` instead of ``df.persist()``;
- harnesses call :func:`release_tracked` after collecting a result
  (``testing.check_query`` and ``bench.py`` do);
- as a backstop, every registry entry (`queryset.register`) releases
  leftovers from the PREVIOUS invocation before building its plan, so
  even a harness that never releases (the verification driver running
  144 queries in one session) holds at most one query's caches at a
  time.

Not thread-safe by design: the registry mirrors the driver/bench/pytest
execution model (one query materialized at a time per session). A
concurrent-query service should scope caches per job instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def tracked_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Persist ``df`` and register it for a later :func:`release_tracked`."""
    out = df.persist(level)
    _TRACKED.append(out)
    return out


def release_tracked(blocking: bool = False) -> int:
    """Unpersist every tracked frame; returns how many were released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n


def tracked_count() -> int:
    return len(_TRACKED)


def release_local_checkpoint(df: DataFrame, blocking: bool = False) -> bool:
    """Free the block-manager blocks behind a ``localCheckpoint``-ed
    frame. ``DataFrame.unpersist()`` only clears CacheManager entries —
    it does NOT touch the checkpointed RDD's blocks (measured r12: a
    checkpoint-per-round driver loop that "unpersisted" each superseded
    table still held every round's blocks), and relying on the JVM
    ContextCleaner means waiting on two garbage collectors (the py4j
    handle, then the JVM RDD). This reaches the ``LogicalRDD`` at the
    analyzed-plan root and unpersists its RDD directly — deterministic
    release for iterate-checkpoint-swap loops.

    Returns True when a checkpoint RDD was released. ONLY call on a
    frame nothing will read again: a locally-checkpointed frame has no
    lineage to recompute from, so any later action on it (or a plan
    built over it) fails with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND.
    Falls back to ``df.unpersist()`` (False) when the root is not a
    LogicalRDD — e.g. a frame that was never checkpointed.

    Failures are WARNED, not swallowed silently: the only legitimate
    failure here is a stopped session (teardown), and a leak with no
    signal is exactly the bug this helper exists to fix."""
    import warnings

    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(blocking)
            return True
        df.unpersist(blocking)
    except Exception as exc:  # pragma: no cover — teardown path
        warnings.warn(
            "release_local_checkpoint failed "
            f"({type(exc).__name__}: {exc}); checkpoint blocks may leak "
            "unless the session is already stopped",
            RuntimeWarning,
            stacklevel=2,
        )
    return False


class _CheckpointHandle:
    """Duck-typed stand-in in the _TRACKED registry for a frame whose
    blocks are CHECKPOINT blocks: release_tracked calls .unpersist on
    every entry, and for a checkpointed frame that must route through
    release_local_checkpoint (a plain DataFrame.unpersist never frees
    checkpoint blocks — see above)."""

    def __init__(self, df: DataFrame):
        self._df = df

    def unpersist(self, blocking: bool = False) -> None:
        release_local_checkpoint(self._df, blocking)


def tracked_checkpoint_release(df: DataFrame) -> DataFrame:
    """Register an already-localCheckpoint'ed frame so the NEXT
    release_tracked() frees its checkpoint blocks (the deferred-release
    contract tracked_persist gives cached frames, extended to
    checkpoint blocks). One sharp edge the caller inherits: unlike a
    persist, a released checkpoint CANNOT recompute — re-collecting the
    frame (or a plan over it) after release fails loudly with
    CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND instead of silently re-running.
    That matches the registry contract (caches live until the caller's
    terminal action, one query at a time), but rules out re-collection
    patterns that a persisted frame would tolerate."""
    _TRACKED.append(_CheckpointHandle(df))  # type: ignore[arg-type]
    return df
