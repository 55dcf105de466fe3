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
