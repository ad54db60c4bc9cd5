"""Persisted-block bookkeeping for operators whose RETURNED plan
references frames they had to persist (LSH signature tables, candidate
slices, the pipeline's cleaned working set).

Those frames cannot be unpersisted inside the operator — the caller owns
the materialization boundary — so without bookkeeping a long-lived
session accumulates evictable-but-resident blocks after every call
(round-6 advice). The blunt alternative, ``spark.catalog.clearCache()``,
also drops caches the *application* owns.

``track_caches(out, *frames)`` threads persisted handles (and anything
already tracked on them) onto the returned DataFrame;
``release_caches(df)`` unpersists them all once the caller has
materialized (written / collected / counted) the output.

CONTRACT: the tracked list lives as a Python attribute on the EXACT
DataFrame object an operator returned. Any further transformation
(``out.select(...)``, ``out.where(...)`` …) builds a NEW DataFrame
without the attribute, so ``release_caches`` on the derived frame frees
nothing (it returns 0 — check it). Either release on the operator's
return value itself, or use :func:`release_operator_caches`, which
drops every cache ANY tracked operator created in this process — safe
because it never touches application-owned caches (unlike
``clearCache``). Releasing is always SAFE — Spark recomputes an
unpersisted frame from lineage — it only forfeits reuse if the caller
re-materializes afterwards.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

_ATTR = "_dann_cached_frames"

# process-level registry of every frame an operator persisted and
# tracked: the fallback release path when the caller no longer holds
# the exact returned object (round-7 advice — a derived frame silently
# drops the attribute). Weak refs: the registry must not keep a frame's
# JVM plan alive on its own.
_ALL_TRACKED: "weakref.WeakSet[DataFrame]" = weakref.WeakSet()


def track_caches(out: DataFrame, *frames: DataFrame) -> DataFrame:
    """Attach each persisted frame in `frames` — plus any frames already
    tracked on them by an upstream operator — to `out`, for a later
    :func:`release_caches`. Unpersisted frames contribute only their
    tracked list, so propagation is safe to apply unconditionally."""
    held = list(getattr(out, _ATTR, ()))
    for f in frames:
        if f is None:
            continue
        for inner in getattr(f, _ATTR, ()):
            if all(inner is not h for h in held):
                held.append(inner)
        lvl = f.storageLevel
        if (lvl.useMemory or lvl.useDisk) and all(f is not h for h in held):
            held.append(f)
    setattr(out, _ATTR, held)
    for h in held:
        _ALL_TRACKED.add(h)
    return out


def release_caches(df: DataFrame) -> int:
    """Unpersist every frame tracked on `df`; returns how many. Call
    after materializing `df` (count/collect/write) — on the EXACT object
    an operator returned (see module contract; a derived frame returns
    0). Idempotent."""
    held = list(getattr(df, _ATTR, ()))
    for f in held:
        f.unpersist()
        _ALL_TRACKED.discard(f)
    setattr(df, _ATTR, [])
    return len(held)


def release_operator_caches() -> int:
    """Unpersist EVERY frame any operator in this process has tracked;
    returns how many. The safe session-level sweep for when the exact
    returned objects are gone (long-lived services, notebook sessions):
    unlike ``spark.catalog.clearCache()`` it only drops caches this
    library created, never the application's own."""
    held = list(_ALL_TRACKED)
    for f in held:
        f.unpersist()
        _ALL_TRACKED.discard(f)
    return len(held)
