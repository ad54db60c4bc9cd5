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

import threading

from pyspark.sql import DataFrame

_ATTR = "_dann_cached_frames"

# process-level registry of every frame an operator persisted and
# tracked: the fallback release path when the caller no longer holds
# the exact returned object (round-7 advice — a derived frame silently
# drops the attribute). STRONG references on purpose (round-8 review):
# Spark's CacheManager pins the cached blocks regardless of whether any
# Python wrapper survives, so a weak registry would empty itself on GC
# exactly in the dropped-all-references scenario the sweep exists for,
# leaving the blocks unreleasable except via clearCache. The wrapper
# objects this list keeps alive are tiny next to the cached data they
# control, and every release path removes its entries.
_ALL_TRACKED: "list[DataFrame]" = []
# guards every _ALL_TRACKED mutation (round-9, verdict item 7): a
# multithreaded driver — notebook/service sessions Spark explicitly
# supports — can run operators on one thread while another sweeps
# release_operator_caches(); the unguarded list ops could lose registry
# entries mid-resize (unreleasable-except-clearCache blocks). The lock
# covers only registry bookkeeping, never the unpersist() JVM calls, so
# a slow py4j round-trip cannot serialize unrelated operator threads.
_LOCK = threading.Lock()


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
    with _LOCK:
        for h in held:
            if all(h is not t for t in _ALL_TRACKED):
                _ALL_TRACKED.append(h)
    return out


def _forget(f: DataFrame) -> None:
    with _LOCK:
        for i, t in enumerate(_ALL_TRACKED):
            if t is f:
                del _ALL_TRACKED[i]
                return


def release_caches(df: DataFrame) -> int:
    """Unpersist every frame tracked on `df`; returns how many. Call
    after materializing `df` (count/collect/write) — on the EXACT object
    an operator returned (see module contract; a derived frame returns
    0). Idempotent."""
    held = list(getattr(df, _ATTR, ()))
    for f in held:
        f.unpersist()
        _forget(f)
    setattr(df, _ATTR, [])
    return len(held)


def release_operator_caches() -> int:
    """Unpersist EVERY frame any operator in this process has tracked;
    returns how many. The safe session-level sweep for when the exact
    returned objects are gone (long-lived services, notebook sessions):
    unlike ``spark.catalog.clearCache()`` it only drops caches this
    library created, never the application's own. Works even after the
    caller dropped every reference — the registry itself keeps the
    handles alive until released."""
    # drop each entry only AFTER its successful unpersist: clearing the
    # whole list up front would orphan every remaining frame if one
    # unpersist raises (e.g. a py4j error against a stopped session) —
    # a retry of the sweep must still see them (r8 review)
    with _LOCK:
        snapshot = list(_ALL_TRACKED)
    n = 0
    for f in snapshot:
        f.unpersist()
        _forget(f)
        n += 1
    return n
