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
materialized (written / collected / counted) the output. Releasing is
always SAFE — Spark recomputes an unpersisted frame from lineage — it
only forfeits reuse if the caller re-materializes afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_dann_cached_frames"


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
    return out


def release_caches(df: DataFrame) -> int:
    """Unpersist every frame tracked on `df`; returns how many. Call
    after materializing `df` (count/collect/write). Idempotent."""
    held = list(getattr(df, _ATTR, ()))
    for f in held:
        f.unpersist()
    setattr(df, _ATTR, [])
    return len(held)
