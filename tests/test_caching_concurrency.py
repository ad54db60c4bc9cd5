"""The `caching._ALL_TRACKED` registry under concurrent mutation
(round-9 verdict item 7): a service/notebook driver may run operators on
one thread while another sweeps `release_operator_caches()`. The lock
must guarantee no registry entry is LOST — every frame an operator
tracked is eventually released exactly once (unpersist is idempotent,
so double-release is safe; a lost entry is the bug: its cached blocks
become unreleasable except via clearCache).

Fake frames (storageLevel + unpersist duck-typing, same surface the
module reads) keep the test a pure registry-race test — real Spark
unpersist calls would serialize on py4j and hide the race the lock
exists to close.
"""

from __future__ import annotations

import threading

from duckdb_ann_spark import caching


class _Level:
    useMemory = True
    useDisk = False


class _FakeFrame:
    storageLevel = _Level()

    def __init__(self):
        self.released = 0
        self._lock = threading.Lock()

    def unpersist(self):
        with self._lock:
            self.released += 1


class _Out:
    """Bare attribute carrier standing in for an operator's returned
    DataFrame."""


def test_concurrent_track_and_sweep_loses_nothing():
    caching.release_operator_caches()  # drain leftovers from other tests
    n_threads, per_thread = 8, 50
    frames: list[list[_FakeFrame]] = [[] for _ in range(n_threads)]
    start = threading.Barrier(n_threads + 1)

    def producer(ti: int):
        start.wait()
        for _ in range(per_thread):
            f = _FakeFrame()
            frames[ti].append(f)
            caching.track_caches(_Out(), f)

    def sweeper():
        start.wait()
        for _ in range(200):
            caching.release_operator_caches()

    threads = [
        threading.Thread(target=producer, args=(i,)) for i in range(n_threads)
    ] + [threading.Thread(target=sweeper)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    caching.release_operator_caches()  # final sweep catches stragglers
    for tf in frames:
        for f in tf:
            assert f.released >= 1, "tracked frame lost by the registry"
    assert caching.release_operator_caches() == 0


def test_release_caches_and_sweep_agree_under_contention():
    caching.release_operator_caches()
    outs, all_frames = [], []
    for _ in range(100):
        f = _FakeFrame()
        all_frames.append(f)
        outs.append(caching.track_caches(_Out(), f))

    def releaser():
        for o in outs[:50]:
            caching.release_caches(o)

    def sweeper():
        caching.release_operator_caches()

    ts = [threading.Thread(target=releaser), threading.Thread(target=sweeper)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    caching.release_operator_caches()
    for f in all_frames:
        assert f.released >= 1
    assert caching.release_operator_caches() == 0
