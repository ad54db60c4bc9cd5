"""Grid synthetic-workload goldens (port of the reference's checked-in
grid cases, `rust_lib/diskann-patch/src/graph/test/cases/grid.rs` +
`test/generated/graph/test/cases/grid/search_{1_100,3_5,4_4}.json`).

The workload: lattice points of an N^dim integer grid, searched with a
query of all -1s. The goldens' semantic claims (their `description`
field): the all-zeros corner is the unique nearest point at squared
distance `dim`, followed by exactly `dim` points one grid step away,
each at squared distance `dim + 3`. Hop/comparison counts are
implementation metrics and are not ported.

Deterministic — no seeds, no randomness.
"""

import itertools

import numpy as np
import pytest

from duckdb_ann_spark.index.vamana_core import build_graph


def _grid(dims: int, size: int) -> np.ndarray:
    pts = np.array(
        list(itertools.product(range(size), repeat=dims)), dtype=np.float32
    )
    return pts


@pytest.mark.parametrize(
    "dims,size",
    [(1, 100), (3, 5), (4, 4)],  # the reference's three checked-in cases
)
def test_grid_search_goldens(dims, size):
    pts = _grid(dims, size)
    g = build_graph(pts, max_degree=16, build_complexity=64)
    query = np.full(dims, -1.0, dtype=np.float32)
    k = dims + 1
    hits = g.search(query, k, search_complexity=len(pts))

    # golden 1: the all-zeros corner is nearest, at squared L2 = dim
    lab0, d0 = hits[0]
    assert np.array_equal(g.vectors[lab0], np.zeros(dims, dtype=np.float32))
    assert d0 == pytest.approx(float(dims))

    # golden 2: the next `dims` results are the one-step neighbors, each
    # at squared L2 = dim + 3 ((2)^2 - (1)^2 = 3 on the stepped axis)
    tier = hits[1:]
    assert len(tier) == dims
    for lab, d in tier:
        assert d == pytest.approx(float(dims) + 3.0)
        v = g.vectors[lab]
        assert v.sum() == 1.0 and (v >= 0).all()  # exactly one coord = 1


@pytest.mark.parametrize(
    "strategy", ["first", "medoid", "random", "latin_hypercube"]
)
def test_grid_goldens_hold_for_all_start_strategies(strategy):
    """Entry-point strategy changes where searches start, never what an
    exact-complexity search returns: all four strategies reproduce the
    grid goldens' nearest-corner + one-step-tier claims."""
    pts = _grid(3, 5)
    g = build_graph(pts, max_degree=16, build_complexity=64,
                    start_strategy=strategy, start_nsamples=4)
    query = np.full(3, -1.0, dtype=np.float32)
    hits = g.search(query, 4, search_complexity=len(pts))
    lab0, d0 = hits[0]
    assert np.array_equal(g.vectors[lab0], np.zeros(3, dtype=np.float32))
    assert d0 == pytest.approx(3.0)
    for lab, d in hits[1:]:
        assert d == pytest.approx(6.0)
        v = g.vectors[lab]
        assert v.sum() == 1.0 and (v >= 0).all()


def test_grid_batch_matches_single():
    pts = _grid(3, 5)
    g = build_graph(pts, max_degree=16, build_complexity=64)
    qs = np.stack([np.full(3, -1.0), pts[7], pts[60]]).astype(np.float32)
    batch = g.search_batch(qs, k=4)
    for i in range(len(qs)):
        assert batch[i] == g.search(qs[i], 4), i
