"""Property-based tests (hypothesis) over the pure-numpy core.

These pin invariants rather than examples: whatever random vectors,
degrees, and metrics are thrown at the graph build, search results stay
sorted/correct/bounded, pruning respects the degree bound, the batch
searcher agrees with the single-query one, and the `.diskann` file
round-trips losslessly.
"""

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

from duckdb_ann_spark.index.file_format import read_diskann, write_diskann
from duckdb_ann_spark.index.vamana_core import (
    build_graph,
    sq8_dequantize,
    sq8_quantize,
)


def _vectors(draw, max_n=40, max_dim=6):
    n = draw(st.integers(min_value=1, max_value=max_n))
    dim = draw(st.integers(min_value=1, max_value=max_dim))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    return rng.uniform(-1.0, 1.0, size=(n, dim)).astype(np.float32)


vectors_st = st.builds(lambda: None).flatmap(
    lambda _: st.tuples(
        st.integers(1, 40), st.integers(1, 6), st.integers(0, 2**31 - 1)
    ).map(
        lambda t: np.random.default_rng(t[2])
        .uniform(-1.0, 1.0, size=(t[0], t[1]))
        .astype(np.float32)
    )
)


@settings(max_examples=25, deadline=None)
@given(vecs=vectors_st, k=st.integers(1, 10), metric=st.sampled_from(["l2", "ip"]))
def test_search_invariants(vecs, k, metric):
    g = build_graph(vecs, max_degree=8, build_complexity=16, metric=metric)
    q = vecs[0]
    hits = g.search(q, k)
    # bounded, unique labels, distances ascending and correctly computed
    assert len(hits) == min(k, len(vecs))
    labels = [h[0] for h in hits]
    assert len(set(labels)) == len(labels)
    dists = [h[1] for h in hits]
    assert dists == sorted(dists)
    for lab, d in hits:
        if metric == "ip":
            want = -float(np.dot(vecs[lab], q))
        else:
            diff = vecs[lab] - q
            want = float(np.dot(diff, diff))
        assert d == pytest.approx(want, rel=1e-4, abs=1e-5)
    # the query vector itself is in the index: its self-distance must be
    # the minimum possible, and full-L search must find it for L2
    if metric == "l2":
        full = g.search(q, k, search_complexity=len(vecs))
        assert full[0][1] == pytest.approx(0.0, abs=1e-6)


@settings(max_examples=20, deadline=None)
@given(vecs=vectors_st, k=st.integers(1, 8))
def test_batch_equals_single(vecs, k):
    g = build_graph(vecs, max_degree=8, build_complexity=16)
    qs = vecs[: min(5, len(vecs))]
    batch = g.search_batch(qs, k)
    for qi in range(len(qs)):
        assert batch[qi] == g.search(qs[qi], k), qi


@settings(max_examples=20, deadline=None)
@given(vecs=vectors_st)
def test_degree_bound_and_prune(vecs):
    md = 4
    g = build_graph(vecs, max_degree=md, build_complexity=16)
    for i in range(g.n):
        nbrs = g.neighbors(i)
        assert len(nbrs) <= md
        assert len(set(nbrs.tolist())) == len(nbrs)
        assert i not in nbrs  # no self-edges
        assert (nbrs < g.n).all()  # no dangling edges


@settings(max_examples=20, deadline=None)
@given(vecs=vectors_st)
def test_file_roundtrip_lossless(vecs):
    import tempfile, os

    g = build_graph(vecs, max_degree=8, build_complexity=16)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "g.diskann")
        write_diskann(p, g)
        g2 = read_diskann(p)
        assert np.array_equal(g2.vectors[: g.n], g.vectors[: g.n])
        assert np.array_equal(g2.adjacency[: g.n], g.adjacency[: g.n])
        assert g2.entry_points == g.entry_points
        assert (g2.dim, g2.max_degree, g2.metric) == (g.dim, g.max_degree, g.metric)
        q = vecs[len(vecs) // 2]
        assert g.search(q, 5) == g2.search(q, 5)


@settings(max_examples=30, deadline=None)
@given(vecs=vectors_st)
def test_sq8_error_bound(vecs):
    codes, mins, scales = sq8_quantize(vecs)
    deq = sq8_dequantize(codes, mins, scales)
    # quantization error <= half a step per dimension
    step = scales / 255.0
    assert (np.abs(deq - vecs) <= step / 2 + 1e-6).all()
    # codes span the full range per dimension when there is spread
    spread = vecs.max(axis=0) - vecs.min(axis=0)
    for j in range(vecs.shape[1]):
        if spread[j] > 0:
            assert codes[:, j].min() == 0 and codes[:, j].max() == 255


@settings(max_examples=25, deadline=None)
@given(vecs=vectors_st, k=st.integers(1, 8),
       m=st.integers(2, 8), metric=st.sampled_from(["l2", "ip"]))
def test_hnsw_invariants(vecs, k, m, metric):
    """Layered HNSW under arbitrary shapes: results are valid labels,
    sorted by (dist, id), degree bounds hold on every layer, levels
    thin monotonically, and build is deterministic."""
    from duckdb_ann_spark.index.hnsw_core import build_hnsw

    g = build_hnsw(vecs, m=m, ef_construction=2 * m + 4, metric=metric)
    assert g.n == len(vecs)
    # degree bounds
    assert ((g.adjacency[: g.n] != np.uint32(0xFFFFFFFF)).sum(axis=1)
            <= g.m0).all()
    for layer in g.upper:
        for ids in layer.values():
            assert len(ids) <= g.m
    # layer membership: a node linked on layer l must be assigned
    # level >= l, and all its link targets must be too
    for lth, layer in enumerate(g.upper, start=1):
        for node, ids in layer.items():
            assert g.levels[node] >= lth
            assert all(g.levels[nb] >= lth for nb in ids)
    # search contract
    hits = g.search(vecs[0], k, search_complexity=4 * m)
    assert len(hits) == min(k, g.n)
    labels = [i for i, _ in hits]
    assert len(set(labels)) == len(labels)
    assert all(0 <= i < g.n for i in labels)
    ds = [d for _, d in hits]
    assert all(a <= b for a, b in zip(ds, ds[1:]))
    # determinism
    g2 = build_hnsw(vecs, m=m, ef_construction=2 * m + 4, metric=metric)
    assert np.array_equal(g.adjacency[: g.n], g2.adjacency[: g2.n])
    assert g.entry_point == g2.entry_point


@given(
    st.integers(min_value=1, max_value=60),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_sq8_lazy_view_matches_eager(n, dim, seed):
    """SQ8Vectors row access is bitwise-equal to indexing the eagerly
    dequantized matrix, for any codes/mins/scale and any index shape
    (int, array, list) — the property the quantized-domain serve path
    rests on."""
    import numpy as np

    from duckdb_ann_spark.index.vamana_core import (
        SQ8Vectors,
        sq8_dequantize,
        sq8_quantize,
    )

    rng = np.random.default_rng(seed)
    vecs = (rng.random((n, dim), dtype=np.float32) - 0.5) * rng.integers(
        1, 1000
    )
    codes, mins, scale = sq8_quantize(vecs)
    eager = sq8_dequantize(codes, mins, scale)
    lazy = SQ8Vectors(codes, mins, scale)
    assert lazy.shape == (n, dim) and len(lazy) == n
    assert lazy.nbytes == codes.nbytes + mins.nbytes + scale.nbytes
    idx = rng.integers(0, n, size=min(n, 7))
    assert np.array_equal(lazy[idx], eager[idx])
    assert np.array_equal(lazy[int(idx[0])], eager[int(idx[0])])
    assert np.array_equal(lazy[list(idx[:3])], eager[list(idx[:3])])


@given(
    probes=st.lists(
        st.integers(1, 4096), min_size=1, max_size=8, unique=True
    ).map(sorted),
    prec_raw=st.lists(st.floats(0.01, 1.0), min_size=8, max_size=8),
    ls=st.lists(
        st.integers(1, 4096), min_size=1, max_size=8, unique=True
    ).map(sorted),
    lrec_raw=st.lists(st.floats(0.01, 1.0), min_size=8, max_size=8),
    target=st.floats(0.05, 1.0),
    anchor_i=st.integers(0, 7),
    end_ratio=st.floats(0.5, 1.1),
)
@settings(max_examples=200, deadline=None)
def test_resolve_end_recall_invariants(
    probes, prec_raw, ls, lrec_raw, target, anchor_i, end_ratio
):
    """Property contract of the anchored joint resolution (round 11):
    for ANY monotone pair of curves and any measured anchor, a
    successful resolution returns curve points whose composed product
    honors the anchor-scaled requirement, never sits below the anchor
    config, and an uncomposable target raises instead of silently
    under-delivering."""
    from duckdb_ann_spark.index.calibration import resolve_end_recall

    # monotone non-decreasing curves over the sampled grids
    prec = sorted(prec_raw)[: len(probes)]
    lrec = sorted(lrec_raw)[: len(ls)]
    prec = sorted(prec)
    lrec = sorted(lrec)
    ai = anchor_i % (len(probes) * len(ls))
    p_a, l_a = probes[ai // len(ls)], ls[ai % len(ls)]
    pred_a = prec[ai // len(ls)] * lrec[ai % len(ls)]
    end_a = min(1.0, max(1e-3, pred_a * end_ratio))
    mani = {
        "route_calibration": {"probes": probes, "recall": prec},
        "l_calibration": {"ls": ls, "recall": lrec},
        "end_calibration": {
            "route_nprobe": p_a, "search_complexity": l_a,
            "recall": end_a, "predicted": pred_a,
        },
    }
    try:
        p, L = resolve_end_recall(mani, target)
    except ValueError as e:
        assert "not composable" in str(e)
        # loud failure only when the up-scaled requirement is truly
        # out of reach of the (anchor-restricted) curve maxima
        if target > end_a:
            required = pred_a * target / end_a
            feas = [
                rp * rl
                for pp, rp in zip(probes, prec) if pp >= p_a
                for ll, rl in zip(ls, lrec) if ll >= l_a
            ]
            assert not feas or max(feas) < required
        else:
            raise AssertionError(
                f"target {target} <= anchor end {end_a} must resolve"
            ) from e
        return
    if target <= end_a:
        # at/below the measured anchor: the anchor config itself
        assert (p, L) == (p_a, l_a)
    else:
        # above: monotone up-scaling with the product grown in step
        assert p >= p_a and L >= l_a
        rp = dict(zip(probes, prec))[p]
        rl = dict(zip(ls, lrec))[L]
        assert rp * rl >= pred_a * target / end_a - 1e-12
