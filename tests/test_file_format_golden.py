"""Byte-level `.diskann` golden fixtures, hand-authored from the layout
spec (`rust_lib/src/file_format.rs:1-125`, SQ8 appendix
`rust_lib/src/index_manager.rs:508-535`) with plain struct.pack —
independent of our writer (tests/make_golden.py regenerates them). Pins
the format against the reference so a writer+reader bug that round-trips
self-consistently still fails here."""

import os

import numpy as np

from duckdb_ann_spark.index.file_format import (
    read_diskann,
    read_header,
    read_sq8,
    write_diskann,
)
from duckdb_ann_spark.index.vamana_core import NO_EDGE, VamanaGraph

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
GOLDEN = os.path.join(FIXTURES, "golden_3vec.diskann")
GOLDEN_SQ8 = os.path.join(FIXTURES, "golden_3vec_sq8.diskann")

VECS = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], dtype=np.float32)
ADJ = np.array([[1, 2], [0, NO_EDGE], [0, NO_EDGE]], dtype=np.uint32)


def _golden_graph() -> VamanaGraph:
    g = VamanaGraph(dim=2, max_degree=2, build_complexity=32, metric="l2",
                    capacity=3)
    g.n = 3
    g.vectors[:3] = VECS
    g.adjacency[:3] = ADJ
    g.entry_points = [0]
    return g


def test_reader_parses_hand_authored_golden():
    h = read_header(GOLDEN)
    assert h == {
        "num_vectors": 3, "dimension": 2, "max_degree": 2,
        "num_entry_points": 1, "metric": "l2", "build_complexity": 32,
    }
    g = read_diskann(GOLDEN)
    assert g.entry_points == [0]
    assert np.array_equal(np.asarray(g.vectors[:3]), VECS)
    assert np.array_equal(np.asarray(g.adjacency[:3]), ADJ)
    assert read_sq8(GOLDEN) is None


def test_writer_matches_golden_bytes(tmp_path):
    out = str(tmp_path / "w.diskann")
    write_diskann(out, _golden_graph())
    with open(out, "rb") as f, open(GOLDEN, "rb") as gf:
        assert f.read() == gf.read()


def test_sq8_appendix_golden(tmp_path):
    codes, mins, scales = read_sq8(GOLDEN_SQ8)
    assert np.array_equal(mins, np.array([1.0, 2.0], dtype=np.float32))
    assert np.array_equal(scales, np.array([4.0, 4.0], dtype=np.float32))
    assert np.array_equal(
        codes, np.array([[0, 0], [128, 128], [255, 255]], dtype=np.uint8)
    )
    # dequantization contract: q/255*scale + min recovers the originals
    # at the grid points (provider.rs:26-27)
    deq = codes.astype(np.float32) / 255.0 * scales + mins
    assert np.allclose(deq, VECS, atol=1e-2)

    out = str(tmp_path / "w.diskann")
    write_diskann(out, _golden_graph(), sq8=(codes, mins, scales))
    with open(out, "rb") as f, open(GOLDEN_SQ8, "rb") as gf:
        assert f.read() == gf.read()


def test_golden_regenerator_is_stable():
    """tests/make_golden.py (struct.pack only) reproduces the checked-in
    bytes — the fixture cannot drift from its spec."""
    import make_golden

    with open(GOLDEN, "rb") as f:
        assert f.read() == make_golden.base_bytes()
    with open(GOLDEN_SQ8, "rb") as f:
        assert f.read() == make_golden.base_bytes() + make_golden.sq8_appendix()
