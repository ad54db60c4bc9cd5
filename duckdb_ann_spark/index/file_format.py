"""`.diskann` v2 binary format reader/writer (numpy).

Byte-compatible with the reference (`rust_lib/src/file_format.rs:1-125`):

    [Header: 32 bytes]
      magic "DANN" | version u32(=2) | num_vectors u32 | dimension u32 |
      max_degree u32 | num_entry_points u32 | metric u8 (0=L2, 1=IP) |
      pad[3] | build_complexity u32
    [entry point ids: num_entry_points * u32]
    [vectors: num_vectors * dimension * f32]
    [adjacency: num_vectors * max_degree * u32, u32::MAX-padded]

All little-endian. Optional SQ8 appendix
(`rust_lib/src/index_manager.rs:508-535`):

    "SQ8\\0" | dimension u32 | qlen u64 | mins f32*dim | scales f32*dim |
    codes u8*qlen

The fixed-width layout means executors can `np.memmap` the vector and
adjacency segments straight from shared storage — the Spark analog of
the reference's mmap DiskProvider (`rust_lib/src/disk_provider.rs`).
"""

from __future__ import annotations

import os
import struct

import numpy as np

from .vamana_core import VamanaGraph

MAGIC = b"DANN"
VERSION = 2
HEADER_SIZE = 32
SQ8_MAGIC = b"SQ8\x00"

_METRIC_TO_U8 = {"l2": 0, "ip": 1}
_U8_TO_METRIC = {0: "l2", 1: "ip"}


def write_diskann(path: str, graph: VamanaGraph,
                  sq8: tuple | None = None) -> None:
    """Write a VamanaGraph as a v2 `.diskann` file (+ optional SQ8 appendix
    of (codes, mins, scales)). Written to a temp file and renamed so a
    retried/speculative executor task can never leave a torn shard."""
    n, dim = graph.n, graph.dim
    eps = np.asarray(graph.entry_points, dtype="<u4")
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<IIIII", VERSION, n, dim, graph.max_degree, len(eps)))
        f.write(struct.pack("<B3xI", _METRIC_TO_U8[graph.metric],
                            graph.build_complexity))
        f.write(eps.tobytes())
        f.write(np.ascontiguousarray(graph.vectors[:n], dtype="<f4").tobytes())
        f.write(np.ascontiguousarray(graph.adjacency[:n], dtype="<u4").tobytes())
        if sq8 is not None:
            codes, mins, scales = sq8
            f.write(SQ8_MAGIC)
            f.write(struct.pack("<IQ", dim, codes.size))
            f.write(np.ascontiguousarray(mins, dtype="<f4").tobytes())
            f.write(np.ascontiguousarray(scales, dtype="<f4").tobytes())
            f.write(np.ascontiguousarray(codes, dtype="u1").tobytes())
    os.replace(tmp, path)


def read_header(path: str) -> dict:
    with open(path, "rb") as f:
        raw = f.read(HEADER_SIZE)
    if raw[:4] != MAGIC:
        raise ValueError(f"Not a .diskann file (bad magic): {path}")
    version, n, dim, max_degree, n_eps = struct.unpack("<IIIII", raw[4:24])
    metric_u8, build_complexity = struct.unpack("<B3xI", raw[24:32])
    if version != VERSION:
        # reference wording: src/diskann_index.cpp:471
        raise ValueError(
            f"DiskANN index storage version mismatch: found {version}, "
            f"expected {VERSION}. Drop and recreate the index."
        )
    return {
        "num_vectors": n,
        "dimension": dim,
        "max_degree": max_degree,
        "num_entry_points": n_eps,
        "metric": _U8_TO_METRIC.get(metric_u8, "l2"),
        "build_complexity": build_complexity,
    }


def read_diskann(path: str, mmap: bool = False) -> VamanaGraph:
    """Load a v2 file; `mmap=True` memory-maps vectors/adjacency (read-only)."""
    h = read_header(path)
    n, dim, deg = h["num_vectors"], h["dimension"], h["max_degree"]
    ep_off = HEADER_SIZE
    vec_off = ep_off + h["num_entry_points"] * 4
    adj_off = vec_off + n * dim * 4
    eps = np.fromfile(path, dtype="<u4", count=h["num_entry_points"],
                      offset=ep_off)
    if mmap:
        vectors = np.memmap(path, dtype="<f4", mode="r", offset=vec_off,
                            shape=(n, dim))
        adjacency = np.memmap(path, dtype="<u4", mode="r", offset=adj_off,
                              shape=(n, deg))
    else:
        vectors = np.fromfile(path, dtype="<f4", count=n * dim,
                              offset=vec_off).reshape(n, dim)
        adjacency = np.fromfile(path, dtype="<u4", count=n * deg,
                                offset=adj_off).reshape(n, deg)

    g = VamanaGraph(dim, deg, h["build_complexity"], metric=h["metric"],
                    capacity=1)
    g.n = n
    g.vectors = vectors
    g.adjacency = adjacency
    g.entry_points = [int(e) for e in eps]
    return g


def read_sq8(path: str) -> tuple | None:
    """Read the optional SQ8 appendix → (codes, mins, scales) or None."""
    h = read_header(path)
    n, dim, deg = h["num_vectors"], h["dimension"], h["max_degree"]
    base = HEADER_SIZE + h["num_entry_points"] * 4 + n * dim * 4 + n * deg * 4
    with open(path, "rb") as f:
        f.seek(base)
        marker = f.read(4)
        if marker != SQ8_MAGIC:
            return None
        qdim, qlen = struct.unpack("<IQ", f.read(12))
        mins = np.frombuffer(f.read(qdim * 4), dtype="<f4")
        scales = np.frombuffer(f.read(qdim * 4), dtype="<f4")
        codes = np.frombuffer(f.read(qlen), dtype="u1").reshape(-1, qdim)
    return codes, mins, scales
