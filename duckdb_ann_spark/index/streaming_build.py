"""`diskann_streaming_build`: out-of-core two-pass index build.

Reference (`src/diskann_functions.cpp:133-211`,
`rust_lib/src/streaming_build.rs:46-127`): read vectors from a raw
binary file `[u32 n][u32 dim][f32 * n * dim]` (little-endian), build a
pilot Vamana graph from a sample (default `max(sqrt(N), 1000)`), then
stream-insert the remainder; write a `.diskann` v2 file. Returns
`(num_vectors, dimension, sample_size)`.

We accept the same raw binary input for parity, plus parquet input
(directory or .parquet file with a vector column) as the Spark-native
path.
"""

from __future__ import annotations

import os
import struct

import numpy as np

from .file_format import write_diskann
from .params import DiskannParams
from .vamana_core import two_pass_build

__all__ = ["diskann_streaming_build", "read_raw_vectors", "write_raw_vectors"]


def read_raw_vectors(path: str) -> np.ndarray:
    """Read the reference's raw input format: [u32 n][u32 dim][f32 data]."""
    with open(path, "rb") as f:
        head = f.read(8)
        if len(head) < 8:
            raise ValueError(f"Invalid vector file (truncated header): {path}")
        n, dim = struct.unpack("<II", head)
        data = np.fromfile(f, dtype="<f4", count=n * dim)
    if data.size != n * dim:
        raise ValueError(
            f"Invalid vector file: expected {n * dim} floats, got {data.size}"
        )
    return data.reshape(n, dim)


def write_raw_vectors(path: str, vectors: np.ndarray) -> None:
    v = np.ascontiguousarray(vectors, dtype="<f4")
    with open(path, "wb") as f:
        f.write(struct.pack("<II", v.shape[0], v.shape[1]))
        f.write(v.tobytes())


def diskann_streaming_build(
    input_path: str,
    output_path: str,
    metric: str = "l2",
    max_degree: int = 64,
    build_complexity: int = 128,
    alpha: float = 1.2,
    sample_size: int = 0,
    spark=None,
    vec_col: str = "embedding",
) -> tuple[int, int, int]:
    """Build a `.diskann` file from a raw binary or parquet vector file.

    → (num_vectors, dimension, sample_size_used)."""
    params = DiskannParams(
        metric=metric, max_degree=max_degree,
        build_complexity=build_complexity, alpha=alpha,
    )
    if not os.path.exists(input_path):
        raise FileNotFoundError(f"Input file does not exist: {input_path}")

    if input_path.endswith(".parquet") or os.path.isdir(input_path):
        if spark is not None:
            rows = (
                spark.read.parquet(input_path).select(vec_col).collect()
            )
            vectors = np.array([r[0] for r in rows], dtype=np.float32)
        else:
            import pyarrow.parquet as pq

            table = pq.read_table(input_path, columns=[vec_col])
            vectors = np.array(table.column(vec_col).to_pylist(), dtype=np.float32)
    else:
        vectors = read_raw_vectors(input_path)

    n = len(vectors)
    used = sample_size if sample_size > 0 else max(int(np.sqrt(n)), 1000)
    used = min(used, n)
    g = two_pass_build(
        vectors,
        sample_size=sample_size,
        max_degree=params.max_degree,
        build_complexity=params.build_complexity,
        alpha=params.alpha,
        metric=params.metric,
    )
    write_diskann(output_path, g)
    return n, (vectors.shape[1] if n else 0), used
