"""Multimodal (binary) column handling for training-data pipelines.

Design: media is an opaque `binary` column plus typed metadata columns;
all Spark-side plumbing (schema, Arrow batching, partitioning) is real,
while the actual media decode is stubbed — the container has no
image/audio libraries, so `decode_image` raises `NotImplementedError`
unless PIL is importable, and `extract_features` uses a deterministic
byte-level feature vector as the stand-in for a real decoder.

* :func:`binary_stats` — pure Column exprs: byte length + md5 digest.
* :func:`extract_features` — `mapInPandas` over Arrow batches: per-blob
  deterministic features (n_bytes, mean/std byte value, 8-bin byte
  histogram as an `array<float>` feature vector). This is the exact
  shape a real decode/resize/embed pipeline plugs into: swap
  `_fake_decode` for the real decoder, keep schema and batching.
* :func:`decode_image` — the gated real-decoder stub.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["binary_stats", "extract_features", "decode_image"]


def binary_stats(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """→ (id, n_bytes, digest) — metadata pass, no Python."""
    return df.select(
        F.col(id_col),
        F.octet_length(F.col(bin_col)).alias("n_bytes"),
        F.md5(F.col(bin_col)).alias("digest"),
    )


def decode_image(data: bytes):
    """Decode an image blob. STUB: the runtime has no imaging libraries."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(data))
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL, which is not available in this "
            "runtime; extract_features uses deterministic byte-level "
            "features instead"
        ) from e


def _fake_decode(blob: bytes) -> np.ndarray:
    """Deterministic stand-in for decode→feature-extract: 8-bin byte
    histogram, normalized."""
    arr = np.frombuffer(blob, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(8, dtype=np.float32)
    hist, _ = np.histogram(arr, bins=8, range=(0, 256))
    return (hist / arr.size).astype(np.float32)


def extract_features(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """→ (id, n_bytes, byte_mean, byte_std, features array<float>[8]).

    Arrow-batched mapInPandas: the real pattern for media pipelines —
    one Python roundtrip per batch, numpy inside, typed schema outside."""
    schema = (
        f"{id_col} long, n_bytes long, byte_mean double, byte_std double, "
        "features array<float>"
    )

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(blob) if blob is not None else b""
                arr = np.frombuffer(b, dtype=np.uint8)
                out.append(
                    (
                        rid,
                        len(b),
                        float(arr.mean()) if arr.size else 0.0,
                        float(arr.std()) if arr.size else 0.0,
                        [float(x) for x in _fake_decode(b)],
                    )
                )
            yield pd.DataFrame(
                out, columns=[id_col, "n_bytes", "byte_mean", "byte_std", "features"]
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)
