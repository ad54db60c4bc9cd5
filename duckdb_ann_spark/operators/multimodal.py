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

from ..functions.text import quote_ident

__all__ = [
    "binary_stats",
    "extract_features",
    "decode_image",
    "frame_sample",
    "resize_features",
]


def binary_stats(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """→ (id, n_bytes, digest) — metadata pass, no Python."""
    return df.select(
        F.col(id_col),
        F.octet_length(F.col(bin_col)).alias("n_bytes"),
        F.md5(F.col(bin_col)).alias("digest"),
    )


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image(data: bytes):
    """Decode an image blob. Soft dependency: real PIL decode when the
    library is importable, NotImplementedError otherwise (this runtime
    ships no imaging libraries)."""
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


def _pil_decode(blob: bytes) -> np.ndarray:
    """Real decode → feature vector: grayscale pixel values, 8-bin
    normalized histogram — the same feature shape as `_fake_decode`, so
    swapping decoders never changes the output schema."""
    img = decode_image(blob).convert("L")
    arr = np.asarray(img, dtype=np.uint8).ravel()
    if arr.size == 0:
        return np.zeros(8, dtype=np.float32)
    hist, _ = np.histogram(arr, bins=8, range=(0, 256))
    return (hist / arr.size).astype(np.float32)


def _fake_decode(blob: bytes) -> np.ndarray:
    """Deterministic stand-in for decode→feature-extract: 8-bin byte
    histogram, normalized."""
    arr = np.frombuffer(blob, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(8, dtype=np.float32)
    hist, _ = np.histogram(arr, bins=8, range=(0, 256))
    return (hist / arr.size).astype(np.float32)


def frame_sample(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    n_frames: int = 4,
    frame_bytes: int = 16,
    fps: int = 25,
) -> DataFrame:
    """Uniform frame sampling from a fixed-frame-size binary container:
    blob = frames of `frame_bytes` each (trailing partial dropped),
    sample `n_frames` uniformly spaced → one output row per frame.

    → (id, sample_idx, frame_idx, ts_ms, frame binary)

    Entirely JVM Column expressions (sequence/explode/substring) — frame
    selection never leaves whole-stage codegen; only a real *decode* of
    the frame content needs Python (see :func:`extract_features`). Rows
    with fewer bytes than one frame produce no output."""
    if n_frames <= 0:
        raise ValueError("n_frames must be positive")
    if frame_bytes <= 0:
        raise ValueError("frame_bytes must be positive")
    if fps <= 0:
        raise ValueError("fps must be positive")
    total = (F.octet_length(F.col(bin_col)) / frame_bytes).cast("long")
    n_eff = F.least(F.lit(n_frames).cast("long"), total)
    out = (
        df.select(id_col, bin_col)
        .withColumn("_total", total)
        .withColumn("_n", n_eff)
        .where(F.col("_total") > 0)
        .withColumn(
            "sample_idx",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("_n") - 1)),
        )
        .withColumn(
            "frame_idx",
            (F.col("sample_idx") * F.col("_total") / F.col("_n")).cast("long"),
        )
        .withColumn("ts_ms", (F.col("frame_idx") * 1000 / fps).cast("long"))
        .withColumn(
            "frame",
            F.expr(
                f"substring({quote_ident(bin_col)}, "
                f"cast(frame_idx * {frame_bytes} + 1 "
                f"as int), {frame_bytes})"
            ),
        )
    )
    return out.select(
        id_col,
        F.col("sample_idx").cast("int").alias("sample_idx"),
        F.col("frame_idx").cast("int").alias("frame_idx"),
        "ts_ms",
        "frame",
    )


def resize_features(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    src_width: int = 32,
    out_h: int = 4,
    out_w: int = 4,
) -> DataFrame:
    """Decode → resize → flatten, with the decode step faked: bytes are
    viewed as a (n_bytes // src_width, src_width) u8 image and
    area-pooled to (out_h, out_w) float32. The pooling math, Arrow
    batching, and typed schema are the real pipeline; swap the byte
    view for a real decoder to productionize.

    → (id, src_h, src_w, pixels array<float>[out_h*out_w])"""
    schema = f"{id_col} long, src_h int, src_w int, pixels array<float>"

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(blob) if blob is not None else b""
                h = len(b) // src_width
                if h == 0:
                    continue
                img = np.frombuffer(
                    b[: h * src_width], dtype=np.uint8
                ).reshape(h, src_width).astype(np.float32)
                # area pooling: split rows/cols into out_h/out_w bins and
                # average each bin (the resize kernel real pipelines use
                # for downscale)
                ys = np.linspace(0, h, out_h + 1).astype(int)
                xs = np.linspace(0, src_width, out_w + 1).astype(int)
                pooled = np.array(
                    [
                        [
                            img[ys[i]: max(ys[i + 1], ys[i] + 1),
                                xs[j]: max(xs[j + 1], xs[j] + 1)].mean()
                            for j in range(out_w)
                        ]
                        for i in range(out_h)
                    ],
                    dtype=np.float32,
                )
                out.append((rid, h, src_width, [float(x) for x in pooled.ravel()]))
            if out:
                yield pd.DataFrame(
                    out, columns=[id_col, "src_h", "src_w", "pixels"]
                )

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)


def extract_features(
    df: DataFrame, id_col: str, bin_col: str, decoder: str = "auto"
) -> DataFrame:
    """→ (id, n_bytes, byte_mean, byte_std, features array<float>[8]).

    Arrow-batched mapInPandas: the real pattern for media pipelines —
    one Python roundtrip per batch, numpy inside, typed schema outside.

    ``decoder``: "bytes" = deterministic byte-histogram stand-in (always
    available, what the driver oracle pins); "image" = real PIL decode →
    grayscale pixel histogram (raises NotImplementedError when PIL is
    absent); "auto" (default) = "image" when PIL is importable on the
    DRIVER, else "bytes" — the decision is made once here, not
    per-executor, so a heterogeneous cluster can't mix decoders. The
    byte-level mean/std stats are decoder-independent."""
    if decoder not in ("auto", "bytes", "image"):
        raise ValueError(f"decoder must be auto|bytes|image, got {decoder!r}")
    if decoder == "auto":
        decoder = "image" if _pil_available() else "bytes"
    if decoder == "image" and not _pil_available():
        raise NotImplementedError(
            "decoder='image' requires PIL, which is not importable; "
            "use decoder='bytes' for the deterministic byte-level features"
        )
    decode = _pil_decode if decoder == "image" else _fake_decode
    schema = (
        f"{id_col} long, n_bytes long, byte_mean double, byte_std double, "
        "features array<float>"
    )

    import math

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(blob) if blob is not None else b""
                arr = np.frombuffer(b, dtype=np.uint8)
                n = arr.size
                # mean/std from EXACT integer sums (byte values are small,
                # so sum and sum-of-squares are exact in int64 and in f64),
                # evaluated with one fixed f64 expression tree:
                #   mean = sm/n;  std = sqrt(max(sq/n - mean*mean, 0))
                # Every op is a correctly-rounded IEEE primitive, so an
                # SQL oracle evaluating the same tree over the same sums
                # is bit-identical. np.std's centered pairwise
                # accumulation differs in last-ulp and has no SQL twin.
                if n:
                    sm = int(arr.sum(dtype=np.int64))
                    sq = int((arr.astype(np.int64) ** 2).sum())
                    mean = sm / n
                    std = math.sqrt(max(sq / n - mean * mean, 0.0))
                else:
                    mean = std = 0.0
                out.append(
                    (rid, n, mean, std, [float(x) for x in decode(b)])
                )
            yield pd.DataFrame(
                out, columns=[id_col, "n_bytes", "byte_mean", "byte_std", "features"]
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)
