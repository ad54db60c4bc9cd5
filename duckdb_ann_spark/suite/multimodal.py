"""Driver queries: multimodal binary-column handling.

The testdata has no media table, so blobs are materialized
deterministically from document text (utf8 bytes) — the point is the
binary-column plumbing: opaque blob + typed metadata, Arrow-batched
feature extraction with a stubbed decoder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import binary_stats, extract_features
from . import register


def _blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", F.col("text").cast("binary").alias("blob"))


@register(
    "multimodal_metadata",
    """
    SELECT doc_id,
           CAST(strlen(text) AS INT) AS n_bytes,
           md5(text) AS digest
    FROM documents
    """,
)
def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata pass (byte length + digest) — pure Column
    expressions over a `binary` column; the oracle hashes the same utf8
    bytes."""
    return binary_stats(_blobs(spark, sf_dir), "doc_id", "blob")


_FEATURE_BINS = ",\n           ".join(
    f"CAST(sum(CASE WHEN byte // 32 = {i} THEN 1 ELSE 0 END) AS DOUBLE) AS h{i}"
    for i in range(8)
)
_FEATURE_COLS = ", ".join(
    f"CAST(h{i} / n_bytes AS FLOAT) AS f{i}" for i in range(8)
)

_FEATURES_ORACLE = f"""
    WITH b AS (
        SELECT doc_id, strlen(text) AS n,
               ord(substring(text, CAST(j + 1 AS INT), 1)) AS byte
        FROM documents, unnest(range(strlen(text))) AS t(j)
    ),
    s AS (
        SELECT doc_id,
           CAST(max(n) AS BIGINT) AS n_bytes,
           CAST(sum(byte) AS DOUBLE) AS sm,
           CAST(sum(byte * byte) AS DOUBLE) AS sq,
           {_FEATURE_BINS}
        FROM b GROUP BY doc_id
    )
    SELECT doc_id, n_bytes,
           sm / n_bytes AS byte_mean,
           sqrt(greatest(sq / n_bytes - (sm / n_bytes) * (sm / n_bytes), 0.0))
               AS byte_std,
           {_FEATURE_COLS}
    FROM s
    """


@register("multimodal_features", _FEATURES_ORACLE)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over blobs (deterministic byte
    histogram standing in for a real image/audio decoder — see
    operators/multimodal.py). The feature vector is flattened to scalar
    columns for the driver's row hashing.

    Oracle parity: the testdata text is pure ASCII (strlen == byte
    length, ord == byte value), so the per-byte unnest reproduces the
    blob bytes exactly, and mean/std/histogram all derive from exact
    integer sums through the same f64 expression tree the operator
    evaluates (see extract_features) — bit-identical, hash-checkable."""
    res = extract_features(_blobs(spark, sf_dir), "doc_id", "blob")
    return res.select(
        "doc_id", "n_bytes", "byte_mean", "byte_std",
        *[F.col("features")[i].alias(f"f{i}") for i in range(8)],
    )


@register(
    "multimodal_frame_sample",
    """
    WITH t AS (SELECT doc_id, encode(text) AS blob FROM documents),
    m AS (
        SELECT doc_id, blob,
               CAST(octet_length(blob) // 16 AS BIGINT) AS total
        FROM t
    ),
    s AS (
        SELECT doc_id, blob, total, LEAST(4, total) AS n_eff
        FROM m WHERE total > 0
    ),
    f AS (
        SELECT doc_id, blob, total, n_eff,
               unnest(range(n_eff)) AS j
        FROM s
    )
    SELECT doc_id,
           CAST(j AS INT) AS sample_idx,
           CAST((j * total) // n_eff AS INT) AS frame_idx,
           CAST(((j * total) // n_eff) * 1000 // 25 AS BIGINT) AS ts_ms,
           substring(hex(blob),
                     CAST(((j * total) // n_eff) * 32 + 1 AS INT),
                     32) AS frame_hex
    FROM f
    """,
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform frame sampling over fixed-size-frame blobs — selection is
    pure JVM Column exprs (sequence/explode/substring); the oracle
    slices the same bytes with substring in SQL. Frames are reported as
    hex strings (the driver hash-compare can't sort raw binary)."""
    from ..operators.multimodal import frame_sample

    res = frame_sample(
        _blobs(spark, sf_dir), "doc_id", "blob",
        n_frames=4, frame_bytes=16, fps=25,
    )
    return res.select(
        "doc_id", "sample_idx", "frame_idx", "ts_ms",
        F.hex("frame").alias("frame_hex"),
    )
