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


_FEATURE_BINS = ",\n           ".join(
    f"CAST(sum(CASE WHEN byte // 32 = {i} THEN 1 ELSE 0 END) AS DOUBLE) AS h{i}"
    for i in range(8)
)
_FEATURE_COLS = ", ".join(
    f"CAST(COALESCE(h{i} / s.n_bytes, 0.0) AS FLOAT) AS f{i}"
    for i in range(8)
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
    SELECT d.doc_id,
           COALESCE(s.n_bytes, 0) AS n_bytes,
           md5(d.text) AS digest,
           COALESCE(sm / s.n_bytes, 0.0) AS byte_mean,
           COALESCE(sqrt(greatest(
               sq / s.n_bytes - (sm / s.n_bytes) * (sm / s.n_bytes), 0.0)),
               0.0) AS byte_std,
           {_FEATURE_COLS}
    -- LEFT JOIN + zero-fill: an empty-text doc has no unnested bytes
    -- (absent from s) but the operator emits a zeros row for it
    FROM documents d LEFT JOIN s USING (doc_id)
    """


@register("multimodal_features", _FEATURES_ORACLE)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over blobs (deterministic byte
    histogram standing in for a real image/audio decoder — see
    operators/multimodal.py), plus the opaque-binary metadata pass
    (byte length + md5 digest; round 5: formerly its own
    multimodal_metadata entry, merged for the registry cap — the
    binary_stats operator is unchanged). The feature vector is
    flattened to scalar columns for the driver's row hashing.

    Oracle parity: the testdata text is pure ASCII (strlen == byte
    length, ord == byte value), so the per-byte unnest reproduces the
    blob bytes exactly, and mean/std/histogram all derive from exact
    integer sums through the same f64 expression tree the operator
    evaluates (see extract_features) — bit-identical, hash-checkable."""
    blobs = _blobs(spark, sf_dir)
    # decoder pinned to the byte-histogram stand-in: the driver oracle
    # must hash-match on machines with AND without PIL installed
    res = extract_features(blobs, "doc_id", "blob", decoder="bytes")
    meta = binary_stats(blobs, "doc_id", "blob").select("doc_id", "digest")
    return res.join(meta, on="doc_id").select(
        "doc_id", "n_bytes", "digest", "byte_mean", "byte_std",
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
