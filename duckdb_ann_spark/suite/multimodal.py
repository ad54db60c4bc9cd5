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


@register("multimodal_features")  # mapInPandas + stubbed decoder: rows-only
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over blobs (deterministic byte
    histogram standing in for a real image/audio decoder — see
    operators/multimodal.py). The feature vector is flattened to scalar
    columns for the driver's row hashing."""
    res = extract_features(_blobs(spark, sf_dir), "doc_id", "blob")
    return res.select(
        "doc_id", "n_bytes", "byte_mean", "byte_std",
        *[F.col("features")[i].alias(f"f{i}") for i in range(8)],
    )
