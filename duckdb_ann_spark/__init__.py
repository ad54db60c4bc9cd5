"""duckdb_ann_spark — a PySpark-native ANN + data-pipeline analytics engine.

Re-expresses the query surface of the `decisiongraph/duckdb-ann` DuckDB
extension (DiskANN/Vamana + FAISS vector indexes, exact & approximate top-k
search, batch/table search, hybrid BM25+vector search, index lifecycle and
diagnostics) as an idiomatic Spark DataFrame library, plus the large-scale
training-data pipeline operators (dedup, similarity search, text analysis,
multimodal columns) such an engine needs at 100 TB.

Design stance: DataFrame-declarative first (Catalyst optimizes), numpy inside
Arrow-batched UDFs only where built-ins can't express the semantics (graph ANN
search), never row-at-a-time Python.
"""

from .session import get_spark
from .functions.distance import (
    array_cosine_similarity,
    array_distance,
    array_inner_product,
    cosine_distance,
    cosine_similarity,
    index_distance,
    inner_product,
    l2sq_distance,
    list_cosine_similarity,
    list_distance,
    list_inner_product,
    neg_inner_product,
)
from .operators.topk import topk, vector_distances

__version__ = "0.1.0"
