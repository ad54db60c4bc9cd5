"""Query/oracle registry backing ``__spark_entry__``.

Every implemented operator from SURVEY.md §2 registers here: a Spark
callable ``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a
DuckDB oracle SQL string producing the same rows/columns. The driver
runs both at sf=0.01 and hash-compares values, so:

* alias every computed column identically on both sides;
* keep float expressions bit-deterministic (sequential folds, per-row
  expressions) — see ``duckdb_ann_spark.oracle``;
* for cross-row float aggregation (order-dependent rounding), aggregate
  integers/decimals-as-cents instead.

Approximate operators (Vamana search, MinHash sketches, …) register
without an oracle → the driver records a rows-only check; their real
correctness gates are the recall-floor pytest tests.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None):
    """Decorator registering a driver query (and its DuckDB oracle SQL)."""

    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load()
    return dict(_ORACLES)


_LOADED = False


def _load() -> None:
    """Import every suite module (each registers its queries on import).

    Import order is deliberate: the driver harness records roughly the
    first 50 registered entries, so each operator FAMILY registers before
    any family's long tail — text, streaming, relational, multimodal and
    dedup first (the families that fell past the cap in round 2), then
    the vector/batch/hybrid/index machinery. Total registrations are kept
    under the cap (entries were consolidated in round 3), so order is
    defense-in-depth, not load-bearing."""
    global _LOADED
    if _LOADED:
        return
    from . import text  # noqa: F401
    from . import streaming_suite  # noqa: F401
    from . import relational  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import dedup  # noqa: F401
    from . import corpus_suite  # noqa: F401
    from . import pipeline_suite  # noqa: F401
    from . import hybrid  # noqa: F401  (imports .vector → registers it too)
    from . import batch  # noqa: F401
    from . import index_suite  # noqa: F401

    _LOADED = True
