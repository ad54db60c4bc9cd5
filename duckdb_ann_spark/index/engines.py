"""Engine abstraction: build / search over an artifact directory.

Each engine turns (id, vec) DataFrames into an on-disk artifact at build
time and answers batch queries with a (query_idx, id, _distance)
DataFrame at search time. Tombstone filtering, row fetch, and catalog
bookkeeping live in `api.py` — engines only rank vectors.
"""

from __future__ import annotations

from typing import Protocol, Sequence

from pyspark.sql import DataFrame, SparkSession


class Engine(Protocol):
    name: str

    def build(
        self,
        spark: SparkSession,
        df: DataFrame,
        id_col: str,
        vec_col: str,
        artifact_dir: str,
        params,
        dim: int,
    ) -> dict:
        """Write the artifact; return engine-specific manifest fields."""
        ...

    def search(
        self,
        spark: SparkSession,
        manifest: dict,
        artifact_dir: str,
        queries: Sequence[Sequence[float]],
        k: int,
        search_complexity: int | None = None,
    ) -> DataFrame:
        """→ DataFrame(query_idx int, <id_col> long, _distance double)."""
        ...


_ENGINES: dict[tuple[str, str], Engine] = {}


def register_engine(engine: str, subtype: str, impl: Engine) -> None:
    _ENGINES[(engine.lower(), subtype.lower())] = impl


def get_engine(engine: str, subtype: str) -> Engine:
    key = (engine.lower(), subtype.lower())
    if key not in _ENGINES:
        raise NotImplementedError(
            f"ANN engine '{engine}' type '{subtype}' is not implemented"
        )
    return _ENGINES[key]
