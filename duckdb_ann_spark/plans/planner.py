"""Python-level planner: the reference's top-k → index-scan rewrite.

The reference hooks DuckDB's optimizer (`src/ann_optimizer.cpp:348-530`)
to rewrite `ORDER BY <distance fn>(col, const) LIMIT k` into an index
scan. Catalyst has no Python hook, so the rewrite lives in this API:
:func:`topk_auto` routes between brute force and an index using the
reference's exact decision gates:

* metric compatibility (`:237-258`): an L2 distance fn only matches an
  L2 index, IP only IP; **cosine never matches** — no engine supports a
  cosine index (`test/sql/faiss_optimizer.test:99-118`);
* cardinality gate (`:460-462`): estimated rows < 50 → brute force
  ("Full scan is cheap");
* selectivity gate (`:464-472`): k > 10% of rows (30% for graph
  indexes — DiskANN/HNSW) → brute force;
* filtered query (`:479-481` + `oversample`, `src/ann_search.cpp:123`):
  a pre-filter bails out of the pure index path — we over-fetch
  `k * oversample` from the index, post-filter, and fall back to brute
  force when the filtered index result comes up short.

`explain=True` returns the routing decision (the EXPLAIN-annotation
analog, `:509-524`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..index.api import DISTANCE_COL, index_scan
from ..index.catalog import Catalog
from ..operators.topk import topk

MIN_ROWS_FOR_INDEX = 50
SELECTIVITY_GATE = 0.10
SELECTIVITY_GATE_GRAPH = 0.30
GRAPH_SUBTYPES = ("vamana", "hnsw")
DEFAULT_OVERSAMPLE = 3  # ann_overfetch_multiplier default (ann_extension.cpp:58)
# a LIMIT-less ORDER BY is rewritten with k=100, the reference's
# "bare ORDER BY" default (src/ann_optimizer.cpp:475,554-557)
DEFAULT_K = 100


@dataclass
class PlanDecision:
    strategy: str  # 'index_scan' | 'brute_force'
    index: Optional[str] = None
    engine: Optional[str] = None
    reason: str = ""
    gates: list[str] = field(default_factory=list)

    def describe(self) -> str:
        if self.strategy == "index_scan":
            return f"ANN_INDEX_SCAN (index: {self.index}, engine: {self.engine})"
        return f"BRUTE_FORCE ({self.reason})"


def _find_index(catalog: Catalog, table_name: str, vec_col: str,
                metric: str) -> Optional[dict]:
    """FindAnnIndex analog (`src/ann_optimizer.cpp:260-345`): a DISKANN or
    FAISS index on this table+column whose metric matches the distance fn."""
    for m in catalog.list():
        if (
            m.get("table_name") == table_name
            and m.get("vec_col") == vec_col
            and m.get("params", {}).get("metric") == metric
        ):
            return m
    return None


def topk_auto(
    df: DataFrame,
    vec_col: str,
    query: Sequence[float],
    k: Optional[int] = None,
    metric: str = "l2",
    id_col: Optional[str] = None,
    table_name: str = "",
    filter: Optional[Column] = None,
    oversample: int = DEFAULT_OVERSAMPLE,
    search_complexity: Optional[int] = None,
    catalog: Optional[Catalog] = None,
    explain: bool = False,
):
    """Top-k nearest rows of `df`, routed through an index when the
    reference's gates allow. Returns the result DataFrame, or
    (DataFrame, PlanDecision) with `explain=True`.

    `k=None` models a LIMIT-less `ORDER BY distance(...)`: the reference
    rewrites it with a default k of 100 (`src/ann_optimizer.cpp:475,
    554-557`)."""
    if k is None:
        k = DEFAULT_K
    cat = catalog or Catalog()
    gates: list[str] = []

    tie_col = id_col

    def brute(reason: str):
        d = df.where(filter) if filter is not None else df
        # tie_col may have been upgraded to the manifest id_col below, so
        # distance ties break identically on both routes (route-dependent
        # tie order would make gate flips look like wrong results)
        res = topk(d, vec_col, query, k, metric, id_col=tie_col)
        dec = PlanDecision("brute_force", reason=reason, gates=gates)
        return (res, dec) if explain else res

    m = metric.lower()
    if m == "cosine":
        # cosine is a recognized metric but no engine can serve it
        gates.append("metric: cosine never matches an index")
        return brute("no cosine indexes exist")

    manifest = _find_index(cat, table_name, vec_col, m)
    if manifest is None:
        gates.append(f"no {m} index on {table_name}.{vec_col}")
        return brute("no metric-compatible index")
    if tie_col is None and manifest["id_col"] in df.columns:
        tie_col = manifest["id_col"]

    n = manifest.get("num_vectors", 0)
    if n < MIN_ROWS_FOR_INDEX:
        gates.append(f"cardinality {n} < {MIN_ROWS_FOR_INDEX}")
        return brute("full scan is cheap")

    graph = manifest.get("subtype") in GRAPH_SUBTYPES
    gate = SELECTIVITY_GATE_GRAPH if graph else SELECTIVITY_GATE
    if n and k > gate * n:
        gates.append(f"k={k} > {int(gate * 100)}% of {n} rows")
        return brute("k too large relative to table")

    spark = df.sparkSession
    fetch_k = k * max(1, oversample) if filter is not None else k
    hits = index_scan(
        spark, manifest["name"], [list(query)], fetch_k, search_complexity, cat,
        table_name,
    ).drop("query_idx")
    id_join = manifest["id_col"]
    out = hits.join(df, on=id_join, how="inner")
    if filter is not None:
        # overfetch may still come up short after filtering → brute force
        # keeps the answer exact (the reference instead refuses to rewrite
        # filtered plans; oversample is its documented escape hatch).
        # localCheckpoint materializes the filtered join ONCE: the
        # sufficiency count and the returned result both read the stored
        # partitions instead of re-running the join (two jobs otherwise).
        out = out.where(filter).localCheckpoint(eager=True)
        # the selectivity gate above guarantees k < gate*n, so k rows is
        # the full sufficiency requirement
        if out.limit(k).count() < k:
            gates.append(f"filtered overfetch {fetch_k} insufficient")
            return brute("filter too selective for index overfetch")
    res = (
        out.orderBy(F.col(DISTANCE_COL).asc_nulls_last(), F.col(id_join).asc())
        .limit(k)
        .select(*df.columns, DISTANCE_COL)
    )
    dec = PlanDecision(
        "index_scan", index=manifest["name"], engine=manifest["engine"],
        gates=gates or ["all gates passed"],
    )
    return (res, dec) if explain else res
