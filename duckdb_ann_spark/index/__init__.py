"""ANN index subsystem: build, catalog, search, lifecycle.

Public API (mirrors the reference extension's SQL surface, SURVEY §2.1-2.2):

* :func:`create_index` — `CREATE INDEX ... USING DISKANN/FAISS (col) WITH (...)`
* :func:`ann_search` — single-query search + row fetch
* :func:`index_scan` — low-level (id, distance) scan
  (`diskann_index_scan` / `faiss_index_scan`)
* :func:`ann_search_batch_indexed` — batch search through an index
* :func:`index_search_table` — DataFrame-queries search (unbounded query
  side, no driver collect; the scale path past `ann_search_table`)
* :func:`ann_list` / :func:`ann_index_info` — catalog diagnostics
* :func:`delete_from_index` / :func:`vacuum_index` / :func:`merge_indexes` /
  :func:`drop_index` — DML lifecycle
"""

from .api import (  # noqa: F401
    ann_index_info,
    ann_list,
    ann_search,
    ann_search_batch_indexed,
    create_index,
    delete_from_index,
    drop_index,
    faiss_gpu_info,
    index_scan,
    index_search_table,
    insert_into_index,
    merge_indexes,
    recalibrate_index,
    vacuum_index,
)
from .catalog import Catalog  # noqa: F401
from .params import DiskannParams, FaissParams  # noqa: F401
from .streaming_build import diskann_streaming_build  # noqa: F401
