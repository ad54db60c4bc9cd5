"""Index catalog: a directory of artifact dirs with JSON manifests.

The reference stores indexes as DuckDB catalog entries inside the .duckdb
file (`src/diskann_index.cpp:261-299`); our distributed equivalent is a
filesystem catalog — each index is a directory

    <root>/<name>/
        manifest.json        (engine, table, column, params, stats)
        vectors/             (Flat/IVF parquet: id + vec, IVF partitioned
                              by cell; Vamana keeps vectors inside its
                              graph/ shard files instead)
        deleted/             (parquet: tombstoned ids, optional)
        graph/               (engine-specific: .diskann shards, centroids)

`manifest.json` is the committed state: readers treat a directory without
a manifest as nonexistent, and creation writes the manifest last (after
all data files), giving create/drop crash consistency without needing a
transaction log. On a real cluster <root> lives on shared storage
(HDFS/S3/DBFS via the executors' filesystem); locally it's a temp dir.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

MANIFEST = "manifest.json"
DEFAULT_ROOT_ENV = "SPARK_ANN_INDEX_ROOT"


class Catalog:
    def __init__(self, root: str | None = None):
        self.root = root or os.environ.get(DEFAULT_ROOT_ENV) or os.path.join(
            tempfile.gettempdir(), "duckdb_ann_spark_indexes"
        )
        os.makedirs(self.root, exist_ok=True)

    # -- paths ---------------------------------------------------------
    def path(self, name: str) -> str:
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"Invalid index name '{name}'")
        return os.path.join(self.root, name)

    def manifest_path(self, name: str) -> str:
        return os.path.join(self.path(name), MANIFEST)

    # -- lifecycle -----------------------------------------------------
    def exists(self, name: str) -> bool:
        return os.path.exists(self.manifest_path(name))

    def begin_create(self, name: str, if_not_exists: bool = False) -> str:
        """Reserve the artifact dir. Returns the dir, or '' when the index
        exists and if_not_exists is set."""
        if self.exists(name):
            if if_not_exists:
                return ""
            # reference wording: src/diskann_index.cpp:268
            raise ValueError(f'Index with name "{name}" already exists!')
        d = self.path(name)
        if os.path.exists(d):  # stale partial build — clear it
            shutil.rmtree(d)
        os.makedirs(d)
        return d

    def commit(self, name: str, manifest: dict) -> dict:
        tmp = self.manifest_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, self.manifest_path(name))
        return manifest

    def load(self, name: str, table_name: str | None = None) -> dict:
        if not self.exists(name):
            # reference wording: src/ann_search.cpp:147
            raise ValueError(
                f"ANN index '{name}' not found on table '{table_name or '?'}'"
            )
        with open(self.manifest_path(name)) as f:
            return json.load(f)

    def update(self, name: str, **changes) -> dict:
        m = self.load(name)
        m.update(changes)
        return self.commit(name, m)

    def drop(self, name: str) -> None:
        """CommitDrop semantics (`src/diskann_index.cpp:387-400`): remove
        the artifact and catalog entry."""
        d = self.path(name)
        if os.path.exists(d):
            shutil.rmtree(d)

    def list(self) -> list[dict]:
        out = []
        if not os.path.isdir(self.root):
            return out
        for name in sorted(os.listdir(self.root)):
            if not name or "/" in name or name.startswith("."):
                continue  # stray files (.DS_Store, editor temps) aren't indexes
            if self.exists(name):
                out.append(self.load(name))
        return out
