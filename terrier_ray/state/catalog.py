"""Catalog: a manifest of logical tables (the DDL/pg_catalog analog).

Reference: CREATE/DROP database/namespace/table/index execute directly
against the catalog (/root/reference/src/execution/sql/ddl_executors.cpp:24-140;
catalogs under src/catalog/postgres/).  For an immutable batch engine the
catalog is a small JSON manifest mapping table names to parquet locations +
schemas + snapshot versions; tables are registered/dropped, and data changes
go through snapshot versioning (append / rewrite) in snapshots.py.
"""

from __future__ import annotations

import glob
import json
import os
import time
from typing import Any

import pyarrow.parquet as pq


class Catalog:
    """File-backed table catalog: {name → {path, schema, version, created}}."""

    def __init__(self, root: str):
        self.root = root
        self._path = os.path.join(root, "catalog.json")
        os.makedirs(root, exist_ok=True)
        self._tables: dict[str, dict[str, Any]] = {}
        self._layouts: dict[str, dict[str, Any]] = {}
        if os.path.exists(self._path):
            with open(self._path) as f:
                raw = json.load(f)
            if "tables" in raw and "layouts" in raw:  # v2 manifest
                self._tables = raw["tables"]
                self._layouts = raw["layouts"]
            else:  # legacy flat manifest (tables only)
                self._tables = raw

    def _save(self) -> None:
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"tables": self._tables, "layouts": self._layouts},
                      f, indent=1)
        os.replace(tmp, self._path)

    def create_table(self, name: str, path: str) -> dict[str, Any]:
        """Register a parquet file/dir as a logical table (CREATE TABLE)."""
        if name in self._tables:
            raise ValueError(f"table exists: {name}")
        files = (
            [path]
            if path.endswith(".parquet")
            else sorted(glob.glob(os.path.join(path, "*.parquet")))
        )
        if not files:
            raise FileNotFoundError(f"no parquet at {path}")
        schema = pq.read_schema(files[0])
        entry = {
            "path": path,
            "schema": {n: str(t) for n, t in zip(schema.names, schema.types)},
            "version": 1,
            "created_at": time.time(),
        }
        self._tables[name] = entry
        self._save()
        return entry

    def drop_table(self, name: str) -> None:
        if name not in self._tables:
            raise KeyError(name)
        del self._tables[name]
        self._save()

    def describe(self, name: str) -> dict[str, Any]:
        return dict(self._tables[name])

    def list_tables(self) -> list[str]:
        return sorted(self._tables)

    def scan(self, name: str, **kwargs):
        """SeqScan through the catalog (read_parquet on the registered path)."""
        import ray.data as rd

        return rd.read_parquet(self._tables[name]["path"], **kwargs)

    def bump_version(self, name: str, new_path: str | None = None) -> int:
        e = self._tables[name]
        e["version"] += 1
        if new_path:
            e["path"] = new_path
        self._save()
        return e["version"]

    # -- derived physical layouts (state/layouts.py builds them; the
    # -- catalog links each to its source table's snapshot version so DML
    # -- invalidates it — the insert/update_translator index-maintenance
    # -- analog for an immutable engine)

    def register_layout(self, table: str, kind: str, path: str) -> dict:
        """Record a derived layout (clustered copy, IVF cells, index dir)
        of ``table``, pinned to the table's CURRENT snapshot version."""
        e = self._tables[table]  # KeyError if unknown — layouts need a source
        entry = {
            "table": table,
            "kind": kind,
            "path": path,
            "source_version": e["version"],
            "created_at": time.time(),
        }
        self._layouts[f"{table}:{kind}"] = entry
        self._save()
        return entry

    def layout_current(self, table: str, kind: str) -> bool:
        """True iff a layout exists for (table, kind) AND the table's
        snapshot version has not moved since it was built — a stale layout
        must be rebuilt, never served."""
        ent = self._layouts.get(f"{table}:{kind}")
        if ent is None or table not in self._tables:
            return False
        return ent["source_version"] == self._tables[table]["version"]

    def list_layouts(self) -> list[str]:
        return sorted(self._layouts)
