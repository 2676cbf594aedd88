"""Derived physical layouts — fingerprinted, idempotent, never stale.

A derived layout is a rewritten copy of source data optimized for one
access path (clustered zone-map parquet for point lookups, IVF cell
partitions for ANN, posting buckets for BM25).  The reference maintains
such structures inside DML (insert/update translators touch every index,
src/execution/compiler/operator/insert_translator.cpp); an immutable
batch engine instead FINGERPRINTS the source and rebuilds wholesale when
it changes.  ``ensure_derived_layout`` is the one shared implementation
of that pattern (build_ivf_index pioneered it, similarity.py:363-374):

  - fingerprint = (size, mtime_ns) of every source file + the build params
    + a caller version tag;
  - the manifest is written LAST via os.replace, so a crashed build leaves
    a manifest-less directory that the next call removes wholesale;
  - a fingerprint mismatch (regenerated input, changed params) also
    removes the directory wholesale before rebuilding — a stale layout can
    never serve.

``Catalog.register_layout`` (state/catalog.py) links a layout to its
source table's snapshot version so DML through snapshots.py invalidates
it: ``layout_current`` returns False once the table version moves.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Callable


def _source_fingerprint(sources: "list[str]") -> "list[list]":
    """[[path, bytes, mtime_ns], ...] — JSON-stable (lists, not tuples:
    JSON round-trips tuples into lists, so comparing a loaded manifest
    against a tuple-bearing dict would always mismatch)."""
    out = []
    for p in sorted(sources):
        if os.path.isdir(p):
            files = sorted(
                os.path.join(p, f) for f in os.listdir(p)
                if f.endswith(".parquet")
            )
        else:
            files = [p]
        for f in files:
            st = os.stat(f)
            out.append([f, st.st_size, st.st_mtime_ns])
    return out


def ensure_derived_layout(
    out_dir: str,
    sources: "list[str]",
    params: "dict[str, Any]",
    build: "Callable[[str], None]",
    version: int = 1,
) -> str:
    """Build (or reuse) a derived layout at ``out_dir``.

    ``build(out_dir)`` runs only when the manifest is missing or its
    fingerprint (source files' size+mtime, ``params``, ``version``)
    differs; any existing contents are removed wholesale first.  Returns
    ``out_dir``.  ``params`` must be JSON-serializable with list (not
    tuple) values."""
    meta_path = os.path.join(out_dir, "_layout_meta.json")
    meta = {
        "v": int(version),
        "params": params,
        "sources": _source_fingerprint(sources),
    }
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as f:
                if json.load(f) == meta:
                    return out_dir
        except (json.JSONDecodeError, OSError):
            pass  # unreadable manifest == stale build
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    build(out_dir)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)  # manifest LAST: its presence == complete
    return out_dir
