"""Spec rewrite pass — the optimizer analog.

Reference analog: the rewrite rules in
/root/reference/src/include/optimizer/rule.h:16-79 (predicate push-down
through joins, filter-into-scan, projection pruning) and the cost-based
broadcast-vs-shuffle join choice the reference's cascades optimizer makes
from table stats (src/optimizer/statistics).  Ours operates on the
declarative spec JSON (terrier_ray/api.py) so it benefits both the SQL
front-end and hand-written specs:

1. **Filter push-down.**  A ``filter`` op in the pre-aggregation region
   whose columns all belong to one base table is moved into that table's
   scan — as a pyarrow row-group predicate when the expression is in the
   pushable subset (``api.compile_scan_filter``), else as a batch filter
   right after the scan.  Outer-join safety: filters only pass ``inner``
   joins, and only push INTO a join's right side when that join is
   ``inner`` (a WHERE on the nullable side of LEFT JOIN does not commute).
2. **Projection pruning.**  When the spec ends in a ``project``, every
   scan's ``columns`` is set to the referenced subset — at 100 TB the
   difference between shipping 16 lineitem columns and 4 out of storage.
3. **Join strategy.**  A join whose right side is a bare scan small enough
   to fit in the object store (compressed bytes from the parquet footer,
   post-pruning) becomes a broadcast join: ``ray.put`` once, Acero
   hash-join per batch, no shuffle.  Larger sides keep the cogroup
   hash-shuffle.

``optimize`` never changes results — only where work happens.  Tests
assert plan shape AND value-identity against the naive spec.
"""

from __future__ import annotations

import copy
from typing import Any, Mapping, Optional

from terrier_ray.api import compile_scan_filter

#: spec ops after which a filter is a HAVING / post-shape filter — never
#: moved (aggregates, windows, sorts and row-slices change row identity)
_BARRIERS = {
    "group_agg", "global_agg", "window", "sort", "limit", "distinct",
    "rollup", "cube", "unpivot", "sample", "quantile",
}

#: compressed build-side bytes below which a join broadcasts; one object
#: store copy per node at cluster scale, zero shuffle
DEFAULT_BROADCAST_MAX_BYTES = 64 << 20


def _expr_cols(e: Mapping[str, Any], out: set[str]) -> None:
    if "col" in e:
        out.add(e["col"])
    for a in e.get("args", []):
        _expr_cols(a, out)


def _schema_cols(sf_dir: str, table: str) -> list[str]:
    from terrier_ray.sources.io import hashable_schema

    s = hashable_schema(f"{sf_dir.rstrip('/')}/{table}.parquet")
    return list(s.names) if s is not None else []


def _table_bytes(sf_dir: str, table: str, columns: Optional[list[str]]) -> int:
    """Compressed on-disk bytes of ``columns`` (all if None), from footers."""
    import glob
    import os

    import pyarrow.parquet as pq

    path = f"{sf_dir.rstrip('/')}/{table}.parquet"
    files = (
        sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        if os.path.isdir(path)
        else [path]
    )
    total = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                if columns is None or c.path_in_schema.split(".")[0] in columns:
                    total += c.total_compressed_size
    return total


def _and_expr(a: Optional[Mapping[str, Any]], b: Mapping[str, Any]):
    return b if a is None else {"fn": "and_kleene", "args": [a, b]}


def optimize(
    spec: Mapping[str, Any],
    sf_dir: str,
    broadcast_max_bytes: int = DEFAULT_BROADCAST_MAX_BYTES,
) -> dict[str, Any]:
    """Naive spec → pushed/pruned/strategy-chosen spec (results unchanged)."""
    spec = copy.deepcopy(dict(spec))
    views = spec.pop("views", None)
    if views:
        # each view (CTE / derived table) is an independent plan
        views = {
            n: optimize(v, sf_dir, broadcast_max_bytes)
            for n, v in views.items()
        }
    if "setop" in spec:
        # set-op root: each branch is an independent plan; the outer ops
        # (sort/limit on the combined result) have nothing to push
        node = spec["setop"]
        node["left"] = optimize(node["left"], sf_dir, broadcast_max_bytes)
        node["right"] = optimize(node["right"], sf_dir, broadcast_max_bytes)
        if views:
            spec["views"] = views
        return spec
    # join right sides and embedded scalar-subquery plans optimize as
    # independent specs FIRST — a right side whose own filter folded into
    # its scan becomes a bare scan the outer passes can push into /
    # broadcast
    for op in spec.get("ops", []):
        if op["op"] in ("join", "cross_join"):
            op["right"] = optimize(op["right"], sf_dir, broadcast_max_bytes)
        if "expr" in op:
            _optimize_scalars(op["expr"], sf_dir, broadcast_max_bytes)
    _push_filters(spec, sf_dir)
    _prune_columns(spec, sf_dir)
    _choose_joins(spec, sf_dir, broadcast_max_bytes)
    if views:
        spec["views"] = views
    return spec


def _optimize_scalars(
    e: dict[str, Any], sf_dir: str, broadcast_max_bytes: int
) -> None:
    if "scalar_subquery" in e:
        e["scalar_subquery"] = optimize(
            e["scalar_subquery"], sf_dir, broadcast_max_bytes
        )
    for a in e.get("args", []):
        _optimize_scalars(a, sf_dir, broadcast_max_bytes)


# ---------------------------------------------------------------------------
# 1. filter push-down
# ---------------------------------------------------------------------------


def _push_filters(spec: dict[str, Any], sf_dir: str) -> None:
    ops = spec.get("ops", [])
    root_is_table = "table" in spec["scan"]
    # view roots accept no scan filters (build ignores them) — push nothing
    root_cols = (
        set(_schema_cols(sf_dir, spec["scan"]["table"]))
        if root_is_table
        else set()
    )

    # join index → (right table, its columns); only bare-scan right sides
    joins: list[dict[str, Any]] = []
    defined: set[str] = set()  # compute aliases defined so far
    kept: list[dict[str, Any]] = []
    pre_join_filters: list[dict[str, Any]] = []  # root-owned, moved to front
    barrier_seen = False

    for op in ops:
        kind = op["op"]
        if kind in _BARRIERS:
            barrier_seen = True
        if kind == "compute":
            defined.add(op["alias"])
            kept.append(op)
            continue
        if kind == "join":
            joins.append(op)
            kept.append(op)
            continue
        if kind != "filter" or barrier_seen:
            kept.append(op)
            continue

        cols: set[str] = set()
        _expr_cols(op["expr"], cols)
        if cols & defined:
            kept.append(op)  # depends on a computed column; stays put
            continue
        all_inner = all(j.get("how", "inner") == "inner" for j in joins)

        if root_is_table and cols and cols <= root_cols and \
                (not joins or all_inner or _passes_left(joins)):
            _absorb(spec["scan"], op, pre_join_filters)
            continue

        owner = None
        for j in joins:
            right = j["right"]
            if right.get("ops") or "table" not in right["scan"]:
                continue
            rcols = set(_schema_cols(sf_dir, right["scan"]["table"]))
            # right key columns are coalesced away post-join; a filter that
            # references them was rebound via compute and already skipped
            if cols <= rcols and j.get("how", "inner") == "inner" and all_inner:
                owner = j
                break
        if owner is not None:
            right_ops: list[dict[str, Any]] = owner["right"].setdefault("ops", [])
            _absorb(owner["right"]["scan"], op, right_ops)
            continue
        kept.append(op)

    spec["ops"] = pre_join_filters + kept


def _passes_left(joins: list[dict[str, Any]]) -> bool:
    """Root-owned filters commute with inner and left_outer joins."""
    return all(j.get("how", "inner") in ("inner", "left_outer") for j in joins)


def _absorb(
    scan: dict[str, Any],
    filt: dict[str, Any],
    residual: list[dict[str, Any]],
) -> None:
    """Attach a filter to ``scan`` (pushable subset) or to ``residual``."""
    if compile_scan_filter(filt["expr"]) is not None:
        scan["filter"] = _and_expr(scan.get("filter"), filt["expr"])
    else:
        residual.append(filt)


# ---------------------------------------------------------------------------
# 2. projection pruning
# ---------------------------------------------------------------------------


def _collect_refs(spec: Mapping[str, Any], out: set[str]) -> None:
    scan = spec.get("scan", {})
    if scan.get("filter"):
        _expr_cols(scan["filter"], out)
    for op in spec.get("ops", []):
        kind = op["op"]
        if kind in ("filter",):
            _expr_cols(op["expr"], out)
        elif kind == "compute":
            _expr_cols(op["expr"], out)
        elif kind == "join":
            out.update(op["on"])
            out.update(op.get("right_on") or op["on"])
            _collect_refs(op["right"], out)
        elif kind == "cross_join":
            _collect_refs(op["right"], out)
        elif kind in ("group_agg", "rollup", "cube"):
            out.update(op.get("keys", []))
            out.update(a[1] for a in op["aggs"])
        elif kind == "quantile":
            out.update(op.get("keys", []))
            out.update(s_[1] for s_ in op["specs"])
        elif kind == "global_agg":
            out.update(a[1] for a in op["aggs"])
        elif kind == "window":
            out.update(op["partition_by"])
            out.update(op["order_by"])
            out.update(s[1] for s in op["specs"] if s[1])
        elif kind == "sort":
            out.update(op["keys"])
        elif kind == "distinct":
            out.update(op["columns"])
        elif kind == "project":
            out.update(op["columns"])
        elif kind == "rename":
            # renamed scans read every source column (conservative: the
            # prefixed targets are what downstream references)
            out.update(op["map"].keys())
        elif kind == "sample":
            out.add(op["key"])
        elif kind == "unpivot":
            out.update(op["id_cols"])
            out.update(op["value_cols"])


def _prune_columns(spec: dict[str, Any], sf_dir: str) -> None:
    ops = spec.get("ops", [])
    if not ops or ops[-1]["op"] != "project":
        return  # SELECT * — output needs every column
    refs: set[str] = set()
    _collect_refs(spec, refs)
    _apply_prune(spec, sf_dir, refs)


def _apply_prune(spec: dict[str, Any], sf_dir: str, refs: set[str]) -> None:
    scan = spec["scan"]
    if "table" in scan and not scan.get("columns"):
        schema_cols = _schema_cols(sf_dir, scan["table"])
        need = [c for c in schema_cols if c in refs]
        if need and len(need) < len(schema_cols):
            scan["columns"] = need
    for op in spec.get("ops", []):
        if op["op"] == "join":
            _apply_prune(op["right"], sf_dir, refs)


# ---------------------------------------------------------------------------
# 3. join strategy
# ---------------------------------------------------------------------------


def _choose_joins(
    spec: dict[str, Any], sf_dir: str, broadcast_max_bytes: int
) -> None:
    for op in spec.get("ops", []):
        if op["op"] != "join":
            continue
        right = op["right"]
        _choose_joins(right, sf_dir, broadcast_max_bytes)
        if op.get("broadcast"):
            continue
        if any(o["op"] != "rename" for o in right.get("ops", [])):
            continue  # residual right-side batch ops: keep the shuffle join
        if op.get("how", "inner") not in ("inner", "left_outer"):
            continue
        rscan = right["scan"]
        if "table" not in rscan:
            continue  # view right sides keep the shuffle join
        size = _table_bytes(sf_dir, rscan["table"], rscan.get("columns"))
        if size <= broadcast_max_bytes:
            op["broadcast"] = True
