"""Declarative pipeline-spec API — the user-extension surface.

The reference's user extension point is TPL: user-writable programs over the
engine's operators (77 samples under /root/reference/sample_tpl/, run by
util/execution/tpl.cpp; CREATE FUNCTION exists only as parse/plan nodes with
no execution path).  Our analog: a JSON-able spec interpreted into a composed
``ray.data.Dataset`` pipeline over the same operator layer users could call
directly — useful for config-driven pipelines and for shipping query plans
to a cluster without shipping code.

Spec shape::

    {"scan": {"table": "orders", "columns": [...], }        # required
     "ops": [
       {"op": "filter",  "expr": EXPR},                     # boolean EXPR
       {"op": "compute", "alias": "x", "expr": EXPR},       # add/replace col
       {"op": "project", "columns": [...]},
       {"op": "join", "right": SPEC, "on": [...], "right_on": [...],
        "how": "inner|left_outer|...", "broadcast": false},
       {"op": "group_agg", "keys": [...],
        "aggs": [["sum"|"count"|"min"|"max"|"mean", col, alias], ...]},
       {"op": "window", "partition_by": [...], "order_by": [...],
        "specs": [[kind, col|null, alias], ...]},
       {"op": "sort", "keys": [...], "descending": bool, "limit": N},
       {"op": "sample", "key": col, "permil": N},          # deterministic
       {"op": "unpivot", "id_cols": [...], "value_cols": [...]},
       {"op": "rollup", "keys": [...], "aggs": [[op, col, alias], ...]},
     ]}

EXPR is a tree: ``{"col": name}`` | ``{"lit": value}`` |
``{"fn": pyarrow-compute-name, "args": [EXPR, ...]}`` — e.g.
``{"fn": "greater", "args": [{"col": "o_totalprice"}, {"lit": 100.0}]}``.
Only ``pyarrow.compute`` kernels are reachable: the spec stays declarative,
vectorized, and safe (no eval of user code strings).
"""

from __future__ import annotations

from typing import Any, Mapping

import pyarrow as pa
import pyarrow.compute as pc

from terrier_ray.ops.relational import (
    broadcast_join,
    filter_batches,
    grouped_aggregate,
    partitioned_join,
    project,
    read_table,
    sort_limit,
    with_columns,
)
from terrier_ray.ops.window import windowed


def _compile_expr(e: Mapping[str, Any]):
    """EXPR tree → fn(pa.Table) -> pa.Array, resolving pc kernels by name."""
    if "col" in e:
        name = e["col"]
        return lambda b: b.column(name)
    if "lit" in e:
        v = e["lit"]
        return lambda b: v
    if "fn" in e:
        fn_name = e["fn"]
        if not hasattr(pc, fn_name):
            raise ValueError(f"unknown pyarrow.compute kernel {fn_name!r}")
        kernel = getattr(pc, fn_name)
        arg_fns = [_compile_expr(a) for a in e.get("args", [])]
        opts = e.get("options", {})
        return lambda b: kernel(*(f(b) for f in arg_fns), **opts)
    raise ValueError(f"bad expr node: {e!r}")


def build(spec: Mapping[str, Any], sf_dir: str):
    """Interpret ``spec`` into a (lazy) ``ray.data.Dataset``."""
    scan = spec["scan"]
    ds = read_table(sf_dir, scan["table"], columns=scan.get("columns"))
    for op in spec.get("ops", []):
        kind = op["op"]
        if kind == "filter":
            mask_fn = _compile_expr(op["expr"])
            ds = filter_batches(ds, mask_fn)
        elif kind == "compute":
            ds = with_columns(ds, {op["alias"]: _compile_expr(op["expr"])})
        elif kind == "project":
            ds = project(ds, op["columns"])
        elif kind == "join":
            right_spec = op["right"]
            how = op.get("how", "inner")
            if op.get("broadcast"):
                import pyarrow.parquet as pq

                rscan = right_spec["scan"]
                if right_spec.get("ops"):
                    raise ValueError("broadcast right side must be a bare scan")
                small = pq.read_table(
                    f"{sf_dir.rstrip('/')}/{rscan['table']}.parquet",
                    columns=rscan.get("columns"),
                )
                arrow_how = {"inner": "inner", "left_outer": "left outer"}[how]
                ds = broadcast_join(
                    ds, small, keys=op["on"],
                    right_keys=op.get("right_on"), join_type=arrow_how,
                )
            else:
                ds = partitioned_join(
                    ds,
                    build(right_spec, sf_dir),
                    on=op["on"],
                    right_on=op.get("right_on"),
                    join_type=how,
                    num_partitions=op.get("num_partitions", 16),
                )
        elif kind == "group_agg":
            ds = grouped_aggregate(
                ds, op["keys"], [tuple(a) for a in op["aggs"]]
            )
        elif kind == "window":
            ds = windowed(
                ds,
                op["partition_by"],
                op["order_by"],
                [tuple(s) for s in op["specs"]],
                num_partitions=op.get("num_partitions", 32),
                descending=op.get("descending", False),
            )
        elif kind == "sort":
            ds = sort_limit(
                ds, op["keys"],
                descending=op.get("descending", False), limit=op.get("limit"),
            )
        elif kind == "sample":
            from terrier_ray.ops.sample import bernoulli_sample

            ds = bernoulli_sample(ds, op["key"], op["permil"])
        elif kind == "unpivot":
            from terrier_ray.ops.relational import unpivot

            ds = unpivot(
                ds,
                op["id_cols"],
                op["value_cols"],
                op.get("name_col", "name"),
                op.get("value_col", "value"),
            )
        elif kind == "rollup":
            from terrier_ray.ops.relational import rollup_aggregate

            ds = rollup_aggregate(
                ds, op["keys"], [tuple(a) for a in op["aggs"]]
            )
        else:
            raise ValueError(f"unknown op {kind!r}")
    return ds


def explain(spec: Mapping[str, Any], indent: str = "") -> str:
    """Textual plan of the spec (static; no execution)."""
    scan = spec["scan"]
    lines = [f"{indent}Scan {scan['table']} cols={scan.get('columns') or '*'}"]
    for op in spec.get("ops", []):
        kind = op["op"]
        if kind == "join":
            side = "broadcast" if op.get("broadcast") else "shuffle-cogroup"
            lines.append(
                f"{indent}Join[{op.get('how', 'inner')},{side}] on={op['on']}"
            )
            lines.append(explain(op["right"], indent + "    "))
        elif kind == "group_agg":
            lines.append(
                f"{indent}GroupAgg keys={op['keys']} aggs={op['aggs']} (map-side partials)"
            )
        elif kind == "window":
            lines.append(
                f"{indent}Window part={op['partition_by']} specs={[s[0] for s in op['specs']]}"
            )
        elif kind == "sort":
            lines.append(
                f"{indent}Sort keys={op['keys']} limit={op.get('limit')}"
            )
        else:
            lines.append(f"{indent}{kind.capitalize()}")
    return "\n".join(lines)
