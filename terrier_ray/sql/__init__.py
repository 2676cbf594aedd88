"""SQL front-end: text → AST → spec → optimized spec → Ray Data pipeline.

The reference's primary entry point is SQL over the wire —
parser::PostgresParser (/root/reference/src/parser/postgresparser.cpp) →
binder → optimizer → plan, dispatched by traffic_cop
(/root/reference/src/traffic_cop/traffic_cop.cpp:323-379).  This package is
that path re-expressed over the declarative spec API: ``sql()`` takes an
ANSI SELECT (the subset in parser.py), lowers it onto ``terrier_ray.api``
spec verbs with DuckDB-identical value semantics (see lower.py docstring),
runs the rewrite pass (rewrite.py — push-down, pruning, join strategy),
and builds a lazy ``ray.data.Dataset``.
"""

from __future__ import annotations

from typing import Any, Mapping

from terrier_ray.sql.lower import Catalog, lower
from terrier_ray.sql.parser import parse
from terrier_ray.sql.rewrite import optimize


def plan(query: str, sf_dir: str, optimized: bool = True) -> Mapping[str, Any]:
    """SQL text → executable spec (optimized unless ``optimized=False``)."""
    catalog = Catalog(sf_dir)
    spec = dict(lower(parse(query), catalog))
    if catalog.views:
        spec["views"] = catalog.views  # CTE / derived-table plans by name
    return optimize(spec, sf_dir) if optimized else spec


def sql(query: str, sf_dir: str, optimized: bool = True):
    """Execute a SELECT over the sf_dir parquet tables → lazy Dataset."""
    from terrier_ray.api import build

    return build(plan(query, sf_dir, optimized=optimized), sf_dir)


def explain(query: str, sf_dir: str, optimized: bool = True) -> str:
    """Textual plan for a SQL query (no execution)."""
    from terrier_ray.api import explain as _explain

    return _explain(plan(query, sf_dir, optimized=optimized))


__all__ = ["sql", "plan", "explain", "parse", "lower", "optimize", "Catalog"]
