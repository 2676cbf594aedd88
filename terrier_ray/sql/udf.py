"""Scalar SQL UDF registry — the executable CREATE FUNCTION analog.

The reference parses CREATE FUNCTION and carries a ``pg_proc`` catalog
(parser/create_function_statement.h, catalog/postgres/pg_proc_impl.cpp)
but has NO UDF execution path in the snapshot — no CreateFunction case in
compilation_context.cpp:225-302 or ddl_executors.cpp:24-140 (SURVEY
§2.5).  Like the SETOP plan nodes, this engine makes the parsed-only
surface executable: ``register_function`` binds a name to a VECTORIZED
Python callable (``pa.Array``/``pa.ChunkedArray`` args → array), after
which the name is callable from any SQL expression position.

Scale posture: the lowering emits a ``{"udf": name, "args": [...]}`` node
and ``api._compile_expr`` captures the callable itself at compile time
(driver-side), so the pickled ``map_batches`` closure ships the function
to every Ray worker with the task — no cross-cluster registry
synchronization, and a worker can never see a stale or missing
definition mid-query.  The callable must be vectorized (Arrow/numpy in,
array out); a per-row Python UDF would put a row loop on the hot path.
"""

from __future__ import annotations

from typing import Callable, Optional

_REGISTRY: dict[str, Callable] = {}


def register_function(name: str, fn: Callable) -> None:
    """Register (or replace) a scalar UDF usable from SQL as ``name(...)``.

    ``fn`` receives one positional argument per SQL argument — each a
    ``pa.Array``/``pa.ChunkedArray`` (or Python scalar for literal args) —
    and must return an array of the batch's length."""
    if not callable(fn):
        raise TypeError(f"UDF {name!r} must be callable")
    _REGISTRY[name.lower()] = fn


def drop_function(name: str) -> None:
    """DROP FUNCTION analog (missing name is a no-op, like IF EXISTS)."""
    _REGISTRY.pop(name.lower(), None)


def lookup(name: str) -> Optional[Callable]:
    return _REGISTRY.get(name.lower())
