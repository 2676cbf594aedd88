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

#: SQL function names lower.py resolves BEFORE consulting this registry
#: (scalar builtins in Lowerer._lower_fn plus the aggregate/window names
#: handled at statement level) — a UDF shadowing one would be silently
#: unreachable from SQL, so ``register_function`` rejects the collision
#: (the reference's pg_proc similarly namespaces builtins; ADVICE r4).
_SQL_BUILTINS = frozenset(
    n.lower()
    for n in (
        "UPPER LOWER LENGTH SUBSTR SUBSTRING CONCAT YEAR MONTH DAY HOUR "
        "MINUTE SECOND MILLISECOND MICROSECOND DATE_TRUNC ROUND ABS SIN COS "
        "TAN ASIN ACOS ATAN ATAN2 EXP LN LOG10 LOG2 SQRT FLOOR CEIL CEILING "
        "TRUNC SIGN POWER TRIM LTRIM RTRIM REVERSE COT COALESCE NULLIF "
        "COUNT SUM MIN MAX AVG STDDEV STDDEV_SAMP VAR_SAMP VARIANCE "
        "PERCENTILE_CONT PERCENTILE_DISC ROW_NUMBER RANK DENSE_RANK NTILE "
        "LAG LEAD FIRST_VALUE LAST_VALUE"
    ).split()
)


def register_function(name: str, fn: Callable) -> None:
    """Register (or replace) a scalar UDF usable from SQL as ``name(...)``.

    ``fn`` receives one positional argument per SQL argument — each a
    ``pa.Array``/``pa.ChunkedArray`` (or Python scalar for literal args) —
    and must return an array of the batch's length.  Names of built-in SQL
    functions are rejected: the lowering checks builtins first, so such a
    UDF could never be reached."""
    if not callable(fn):
        raise TypeError(f"UDF {name!r} must be callable")
    if name.lower() in _SQL_BUILTINS:
        raise ValueError(
            f"UDF name {name!r} shadows a built-in SQL function and would "
            "be unreachable (builtins resolve first); pick another name"
        )
    _REGISTRY[name.lower()] = fn


def drop_function(name: str) -> None:
    """DROP FUNCTION analog (missing name is a no-op, like IF EXISTS)."""
    _REGISTRY.pop(name.lower(), None)


def lookup(name: str) -> Optional[Callable]:
    return _REGISTRY.get(name.lower())
