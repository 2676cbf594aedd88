"""ANALYZE analog: per-column statistics over a table.

Reference: the ANALYZE plan node computes per-column count/top-k/histogram
into pg_statistic (/root/reference/src/execution/compiler/operator/
analyze_translator.cpp; planner/plannodes/analyze_plan_node.cpp).  Here:
one streaming pass computing per-column n / n_distinct / min / max (exact
NDV via per-batch value dedup + a small distinct-count shuffle), emitted as
one row per column — the corpus-stats shape BM25 itself needs (avgdl, N).
"""

from __future__ import annotations

import pyarrow as pa


from terrier_ray.ops.relational import distinct, global_aggregate, read_table


def analyze_lineitem(sf_dir: str):
    """Column stats for three lineitem columns, one output row per column."""
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    ds = read_table(sf_dir, "lineitem", columns=cols)
    agg = global_aggregate(
        ds,
        [("count", "l_quantity", "n")]
        + [(op, c, f"{op}_{c}") for c in cols for op in ("min", "max")],
    )
    rows = []
    for c in cols:
        ndv = distinct(read_table(sf_dir, "lineitem", columns=[c]), [c]).count()
        rows.append(
            {
                "column_name": c,
                "n": agg.column("n")[0].as_py(),
                "n_distinct": ndv,
                "min_val": float(agg.column(f"min_{c}")[0].as_py()),
                "max_val": float(agg.column(f"max_{c}")[0].as_py()),
            }
        )
    return pa.Table.from_pylist(rows)


def analyze_table(sf_dir: str, table: str, columns: "list[str] | None" = None):
    """ANALYZE <table>: per-column n / ndv / min / max, one row per column —
    and REGISTER the result with the SQL planner
    (sql.rewrite.register_table_stats), so subsequent plans use exact ndv
    for equality/IN selectivity instead of defaults (the pg_statistic →
    cost-model loop, src/optimizer/statistics/stats_storage.cpp analog)."""
    import pyarrow.parquet as pq

    from terrier_ray.sql.rewrite import register_table_stats

    if columns is None:
        schema = pq.read_schema(f"{sf_dir.rstrip('/')}/{table}.parquet")
        columns = [
            n for n, t in zip(schema.names, schema.types)
            if not (pa.types.is_list(t) or pa.types.is_large_list(t)
                    or pa.types.is_binary(t) or pa.types.is_large_binary(t))
        ]
    ds = read_table(sf_dir, table, columns=columns)
    agg = global_aggregate(
        ds,
        [(op, c, f"{op}_{c}") for c in columns for op in ("min", "max")],
    )
    # n = TABLE row count (the oracle's COUNT(*) — a count over any single
    # column would understate it when that column has nulls)
    n_rows = read_table(sf_dir, table, columns=[columns[0]]).count()
    stats: dict[str, dict] = {}
    rows = []
    for c in columns:
        ndv = distinct(read_table(sf_dir, table, columns=[c]), [c]).count()
        mn = agg.column(f"min_{c}")[0].as_py()
        mx = agg.column(f"max_{c}")[0].as_py()
        stats[c] = {
            "n": n_rows,
            "ndv": ndv,
            "min": mn,
            "max": mx,
        }
        rows.append(
            {
                "column_name": c,
                "n": stats[c]["n"],
                "n_distinct": ndv,
                "min_val": str(mn),
                "max_val": str(mx),
            }
        )
    register_table_stats(sf_dir, table, stats)
    return pa.Table.from_pylist(rows)


SQL = {
    "analyze_lineitem": """
        SELECT 'l_quantity' AS column_name, COUNT(*) AS n,
               COUNT(DISTINCT l_quantity) AS n_distinct,
               CAST(MIN(l_quantity) AS DOUBLE) AS min_val,
               CAST(MAX(l_quantity) AS DOUBLE) AS max_val
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', COUNT(*), COUNT(DISTINCT l_extendedprice),
               MIN(l_extendedprice), MAX(l_extendedprice) FROM lineitem
        UNION ALL
        SELECT 'l_discount', COUNT(*), COUNT(DISTINCT l_discount),
               MIN(l_discount), MAX(l_discount) FROM lineitem
    """,
}

QUERIES = {"analyze_lineitem": analyze_lineitem}
