"""Window-function query suite (DuckDB-oracled) over the orders table.

Covers ROW_NUMBER, running SUM, and LAG via ``ops.window.windowed`` — one
hash shuffle + vectorized segment kernels; see that module's docstring for
the scale contract.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from terrier_ray.ops.relational import (
    filter_batches,
    read_table,
    scaled_int,
    unscale,
    with_columns,
)
from terrier_ray.ops.window import windowed

_ORDER = ["o_orderdate", "o_orderkey"]  # unique per partition → deterministic


def window_order_rank(sf_dir: str):
    """First 3 orders per customer by date: ROW_NUMBER() + filter."""
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    w = windowed(orders, ["o_custkey"], _ORDER, [("row_number", None, "rn")])
    w = filter_batches(w, lambda b: pc.less_equal(b.column("rn"), 3))
    return w.map_batches(
        lambda b: b.select(["o_custkey", "o_orderkey", "rn"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def window_running_spend(sf_dir: str):
    """Per-customer cumulative spend in order-date order (running SUM)."""
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    orders = with_columns(
        orders, {"tp_c": lambda b: scaled_int(b.column("o_totalprice"), 100)}
    )
    w = windowed(orders, ["o_custkey"], _ORDER, [("cumsum", "tp_c", "spend_c")])
    return w.map_batches(
        lambda b: pa.table(
            {
                "o_custkey": b.column("o_custkey"),
                "o_orderkey": b.column("o_orderkey"),
                "running_spend": unscale(b.column("spend_c"), 100),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def window_ntile(sf_dir: str):
    """NTILE(4) spend quartile per priority class (SQL tile-size split)."""
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    )
    w = windowed(
        orders,
        ["o_orderpriority"],
        ["o_totalprice", "o_orderkey"],
        [("ntile", 4, "quartile")],
        num_partitions=8,
    )
    return w.map_batches(
        lambda b: b.select(["o_orderkey", "o_orderpriority", "quartile"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def window_order_gap_days(sf_dir: str):
    """Days since the customer's previous order (LAG; null on first order)."""
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    w = windowed(orders, ["o_custkey"], _ORDER, [("lag", "o_orderdate", "prev_date")])

    def finish(b: pa.Table) -> pa.Table:
        us = pc.subtract(
            pc.cast(b.column("o_orderdate"), pa.int64()),
            pc.cast(b.column("prev_date"), pa.int64()),
        )
        return pa.table(
            {
                "o_custkey": b.column("o_custkey"),
                "o_orderkey": b.column("o_orderkey"),
                "gap_days": pc.divide(us, 86_400_000_000),
            }
        )

    return w.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def window_percentiles(sf_dir: str):
    """PERCENT_RANK + CUME_DIST over tied order dates (real peer groups)."""
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_orderdate"]
    )
    w = windowed(
        orders,
        ["o_orderpriority"],
        ["o_orderdate"],
        [("percent_rank", None, "pr"), ("cume_dist", None, "cd")],
        num_partitions=8,
    )
    return w.map_batches(
        lambda b: b.select(["o_orderkey", "o_orderpriority", "pr", "cd"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def window_moving_spend(sf_dir: str):
    """3-order moving SUM/AVG of spend per customer (frame ROWS BETWEEN
    2 PRECEDING AND CURRENT ROW) — exact integer-cents frame sums."""
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    orders = with_columns(
        orders, {"tp_c": lambda b: scaled_int(b.column("o_totalprice"), 100)}
    )
    w = windowed(
        orders,
        ["o_custkey"],
        _ORDER,
        [("moving_sum", "tp_c", "msum_c", 3), ("moving_avg", "tp_c", "mv_avg_c", 3)],
    )
    return w.map_batches(
        lambda b: pa.table(
            {
                "o_custkey": b.column("o_custkey"),
                "o_orderkey": b.column("o_orderkey"),
                "mv_sum": unscale(b.column("msum_c"), 100),
                "mv_avg_c": b.column("mv_avg_c"),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def window_first_last(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE / NTH_VALUE(2) of the customer's order keys
    in date order (whole-partition frame; nth is null for 1-order
    customers)."""
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    w = windowed(
        orders,
        ["o_custkey"],
        _ORDER,
        [
            ("first_value", "o_orderkey", "first_ord", None),
            ("last_value", "o_orderkey", "last_ord", None),
            ("nth_value", "o_orderkey", "second_ord", 2),
        ],
    )
    return w.map_batches(
        lambda b: b.select(["o_custkey", "o_orderkey", "first_ord", "last_ord", "second_ord"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def top2_orders_per_priority(sf_dir: str):
    """Top-2 most expensive orders per priority via the dedicated
    grouped_topk operator (map-side per-key prune BEFORE the shuffle —
    the window-function plan ships every row; this ships ≤2 per key per
    batch).  Tie-break: o_totalprice DESC then set semantics — the test
    data's prices are unique within the top ranks at every SF."""
    from terrier_ray.ops.relational import grouped_topk

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    )
    return grouped_topk(
        orders, ["o_orderpriority"], "o_totalprice", 2, descending=True
    )


SQL = {
    "sql_window_frames": """
        SELECT o_custkey, o_orderkey,
               SUM(tp_c) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                   / 100.0 AS mv_sum,
               AVG(tp_c) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                   AS mv_avg,
               SUM(tp_c) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS run_sum,
               LAST_VALUE(o_orderkey) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS last_ord
        FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                     CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS tp_c
              FROM orders) t
""",
    "top2_orders_per_priority": """
        SELECT o_orderkey, o_orderpriority, o_totalprice FROM (
            SELECT o_orderkey, o_orderpriority, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC) AS rn
            FROM orders)
        WHERE rn <= 2
    """,
    "window_moving_spend": """
        SELECT o_custkey, o_orderkey,
               SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) / 100.0
                   AS mv_sum,
               AVG(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                   AS mv_avg_c
        FROM orders
    """,
    "window_first_last": """
        SELECT o_custkey, o_orderkey,
               FIRST_VALUE(o_orderkey)
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS first_ord,
               LAST_VALUE(o_orderkey)
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS last_ord,
               NTH_VALUE(o_orderkey, 2)
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS second_ord
        FROM orders
    """,
    "window_percentiles": """
        SELECT o_orderkey, o_orderpriority,
               PERCENT_RANK() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_orderdate) AS pr,
               CUME_DIST() OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_orderdate) AS cd
        FROM orders
    """,
    "window_order_rank": """
        SELECT o_custkey, o_orderkey, rn FROM (
            SELECT o_custkey, o_orderkey,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS rn
            FROM orders)
        WHERE rn <= 3
    """,
    "window_running_spend": """
        SELECT o_custkey, o_orderkey,
               SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
                   AS running_spend
        FROM orders
    """,
    "window_ntile": """
        SELECT o_orderkey, o_orderpriority,
               NTILE(4) OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS quartile
        FROM orders
    """,
    "window_order_gap_days": """
        SELECT o_custkey, o_orderkey,
               DATEDIFF('day',
                        LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                               ORDER BY o_orderdate, o_orderkey),
                        o_orderdate) AS gap_days
        FROM orders
    """,
}

def sql_window_frames(sf_dir: str):
    """The moving/running/unbounded window frames written as SQL TEXT —
    the parser's ROWS BETWEEN clause (round-3 gap) driving the engine's
    windowed() kinds; oracle runs the identical text."""
    from terrier_ray.sql import sql

    return sql("""
        SELECT o_custkey, o_orderkey,
               SUM(tp_c) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                   / 100.0 AS mv_sum,
               AVG(tp_c) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                   AS mv_avg,
               SUM(tp_c) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS run_sum,
               LAST_VALUE(o_orderkey) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS last_ord
        FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                     CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS tp_c
              FROM orders) t
""", sf_dir)


QUERIES = {
    "sql_window_frames": sql_window_frames,
    "window_order_rank": window_order_rank,
    "window_running_spend": window_running_spend,
    "window_ntile": window_ntile,
    "window_percentiles": window_percentiles,
    "window_order_gap_days": window_order_gap_days,
    "window_moving_spend": window_moving_spend,
    "window_first_last": window_first_last,
    "top2_orders_per_priority": top2_orders_per_priority,
}
