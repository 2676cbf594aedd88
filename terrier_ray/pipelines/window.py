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


SQL = {
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

QUERIES = {
    "window_order_rank": window_order_rank,
    "window_running_spend": window_running_spend,
    "window_ntile": window_ntile,
    "window_percentiles": window_percentiles,
    "window_order_gap_days": window_order_gap_days,
}
