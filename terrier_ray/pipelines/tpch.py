"""TPC-H-style relational query suite over the driver's testdata tables.

Each query has a Ray-Data implementation (``q_*(sf_dir)``) and a matching
DuckDB oracle SQL string (``SQL[name]``) with IDENTICAL column names, for the
driver's row-count/schema/value-hash gate.

Reference workload analog: the reference ships hand-built TPC-H plans for
Q1,Q4,Q5,Q6,Q7,Q11,Q16,Q18,Q19 (/root/reference/test/test_util/tpch/
tpch_query.cpp; runner benchmark/runner/tpch_runner.cpp:13-27).

Float determinism recipe (both sides, verbatim): every float SUM is computed
over ``CAST(ROUND(term*scale,0) AS BIGINT)`` fixed-point integers (exact in
any summation order) and divided once by the scale; every AVG/derived float
is rounded via the same integer-scaling (`rescale_round`) — plain
``ROUND(x, d)`` yields 1-ulp-different doubles across engines and WILL fail a
value-hash.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from terrier_ray.ops.relational import (
    broadcast_join,
    distinct,
    filter_batches,
    global_aggregate,
    grouped_aggregate,
    grouped_count_distinct,
    partitioned_join,
    read_table,
    rescale_round,
    scaled_int,
    topk,
    union_all,
    unscale,
    with_columns,
)


def _ts(s: str):
    import datetime as dt

    return pa.scalar(dt.datetime.fromisoformat(s), type=pa.timestamp("us"))


def _small(sf_dir: str, name: str, columns=None) -> pa.Table:
    """Driver-side read of a small dimension table (broadcast build side)."""
    return pq.read_table(f"{sf_dir.rstrip('/')}/{name}.parquet", columns=columns)


def _rev_cents(b: pa.Table) -> pa.Array:
    """fixed-point cents of l_extendedprice * (1 - l_discount)."""
    return scaled_int(
        pc.multiply(
            b.column("l_extendedprice"), pc.subtract(1.0, b.column("l_discount"))
        ),
        100,
    )


def _unscale_cols(ds, cols: dict[str, int]):
    def apply(batch: pa.Table) -> pa.Table:
        for name, scale in cols.items():
            batch = batch.set_column(
                batch.column_names.index(name), name, unscale(batch.column(name), scale)
            )
        return batch

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1: scan+filter+project+grouped agg (SeqScan→Projection→HashAgg)."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
        filter=(pads.field("l_shipdate") <= _ts("1998-09-02")),
    )
    ds = with_columns(
        ds,
        {
            "ep_c": lambda b: scaled_int(b.column("l_extendedprice"), 100),
            "disc_t": lambda b: scaled_int(b.column("l_discount"), 10000),
            "dp_c": _rev_cents,
            "ch_c": lambda b: scaled_int(
                pc.multiply(
                    pc.multiply(
                        b.column("l_extendedprice"),
                        pc.subtract(1.0, b.column("l_discount")),
                    ),
                    pc.add(1.0, b.column("l_tax")),
                ),
                100,
            ),
        },
    )
    out = grouped_aggregate(
        ds,
        ["l_returnflag", "l_linestatus"],
        [
            ("sum", "l_quantity", "sum_qty"),
            ("sum", "ep_c", "sum_base_price"),
            ("sum", "dp_c", "sum_disc_price"),
            ("sum", "ch_c", "sum_charge"),
            ("sum", "disc_t", "__disc_sum"),
            ("mean", "l_quantity", "avg_qty"),
            ("count", "l_quantity", "count_order"),
        ],
    )

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("count_order"), pa.float64())
        b = b.set_column(
            b.column_names.index("avg_qty"), "avg_qty",
            rescale_round(b.column("avg_qty"), 4),
        )
        avg_price = rescale_round(
            pc.divide(unscale(b.column("sum_base_price"), 100), n), 4
        )
        # avg over fixed-point discounts (scale 10000), 6 decimals
        avg_disc = rescale_round(
            pc.divide(unscale(b.column("__disc_sum"), 10000), n), 6
        )
        for name, scale in (
            ("sum_base_price", 100),
            ("sum_disc_price", 100),
            ("sum_charge", 100),
        ):
            b = b.set_column(
                b.column_names.index(name), name, unscale(b.column(name), scale)
            )
        b = b.append_column("avg_price", avg_price)
        b = b.append_column("avg_disc", avg_disc)
        return b.drop_columns(["__disc_sum"])

    return out.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6: pushed-down scan filter + global aggregate."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
        filter=(
            (pads.field("l_shipdate") >= _ts("1996-01-01"))
            & (pads.field("l_shipdate") < _ts("1997-01-01"))
            & (pads.field("l_discount") >= 0.05)
            & (pads.field("l_discount") <= 0.07)
            & (pads.field("l_quantity") < 24)
        ),
    )
    ds = with_columns(
        ds,
        {
            "rev_c": lambda b: scaled_int(
                pc.multiply(b.column("l_extendedprice"), b.column("l_discount")), 100
            )
        },
    )
    out = global_aggregate(ds, [("sum", "rev_c", "revenue")])
    return pa.table({"revenue": unscale(out.column("revenue"), 100)})


def q3_shipping_priority(sf_dir: str):
    """TPC-H Q3: broadcast join (customer) + co-partitioned hash-shuffle join
    (orders⋈lineitem) + grouped agg + top-k."""
    cust = _small(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust = cust.filter(pc.equal(cust.column("c_mktsegment"), "BUILDING")).select(
        ["c_custkey"]
    )
    orders = read_table(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=(pads.field("o_orderdate") < _ts("1998-01-01")),
    )
    orders = broadcast_join(orders, cust, keys=["o_custkey"], right_keys=["c_custkey"])
    line = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pads.field("l_shipdate") > _ts("1998-01-01")),
    )
    # join-aggregation fusion: the GROUP BY keys (l_orderkey, o_orderdate,
    # o_orderpriority) are functionally dependent on the join key, so the
    # per-bucket Arrow group_by inside the join task is COMPLETE — the
    # second all-to-all shuffle disappears entirely (post_fn contract in
    # partitioned_join)
    def fuse_agg(t: pa.Table) -> pa.Table:
        t = t.append_column("rev_c", _rev_cents(t))
        gb = t.group_by(["l_orderkey", "o_orderdate", "o_orderpriority"]).aggregate(
            [("rev_c", "sum")]
        )
        return pa.table(
            {
                "l_orderkey": gb.column("l_orderkey"),
                "o_orderdate": gb.column("o_orderdate"),
                "o_orderpriority": gb.column("o_orderpriority"),
                "revenue": unscale(gb.column("rev_c_sum"), 100),
            }
        )

    agg = partitioned_join(
        line,
        orders,
        on=["l_orderkey"],
        right_on=["o_orderkey"],
        num_partitions=8,
        post_fn=fuse_agg,
    )
    return topk(
        agg,
        ["revenue", "o_orderdate", "l_orderkey"],
        k=10,
        descending=[True, False, False],
    )


def q5_local_supplier_volume(sf_dir: str):
    """TPC-H Q5: multi-way join (3 broadcast + 1 shuffle) + grouped agg."""
    nation = _small(sf_dir, "nation")
    region = _small(sf_dir, "region")
    nr = nation.join(region, keys=["n_regionkey"], right_keys=["r_regionkey"])
    nr = nr.filter(pc.equal(nr.column("r_name"), "ASIA")).select(
        ["n_nationkey", "n_name"]
    )
    supplier = _small(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    cust = _small(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    orders = read_table(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(
            (pads.field("o_orderdate") >= _ts("1996-01-01"))
            & (pads.field("o_orderdate") < _ts("1997-01-01"))
        ),
    )
    orders = broadcast_join(orders, cust, keys=["o_custkey"], right_keys=["c_custkey"])
    line = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    j = partitioned_join(
        line, orders, on=["l_orderkey"], right_on=["o_orderkey"], num_partitions=8
    )
    j = broadcast_join(j, supplier, keys=["l_suppkey"], right_keys=["s_suppkey"])
    j = filter_batches(
        j, lambda b: pc.equal(b.column("c_nationkey"), b.column("s_nationkey"))
    )
    j = broadcast_join(j, nr, keys=["s_nationkey"], right_keys=["n_nationkey"])
    j = with_columns(j, {"rev_c": _rev_cents})
    out = grouped_aggregate(j, ["n_name"], [("sum", "rev_c", "revenue")])
    return _unscale_cols(out, {"revenue": 100})


def q4_order_priority(sf_dir: str):
    """TPC-H Q4: EXISTS with correlated predicate → join+filter+distinct+agg."""
    orders = read_table(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=(
            (pads.field("o_orderdate") >= _ts("1996-07-01"))
            & (pads.field("o_orderdate") < _ts("1996-10-01"))
        ),
    )
    line = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    j = partitioned_join(
        line, orders, on=["l_orderkey"], right_on=["o_orderkey"], num_partitions=8
    )
    j = filter_batches(
        j, lambda b: pc.greater(b.column("l_shipdate"), b.column("o_orderdate"))
    )
    dd = distinct(j, ["l_orderkey", "o_orderpriority"])
    return grouped_aggregate(
        dd, ["o_orderpriority"], [("count", "l_orderkey", "order_count")]
    )


def q18_large_volume(sf_dir: str):
    """TPC-H Q18: grouped HAVING + join + top-k.  sum_qty is integral-valued
    (quantities are whole numbers) so sums are exact without scaling."""
    line = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    qty = grouped_aggregate(line, ["l_orderkey"], [("sum", "l_quantity", "sum_qty")])
    qty = filter_batches(qty, lambda b: pc.greater(b.column("sum_qty"), 300.0))
    # HAVING > 300 keeps a tiny fraction of orders — broadcast the survivors
    # into the orders scan instead of a second all-to-all shuffle
    batches = list(qty.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not batches:
        return pa.table(
            {
                "l_orderkey": pa.array([], type=pa.int64()),
                "o_orderdate": pa.array([], type=pa.timestamp("us")),
                "o_totalprice": pa.array([], type=pa.float64()),
                "sum_qty": pa.array([], type=pa.float64()),
            }
        )
    qty_tbl = pa.concat_tables(batches)
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_totalprice"]
    )
    j = broadcast_join(orders, qty_tbl, keys=["o_orderkey"], right_keys=["l_orderkey"])
    top = topk(j, ["o_totalprice", "o_orderkey"], k=20, descending=[True, False])
    return pa.table(
        {
            "l_orderkey": top.column("o_orderkey"),
            "o_orderdate": top.column("o_orderdate"),
            "o_totalprice": top.column("o_totalprice"),
            "sum_qty": top.column("sum_qty"),
        }
    )


def top10_orders(sf_dir: str):
    """ORDER BY + LIMIT (parallel top-k: per-block heap + global merge)."""
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    return topk(orders, ["o_totalprice", "o_orderkey"], k=10, descending=[True, False])


def distinct_segments(sf_dir: str):
    """DISTINCT (rewritten to GROUP BY, like the reference optimizer does)."""
    return distinct(
        read_table(sf_dir, "customer", columns=["c_mktsegment"]), ["c_mktsegment"]
    )


def string_functions(sf_dir: str):
    """Scalar string functions (upper/length/substr/concat) on Arrow kernels."""
    part = read_table(
        sf_dir,
        "part",
        columns=["p_partkey", "p_name", "p_type", "p_brand", "p_size"],
        filter=(pads.field("p_size") > 25),
    )
    part = with_columns(
        part,
        {
            "name_upper": lambda b: pc.utf8_upper(b.column("p_name")),
            "name_len": lambda b: pc.cast(pc.utf8_length(b.column("p_name")), pa.int64()),
            "type_prefix": lambda b: pc.utf8_slice_codeunits(b.column("p_type"), 0, 4),
            "brand_size": lambda b: pc.binary_join_element_wise(
                b.column("p_brand"), pc.cast(b.column("p_size"), pa.string()), "-"
            ),
        },
    )
    return part.select_columns(
        ["p_partkey", "name_upper", "name_len", "type_prefix", "brand_size"]
    )


def like_filter(sf_dir: str):
    """(NOT) LIKE predicates via pc.match_like."""
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_name", "p_type"])
    return filter_batches(
        part,
        lambda b: pc.or_(
            pc.match_like(b.column("p_name"), "%ab%"),
            pc.match_like(b.column("p_type"), "ECONO%"),
        ),
    )


def date_functions(sf_dir: str):
    """year()/month() extraction + grouped agg."""
    orders = read_table(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])
    orders = with_columns(
        orders,
        {
            "yr": lambda b: pc.year(b.column("o_orderdate")),
            "mo": lambda b: pc.cast(pc.month(b.column("o_orderdate")), pa.int64()),
            "tp_c": lambda b: scaled_int(b.column("o_totalprice"), 100),
        },
    )
    out = grouped_aggregate(
        orders,
        ["yr", "mo"],
        [("count", "o_totalprice", "n_orders"), ("sum", "tp_c", "total")],
    )
    return _unscale_cols(out, {"total": 100})


def events_hourly(sf_dir: str):
    """Tumbling-window aggregate over the events stream table."""
    ev = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])
    ev = with_columns(
        ev,
        {
            "hour_ts": lambda b: pc.floor_temporal(b.column("ts"), unit="hour"),
            "value_c": lambda b: scaled_int(b.column("value"), 100),
        },
    )
    out = grouped_aggregate(
        ev,
        ["event_type", "hour_ts"],
        [("count", "value", "n"), ("sum", "value_c", "total_value")],
    )
    return _unscale_cols(out, {"total_value": 100})


def case_expression(sf_dir: str):
    """CASE WHEN / conditional projection."""
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return with_columns(
        orders,
        {
            "size_class": lambda b: pc.if_else(
                pc.greater(b.column("o_totalprice"), 400000.0),
                pa.scalar("big"),
                pc.if_else(
                    pc.greater(b.column("o_totalprice"), 150000.0),
                    pa.scalar("mid"),
                    pa.scalar("small"),
                ),
            )
        },
    ).select_columns(["o_orderkey", "size_class"])


def semi_join_urgent(sf_dir: str):
    """Semi join (EXISTS): derive the (tiny) distinct key set DISTRIBUTED
    (pushdown filter + distinct over the fact table), then broadcast it and
    filter with pc.is_in — the fact table never touches the driver."""
    urgent = distinct(
        read_table(
            sf_dir,
            "orders",
            columns=["o_custkey", "o_orderpriority"],
            filter=(pads.field("o_orderpriority") == "1-URGENT"),
        ).select_columns(["o_custkey"]),
        ["o_custkey"],
    )
    keys = pa.concat_tables(
        urgent.iter_batches(batch_size=None, batch_format="pyarrow")
    ).column("o_custkey")
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    keys = pc.unique(keys.combine_chunks())
    return filter_batches(
        cust, lambda b: pc.is_in(b.column("c_custkey"), value_set=keys)
    )


def anti_join_no_urgent(sf_dir: str):
    """Anti join (NOT EXISTS) via co-partitioned hash-shuffle left_anti."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey"])
    orders = read_table(
        sf_dir,
        "orders",
        columns=["o_custkey", "o_orderpriority"],
        filter=(pads.field("o_orderpriority") == "1-URGENT"),
    ).select_columns(["o_custkey"])
    return partitioned_join(
        cust,
        orders,
        on=["c_custkey"],
        right_on=["o_custkey"],
        join_type="left_anti",
        num_partitions=4,
    )


def union_names(sf_dir: str):
    """UNION ALL (reference plans SETOP but never executes it — we do)."""
    cust = read_table(sf_dir, "customer", columns=["c_name"]).map_batches(
        lambda b: b.rename_columns(["name"]), batch_format="pyarrow"
    )
    supp = read_table(sf_dir, "supplier", columns=["s_name"]).map_batches(
        lambda b: b.rename_columns(["name"]), batch_format="pyarrow"
    )
    return union_all(cust, supp)


def count_distinct_segments(sf_dir: str):
    """COUNT(DISTINCT) GROUP BY."""
    cust = read_table(sf_dir, "customer", columns=["c_nationkey", "c_mktsegment"])
    return grouped_count_distinct(cust, ["c_nationkey"], "c_mktsegment", "n_segments")


def nation_balance_stats(sf_dir: str):
    """Grouped MIN/MAX/AVG/COUNT over customer balances."""
    cust = read_table(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    cust = with_columns(
        cust, {"bal_c": lambda b: scaled_int(b.column("c_acctbal"), 100)}
    )
    out = grouped_aggregate(
        cust,
        ["c_nationkey"],
        [
            ("min", "c_acctbal", "min_bal"),
            ("max", "c_acctbal", "max_bal"),
            ("sum", "bal_c", "__bal_sum"),
            ("count", "c_acctbal", "n"),
        ],
    )

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n"), pa.float64())
        avg = rescale_round(pc.divide(unscale(b.column("__bal_sum"), 100), n), 4)
        return b.drop_columns(["__bal_sum"]).append_column("avg_bal", avg)

    return out.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def lineitem_global_stats(sf_dir: str):
    """Global (no-group) aggregation: COUNT/SUM/AVG/MIN/MAX."""
    line = read_table(sf_dir, "lineitem", columns=["l_extendedprice", "l_quantity"])
    line = with_columns(
        line, {"ep_c": lambda b: scaled_int(b.column("l_extendedprice"), 100)}
    )
    out = global_aggregate(
        line,
        [
            ("count", "l_quantity", "n"),
            ("sum", "ep_c", "total_price"),
            ("sum", "l_quantity", "__qty_sum"),
            ("min", "l_extendedprice", "min_price"),
            ("max", "l_extendedprice", "max_price"),
        ],
    )
    n = pc.cast(out.column("n"), pa.float64())
    return pa.table(
        {
            "n": out.column("n"),
            "total_price": unscale(out.column("total_price"), 100),
            "avg_qty": rescale_round(
                pc.divide(pc.cast(out.column("__qty_sum"), pa.float64()), n), 4
            ),
            "min_price": out.column("min_price"),
            "max_price": out.column("max_price"),
        }
    )


# ---------------------------------------------------------------------------
# oracle SQL (identical column names + identical fixed-point arithmetic)
# ---------------------------------------------------------------------------

SQL: dict[str, str] = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 AS sum_base_price,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) / 100.0 AS sum_disc_price,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100, 0) AS BIGINT)) / 100.0 AS sum_charge,
               CAST(ROUND((SUM(l_quantity) / COUNT(*)) * 10000, 0) AS BIGINT) / 10000.0 AS avg_qty,
               COUNT(*) AS count_order,
               CAST(ROUND(((SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0) / COUNT(*)) * 10000, 0) AS BIGINT) / 10000.0 AS avg_price,
               CAST(ROUND(((SUM(CAST(ROUND(l_discount * 10000, 0) AS BIGINT)) / 10000.0) / COUNT(*)) * 1000000, 0) AS BIGINT) / 1000000.0 AS avg_disc
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q6_forecast_revenue": """
        SELECT SUM(CAST(ROUND(l_extendedprice * l_discount * 100, 0) AS BIGINT)) / 100.0 AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "q3_shipping_priority": """
        SELECT l_orderkey,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) / 100.0 AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    "q5_local_supplier_volume": """
        SELECT n_name,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) / 100.0 AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM (
            SELECT DISTINCT o_orderkey AS l_orderkey, o_orderpriority
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            WHERE o_orderdate >= TIMESTAMP '1996-07-01'
              AND o_orderdate < TIMESTAMP '1996-10-01'
              AND l_shipdate > o_orderdate
        )
        GROUP BY o_orderpriority
    """,
    "q18_large_volume": """
        SELECT l_orderkey, o_orderdate, o_totalprice, sum_qty
        FROM (
            SELECT l_orderkey, SUM(l_quantity) AS sum_qty
            FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
        ) q JOIN orders ON l_orderkey = o_orderkey
        ORDER BY o_totalprice DESC, l_orderkey
        LIMIT 20
    """,
    "top10_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    "distinct_segments": "SELECT DISTINCT c_mktsegment FROM customer",
    "string_functions": """
        SELECT p_partkey, UPPER(p_name) AS name_upper,
               LENGTH(p_name) AS name_len,
               SUBSTR(p_type, 1, 4) AS type_prefix,
               CONCAT(p_brand, '-', CAST(p_size AS VARCHAR)) AS brand_size
        FROM part WHERE p_size > 25
    """,
    "like_filter": """
        SELECT p_partkey, p_name, p_type FROM part
        WHERE p_name LIKE '%ab%' OR p_type LIKE 'ECONO%'
    """,
    "date_functions": """
        SELECT YEAR(o_orderdate) AS yr, MONTH(o_orderdate) AS mo,
               COUNT(*) AS n_orders,
               SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0 AS total
        FROM orders GROUP BY yr, mo
    """,
    "events_hourly": """
        SELECT event_type, DATE_TRUNC('hour', ts) AS hour_ts,
               COUNT(*) AS n,
               SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS total_value
        FROM events GROUP BY event_type, hour_ts
    """,
    "case_expression": """
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 400000 THEN 'big'
                    WHEN o_totalprice > 150000 THEN 'mid'
                    ELSE 'small' END AS size_class
        FROM orders
    """,
    "semi_join_urgent": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
    "anti_join_no_urgent": """
        SELECT c_custkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
    """,
    "union_names": """
        SELECT c_name AS name FROM customer
        UNION ALL
        SELECT s_name AS name FROM supplier
    """,
    "count_distinct_segments": """
        SELECT c_nationkey, COUNT(DISTINCT c_mktsegment) AS n_segments
        FROM customer GROUP BY c_nationkey
    """,
    "nation_balance_stats": """
        SELECT c_nationkey,
               MIN(c_acctbal) AS min_bal,
               MAX(c_acctbal) AS max_bal,
               COUNT(*) AS n,
               CAST(ROUND(((SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) / 100.0) / COUNT(*)) * 10000, 0) AS BIGINT) / 10000.0 AS avg_bal
        FROM customer GROUP BY c_nationkey
    """,
    "lineitem_global_stats": """
        SELECT COUNT(*) AS n,
               SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 AS total_price,
               CAST(ROUND((SUM(l_quantity) / COUNT(*)) * 10000, 0) AS BIGINT) / 10000.0 AS avg_qty,
               MIN(l_extendedprice) AS min_price,
               MAX(l_extendedprice) AS max_price
        FROM lineitem
    """,
}

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q4_order_priority": q4_order_priority,
    "q18_large_volume": q18_large_volume,
    "top10_orders": top10_orders,
    "distinct_segments": distinct_segments,
    "string_functions": string_functions,
    "like_filter": like_filter,
    "date_functions": date_functions,
    "events_hourly": events_hourly,
    "case_expression": case_expression,
    "semi_join_urgent": semi_join_urgent,
    "anti_join_no_urgent": anti_join_no_urgent,
    "union_names": union_names,
    "count_distinct_segments": count_distinct_segments,
    "nation_balance_stats": nation_balance_stats,
    "lineitem_global_stats": lineitem_global_stats,
}
