"""Extended scalar-function parity: strings, date parts, trig/math, NULL
handling, scalar subquery, INTERSECT/EXCEPT, LIMIT+OFFSET.

Mirrors the reference's SQL-visible builtin surface
(/root/reference/src/include/execution/sql/functions/string_functions.h:17-115,
date_time_functions.h:10-110, ast/builtins.h:286-310) with pyarrow.compute
kernels, each DuckDB-oracled.  Trig outputs are pinned with the
integer-scaling round (libm last-ulp differences across engines).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from terrier_ray.ops.relational import (
    distinct,
    filter_batches,
    partitioned_join,
    read_table,
    rescale_round,
    scaled_int,
    setop_all,
    topk,
    with_columns,
)


def string_functions2(sf_dir: str):
    """lpad/reverse/starts_with/position/repeat/split_part/trim/left."""
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_name", "p_brand"])
    return with_columns(
        part,
        {
            "name_lpad": lambda b: pc.utf8_lpad(b.column("p_name"), 15, "*"),
            "name_rev": lambda b: pc.utf8_reverse(b.column("p_name")),
            "brand_starts": lambda b: pc.starts_with(b.column("p_brand"), "Brand#1"),
            "pos_a": lambda b: pc.cast(
                pc.add(pc.find_substring(b.column("p_name"), "a"), 1), pa.int64()
            ),
            "brand_x2": lambda b: pc.binary_repeat(b.column("p_brand"), 2),
            "brand_num": lambda b: pc.list_element(
                pc.split_pattern(b.column("p_brand"), "#"), 1
            ),
            "name_left3": lambda b: pc.utf8_slice_codeunits(b.column("p_name"), 0, 3),
            "name_trim": lambda b: pc.utf8_trim(b.column("p_name"), "ab"),
        },
    ).select_columns(
        [
            "p_partkey",
            "name_lpad",
            "name_rev",
            "brand_starts",
            "pos_a",
            "brand_x2",
            "brand_num",
            "name_left3",
            "name_trim",
        ]
    )


def date_functions2(sf_dir: str):
    """quarter/day/isodow/dayofyear/hour/minute/epoch_us + century/decade."""
    ev = read_table(sf_dir, "events", columns=["event_id", "ts"])
    return with_columns(
        ev,
        {
            "q": lambda b: pc.cast(pc.quarter(b.column("ts")), pa.int64()),
            "d": lambda b: pc.cast(pc.day(b.column("ts")), pa.int64()),
            "idow": lambda b: pc.cast(
                pc.day_of_week(b.column("ts"), count_from_zero=False, week_start=1),
                pa.int64(),
            ),
            "doy": lambda b: pc.cast(pc.day_of_year(b.column("ts")), pa.int64()),
            "hr": lambda b: pc.cast(pc.hour(b.column("ts")), pa.int64()),
            "mi": lambda b: pc.cast(pc.minute(b.column("ts")), pa.int64()),
            "ep_us": lambda b: pc.cast(b.column("ts"), pa.int64()),
            "century": lambda b: pc.cast(
                pc.add(pc.divide(pc.subtract(pc.year(b.column("ts")), 1), 100), 1),
                pa.int64(),
            ),
            "decade": lambda b: pc.cast(
                pc.divide(pc.year(b.column("ts")), 10), pa.int64()
            ),
        },
    ).select_columns(
        ["event_id", "q", "d", "idow", "doy", "hr", "mi", "ep_us", "century", "decade"]
    )


def trig_functions(sf_dir: str):
    """sin/cos/tan/atan2/exp/log10/ceil/floor/sign (rounded: libm ulp drift)."""
    line = read_table(sf_dir, "lineitem", columns=["l_linenumber", "l_orderkey", "l_discount", "l_tax"])
    return with_columns(
        line,
        {
            "s": lambda b: rescale_round(pc.sin(b.column("l_discount")), 9),
            "c": lambda b: rescale_round(pc.cos(b.column("l_discount")), 9),
            "t": lambda b: rescale_round(pc.tan(b.column("l_discount")), 9),
            "a2": lambda b: rescale_round(
                pc.atan2(b.column("l_discount"), pc.add(b.column("l_tax"), 1.0)), 9
            ),
            "e": lambda b: rescale_round(pc.exp(b.column("l_discount")), 9),
            "l10": lambda b: rescale_round(
                pc.log10(pc.add(b.column("l_discount"), 1.0)), 9
            ),
            "ce": lambda b: pc.ceil(pc.multiply(b.column("l_discount"), 10.0)),
            "fl": lambda b: pc.floor(pc.multiply(b.column("l_discount"), 10.0)),
            "sg": lambda b: pc.cast(
                pc.sign(pc.subtract(b.column("l_discount"), 0.05)), pa.float64()
            ),
        },
    ).select_columns(
        ["l_orderkey", "l_linenumber", "s", "c", "t", "a2", "e", "l10", "ce", "fl", "sg"]
    )


def null_handling(sf_dir: str):
    """NULLIF / IS NULL / COALESCE (data has no nulls; NULLIF makes them)."""
    line = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_discount"]
    )

    def nullif_zero(b: pa.Table) -> pa.Array:
        return pc.if_else(
            pc.equal(b.column("l_discount"), 0.0),
            pa.scalar(None, type=pa.float64()),
            b.column("l_discount"),
        )

    return with_columns(
        line,
        {
            "disc_or_null": nullif_zero,
            "is_free": lambda b: pc.is_null(nullif_zero(b)),
            "disc_filled": lambda b: pc.coalesce(
                nullif_zero(b), pa.scalar(-1.0, type=pa.float64())
            ),
        },
    ).select_columns(
        ["l_orderkey", "l_linenumber", "disc_or_null", "is_free", "disc_filled"]
    )


def scalar_subquery(sf_dir: str):
    """parts priced above the average (scalar subquery → broadcast constant)."""
    cents = pq.read_table(
        f"{sf_dir.rstrip('/')}/part.parquet", columns=["p_retailprice"]
    )
    ci = scaled_int(cents.column("p_retailprice").combine_chunks(), 100)
    avg = (int(pc.sum(ci).as_py()) / 100.0) / cents.num_rows
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_retailprice"])
    return filter_batches(
        part, lambda b: pc.greater(b.column("p_retailprice"), avg)
    )


def intersect_nations(sf_dir: str):
    """INTERSECT via distinct + co-partitioned semi join (reference plans
    SETOP but has no translator — we execute it)."""
    c = distinct(read_table(sf_dir, "customer", columns=["c_nationkey"]), ["c_nationkey"])
    s = distinct(read_table(sf_dir, "supplier", columns=["s_nationkey"]), ["s_nationkey"])
    out = partitioned_join(
        c, s, on=["c_nationkey"], right_on=["s_nationkey"],
        join_type="left_semi", num_partitions=4,
    )
    return out


def except_sizes(sf_dir: str):
    """EXCEPT via distinct + co-partitioned anti join (part sizes not used
    as nation keys — integer-domain set difference, non-empty at every sf)."""
    p = distinct(read_table(sf_dir, "part", columns=["p_size"]), ["p_size"])
    c = distinct(read_table(sf_dir, "customer", columns=["c_nationkey"]), ["c_nationkey"])
    return partitioned_join(
        p, c, on=["p_size"], right_on=["c_nationkey"],
        join_type="left_anti", num_partitions=4,
    )


def intersect_all_nations(sf_dir: str):
    """INTERSECT ALL: per-nation customer rows capped at the supplier
    multiplicity (min(m, n) copies — bag semantics the reference plans as
    SETOP INTERSECT_ALL but cannot execute)."""
    c = read_table(sf_dir, "customer", columns=["c_nationkey"])
    s = read_table(sf_dir, "supplier", columns=["s_nationkey"])
    return setop_all(
        c, s, ["c_nationkey"], right_columns=["s_nationkey"], mode="intersect"
    )


def except_all_sizes(sf_dir: str):
    """EXCEPT ALL: part-size rows minus nation-key multiplicities
    (max(m - n, 0) copies) — exercises both full elimination (small sizes
    collide with dense nation keys) and pass-through (sizes > 24)."""
    p = read_table(sf_dir, "part", columns=["p_size"])
    c = read_table(sf_dir, "customer", columns=["c_nationkey"])
    return setop_all(
        p, c, ["p_size"], right_columns=["c_nationkey"], mode="except"
    )


def limit_offset(sf_dir: str):
    """ORDER BY + LIMIT + OFFSET: top-k to offset+limit then slice."""
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    top = topk(orders, ["o_totalprice", "o_orderkey"], k=20, descending=[True, False])
    return top.slice(5, 15)


QUERIES = {
    "string_functions2": string_functions2,
    "date_functions2": date_functions2,
    "trig_functions": trig_functions,
    "null_handling": null_handling,
    "scalar_subquery": scalar_subquery,
    "intersect_nations": intersect_nations,
    "except_sizes": except_sizes,
    "intersect_all_nations": intersect_all_nations,
    "except_all_sizes": except_all_sizes,
    "limit_offset": limit_offset,
}

SQL = {
    "string_functions2": """
        SELECT p_partkey,
               LPAD(p_name, 15, '*') AS name_lpad,
               REVERSE(p_name) AS name_rev,
               STARTS_WITH(p_brand, 'Brand#1') AS brand_starts,
               STRPOS(p_name, 'a') AS pos_a,
               REPEAT(p_brand, 2) AS brand_x2,
               SPLIT_PART(p_brand, '#', 2) AS brand_num,
               LEFT(p_name, 3) AS name_left3,
               TRIM(p_name, 'ab') AS name_trim
        FROM part
    """,
    "date_functions2": """
        SELECT event_id,
               QUARTER(ts) AS q, DAY(ts) AS d, ISODOW(ts) AS idow,
               DAYOFYEAR(ts) AS doy, HOUR(ts) AS hr, MINUTE(ts) AS mi,
               EPOCH_US(ts) AS ep_us,
               ((YEAR(ts) - 1) // 100) + 1 AS century,
               YEAR(ts) // 10 AS decade
        FROM events
    """,
    "trig_functions": """
        SELECT l_orderkey, l_linenumber,
               CAST(ROUND(SIN(l_discount) * 1e9, 0) AS BIGINT) / 1e9 AS s,
               CAST(ROUND(COS(l_discount) * 1e9, 0) AS BIGINT) / 1e9 AS c,
               CAST(ROUND(TAN(l_discount) * 1e9, 0) AS BIGINT) / 1e9 AS t,
               CAST(ROUND(ATAN2(l_discount, l_tax + 1.0) * 1e9, 0) AS BIGINT) / 1e9 AS a2,
               CAST(ROUND(EXP(l_discount) * 1e9, 0) AS BIGINT) / 1e9 AS e,
               CAST(ROUND(LOG10(l_discount + 1.0) * 1e9, 0) AS BIGINT) / 1e9 AS l10,
               CEIL(l_discount * 10.0) AS ce,
               FLOOR(l_discount * 10.0) AS fl,
               CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS sg
        FROM lineitem
    """,
    "null_handling": """
        SELECT l_orderkey, l_linenumber,
               NULLIF(l_discount, 0.0) AS disc_or_null,
               NULLIF(l_discount, 0.0) IS NULL AS is_free,
               COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_filled
        FROM lineitem
    """,
    "scalar_subquery": """
        SELECT p_partkey, p_retailprice FROM part
        WHERE p_retailprice > (
            SELECT (SUM(CAST(ROUND(p_retailprice * 100, 0) AS BIGINT)) / 100.0)
                   / COUNT(*)
            FROM part)
    """,
    "intersect_nations": """
        SELECT c_nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
    """,
    "except_sizes": """
        SELECT p_size FROM part
        EXCEPT
        SELECT c_nationkey FROM customer
    """,
    "intersect_all_nations": """
        SELECT c_nationkey FROM customer
        INTERSECT ALL
        SELECT s_nationkey FROM supplier
    """,
    "except_all_sizes": """
        SELECT p_size FROM part
        EXCEPT ALL
        SELECT c_nationkey FROM customer
    """,
    "limit_offset": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 15 OFFSET 5
    """,
}
