"""terrier_ray.sql — parser, lowering, rewrite pass, end-to-end vs DuckDB.

Reference analog of what's under test: postgresparser.cpp → binder →
optimizer rewrite rules (src/include/optimizer/rule.h:16-79) → execution.
"""

from __future__ import annotations

import numpy as np
import pytest

from terrier_ray.sql import Catalog, lower, optimize, parse, plan, sql
from terrier_ray.sql.ast import Agg, BinOp, Col, Lit


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def test_parse_precedence_and_aliases():
    sel = parse(
        "SELECT a + b * 2 AS x FROM t WHERE a = 1 AND b < 2 OR c = 3"
    )
    x = sel.items[0]
    assert x.alias == "x"
    assert isinstance(x.expr, BinOp) and x.expr.op == "+"
    assert isinstance(x.expr.right, BinOp) and x.expr.right.op == "*"
    w = sel.where
    assert w.op == "or" and w.left.op == "and"


def test_parse_join_kinds_and_clauses():
    sel = parse(
        """SELECT n_name, COUNT(*) AS n FROM nation
           LEFT OUTER JOIN customer ON c_nationkey = n_nationkey
           WHERE n_name LIKE 'A%' GROUP BY n_name
           HAVING COUNT(*) > 2 ORDER BY n DESC LIMIT 5 OFFSET 1"""
    )
    assert sel.joins[0].kind == "left_outer"
    assert sel.group_by == [Col("n_name")]
    assert isinstance(sel.having.left, Agg)
    assert sel.order_by[0].descending and sel.limit == 5 and sel.offset == 1


def test_parse_case_cast_in_between():
    sel = parse(
        """SELECT CASE WHEN a IN (1, 2) THEN 'x' ELSE 'y' END AS k,
                  CAST(b AS BIGINT) AS bb
           FROM t WHERE c BETWEEN 1 AND 10 AND d IS NOT NULL"""
    )
    assert sel.items[0].alias == "k" and sel.items[1].alias == "bb"


def test_parse_typed_literals_and_count_distinct():
    sel = parse(
        "SELECT COUNT(DISTINCT x) AS n FROM t "
        "WHERE ts >= TIMESTAMP '1997-01-01 00:00:00'"
    )
    agg = sel.items[0].expr
    assert agg.distinct and agg.func == "count"
    assert sel.where.right == Lit("1997-01-01 00:00:00", "timestamp")


def test_parse_set_ops_precedence_and_outer_order():
    from terrier_ray.sql.ast import SetOpStmt

    # INTERSECT binds tighter than UNION; ORDER/LIMIT attach to the chain
    stmt = parse(
        "SELECT a FROM t UNION SELECT b FROM u INTERSECT ALL SELECT c FROM v "
        "ORDER BY a DESC LIMIT 3"
    )
    assert isinstance(stmt, SetOpStmt) and stmt.op == "union" and not stmt.all
    assert isinstance(stmt.right, SetOpStmt) and stmt.right.op == "intersect"
    assert stmt.right.all
    assert stmt.order_by[0].descending and stmt.limit == 3
    # branches carry no order/limit
    assert stmt.left.order_by == [] and stmt.left.limit is None

    ex = parse("SELECT a FROM t EXCEPT ALL SELECT b FROM u")
    assert ex.op == "except" and ex.all


def test_parse_subquery_forms():
    from terrier_ray.sql.ast import Exists, InSubquery, ScalarSubquery, Unary

    sel = parse(
        """WITH w AS (SELECT a FROM t)
           SELECT x FROM (SELECT a AS x FROM w) d
           WHERE x > (SELECT AVG(a) FROM t)
             AND EXISTS (SELECT 1 FROM u WHERE u.b = d.x)
             AND x NOT IN (SELECT c FROM v)"""
    )
    assert sel.ctes[0][0] == "w"
    assert sel.from_table.subquery is not None and sel.from_table.alias == "d"
    conj = sel.where
    assert isinstance(conj.right.stmt, type(sel))  # InSubquery holds a Select
    assert isinstance(conj.right, InSubquery) and conj.right.negated
    assert isinstance(conj.left.right, Exists)
    assert isinstance(conj.left.left.right, ScalarSubquery)
    ne = parse("SELECT a FROM t WHERE NOT EXISTS (SELECT 1 FROM u)").where
    assert isinstance(ne, Unary) and ne.op == "not" and isinstance(
        ne.operand, Exists
    )


def test_plan_is_repeatable(sf_smoke):
    # regression: an id()-keyed FROM cache without a strong ref let a GC'd
    # Select's recycled id() serve stale tables on the second plan() call
    q = ("SELECT c_custkey FROM customer WHERE c_nationkey IN "
         "(SELECT n_nationkey FROM nation WHERE n_regionkey = 1) LIMIT 3")
    import json

    a = plan(q, sf_smoke)
    b = plan(q, sf_smoke)
    assert json.dumps(a, sort_keys=True, default=str) == json.dumps(
        b, sort_keys=True, default=str
    )


def test_parse_rejects_garbage():
    with pytest.raises(SyntaxError):
        parse("SELECT FROM WHERE")
    with pytest.raises(SyntaxError):
        parse("SELECT a FROM t extra tokens here ,")


# ---------------------------------------------------------------------------
# lowering (no Ray needed — spec JSON shape)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def catalog(sf_smoke):
    return Catalog(sf_smoke)


def test_lower_sum_int_widens_to_float64(catalog):
    # DuckDB SUM(int) → HUGEINT → pandas float64; the engine's int64 sum
    # must be widened or the driver value-hash diverges (q12 bug class)
    spec = lower(
        parse("SELECT o_orderpriority, SUM(o_custkey) AS s "
              "FROM orders GROUP BY o_orderpriority"),
        catalog,
    )
    computes = [o for o in spec["ops"] if o["op"] == "compute"
                and o.get("alias") == "s"]
    assert computes and computes[0]["expr"]["fn"] == "cast"
    assert computes[0]["expr"]["options"]["target_type"] == "float64"


def test_lower_join_rebinds_right_key(catalog):
    spec = lower(
        parse("SELECT o_orderkey FROM lineitem "
              "JOIN orders ON l_orderkey = o_orderkey LIMIT 5"),
        catalog,
    )
    join = next(o for o in spec["ops"] if o["op"] == "join")
    assert join["on"] == ["l_orderkey"] and join["right_on"] == ["o_orderkey"]
    rebind = next(o for o in spec["ops"] if o["op"] == "compute"
                  and o["alias"] == "o_orderkey")
    assert rebind["expr"] == {"col": "l_orderkey"}


def test_lower_self_join_renames(catalog):
    spec = lower(
        parse("""SELECT n1.n_name AS a, n2.n_name AS b
                 FROM nation n1 JOIN nation n2
                 ON n1.n_regionkey = n2.n_regionkey LIMIT 5"""),
        catalog,
    )
    assert spec["ops"][0]["op"] == "rename"  # root nation → n1__*
    join = next(o for o in spec["ops"] if o["op"] == "join")
    assert join["right"]["ops"][0]["map"]["n_name"] == "n2__n_name"
    assert join["on"] == ["n1__n_regionkey"]


def test_lower_division_is_float64(catalog):
    spec = lower(
        parse("SELECT o_orderkey / 2 AS h FROM orders LIMIT 1"), catalog
    )
    compute = next(o for o in spec["ops"] if o["op"] == "compute")
    assert compute["expr"]["fn"] == "divide"
    assert all(a["fn"] == "cast" for a in compute["expr"]["args"])


def test_lower_unknown_column_rejected(catalog):
    with pytest.raises(ValueError, match="unknown column"):
        lower(parse("SELECT nope FROM orders"), catalog)


# ---------------------------------------------------------------------------
# rewrite pass: plan shape + value identity
# ---------------------------------------------------------------------------

NAIVE_SQL = """
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 100000 AND c_mktsegment = 'BUILDING'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def test_rewrite_pushes_filters_and_prunes(catalog, sf_smoke):
    naive = lower(parse(NAIVE_SQL), catalog)
    # naive: filters sit after the join, scans are unpruned
    assert any(o["op"] == "filter" for o in naive["ops"])
    assert "columns" not in naive["scan"] and "filter" not in naive["scan"]

    opt = optimize(naive, sf_smoke)
    # o_totalprice predicate → root scan; c_mktsegment → customer scan
    assert opt["scan"].get("filter") is not None
    join = next(o for o in opt["ops"] if o["op"] == "join")
    assert join["right"]["scan"].get("filter") is not None
    assert not any(o["op"] == "filter" for o in opt["ops"])
    # pruning: orders needs 3 columns, customer 2
    assert sorted(opt["scan"]["columns"]) == [
        "o_custkey", "o_orderpriority", "o_totalprice"
    ]
    assert sorted(join["right"]["scan"]["columns"]) == [
        "c_custkey", "c_mktsegment"
    ]
    # tiny build side → broadcast
    assert join.get("broadcast") is True


def test_rewrite_respects_broadcast_threshold(catalog, sf_smoke):
    opt = optimize(lower(parse(NAIVE_SQL), catalog), sf_smoke,
                   broadcast_max_bytes=0)
    join = next(o for o in opt["ops"] if o["op"] == "join")
    assert not join.get("broadcast")


def test_rewrite_keeps_filter_on_computed_column(catalog, sf_smoke):
    naive = lower(
        parse("SELECT o_orderkey, o_totalprice * 2 AS d FROM orders "
              "WHERE o_totalprice * 2 > 100 LIMIT 5"),
        catalog,
    )
    opt = optimize(naive, sf_smoke)
    # expression filter is not dataset-pushable; it must stay a batch
    # filter but may move to the scan-adjacent position
    assert any(o["op"] == "filter" for o in opt["ops"])


def test_rewrite_does_not_push_past_left_outer(catalog, sf_smoke):
    naive = lower(
        parse("""SELECT n_name, c_name FROM nation
                 LEFT OUTER JOIN customer ON c_nationkey = n_nationkey
                 WHERE c_acctbal > 0 LIMIT 5"""),
        catalog,
    )
    opt = optimize(naive, sf_smoke)
    # filter on the nullable side of a LEFT JOIN must NOT reach the scan
    join = next(o for o in opt["ops"] if o["op"] == "join")
    assert join["right"]["scan"].get("filter") is None
    assert any(o["op"] == "filter" for o in opt["ops"])


def test_rewrite_value_identity(ray_session, sf_smoke, catalog):
    naive = lower(parse(NAIVE_SQL), catalog)
    opt = optimize(naive, sf_smoke)
    from terrier_ray.api import build

    a = build(naive, sf_smoke).to_pandas()
    b = build(opt, sf_smoke).to_pandas()
    assert a.equals(b)


# ---------------------------------------------------------------------------
# end-to-end vs DuckDB (exact values, driver-style)
# ---------------------------------------------------------------------------

E2E = [
    # group+agg with scaled-int float recipe
    """SELECT l_returnflag, COUNT(*) AS n,
              SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0
                  AS total
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    # join + filter + topk
    """SELECT o_orderkey, c_name, o_totalprice FROM orders
       JOIN customer ON o_custkey = c_custkey
       WHERE o_orderstatus = 'O'
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 7""",
    # COUNT(DISTINCT) two-level plan
    """SELECT c_nationkey, COUNT(DISTINCT c_mktsegment) AS n_seg
       FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""",
    # self-join with alias qualification
    """SELECT n1.n_name AS a, n2.n_name AS b FROM nation n1
       JOIN nation n2 ON n1.n_regionkey = n2.n_regionkey
       WHERE n1.n_nationkey < n2.n_nationkey
       ORDER BY a, b LIMIT 20""",
    # cross join (comma FROM, no equi condition)
    """SELECT r_name, n_name FROM region, nation
       WHERE n_regionkey <> r_regionkey ORDER BY r_name, n_name LIMIT 30""",
    # scalar fns + CASE + BETWEEN
    """SELECT o_orderkey, UPPER(o_orderpriority) AS pri,
              CASE WHEN o_totalprice BETWEEN 0 AND 50000 THEN 'lo'
                   ELSE 'hi' END AS bucket
       FROM orders ORDER BY o_orderkey LIMIT 50""",
    # set ops: UNION distinct with ORDER BY on the combined result
    """SELECT n_name AS name FROM nation UNION
       SELECT r_name AS name FROM region ORDER BY name""",
    # INTERSECT (distinct) + branch WHERE
    """SELECT c_nationkey FROM customer INTERSECT
       SELECT n_nationkey FROM nation WHERE n_nationkey < 10
       ORDER BY c_nationkey""",
    # EXCEPT ALL bag semantics + LIMIT on combined
    """SELECT o_custkey FROM orders WHERE o_totalprice > 100000 EXCEPT ALL
       SELECT c_custkey FROM customer ORDER BY o_custkey LIMIT 25""",
    # precedence: INTERSECT ALL binds before UNION ALL
    """SELECT c_nationkey FROM customer INTERSECT ALL
       SELECT n_nationkey FROM nation UNION ALL
       SELECT r_regionkey FROM region ORDER BY c_nationkey""",
    # CTE feeding a group-by
    """WITH big AS (SELECT o_custkey, o_totalprice FROM orders
                    WHERE o_totalprice > 100000)
       SELECT o_custkey, COUNT(*) AS n FROM big
       GROUP BY o_custkey ORDER BY n DESC, o_custkey LIMIT 10""",
    # CTE referenced twice (materialized once, set op over both refs)
    """WITH b AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
       SELECT o_custkey FROM b INTERSECT SELECT o_custkey FROM b
       ORDER BY o_custkey LIMIT 5""",
    # derived table in FROM
    """SELECT pri, n FROM (SELECT o_orderpriority AS pri, COUNT(*) AS n
                           FROM orders GROUP BY o_orderpriority) t
       ORDER BY pri""",
    # uncorrelated scalar subquery in WHERE
    """SELECT o_orderkey, o_totalprice FROM orders
       WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.8 FROM orders)
       ORDER BY o_orderkey LIMIT 10""",
    # correlated EXISTS → left_semi decorrelation
    """SELECT c_custkey, c_name FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                     AND o_totalprice > 200000)
       ORDER BY c_custkey LIMIT 10""",
    # correlated NOT EXISTS → left_anti decorrelation
    """SELECT n_name FROM nation
       WHERE NOT EXISTS (SELECT 1 FROM customer
                         WHERE c_nationkey = n_nationkey
                         AND c_acctbal > 9000)
       ORDER BY n_name""",
    # IN (subquery) → left_semi
    """SELECT o_orderkey FROM orders WHERE o_custkey IN
       (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
       ORDER BY o_orderkey LIMIT 10""",
    # NOT IN (subquery) → left_anti
    """SELECT c_custkey FROM customer WHERE c_nationkey NOT IN
       (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
       ORDER BY c_custkey LIMIT 10""",
    # named WINDOW, two fns sharing one shuffle
    """SELECT o_custkey, o_orderkey,
              ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
       ORDER BY o_custkey, rn LIMIT 40""",
    # LAG / LEAD at partition edges
    """SELECT o_custkey, o_orderkey,
              LAG(o_orderkey) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS prev_o,
              LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS next_o
       FROM orders ORDER BY o_custkey, o_orderkey LIMIT 50""",
    # running SUM(int) — engine cumsum int64 widened to DuckDB HUGEINT→float64
    """SELECT o_custkey, o_orderkey,
              SUM(o_orderkey) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderkey) AS s
       FROM orders ORDER BY o_custkey, o_orderkey LIMIT 50""",
    # window fn nested inside a CASE expression
    """SELECT o_orderkey,
              CASE WHEN ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                           ORDER BY o_totalprice DESC,
                                                    o_orderkey) = 1
                   THEN 'top' ELSE 'rest' END AS tag
       FROM orders ORDER BY o_orderkey LIMIT 30""",
    # ROW_NUMBER in a derived table with an outer rank filter
    """SELECT o_orderkey, o_orderpriority FROM (
           SELECT o_orderkey, o_orderpriority,
                  ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_totalprice DESC,
                                              o_orderkey) AS rn
           FROM orders) t
       WHERE rn <= 2 ORDER BY o_orderpriority, o_orderkey""",
]


@pytest.mark.parametrize("query", E2E, ids=range(len(E2E)))
def test_sql_matches_duckdb_exactly(ray_session, sf_smoke, query):
    import duckdb

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation", "region"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_smoke}/{t}.parquet')"
        )
    mine = sql(query, sf_smoke).to_pandas()
    want = con.sql(query).df()
    assert list(mine.columns) == list(want.columns)
    mine = mine.sort_values(list(mine.columns)).reset_index(drop=True)
    want = want.sort_values(list(want.columns)).reset_index(drop=True)
    assert len(mine) == len(want)
    for c in mine.columns:
        a, b = mine[c], want[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert np.allclose(a.astype(float), b.astype(float),
                               rtol=0, atol=0, equal_nan=True), c
        else:
            assert (a.astype(str).values == b.astype(str).values).all(), c


def test_sql_explain_shows_pushed_plan(sf_smoke):
    from terrier_ray.sql import explain

    text = explain(NAIVE_SQL, sf_smoke)
    assert "Scan orders" in text and "broadcast" in text


def test_not_in_list_null_operand_drops_row(ray_session, tmp_root):
    """SQL: NULL NOT IN (...) is NULL → row dropped (pyarrow's is_in maps a
    NULL operand to false, so bare invert used to KEEP null rows)."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(str(tmp_root), "notin_sf")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table({"x": pa.array(["a", None, "b", "c", None]),
                  "y": pa.array([1, 2, 3, 4, 5], pa.int64())}),
        os.path.join(d, "t.parquet"),
    )
    q = "SELECT x, y FROM t WHERE x NOT IN ('a', 'c')"
    mine = sql(q, d).to_pandas().sort_values("y").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM read_parquet('{d}/t.parquet')")
    want = con.sql(q).df().sort_values("y").reset_index(drop=True)
    assert mine["y"].tolist() == want["y"].tolist() == [3]


def test_case_mixed_branch_kind_widens(ray_session, sf_smoke):
    """infer_kind folds ALL CASE branches: int THEN + float ELSE types the
    derived column float (if_else promotes), matching DuckDB."""
    import duckdb

    q = ("SELECT SUM(v) AS s FROM (SELECT CASE WHEN o_orderkey % 2 = 0 "
         "THEN 1 ELSE 2.5 END AS v FROM orders) sub")
    mine = sql(q, sf_smoke).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf_smoke}/orders.parquet')"
    )
    want = con.sql(q).df()
    assert float(mine["s"][0]) == float(want["s"][0])


def test_sql_dml_insert_delete_roundtrip(ray_session, sf_smoke, tmp_root):
    """INSERT INTO … SELECT and parameterized DELETE over a snapshot store:
    row counts and surviving values exact; prior versions stay readable."""
    import os
    import shutil

    import ray.data as rd

    from terrier_ray.sql import sql_dml
    from terrier_ray.state import snapshots

    root = os.path.join(str(tmp_root), "dml_store")
    shutil.rmtree(root, ignore_errors=True)
    snapshots.create_snapshot(root, rd.read_parquet(f"{sf_smoke}/nation.parquet"))
    n0 = snapshots.scan(root).count()
    stores = {"nat": root}

    import pyarrow.parquet as pq

    nat = pq.read_table(f"{sf_smoke}/nation.parquet")
    n_r1 = sum(1 for v in nat.column("n_regionkey").to_pylist() if v == 1)

    v2 = sql_dml("INSERT INTO nat SELECT * FROM nation WHERE n_regionkey = 1",
                 sf_smoke, stores)
    assert v2 == 2 and snapshots.scan(root).count() == n0 + n_r1
    v3 = sql_dml("DELETE FROM nat WHERE n_regionkey = $1", sf_smoke, stores,
                 params=[1])
    assert v3 == 3
    remaining = snapshots.scan(root).to_pandas()
    assert len(remaining) == n0 - n_r1
    assert (remaining["n_regionkey"] != 1).all()
    # time travel: v1 and v2 still intact
    assert snapshots.scan(root, version=1).count() == n0
    assert snapshots.scan(root, version=2).count() == n0 + n_r1


def test_sql_dml_update(ray_session, sf_smoke, tmp_root):
    """UPDATE … SET … WHERE: matched rows take the SET expressions
    (evaluated against the ORIGINAL row — SET a=b, b=a swaps), others pass
    through; schema/dtypes preserved; prior versions stay readable."""
    import os
    import shutil

    import ray.data as rd

    from terrier_ray.sql import sql_dml
    from terrier_ray.state import snapshots

    root = os.path.join(str(tmp_root), "dml_upd_store")
    shutil.rmtree(root, ignore_errors=True)
    snapshots.create_snapshot(
        root, rd.read_parquet(f"{sf_smoke}/customer.parquet")
    )
    stores = {"cust": root}
    before = snapshots.scan(root).to_pandas().sort_values("c_custkey")

    v2 = sql_dml(
        "UPDATE cust SET c_acctbal = c_acctbal + 100.0, "
        "c_mktsegment = 'touched' WHERE c_nationkey = $1",
        sf_smoke, stores, params=[1],
    )
    assert v2 == 2
    after = snapshots.scan(root).to_pandas().sort_values("c_custkey")
    assert list(after.dtypes) == list(before.dtypes)
    hit = before["c_nationkey"].to_numpy() == 1
    assert (
        after["c_acctbal"].to_numpy()
        == before["c_acctbal"].to_numpy() + 100.0 * hit
    ).all()
    assert (after["c_mktsegment"].to_numpy()[hit] == "touched").all()
    assert (
        after["c_mktsegment"].to_numpy()[~hit]
        == before["c_mktsegment"].to_numpy()[~hit]
    ).all()
    # SET reads the original row: swap two columns in one statement
    sql_dml("UPDATE cust SET c_custkey = c_nationkey, "
            "c_nationkey = c_custkey", sf_smoke, stores)
    swapped = snapshots.scan(root).to_pandas().sort_values("c_name")
    after_byname = after.sort_values("c_name")
    assert (
        swapped["c_custkey"].to_numpy()
        == after_byname["c_nationkey"].to_numpy()
    ).all()
    assert (
        swapped["c_nationkey"].to_numpy()
        == after_byname["c_custkey"].to_numpy()
    ).all()
    # time travel: v1 unchanged
    assert snapshots.scan(root, version=1).to_pandas().sort_values(
        "c_custkey"
    )["c_acctbal"].tolist() == before["c_acctbal"].tolist()


def test_sql_dml_rejected_by_select_path(sf_smoke):
    import pytest as _pytest

    from terrier_ray.sql import plan

    with _pytest.raises(ValueError, match="sql_dml"):
        plan("DELETE FROM t WHERE x = 1", sf_smoke)
    with _pytest.raises(ValueError, match="sql_dml"):
        plan("UPDATE t SET x = 1", sf_smoke)


def test_sql_params_match_literals(ray_session, sf_smoke):
    """$n binding produces the identical result as inlined literals
    (including string and timestamp params)."""
    q_param = ("SELECT o_orderpriority, count(*) AS n FROM orders "
               "WHERE o_totalprice > $1 AND o_orderstatus = $2 "
               "GROUP BY o_orderpriority ORDER BY o_orderpriority")
    q_lit = q_param.replace("$1", "50000.0").replace("$2", "'O'")
    a = sql(q_param, sf_smoke, params=[50000.0, "O"]).to_pandas()
    b = sql(q_lit, sf_smoke).to_pandas()
    assert a.equals(b)


def test_sql_param_missing_raises(sf_smoke):
    import pytest as _pytest

    from terrier_ray.sql import plan

    with _pytest.raises(ValueError, match=r"\$2"):
        plan("SELECT * FROM nation WHERE n_regionkey = $2", sf_smoke,
             params=[1])


def test_sql_explain_analyze_runtime_metrics(ray_session, sf_smoke):
    """EXPLAIN ANALYZE executes the query and reports per-operator runtime
    rows; the operator list and rows_out are plan-deterministic."""
    from terrier_ray.sql import explain_analyze

    q = (
        "SELECT o_orderpriority, count(*) AS n FROM orders "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    )
    res, metrics = explain_analyze(q, sf_smoke)
    names = metrics.column("operator").to_pylist()
    rows = metrics.column("rows_out").to_pylist()
    assert names[-1] == "Result" and rows[-1] == res.count()
    assert any("ReadParquet" in n for n in names)
    assert any("SortMap" in n for n in names)  # the shuffle shows up
    # the source reads more rows than the aggregate emits
    assert rows[0] > rows[-1]
    # timing columns exist and are non-negative
    assert all(w >= 0 for w in metrics.column("wall_s").to_pylist())
    # a second run yields the identical operator list (determinism contract)
    _res2, metrics2 = explain_analyze(q, sf_smoke)
    assert metrics2.column("operator").to_pylist() == names
    assert metrics2.column("rows_out").to_pylist() == rows


def test_prepared_statement_execute_many(ray_session, sf_smoke):
    """prepare() parses once; execute(params) binds $n per call and matches
    the one-shot sql() result for each binding."""
    import pandas as pd

    from terrier_ray.sql import prepare, sql

    q = (
        "SELECT c_mktsegment, count(*) AS n FROM customer "
        "WHERE c_acctbal > $1 GROUP BY c_mktsegment ORDER BY c_mktsegment"
    )
    ps = prepare(q, sf_smoke)
    for bal in (0.0, 5000.0):
        got = ps.execute([bal]).to_pandas()
        want = sql(q, sf_smoke, params=[bal]).to_pandas()
        pd.testing.assert_frame_equal(got, want)
    # distinct bindings actually change the result
    a = ps.execute([0.0]).to_pandas()["n"].sum()
    b = ps.execute([5000.0]).to_pandas()["n"].sum()
    assert a > b
    # bound literals reach the optimizer: the pushed plan shows the value
    assert "5000" in str(ps.plan([5000.0]))


def test_prepared_statement_rejects_dml(sf_smoke):
    import pytest as _pytest

    from terrier_ray.sql import prepare

    with _pytest.raises(ValueError, match="DML"):
        prepare("DELETE FROM orders WHERE o_orderkey = $1", sf_smoke)


def test_prepared_statement_unbound_param_clear_error(sf_smoke):
    import pytest as _pytest

    from terrier_ray.sql import prepare

    ps = prepare("SELECT * FROM nation WHERE n_regionkey = $1", sf_smoke)
    with _pytest.raises(ValueError, match=r"no value bound for parameter \$1"):
        ps.plan()  # execute() without params must not reach the planner


def test_sql_insert_values(ray_session, sf_smoke, tmp_root):
    """INSERT INTO t [(cols)] VALUES (...), (...): literal rows append as a
    new snapshot; unspecified columns become NULL; $n parameters bind; and
    non-literal row expressions / bad shapes fail with clear errors."""
    import os
    import shutil

    import pytest as _pytest
    import ray.data as rd

    from terrier_ray.sql import sql_dml
    from terrier_ray.state import snapshots

    root = os.path.join(str(tmp_root), "dml_values_store")
    shutil.rmtree(root, ignore_errors=True)
    snapshots.create_snapshot(root, rd.read_parquet(f"{sf_smoke}/nation.parquet"))
    n0 = snapshots.scan(root).count()
    stores = {"nat": root}

    v = sql_dml(
        "INSERT INTO nat (n_nationkey, n_name, n_regionkey) "
        "VALUES (900, 'XANADU', $1), (901, 'EREWHON', 4)",
        sf_smoke, stores, params=[3],
    )
    assert v == 2
    df = snapshots.scan(root).to_pandas()
    assert len(df) == n0 + 2
    new = df[df["n_nationkey"] >= 900].sort_values("n_nationkey")
    assert new["n_name"].tolist() == ["XANADU", "EREWHON"]
    assert new["n_regionkey"].tolist() == [3, 4]

    # column subset → NULL fill, negative literals evaluate
    sql_dml("INSERT INTO nat (n_nationkey) VALUES (-5)", sf_smoke, stores)
    df = snapshots.scan(root).to_pandas()
    row = df[df["n_nationkey"] == -5]
    assert len(row) == 1 and row["n_name"].isna().all()

    with _pytest.raises(ValueError, match="literals"):
        sql_dml("INSERT INTO nat (n_nationkey) VALUES (1 + 2)", sf_smoke, stores)
    with _pytest.raises(ValueError, match="columns"):
        sql_dml("INSERT INTO nat (bogus) VALUES (1)", sf_smoke, stores)
    with _pytest.raises(ValueError, match="values for"):
        sql_dml("INSERT INTO nat (n_nationkey) VALUES (1, 2)", sf_smoke, stores)


def test_window_frame_clauses(ray_session, sf_smoke):
    """ROWS/RANGE frame parsing + lowering: trailing ROWS windows map to
    moving_sum/moving_avg, UNBOUNDED..CURRENT to cumsum, whole-partition
    frames to first/last/nth; unsupported frames fail with clear errors."""
    import duckdb
    import pytest as _pytest

    from terrier_ray.sql import sql
    from terrier_ray.sql.parser import parse

    wd = parse(
        "SELECT SUM(a) OVER (ORDER BY b ROWS BETWEEN 3 PRECEDING AND "
        "CURRENT ROW) FROM t"
    ).items[0].expr.window
    assert wd.frame == ("rows", ("pre", 3), ("cur",))
    wd = parse("SELECT SUM(a) OVER (ORDER BY b ROWS 2 PRECEDING) FROM t") \
        .items[0].expr.window
    assert wd.frame == ("rows", ("pre", 2), ("cur",))

    q = """
        SELECT o_custkey, o_orderkey,
               SUM(tp_c) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                   AS mv_sum,
               AVG(tp_c) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS 1 PRECEDING) AS mv_avg
        FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                     CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS tp_c
              FROM orders) t
    """
    mine = (
        sql(q, sf_smoke).to_pandas()
        .sort_values(["o_custkey", "o_orderkey"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{sf_smoke}/orders.parquet')")
    want = (
        con.sql(q).df()
        .sort_values(["o_custkey", "o_orderkey"]).reset_index(drop=True)
    )
    for c in want.columns:
        assert (mine[c].to_numpy() == want[c].to_numpy()).all(), c

    with _pytest.raises(ValueError, match="unsupported window frame"):
        sql("SELECT SUM(o_totalprice) OVER (ORDER BY o_orderkey "
            "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) FROM orders", sf_smoke)
    with _pytest.raises(ValueError, match="AVG OVER requires"):
        sql("SELECT AVG(o_totalprice) OVER (ORDER BY o_orderkey) FROM orders",
            sf_smoke)
    with _pytest.raises(ValueError, match="LAST_VALUE"):
        sql("SELECT LAST_VALUE(o_orderkey) OVER (ORDER BY o_orderkey "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) FROM orders",
            sf_smoke)


def test_percentile_within_group_sql(ray_session, sf_smoke):
    """PERCENTILE_CONT/DISC ... WITHIN GROUP through SQL text: exact vs
    DuckDB on integer-scaled inputs; mixing with plain aggregates errors."""
    import duckdb
    import pytest as _pytest

    from terrier_ray.sql import sql

    q = """
        SELECT o_orderpriority,
               PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY tp_c) AS p25,
               PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY tp_c) AS p50d
        FROM (SELECT o_orderpriority,
                     CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS tp_c
              FROM orders) t
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """
    mine = sql(q, sf_smoke).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{sf_smoke}/orders.parquet')")
    want = con.sql(q).df().reset_index(drop=True)
    for c in want.columns:
        assert (mine[c].to_numpy() == want[c].to_numpy()).all(), c

    with _pytest.raises(ValueError, match="cannot mix"):
        sql("SELECT o_orderpriority, COUNT(*) AS n, "
            "PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS m "
            "FROM orders GROUP BY o_orderpriority", sf_smoke)
    with _pytest.raises(ValueError, match="GROUP BY"):
        sql("SELECT PERCENTILE_CONT(0.5) WITHIN GROUP "
            "(ORDER BY o_totalprice) AS m FROM orders", sf_smoke)


def test_sql_scalar_udf(ray_session, sf_smoke):
    """register_function makes a vectorized Python callable usable from SQL
    (the executable CREATE FUNCTION analog); values match DuckDB's inlined
    arithmetic exactly; dropping removes the surface; the compiled plan
    keeps working after the drop (callable captured at compile time)."""
    import duckdb
    import pytest as _pytest
    import pyarrow.compute as pc

    from terrier_ray.sql import drop_function, register_function

    register_function("taxed", lambda x: pc.add(pc.multiply(x, 2.0), 1.0))
    try:
        q_mine = ("SELECT o_orderkey, taxed(o_totalprice) AS taxed "
                  "FROM orders WHERE o_orderkey <= 320 ORDER BY o_orderkey")
        mine = sql(q_mine, sf_smoke).to_pandas().reset_index(drop=True)
        assert len(mine) > 0
        con = duckdb.connect()
        con.sql(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{sf_smoke}/orders.parquet')")
        want = con.sql(
            "SELECT o_orderkey, o_totalprice * 2.0 + 1.0 AS taxed "
            "FROM orders WHERE o_orderkey <= 320 ORDER BY o_orderkey"
        ).df().reset_index(drop=True)
        assert list(mine.columns) == list(want.columns)
        for c in want.columns:
            assert (mine[c].to_numpy() == want[c].to_numpy()).all(), c
    finally:
        drop_function("taxed")
    # dropped → the name is unsupported again
    with _pytest.raises(ValueError, match="unsupported function"):
        sql("SELECT taxed(o_totalprice) AS t FROM orders LIMIT 1", sf_smoke)


def test_udf_builtin_name_rejected():
    """A UDF shadowing a built-in SQL function name is unreachable (lower.py
    resolves builtins first) — register_function must reject it (ADVICE r4)."""
    import pytest as _pytest

    from terrier_ray.sql import register_function

    for name in ("ABS", "round", "Coalesce", "sum"):
        with _pytest.raises(ValueError, match="shadows a built-in"):
            register_function(name, lambda x: x)


def _write_kv(d, name, n, pad=0, seed=1, prefix=None):
    """<p>k unique int64, <p>v uniform 0..999, optional padding col."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = prefix or name[0]
    rng = np.random.default_rng(seed)
    cols = {
        f"{p}k": pa.array(np.arange(n, dtype=np.int64)),
        f"{p}v": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
    }
    if pad:
        cols[f"{p}w"] = pa.array(["x" * pad] * n)
    pq.write_table(pa.table(cols), os.path.join(d, f"{name}.parquet"))


def test_join_planning_flips_with_stats(ray_session, tmp_root):
    """Stats-driven join planning (VERDICT r4 #2): the SAME query flips
    broadcast <-> shuffle-cogroup with the build side's size; a selective
    pushed range filter shrinks the estimate enough to broadcast a table
    whose raw bytes would not; ANALYZE output sharpens equality ndv; and
    explain() surfaces the decision + estimate."""
    import os

    from terrier_ray.api import explain as api_explain
    from terrier_ray.sql import plan
    from terrier_ray.sql.rewrite import optimize

    d = os.path.join(str(tmp_root), "planstats_sf")
    os.makedirs(d, exist_ok=True)
    _write_kv(d, "fact", 20_000, pad=40, prefix="f")
    _write_kv(d, "dim_small", 200, prefix="s")
    _write_kv(d, "dim_big", 20_000, pad=40, prefix="b")

    thresh = 50_000  # between the two dims' footprints

    def strat(query, **kw):
        spec = optimize(plan(query, d, optimized=False), d, **kw)
        text = api_explain(spec)
        join_line = next(l for l in text.splitlines() if l.startswith("Join"))
        return spec, join_line

    _, small_line = strat(
        "SELECT fact.fk AS k, dim_small.sv AS dv FROM fact "
        "JOIN dim_small ON fact.fk = dim_small.sk",
        broadcast_max_bytes=thresh,
    )
    _, big_line = strat(
        "SELECT fact.fk AS k, dim_big.bv AS dv FROM fact "
        "JOIN dim_big ON fact.fk = dim_big.bk",
        broadcast_max_bytes=thresh,
    )
    assert "broadcast" in small_line and "build~" in small_line
    assert "shuffle-cogroup" in big_line  # same query, bigger table: flip

    # selective pushed range filter -> the BIG dim broadcasts after all
    _, filt_line = strat(
        "SELECT fact.fk AS k, dim_big.bv AS dv FROM fact "
        "JOIN dim_big ON fact.fk = dim_big.bk WHERE dim_big.bv < 10",
        broadcast_max_bytes=thresh,
    )
    assert "broadcast" in filt_line

    # ANALYZE ndv sharpens equality selectivity: bv = 7 is ~1/1000, not 1/10
    qe = (
        "SELECT fact.fk AS k, dim_big.bv AS dv FROM fact "
        "JOIN dim_big ON fact.fk = dim_big.bk WHERE dim_big.bv = 7"
    )
    spec_noan, _ = strat(qe, broadcast_max_bytes=10_000)
    join_noan = next(o for o in spec_noan["ops"] if o["op"] == "join")
    from terrier_ray.pipelines.analyze import analyze_table

    analyze_table(d, "dim_big", columns=["bk", "bv"])
    spec_an, _ = strat(qe, broadcast_max_bytes=10_000)
    join_an = next(o for o in spec_an["ops"] if o["op"] == "join")
    assert join_an["est_right"]["rows"] < join_noan["est_right"]["rows"]


def test_join_build_side_swap(ray_session, tmp_root):
    """When the ROOT table is broadcast-small and the right side is big,
    the optimizer swaps build sides (small side broadcasts, big side
    streams) -- plan asserts the swap, values match DuckDB exactly."""
    import os

    import duckdb

    from terrier_ray.api import build
    from terrier_ray.api import explain as api_explain
    from terrier_ray.sql import plan
    from terrier_ray.sql.rewrite import optimize

    d = os.path.join(str(tmp_root), "buildswap_sf")
    os.makedirs(d, exist_ok=True)
    _write_kv(d, "tiny", 300, prefix="t")
    _write_kv(d, "huge", 30_000, pad=40, prefix="h")

    q = ("SELECT tiny.tv AS tv, huge.hv AS hv, huge.hk AS hk "
         "FROM tiny JOIN huge ON tiny.tk = huge.hk WHERE huge.hv >= 0 "
         "ORDER BY hk")
    spec = optimize(plan(q, d, optimized=False), d, broadcast_max_bytes=50_000)
    text = api_explain(spec)
    assert "build side swapped" in text
    join = next(o for o in spec["ops"] if o.get("op") == "join")
    assert join.get("swapped_build") and join.get("broadcast")
    assert spec["scan"]["table"] == "huge"  # big side now streams/probes

    mine = build(spec, d).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    for t in ("tiny", "huge"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    want = con.sql(q).df().reset_index(drop=True)
    assert list(mine.columns) == list(want.columns)
    assert len(mine) == len(want) > 0
    for c in want.columns:
        assert (mine[c].to_numpy() == want[c].to_numpy()).all(), c


def test_join_reordering_by_stats(ray_session, tmp_root):
    """Stats-driven join ORDERING: in a run of consecutive inner joins, the
    selective broadcast join moves ahead of the big shuffle join (every
    later exchange sees the shrunk stream) — but ONLY when the moved
    join's keys are available at the new position.  Values stay exactly
    DuckDB's."""
    import os

    import duckdb

    from terrier_ray.api import build
    from terrier_ray.api import explain as api_explain
    from terrier_ray.sql import plan
    from terrier_ray.sql.rewrite import optimize

    d = os.path.join(str(tmp_root), "reorder_sf")
    os.makedirs(d, exist_ok=True)
    _write_kv(d, "fact", 20_000, pad=40, prefix="f")
    _write_kv(d, "dim_big", 20_000, pad=40, prefix="b")
    _write_kv(d, "dim_small", 200, prefix="s")

    # both join keys live on the ROOT table -> the small broadcast join
    # may (and should) move ahead of the big shuffle join
    q = (
        "SELECT fact.fk AS k, dim_big.bv AS bv, dim_small.sv AS sv "
        "FROM fact "
        "JOIN dim_big ON fact.fk = dim_big.bk "
        "JOIN dim_small ON fact.fv = dim_small.sk "
        "ORDER BY k"
    )
    spec = optimize(plan(q, d, optimized=False), d, broadcast_max_bytes=50_000)
    joins = [o for o in spec["ops"] if o["op"] == "join"]
    assert [j["right"]["scan"]["table"] for j in joins] == [
        "dim_small", "dim_big",
    ]
    assert joins[0].get("broadcast") and joins[0].get("reordered")
    assert not joins[1].get("broadcast")
    text = api_explain(spec)
    assert "(stats-reordered)" in text
    assert "parts=16" in text  # sized shuffle join, floored at the old 16

    mine = build(spec, d).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    for t in ("fact", "dim_big", "dim_small"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    want = con.sql(q).df().reset_index(drop=True)
    assert list(mine.columns) == list(want.columns)
    assert len(mine) == len(want) > 0
    for c in mine.columns:
        assert (mine[c].values == want[c].values).all(), c

    # the second join keys on the FIRST join's right side -> availability
    # constraint forbids the move; order must be untouched
    q2 = (
        "SELECT fact.fk AS k, dim_big.bv AS bv, dim_small.sv AS sv "
        "FROM fact "
        "JOIN dim_big ON fact.fk = dim_big.bk "
        "JOIN dim_small ON dim_big.bv = dim_small.sk "
        "ORDER BY k"
    )
    spec2 = optimize(plan(q2, d, optimized=False), d, broadcast_max_bytes=50_000)
    joins2 = [o for o in spec2["ops"] if o["op"] == "join"]
    assert [j["right"]["scan"]["table"] for j in joins2] == [
        "dim_big", "dim_small",
    ]
    assert not any(j.get("reordered") for j in joins2)
