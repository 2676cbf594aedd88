"""terrier_ray.api — declarative spec interpreter."""

from __future__ import annotations

import pyarrow as pa
import pytest

from terrier_ray.api import _compile_expr, build, explain
from terrier_ray.pipelines.specdemo import SPEC


def test_expr_compile_kernel_tree():
    t = pa.table({"a": [1.0, 2.0, 3.0]})
    fn = _compile_expr(
        {"fn": "add", "args": [{"fn": "multiply", "args": [{"col": "a"}, {"lit": 2.0}]}, {"lit": 1.0}]}
    )
    assert fn(t).to_pylist() == [3.0, 5.0, 7.0]


def test_expr_unknown_kernel_rejected():
    with pytest.raises(ValueError, match="unknown pyarrow.compute kernel"):
        _compile_expr({"fn": "__import__", "args": []})


def test_explain_is_static():
    plan = explain(SPEC)
    assert "Scan orders" in plan and "Join[inner,broadcast]" in plan
    assert "GroupAgg keys=['c_nationkey']" in plan


def test_spec_pipeline_matches_duckdb(ray_session, sf_smoke):
    import duckdb

    out = build(SPEC, sf_smoke).to_pandas().sort_values("c_nationkey").reset_index(drop=True)
    want = duckdb.sql(
        f"""SELECT c_nationkey, COUNT(o_orderkey) AS n_big
            FROM read_parquet('{sf_smoke}/orders.parquet') o
            JOIN read_parquet('{sf_smoke}/customer.parquet') c ON o_custkey = c_custkey
            WHERE o_totalprice > 300000 GROUP BY c_nationkey ORDER BY c_nationkey"""
    ).df()
    assert (out["c_nationkey"].values == want["c_nationkey"].values).all()
    assert (out["n_big"].values == want["n_big"].values).all()


def test_spec_window_and_sort(ray_session, sf_smoke):
    spec = {
        "scan": {"table": "orders", "columns": ["o_orderkey", "o_custkey", "o_orderdate"]},
        "ops": [
            {
                "op": "window",
                "partition_by": ["o_custkey"],
                "order_by": ["o_orderdate", "o_orderkey"],
                "specs": [["row_number", None, "rn"]],
            },
            {
                "op": "filter",
                "expr": {"fn": "equal", "args": [{"col": "rn"}, {"lit": 1}]},
            },
            {"op": "sort", "keys": ["o_orderkey"], "limit": 5},
        ],
    }
    out = build(spec, sf_smoke).to_pandas()
    assert len(out) == 5
    assert (out["rn"] == 1).all()


def test_spec_sample_unpivot_rollup(ray_session, sf_smoke):
    from terrier_ray.api import build as run_spec

    out = run_spec(
        {
            "scan": {"table": "orders", "columns": ["o_orderkey", "o_orderpriority", "o_orderstatus"]},
            "ops": [
                {"op": "sample", "key": "o_orderkey", "permil": 500},
                {
                    "op": "rollup",
                    "keys": ["o_orderpriority"],
                    "aggs": [["count", "o_orderkey", "n"]],
                },
            ],
        },
        sf_smoke,
    )
    t = out if hasattr(out, "num_rows") else out.to_pandas()
    import pandas as pd

    df = t.to_pandas() if hasattr(t, "to_pandas") else t
    # rollup emits the per-priority rows plus one grand-total (null key) row
    assert df["o_orderpriority"].isna().sum() == 1
    total = df.loc[df["o_orderpriority"].isna(), "n"].iloc[0]
    assert total == df.loc[~df["o_orderpriority"].isna(), "n"].sum()

    out2 = run_spec(
        {
            "scan": {"table": "nation", "columns": ["n_nationkey", "n_regionkey"]},
            "ops": [
                {
                    "op": "unpivot",
                    "id_cols": ["n_nationkey"],
                    "value_cols": ["n_regionkey"],
                    "name_col": "attr",
                    "value_col": "v",
                }
            ],
        },
        sf_smoke,
    )
    df2 = out2.to_pandas()
    assert set(df2["attr"]) == {"n_regionkey"}
    assert len(df2) == 25
