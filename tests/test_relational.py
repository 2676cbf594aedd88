"""Relational operator layer vs DuckDB oracles at sf0.001 (driver-mimic)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

ORACLED = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q4_order_priority",
    "q18_large_volume",
    "top10_orders",
    "distinct_segments",
    "string_functions",
    "like_filter",
    "date_functions",
    "events_hourly",
    "case_expression",
    "semi_join_urgent",
    "anti_join_no_urgent",
    "union_names",
    "count_distinct_segments",
    "nation_balance_stats",
    "lineitem_global_stats",
    "token_counts",
    "docs_by_lang",
    "exact_dedup",
    "knn_cosine",
    "math_functions",
    "cast_functions",
    "in_between_filter",
    "sessionize",
    "events_type_pivot",
    "analyze_lineitem",
    "string_functions2",
    "date_functions2",
    "trig_functions",
    "null_handling",
    "scalar_subquery",
    "intersect_nations",
    "except_sizes",
    "limit_offset",
    "cross_join_mismatched",
    "price_histogram",
    "asof_purchase_view",
    "bpe_token_counts",
    "json_extract_props",
    "q7_volume_shipping",
    "q10_returned_items",
    "q11_important_customers",
    "q14_promo_revenue",
    "q16_supplier_cnt",
    "q19_disjunctive_revenue",
    "window_order_rank",
    "window_running_spend",
    "window_order_gap_days",
    "median_order_value",
    "p90_order_value",
    "nations_csv",
    "window_dense_rank",
    "left_join_order_counts",
    "full_join_nation_presence",
    "cube_order_stats",
    "window_ntile",
    "string_functions3",
    "date_functions3",
    "math_functions3",
    "spec_big_orders_by_nation",
    "events_hopping",
    "window_percentiles",
]


@pytest.fixture(scope="module")
def duck(sf_smoke):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_smoke}/{t}.parquet')"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(ray_session, duck, sf_smoke, name):
    mine = _norm(_to_df(entrymod.queries()[name](sf_smoke)))
    want = _norm(duck.sql(entrymod.oracle_sql()[name]).df())
    assert len(mine) == len(want), f"row count {len(mine)} != {len(want)}"
    assert list(mine.columns) == list(want.columns)
    for c in mine.columns:
        a, b = mine[c], want[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            # fixed-point recipe ⇒ bit-identical doubles (NaN == NaN for nulls)
            av, bv = a.astype(float).values, b.astype(float).values
            assert (
                (av == bv) | (np.isnan(av) & np.isnan(bv))
            ).all(), f"{name}.{c} float mismatch"
        else:
            assert (a.astype(str).values == b.astype(str).values).all(), f"{name}.{c}"


def test_rows_only_queries_execute(ray_session, sf_smoke):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in qs:
        if name in oracles or name in ("bm25_topk", "index_corpus_stats"):
            continue  # oracled above; bm25 covered in test_index_bm25
        df = _to_df(qs[name](sf_smoke))
        assert isinstance(df, pd.DataFrame)
        assert df.shape[0] >= 0


def test_entry_smoke(ray_session):
    res = entrymod.entry()
    df = _to_df(res)
    assert len(df) > 0
    assert set(df.columns) == {"query_id", "rank", "docid", "score"}


def test_right_outer_cogroup_join(ray_session):
    """right_outer via the cogroup shuffle vs a pandas merge oracle."""
    import pyarrow as pa
    import ray.data as rd

    from terrier_ray.ops.relational import partitioned_join

    left = pd.DataFrame({"k": [1, 2, 3], "lv": ["a", "b", "c"]})
    right = pd.DataFrame({"rk": [2, 3, 4, 5], "rv": [20, 30, 40, 50]})
    out = partitioned_join(
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_arrow(pa.Table.from_pandas(right)),
        on=["k"],
        right_on=["rk"],
        join_type="right_outer",
        num_partitions=3,
    ).to_pandas()
    want = left.merge(
        right.rename(columns={"rk": "k"}), on="k", how="right"
    )
    out = out.sort_values("k").reset_index(drop=True)
    want = want.sort_values("k").reset_index(drop=True)
    assert (out["k"].values == want["k"].values).all()
    assert (out["rv"].values == want["rv"].values).all()
    assert out["lv"].isna().sum() == 2  # keys 4,5 null-extended


def test_null_keys_bucket_ops(ray_session):
    """Null join/group keys: SQL semantics (NULLs group together, joins drop)."""
    import pyarrow as pa
    import ray.data as rd

    from terrier_ray.ops.relational import distinct, grouped_aggregate

    t = pa.table(
        {
            "k": pa.array(["a", None, "b", None, "a"], type=pa.string()),
            "ki": pa.array([1, None, 2, None, 1], type=pa.int64()),
            "v": pa.array([10, 20, 30, 40, 50], type=pa.int64()),
        }
    )
    agg = (
        grouped_aggregate(rd.from_arrow(t), ["k"], [("sum", "v", "sv")])
        .to_pandas()
        .set_index("k")["sv"]
    )
    assert agg["a"] == 60 and agg["b"] == 30
    assert agg[pd.isna(agg.index)].iloc[0] == 60  # both NULL rows, one group
    dd = distinct(rd.from_arrow(t), ["ki"]).to_pandas()
    assert len(dd) == 3  # 1, 2, NULL


def test_global_aggregate_null_semantics(ray_session):
    """COUNT(col)/AVG(col) skip nulls (SQL), not Ray row-count semantics."""
    import pyarrow as pa
    import ray.data as rd

    from terrier_ray.ops.relational import global_aggregate

    t = pa.table({"x": pa.array([1.0, None, 3.0], type=pa.float64())})
    out = global_aggregate(
        rd.from_arrow(t), [("count", "x", "n"), ("mean", "x", "m")]
    ).to_pandas()
    assert out["n"][0] == 2
    assert out["m"][0] == 2.0


def test_right_semi_anti_cogroup_join(ray_session):
    """right_semi / right_anti emit the right side's rows filtered by
    left-key existence (reference join-type enum has RIGHT_SEMI/RIGHT_ANTI,
    plan_node_defs.h:99-110)."""
    import pyarrow as pa
    import ray.data as rd

    from terrier_ray.ops.relational import partitioned_join

    left = pd.DataFrame({"k": [1, 2, 3, 3], "lv": ["a", "b", "c", "d"]})
    right = pd.DataFrame({"rk": [2, 3, 4, 5], "rv": [20, 30, 40, 50]})
    semi = partitioned_join(
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_arrow(pa.Table.from_pandas(right)),
        on=["k"], right_on=["rk"], join_type="right_semi", num_partitions=3,
    ).to_pandas().sort_values("k")
    assert list(semi["k"]) == [2, 3]
    assert list(semi["rv"]) == [20, 30]  # right rows, never duplicated
    anti = partitioned_join(
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_arrow(pa.Table.from_pandas(right)),
        on=["k"], right_on=["rk"], join_type="right_anti", num_partitions=3,
    ).to_pandas().sort_values("k")
    assert list(anti["k"]) == [4, 5]
    assert list(anti["rv"]) == [40, 50]


def test_driver_contract_consistency():
    """Every oracle_sql key must have a queries() entry, names must be
    unique across modules, and no callable collides (driver contract)."""
    q = entrymod.queries()
    s = entrymod.oracle_sql()
    assert set(s) <= set(q), set(s) - set(q)
    assert len(q) >= 100
    for name, fn in q.items():
        assert callable(fn), name


def test_grouped_topk_vs_pandas(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from terrier_ray.ops.relational import grouped_topk

    rng = np.random.default_rng(11)
    t = pa.table(
        {
            "k": rng.integers(0, 23, 5000),
            "v": rng.permutation(5000).astype(np.int64),  # unique → no ties
        }
    )
    out = (
        grouped_topk(rd.from_arrow(t).repartition(8), ["k"], "v", 3)
        .to_pandas()
        .sort_values(["k", "v"], ascending=[True, False])
        .reset_index(drop=True)
    )
    want = (
        t.to_pandas()
        .sort_values(["k", "v"], ascending=[True, False])
        .groupby("k")
        .head(3)
        .reset_index(drop=True)
    )
    assert (out["k"].values == want["k"].values).all()
    assert (out["v"].values == want["v"].values).all()


def test_unpivot_null_and_type_promotion(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from terrier_ray.ops.relational import unpivot

    t = pa.table(
        {
            "id": pa.array([1, 2], type=pa.int64()),
            "a": pa.array([10, None], type=pa.int64()),
            "b": pa.array([None, 2.5], type=pa.float64()),
        }
    )
    out = (
        unpivot(rd.from_arrow(t), ["id"], ["a", "b"], "attr", "val")
        .to_pandas()
        .sort_values(["id", "attr"])
        .reset_index(drop=True)
    )
    assert len(out) == 4
    assert list(out["attr"]) == ["a", "b", "a", "b"]
    # int64 + float64 promote; nulls survive
    assert out["val"].isna().sum() == 2
    assert out.loc[(out["id"] == 2) & (out["attr"] == "b"), "val"].iloc[0] == 2.5


def test_bernoulli_sample_permil_bounds(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from terrier_ray.ops.sample import bernoulli_sample

    ds = rd.from_arrow(pa.table({"k": np.arange(2000, dtype=np.int64)}))
    assert bernoulli_sample(ds, "k", 0).count() == 0  # permil=0 → nothing
    assert bernoulli_sample(ds, "k", 1000).count() == 2000  # 1000 → all


def test_grouping_sets_rejects_bad_set(ray_session):
    import pyarrow as pa
    import pytest as pt
    import ray.data as rd

    from terrier_ray.ops.relational import grouping_sets_aggregate

    ds = rd.from_arrow(pa.table({"a": [1], "b": [2], "v": [3]}))
    with pt.raises(ValueError):
        grouping_sets_aggregate(ds, ["a"], [("sum", "v", "s")], [["b"]])


def test_setop_all_multiset_semantics(ray_session):
    """INTERSECT ALL / EXCEPT ALL vs a Counter oracle on random multisets."""
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from terrier_ray.ops.relational import setop_all

    rng = np.random.default_rng(7)
    lvals = rng.integers(0, 30, size=5000).tolist()
    rvals = rng.integers(10, 40, size=3000).tolist()
    left = rd.from_arrow(pa.table({"k": pa.array(lvals, pa.int64())}))
    right = rd.from_arrow(pa.table({"r": pa.array(rvals, pa.int64())}))
    lc, rc = Counter(lvals), Counter(rvals)

    got_i = Counter(
        setop_all(left, right, ["k"], right_columns=["r"], mode="intersect")
        .to_pandas()["k"]
        .tolist()
    )
    want_i = Counter({v: min(m, rc[v]) for v, m in lc.items() if min(m, rc[v]) > 0})
    assert got_i == want_i

    got_e = Counter(
        setop_all(left, right, ["k"], right_columns=["r"], mode="except")
        .to_pandas()["k"]
        .tolist()
    )
    want_e = Counter({v: m - rc[v] for v, m in lc.items() if m - rc[v] > 0})
    assert got_e == want_e


def test_setop_all_multi_key(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from terrier_ray.ops.relational import setop_all

    left = rd.from_arrow(
        pa.table({"a": [1, 1, 1, 2, 2], "b": ["x", "x", "y", "z", "z"]})
    )
    right = rd.from_arrow(pa.table({"a": [1, 1, 2], "b": ["x", "x", "q"]}))
    out = setop_all(left, right, ["a", "b"], mode="intersect").to_pandas()
    assert sorted(map(tuple, out.values.tolist())) == [(1, "x"), (1, "x")]
    out2 = setop_all(left, right, ["a", "b"], mode="except").to_pandas()
    assert sorted(map(tuple, out2.values.tolist())) == [(1, "y"), (2, "z"), (2, "z")]
