"""ops.window.windowed — segment-kernel edge cases vs a pandas oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from terrier_ray.ops.window import windowed


@pytest.fixture()
def keyed_df() -> pd.DataFrame:
    rng = np.random.default_rng(7)
    n = 2000
    return pd.DataFrame(
        {
            "k": rng.integers(0, 37, n),  # many keys per bucket
            "ord": rng.integers(0, 50, n),  # deliberate ties for rank
            "uid": np.arange(n),  # unique tiebreak
            "v": rng.integers(-100, 100, n).astype(np.int64),
        }
    )


def _run(df: pd.DataFrame, specs, order, num_partitions=5, descending=False):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pandas(df))
    out = windowed(
        ds, ["k"], order, specs, num_partitions=num_partitions, descending=descending
    ).to_pandas()
    return out.sort_values("uid").reset_index(drop=True)


def test_row_number_and_cumsum(ray_session, keyed_df):
    out = _run(
        keyed_df,
        [("row_number", None, "rn"), ("cumsum", "v", "run_v")],
        ["ord", "uid"],
    )
    g = keyed_df.sort_values(["ord", "uid"]).groupby("k")
    want_rn = g.cumcount() + 1
    want_cs = g["v"].cumsum()
    want = keyed_df.assign(rn=want_rn, run_v=want_cs).sort_values("uid")
    assert (out["rn"].values == want["rn"].values).all()
    assert (out["run_v"].values == want["run_v"].values).all()


def test_rank_with_ties(ray_session, keyed_df):
    out = _run(keyed_df, [("rank", None, "rank")], ["ord"])
    want = (
        keyed_df.groupby("k")["ord"].rank(method="min").astype(np.int64)
    )
    assert (out["rank"].values == want.values).all()


def test_lag_lead_edges(ray_session, keyed_df):
    out = _run(
        keyed_df,
        [("lag", "v", "prev_v"), ("lead", "v", "next_v")],
        ["ord", "uid"],
    )
    s = keyed_df.sort_values(["ord", "uid"]).groupby("k")["v"]
    want = keyed_df.assign(prev_v=s.shift(1), next_v=s.shift(-1)).sort_values("uid")
    pd.testing.assert_series_equal(
        out["prev_v"], want["prev_v"].reset_index(drop=True), check_names=False
    )
    pd.testing.assert_series_equal(
        out["next_v"], want["next_v"].reset_index(drop=True), check_names=False
    )
    # every partition has exactly one null lag (first row) and one null lead
    nulls = out.groupby("k")["prev_v"].apply(lambda c: c.isna().sum())
    assert (nulls == 1).all()


def test_descending_order(ray_session, keyed_df):
    out = _run(
        keyed_df,
        [("row_number", None, "rn")],
        ["ord", "uid"],
        descending=[True, True],
    )
    g = keyed_df.sort_values(["ord", "uid"], ascending=False).groupby("k")
    want = keyed_df.assign(rn=g.cumcount() + 1).sort_values("uid")
    assert (out["rn"].values == want["rn"].values).all()


def test_single_bucket_equivalence(ray_session, keyed_df):
    """Bucket count must not change results (pure partitioning concern)."""
    a = _run(keyed_df, [("row_number", None, "rn")], ["ord", "uid"], num_partitions=1)
    b = _run(keyed_df, [("row_number", None, "rn")], ["ord", "uid"], num_partitions=13)
    assert (a["rn"].values == b["rn"].values).all()


def test_bad_kind_raises(ray_session, keyed_df):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pandas(keyed_df))
    with pytest.raises(ValueError):
        windowed(ds, ["k"], ["ord"], [("median", "v", "m")])


def test_ntile_sql_semantics(ray_session):
    """NTILE(4) incl. partitions smaller than n — vs DuckDB directly."""
    import duckdb
    import ray.data as rd

    rng = np.random.default_rng(3)
    sizes = {0: 2, 1: 3, 2: 4, 3: 7, 4: 50, 5: 101}  # some cnt < n
    rows = [
        {"k": k, "uid": k * 1000 + i, "v": int(rng.integers(0, 1000))}
        for k, c in sizes.items()
        for i in range(c)
    ]
    df = pd.DataFrame(rows)
    out = (
        windowed(
            rd.from_arrow(pa.Table.from_pandas(df)),
            ["k"],
            ["v", "uid"],
            [("ntile", 4, "nt")],
            num_partitions=3,
        )
        .to_pandas()
        .sort_values("uid")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        "SELECT uid, NTILE(4) OVER (PARTITION BY k ORDER BY v, uid) AS nt "
        "FROM df ORDER BY uid"
    ).df()
    assert (out["nt"].values == want["nt"].values).all()


def test_null_partition_and_order_keys(ray_session):
    """SQL window semantics over NULL keys: one NULL partition; NULL order
    values are tied peers."""
    import duckdb

    df = pd.DataFrame(
        {
            "k": ["a", "a", None, None, None, "b"],
            "o": [1.0, None, 2.0, None, None, 1.0],
            "uid": range(6),
        }
    )
    import ray.data as rd

    out = (
        windowed(
            rd.from_arrow(pa.Table.from_pandas(df)),
            ["k"],
            ["o"],
            [("row_number", None, "rn"), ("rank", None, "rk")],
            num_partitions=2,
        )
        .to_pandas()
        .sort_values("uid")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        "SELECT uid, ROW_NUMBER() OVER (PARTITION BY k ORDER BY o) rn, "
        "RANK() OVER (PARTITION BY k ORDER BY o) rk FROM df ORDER BY uid"
    ).df()
    assert (out["rn"].values == want["rn"].values).all()
    assert (out["rk"].values == want["rk"].values).all()


def test_moving_frame_vs_pandas(ray_session, keyed_df):
    out = _run(
        keyed_df,
        [("moving_sum", "v", "ms", 4), ("moving_avg", "v", "ma", 4)],
        ["ord", "uid"],
    )
    s = keyed_df.sort_values(["ord", "uid"])
    g = s.groupby("k")["v"]
    want_ms = g.rolling(4, min_periods=1).sum().reset_index(level=0, drop=True)
    want_ma = g.rolling(4, min_periods=1).mean().reset_index(level=0, drop=True)
    want = s.assign(ms=want_ms, ma=want_ma).sort_values("uid")
    assert (out["ms"].values == want["ms"].values.astype(np.int64)).all()
    assert np.allclose(out["ma"].values, want["ma"].values, rtol=0, atol=0)


def test_first_last_nth_vs_pandas(ray_session, keyed_df):
    out = _run(
        keyed_df,
        [
            ("first_value", "uid", "fv", None),
            ("last_value", "uid", "lv", None),
            ("nth_value", "uid", "nv", 3),
        ],
        ["ord", "uid"],
    )
    s = keyed_df.sort_values(["ord", "uid"])
    g = s.groupby("k")["uid"]
    want = s.assign(
        fv=g.transform("first"),
        lv=g.transform("last"),
        nv=g.transform(lambda x: x.iloc[2] if len(x) >= 3 else np.nan),
    ).sort_values("uid")
    assert (out["fv"].values == want["fv"].values).all()
    assert (out["lv"].values == want["lv"].values).all()
    got_nv = out["nv"].astype("float64").values
    assert np.array_equal(got_nv, want["nv"].values, equal_nan=True)


def test_window_desc_order_with_ties(ray_session, keyed_df):
    out = _run(
        keyed_df,
        [("rank", None, "r"), ("row_number", None, "rn")],
        ["ord"],
        descending=True,
    )
    want_r = (
        keyed_df.groupby("k")["ord"].rank(method="min", ascending=False).astype(np.int64)
    )
    assert (out["r"].values == want_r.values).all()
    # row_number is a permutation of 1..group_size per key
    g = out.assign(k=keyed_df["k"]).groupby("k")["rn"]
    assert (g.max() == g.count()).all()
    assert (g.min() == 1).all()
