"""DECIMAL column support: scan-edge int64 scaling over decimal128 parquet."""

from decimal import Decimal

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_decimal_parquet(tmp_path):
    t = pa.table(
        {
            "k": pa.array(["a", "a", "b", "b", "b"]),
            "amt": pa.array(
                [
                    Decimal("1.23"),
                    Decimal("-5.50"),
                    None,
                    Decimal("0.01"),
                    Decimal("99999999.99"),
                ],
                pa.decimal128(12, 2),
            ),
            "rate": pa.array(
                [Decimal("0.0625"), Decimal("0.1250"), Decimal("0.0000"),
                 Decimal("1.0000"), Decimal("-0.0001")],
                pa.decimal128(8, 4),
            ),
            "plain": pa.array([1, 2, 3, 4, 5], pa.int64()),
        }
    )
    p = str(tmp_path / "dec.parquet")
    pq.write_table(t, p)
    return p


def test_read_decimal_scaled_exact(ray_session, tmp_path):
    from terrier_ray.ops.decimal import read_decimal_table

    p = _write_decimal_parquet(tmp_path)
    ds, scales = read_decimal_table(p)
    assert scales == {"amt": 2, "rate": 4}
    out = ds.to_pandas().sort_values("plain")  # block order not guaranteed
    assert [x for x in out["amt"].tolist() if x == x] == [123, -550, 1, 9999999999]
    assert out["amt"].isna().sum() == 1  # null preserved
    assert out["rate"].tolist() == [625, 1250, 0, 10000, -1]
    assert out["plain"].tolist() == [1, 2, 3, 4, 5]  # untouched


def test_read_decimal_float_mode(ray_session, tmp_path):
    from terrier_ray.ops.decimal import read_decimal_table

    p = _write_decimal_parquet(tmp_path)
    ds, scales = read_decimal_table(p, mode="float")
    out = ds.to_pandas().sort_values("plain")
    assert out["amt"].dtype == "float64"
    assert [x for x in out["amt"].tolist() if x == x] == [1.23, -5.5, 0.01, 99999999.99]


def test_decimal_group_sum_matches_python_decimal(ray_session, tmp_path):
    from terrier_ray.ops.decimal import read_decimal_table
    from terrier_ray.ops.relational import grouped_aggregate

    p = _write_decimal_parquet(tmp_path)
    ds, scales = read_decimal_table(p)
    agg = (
        grouped_aggregate(ds, ["k"], [("sum", "amt", "amt_sum")])
        .to_pandas()
        .set_index("k")["amt_sum"]
    )
    # exact integer sums ÷ 10^s == exact Decimal sums
    assert Decimal(int(agg["a"])) / 100 == Decimal("-4.27")
    assert Decimal(int(agg["b"])) / 100 == Decimal("100000000.00")


def test_decimal_precision_overflow_rejected(ray_session, tmp_path):
    from terrier_ray.ops.decimal import read_decimal_table

    t = pa.table(
        {"big": pa.array([Decimal("1.5")], pa.decimal128(25, 2))}
    )
    p = str(tmp_path / "big.parquet")
    pq.write_table(t, p)
    with pytest.raises(ValueError, match="precision 25"):
        read_decimal_table(p)
    # float mode still works
    ds, scales = read_decimal_table(p, mode="float")
    assert ds.to_pandas()["big"].tolist() == [1.5]
