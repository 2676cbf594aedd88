"""Sources & sinks: CSV scan, CSV/parquet export, Arrow IPC round-trip."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq

from terrier_ray.sources.io import (
    export_arrow_ipc,
    read_arrow_ipc,
    read_csv_table,
    write_csv,
    write_parquet_partitioned,
)


def test_csv_roundtrip(ray_session, sf_smoke, tmp_root):
    src = pq.read_table(f"{sf_smoke}/nation.parquet")
    csv_path = os.path.join(str(tmp_root), "nation.csv")
    pacsv.write_csv(src, csv_path)
    ds = read_csv_table(csv_path)
    got = ds.to_pandas().sort_values("n_nationkey").reset_index(drop=True)
    want = src.to_pandas().sort_values("n_nationkey").reset_index(drop=True)
    # CSV infers int64 where parquet had int32 — compare values, not dtypes
    for c in want.columns:
        assert (got[c].astype(str).values == want[c].astype(str).values).all(), c


def test_write_csv_sink(ray_session, sf_smoke, tmp_root):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_smoke}/region.parquet")
    out = os.path.join(str(tmp_root), "region_csv")
    files = write_csv(ds, out)
    assert files
    # Ray writes one CSV part per block — read them all
    back = pa.concat_tables([pacsv.read_csv(f) for f in files])
    assert back.num_rows == 5


def test_partitioned_parquet_sink(ray_session, sf_smoke, tmp_root):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_smoke}/customer.parquet")
    out = os.path.join(str(tmp_root), "cust_part")
    files = write_parquet_partitioned(ds, out, "c_mktsegment")
    assert len(files) >= 5  # one dir per segment
    dirs = {os.path.basename(os.path.dirname(f)) for f in files}
    assert any("BUILDING" in d for d in dirs)


def test_arrow_ipc_roundtrip(ray_session, sf_smoke, tmp_root):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_smoke}/supplier.parquet")
    path = os.path.join(str(tmp_root), "supplier.arrow")
    export_arrow_ipc(ds, path)
    back = read_arrow_ipc(path)
    want = pq.read_table(f"{sf_smoke}/supplier.parquet")
    assert back.sort_by("s_suppkey").equals(want.sort_by("s_suppkey"))


def test_dup_clusters_finds_groups(ray_session, tmp_root):
    import pyarrow.parquet as pq2

    from terrier_ray.pipelines.dedup import dup_clusters

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    texts = [base, base + "tail", base + "other tail"]
    texts += [f"unrelated filler doc {i} with words of its own here" for i in range(10)]
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    d = os.path.join(str(tmp_root), "clusterdocs")
    os.makedirs(d, exist_ok=True)
    pq2.write_table(tab, os.path.join(d, "documents.parquet"))
    out = dup_clusters(d, jaccard_threshold=0.5).to_pandas()
    trio = out[out["doc_id"].isin([0, 1, 2])]
    assert len(trio) == 3
    assert trio["cluster_id"].nunique() == 1
    assert (trio["cluster_size"] == 3).all()


def test_json_roundtrip(ray_session, sf_smoke, tmp_root):
    import json

    from terrier_ray.sources.io import read_json_table, write_json

    src = pq.read_table(f"{sf_smoke}/nation.parquet")
    json_path = os.path.join(str(tmp_root), "nation.jsonl")
    with open(json_path, "w") as f:
        for row in src.to_pylist():
            f.write(json.dumps(row) + "\n")
    got = (
        read_json_table(json_path)
        .to_pandas()
        .sort_values("n_nationkey")
        .reset_index(drop=True)
    )
    want = src.to_pandas().sort_values("n_nationkey").reset_index(drop=True)
    for c in want.columns:
        assert (got[c].astype(str).values == want[c].astype(str).values).all(), c

    out_dir = os.path.join(str(tmp_root), "json_out")
    import ray.data as rd

    write_json(rd.from_arrow(src), out_dir)
    back = read_json_table(out_dir).to_pandas()
    assert len(back) == src.num_rows


def test_range_partition_prune(ray_session, sf_smoke, tmp_root):
    import datetime as dt

    import ray.data as rd

    from terrier_ray.sources.io import read_range_pruned, write_range_partitioned

    src = pq.read_table(
        f"{sf_smoke}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    out = os.path.join(str(tmp_root), "orders_by_date")
    bounds = [
        dt.datetime(1997, 1, 1),
        dt.datetime(1999, 1, 1),
        dt.datetime(2001, 1, 1),
    ]
    write_range_partitioned(rd.from_arrow(src), out, "o_orderdate", bounds)

    lo, hi = dt.datetime(1997, 6, 1), dt.datetime(1998, 6, 1)
    ds, n_read, n_total = read_range_pruned(out, "o_orderdate", lo, hi, bounds)
    got = ds.to_pandas()
    # pruning must touch only the middle partition
    assert (n_read, n_total) == (1, 4)
    want = src.to_pandas()
    want = want[(want["o_orderdate"] >= lo) & (want["o_orderdate"] < hi)]
    assert sorted(got["o_orderkey"]) == sorted(want["o_orderkey"])


def test_orc_roundtrip(ray_session, sf_smoke, tmp_root):
    import ray.data as rd

    from terrier_ray.sources.io import read_orc_table, write_orc

    src = pq.read_table(f"{sf_smoke}/nation.parquet")
    p = os.path.join(str(tmp_root), "nation.orc")
    write_orc(rd.from_arrow(src), p)
    got = (
        read_orc_table(p).to_pandas().sort_values("n_nationkey").reset_index(drop=True)
    )
    want = src.to_pandas().sort_values("n_nationkey").reset_index(drop=True)
    for c in want.columns:
        assert (got[c].astype(str).values == want[c].astype(str).values).all(), c


def test_sorted_parquet_rowgroup_pruning(ray_session, sf_smoke, tmp_root):
    import ray.data as rd

    from terrier_ray.sources.io import write_sorted_parquet

    src = pq.read_table(f"{sf_smoke}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    out = os.path.join(str(tmp_root), "orders_sorted")
    path = write_sorted_parquet(rd.from_arrow(src), out, "o_orderkey", row_group_rows=256)
    md = pq.read_metadata(path)
    assert md.num_row_groups >= 4
    # row-group zone maps: key ranges must be narrow and non-overlapping
    ranges = []
    for i in range(md.num_row_groups):
        col = md.row_group(i).column(0)
        ranges.append((col.statistics.min, col.statistics.max))
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # sorted layout
    # a point read prunes to one row group via the statistics
    hit = [i for i, (lo, hi) in enumerate(ranges) if lo <= 42 <= hi]
    assert len(hit) == 1
    got = pq.read_table(path, filters=[("o_orderkey", "=", 42)])
    assert got.num_rows == 1


def test_point_lookup_sorted_layout(ray_session, sf_smoke, tmp_root):
    """point_lookup over write_sorted_parquet: exact rows for present keys,
    empty (schema-preserving) for absent ones, duplicates included, and the
    read touches only the statistics-matched row groups."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from terrier_ray.sources.io import point_lookup, write_sorted_parquet

    out = os.path.join(str(tmp_root), "ptidx")
    ds = rd.read_parquet(f"{sf_smoke}/orders.parquet").select_columns(
        ["o_custkey", "o_orderkey", "o_totalprice"]
    )
    write_sorted_parquet(ds, out, "o_custkey", row_group_rows=256)

    full = pq.read_table(os.path.join(out, "part-0.parquet"))
    keys_all = full.column("o_custkey").to_pylist()
    some = sorted(set(keys_all))[:3] + [max(keys_all)]
    got = point_lookup(out, "o_custkey", some).sort_by(
        [("o_custkey", "ascending"), ("o_orderkey", "ascending")]
    )
    import pyarrow.compute as pc

    want = full.filter(
        pc.is_in(full.column("o_custkey"), value_set=pa.array(sorted(set(some))))
    ).sort_by([("o_custkey", "ascending"), ("o_orderkey", "ascending")])
    assert got.equals(want)  # duplicates of a key all surface

    empty = point_lookup(out, "o_custkey", [max(keys_all) + 999])
    assert empty.num_rows == 0
    assert empty.schema.names == full.schema.names

    sub = point_lookup(out, "o_custkey", some, columns=["o_orderkey"])
    assert sub.column_names == ["o_orderkey"]
    assert sub.num_rows == want.num_rows
