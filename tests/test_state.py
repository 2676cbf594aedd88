"""Catalog (DDL analog) + snapshot versioning (Insert/Delete analog)."""

from __future__ import annotations

import os

import pyarrow.compute as pc
import pytest

from terrier_ray.state.catalog import Catalog
from terrier_ray.state import snapshots as snap


def test_catalog_crud(ray_session, sf_smoke, tmp_root):
    cat = Catalog(os.path.join(str(tmp_root), "cat"))
    cat.create_table("nation", f"{sf_smoke}/nation.parquet")
    cat.create_table("region", f"{sf_smoke}/region.parquet")
    assert cat.list_tables() == ["nation", "region"]
    d = cat.describe("nation")
    assert d["schema"]["n_nationkey"] == "int32"
    assert cat.scan("nation").count() == 25
    with pytest.raises(ValueError):
        cat.create_table("nation", f"{sf_smoke}/nation.parquet")
    cat.drop_table("region")
    assert cat.list_tables() == ["nation"]
    # persistence across instances
    cat2 = Catalog(os.path.join(str(tmp_root), "cat"))
    assert cat2.list_tables() == ["nation"]


def test_snapshot_insert_delete(ray_session, sf_smoke, tmp_root):
    import ray.data as rd

    root = os.path.join(str(tmp_root), "snap")
    base = rd.read_parquet(f"{sf_smoke}/nation.parquet")
    v1 = snap.create_snapshot(root, base)
    assert v1 == 1
    assert snap.scan(root).count() == 25

    # INSERT: append 25 more rows (re-keyed)
    extra = base.map_batches(
        lambda b: b.set_column(
            b.column_names.index("n_nationkey"),
            "n_nationkey",
            pc.add(b.column("n_nationkey"), 100),
        ),
        batch_format="pyarrow",
    )
    v2 = snap.append_rows(root, extra)
    assert v2 == 2
    assert snap.scan(root).count() == 50

    # DELETE: drop the appended rows again
    v3 = snap.delete_rows(root, lambda b: pc.less(b.column("n_nationkey"), 100))
    assert v3 == 3
    assert snap.scan(root).count() == 25
    # old snapshots remain readable (time travel)
    assert snap.scan(root) is not None
    import ray.data as rd2

    assert rd2.read_parquet(snap.snapshot_dir(root, 2)).count() == 50


def test_snapshot_time_travel(ray_session, tmp_root):
    import os

    import pyarrow as pa
    import ray.data as rd

    from terrier_ray.state.snapshots import append_rows, create_snapshot, scan

    root = os.path.join(str(tmp_root), "tt_snap")
    create_snapshot(root, rd.from_arrow(pa.table({"x": [1, 2, 3]})))
    v2 = append_rows(root, rd.from_arrow(pa.table({"x": [4, 5]})))
    assert v2 == 2
    assert scan(root).count() == 5  # latest
    assert scan(root, version=1).count() == 3  # time travel


def test_settings_registry(monkeypatch):
    from terrier_ray.settings import get_settings

    assert get_settings().num_partitions == 32
    monkeypatch.setenv("GRAFT_NUM_PARTITIONS", "8")
    monkeypatch.setenv("GRAFT_BUCKETS", "16")
    s = get_settings()
    assert s.num_partitions == 8
    assert s.posting_buckets == 16
