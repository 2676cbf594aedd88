"""Snapshot versioning: the Insert/Delete/Update analog for immutable data.

Reference MVCC writes in place with version chains (storage::DataTable,
/root/reference/src/include/storage/data_table.h:39-43); a batch engine
versions at snapshot granularity instead (SURVEY.md §7.1: "immutable Parquet
snapshots + manifests give us versioning"):

- INSERT      = append new part files to the next snapshot (no rewrite)
- DELETE      = filtered rewrite into the next snapshot (compaction-style)
- UPDATE      = delete + insert, same pass

Layout: ``root/v<N>/part-*.parquet`` + ``root/CURRENT`` (atomic pointer).
Readers always scan the snapshot named by CURRENT — writers never mutate a
published snapshot, so concurrent readers see a consistent version.
"""

from __future__ import annotations

import glob
import os
import shutil


def _current_path(root: str) -> str:
    return os.path.join(root, "CURRENT")


def current_version(root: str) -> int:
    p = _current_path(root)
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return int(f.read().strip())


def snapshot_dir(root: str, version: int | None = None) -> str:
    v = current_version(root) if version is None else version
    return os.path.join(root, f"v{v}")


def _publish(root: str, version: int) -> None:
    tmp = _current_path(root) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, _current_path(root))


def _strip_meta(batch):
    # Schemas carrying pandas metadata are unhashable (hash(pa.Schema)
    # trips on the metadata dict), which makes Ray's block-schema dedup
    # log a warning per task during rewrites. Snapshots never need the
    # pandas round-trip metadata — drop it at every write (zero-copy).
    return batch.replace_schema_metadata(None)


def create_snapshot(root: str, ds) -> int:
    """Initial load (v1) from a Dataset."""
    os.makedirs(root, exist_ok=True)
    out = snapshot_dir(root, 1)
    ds.map_batches(
        _strip_meta, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(out)
    _publish(root, 1)
    return 1


def scan(root: str, version: int | None = None, **kwargs):
    """Read a snapshot; ``version`` time-travels to an older published one
    (snapshots are immutable — every append/delete publishes a new vN)."""
    import ray.data as rd

    return rd.read_parquet(snapshot_dir(root, version), **kwargs)


def append_rows(root: str, ds) -> int:
    """INSERT: next snapshot = hardlinked existing parts + new parts."""
    cur = current_version(root)
    nxt = cur + 1
    out = snapshot_dir(root, nxt)
    os.makedirs(out, exist_ok=True)
    for f in glob.glob(os.path.join(snapshot_dir(root, cur), "*.parquet")):
        dst = os.path.join(out, os.path.basename(f))
        try:
            os.link(f, dst)  # zero-copy share of immutable parts
        except OSError:
            shutil.copy2(f, dst)
    ds.map_batches(
        _strip_meta, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(out)
    _publish(root, nxt)
    return nxt


def update_rows(root: str, transform_fn) -> int:
    """UPDATE: mapped rewrite into the next snapshot.

    transform_fn(batch: pa.Table) -> pa.Table with the SAME schema — SET
    expressions applied to matching rows, others passed through unchanged.
    The reference's delete+re-insert (update_translator.cpp) collapses to
    one streaming rewrite pass over immutable parts.
    """
    cur = current_version(root)
    nxt = cur + 1
    ds = scan(root)
    out = snapshot_dir(root, nxt)
    ds.map_batches(
        lambda b: _strip_meta(transform_fn(b)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).write_parquet(out)
    _publish(root, nxt)
    return nxt


def delete_rows(root: str, keep_mask_fn) -> int:
    """DELETE: filtered rewrite into the next snapshot.

    keep_mask_fn(batch: pa.Table) -> BooleanArray of rows to KEEP.
    """
    cur = current_version(root)
    nxt = cur + 1
    ds = scan(root)

    def apply(batch):
        return _strip_meta(batch.filter(keep_mask_fn(batch)))

    out = snapshot_dir(root, nxt)
    ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True).write_parquet(out)
    _publish(root, nxt)
    return nxt
