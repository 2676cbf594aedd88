"""Sources & sinks beyond parquet: CSV scan, CSV/parquet export, Arrow IPC.

Reference analogs:
- CSVScan plan node (delimiter/quote/escape) —
  /root/reference/src/include/planner/plannodes/csv_scan_plan_node.h:15-60,
  runtime execution/util/csv_reader.h:208
- ExportExternalFile (COPY ... TO csv/binary) —
  planner/plannodes/export_external_file_plan_node.h:21-51
- ArrowSerializer::ExportTable (Arrow IPC readable by pandas) —
  storage/arrow_serializer.h:19-63

Resumable-output contract: parquet sinks write one directory per job with
Ray-generated unique part files; ``write_parquet_partitioned`` lays out one
subdirectory per key value so a rerun can skip finished partitions.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.ipc as pa_ipc


def hashable_schema(path: str, columns=None) -> "pa.Schema | None":
    """Metadata-stripped (and column-pruned) schema for a parquet path.

    Pandas-written parquet carries a ``b'pandas'`` schema-metadata blob that
    makes ``pa.Schema`` unhashable on this pyarrow build; Ray Data's block
    unify then logs a per-task warning storm ("Failed to hash the schemas").
    Passing an explicit stripped ``schema=`` to ``read_parquet`` restores
    schema hashability (and the early-exit fast path in unify_schemas).
    Returns None when no parquet footer can be found.
    """
    import pyarrow.parquet as pq

    p = path
    if os.path.isdir(p):
        found = sorted(glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True))
        if not found:
            return None
        p = found[0]
    try:
        full = pq.read_schema(p).remove_metadata()
    except Exception:
        return None
    if columns:
        return pa.schema([full.field(c) for c in columns])
    return full


def read_csv_table(path: str, **arrow_csv_kwargs):
    """CSVScan: ray.data.read_csv (Arrow CSV reader under the hood)."""
    import ray.data as rd

    return rd.read_csv(path, **arrow_csv_kwargs)


def write_csv(ds, out_dir: str):
    """COPY ... TO csv."""
    ds.write_csv(out_dir)
    return sorted(glob.glob(os.path.join(out_dir, "*")))


def write_parquet_partitioned(ds, out_dir: str, partition_col: str):
    """Partitioned parquet sink (one dir per key value → resumable layout)."""
    ds.write_parquet(out_dir, partition_cols=[partition_col])
    return sorted(glob.glob(os.path.join(out_dir, "**/*.parquet"), recursive=True))


def export_arrow_ipc(ds, out_path: str) -> str:
    """Arrow IPC (Feather2) export of a Dataset — the ArrowSerializer analog.

    Streams batches to one IPC file; for big data prefer the parquet sink
    (this is the interchange path for pandas/polars consumers).
    """
    batches = ds.iter_batches(batch_size=65536, batch_format="pyarrow")
    writer = None
    try:
        for b in batches:
            if writer is None:
                writer = pa_ipc.new_file(out_path, b.schema)
            for rb in b.to_batches():
                writer.write_batch(rb)
        if writer is None:  # empty dataset → still emit a valid schema-only file
            schema = ds.schema()
            writer = pa_ipc.new_file(
                out_path,
                pa.schema(list(zip(schema.names, schema.types))),
            )
    finally:
        if writer is not None:
            writer.close()
    return out_path


def read_arrow_ipc(path: str) -> pa.Table:
    with pa_ipc.open_file(path) as r:
        return r.read_all()


def read_json_table(path: str, **arrow_json_kwargs):
    """NDJSON scan: ray.data.read_json (newline-delimited JSON; Arrow JSON
    reader under the hood, schema inferred per file block)."""
    import ray.data as rd

    return rd.read_json(path, **arrow_json_kwargs)


def write_json(ds, out_dir: str):
    """NDJSON sink (one .json part per block — line-delimited records)."""
    ds.write_json(out_dir)
    return out_dir


def write_range_partitioned(ds, out_dir: str, col: str, boundaries):
    """Range-partitioned parquet layout: rows are bucketed by
    ``searchsorted(boundaries, col)`` into one directory per contiguous key
    range, and a ``_range_manifest.json`` records the boundaries so readers
    can prune.  This is the 100 TB data-layout lever: a time- or key-range
    query touches only the overlapping partitions instead of every file
    (plus parquet row-group min/max pruning within them).

    ``boundaries`` must be sorted ascending; partition i holds rows with
    ``boundaries[i-1] <= col < boundaries[i]`` (open-ended at both extremes).
    """
    import json

    import numpy as np

    bounds = list(boundaries)

    def tag(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        part = np.searchsorted(np.asarray(bounds), v, side="right")
        return batch.append_column("__range_part", pa.array(part.astype(np.int64)))

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    tagged.write_parquet(out_dir, partition_cols=["__range_part"])
    manifest = {
        "col": col,
        "boundaries": [str(b) for b in bounds],
        "n_partitions": len(bounds) + 1,
    }
    with open(os.path.join(out_dir, "_range_manifest.json"), "w") as f:
        json.dump(manifest, f)
    return out_dir


def read_range_pruned(out_dir: str, col: str, lo, hi, boundaries, **read_kwargs):
    """Read ONLY the partitions of a ``write_range_partitioned`` layout that
    can contain ``lo <= col < hi`` (pass the same ``boundaries``).  Returns
    (dataset, n_partitions_read, n_partitions_total); the residual exact
    filter still applies — pruning is a superset guarantee.
    """
    import bisect

    import pyarrow.dataset as pads_

    import ray.data as rd

    bounds = list(boundaries)
    n_parts = len(bounds) + 1
    first = bisect.bisect_right(bounds, lo)
    last = bisect.bisect_left(bounds, hi)  # partition idx containing hi-ε
    keep = [p for p in range(first, min(last, n_parts - 1) + 1)]
    paths = [
        p
        for part in keep
        for p in sorted(
            glob.glob(os.path.join(out_dir, f"__range_part={part}", "*.parquet"))
        )
    ]
    if not paths:
        # every partition in [lo, hi) got zero rows at write time (no
        # directory exists) — read_parquet([]) raises, so synthesize an
        # empty dataset with the layout's schema instead
        any_part = sorted(
            glob.glob(os.path.join(out_dir, "__range_part=*", "*.parquet"))
        )
        schema = hashable_schema(any_part[0]) if any_part else pa.schema([])
        return rd.from_arrow(schema.empty_table()), 0, n_parts
    expr = (pads_.field(col) >= lo) & (pads_.field(col) < hi)
    ds = rd.read_parquet(paths, filter=expr, **read_kwargs)
    return ds, len(keep), n_parts


def read_orc_table(path: str):
    """ORC scan: one Ray task per file decodes stripes straight to Arrow
    (Ray 2.49 has no native ORC datasource; the path list fans out as a
    Dataset and each map task emits its file's Table — batch-level, never
    per-row)."""
    import glob as _glob

    import ray.data as rd

    paths = (
        sorted(_glob.glob(os.path.join(path, "*.orc")))
        if os.path.isdir(path)
        else [path]
    )

    def load(batch: pa.Table) -> pa.Table:
        import pyarrow.orc as _orc

        tabs = [_orc.read_table(p) for p in batch.column("p").to_pylist()]
        return pa.concat_tables(tabs)

    ds = rd.from_arrow(pa.table({"p": pa.array(paths)})).repartition(len(paths))
    return ds.map_batches(load, batch_format="pyarrow", zero_copy_batch=True)


def write_orc(ds, out_path: str) -> str:
    """ORC sink: stream batches into one ORC file (interchange path, like
    the Arrow IPC export; big data stays on the parquet sink)."""
    import pyarrow.orc as _orc

    batches = list(ds.iter_batches(batch_size=65536, batch_format="pyarrow"))
    tab = pa.concat_tables(batches)
    _orc.write_table(tab, out_path)
    return out_path


def write_sorted_parquet(
    ds, out_dir: str, sort_col: str, row_group_rows: int = 4096
):
    """Cluster-by-key layout: globally sort by ``sort_col`` and write with
    small row groups so every row group's min/max statistics span a narrow
    key range — point/range scans then prune most row groups (the zone-map
    companion to write_range_partitioned's file-level pruning)."""
    import pyarrow.parquet as _pq

    sorted_ds = ds.sort(sort_col)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "part-0.parquet")
    writer = None
    try:
        # stream block-by-block in sorted order — the driver never holds
        # more than one block
        for b in sorted_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
            if writer is None:
                writer = _pq.ParquetWriter(path, b.schema)
            writer.write_table(b, row_group_size=row_group_rows)
    finally:
        if writer is not None:
            writer.close()
    return path


def point_lookup(path, key_col: str, keys, columns=None) -> pa.Table:
    """IndexScan-Exact for relational tables: ``(table, key) → rows`` over
    the sorted-parquet layout (write_sorted_parquet's zone maps).

    Reference analog: the keyed B+Tree/Hash INDEXSCAN over arbitrary tables
    (/root/reference/src/include/storage/index/index_defs.h:12-17,
    index_scan_translator.cpp) — here the "index" is the clustered layout
    itself: per-row-group min/max statistics on ``key_col`` come free from
    the parquet footer, locating a key is a binary search over those
    fences, and only the matching row groups are read (same machinery as
    the BM25 term-dictionary lookup, bm25.BM25Index._bucket_handle).

    ``path`` is one sorted parquet file or a directory of them (each file
    internally sorted; the file-level [min, max] prunes whole files).
    Returns the matching rows as one arrow table — point lookups are
    bounded-small by contract (key sets, not ranges; use read_range_pruned
    for ranges).
    """
    import bisect
    import glob as _glob

    import numpy as _np
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    files = (
        sorted(_glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    keys = sorted(set(keys))
    out = []
    for f in files:
        pf = _pq.ParquetFile(f)
        md = pf.metadata
        ki = pf.schema_arrow.get_field_index(key_col)
        if ki < 0:
            raise KeyError(f"no column {key_col!r} in {f}")
        mins, maxs = [], []
        stats_ok = True
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(ki).statistics
            if st is None or st.min is None or st.max is None:
                stats_ok = False
                break
            mins.append(st.min)
            maxs.append(st.max)
        if not stats_ok:  # foreign writer without statistics: filtered read
            t = _pq.read_table(
                f, columns=columns, filters=[(key_col, "in", keys)]
            )
            if t.num_rows:
                out.append(t)
            continue
        if not mins or keys[-1] < mins[0] or keys[0] > maxs[-1]:
            continue  # file-level prune
        rgs: set[int] = set()
        for kv in keys:
            i = bisect.bisect_right(mins, kv) - 1
            # duplicates of one key can span adjacent row groups
            while 0 <= i < len(mins) and mins[i] <= kv <= maxs[i]:
                rgs.add(i)
                i += 1
                if i >= len(mins) or mins[i] > kv:
                    break
        if not rgs:
            continue
        cols = None if columns is None else list(dict.fromkeys([key_col] + columns))
        t = pf.read_row_groups(sorted(rgs), columns=cols)
        t = t.filter(_pc.is_in(t.column(key_col), value_set=pa.array(keys)))
        if columns is not None:
            t = t.select(columns)
        if t.num_rows:
            out.append(t)
    if not out:
        sch = hashable_schema(files[0], columns=columns)
        return sch.empty_table()
    return pa.concat_tables(out)
