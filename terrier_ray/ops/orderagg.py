"""Order-sensitive grouped aggregates: exact quantiles (PERCENTILE_CONT /
MEDIAN) and ordered string concatenation (STRING_AGG).

These cannot ride ``groupby().aggregate`` (they need every value of a group,
ordered), so they use the same shape as ``ops.window``: ONE hash shuffle on
``hash(keys) % num_partitions`` then per-bucket vectorized segment kernels —
a bucket holds all rows of each of its keys, and many keys per bucket keep
the Python-call count at O(num_partitions), not O(num_groups).

Reference analog: the reference's ANALYZE computes per-column stats with
reserved AGGREGATE_TOP_K / AGGREGATE_HISTOGRAM parse nodes
(/root/reference/src/include/parser/expression_defs.h:55-56); exact grouped
quantiles are the same family of order-statistics aggregation.

Scale note: per-bucket memory is bounded by input/num_partitions (size it to
the worker heap); a single group always lands in one bucket by construction.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from terrier_ray.ops.relational import _multi_key_bucket
from terrier_ray.ops.window import _change_mask


def _tagged(ds, keys: Sequence[str], num_partitions: int):
    keys = list(keys)

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__qbucket", pa.array(_multi_key_bucket(batch, keys, num_partitions))
        )

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def grouped_quantile(
    ds,
    keys: Sequence[str],
    col: str,
    q: float,
    alias: str,
    num_partitions: int = 32,
):
    """Exact PERCENTILE_CONT(q) of ``col`` per ``keys`` group (q=0.5 = MEDIAN).

    Interpolation mirrors DuckDB quantile_cont bit-for-bit:
    ``pos = q*(n-1); lo = floor(pos); frac = pos-lo;
    val = v[lo]*(1-frac) + v[lo+1]*frac`` evaluated in float64.  NOTE the
    exact expression matters at the ulp level: ``v[lo] + (v[lo+1]-v[lo])*frac``
    (numpy's t<0.5 lerp) differs in the last bit for large magnitudes and
    fails an exact value-hash.  Feed an integer-scaled column so the inputs
    themselves are engine-independent.
    """
    keys = list(keys)

    def per_bucket(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["__qbucket"]).sort_by(
            [(k, "ascending") for k in keys] + [(col, "ascending")]
        )
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    **{k: t.column(k) for k in keys},
                    alias: pa.array([], type=pa.float64()),
                }
            )
        starts = _change_mask(t, keys)
        start_idx = np.flatnonzero(starts)
        counts = np.diff(np.append(start_idx, n))
        v = pc.cast(t.column(col).combine_chunks(), pa.float64()).to_numpy(
            zero_copy_only=False
        )
        pos = q * (counts - 1).astype(np.float64)
        lo = np.floor(pos).astype(np.int64)
        frac = pos - lo
        lo_idx = start_idx + lo
        hi_idx = np.minimum(lo_idx + 1, start_idx + counts - 1)
        vals = v[lo_idx] * (1.0 - frac) + v[hi_idx] * frac
        head = t.take(pa.array(start_idx)).select(keys)
        return head.append_column(alias, pa.array(vals, type=pa.float64()))

    return (
        _tagged(ds, keys, num_partitions)
        .groupby("__qbucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def grouped_quantile_disc(
    ds,
    keys: Sequence[str],
    col: str,
    q: float,
    alias: str,
    num_partitions: int = 32,
):
    """Exact PERCENTILE_DISC(q): the SMALLEST group value whose cumulative
    ordered position covers q — an actual element of the group, never
    interpolated (SQL spec / DuckDB quantile_disc: element at
    ``ceil(q*n) - 1`` of the ascending sort, 0-indexed, for q>0; the first
    element for q=0).  Same one-bucket-shuffle shape as grouped_quantile;
    the output column keeps the INPUT type (no float cast — disc returns a
    member, so value-hash matching needs no scaling recipe)."""
    keys = list(keys)

    def per_bucket(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["__qbucket"]).sort_by(
            [(k, "ascending") for k in keys] + [(col, "ascending")]
        )
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    **{k: t.column(k) for k in keys},
                    alias: pa.array([], type=t.schema.field(col).type),
                }
            )
        starts = _change_mask(t, keys)
        start_idx = np.flatnonzero(starts)
        counts = np.diff(np.append(start_idx, n))
        off = np.ceil(q * counts.astype(np.float64)).astype(np.int64) - 1
        off = np.clip(off, 0, counts - 1)
        vals = t.column(col).combine_chunks().take(pa.array(start_idx + off))
        head = t.take(pa.array(start_idx)).select(keys)
        return head.append_column(alias, vals)

    return (
        _tagged(ds, keys, num_partitions)
        .groupby("__qbucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def grouped_quantiles(
    ds,
    keys: Sequence[str],
    specs: "Sequence[tuple[str, str, float, str]]",
    num_partitions: int = 32,
):
    """Several exact percentiles in ONE bucket shuffle: ``specs`` is
    (func, col, q, alias) with func percentile_cont | percentile_disc.
    Semantics per spec are exactly grouped_quantile / grouped_quantile_disc
    (cont: DuckDB-identical float64 interpolation; disc: group member at
    ceil(q*n)-1, input type preserved).  The SQL WITHIN-GROUP lowering
    lands here so a SELECT with multiple percentile aggregates still costs
    one exchange."""
    keys = list(keys)
    specs = [tuple(s) for s in specs]

    def per_bucket(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["__qbucket"])
        if g.num_rows == 0:
            cols = {k: g.column(k) for k in keys}
            for func, col, _q, alias in specs:
                typ = (
                    pa.float64()
                    if func == "percentile_cont"
                    else g.schema.field(col).type
                )
                cols[alias] = pa.array([], type=typ)
            return pa.table(cols)
        out_cols: dict = {}
        head = None
        for func, col, q, alias in specs:
            t = g.sort_by(
                [(k, "ascending") for k in keys] + [(col, "ascending")]
            )
            starts = _change_mask(t, keys)
            start_idx = np.flatnonzero(starts)
            counts = np.diff(np.append(start_idx, t.num_rows))
            if head is None:  # group heads identical across sorts (same keys)
                head = t.take(pa.array(start_idx)).select(keys)
            if func == "percentile_cont":
                v = pc.cast(t.column(col).combine_chunks(), pa.float64()).to_numpy(
                    zero_copy_only=False
                )
                pos = q * (counts - 1).astype(np.float64)
                lo = np.floor(pos).astype(np.int64)
                frac = pos - lo
                lo_idx = start_idx + lo
                hi_idx = np.minimum(lo_idx + 1, start_idx + counts - 1)
                out_cols[alias] = pa.array(
                    v[lo_idx] * (1.0 - frac) + v[hi_idx] * frac, type=pa.float64()
                )
            else:  # percentile_disc
                off = np.ceil(q * counts.astype(np.float64)).astype(np.int64) - 1
                off = np.clip(off, 0, counts - 1)
                out_cols[alias] = t.column(col).combine_chunks().take(
                    pa.array(start_idx + off)
                )
        for alias, arr in out_cols.items():
            head = head.append_column(alias, arr)
        return head

    return (
        _tagged(ds, keys, num_partitions)
        .groupby("__qbucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def grouped_string_agg(
    ds,
    keys: Sequence[str],
    col: str,
    sep: str,
    alias: str,
    order_by: Sequence[str] | None = None,
    num_partitions: int = 32,
):
    """STRING_AGG(col, sep ORDER BY order_by) per ``keys`` group, fully
    vectorized per bucket (Arrow group_by list-collect + binary_join)."""
    keys = list(keys)
    order_by = list(order_by) if order_by else [col]

    def per_bucket(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["__qbucket"]).sort_by(
            [(k, "ascending") for k in keys] + [(o, "ascending") for o in order_by]
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    **{k: t.column(k) for k in keys},
                    alias: pa.array([], type=pa.string()),
                }
            )
        # arrow group_by preserves within-group encounter order for "list"
        agg = t.select(keys + [col]).group_by(keys, use_threads=False).aggregate(
            [(col, "list")]
        )
        joined = pc.binary_join(agg.column(f"{col}_list"), sep)
        return agg.drop_columns([f"{col}_list"]).append_column(alias, joined)

    return (
        _tagged(ds, keys, num_partitions)
        .groupby("__qbucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
