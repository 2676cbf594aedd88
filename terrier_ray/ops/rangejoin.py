"""Range (interval) join: left rows matched to every interval containing
their value — ``lo <= v < hi``, intervals may OVERLAP (each row can match
several), which no equi-join can express.

Plans:
- broadcast (implemented): the interval table rides into every map task
  (ray.put via closure); per batch, each interval is one vectorized mask +
  take.  Right for the typical shape — few thousand windows against a huge
  fact table.
- chunked cogroup (the both-sides-large path, documented for scale): pick a
  chunk width W, tag left rows with chunk = v // W, flat-map each interval
  to every chunk it overlaps, cogroup on chunk, and run this same kernel
  per chunk.  Each (row, interval) pair meets in exactly one chunk (the
  row's), so no dedupe pass is needed.

Reference analog: NestLoopJoin with an arbitrary predicate
(src/execution/compiler/operator/nested_loop_join_translator.cpp) — the
reference would run this as a predicate NLJ; the broadcast+mask form is its
vectorized, distributed equivalent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def range_join(
    ds,
    intervals: pa.Table,
    value_col: str,
    lo_col: str,
    hi_col: str,
    payload_cols: "list[str] | None" = None,
):
    """Inner range join of ``ds`` against a small ``intervals`` table.
    Emits each left row once per interval with ``lo <= value < hi``,
    appending the interval's ``payload_cols`` (default: all non-bound
    columns)."""
    if payload_cols is None:
        payload_cols = [
            c for c in intervals.column_names if c not in (lo_col, hi_col)
        ]
    los = intervals.column(lo_col).to_numpy(zero_copy_only=False)
    his = intervals.column(hi_col).to_numpy(zero_copy_only=False)
    payload = {c: intervals.column(c).to_numpy(zero_copy_only=False) for c in payload_cols}

    def match(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        takes, ivl_ids = [], []
        for i in range(len(los)):
            hit = np.flatnonzero((v >= los[i]) & (v < his[i]))
            if len(hit):
                takes.append(hit)
                ivl_ids.append(np.full(len(hit), i, dtype=np.int64))
        if not takes:
            out = batch.slice(0, 0)
            for c in payload_cols:
                out = out.append_column(
                    c, pa.array([], type=pa.array(payload[c][:0]).type)
                )
            return out
        take_idx = np.concatenate(takes)
        ivl = np.concatenate(ivl_ids)
        out = batch.take(pa.array(take_idx))
        for c in payload_cols:
            out = out.append_column(c, pa.array(payload[c][ivl]))
        return out

    return ds.map_batches(match, batch_format="pyarrow", zero_copy_batch=True)
