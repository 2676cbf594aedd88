"""Sequence packing: greedy bin packing of variable-length documents into
fixed token budgets (the pretraining "sample packing" op).

Distributed shape: rows are hash-bucketed by key (same deterministic
modular hash as ops/sample.py, so placement is reproducible across runs,
retries, and partitionings), then each bucket packs INDEPENDENTLY with
first-fit-decreasing — the classic 11/9·OPT+1 greedy.  Bin ids are
globally unique by construction (bucket_id * 2^32 + local bin index).
At 100 TB, num_buckets scales with the cluster so each bucket's item list
stays worker-sized; packing quality degrades only by the per-bucket
boundary waste (≤ one partial bin per bucket).

The per-bucket fill loop is a Python loop over items BY DESIGN: bin
packing is a sequential decision process (each placement depends on all
prior fills).  The loop is bounded per bucket, runs remotely inside
``map_groups``, and touches only (key, length) pairs — never payloads.

Beyond-reference surface: the reference engine has no packing operator;
this extends the training-data tier (SURVEY §2 LLM-pipeline ops).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from terrier_ray.ops.sample import _rank

_BUCKET_SHIFT = 32


def pack_bins(ds, key_col: str, len_col: str, budget: int, num_buckets: int = 16):
    """Assign every row to a bin so that each bin's total ``len_col`` stays
    ≤ ``budget`` (an item larger than the budget gets a bin of its own).

    Returns a Dataset with (key_col, len_col, bin_id, bin_fill) where
    bin_fill is the final total length of that row's bin — handy for
    downstream pad-waste accounting."""
    if budget <= 0:
        raise ValueError("budget must be positive")

    def tag(batch: pa.Table) -> pa.Table:
        # ops/sample._rank IS the deterministic modular hash the module doc
        # promises — calling it (not re-deriving it) keeps the cross-module
        # placement identity maintained in one place
        return batch.select([key_col, len_col]).append_column(
            "__bucket", _rank(batch.column(key_col), num_buckets)
        )

    def pack_group(group: pa.Table) -> pa.Table:
        bucket = int(group.column("__bucket")[0].as_py())
        keys = group.column(key_col).to_numpy(zero_copy_only=False)
        lens = group.column(len_col).to_numpy(zero_copy_only=False)
        # First-fit-decreasing, ties broken by key for full determinism.
        order = np.lexsort((keys, -lens))
        fills: list[int] = []  # current fill per local bin
        assign = np.empty(len(keys), dtype=np.int64)
        for i in order:
            ln = int(lens[i])
            placed = -1
            for j, f in enumerate(fills):
                if f + ln <= budget:
                    placed = j
                    break
            if placed < 0:
                placed = len(fills)
                fills.append(0)
            fills[placed] += ln
            assign[i] = placed
        fills_np = np.asarray(fills, dtype=np.int64)
        return pa.table(
            {
                key_col: group.column(key_col),
                len_col: group.column(len_col),
                "bin_id": pa.array(
                    (np.int64(bucket) << _BUCKET_SHIFT) + assign
                ),
                "bin_fill": pa.array(fills_np[assign]),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("__bucket").map_groups(
        pack_group, batch_format="pyarrow"
    )
