"""Approximate-aggregation sketches: HyperLogLog distinct counting.

Reference analog: the parser reserves AGGREGATE_TOP_K / AGGREGATE_HISTOGRAM
expression types for ANALYZE statistics
(/root/reference/src/include/parser/expression_defs.h:55-56); at 1e12 rows
an exact COUNT(DISTINCT) shuffle is exactly what you avoid — an HLL register
table is O(2^p) per stage regardless of input size, and register-wise MAX is
a commutative merge, so the whole sketch rides ONE tiny groupby.

Shape: per-batch vectorized register partials (numpy) → groupby(register)
MAX merge → driver-side harmonic estimate with the standard small/large
range corrections (Flajolet et al. 2007).  Standard error ≈ 1.04/sqrt(2^p).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _hash64(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized 64-bit avalanche hash (splitmix64 finalizer for ints;
    blake2b over the distinct set for strings — loop only on uniques)."""
    import hashlib

    if pa.types.is_integer(arr.type):
        v = pc.fill_null(arr, 0).to_numpy(zero_copy_only=False).astype(np.uint64)
        v = (v + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        v ^= v >> np.uint64(30)
        v = (v * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        v ^= v >> np.uint64(27)
        v = (v * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        v ^= v >> np.uint64(31)
        return v
    vals = np.asarray(
        ["\x00__null__" if x is None else str(x) for x in arr.to_pylist()],
        dtype=object,
    )
    uniq, inverse = np.unique(vals, return_inverse=True)
    h = np.empty(len(uniq), dtype=np.uint64)
    for i, u in enumerate(uniq):
        h[i] = int.from_bytes(
            hashlib.blake2b(u.encode(), digest_size=8).digest(), "little"
        )
    return h[inverse]


def hll_partials(batch_col: pa.ChunkedArray | pa.Array, p: int = 12) -> pa.Table:
    """One batch → (register, max_rank) partial rows (≤ 2^p of them)."""
    h = _hash64(batch_col)
    m = np.uint64(1) << np.uint64(p)
    reg = (h & (m - np.uint64(1))).astype(np.int64)
    rest = h >> np.uint64(p)
    # rank = position of first 1-bit in the remaining (64-p) bits, 1-based;
    # all-zero rest → 64-p+1
    width = 64 - p
    rank = np.full(len(h), width + 1, dtype=np.int64)
    nz = rest != 0
    # trailing-zero count via bit tricks: isolate lowest set bit, log2
    low = rest[nz] & (~rest[nz] + np.uint64(1))
    rank[nz] = np.log2(low.astype(np.float64)).astype(np.int64) + 1
    tab = pa.table({"__reg": pa.array(reg), "__rank": pa.array(rank)})
    return tab.group_by(["__reg"]).aggregate([("__rank", "max")]).rename_columns(
        ["__reg", "__rank"]
    )


def hll_estimate(registers: np.ndarray, p: int = 12) -> float:
    """Standard HLL estimate over a dense 2^p register array (0 = empty)."""
    m = float(1 << p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    zeros = int(np.sum(registers == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting, small range
    elif est > (1 << 32) / 30.0:
        est = -(2.0**64) * np.log1p(-est / 2.0**64)
    return float(est)


def mg_heavy_hitters(ds, col: str, k: int = 10, capacity_factor: int = 64):
    """Approximate top-k frequent values (Misra–Gries style, mergeable).

    Reference analog: the reserved AGGREGATE_TOP_K ANALYZE statistic
    (/root/reference/src/include/parser/expression_defs.h:55).

    Per batch: exact value_counts, keep the ``k * capacity_factor`` largest
    (a truncated MG summary; each kept counter lower-bounds the true batch
    count).  Merge: one small groupby summing partial counts, then top-k.
    Guarantee: any value with true global count > n_rows / (k *
    capacity_factor) survives every truncation, so sufficiently-heavy
    hitters are EXACT; returned ``count`` is always a lower bound.

    Returns a pa.Table (value, count) of the k heaviest, count descending.
    """
    from terrier_ray.ops.relational import grouped_aggregate, topk

    cap = k * capacity_factor

    def local(batch: pa.Table) -> pa.Table:
        vc = batch.select([col]).group_by([col]).aggregate([([], "count_all")])
        vc = vc.rename_columns([col, "__c"])
        if vc.num_rows > cap:
            vc = vc.sort_by([("__c", "descending")]).slice(0, cap)
        return vc

    merged = grouped_aggregate(
        ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True),
        [col],
        [("sum", "__c", "count")],
    )
    return topk(merged, ["count", col], k, descending=[True, False])


def hll_count_distinct(ds, col: str, p: int = 12) -> int:
    """Approximate COUNT(DISTINCT col) — one streaming pass, O(2^p) state."""
    from ray.data.aggregate import Max

    partials = ds.map_batches(
        lambda b: hll_partials(b.column(col), p),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    merged = partials.groupby("__reg").aggregate(Max("__rank", alias_name="r"))
    regs = np.zeros(1 << p, dtype=np.int64)
    for b in merged.iter_batches(batch_size=None, batch_format="pyarrow"):
        regs[b.column("__reg").to_numpy(zero_copy_only=False)] = b.column(
            "r"
        ).to_numpy(zero_copy_only=False)
    return int(round(hll_estimate(regs, p)))
