"""Distributed Bloom-filter build + scan-side pre-filter.

Reference analog: ``execution/sql/bloom_filter.h`` — the reference attaches
a bloom filter to its JoinHashTable for early probe filtering (SURVEY.md
§2.3).  At cluster scale the same idea cuts a shuffle join's left-side
volume: build a compact bitmap of the (small-ish) right side's join keys,
broadcast it (``ray.put`` once via the map_batches closure), and drop
left rows whose key cannot be present BEFORE they enter the all-to-all
exchange.  False positives only cost wasted shuffle bytes — the exact join
afterwards keeps correctness; there are no false negatives.

Build is partial→merge: every input block produces a partial bitmap
(numpy uint64 OR is associative/commutative), the driver ORs them — the
same shape as the reference's thread-local build + parallel merge
(join_hash_table.cpp:556-617).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from terrier_ray.ops.relational import filter_batches

#: two independent 64-bit mix constants (splitmix64 finalizer style)
_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)


class Bloom:
    """Immutable bitmap + params; picklable (ships in task closures)."""

    def __init__(self, bits: np.ndarray, num_bits: int, k: int):
        self.bits = bits  # uint64 words
        self.num_bits = num_bits
        self.k = k

    def _hashes(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        with np.errstate(over="ignore"):
            x = keys.astype(np.uint64)
            h1 = x * _C1
            h1 ^= h1 >> np.uint64(31)
            h2 = (x ^ (x >> np.uint64(33))) * _C2 | np.uint64(1)  # odd stride
        return h1, h2

    def contains(self, keys: np.ndarray) -> np.ndarray:
        h1, h2 = self._hashes(keys)
        out = np.ones(len(keys), dtype=bool)
        m = np.uint64(self.num_bits)
        for i in range(self.k):
            with np.errstate(over="ignore"):
                idx = (h1 + np.uint64(i) * h2) % m
            word, bit = idx >> np.uint64(6), idx & np.uint64(63)
            out &= (self.bits[word] >> bit) & np.uint64(1) != 0
        return out

    def add(self, keys: np.ndarray) -> None:
        h1, h2 = self._hashes(keys)
        m = np.uint64(self.num_bits)
        for i in range(self.k):
            with np.errstate(over="ignore"):
                idx = (h1 + np.uint64(i) * h2) % m
            word, bit = idx >> np.uint64(6), idx & np.uint64(63)
            np.bitwise_or.at(self.bits, word, np.uint64(1) << bit)


def build_bloom(ds, key_col: str, num_bits: int = 1 << 20, k: int = 4) -> Bloom:
    """Build a Bloom filter of ``key_col`` (integer keys) distributed:
    one partial bitmap per block, OR-merged driver-side (num_bits/8 bytes
    per partial — 128 KiB at the default 1M bits)."""
    nb, kk = num_bits, k

    def partial(batch: pa.Table) -> pa.Table:
        b = Bloom(np.zeros(nb >> 6, dtype=np.uint64), nb, kk)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        b.add(keys.astype(np.int64))
        return pa.table({"bm": pa.array([b.bits.tobytes()], type=pa.large_binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = np.zeros(num_bits >> 6, dtype=np.uint64)
    for batch in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for buf in batch.column("bm").to_pylist():
            merged |= np.frombuffer(buf, dtype=np.uint64)
    return Bloom(merged, num_bits, k)


def bloom_prefilter(ds, key_col: str, bloom: Bloom):
    """Drop rows whose key is definitely absent from the bloom (no false
    negatives; FPs pass through and must be removed by the exact join)."""
    return filter_batches(
        ds,
        lambda b: pa.array(
            bloom.contains(
                b.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
            )
        ),
    )
