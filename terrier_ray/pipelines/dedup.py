"""Deduplication pipelines over the ``documents`` table.

- exact_dedup:      content-hash → groupby(hash) → keep min doc_id
- minhash_lsh:      shingle → minhash → band signatures → bucket groupby →
                    candidate pairs → Jaccard verify
- simhash:          64-bit simhash + hamming-bucket near-dup pairs
- ngram_jaccard:    exact n-gram Jaccard over candidate pairs
- (embedding near-dup lives in pipelines/similarity.py)

All signature computation is per-batch vectorized numpy inside map_batches;
the only shuffles are the (hash/band/bucket) groupbys — the same
partial→partition→merge shape as the posting build (SURVEY.md §7.1).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from terrier_ray.ops.relational import read_table

_MERSENNE = (1 << 61) - 1


def _text_hash(texts: list[str]) -> np.ndarray:
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        h = hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest()
        out[i] = int.from_bytes(h, "little") & ((1 << 63) - 1)
    return out


def approx_distinct_custkeys(sf_dir: str):
    """HyperLogLog COUNT(DISTINCT o_custkey): one streaming pass, O(2^p)
    state — the 1e12-row alternative to an exact distinct shuffle (±1.6%
    std error at p=12; accuracy-bounded in tests/test_sketch.py)."""
    from terrier_ray.ops.sketch import hll_count_distinct

    ds = read_table(sf_dir, "orders", columns=["o_custkey"])
    est = hll_count_distinct(ds, "o_custkey", p=12)
    return pa.table({"approx_distinct_custkeys": pa.array([est], type=pa.int64())})


def heavy_hitter_terms(sf_dir: str):
    """Approximate top-10 most frequent tokens over the documents corpus
    (Misra–Gries style mergeable summary).  Zipf-distributed tokens are the
    sketch's home turf: the head terms dominate every batch, so the top-k is
    exact in practice (guarantee: count > n_tokens/(k*capacity_factor))."""
    from terrier_ray.ops.sketch import mg_heavy_hitters
    from terrier_ray.text.tokenize import TOKEN_RE

    docs = read_table(sf_dir, "documents", columns=["text"])

    def explode(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch.column("text").to_pylist():
            toks.extend(TOKEN_RE.findall(t.lower()))
        return pa.table({"token": pa.array(toks, type=pa.string())})

    tokens = docs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    return mg_heavy_hitters(tokens, "token", k=10, capacity_factor=64)


def exact_dedup(sf_dir: str):
    """Exact dedup: (min doc_id, copy count) per distinct text.

    Hash-partitioned: the shuffle key is a 63-bit content hash, never the
    text itself, so only 16 bytes/row move through the exchange.
    """
    from ray.data.aggregate import Count, Min

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        h = _text_hash(batch.column("text").to_pylist())
        return pa.table(
            {"doc_id": batch.column("doc_id"), "__h": pa.array(h)}
        )

    hashed = docs.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    out = hashed.groupby("__h").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies")
    )
    return out.drop_columns(["__h"])


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _shingle_hashes(text: str, width: int = 5) -> np.ndarray:
    """Hashes of character shingles (word-token shingles for width>0 words)."""
    toks = text.lower().split()
    if len(toks) < width:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + width]) for i in range(len(toks) - width + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = int.from_bytes(
            hashlib.blake2b(g.encode(), digest_size=8).digest(), "little"
        )
    return out


class MinHasher:
    """Per-batch minhash signatures (num_perm universal-hash permutations)."""

    def __init__(self, num_perm: int = 64, shingle_width: int = 5, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.width = shingle_width

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.width)
        if len(h) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (num_perm, n_shingles) universal hashing mod Mersenne prime
        x = (
            self.a[:, None] * (h[None, :] % _MERSENNE) + self.b[:, None]
        ) % _MERSENNE
        return x.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch.column("text").to_pylist()]
        arr = np.vstack(sigs) if sigs else np.empty((0, self.num_perm), np.uint64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "sig": pa.array(list(arr.astype(np.int64))),
            }
        )


def minhash_lsh_pairs(
    sf_dir: str,
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.7,
):
    """Near-dup candidate pairs via banded LSH, verified by signature Jaccard.

    signatures → explode to (band_id, band_hash, doc_id) → groupby bucket →
    pairs within bucket → estimate Jaccard from full signatures → threshold.
    Returns (doc_a, doc_b, jaccard_est) with doc_a < doc_b.
    """
    rows_per_band = num_perm // bands
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    sigs = docs.map_batches(
        MinHasher,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
        fn_constructor_kwargs={"num_perm": num_perm},
    )

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sig = np.asarray(batch.column("sig").to_pylist(), dtype=np.int64)
        if len(ids) == 0:
            return pa.table(
                {
                    "band": pa.array([], type=pa.int32()),
                    "bh": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "sig": pa.array([], type=pa.list_(pa.int64())),
                }
            )
        band_ids, bhs, out_ids, out_sigs = [], [], [], []
        for b in range(bands):
            chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            for j in range(len(ids)):
                bh = int.from_bytes(
                    hashlib.blake2b(chunk[j].tobytes(), digest_size=8).digest(),
                    "little",
                ) & ((1 << 63) - 1)
                band_ids.append(b)
                bhs.append(bh)
                out_ids.append(int(ids[j]))
                out_sigs.append(sig[j])
        return pa.table(
            {
                "band": pa.array(band_ids, type=pa.int32()),
                "bh": pa.array(bhs, type=pa.int64()),
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "sig": pa.array([s.tolist() for s in out_sigs], type=pa.list_(pa.int64())),
            }
        )

    banded = sigs.map_batches(explode_bands, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        if len(ids) < 2:
            return pa.table(
                {
                    "doc_a": pa.array([], type=pa.int64()),
                    "doc_b": pa.array([], type=pa.int64()),
                    "jaccard_est": pa.array([], type=pa.float64()),
                }
            )
        sig = np.asarray(group.column("sig").to_pylist(), dtype=np.int64)
        order = np.argsort(ids)
        ids, sig = ids[order], sig[order]
        a_idx, b_idx = np.triu_indices(len(ids), k=1)
        jac = (sig[a_idx] == sig[b_idx]).mean(axis=1)
        keep = jac >= jaccard_threshold
        return pa.table(
            {
                "doc_a": pa.array(ids[a_idx][keep]),
                "doc_b": pa.array(ids[b_idx][keep]),
                "jaccard_est": pa.array(jac[keep]),
            }
        )

    pairs = banded.groupby(["band", "bh"]).map_groups(
        bucket_pairs, batch_format="pyarrow"
    )
    # same pair can fire in multiple bands → distinct
    from ray.data.aggregate import Max

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Max("jaccard_est", alias_name="jaccard_est")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit simhash over whitespace tokens; emits hash + 4 16-bit chunks
    (near-dup candidates share at least one chunk at hamming distance <=3)."""

    def __init__(self):
        pass

    @staticmethod
    def simhash64(text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for tok in text.lower().split():
            h = int.from_bytes(
                hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little"
            )
            bits = np.frombuffer(
                np.uint64(h).tobytes(), dtype=np.uint8
            )
            bitarr = np.unpackbits(bits, bitorder="little").astype(np.int64)
            acc += 2 * bitarr - 1
        return int(np.packbits((acc > 0).astype(np.uint8), bitorder="little").view("<u8")[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = np.array(
            [self.simhash64(t) for t in batch.column("text").to_pylist()],
            dtype=np.uint64,
        )
        out = {"doc_id": batch.column("doc_id")}
        out["simhash"] = pa.array(hs.view(np.int64))
        for c in range(4):
            out[f"chunk{c}"] = pa.array(
                ((hs >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int32)
            )
        return pa.table(out)


def simhash_signatures(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(
        SimHasher, batch_format="pyarrow", batch_size=256, concurrency=2
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard verification (exact, for candidate pairs)
# ---------------------------------------------------------------------------


def dup_clusters(sf_dir: str, jaccard_threshold: float = 0.7):
    """Duplicate clusters: MinHash-LSH candidate pairs → connected components
    → (doc_id, cluster_id, cluster_size) for every doc in a non-trivial
    cluster.

    Components run union-find on the DRIVER over the verified near-dup pairs
    — bounded: only pairs above the Jaccard threshold ever reach the driver,
    a tiny fraction of the corpus.  At extreme duplication rates switch to
    iterated min-label propagation (join labels to edges + groupby-min per
    round); the pair-generation stages are identical either way.
    """
    pairs = minhash_lsh_pairs(sf_dir, jaccard_threshold=jaccard_threshold).to_pandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = [(d, find(d)) for d in parent]
    if not rows:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "cluster_id": pa.array([], type=pa.int64()),
                "cluster_size": pa.array([], type=pa.int64()),
            }
        )
    import collections

    sizes = collections.Counter(r for _, r in rows)
    rows.sort()
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], type=pa.int64()),
            "cluster_id": pa.array([r for _, r in rows], type=pa.int64()),
            "cluster_size": pa.array([sizes[r] for _, r in rows], type=pa.int64()),
        }
    )


def ngram_jaccard_exact(text_a: str, text_b: str, width: int = 5) -> float:
    sa = set(_shingle_hashes(text_a, width).tolist())
    sb = set(_shingle_hashes(text_b, width).tolist())
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)
