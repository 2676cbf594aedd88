"""Codec round-trips vs naive reference decoders."""

from __future__ import annotations

import numpy as np
import pytest

from terrier_ray.index.codec import (
    decode_posting_list,
    delta_decode,
    delta_encode,
    ef_decode,
    ef_encode,
    encode_posting_list,
    varbyte_decode,
    varbyte_encode,
)


def naive_varbyte_decode(buf: bytes) -> list[int]:
    vals, cur, shift = [], 0, 0
    for byte in buf:
        cur |= (byte & 0x7F) << shift
        if byte & 0x80:
            shift += 7
        else:
            vals.append(cur)
            cur, shift = 0, 0
    return vals


@pytest.mark.parametrize(
    "vals",
    [
        [],
        [0],
        [1, 127, 128, 129, 16383, 16384, 2**32 - 1, 2**63, 2**64 - 1],
        list(range(1000)),
    ],
)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    enc = varbyte_encode(arr)
    assert naive_varbyte_decode(enc) == vals
    assert varbyte_decode(enc).tolist() == vals


def test_varbyte_random():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 2**62, size=10_000, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


def test_delta_roundtrip():
    rng = np.random.default_rng(9)
    v = np.sort(rng.integers(0, 2**40, size=5000, dtype=np.uint64))
    assert np.array_equal(delta_decode(delta_encode(v)), v)


@pytest.mark.parametrize("n", [1, 2, 100, 5000])
def test_ef_roundtrip(n):
    rng = np.random.default_rng(n)
    v = np.sort(rng.integers(0, 10 * n, size=n, dtype=np.uint64))
    assert np.array_equal(ef_decode(ef_encode(v)), v)


def test_ef_dense_and_sparse():
    dense = np.arange(1000, dtype=np.uint64)
    assert np.array_equal(ef_decode(ef_encode(dense)), dense)
    sparse = np.array([0, 2**50, 2**51], dtype=np.uint64)
    assert np.array_equal(ef_decode(ef_encode(sparse)), sparse)


@pytest.mark.parametrize("n", [1, 10, 4095, 4096, 20000])
def test_posting_list_roundtrip(n):
    rng = np.random.default_rng(n)
    doc_ids = np.sort(rng.choice(np.arange(10 * n, dtype=np.uint64), size=n, replace=False))
    tfs = rng.integers(1, 300, size=n, dtype=np.uint64)
    d, t = decode_posting_list(encode_posting_list(doc_ids, tfs))
    assert np.array_equal(d, doc_ids)
    assert np.array_equal(t, tfs)


def test_posting_list_compresses():
    n = 50_000
    doc_ids = np.arange(0, 4 * n, 4, dtype=np.uint64)
    tfs = np.ones(n, dtype=np.uint64)
    enc = encode_posting_list(doc_ids, tfs)
    # EF path: ~ (2 + log2(gap)) bits/doc for docids + 1 byte/doc tf
    assert len(enc) < n * 2.5


def test_merge_fast_path_bit_identical_to_reencode(tmp_path):
    """merge_bucket's verbatim fast path (single-segment short terms) must
    emit byte-identical rows to the decode/re-encode slow path."""
    import numpy as np
    import pyarrow as pa

    from terrier_ray.index.build import BLOCK_SIZE, _make_final_merger
    from terrier_ray.index.codec import (
        delta_encode,
        encode_posting_list,
        varbyte_encode,
    )

    rng = np.random.default_rng(5)

    def seg_row(term, dids, tfs):
        wd = rng.random(len(dids)).astype(np.float32)
        return {
            "term": term,
            "term_h": abs(hash(term)) % (1 << 62),
            "n": len(dids),
            "cf": int(tfs.sum()),
            "docids_enc": varbyte_encode(delta_encode(dids.astype(np.uint64))),
            "tfs_enc": varbyte_encode(tfs.astype(np.uint64) - np.uint64(1)),
            "wd_enc": wd.tobytes(),
        }

    def make(dids):
        d = np.asarray(sorted(set(dids)), dtype=np.uint64)
        return d, rng.integers(1, 9, len(d)).astype(np.uint64)

    rows = []
    # short single-segment terms of varied lengths (fast path)
    for t, n in [("aa", 1), ("bb", 5), ("cc", BLOCK_SIZE), ("dd", BLOCK_SIZE + 1),
                 ("ee", 1000)]:
        d, tf = make(rng.integers(0, 1 << 40, n))
        rows.append(seg_row(t, d, tf))
    # multi-segment (salted heavy) term — slow path
    d1, tf1 = make(rng.integers(0, 1 << 40, 300))
    d2, tf2 = make(rng.integers(1 << 40, 1 << 41, 300))
    rows.append(seg_row("zz", d1, tf1))
    rows.append(seg_row("zz", d2, tf2))
    # EF-length single segment — slow path
    dl, tfl = make(rng.integers(0, 1 << 45, 6000))
    rows.append(seg_row("yy", dl, tfl))

    tab = pa.Table.from_pylist(rows).append_column(
        "bucket", pa.array([7] * len(rows), type=pa.int32())
    )
    merged = _make_final_merger(str(tmp_path), 16)(tab)
    assert merged.column("n_terms")[0].as_py() == 7

    import pyarrow.parquet as pq

    out = pq.read_table(str(tmp_path) + "/bucket-00007.parquet")
    by_term = {r["term"]: r for r in out.to_pylist()}
    # reference: full decode + re-encode for every term
    from terrier_ray.index.build import decode_final_postings

    for t, r in by_term.items():
        dids, tfs = decode_final_postings(r["postings"])
        assert r["postings"] == encode_posting_list(dids, tfs)
        assert r["df"] == len(dids)
        bl = np.frombuffer(r["block_last"], dtype="<u8")
        bm = np.frombuffer(r["block_max_wd"], dtype="<f4")
        nb = -(-len(dids) // BLOCK_SIZE)
        assert len(bl) == len(bm) == nb
        block_starts = np.arange(0, len(dids), BLOCK_SIZE)
        expect_bl = dids[np.minimum(block_starts + BLOCK_SIZE - 1, len(dids) - 1)]
        assert (bl == expect_bl).all()
    assert sorted(by_term) == ["aa", "bb", "cc", "dd", "ee", "yy", "zz"]
