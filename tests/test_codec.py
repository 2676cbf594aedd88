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


def test_bucket_builder_bit_identical_to_container_codec(tmp_path):
    """The per-bucket builder's vectorized slicing must emit byte-identical
    posting containers and block metadata to a per-term decode/re-encode."""
    import numpy as np
    import pyarrow as pa

    from terrier_ray.index.build import (
        BLOCK_SIZE,
        _make_bucket_builder,
        decode_final_postings,
    )
    from terrier_ray.index.codec import encode_posting_list

    rng = np.random.default_rng(5)
    avgdl = 57.3

    def make(n):
        d = np.asarray(sorted(set(rng.integers(0, 1 << 45, n))), dtype=np.uint64)
        return d, rng.integers(1, 9, len(d)).astype(np.int64)

    # varied lengths: 1, sub-block, exact block, block+1, mid, EF-length
    terms = {"aa": 1, "bb": 5, "cc": BLOCK_SIZE, "dd": BLOCK_SIZE + 1,
             "ee": 1000, "yy": 6000}
    rows = {"term": [], "docid": [], "tf": [], "dl": [], "bucket": []}
    expect = {}
    for t, n in terms.items():
        d, tf = make(n)
        dl = rng.integers(20, 200, len(d)).astype(np.int64)
        expect[t] = (d, tf, dl)
        rows["term"] += [t] * len(d)
        rows["docid"] += list(d)
        rows["tf"] += list(tf)
        rows["dl"] += list(dl)
        rows["bucket"] += [7] * len(d)
    # shuffle input rows — the builder must not depend on arrival order
    perm = rng.permutation(len(rows["term"]))
    tab = pa.table(
        {
            "term": pa.array(np.asarray(rows["term"], dtype=object)[perm].tolist()),
            "docid": pa.array(np.asarray(rows["docid"], dtype=np.int64)[perm]),
            "tf": pa.array(np.asarray(rows["tf"], dtype=np.int64)[perm].astype("int32")),
            "dl": pa.array(np.asarray(rows["dl"], dtype=np.int64)[perm].astype("int32")),
            "bucket": pa.array(np.asarray(rows["bucket"], dtype=np.int32)[perm]),
        }
    )
    metrics = _make_bucket_builder(str(tmp_path), avgdl)(tab)
    assert metrics.column("n_terms")[0].as_py() == len(terms)

    import pyarrow.parquet as pq

    out = pq.read_table(str(tmp_path) + "/bucket-00007.parquet")
    assert out.column("term").to_pylist() == sorted(terms)  # term-sorted rows
    by_term = {r["term"]: r for r in out.to_pylist()}
    for t, (d, tf, dl) in expect.items():
        r = by_term[t]
        dids, tfs = decode_final_postings(r["postings"])
        assert (dids == d).all() and (tfs == tf.astype(np.uint64)).all()
        # container bytes identical to the reference encoder
        assert r["postings"] == encode_posting_list(d, tf.astype(np.uint64))
        assert r["df"] == len(d) and r["cf"] == int(tf.sum())
        bl = np.frombuffer(r["block_last"], dtype="<u8")
        bm = np.frombuffer(r["block_max_wd"], dtype="<f4")
        nb = -(-len(d) // BLOCK_SIZE)
        assert len(bl) == len(bm) == nb
        block_starts = np.arange(0, len(d), BLOCK_SIZE)
        assert (bl == d[np.minimum(block_starts + BLOCK_SIZE - 1, len(d) - 1)]).all()
        # block max is an upper bound on the true float64 weights
        from terrier_ray.index.build import _wd

        wd = _wd(tf.astype(np.float64), dl.astype(np.float64), avgdl)
        per_block_true = [wd[s : s + BLOCK_SIZE].max() for s in block_starts]
        assert (bm.astype(np.float64) >= np.asarray(per_block_true) - 1e-12).all()


def test_multipart_container_roundtrip():
    """fmt-2 container: encoded parts concat verbatim, decode == concat of
    part decodes (the fold pass's byte-level merge contract)."""
    import numpy as np

    from terrier_ray.index.codec import (
        decode_posting_list,
        encode_multipart,
        encode_posting_list,
    )

    rng = np.random.default_rng(11)
    span = np.uint64(1 << 60)
    parts, all_d, all_t = [], [], []
    lo = np.uint64(0)
    for n in (1, 300, 5000):  # includes an EF-encoded part
        d = lo + np.sort(
            np.unique(rng.integers(0, int(span), size=2 * n).astype(np.uint64))
        )[:n]
        assert len(d) == n
        t = rng.integers(1, 50, size=n).astype(np.uint64)
        parts.append(encode_posting_list(d, t))
        all_d.append(d)
        all_t.append(t)
        lo += span
    blob = encode_multipart(parts)
    assert blob[0] == 2
    dd, tt = decode_posting_list(blob)
    assert (dd == np.concatenate(all_d)).all()
    assert (tt == np.concatenate(all_t)).all()
    # single-part containers decode unchanged (fold keeps them verbatim)
    d1, t1 = decode_posting_list(parts[1])
    assert (d1 == all_d[1]).all() and (t1 == all_t[1]).all()
