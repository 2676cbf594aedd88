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
