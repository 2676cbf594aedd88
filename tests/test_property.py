"""Hypothesis property tests — the reference's randomized-unit-test strategy
(test/execution/sql_*_test.cpp randomizes inputs against C++ reference
semantics; SURVEY.md §5).  Pure-kernel properties only: no Ray session, so
these shrink fast."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from terrier_ray.index.codec import decode_posting_list, encode_posting_list
from terrier_ray.ops.relational import rescale_round, scaled_int, unscale


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e7,
            max_value=1e7,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=50,
    )
)
def test_scaled_int_sum_order_independent(vals):
    """The float recipe's core guarantee: integer-scaled sums are EXACT in
    any order (the reason every oracled aggregate survives engine reordering)."""
    arr = pa.array(vals, type=pa.float64())
    c = scaled_int(arr, 100).to_numpy(zero_copy_only=False)
    assert c.sum() == c[::-1].sum() == np.random.default_rng(0).permutation(c).sum()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.floats(min_value=-1e9, max_value=1e9, allow_nan=False), min_size=1, max_size=30),
    st.integers(min_value=0, max_value=6),
)
def test_rescale_round_idempotent(vals, nd):
    """Rounding through the integer recipe is a projection: applying it twice
    equals once (no double-rounding drift)."""
    arr = pa.array(vals, type=pa.float64())
    once = rescale_round(arr, nd)
    twice = rescale_round(once, nd)
    assert once.to_pylist() == twice.to_pylist()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300, unique=True),
    st.lists(st.integers(min_value=1, max_value=255), min_size=1, max_size=300),
)
def test_posting_codec_roundtrip_any_gaps(docids, tfs):
    """Codec round-trip for arbitrary docid gap patterns (delta+varbyte or
    Elias–Fano container, whichever the encoder picks)."""
    docids = np.sort(np.asarray(docids, dtype=np.uint64))
    tfs = np.asarray((tfs * (len(docids) // len(tfs) + 1))[: len(docids)], dtype=np.uint32)
    blob = encode_posting_list(docids, tfs)
    d2, t2 = decode_posting_list(blob)
    assert np.array_equal(d2, docids)
    assert np.array_equal(t2, tfs)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=-100, max_value=100), min_size=2, max_size=200),
    st.integers(min_value=1, max_value=8),
)
def test_moving_sum_equals_pandas(vals, w):
    """windowed moving_sum kernel logic vs pandas rolling (single segment)."""
    import pandas as pd

    v = np.asarray(vals, dtype=np.int64)
    n = len(v)
    idx = np.arange(n)
    seg_start = np.zeros(n, dtype=np.int64)
    cum = np.cumsum(v)
    lo = np.maximum(idx - w + 1, seg_start)
    pre = np.where(lo > 0, cum[np.maximum(lo - 1, 0)], 0)
    got = cum - pre
    want = pd.Series(v).rolling(w, min_periods=1).sum().astype(np.int64).values
    assert np.array_equal(got, want)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.floats(min_value=0, max_value=100, allow_nan=False), min_size=1, max_size=80),
    st.lists(
        st.tuples(
            st.floats(min_value=0, max_value=100, allow_nan=False),
            st.floats(min_value=0, max_value=50, allow_nan=False),
        ),
        min_size=1,
        max_size=12,
    ),
)
def test_range_join_kernel_vs_bruteforce(vals, spans):
    """The range-join batch kernel (mask+take) vs an O(n·m) reference."""
    los = np.array([lo for lo, _w in spans])
    his = np.array([lo + w for lo, w in spans])
    ivl = pa.table(
        {"ivl_id": np.arange(len(spans), dtype=np.int64), "lo": los, "hi": his}
    )
    batch = pa.table({"v": pa.array(vals, type=pa.float64())})

    # reuse the op's inner kernel by running it as a plain function
    from terrier_ray.ops.rangejoin import range_join

    class FakeDS:
        def map_batches(self, fn, **kw):
            self.out = fn(batch)
            return self

    got = FakeDS()
    range_join(got, ivl, "v", "lo", "hi").out
    pairs = set(
        zip(got.out.column("v").to_pylist(), got.out.column("ivl_id").to_pylist())
    )
    want = {
        (v, i)
        for v in vals
        for i, (lo, hi) in enumerate(zip(los, his))
        if lo <= v < hi
    }
    assert pairs == want


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdefgh0123", min_size=1, max_size=12),  # term
            st.integers(min_value=0, max_value=(1 << 63) - 1),  # docid
            st.integers(min_value=1, max_value=1 << 17),  # tf (may exceed u16)
        ),
        min_size=0,
        max_size=200,
    )
)
def test_exchange_wire_roundtrip_any_rows(rows):
    """The hash exchange's wire format v2 must round-trip ANY posting-row
    MULTISET exactly — arbitrary terms, full-range 63-bit docids (incl.
    docid 0 and repeats), tf straddling every adaptive-width boundary, and
    the empty part.  dl is a per-DOC attribute (build invariant: one corpus
    row per docid), so it derives from docid here; salt/gkey are dropped on
    the wire and recomputed reduce-side."""
    from terrier_ray.index.build import _pack_exchange, _unpack_exchange

    raw = pa.table(
        {
            "term": pa.array([r[0] for r in rows], pa.string()),
            "docid": pa.array([r[1] for r in rows], pa.int64()),
            "tf": pa.array([r[2] for r in rows], pa.int32()),
            "dl": pa.array([(r[1] % (1 << 17)) for r in rows], pa.int32()),
            "salt": pa.array([0] * len(rows), pa.int32()),
            "gkey": pa.array([0] * len(rows), pa.int32()),
        }
    )
    back = _unpack_exchange(_pack_exchange(raw))
    assert back.num_rows == raw.num_rows

    def key(t):
        return sorted(
            zip(
                t.column("term").to_pylist(),
                t.column("docid").to_pylist(),
                t.column("tf").to_pylist(),
                t.column("dl").to_pylist(),
            )
        )

    assert key(back) == key(raw)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=40))
def test_parse_query_total(q):
    """parse_query is TOTAL over arbitrary text: it returns a non-empty
    clause list or raises ValueError (the documented syntax-error channel)
    — never any other exception, never an empty success (the module
    contract: junk fails loudly with an offset, it is not skipped)."""
    from terrier_ray.index.querylang import Clause, parse_query

    try:
        clauses = parse_query(q)
    except ValueError:
        return
    assert clauses and all(isinstance(c, Clause) for c in clauses)


_ql_word = st.text(alphabet="abcdez", min_size=1, max_size=6)
_ql_clause = st.tuples(
    st.sampled_from(["", "+", "-"]),
    st.one_of(st.none(), st.sampled_from(["title", "body_x"])),
    st.one_of(
        st.tuples(st.just("term"), _ql_word),
        st.tuples(st.just("prefix"), _ql_word),
        st.tuples(st.just("fuzzy"), _ql_word),
        st.tuples(
            st.just("phrase"),
            st.lists(_ql_word, min_size=1, max_size=3).map(" ".join),
        ),
    ),
    st.one_of(st.none(), st.sampled_from(["1", "2", "0.5", "2.5", "10"])),
    st.integers(min_value=1, max_value=2),
    st.integers(min_value=0, max_value=9),  # phrase slop (0 = exact)
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_ql_clause, min_size=1, max_size=5), st.randoms())
def test_parse_query_roundtrip(specs, rnd):
    """Render a random well-formed clause list → parse → the structure
    comes back exactly (occur, field, kind, text, boost, max_edits),
    modulo the documented collapse of EXACT duplicate clauses and the
    all-negative rejection."""
    from terrier_ray.index.querylang import Clause, parse_query

    rendered, expected, seen = [], [], set()
    for occur, field, (kind, text), boost, edits, slop in specs:
        atom = {
            "term": text,
            "prefix": f"{text}*",
            "fuzzy": f"{text}~{edits}",
            "phrase": f'"{text}"' + (f"~{slop}" if slop else ""),
        }[kind]
        s = f"{occur}{field + ':' if field else ''}{atom}"
        if boost is not None:
            s += f"^{boost}"
        rendered.append(s)
        c = Clause(
            occur,
            field,
            kind,
            text,
            float(boost) if boost is not None else 1.0,
            max_edits=edits if kind == "fuzzy" else 1,
            slop=slop if kind == "phrase" else 0,
        )
        if c not in seen:
            seen.add(c)
            expected.append(c)
    q = ""
    for s in rendered:  # random whitespace separation is insignificant
        q += rnd.choice(["", " ", "\t", "\n"]) if not q else rnd.choice([" ", "  ", "\t", "\n"])
        q += s
    if all(c.occur == "-" for c in expected):
        import pytest

        with pytest.raises(ValueError):
            parse_query(q)
        return
    assert parse_query(q) == expected
