"""Tests for pipelines/selection.py (budget selection, duplicated n-grams)
and the SemDeDup operator in pipelines/similarity.py."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from terrier_ray.pipelines.selection import (
    _BUDGET_DEN,
    _BUDGET_NUM,
    _gram_stream,
    duplicated_ngram_stats,
    take_until_budget,
)


def _collect(ds) -> pd.DataFrame:
    return pa.concat_tables(
        ds.iter_batches(batch_size=None, batch_format="pyarrow")
    ).to_pandas()


def test_take_until_budget_matches_naive(ray_session, sf_smoke):
    got = (
        _collect(take_until_budget(sf_smoke))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = pq.read_table(
        f"{sf_smoke}/documents.parquet", columns=["doc_id", "n_chars"]
    ).to_pandas()
    total = int(docs["n_chars"].sum())
    budget = (_BUDGET_NUM * total) // _BUDGET_DEN
    ordered = docs.sort_values(
        ["n_chars", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    ordered["cum_chars"] = ordered["n_chars"].cumsum()
    want = (
        ordered[ordered["cum_chars"] <= budget]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["doc_id", "n_chars", "cum_chars"]], want)
    # boundary exactness: budget is genuinely binding (not all docs kept)
    assert 0 < len(want) < len(docs)
    assert int(want["cum_chars"].max()) <= budget


def test_gram_stream_boundaries():
    batch = pa.table(
        {
            "doc_id": pa.array([7, 8, 9], type=pa.int64()),
            "text": ["a b c d e f", "x y", "p q r s t"],
        }
    )
    g = _gram_stream(batch, 5).to_pandas()
    # doc 7: 2 grams; doc 8: too short; doc 9: exactly 1
    assert sorted(g["gram"][g["doc_id"] == 7]) == ["a b c d e", "b c d e f"]
    assert (g["doc_id"] == 8).sum() == 0
    assert list(g["gram"][g["doc_id"] == 9]) == ["p q r s t"]
    # no gram straddles the doc-7/doc-8 boundary
    assert not g["gram"].str.contains("f x").any()


def test_duplicated_ngram_stats_matches_naive(ray_session, sf_smoke):
    got = (
        _collect(duplicated_ngram_stats(sf_smoke))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = pq.read_table(
        f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    from collections import Counter, defaultdict

    per_doc: dict[int, Counter] = {}
    docs_of: dict[str, set] = defaultdict(set)
    for did, text in zip(docs["doc_id"], docs["text"]):
        w = text.split(" ")
        c = Counter(
            " ".join(w[i : i + 5]) for i in range(len(w) - 4)
        )
        if c:
            per_doc[int(did)] = c
            for gram in c:
                docs_of[gram].add(int(did))
    rows = []
    for did, c in per_doc.items():
        n = sum(c.values())
        d = sum(v for g, v in c.items() if len(docs_of[g]) >= 2)
        rows.append((did, n, d))
    want = (
        pd.DataFrame(rows, columns=["doc_id", "n_grams", "n_dup_grams"])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # the synthetic corpus genuinely repeats 5-grams across docs
    assert int(want["n_dup_grams"].sum()) > 0


def test_semdedup_drops_planted_duplicates(ray_session, sf_smoke):
    from terrier_ray.pipelines.similarity import semdedup

    emb = pq.read_table(
        f"{sf_smoke}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    # plant exact copies of vectors 0..2 under fresh high ids
    base = emb.slice(0, 3).to_pydict()
    max_id = int(pa.compute.max(emb.column("vec_id")).as_py())
    extra = pa.table(
        {
            "vec_id": pa.array(
                [max_id + 1, max_id + 2, max_id + 3], type=pa.int64()
            ),
            "embedding": pa.array(
                base["embedding"], type=emb.schema.field("embedding").type
            ),
        }
    )
    out = _collect(semdedup(sf_smoke, threshold=0.999, extra=extra))
    out = out.set_index("vec_id")
    # every planted copy is dropped; its lower-id exemplar is kept
    for orig, copy in zip(base["vec_id"], [max_id + 1, max_id + 2, max_id + 3]):
        assert bool(out.loc[orig, "keep"]) is True
        assert bool(out.loc[copy, "keep"]) is False
    # nothing else in the corpus sits above 0.999 cosine
    kept = out["keep"].sum()
    assert kept == len(out) - 3
    # copies land in the same cell as their exemplar (same vector)
    for orig, copy in zip(base["vec_id"], [max_id + 1, max_id + 2, max_id + 3]):
        assert out.loc[orig, "cell"] == out.loc[copy, "cell"]
