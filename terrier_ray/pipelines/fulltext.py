"""Flagship pipeline: webtext → inverted index → BM25 top-k (north rule).

The webtext corpus is synthesized deterministically per scale factor (no
external data; see terrier_ray/datagen/webtext.py) and the index is cached
under /tmp keyed by corpus — repeat calls reuse the built index via the
epoch manifests.
"""

from __future__ import annotations

import os

from terrier_ray.datagen.webtext import generate_queries, webtext_for_sf
from terrier_ray.index.bm25 import BM25Scorer
from terrier_ray.index.build import build_index

INDEX_ROOT = "/tmp/terrier_ray_index"


def ensure_index(sf_dir: str, **kwargs) -> str:
    web = webtext_for_sf(sf_dir)
    idx_dir = os.path.join(INDEX_ROOT, os.path.basename(web.rstrip("/")))
    build_index(web, idx_dir, **kwargs)
    return idx_dir


def bm25_topk(sf_dir: str, k: int = 10, num_queries: int = 20):
    """Build (or reuse) the index for this sf and run the query set through a
    BM25Scorer actor pool → (query_id, rank, docid, score)."""
    import ray.data as rd

    idx_dir = ensure_index(sf_dir)
    queries = generate_queries(num_queries)
    ds = rd.from_arrow(queries).repartition(4)
    return ds.map_batches(
        BM25Scorer,
        batch_format="pyarrow",
        batch_size=8,
        concurrency=2,
        fn_constructor_kwargs={"index_dir": idx_dir, "k": k},
    )


def bm25_topk_distributed(sf_dir: str, k: int = 10, num_queries: int = 20):
    """Scatter-gather BM25: per-bucket Ray tasks fetch postings, caller
    scores + merges (rank-identical to bm25_topk)."""
    import pyarrow as pa

    from terrier_ray.index.bm25 import DistributedBM25

    idx_dir = ensure_index(sf_dir)
    queries = generate_queries(num_queries)
    engine = DistributedBM25(idx_dir)
    res = engine.search_many(queries.column("text").to_pylist(), k=k)
    qids, ranks, docids, scores = [], [], [], []
    for qid, hits in zip(queries.column("query_id").to_pylist(), res):
        for rank, (d, s) in enumerate(hits, start=1):
            qids.append(qid)
            ranks.append(rank)
            docids.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int32()),
            "rank": pa.array(ranks, type=pa.int32()),
            "docid": pa.array(docids, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    )


def boolean_matches(sf_dir: str, num_queries: int = 10):
    """Unranked boolean retrieval over the same inverted index: for each
    generated query "t1 t2 t3 ..." run MUST=t1 ∧ SHOULD=(t2|t3) ∧ NOT=last
    term; returns (query_id, docid) match rows (rows-only: verified exactly
    vs a naive corpus scan in tests/test_index_bm25.py)."""
    import pyarrow as pa

    from terrier_ray.index.bm25 import BM25Index

    idx_dir = ensure_index(sf_dir)
    idx = BM25Index(idx_dir)
    queries = generate_queries(num_queries)
    qids, docids = [], []
    for qid, text in zip(
        queries.column("query_id").to_pylist(), queries.column("text").to_pylist()
    ):
        terms = text.split()
        hits = idx.search_boolean(
            must=terms[:1],
            should=terms[1:3] or None,
            must_not=terms[3:4] or None,
        )
        qids.extend([qid] * len(hits))
        docids.extend(int(d) for d in hits)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int32()),
            "docid": pa.array(docids, type=pa.int64()),
        }
    )


def index_corpus_stats(sf_dir: str):
    """Corpus-level stats of the built index (docs, postings, terms)."""
    import pandas as pd

    idx_dir = ensure_index(sf_dir)
    import json

    with open(os.path.join(idx_dir, "stats.json")) as f:
        stats = json.load(f)
    bm = pd.read_parquet(os.path.join(idx_dir, "bucket_metrics.parquet"))
    return pd.DataFrame(
        {
            "n_docs": [stats["n_docs"]],
            "avgdl": [round(stats["avgdl"], 4)],
            "n_terms": [int(bm["n_terms"].sum())],
            "n_postings": [int(bm["n_postings"].sum())],
            "n_heavy_terms": [len(stats["heavy_terms"])],
        }
    )
