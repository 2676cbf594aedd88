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


def bm25_topk_sharded(sf_dir: str, k: int = 10, num_queries: int = 20):
    """Shard-side BM25 scoring: docid-range tasks score with their LOCAL
    doclens and return partial top-k; caller merges k-lists (the 1e12-doc
    serving shape — hot-term postings never transit to one process).
    Rank-AND-score-identical to bm25_topk."""
    import pyarrow as pa

    from terrier_ray.index.bm25 import DistributedBM25

    idx_dir = ensure_index(sf_dir)
    queries = generate_queries(num_queries)
    engine = DistributedBM25(idx_dir)
    res = engine.search_many_sharded(
        queries.column("text").to_pylist(), k=k, num_shards=4
    )
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


def prefix_terms(sf_dir: str, prefix: str = "wi"):
    """Term-dictionary prefix scan (IndexScan range analog): all indexed
    terms starting with ``prefix``, with df/cf — column-pruned, predicate-
    pushed reads of the posting buckets (posting blobs never touched)."""
    from terrier_ray.index.bm25 import BM25Index

    idx = BM25Index(ensure_index(sf_dir))
    return idx.terms_in_range(prefix=prefix)


def terms_desc_limit(sf_dir: str, hi: str = "n", limit: int = 50):
    """Descending, limited term-dictionary scan (IndexScanType Descending /
    DescendingLimit analog, plan_node_defs.h:143-152): the ``limit``
    largest indexed terms below ``hi``, df/cf attached, bounded per posting
    bucket before the merge."""
    from terrier_ray.index.bm25 import BM25Index

    idx = BM25Index(ensure_index(sf_dir))
    return idx.terms_in_range(hi=hi, descending=True, limit=limit)


def index_corpus_stats(sf_dir: str):
    """Corpus-level stats of the built index (docs, postings, terms)."""
    import glob
    import json

    import pandas as pd
    import pyarrow.parquet as pq

    idx_dir = ensure_index(sf_dir)
    with open(os.path.join(idx_dir, "stats.json")) as f:
        stats = json.load(f)
    bm = pd.read_parquet(os.path.join(idx_dir, "bucket_metrics.parquet"))
    # per-bucket n_terms is DISTINCT-in-bucket; a salted heavy term spans
    # several buckets, so de-overcount from the (tiny) heavy list exactly
    n_terms = int(bm["n_terms"].sum())
    heavy = stats.get("heavy_terms", [])
    if heavy:
        occ, seen = 0, set()
        for f in sorted(
            glob.glob(os.path.join(idx_dir, "postings", "bucket-*.parquet"))
        ):
            t = pq.read_table(f, filters=[("term", "in", heavy)], columns=["term"])
            terms = set(t.column("term").to_pylist())
            occ += len(terms)
            seen |= terms
        n_terms = n_terms - occ + len(seen)
    return pd.DataFrame(
        {
            "n_docs": [stats["n_docs"]],
            "avgdl": [round(stats["avgdl"], 4)],
            "n_terms": [n_terms],
            "n_postings": [int(bm["n_postings"].sum())],
            "n_heavy_terms": [len(stats["heavy_terms"])],
        }
    )


def bm25_snippets(sf_dir: str, k: int = 5, num_queries: int = 5, window: int = 20):
    """Search-result snippets: BM25 top-k per query, then ONE pruned
    distributed pass over the webtext corpus fetches just the hit docs'
    texts (docid = url hash, computed per batch + is_in filter against the
    tiny hit set — a broadcast semi join), and a per-hit vectorized window
    pick maximizes distinct query terms inside ``window`` tokens.
    Rows: (query_id, rank, docid, snippet); rows-only (free text), the
    contains-a-query-term invariant is unit-tested."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from terrier_ray.datagen.webtext import url_doc_id
    from terrier_ray.index.bm25 import BM25Index, _query_terms
    from terrier_ray.text.tokenize import TOKEN_RE

    idx_dir = ensure_index(sf_dir)
    idx = BM25Index(idx_dir)
    queries = generate_queries(num_queries)
    hits: list[tuple[int, int, int]] = []  # (query_id, rank, docid)
    terms_by_q: dict[int, list[str]] = {}
    for qid, text in zip(
        queries.column("query_id").to_pylist(), queries.column("text").to_pylist()
    ):
        terms_by_q[qid] = _query_terms(text)
        for rank, (docid, _s) in enumerate(idx.search_pruned(text, k=k), start=1):
            hits.append((qid, rank, docid))
    need = sorted({d for _q, _r, d in hits})
    need_arr = pa.array(np.asarray(need, dtype=np.int64))

    web = webtext_for_sf(sf_dir)
    # most webtext rows carry only `html` — snippets must run the SAME
    # extractor the index build used (filter to the tiny hit set FIRST so
    # extraction touches k·queries docs, not the corpus)
    from terrier_ray.extract.html import HtmlExtractor

    ds = rd.read_parquet(web, columns=["url", "warc_ts", "html", "text"])
    extractor = HtmlExtractor()

    def fetch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        d = pa.array(url_doc_id(batch.column("url")).astype(np.int64))
        batch = batch.append_column("docid", d)
        batch = batch.filter(pc_.is_in(d, value_set=need_arr))
        return extractor(batch)

    texts_tbl = pa.concat_tables(
        ds.map_batches(fetch, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    # ~2% of webtext urls are duplicated with DIFFERENT content; the index
    # kept exactly one row per docid (max (warc_ts, dl, token-hash) — see
    # build._dedup_group).  Apply the identical rule here so the snippet is
    # cut from the text the index actually scored (a last-write-wins dict
    # over unordered Ray blocks can pick the wrong duplicate).
    from terrier_ray.index.build import _dedup_group
    from terrier_ray.text.tokenize import Tokenizer

    tok = Tokenizer()(texts_tbl)  # row-aligned with texts_tbl
    winners = _dedup_group(tok.append_column("text", texts_tbl.column("text")))
    text_of = dict(
        zip(
            winners.column("docid").to_pylist(),
            winners.column("text").to_pylist(),
        )
    )

    def best_window(text: str, terms: list[str]) -> str:
        toks = TOKEN_RE.findall(text.lower())
        if not toks:
            return ""
        tset = set(terms)
        is_hit = np.array([t in tset for t in toks])
        if not is_hit.any():
            return " ".join(toks[:window])
        # windowed count of distinct-ish hits: maximize hit count in a
        # `window`-token span (cumsum difference), earliest best span wins
        cs = np.concatenate(([0], np.cumsum(is_hit.astype(np.int64))))
        n = len(toks)
        starts = np.arange(max(1, n - window + 1))
        score = cs[np.minimum(starts + window, n)] - cs[starts]
        s = int(np.argmax(score))
        return " ".join(toks[s : s + window])

    qids, ranks, dids, snips = [], [], [], []
    for qid, rank, docid in hits:
        qids.append(qid)
        ranks.append(rank)
        dids.append(docid)
        snips.append(best_window(text_of.get(docid, ""), terms_by_q[qid]))
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int32()),
            "rank": pa.array(ranks, type=pa.int32()),
            "docid": pa.array(dids, type=pa.int64()),
            "snippet": pa.array(snips, type=pa.string()),
        }
    )
