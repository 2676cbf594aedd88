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
    """Distributed BM25, default shape = SHARD-SIDE scoring: docid-range
    tasks score with their local doclens and return partial top-k; the
    caller merges k-lists (sorter.cpp:424-430 analog).  Decoded postings
    never transit to the caller; the legacy bucket-fetch scatter path is
    the explicit ``DistributedBM25.search_many_scatter`` opt-in.
    Rank-AND-score-identical to bm25_topk."""
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


def _fetch_indexed_texts(web: str, need: "list[int]") -> "dict[int, str]":
    """ONE pruned distributed pass over the webtext corpus → the extracted
    text of exactly the ``need`` docids, under the SAME winner rule the
    index build used for duplicated urls (``build._dedup_group``: per docid
    keep max (warc_ts, dl, token-hash)), so callers see the text the index
    actually scored.  docid = url hash computed per batch; the is_in filter
    against the tiny hit set is a broadcast semi join — extraction touches
    |need| docs, never the corpus."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from terrier_ray.datagen.webtext import url_doc_id
    from terrier_ray.extract.html import HtmlExtractor
    from terrier_ray.index.build import _dedup_group
    from terrier_ray.text.tokenize import Tokenizer

    need_arr = pa.array(np.asarray(sorted(need), dtype=np.int64))
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
    tok = Tokenizer()(texts_tbl)  # row-aligned with texts_tbl
    winners = _dedup_group(tok.append_column("text", texts_tbl.column("text")))
    return dict(
        zip(
            winners.column("docid").to_pylist(),
            winners.column("text").to_pylist(),
        )
    )


def _mine_phrases(idx, web: str, num_phrases: int) -> "list[str]":
    """Deterministic phrase set: each generated query's BM25 rank-1 doc
    contributes one interior trigram of its token stream, so every phrase
    has ≥1 guaranteed match and the set is stable per scale factor.
    (Mining fetches the seed docs' texts — phrase MATCHING must not.)"""
    from terrier_ray.text.tokenize import tokenize

    queries = generate_queries(num_phrases)
    seed_docs = []
    for text in queries.column("text").to_pylist():
        hits = idx.search(text, 1)
        if hits:
            seed_docs.append(int(hits[0][0]))
    seed_text = _fetch_indexed_texts(web, sorted(set(seed_docs)))
    phrases: list[str] = []
    for d in seed_docs:
        toks = tokenize(seed_text.get(d, ""))
        if len(toks) >= 3:
            s = min(10, len(toks) - 3)
            p = " ".join(toks[s : s + 3])
            if p not in phrases:
                phrases.append(p)
    return phrases


def _phrase_table(rows: "list[tuple[int, str, int, int]]"):
    import pyarrow as pa

    return pa.table(
        {
            "phrase_id": pa.array([r[0] for r in rows], type=pa.int32()),
            "phrase": pa.array([r[1] for r in rows], type=pa.string()),
            "docid": pa.array([r[2] for r in rows], type=pa.int64()),
            "n_occurrences": pa.array([r[3] for r in rows], type=pa.int64()),
        }
    )


def _match_phrases_scan(idx, web: str, phrases: "list[str]"):
    """AND candidates over the index, then verify adjacency by fetching the
    candidates' texts in one pruned distributed pass (the positional-free
    'slow phrase' plan; see phrase_matches)."""
    import numpy as np

    from terrier_ray.text.tokenize import tokenize

    cand = {p: idx.search_boolean(must=[p]) for p in phrases}
    need = sorted({int(d) for ds_ in cand.values() for d in ds_})
    text_of = _fetch_indexed_texts(web, need)
    toks_of = {
        d: np.asarray(tokenize(t), dtype=object) for d, t in text_of.items()
    }

    rows: list[tuple[int, str, int, int]] = []
    for pid, phrase in enumerate(phrases):
        seq = tokenize(phrase)
        for d in cand[phrase]:
            t = toks_of.get(int(d))
            if t is None or len(t) < len(seq):
                continue
            pos = np.flatnonzero(t[: len(t) - len(seq) + 1] == seq[0])
            for j in range(1, len(seq)):
                if len(pos) == 0:
                    break
                pos = pos[t[pos + j] == seq[j]]
            if len(pos):
                rows.append((pid, phrase, int(d), int(len(pos))))
    return _phrase_table(rows)


def _match_phrases_positional(idx, phrases: "list[str]"):
    """Position-intersect phrase matching over a POSITIONAL index: AND the
    terms' postings for candidates, then intersect per-term position lists
    shifted by phrase offset (``positions_for`` decodes one 128-posting
    block per (term, candidate)) — ZERO corpus text reads, so a
    stopword-heavy phrase costs position-block decodes, never a text
    refetch of a huge AND set (the r4 verdict's degenerate case)."""
    import numpy as np

    from terrier_ray.text.tokenize import tokenize

    rows: list[tuple[int, str, int, int]] = []
    for pid, phrase in enumerate(phrases):
        seq = tokenize(phrase)
        cand = idx.search_boolean(must=[phrase])
        if not len(cand) or not seq:
            continue
        cand_list = [int(d) for d in cand]
        posmaps = [idx.positions_for(t, cand_list) for t in seq]
        for d in cand_list:
            acc = posmaps[0].get(d)
            if acc is None:
                continue
            for j in range(1, len(seq)):
                pj = posmaps[j].get(d)
                if pj is None:
                    acc = acc[:0]
                    break
                acc = np.intersect1d(acc, pj - j, assume_unique=True)
                if not len(acc):
                    break
            if len(acc):
                rows.append((pid, phrase, d, int(len(acc))))
    return _phrase_table(rows)


def segmented_phrase_matches(
    segment_dirs: "list[str]",
    phrases: "list[str]",
    tombstone_dirs: "list[str] | None" = None,
):
    """Position-intersect phrase retrieval over a DML-maintained SEGMENTED
    index (every segment built with positions=True): run the per-segment
    positional matcher and union rows, dropping each segment's tombstoned
    docids — live doc sets are disjoint across segments (SegmentedBM25
    contract), so the union has one row per (phrase, live doc), identical
    to a positional rebuild over the post-DML snapshot (tested).  Rows
    sort by (phrase_id, docid) for determinism."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from terrier_ray.index.bm25 import BM25Index, SegmentedBM25

    seg = SegmentedBM25(segment_dirs, tombstone_dirs=tombstone_dirs)
    parts = []
    for sdir, sname in zip(segment_dirs, seg._seg_names):
        tab = _match_phrases_positional(BM25Index(sdir), phrases)
        dead = seg._del_by_seg.get(sname)
        if dead is not None and dead.size and tab.num_rows:
            tab = tab.filter(
                pc.invert(
                    pc.is_in(tab.column("docid"), value_set=pa.array(dead))
                )
            )
        parts.append(tab)
    out = pa.concat_tables(parts)
    return out.sort_by([("phrase_id", "ascending"), ("docid", "ascending")])


def phrase_matches(sf_dir: str, num_phrases: int = 6):
    """Exact phrase retrieval — the "slow phrase" plan: AND the phrase's
    terms over the inverted index (rarest-first vectorized postings
    intersection, ``search_boolean``), fetch ONLY the surviving candidates'
    texts in one pruned distributed pass, and verify token adjacency
    vectorized per candidate (``_match_phrases_scan``).

    Scale posture (1e12 docs): candidates = AND of all phrase terms, so a
    selective phrase prunes to a handful of docs before any text is read; a
    stopword-only phrase degenerates to a huge AND set — the classic fix is
    the POSITIONAL index, which this engine also offers
    (``phrase_matches_positional``: build_index(positions=True) +
    per-posting position deltas intersected instead of re-tokenizing);
    this entry keeps the positional-free plan for indexes built without
    the sidecar.  Rows: (phrase_id, phrase, docid, n_occurrences);
    rows-only — verified exactly vs a naive full-scan oracle in
    tests/test_index_bm25.py.  Reference analog: conjunctive IndexScan +
    table verify (src/include/planner/plannodes/plan_node_defs.h:143-152)."""
    from terrier_ray.index.bm25 import BM25Index

    idx = BM25Index(ensure_index(sf_dir))
    web = webtext_for_sf(sf_dir)
    phrases = _mine_phrases(idx, web, num_phrases)
    return _match_phrases_scan(idx, web, phrases)


def phrase_matches_positional(sf_dir: str, num_phrases: int = 6):
    """Exact phrase retrieval over a POSITIONAL index (the classic fast
    plan): same deterministically-mined phrase set as ``phrase_matches``,
    but matching intersects per-posting position lists — zero corpus text
    reads in the matching phase (spy-asserted in tests), identical rows to
    the scan plan.  The positional index is a separate cached build
    (``build_index(positions=True)``) whose size overhead is logged in its
    stats['positions_bytes']."""
    from terrier_ray.index.bm25 import BM25Index

    web = webtext_for_sf(sf_dir)
    idx_dir = os.path.join(
        INDEX_ROOT, os.path.basename(web.rstrip("/")) + "-pos"
    )
    build_index(web, idx_dir, positions=True)
    idx = BM25Index(idx_dir)
    phrases = _mine_phrases(idx, web, num_phrases)
    return _match_phrases_positional(idx, phrases)


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
    # most webtext rows carry only `html` — the shared pruned fetch runs the
    # SAME extractor + duplicated-url winner rule the index build used, so
    # the snippet is cut from the text the index actually scored
    text_of = _fetch_indexed_texts(webtext_for_sf(sf_dir), need)

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
