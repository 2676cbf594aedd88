"""Naive, obviously-correct pure-Python BM25 oracle (test-only).

Independently re-implements the whole flagship pipeline with dicts and
scalar loops over the RAW webtext parquet: url-dedup (latest warc_ts, then
longest doc), extraction via the reference extractor, canonical tokenization,
df/tf counting, and BM25 scoring with the pinned formula.  The engine's
distributed build+query must be rank-identical (docids AND scores) to this.
"""

from __future__ import annotations

import math

import pyarrow.dataset as pads

from terrier_ray.datagen.webtext import url_doc_id
from terrier_ray.extract.html import extract_text_reference
from terrier_ray.text.tokenize import tokenize

K1 = 1.2
B = 0.75


class OracleBM25:
    def __init__(self, webtext_path: str):
        t = pads.dataset(webtext_path).to_table()
        urls = t.column("url").to_pylist()
        ts = t.column("warc_ts").to_pylist()
        htmls = t.column("html").to_pylist()
        texts = t.column("text").to_pylist()
        doc_ids = url_doc_id(urls)
        # dedup: per docid keep max (warc_ts, token count, content hash) —
        # the deterministic 3-tuple rule shared with build._dedup_group
        from terrier_ray.index.build import _token_hash

        best: dict[int, tuple] = {}
        for i in range(len(urls)):
            text = texts[i] if texts[i] else extract_text_reference(htmls[i])
            toks = tokenize(text)
            key = int(doc_ids[i])
            cand = (ts[i], len(toks), _token_hash(toks), toks)
            if key not in best or cand[:3] > best[key][:3]:
                best[key] = cand
        self.doc_tokens = {d: v[3] for d, v in best.items()}
        self.n_docs = len(best)
        self.dl = {d: len(tk) for d, tk in self.doc_tokens.items()}
        self.avgdl = sum(self.dl.values()) / self.n_docs if self.n_docs else 0.0
        self.df: dict[str, int] = {}
        self.tf: dict[str, dict[int, int]] = {}
        for d, toks in self.doc_tokens.items():
            seen: dict[str, int] = {}
            for tok in toks:
                seen[tok] = seen.get(tok, 0) + 1
            for tok, c in seen.items():
                self.df[tok] = self.df.get(tok, 0) + 1
                self.tf.setdefault(tok, {})[d] = c

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        qterms: list[str] = []
        for t in tokenize(query):
            if t not in qterms:
                qterms.append(t)
        scores: dict[int, float] = {}
        for t in qterms:
            if t not in self.df:
                continue
            w = math.log(1.0 + (self.n_docs - self.df[t] + 0.5) / (self.df[t] + 0.5))
            for d, tf in self.tf[t].items():
                dl = self.dl[d]
                contrib = w * (
                    tf * (K1 + 1.0)
                    / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
                )
                scores[d] = scores.get(d, 0.0) + contrib
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
