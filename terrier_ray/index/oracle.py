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
    def __init__(self, webtext_path: str, field: str = "body"):
        t = pads.dataset(webtext_path).to_table()
        urls = t.column("url").to_pylist()
        ts = t.column("warc_ts").to_pylist()
        htmls = t.column("html").to_pylist()
        texts = t.column("text").to_pylist()
        doc_ids = url_doc_id(urls)
        # dedup: per docid keep max (warc_ts, token count, content hash) —
        # the deterministic 3-tuple rule shared with build._dedup_group;
        # the hash input is the RAW token stream on both sides (the engine
        # computes it per doc in the Tokenizer as the corpus chash column)
        from terrier_ray.extract.html import extract_title_reference
        from terrier_ray.text.tokenize import token_stream_hash

        langs = (
            t.column("lang").to_pylist()
            if "lang" in t.column_names
            else [""] * len(urls)
        )
        best: dict[int, tuple] = {}
        for i in range(len(urls)):
            if field == "title":
                text = extract_title_reference(htmls[i])
            else:
                text = texts[i] if texts[i] else extract_text_reference(htmls[i])
            toks = tokenize(text)
            key = int(doc_ids[i])
            cand = (ts[i], len(toks), token_stream_hash(toks), toks, langs[i])
            if key not in best or cand[:3] > best[key][:3]:
                best[key] = cand
        self.doc_tokens = {d: v[3] for d, v in best.items()}
        #: facet attribute of the winner row (bm25_facets oracle)
        self.lang = {d: v[4] for d, v in best.items()}
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

    def score_map(self, query: str) -> dict[int, float]:
        """Full per-doc scores (no top-k cut) — the per-field BM25F feed;
        same scalar accumulation as ``search``."""
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
        return scores

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        # ONE copy of the pinned accumulation (score_map); identical float
        # behavior — sorting the full map doesn't touch the sums
        ranked = sorted(self.score_map(query).items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    # -- fuzzy retrieval (independent scalar re-implementation) ----------

    @staticmethod
    def _osa(a: str, b: str, transpositions: bool = True) -> int:
        """Full-matrix optimal-string-alignment distance (no banding)."""
        m, n = len(a), len(b)
        d = [[0] * (n + 1) for _ in range(m + 1)]
        for i in range(m + 1):
            d[i][0] = i
        for j in range(n + 1):
            d[0][j] = j
        for i in range(1, m + 1):
            for j in range(1, n + 1):
                cost = 0 if a[i - 1] == b[j - 1] else 1
                d[i][j] = min(
                    d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost
                )
                if (
                    transpositions
                    and i > 1
                    and j > 1
                    and a[i - 1] == b[j - 2]
                    and a[i - 2] == b[j - 1]
                ):
                    d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
        return d[m][n]

    def fuzzy_expand(
        self,
        term: str,
        max_edits: int = 1,
        prefix_len: int = 1,
        max_expansions: int = 50,
    ) -> list[tuple[str, int, int]]:
        """(variant, ed, df) within ``max_edits`` of ``term`` sharing its
        first ``prefix_len`` chars; order pinned (ed asc, df desc, term
        asc), truncated to ``max_expansions`` — the engine contract."""
        pl = min(prefix_len, len(term))
        out = []
        for cand, df in self.df.items():
            if pl and not cand.startswith(term[:pl]):
                continue
            if abs(len(cand) - len(term)) > max_edits:
                continue
            ed = self._osa(term, cand)
            if ed <= max_edits:
                out.append((cand, ed, df))
        out.sort(key=lambda v: (v[1], -v[2], v[0]))
        return out[:max_expansions]

    def search_fuzzy(
        self,
        query: str,
        k: int = 10,
        max_edits: int = 1,
        prefix_len: int = 1,
        max_expansions: int = 50,
    ) -> list[tuple[int, float]]:
        """Scalar fuzzy-BM25: every query term OR-expanded, each variant v
        of term t contributing ``boost * idf(df_v) * wd_v`` with ``boost =
        1 - ed / min(len(t), len(v))``; accumulation in (query-term order)
        x (fuzzy_expand order) — the pinned engine formula."""
        qterms: list[str] = []
        for t in tokenize(query):
            if t not in qterms:
                qterms.append(t)
        scores: dict[int, float] = {}
        for t in qterms:
            for cand, ed, df in self.fuzzy_expand(
                t, max_edits=max_edits, prefix_len=prefix_len,
                max_expansions=max_expansions,
            ):
                boost = 1.0 if ed == 0 else 1.0 - ed / min(len(t), len(cand))
                w = boost * math.log(
                    1.0 + (self.n_docs - df + 0.5) / (df + 0.5)
                )
                for d, tf in self.tf[cand].items():
                    dl = self.dl[d]
                    contrib = w * (
                        tf * (K1 + 1.0)
                        / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
                    )
                    scores[d] = scores.get(d, 0.0) + contrib
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
