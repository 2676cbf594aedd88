"""Lucene-style query-string language over the inverted index.

One user-facing front door for every retrieval primitive the engine
exposes — the search-side analog of the SQL front-end (the reference's
user surface is the Postgres wire parser, ``/root/reference/src/parser``;
an IR engine's is the query string):

    +distributed -slow title:ray "exact phrase" fuzzy~1 pre* body^2.5

Grammar (whitespace-separated clauses)::

    clause := [occur] [field ':'] atom ['^' boost]
    occur  := '+' (MUST) | '-' (MUST_NOT)        # default: SHOULD
    atom   := '"' words '"'                      # phrase (positional index)
            | word '*'                           # prefix expansion
            | word '~' [edits]                   # fuzzy (OSA, default ed<=1)
            | word                               # plain term

Execution semantics (pinned for determinism; Lucene BooleanQuery analog):

- Every MUST and SHOULD clause contributes BM25 score; accumulation runs
  in CLAUSE order, then expansion order within a clause (float64
  ``np.add.at`` — the exact discipline of ``BM25Index.search``, so a
  bare-terms query is score-identical to exact TAAT, tested).
- MUST clauses filter: a doc must match every one (a multi-token MUST
  term clause requires ALL its tokens).  MUST_NOT clauses exclude docs
  matching ANY of their expansions.  With no MUST clause, membership
  comes from the scoring union (>=1 SHOULD matched).  A query with no
  positive clause is rejected (pure-negative needs a corpus scan — use
  ``search_boolean`` for unranked complement semantics).
- ``term*``: dictionary prefix scan (``terms_in_range`` — pruned
  (term, df) column read, no posting blobs), capped at ``max_expansions``
  selected by (df desc, term asc); each variant scores as itself
  (own idf) times the clause boost.
- ``term~e``: ``fuzzy_expand`` (OSA distance, required common prefix,
  same cap); variant weight = boost * (1 - ed / min(len(term),
  len(variant))) — Lucene FuzzyQuery's similarity ramp.
- ``"a b c"``: the phrase is scored as a PSEUDO-TERM — df = number of
  docs containing the exact adjacent sequence, tf = occurrence count —
  through the standard BM25 weight, using position-list intersection
  over a positional index (``positions_for`` — zero corpus text reads).
  Requires ``build_index(positions=True)``; raises otherwise.
- ``field:atom`` routes the clause to that field's index (per-field
  indexes share the corpus docid space, so set algebra composes across
  fields); unknown fields raise.

Scale posture: every path composes the one-bucket-probe ``lookup``, the
pruned dictionary scan, and per-block position decodes — candidate sets
are bounded by clause df and no stage reads corpus text.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

__all__ = ["Clause", "parse_query", "QueryStringEngine"]

MUST, SHOULD, MUST_NOT = "+", "", "-"


@dataclass(frozen=True)
class Clause:
    occur: str  # '+' | '' | '-'
    field: str | None  # None = default field
    kind: str  # 'term' | 'phrase' | 'prefix' | 'fuzzy'
    text: str
    boost: float = 1.0
    max_edits: int = 1


_CLAUSE_RE = re.compile(
    r"""
    (?P<occur>[+-])?
    (?:(?P<field>[A-Za-z_][A-Za-z0-9_]*):)?
    (?:
        "(?P<phrase>[^"]*)"
      | (?P<word>[^\s+\-^~*:"][^\s^~*:"]*)
        (?:(?P<star>\*)|~(?P<edits>[0-9])?)?
    )
    (?:\^(?P<boost>[0-9]+(?:\.[0-9]+)?))?
    """,
    re.VERBOSE,
)


def parse_query(q: str) -> list[Clause]:
    """Parse a query string into clauses; raises ValueError with the
    offending offset on junk the grammar can't consume."""
    clauses: list[Clause] = []
    pos, n = 0, len(q)
    while pos < n:
        if q[pos].isspace():
            pos += 1
            continue
        m = _CLAUSE_RE.match(q, pos)
        if m is None or m.end() == m.start():
            raise ValueError(f"query syntax error at offset {pos}: {q[pos:]!r}")
        occur = m.group("occur") or SHOULD
        field = m.group("field")
        boost = float(m.group("boost")) if m.group("boost") else 1.0
        if m.group("phrase") is not None:
            c = Clause(occur, field, "phrase", m.group("phrase"), boost)
        else:
            word = m.group("word")
            if m.group("star"):
                c = Clause(occur, field, "prefix", word, boost)
            elif "~" in q[m.start() : m.end()].split("^")[0]:
                ed = int(m.group("edits")) if m.group("edits") else 1
                if not 1 <= ed <= 2:
                    raise ValueError(f"fuzzy edits must be 1..2, got {ed}")
                c = Clause(occur, field, "fuzzy", word, boost, max_edits=ed)
            else:
                c = Clause(occur, field, "term", word, boost)
        clauses.append(c)
        pos = m.end()
    if not clauses:
        raise ValueError("empty query")
    if all(c.occur == MUST_NOT for c in clauses):
        raise ValueError(
            "pure-negative query needs a corpus scan; use search_boolean"
        )
    return clauses


def _phrase_occurrences(idx, phrase: str):
    """(docids ascending int64, per-doc adjacency-match counts int64) for
    the exact token sequence, by position-list intersection (the
    ``_match_phrases_positional`` kernel, expressed index-side)."""
    from terrier_ray.index.bm25 import _query_terms
    from terrier_ray.text.tokenize import tokenize

    seq = tokenize(phrase)
    if not seq:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if not idx.has_positions:
        raise ValueError(
            "phrase clauses need a positional index (build_index(positions=True))"
        )
    cand = idx.search_boolean(must=[phrase])
    if not len(cand):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    cand_list = [int(d) for d in cand]
    # one positions fetch per UNIQUE term (a repeated token reuses it)
    posmaps = {t: idx.positions_for(t, cand_list) for t in _query_terms(phrase)}
    docs: list[int] = []
    counts: list[int] = []
    for d in cand_list:
        acc = posmaps[seq[0]].get(d)
        if acc is None:
            continue
        for j in range(1, len(seq)):
            pj = posmaps[seq[j]].get(d)
            if pj is None:
                acc = acc[:0]
                break
            acc = np.intersect1d(acc, pj - j, assume_unique=True)
            if not len(acc):
                break
        if len(acc):
            docs.append(d)
            counts.append(int(len(acc)))
    return np.asarray(docs, np.int64), np.asarray(counts, np.int64)


class QueryStringEngine:
    """Execute parsed query strings over one or more per-field
    ``BM25Index`` handles (same corpus; docids are corpus-global)."""

    def __init__(
        self,
        indexes,  # BM25Index | dict[str, BM25Index]
        default_field: str = "body",
        max_expansions: int = 50,
    ):
        if not isinstance(indexes, dict):
            indexes = {default_field: indexes}
        self.indexes = indexes
        self.default_field = default_field
        self.max_expansions = max_expansions

    def _index_of(self, field: str | None):
        f = field or self.default_field
        try:
            return self.indexes[f]
        except KeyError:
            raise ValueError(
                f"unknown field {f!r}; indexed fields: {sorted(self.indexes)}"
            ) from None

    def _expand(self, idx, c: Clause) -> "list[tuple[str, float]]":
        """Clause → [(index term, weight)] in pinned order (see module doc)."""
        from terrier_ray.index.bm25 import _query_terms

        if c.kind == "term":
            return [(t, c.boost) for t in _query_terms(c.text)]
        if c.kind == "prefix":
            tab = idx.terms_in_range(prefix=c.text.lower())
            # (df desc, term asc), capped — fuzzy_expand's selection discipline
            df = tab.column("df").to_numpy(zero_copy_only=False)
            terms = tab.column("term").to_pylist()
            order = sorted(range(len(terms)), key=lambda i: (-int(df[i]), terms[i]))
            return [(terms[i], c.boost) for i in order[: self.max_expansions]]
        if c.kind == "fuzzy":
            base = c.text.lower()
            out = []
            for variant, ed, _df in idx.fuzzy_expand(
                base, max_edits=c.max_edits, max_expansions=self.max_expansions
            ):
                sim = 1.0 - ed / max(1, min(len(base), len(variant)))
                out.append((variant, c.boost * sim))
            return out
        raise AssertionError(c.kind)  # phrase handled by caller

    def _clause_postings(self, c: Clause):
        """Clause → (chunks, match_docids): ``chunks`` is the in-order list
        of (docids int64, weighted float64 contribs) feeding accumulation;
        ``match_docids`` (sorted unique int64) is the clause's match set.
        A multi-token MUST term clause matches the AND of its tokens; every
        other expansion matches the union (docids present in any chunk)."""
        from terrier_ray.index.bm25 import K1, B, idf

        idx = self._index_of(c.field)
        if c.kind == "phrase":
            docs, counts = _phrase_occurrences(idx, c.text)
            if not len(docs):
                return [], docs
            tf = counts.astype(np.float64)
            dl = idx.doc_len(docs).astype(np.float64)
            wd = tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / idx.avgdl))
            contrib = c.boost * idf(idx.n_docs, len(docs)) * wd
            return [(docs, contrib)], docs
        pairs = self._expand(idx, c)
        post = idx.lookup([t for t, _ in pairs])
        chunks = []
        per_term_docs = []
        for t, w in pairs:
            p = post.get(t)
            if p is None:
                per_term_docs.append(np.empty(0, np.int64))
                continue
            d = p[1].astype(np.int64)
            chunks.append((d, w * idf(idx.n_docs, p[0]) * idx._wd_of(t, p)))
            per_term_docs.append(d)
        if c.kind == "term" and c.occur == MUST and len(pairs) > 1:
            match = per_term_docs[0]
            for d in per_term_docs[1:]:
                match = np.intersect1d(match, d, assume_unique=True)
        else:
            match = (
                np.unique(np.concatenate(per_term_docs))
                if per_term_docs
                else np.empty(0, np.int64)
            )
        return chunks, match

    def search(self, q: str, k: int = 10) -> "list[tuple[int, float]]":
        clauses = parse_query(q)
        chunks_d: list[np.ndarray] = []
        chunks_c: list[np.ndarray] = []
        must_sets: list[np.ndarray] = []
        not_sets: list[np.ndarray] = []
        for c in clauses:
            chunks, match = self._clause_postings(c)
            if c.occur == MUST_NOT:
                not_sets.append(match)
                continue  # negative clauses never score
            for d, w in chunks:
                chunks_d.append(d)
                chunks_c.append(w)
            if c.occur == MUST:
                must_sets.append(match)
        if not chunks_d:
            return []
        all_d = np.concatenate(chunks_d)
        all_c = np.concatenate(chunks_c)
        uniq, inverse = np.unique(all_d, return_inverse=True)
        acc = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(acc, inverse, all_c)  # clause order (module doc)
        keep = np.ones(len(uniq), dtype=bool)
        for ms in must_sets:
            keep &= np.isin(uniq, ms, assume_unique=True)
        if not_sets:
            excl = np.unique(np.concatenate(not_sets))
            if len(excl):
                keep &= ~np.isin(uniq, excl, assume_unique=True)
        uniq, acc = uniq[keep], acc[keep]
        if not len(uniq):
            return []
        kk = min(k, len(uniq))
        order = np.lexsort((uniq, -acc))[:kk]  # score desc, docid asc
        return [(int(uniq[i]), float(acc[i])) for i in order]
