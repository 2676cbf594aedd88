"""Title-field extraction + BM25F multi-field ranking vs scalar oracles."""

from __future__ import annotations

import os

import pytest

from terrier_ray.datagen.webtext import generate_queries
from terrier_ray.extract.html import extract_title_reference
from terrier_ray.index.bm25 import BM25Index
from terrier_ray.index.build import build_index
from terrier_ray.index.oracle import OracleBM25


@pytest.fixture(scope="module")
def title_index(ray_session, webtext_small, tmp_root):
    out = os.path.join(str(tmp_root), "index_title")
    stats = build_index(webtext_small, out, num_buckets=4, num_salts=2,
                        field="title")
    return out, stats


@pytest.fixture(scope="module")
def body_index(ray_session, webtext_small, tmp_root):
    out = os.path.join(str(tmp_root), "index_body_mf")
    stats = build_index(webtext_small, out, num_buckets=4, num_salts=2)
    return out, stats


@pytest.fixture(scope="module")
def title_oracle(webtext_small):
    return OracleBM25(webtext_small, field="title")


@pytest.fixture(scope="module")
def body_oracle(webtext_small):
    return OracleBM25(webtext_small)


def test_title_extractor_reference():
    assert extract_title_reference(b"<html><title>Hello  World</title></html>") == "Hello World"
    # case-insensitive, attributes, entities, inner tags, newlines
    assert extract_title_reference(
        b'<TITLE lang="en">a &amp;\n <b>b</b>\tc</TITLE>'
    ) == "a & b c"
    # first title wins
    assert extract_title_reference(b"<title>one</title><title>two</title>") == "one"
    # unterminated -> to end of doc (tags inside stripped)
    assert extract_title_reference(b"<title>open ended <p>rest") == "open ended rest"
    # absent / empty
    assert extract_title_reference(b"<html><body>no title</body></html>") == ""
    assert extract_title_reference(b"") == ""
    assert extract_title_reference(None) == ""


def test_title_index_stats_match_oracle(title_index, title_oracle):
    _, stats = title_index
    assert stats["n_docs"] == title_oracle.n_docs
    assert stats["avgdl"] == title_oracle.avgdl
    # titles are 3-8 token prefixes: much shorter than bodies
    assert 0 < title_oracle.avgdl < 10


def test_title_index_rank_identical(title_index, title_oracle):
    out, _ = title_index
    idx = BM25Index(out)
    queries = generate_queries(20)
    n_nonempty = 0
    for qid, text in zip(
        queries.column("query_id").to_pylist(), queries.column("text").to_pylist()
    ):
        got = idx.search(text, k=10)
        want = title_oracle.search(text, k=10)
        assert got == want, f"query {qid} ({text!r}): {got} != {want}"
        n_nonempty += bool(got)
    assert n_nonempty > 5  # titles are 3-8 tokens: fewer queries hit them


def test_bm25f_combination_identity(
    title_index, body_index, title_oracle, body_oracle
):
    """Engine BM25F (vectorized per-field score_all + title-then-body
    np.add.at combination) bit-identical to the scalar two-oracle mirror:
    acc[d] = w_t * S_title(d); acc[d] += w_b * S_body(d)."""
    from terrier_ray.pipelines.fulltext import bm25f_combine

    w_t, w_b, k = 2.0, 1.0, 10
    queries = generate_queries(15)
    got = bm25f_combine(
        BM25Index(title_index[0]), BM25Index(body_index[0]), queries,
        k=k, w_title=w_t, w_body=w_b,
    )
    engine_rows = list(
        zip(
            got.column("query_id").to_pylist(),
            got.column("rank").to_pylist(),
            got.column("docid").to_pylist(),
            got.column("score").to_pylist(),
        )
    )
    want_rows = []
    for qid, text in zip(
        queries.column("query_id").to_pylist(), queries.column("text").to_pylist()
    ):
        acc: dict[int, float] = {}
        for d, s in title_oracle.score_map(text).items():
            acc[d] = w_t * s
        for d, s in body_oracle.score_map(text).items():
            acc[d] = acc.get(d, 0.0) + w_b * s
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for rank, (d, s) in enumerate(ranked, start=1):
            want_rows.append((qid, rank, d, s))
    assert engine_rows == want_rows
    assert len(engine_rows) > 80


def test_bm25f_title_weight_changes_ranking(
    title_index, body_index, title_oracle, body_oracle
):
    """A doc whose title matches the query must outrank pure-body matches
    when w_title dominates — the point of field boosts.  Verified
    structurally: with w_title=0 the combination equals plain body BM25."""
    from terrier_ray.pipelines.fulltext import bm25f_combine

    queries = generate_queries(10)
    body_only = bm25f_combine(
        BM25Index(title_index[0]), BM25Index(body_index[0]), queries,
        k=10, w_title=0.0, w_body=1.0,
    )
    idx_body = BM25Index(body_index[0])
    for qid, text in zip(
        queries.column("query_id").to_pylist(), queries.column("text").to_pylist()
    ):
        mask = [q == qid for q in body_only.column("query_id").to_pylist()]
        got = [
            (d, s)
            for d, s, m in zip(
                body_only.column("docid").to_pylist(),
                body_only.column("score").to_pylist(),
                mask,
            )
            if m
        ]
        # w_title=0 contributes exact 0.0 per title posting; docids with
        # ONLY title hits surface with score 0.0 at the tail — drop them
        want = idx_body.search(text, k=10)
        got_nonzero = [(d, s) for d, s in got if s != 0.0]
        assert got_nonzero == want[: len(got_nonzero)], (qid, text)


def test_more_like_this_matches_scalar_mirror(ray_session):
    """Engine MLT (corpus-epoch term vectors + df_of + BM25) bit-identical
    to the scalar oracle mirror of the pinned semantics."""
    import math

    from terrier_ray.datagen.webtext import webtext_for_sf
    from terrier_ray.pipelines.fulltext import more_like_this

    sf = "/root/testdata/sf0.001"
    num_docs, k, max_terms = 5, 10, 10
    got = more_like_this(sf, num_docs=num_docs, k=k, max_terms=max_terms)
    engine_rows = list(
        zip(
            got.column("seed_docid").to_pylist(),
            got.column("rank").to_pylist(),
            got.column("docid").to_pylist(),
            got.column("score").to_pylist(),
        )
    )
    oracle = OracleBM25(webtext_for_sf(sf))
    want_rows = []
    for seed in sorted(oracle.doc_tokens)[:num_docs]:
        seen: dict[str, int] = {}
        for t in oracle.doc_tokens[seed]:
            seen[t] = seen.get(t, 0) + 1
        weighted = sorted(
            (
                (
                    float(tf)
                    * math.log(
                        1.0
                        + (oracle.n_docs - oracle.df[t] + 0.5)
                        / (oracle.df[t] + 0.5)
                    ),
                    t,
                )
                for t, tf in seen.items()
            ),
            key=lambda v: (-v[0], v[1]),
        )
        sel = [t for _, t in weighted[:max_terms]]
        if not sel:
            continue
        hits = [
            (d, s) for d, s in oracle.search(" ".join(sel), k=k + 1) if d != seed
        ]
        for rank, (d, s) in enumerate(hits[:k], start=1):
            want_rows.append((seed, rank, d, s))
    assert engine_rows == want_rows
    assert len(engine_rows) >= num_docs * (k - 2)  # near-full result lists


def test_bm25_facets_match_scalar_mirror(ray_session):
    """Facet counts (query_id, lang, n_docs) identical to the scalar
    mirror: oracle top-k hits x the dedup winner's lang."""
    from terrier_ray.datagen.webtext import webtext_for_sf
    from terrier_ray.pipelines.fulltext import bm25_facets

    sf = "/root/testdata/sf0.001"
    k, num_queries = 25, 8
    got = bm25_facets(sf, k=k, num_queries=num_queries)
    engine_rows = list(
        zip(
            got.column("query_id").to_pylist(),
            got.column("lang").to_pylist(),
            got.column("n_docs").to_pylist(),
        )
    )
    oracle = OracleBM25(webtext_for_sf(sf))
    counts: dict[tuple[int, str], int] = {}
    for qid, text in zip(
        generate_queries(num_queries).column("query_id").to_pylist(),
        generate_queries(num_queries).column("text").to_pylist(),
    ):
        for d, _ in oracle.search(text, k=k):
            key = (qid, oracle.lang[d])
            counts[key] = counts.get(key, 0) + 1
    want_rows = [(q, l, n) for (q, l), n in sorted(counts.items())]
    assert engine_rows == want_rows
    # facets only make sense if several languages actually appear
    assert len({l for _, l, _ in engine_rows}) >= 3


def test_feedback_topk_matches_scalar_mirror(ray_session):
    """Two-pass pseudo-relevance feedback bit-identical to the scalar
    oracle mirror: initial top-fb_docs, tf-sum x idf expansion mining,
    boosted-clause weighted rescoring."""
    import math

    from terrier_ray.datagen.webtext import webtext_for_sf
    from terrier_ray.pipelines.fulltext import feedback_topk
    from terrier_ray.text.tokenize import tokenize

    sf = "/root/testdata/sf0.001"
    k, num_queries, fb_docs, fb_terms, beta = 10, 8, 5, 8, 0.4
    got = feedback_topk(
        sf, k=k, num_queries=num_queries, fb_docs=fb_docs,
        fb_terms=fb_terms, beta=beta,
    )
    engine_rows = list(
        zip(
            got.column("query_id").to_pylist(),
            got.column("rank").to_pylist(),
            got.column("docid").to_pylist(),
            got.column("score").to_pylist(),
        )
    )
    oracle = OracleBM25(webtext_for_sf(sf))

    def oidf(df: int) -> float:
        return math.log(1.0 + (oracle.n_docs - df + 0.5) / (df + 0.5))

    K1, B = 1.2, 0.75
    want_rows = []
    for qid, text in zip(
        generate_queries(num_queries).column("query_id").to_pylist(),
        generate_queries(num_queries).column("text").to_pylist(),
    ):
        qterms: list[str] = []
        for t in tokenize(text):
            if t not in qterms:
                qterms.append(t)
        fb = [d for d, _ in oracle.search(text, k=fb_docs)]
        clauses = [(t, 1.0) for t in qterms]
        if fb:
            tf_sum: dict[str, int] = {}
            for d in fb:
                for t in oracle.doc_tokens[d]:
                    if t not in qterms:
                        tf_sum[t] = tf_sum.get(t, 0) + 1
            weighted = sorted(
                ((float(s) * oidf(oracle.df[t]), t) for t, s in tf_sum.items()),
                key=lambda v: (-v[0], v[1]),
            )[:fb_terms]
            if weighted:
                w_max = weighted[0][0]
                clauses += [(t, beta * w / w_max) for w, t in weighted]
        scores: dict[int, float] = {}
        for t, boost in clauses:
            if t not in oracle.df:
                continue
            w = boost * oidf(oracle.df[t])
            for d, tf in oracle.tf[t].items():
                dl = oracle.dl[d]
                contrib = w * (
                    tf * (K1 + 1.0)
                    / (tf + K1 * (1.0 - B + B * dl / oracle.avgdl))
                )
                scores[d] = scores.get(d, 0.0) + contrib
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for rank, (d, s) in enumerate(ranked, start=1):
            want_rows.append((qid, rank, d, s))
    assert engine_rows == want_rows
    assert len(engine_rows) >= num_queries * (k - 2)


def test_suggest_terms_matches_df_map(ray_session):
    """Autocomplete = exact (df desc, term asc) top-limit of the oracle df
    map restricted to the prefix."""
    from terrier_ray.datagen.webtext import webtext_for_sf
    from terrier_ray.pipelines.fulltext import suggest_terms

    sf = "/root/testdata/sf0.001"
    oracle = OracleBM25(webtext_for_sf(sf))
    for prefix in ("wi", "a", "s"):
        got = suggest_terms(sf, prefix=prefix, limit=10)
        want = sorted(
            ((t, df) for t, df in oracle.df.items() if t.startswith(prefix)),
            key=lambda v: (-v[1], v[0]),
        )[:10]
        assert (
            list(
                zip(got.column("term").to_pylist(), got.column("df").to_pylist())
            )
            == want
        ), prefix
        assert got.num_rows > 0


def test_did_you_mean_matches_oracle_mirror(ray_session):
    """Spell correction identical to the scalar mirror (dictionary
    membership + fuzzy_expand best candidate), and it actually repairs
    most injected typos back to the original query."""
    from terrier_ray.datagen.webtext import generate_queries as gq
    from terrier_ray.datagen.webtext import webtext_for_sf
    from terrier_ray.pipelines.fulltext import _typo_queries, did_you_mean

    sf = "/root/testdata/sf0.001"
    n = 12
    oracle = OracleBM25(webtext_for_sf(sf))
    got = did_you_mean(sf, num_queries=n)
    typod = _typo_queries(n)
    want_corrected = []
    for text in typod.column("text").to_pylist():
        out = []
        for t in text.split():
            if t in oracle.df:
                out.append(t)
                continue
            cands = oracle.fuzzy_expand(t, max_edits=1, prefix_len=1)
            out.append(cands[0][0] if cands else t)
        want_corrected.append(" ".join(out))
    assert got.column("corrected").to_pylist() == want_corrected
    assert got.column("original").to_pylist() == typod.column("text").to_pylist()
    originals = gq(n).column("text").to_pylist()
    n_repaired = sum(
        1 for c, o in zip(want_corrected, originals) if c == o
    )
    assert n_repaired >= n // 2, (n_repaired, list(zip(want_corrected, originals)))


def test_bm25f_true_matches_scalar_mirror(
    title_index, body_index, title_oracle, body_oracle
):
    """TRUE BM25F (field-weighted tf merged before ONE saturation)
    bit-identical to the scalar two-oracle mirror: tf' = w_t*tf_t +
    w_b*tf_b, dl' = w_t*dl_t + w_b*dl_b, avgdl' = w_t*avgdl_t +
    w_b*avgdl_b, df' = |union|, accumulation in query-term order."""
    import math

    from terrier_ray.pipelines.fulltext import bm25f_true_search
    from terrier_ray.text.tokenize import tokenize

    K1, B = 1.2, 0.75
    w_t, w_b, k = 2.0, 1.0, 10
    it, ib = BM25Index(title_index[0]), BM25Index(body_index[0])
    n_docs = body_oracle.n_docs
    avgdlw = w_t * title_oracle.avgdl + w_b * body_oracle.avgdl
    n_nonempty = 0
    for text in generate_queries(15).column("text").to_pylist():
        got = bm25f_true_search(it, ib, text, k=k, w_title=w_t, w_body=w_b)
        qterms: list[str] = []
        for t in tokenize(text):
            if t not in qterms:
                qterms.append(t)
        scores: dict[int, float] = {}
        for t in qterms:
            tft = title_oracle.tf.get(t, {})
            tfb = body_oracle.tf.get(t, {})
            union = sorted(set(tft) | set(tfb))
            if not union:
                continue
            df = len(union)
            w = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            for d in union:
                tfw = w_t * float(tft.get(d, 0)) + w_b * float(tfb.get(d, 0))
                dlw = w_t * float(title_oracle.dl[d]) + w_b * float(
                    body_oracle.dl[d]
                )
                contrib = w * (
                    tfw * (K1 + 1.0)
                    / (tfw + K1 * (1.0 - B + B * dlw / avgdlw))
                )
                scores[d] = scores.get(d, 0.0) + contrib
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        assert got == want, text
        n_nonempty += bool(got)
    assert n_nonempty >= 13
