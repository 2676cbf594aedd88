"""Query-string language: parser structure + execution identities vs the
underlying primitives (exact TAAT, search_weighted, boolean sets, the
positional phrase matcher)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from terrier_ray.datagen.webtext import generate_queries
from terrier_ray.index.bm25 import BM25Index, idf
from terrier_ray.index.build import build_index
from terrier_ray.index.querylang import (
    Clause,
    QueryStringEngine,
    _phrase_occurrences,
    parse_query,
)


@pytest.fixture(scope="module")
def pos_index(ray_session, webtext_small, tmp_root):
    out = os.path.join(str(tmp_root), "index_ql_pos")
    build_index(
        webtext_small, out, num_buckets=4, num_salts=2, positions=True,
        docvalues=True,  # the filter_lang tests share this
    )
    return BM25Index(out)


@pytest.fixture(scope="module")
def title_index_ql(ray_session, webtext_small, tmp_root):
    out = os.path.join(str(tmp_root), "index_ql_title")
    build_index(webtext_small, out, num_buckets=4, num_salts=2, field="title")
    return BM25Index(out)


@pytest.fixture(scope="module")
def engine(pos_index, title_index_ql):
    return QueryStringEngine(
        {"body": pos_index, "title": title_index_ql}, default_field="body"
    )


@pytest.fixture(scope="module")
def qterms(pos_index):
    """A few real mid-frequency dictionary terms, deterministic."""
    tab = pos_index.terms_in_range(lo="m", hi="o")
    df = tab.column("df").to_numpy(zero_copy_only=False)
    terms = np.asarray(tab.column("term").to_pylist(), dtype=object)
    mid = (df >= 5) & (df <= 200)
    picked = terms[mid][:4].tolist()
    assert len(picked) >= 3
    return picked


# ---------------------------------------------------------------- parser


def test_parse_structure():
    cs = parse_query('+title:ray -slow "exact phrase" fuzz~2 pre* body^2.5')
    assert cs == [
        Clause("+", "title", "term", "ray"),
        Clause("-", None, "term", "slow"),
        Clause("", None, "phrase", "exact phrase"),
        Clause("", None, "fuzzy", "fuzz", max_edits=2),
        Clause("", None, "prefix", "pre"),
        Clause("", None, "term", "body", boost=2.5),
    ]
    # bare fuzzy defaults to 1 edit; boost combines with operators
    assert parse_query("a~ b*^3") == [
        Clause("", None, "fuzzy", "a", max_edits=1),
        Clause("", None, "prefix", "b", boost=3.0),
    ]


def test_parse_errors():
    with pytest.raises(ValueError, match="empty"):
        parse_query("   ")
    with pytest.raises(ValueError, match="pure-negative"):
        parse_query("-a -b")
    with pytest.raises(ValueError, match="edits"):
        parse_query("a~5")
    with pytest.raises(ValueError, match="syntax error at offset"):
        parse_query('a ^"broken')


def test_parse_requires_whitespace_between_clauses():
    # a clause ending mid-token is a syntax error, never a silent split:
    # 'a~10' must NOT parse as fuzzy(a, 1) + term('0')
    for bad in ("a~10", "foo*bar", "ab^2cd", '"a b"x'):
        with pytest.raises(ValueError, match="whitespace-separated"):
            parse_query(bad)


def test_parse_dedups_exact_duplicate_clauses():
    # mirrors _query_terms' unique-token rule (first occurrence wins);
    # clauses differing in ANY attribute are kept
    assert parse_query("ray ray") == [Clause("", None, "term", "ray")]
    assert parse_query("ray ray^2") == [
        Clause("", None, "term", "ray"),
        Clause("", None, "term", "ray", boost=2.0),
    ]


def test_repeated_bare_word_identical_to_exact_taat(engine, pos_index, qterms):
    # BM25Index.search dedups query tokens; the clause dedup keeps the
    # engine score-identical on repeated words (module contract)
    a, b = qterms[0], qterms[1]
    assert engine.search(f"{a} {a} {b}", k=10) == pos_index.search(
        f"{a} {a} {b}", k=10
    )


def test_fuzzy_cache_bounded_on_no_match_path(pos_index):
    # the empty-expansion insert must evict too (r5 review finding)
    import string

    before = dict(pos_index._fuzzy_cache)
    old_cap = type(pos_index).CACHE_CAP
    type(pos_index).CACHE_CAP = 8
    try:
        pos_index._fuzzy_cache.clear()
        for a in string.ascii_lowercase:
            # long gibberish: expands to nothing at every first letter
            pos_index.fuzzy_expand(a + "qzxjvkwpqzxjvkwp", max_edits=1)
        assert len(pos_index._fuzzy_cache) <= 8
    finally:
        type(pos_index).CACHE_CAP = old_cap
        pos_index._fuzzy_cache.clear()
        pos_index._fuzzy_cache.update(before)


# ------------------------------------------------------------- execution


def test_bare_terms_identical_to_exact_taat(engine, pos_index):
    for row in generate_queries(5).to_pylist():
        q = row["text"]
        assert engine.search(q, k=10) == pos_index.search(q, k=10)


def test_boost_matches_search_weighted(engine, pos_index, qterms):
    a, b = qterms[0], qterms[1]
    got = engine.search(f"{a}^2 {b}", k=10)
    want = pos_index.search_weighted([(a, 2.0), (b, 1.0)], k=10)
    assert got == want


def test_must_filters_and_scores(engine, pos_index, qterms):
    a, b = qterms[0], qterms[1]
    res = engine.search(f"+{a} {b}", k=1000)
    a_docs = set(int(d) for d in pos_index.search_boolean(must=[a]))
    assert res and all(d in a_docs for d, _ in res)
    # scores are the plain two-term scores, restricted to the MUST set
    full = dict(pos_index.search(f"{a} {b}", k=10**9))
    assert all(full[d] == s for d, s in res)


def test_must_not_excludes(engine, pos_index, qterms):
    a, b = qterms[0], qterms[1]
    res = engine.search(f"{a} -{b}", k=1000)
    b_docs = set(int(d) for d in pos_index.search_boolean(must=[b]))
    assert res and not any(d in b_docs for d, _ in res)
    only_a = dict(pos_index.search(a, k=10**9))
    assert all(only_a[d] == s for d, s in res)


def test_multi_token_must_clause_requires_all(engine, pos_index, qterms):
    a, b = qterms[0], qterms[1]
    # one clause, two tokens ('.' is a token break in the index tokenizer)
    res = engine.search(f"+{a}.{b}", k=1000)
    both = set(int(d) for d in pos_index.search_boolean(must=[f"{a} {b}"]))
    assert set(d for d, _ in res) == both


def test_prefix_expansion_matches_weighted(engine, pos_index, qterms):
    pre = qterms[0][:2]
    tab = pos_index.terms_in_range(prefix=pre)
    df = tab.column("df").to_numpy(zero_copy_only=False)
    terms = tab.column("term").to_pylist()
    order = sorted(range(len(terms)), key=lambda i: (-int(df[i]), terms[i]))
    clauses = [(terms[i], 1.0) for i in order[:50]]
    assert engine.search(f"{pre}*", k=10) == pos_index.search_weighted(
        clauses, k=10
    )


def test_fuzzy_matches_weighted_expansion(engine, pos_index, qterms):
    base = qterms[2]
    typo = base[:-1] + ("x" if base[-1] != "x" else "q")
    clauses = [
        (v, 1.0 - ed / max(1, min(len(typo), len(v))))
        for v, ed, _df in pos_index.fuzzy_expand(typo, max_edits=1)
    ]
    got = engine.search(f"{typo}~1", k=10)
    assert got == pos_index.search_weighted(clauses, k=10)
    assert got  # the un-typo'd dictionary term is within one edit


def test_phrase_pseudo_term_scoring(engine, pos_index, webtext_small):
    from terrier_ray.index.bm25 import B, K1
    from terrier_ray.pipelines.fulltext import _mine_phrases

    phrase = _mine_phrases(pos_index, webtext_small, 1)[0]
    docs, counts = _phrase_occurrences(pos_index, phrase)
    assert len(docs)
    tf = counts.astype(np.float64)
    dl = pos_index.doc_len(docs).astype(np.float64)
    wd = tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / pos_index.avgdl))
    contrib = idf(pos_index.n_docs, len(docs)) * wd
    order = np.lexsort((docs, -contrib))[: min(10, len(docs))]
    want = [(int(docs[i]), float(contrib[i])) for i in order]
    assert engine.search(f'"{phrase}"', k=10) == want


def test_phrase_as_must_filter(engine, pos_index, webtext_small, qterms):
    from terrier_ray.pipelines.fulltext import _mine_phrases

    phrase = _mine_phrases(pos_index, webtext_small, 1)[0]
    docs, _ = _phrase_occurrences(pos_index, phrase)
    res = engine.search(f'+"{phrase}" {qterms[0]}', k=1000)
    assert res and set(d for d, _ in res) <= set(int(d) for d in docs)


def test_phrase_requires_positions(title_index_ql):
    eng = QueryStringEngine(title_index_ql, default_field="title")
    with pytest.raises(ValueError, match="positional"):
        eng.search('title:"some phrase"')


def test_field_scoping(engine, title_index_ql, qterms):
    # a title:term clause is scored by the title index exactly
    t = qterms[0]
    assert engine.search(f"title:{t}", k=10) == title_index_ql.search(t, k=10)
    with pytest.raises(ValueError, match="unknown field"):
        engine.search("url:xyz")


def test_distributed_identical_to_local(
    ray_session, engine, pos_index, webtext_small, qterms
):
    """search_distributed must be rank-AND-score-identical (exact float
    equality) to the single-handle engine for every construct, at a shard
    count that forces real range splits."""
    from terrier_ray.pipelines.fulltext import _mine_phrases

    a, b = qterms[0], qterms[1]
    phrase = _mine_phrases(pos_index, webtext_small, 1)[0]
    typo = qterms[2][:-1] + ("x" if qterms[2][-1] != "x" else "q")
    suite = [
        f"{a} {b}",
        f"+{a} {b}",
        f"{a} -{b}",
        f"{a}^2 {b}",
        f"{a[:2]}*",
        f"{typo}~1",
        f'"{phrase}"',
        f'+"{phrase}" {a}',
        f'{a} -"{phrase}"',
        f"title:{a} {b}",
        f"+{a}.{b} title:{a}^1.5",
    ]
    suite += [
        f'"{phrase}"~2',
        f'+"{phrase}"~1 {a}',
        f'{a} -"{phrase}"~3',
    ]
    for q in suite:
        want = engine.search(q, k=25)
        got = engine.search_distributed(q, k=25, num_shards=3)
        assert got == want, q


def test_pipeline_entry_shape(ray_session, sf_smoke):
    from terrier_ray.pipelines.fulltext import search_query_string

    tab = search_query_string(sf_smoke)
    assert tab.num_rows > 0
    assert tab.column_names == ["query_id", "query", "rank", "docid", "score"]
    # ranks start at 1 and are per-query contiguous
    import pyarrow.compute as pc

    assert pc.min(tab.column("rank")).as_py() == 1
    # the distributed serving entry returns the byte-identical table
    assert search_query_string(sf_smoke, distributed=True).equals(tab)


# ------------------------------------------------------------- proximity


def _naive_minimal_windows(tokens, terms, window):
    """Independent O(n^2) oracle for minimal-interval window counting:
    for each query-term position `a`, the SMALLEST covering interval
    starting at `a` is the only minimal candidate with that left
    endpoint; it is minimal iff dropping `a` breaks coverage."""
    terms = set(terms)
    pts = [(i, x) for i, x in enumerate(tokens) if x in terms]
    count = 0
    for a in range(len(pts)):
        seen = set()
        for b in range(a, len(pts)):
            seen.add(pts[b][1])
            if len(seen) == len(terms):
                drops_a = {t for _, t in pts[a + 1 : b + 1]} != terms
                if drops_a and pts[b][0] - pts[a][0] + 1 <= window:
                    count += 1
                break
    return count


def test_parse_proximity_slop():
    assert parse_query('"new york"~2') == [
        Clause("", None, "phrase", "new york", slop=2)
    ]
    # slop composes with occur/field/boost; ~0 is the exact phrase
    assert parse_query('+title:"a b"~3^2') == [
        Clause("+", "title", "phrase", "a b", boost=2.0, slop=3)
    ]
    assert parse_query('"a b"~0') == [Clause("", None, "phrase", "a b")]
    # bare ~ after a phrase and >4-digit slop are syntax errors, never
    # silent splits
    for bad in ('"a b"~', '"a b"~12345'):
        with pytest.raises(ValueError, match="whitespace-separated"):
            parse_query(bad)


def test_minimal_window_count_matches_naive_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from terrier_ray.index.querylang import _minimal_window_count

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(st.sampled_from("abcx"), min_size=1, max_size=30),
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=2, max_value=8),
    )
    def check(tokens, kterms, window):
        terms = ["a", "b", "c"][:kterms]
        arrs = [
            np.asarray(
                [i for i, x in enumerate(tokens) if x == t], dtype=np.int64
            )
            for t in terms
        ]
        got = _minimal_window_count(arrs, window)
        assert got == _naive_minimal_windows(tokens, terms, window)

    check()


def test_proximity_matches_vs_naive_window_scan(ray_session):
    """proximity_matches must agree EXACTLY — docids and minimal-window
    counts — with a naive scan of every doc's token stream."""
    from terrier_ray.datagen.webtext import webtext_for_sf
    from terrier_ray.index.oracle import OracleBM25
    from terrier_ray.pipelines.fulltext import proximity_matches
    from terrier_ray.text.tokenize import tokenize

    sf = "/root/testdata/sf0.001"
    slop = 2
    out = proximity_matches(sf, slop=slop)
    assert out.num_rows > 0
    phrases = dict(
        zip(out.column("phrase_id").to_pylist(), out.column("phrase").to_pylist())
    )
    got: dict[int, dict[int, int]] = {pid: {} for pid in phrases}
    for pid, d, n in zip(
        out.column("phrase_id").to_pylist(),
        out.column("docid").to_pylist(),
        out.column("n_occurrences").to_pylist(),
    ):
        got[pid][d] = n

    oracle = OracleBM25(webtext_for_sf(sf))
    for pid, p in phrases.items():
        terms = list(dict.fromkeys(tokenize(p)))
        window = len(terms) + slop
        want: dict[int, int] = {}
        for d, toks in oracle.doc_tokens.items():
            c = _naive_minimal_windows(toks, terms, window)
            if c:
                want[d] = c
        assert got[pid] == want, p
        assert want, f"mined phrase {p!r} must window-match its seed doc"


def test_exact_phrase_docs_subset_of_proximity(pos_index, webtext_small):
    """For a distinct-token phrase, every exact-phrase doc is a proximity
    doc at any slop >= 1 (span n <= n + slop; module contract)."""
    from terrier_ray.pipelines.fulltext import _mine_phrases
    from terrier_ray.text.tokenize import tokenize

    mined = _mine_phrases(pos_index, webtext_small, 4)
    checked = 0
    for p in mined:
        seq = tokenize(p)
        if len(set(seq)) != len(seq):
            continue  # repeated-token phrases are exempt from the contract
        exact, _ = _phrase_occurrences(pos_index, p)
        for slop in (1, 3):
            prox, counts = _phrase_occurrences(pos_index, p, slop=slop)
            assert set(exact.tolist()) <= set(prox.tolist()), (p, slop)
            assert (counts > 0).all()
        checked += 1
    assert checked  # the miner yields distinct-token phrases on this corpus


def test_proximity_pseudo_term_scoring(engine, pos_index, webtext_small):
    """A proximity clause scores as a pseudo-term: tf = minimal-window
    count, df = matching docs, through the pinned BM25 expression."""
    from terrier_ray.index.bm25 import B, K1
    from terrier_ray.pipelines.fulltext import _mine_phrases

    phrase = _mine_phrases(pos_index, webtext_small, 1)[0]
    docs, counts = _phrase_occurrences(pos_index, phrase, slop=2)
    assert len(docs)
    tf = counts.astype(np.float64)
    dl = pos_index.doc_len(docs).astype(np.float64)
    wd = tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / pos_index.avgdl))
    contrib = idf(pos_index.n_docs, len(docs)) * wd
    order = np.lexsort((docs, -contrib))[: min(10, len(docs))]
    want = [(int(docs[i]), float(contrib[i])) for i in order]
    assert engine.search(f'"{phrase}"~2', k=10) == want


# -------------------------------------------------------------- explain


def test_explain_is_stats_only(
    engine, pos_index, webtext_small, qterms, monkeypatch
):
    """explain() must describe the plan WITHOUT decoding postings or
    positions (its documented stats-only contract) — spy-asserted by
    making both decode paths raise."""
    from terrier_ray.index.bm25 import BM25Index
    from terrier_ray.pipelines.fulltext import _mine_phrases

    phrase = _mine_phrases(pos_index, webtext_small, 1)[0]
    a = qterms[0]

    def boom(*args, **kwargs):
        raise AssertionError("explain decoded postings/positions")

    monkeypatch.setattr(BM25Index, "lookup", boom)
    monkeypatch.setattr(BM25Index, "positions_for", boom)
    txt = engine.explain(
        f'+{a} -{a[:2]}* "{phrase}"~2 title:{a}^2', num_shards=3
    )
    assert "MUST " in txt and "MUST_NOT" in txt
    assert "PROXIMITY" in txt and "slop=2" in txt
    assert "candidate_df<=" in txt
    assert "PREFIX" in txt and "expansions=" in txt
    assert "3 docid ranges" in txt and "2 rounds" in txt
    # phrase-free plans are single-round
    assert "1 round" in engine.explain(f"{a} title:{a}", num_shards=2)


def test_search_explain_entry_shape(ray_session, sf_smoke):
    from terrier_ray.pipelines.fulltext import search_explain

    tab = search_explain(sf_smoke)
    assert tab.column_names == ["query_id", "step", "plan"]
    assert tab.num_rows > 0
    text = "\n".join(tab.column("plan").to_pylist())
    assert "QueryString" in text and "distributed:" in text


# ----------------------------------------------------- attribute filters


def test_filter_lang_local_identical_to_post_filter(
    engine, pos_index, qterms
):
    """search(filter_lang=) == post-filtering the unfiltered result by
    each doc's sidecar lang, for MUST/NOT/boost constructs."""
    a, b = qterms[0], qterms[1]
    assert pos_index.docvalue_dict  # sidecar present, never vacuous
    checked = 0
    for q in (f"{a} {b}", f"+{a} {b}", f"{a}^2 -{b}"):
        full = engine.search(q, k=10**9)
        for lang in pos_index.docvalue_dict[:3]:
            ids = np.asarray([d for d, _ in full], dtype=np.int64)
            if not len(ids):
                continue
            langs = pos_index.docvalues_of(ids)
            want = [
                (d, s) for (d, s), l in zip(full, langs) if l == lang
            ][:10]
            assert engine.search(q, k=10, filter_lang=lang) == want, (q, lang)
            checked += bool(want)
        assert engine.search(q, k=10, filter_lang="zz-absent") == []
    assert checked  # at least one non-empty filtered ranking was compared


def test_filter_lang_distributed_identical(
    ray_session, engine, pos_index, webtext_small, qterms
):
    from terrier_ray.pipelines.fulltext import _mine_phrases

    a, b = qterms[0], qterms[1]
    phrase = _mine_phrases(pos_index, webtext_small, 1)[0]
    lang = pos_index.docvalue_dict[0]
    for q in (f"{a} {b}", f'+"{phrase}" {a}', f"title:{a} {b}"):
        want = engine.search(q, k=25, filter_lang=lang)
        got = engine.search_distributed(
            q, k=25, num_shards=3, filter_lang=lang
        )
        assert got == want, q
    # absent dictionary value: empty without a shard fan-out
    assert (
        engine.search_distributed(f"{a}", k=5, filter_lang="zz-absent") == []
    )


def test_filter_lang_requires_docvalues(title_index_ql):
    eng = QueryStringEngine(title_index_ql, default_field="title")
    with pytest.raises(ValueError, match="docvalues"):
        eng.search("title:ray", filter_lang="en")


def test_search_after_pagination_reconstructs_ranking(pos_index, qterms):
    """Concatenated searchAfter pages == the full ranking, with and
    without the lang filter; the cursor is a strict total-order cut."""
    q = f"{qterms[0]} {qterms[1]}"
    for lang in (None, pos_index.docvalue_dict[0]):
        if lang is None:
            full = pos_index.search(q, k=10**9)
        else:
            full = pos_index.search_filtered(q, k=10**9, lang=lang)
        pages, cursor = [], None
        while True:
            page = pos_index.search_after(q, k=7, after=cursor, lang=lang)
            if not page:
                break
            pages.extend(page)
            cursor = page[-1]
        assert pages == full, lang
    # page one == plain search
    assert pos_index.search_after(q, k=10) == pos_index.search(q, k=10)
