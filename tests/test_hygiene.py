"""Corpus-hygiene op semantics: decontamination, redaction, repetition."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from terrier_ray.pipelines.hygiene import (
    _PROBE_MOD,
    PII_PATTERNS,
    decontaminate,
    decontaminate_ngram,
    redact_batch,
    repetition_stats,
    top_bigrams,
)


def test_redact_batch_pii_strings():
    col = pa.array(
        [
            "contact me at jane.doe+spam@example.co.uk please",
            "server 192.168.1.254 responded; call 415-555-0142 now",
            "order 1234567 shipped to 10.0.0.1 and a@b.io",
            "nothing sensitive here",
        ]
    )
    red, counts = redact_batch(col)
    out = red.to_pylist()
    assert out[0] == "contact me at <EMAIL> please"
    assert out[1] == "server <IP> responded; call <NUM> now"
    assert out[2] == "order <NUM> shipped to <IP> and <EMAIL>"
    assert out[3] == "nothing sensitive here"
    assert counts["n_emails"].to_pylist() == [1, 0, 1, 0]
    assert counts["n_ips"].to_pylist() == [0, 1, 1, 0]
    # counts are per-pattern on the ORIGINAL string: the IP's octets in
    # row 1 are digit runs too (1 phone-run + nothing else ≥ pattern).
    assert counts["n_nums"].to_pylist()[3] == 0
    assert counts["n_nums"].to_pylist()[0] == 0


def test_redact_batch_count_on_original_not_running_string():
    # The IP is replaced before the NUM pass, but n_nums still counts the
    # octets because counts are taken on the original column.
    col = pa.array(["ip 1.2.3.4 end"])
    red, counts = redact_batch(col)
    assert red.to_pylist() == ["ip <IP> end"]
    assert counts["n_ips"].to_pylist() == [1]
    assert counts["n_nums"].to_pylist() == [4]


def _naive_ngrams(text: str, width: int) -> set[tuple[str, ...]]:
    toks = text.lower().split()
    w = min(width, len(toks))
    if not toks:
        return set()
    return {tuple(toks[i : i + w]) for i in range(len(toks) - w + 1)}


def test_decontaminate_ngram_matches_naive_oracle(ray_session, sf_smoke):
    width = 8
    got = (
        decontaminate_ngram(sf_smoke, width=width)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    tab = pq.read_table(
        f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"]
    )
    ids = tab.column("doc_id").to_pylist()
    texts = tab.column("text").to_pylist()
    bench: set[tuple[str, ...]] = set()
    for did, t in zip(ids, texts):
        if did % _PROBE_MOD == 0:
            bench |= _naive_ngrams(t, width)
    exp = {}
    for did, t in zip(ids, texts):
        n = len(_naive_ngrams(t, width) & bench)
        if n:
            exp[did] = n
    assert dict(zip(got["doc_id"], got["n_contaminated_ngrams"])) == exp
    assert len(exp) > 0  # benchmark docs hit themselves


def test_decontaminate_substring_flags_planted_copy(ray_session, sf_smoke):
    got = decontaminate(sf_smoke).to_pandas()
    # every benchmark doc contains its own probe prefix
    tab = pq.read_table(f"{sf_smoke}/documents.parquet", columns=["doc_id"])
    bench_ids = [d for d in tab.column("doc_id").to_pylist() if d % _PROBE_MOD == 0]
    assert set(bench_ids) <= set(got["doc_id"])
    assert (got["n_probes_hit"] >= 1).all()


def test_repetition_stats_matches_counter(ray_session, sf_smoke):
    got = (
        repetition_stats(sf_smoke)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    tab = pq.read_table(
        f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"]
    )
    from collections import Counter

    for row, t in zip(got.itertuples(), tab.column("text").to_pylist()[:50]):
        c = Counter(t.split(" "))
        assert row.n_words == sum(c.values())
        assert row.n_distinct_words == len(c)
        assert row.top_word_count == max(c.values())


def test_top_bigrams_matches_naive(ray_session, sf_smoke):
    got = top_bigrams(sf_smoke, k=10).to_pandas()
    from collections import Counter

    tab = pq.read_table(f"{sf_smoke}/documents.parquet", columns=["text"])
    c: Counter = Counter()
    for t in tab.column("text").to_pylist():
        w = t.split(" ")
        c.update(" ".join(p) for p in zip(w[:-1], w[1:]))
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["bigram"], got["n"])) == exp


def test_pii_patterns_are_ordered_email_ip_num():
    assert [p[0] for p in PII_PATTERNS] == ["n_emails", "n_ips", "n_nums"]


def test_curate_full_funnel_decontaminates_and_redacts(ray_session, tmp_root, sf_smoke):
    import glob
    import os

    import pyarrow.parquet as pq

    from terrier_ray.pipelines.curate import curate_documents

    out_dir = os.path.join(str(tmp_root), "curated_full")
    t = curate_documents(
        sf_smoke,
        out_dir=out_dir,
        distributed_labels=True,
        decontaminate_width=8,
        redact=True,
    )
    row = {c: t.column(c)[0].as_py() for c in t.column_names}
    assert (
        row["n_in"]
        >= row["n_lang_ok"]
        >= row["n_quality_ok"]
        >= row["n_decontaminated"]
        >= row["n_exact_unique"]
        >= row["n_curated"]
        > 0
    )
    # benchmark docs self-hit their own n-grams → none survive curation
    files = glob.glob(os.path.join(out_dir, "*.parquet"))
    ids = pa.concat_tables(
        pq.read_table(f, columns=["doc_id"]) for f in files
    ).column("doc_id").to_pylist()
    assert len(ids) == row["n_curated"]
    assert all(d % 97 != 0 for d in ids)
    # the synthetic corpus has no PII; the stage still ran and counted
    assert row["n_redactions"] == 0
    # decontamination actually dropped something (the surviving benchmark docs)
    assert row["n_decontaminated"] < row["n_quality_ok"]


def test_curate_default_funnel_reports_passthrough_stages(ray_session, sf_smoke):
    from terrier_ray.pipelines.curate import curate_documents

    t = curate_documents(sf_smoke)
    row = {c: t.column(c)[0].as_py() for c in t.column_names}
    assert row["n_decontaminated"] == row["n_quality_ok"]
    assert row["n_redactions"] == 0


def test_chunk_documents_reassembles_and_overlaps(ray_session, sf_smoke):
    from terrier_ray.pipelines.hygiene import chunk_documents

    window, stride = 200, 150
    got = (
        chunk_documents(sf_smoke, window=window, stride=stride)
        .to_pandas()
        .sort_values(["doc_id", "chunk_no"])
    )
    texts = dict(
        zip(
            *[
                pq.read_table(
                    f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"]
                ).column(c).to_pylist()
                for c in ("doc_id", "text")
            ]
        )
    )
    assert set(got["doc_id"]) == set(texts)  # every doc chunked (≥1 chunk)
    for did, grp in got.groupby("doc_id"):
        t = texts[did]
        chunks = grp["chunk"].tolist()
        assert all(len(c) <= window for c in chunks)
        # exact placement: chunk i == text[i*stride : i*stride+window]
        for i, c in enumerate(chunks):
            assert c == t[i * stride : i * stride + window]
        # coverage: the last chunk reaches the end of the doc
        assert (len(chunks) - 1) * stride + len(chunks[-1]) >= len(t)


def test_trigram_lm_ranks_fluent_above_gibberish():
    import numpy as np

    from terrier_ray.text.lm import score_batch, train_trigram_lm

    train = [
        "the quick brown fox jumps over the lazy dog and then runs home",
        "a sentence with common english letter patterns in the words",
    ] * 20
    logp = train_trigram_lm(train)
    probe = pa.table(
        {
            "text": [
                "the brown fox runs over the common patterns",
                "xqzj vkwq zzxj qqvv kjxz wqzv jjqx zvkw",
                "",
            ]
        }
    )
    out = score_batch(logp, probe)
    lps = out.column("lm_logprob").to_pylist()
    assert lps[0] > lps[1]  # fluent beats gibberish
    assert lps[2] == float(np.min(logp))  # no-trigram doc scores the floor
    assert out.column("lm_ppl").to_pylist()[0] < out.column("lm_ppl").to_pylist()[1]


def test_trigram_lm_score_matches_naive():
    import math

    from terrier_ray.text.lm import _codes, score_batch, train_trigram_lm

    train = ["abcabcabd", "the cat sat"] * 5
    logp = train_trigram_lm(train)
    text = "abc the cat"
    out = score_batch(logp, pa.table({"text": [text]}))
    c = _codes(text)
    tri = [int(c[i]) * 729 + int(c[i + 1]) * 27 + int(c[i + 2]) for i in range(len(c) - 2)]
    naive = sum(float(logp[t]) for t in tri) / len(tri)
    assert math.isclose(out.column("lm_logprob")[0].as_py(), naive, rel_tol=1e-12)


def test_lm_quality_pipeline(ray_session, sf_smoke):
    from terrier_ray.pipelines.textops import lm_quality_scores

    got = lm_quality_scores(sf_smoke).to_pandas()
    assert len(got) == 500
    assert got["doc_id"].is_unique
    assert (got["lm_ppl"] > 0).all()
    # corpus docs share the corpus distribution → far from the smoothing floor
    assert got["lm_logprob"].median() > -9.0


def test_segment_dedup_matches_naive_keep_first(ray_session, sf_smoke):
    """segment_dedup == a pure-python keep-first reimplementation: split each
    doc into non-overlapping width-word segments, keep the globally-first
    occurrence of each full-width segment (min (doc_id, seg_no)), always keep
    ragged tails, rebuild docs from kept segments in order."""
    import pyarrow.parquet as pq

    from terrier_ray.pipelines.dedup import segment_dedup

    width = 5
    src = pq.read_table(f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"])
    rows = sorted(
        zip(src.column("doc_id").to_pylist(), src.column("text").to_pylist())
    )

    first: dict[str, tuple[int, int]] = {}
    segments: dict[int, list[tuple[int, str, bool]]] = {}
    for doc_id, text in rows:
        words = text.split(" ")
        segs = []
        for seg_no, i in enumerate(range(0, len(words), width)):
            chunk = words[i : i + width]
            seg = " ".join(chunk)
            full = len(chunk) == width
            segs.append((seg_no, seg, full))
            if full and seg not in first:
                first[seg] = (doc_id, seg_no)
        segments[doc_id] = segs
    expected = {}
    for doc_id, segs in segments.items():
        kept = [
            seg
            for seg_no, seg, full in segs
            if not full or first[seg] == (doc_id, seg_no)
        ]
        if kept:
            expected[doc_id] = (" ".join(kept), len(kept))

    got = segment_dedup(sf_smoke, width=width).to_pandas()
    assert len(got) == len(expected)
    removed_any = False
    for _, r in got.iterrows():
        exp_text, exp_n = expected[r["doc_id"]]
        assert r["text"] == exp_text
        assert r["n_segments_kept"] == exp_n
        if exp_text != dict(rows)[r["doc_id"]]:
            removed_any = True
    assert removed_any, "testdata should exercise actual span removal"
