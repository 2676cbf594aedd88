"""Canonical tokenization — ONE definition shared by engine and oracles.

Rule: lowercase the text, then tokens are maximal runs of ``[a-z0-9]`` (ASCII
letters/digits; everything else is a separator).  Deterministic and cheap;
matches the classic English IR tokenizer shape.

``Tokenizer`` is the corpus stage: per doc it counts term frequencies
(vectorized ``np.unique`` over the doc's token array) and emits
``(docid, warc_ts, dl, terms:list<string>, tfs:list<int32>)`` — the
tokenized-corpus representation the index build explodes into postings.
Reference analog: per-thread build state in CREATE INDEX
(/root/reference/src/execution/compiler/operator/index_create_translator.cpp:57-135).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from terrier_ray.datagen.webtext import url_doc_id

TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize(text: str) -> list[str]:
    """The canonical tokenizer (used verbatim by the BM25 oracle)."""
    return TOKEN_RE.findall(text.lower())


class Tokenizer:
    """Actor-pool map_batches stage: (url, warc_ts, text) → tokenized docs.

    Emits one row per input doc: docid (hash of url), warc_ts, dl (token
    count), terms (sorted unique tokens), tfs (per-term counts).  Docs with
    zero tokens are kept (dl=0, empty lists) so dedup/statistics see them.
    """

    def __init__(self) -> None:
        self._re = TOKEN_RE  # compiled once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url")
        texts = batch.column("text").to_pylist()
        findall = self._re.findall
        # one flat token stream + per-doc counts (regex per doc, counting
        # vectorized: Arrow dictionary-encode + one int64 np.unique per batch)
        tokens: list[str] = []
        dls = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = findall(t.lower()) if t else []
            dls[i] = len(toks)
            tokens.extend(toks)
        if tokens:
            dic = pa.array(tokens, type=pa.string()).dictionary_encode()
            codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            vocab = dic.dictionary
            doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), dls)
            # (doc, term) pair counting in one sorted pass over int64 keys
            keys = doc_idx * np.int64(len(vocab)) + codes
            uniq_keys, tfs = np.unique(keys, return_counts=True)
            u_doc = uniq_keys // len(vocab)
            u_code = (uniq_keys % len(vocab)).astype(np.int32)
            per_doc = np.bincount(u_doc, minlength=len(texts))
            offsets = np.concatenate(([0], np.cumsum(per_doc))).astype(np.int32)
            flat_terms = pa.DictionaryArray.from_arrays(
                pa.array(u_code), vocab
            ).cast(pa.string())
            terms_col = pa.ListArray.from_arrays(pa.array(offsets), flat_terms)
            tfs_col = pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(tfs.astype(np.int32))
            )
        else:
            offsets = np.zeros(len(texts) + 1, dtype=np.int32)
            terms_col = pa.ListArray.from_arrays(
                pa.array(offsets), pa.array([], type=pa.string())
            )
            tfs_col = pa.ListArray.from_arrays(
                pa.array(offsets), pa.array([], type=pa.int32())
            )
        doc_ids = url_doc_id(urls)
        return pa.table(
            {
                "docid": pa.array(doc_ids.astype(np.int64)),
                "warc_ts": batch.column("warc_ts"),
                "dl": pa.array(dls.astype(np.int32)),
                "terms": terms_col,
                "tfs": tfs_col,
            }
        )
