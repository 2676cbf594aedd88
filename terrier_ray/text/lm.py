"""Character-trigram language-model quality scoring (the CCNet/KenLM-style
perplexity filter, reduced to a dependency-free trigram LM).

Shape at scale: the model is TRAINED ONCE on a deterministic hash-sample
of the corpus (driver-side — the model is a fixed 27³ float array, ~150 KB,
regardless of corpus size), broadcast via ``ray.put``, and applied as a
stateless vectorized ``map_batches`` stage: each batch maps chars → codes,
forms trigram ids with shifted adds, gathers log-probs, and segment-sums
per document with ``np.add.reduceat`` — no Python row loop.

The alphabet is lowercase a–z plus a catch-all (space/digit/punct all fold
to code 26), so the model is a dense array — no hash map, no vocabulary
drift between train and score.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_A = 27  # a-z + catch-all
_V = _A * _A * _A


def _codes(text: str) -> np.ndarray:
    """Map to [0, 27): a-z → 0-25, everything else → 26."""
    b = np.frombuffer(text.lower().encode("utf-8", "replace"), dtype=np.uint8)
    c = np.full(len(b), 26, dtype=np.int32)
    alpha = (b >= 97) & (b <= 122)
    c[alpha] = b[alpha] - 97
    return c


def _batch_trigram_ids(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """All texts' trigram ids concatenated + per-text trigram counts.
    A text shorter than 3 chars contributes zero trigrams."""
    codes = [_codes(t) for t in texts]
    n_tri = np.array([max(len(c) - 2, 0) for c in codes], dtype=np.int64)
    if n_tri.sum() == 0:
        return np.empty(0, dtype=np.int64), n_tri
    parts = []
    for c in codes:
        if len(c) >= 3:
            parts.append(
                c[:-2].astype(np.int64) * (_A * _A)
                + c[1:-1].astype(np.int64) * _A
                + c[2:].astype(np.int64)
            )
    return np.concatenate(parts), n_tri


def train_trigram_lm(texts: list[str], add_k: float = 0.5) -> np.ndarray:
    """Dense log-prob array over trigram ids (add-k smoothed unigram-of-
    trigrams model — enough signal to rank fluent text above gibberish
    without any external data)."""
    ids, _ = _batch_trigram_ids(texts)
    counts = np.bincount(ids, minlength=_V).astype(np.float64)
    probs = (counts + add_k) / (counts.sum() + add_k * _V)
    return np.log(probs)


def score_batch(logp: np.ndarray, batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc mean trigram log-prob (higher = more model-like) and a
    perplexity-style ``ppl = exp(-mean)``.  Docs with no trigrams score
    the model's floor (min log-prob)."""
    texts = batch.column(text_col).to_pylist()
    ids, n_tri = _batch_trigram_ids(texts)
    lp = logp[ids] if len(ids) else np.empty(0, dtype=np.float64)
    starts = np.concatenate(([0], np.cumsum(n_tri)))[:-1]
    mean = np.full(len(texts), float(logp.min()), dtype=np.float64)
    nz = n_tri > 0
    if nz.any():
        sums = np.add.reduceat(lp, starts[nz]) if len(lp) else np.empty(0)
        mean[nz] = sums / n_tri[nz]
    return pa.table(
        {
            "lm_logprob": pa.array(mean),
            "lm_ppl": pa.array(np.exp(-mean)),
        }
    )


def lm_quality(ds, text_col: str = "text", sample_permil: int = 50, keep_cols=("doc_id",)):
    """End-to-end: deterministic hash-sample → train (driver, fixed-size
    model) → broadcast → vectorized scoring stage.  Returns keep_cols +
    (lm_logprob, lm_ppl) per row."""
    import ray

    from terrier_ray.ops.sample import bernoulli_sample

    # ds is consumed TWICE (training-sample drain, then the scoring stage)
    # — materialize so the upstream lineage (read/extract/filter) runs once
    # (CLAUDE.md dup-stream rule; build_corpus precedent)
    ds = ds.materialize()
    # the training sample keys on the first keep col (the table's id)
    sample = bernoulli_sample(ds, keep_cols[0], sample_permil)
    sample_texts: list[str] = []
    for b in sample.iter_batches(batch_size=None, batch_format="pyarrow"):
        sample_texts.extend(b.column(text_col).to_pylist())
    logp_ref = ray.put(train_trigram_lm(sample_texts))

    def score(batch: pa.Table) -> pa.Table:
        logp: np.ndarray = ray.get(logp_ref)
        out = score_batch(logp, batch, text_col)
        cols = {c: batch.column(c) for c in keep_cols}
        cols.update({n: out.column(n) for n in out.column_names})
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
