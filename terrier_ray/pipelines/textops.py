"""Text-analysis query entry points over the ``documents`` table."""

from __future__ import annotations

from terrier_ray.ops.relational import grouped_aggregate, read_table, round_columns
from terrier_ray.text.analysis import (
    LangId,
    QualityScorer,
    fingerprint_batch,
    token_count_batch,
)


def token_counts(sf_dir: str):
    """Whitespace token counts (Arrow kernels; matches the regexp SQL oracle)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(token_count_batch, batch_format="pyarrow", zero_copy_batch=True)


def quality_scores(sf_dir: str):
    """Quality heuristics via actor pool (stopword set built per actor)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(
        QualityScorer, batch_format="pyarrow", batch_size=256, concurrency=2
    )


def lang_id(sf_dir: str):
    """Heuristic n-gram language ID per document (actor pool)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(
        LangId, batch_format="pyarrow", batch_size=256, concurrency=2
    )


def fingerprints(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True)


def docs_by_lang(sf_dir: str):
    """Grouped corpus stats by language (SQL-oracled)."""
    docs = read_table(sf_dir, "documents", columns=["lang", "n_chars"])
    out = grouped_aggregate(
        docs,
        ["lang"],
        [("count", "n_chars", "n_docs"), ("sum", "n_chars", "total_chars"),
         ("mean", "n_chars", "avg_chars")],
    )
    return round_columns(out, {"avg_chars": 4})


SQL = {
    "token_counts": r"""
        SELECT doc_id,
               LENGTH(regexp_split_to_array(TRIM(text), '\s+')) AS n_tokens
        FROM documents
        WHERE LENGTH(TRIM(text)) > 0
    """,
    "docs_by_lang": """
        SELECT lang, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars,
               ROUND(AVG(n_chars), 4) AS avg_chars
        FROM documents GROUP BY lang
    """,
}
