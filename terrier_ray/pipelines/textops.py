"""Text-analysis query entry points over the ``documents`` table."""

from __future__ import annotations

from terrier_ray.ops.relational import grouped_aggregate, read_table
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


def bpe_token_counts(sf_dir: str):
    """BPE-ish token counts (words | numbers | punct runs) via Arrow regex."""
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def count(batch):
        n = pc.cast(
            pc.count_substring_regex(
                batch.column("text"), r"[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]+"
            ),
            pa.int64(),
        )
        return pa.table({"doc_id": batch.column("doc_id"), "n_bpe_tokens": n})

    return docs.map_batches(count, batch_format="pyarrow", zero_copy_batch=True)


def json_extract_props(sf_dir: str):
    """Semi-structured extraction: pull the integer k out of the JSON props
    column (vectorized regex; the oracle uses DuckDB's json_extract)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ev = read_table(sf_dir, "events", columns=["event_id", "props"])

    def extract(batch):
        m = pc.extract_regex(batch.column("props"), r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_id": batch.column("event_id"), "k": k})

    return ev.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True)


def docs_by_lang(sf_dir: str):
    """Grouped corpus stats by language (SQL-oracled)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from terrier_ray.ops.relational import rescale_round

    docs = read_table(sf_dir, "documents", columns=["lang", "n_chars"])
    out = grouped_aggregate(
        docs,
        ["lang"],
        [("count", "n_chars", "n_docs"), ("sum", "n_chars", "total_chars"),
         ("mean", "n_chars", "avg_chars")],
    )

    def fin(b: pa.Table) -> pa.Table:
        return b.set_column(
            b.column_names.index("avg_chars"),
            "avg_chars",
            rescale_round(b.column("avg_chars"), 4),
        )

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


SQL = {
    "token_counts": r"""
        SELECT doc_id,
               LENGTH(regexp_split_to_array(TRIM(text), '\s+')) AS n_tokens
        FROM documents
        WHERE LENGTH(TRIM(text)) > 0
    """,
    "docs_by_lang": """
        SELECT lang, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars,
               CAST(ROUND(AVG(n_chars) * 10000, 0) AS BIGINT) / 10000.0 AS avg_chars
        FROM documents GROUP BY lang
    """,
    "bpe_token_counts": r"""
        SELECT doc_id,
               LENGTH(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]+'))
                   AS n_bpe_tokens
        FROM documents
    """,
    "json_extract_props": """
        SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        FROM events
    """,
}
