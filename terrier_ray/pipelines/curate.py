"""End-to-end training-data curation: the composed pipeline a 100 TB text
corpus actually runs — language filter → quality filter → exact dedup →
near-dup removal → curated parquet + funnel accounting.

Every stage is one of the engine's existing operators wired together:
annotate (stateless vectorized map) → filter (pc masks) → bucket-shuffled
grouped-min + co-partitioned semi join (exact dedup at any scale — the
winner table is never collected) → MinHash-LSH pair list (rare by
construction) → broadcast anti-filter.  The output is written as
partitioned parquet; the returned one-row table is the drop-nothing funnel
account (brief: log what was dropped, never silently truncate).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from terrier_ray.ops.relational import (
    filter_batches,
    grouped_aggregate,
    partitioned_join,
    read_table,
)
from terrier_ray.pipelines.dedup import _text_hash, minhash_lsh_pairs
from terrier_ray.text.analysis import LangId, QualityScorer


def curate_documents(
    sf_dir: str,
    out_dir: str | None = None,
    min_quality: float = 0.2,
    min_words: int = 10,
    keep_lang: str = "en",
    distributed_labels: bool = False,
    decontaminate_width: int | None = None,
    redact: bool = False,
):
    """See module docstring.  ``distributed_labels=True`` switches the
    near-dup stage to the zero-driver-table path: LSH pairs →
    ``connected_components(..., collect=False)`` (labels stay a Dataset) →
    keep each cluster's min-doc_id representative via two co-partitioned
    joins (anti vs labels for non-dup docs, semi vs the grouped-min winners
    for representatives) — no LABEL, WINNER, or DROP table ever
    concatenates on the driver, at any duplication rate.  (The LSH pair
    list itself is still a driver-resident table feeding ``rd.from_arrow``
    — pairs are rare by construction under banding, but they remain the
    one driver-memory bound of this path.)  Keep semantics
    differ deliberately from the default pairwise rule (drop every pair's
    larger id): each cluster keeps exactly ONE representative — the
    minimum doc_id among the cluster's members that SURVIVED the upstream
    lang/quality/exact gates (labels are computed corpus-wide, so the
    winner choice is restricted to survivors; otherwise a cluster whose
    corpus-wide minimum was quality-filtered would keep zero docs)."""
    # the language gate combines the upstream metadata (`lang` column, the
    # crawl's claim) with the n-gram LangId prediction: keep rows where
    # either agrees with the target — the synthetic corpus has gibberish
    # vocabulary, so the heuristic model alone predicts "unk" (documented
    # stand-in; a real fasttext-style model slots into the same stage)
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    n_in = docs.count()

    scorer = QualityScorer()
    langid = LangId()

    def annotate(batch: pa.Table) -> pa.Table:
        # stage outputs are row-aligned with the input batch
        q = scorer(batch)
        l = langid(batch)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": batch.column("text"),
                "lang": batch.column("lang"),
                "quality": q.column("quality"),
                "n_words": q.column("n_words"),
                "lang_pred": l.column("lang_pred"),
            }
        )

    ann = docs.map_batches(annotate, batch_format="pyarrow", zero_copy_batch=True)
    lang_ok = filter_batches(
        ann,
        lambda b: pc.or_(
            pc.equal(b.column("lang"), keep_lang),
            pc.equal(b.column("lang_pred"), keep_lang),
        ),
    ).materialize()
    n_lang = lang_ok.count()
    qual_ok = filter_batches(
        lang_ok,
        lambda b: pc.and_(
            pc.greater_equal(b.column("quality"), min_quality),
            pc.greater_equal(b.column("n_words"), min_words),
        ),
    ).materialize()
    n_qual = qual_ok.count()

    # optional benchmark decontamination (hygiene.decontaminate_filter:
    # benchmark n-gram hashes broadcast once, per-batch np.isin) — runs on
    # the ORIGINAL text, before any rewriting
    if decontaminate_width is not None:
        from terrier_ray.pipelines.hygiene import decontaminate_filter

        qual_ok = decontaminate_filter(
            qual_ok, sf_dir, width=decontaminate_width
        ).materialize()
    n_decon = qual_ok.count()

    # optional PII redaction (hygiene.redact_batch: chained RE2 passes) —
    # rewrites text IN the funnel, so dedup hashes the shipped form
    n_redactions = 0
    if redact:
        from terrier_ray.pipelines.hygiene import redact_batch

        def apply_redact(batch: pa.Table) -> pa.Table:
            red, counts = redact_batch(batch.column("text"))
            total = np.zeros(len(batch), dtype=np.int64)
            for c in counts.values():
                total += c.to_numpy(zero_copy_only=False)
            return batch.set_column(
                batch.column_names.index("text"), "text", red
            ).append_column("__nred", pa.array(total))

        qual_ok = qual_ok.map_batches(
            apply_redact, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        n_redactions = int(qual_ok.sum("__nred") or 0)
        qual_ok = qual_ok.drop_columns(["__nred"])

    # exact dedup, fully distributed: min doc_id per content hash, then a
    # co-partitioned semi join keeps only the winners (the winner table is
    # itself a dataset — nothing is collected)
    def add_hash(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__h", pa.array(_text_hash(batch.column("text").to_pylist()))
        )

    hashed = qual_ok.map_batches(
        add_hash, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    winners = grouped_aggregate(hashed, ["__h"], [("min", "doc_id", "keep_id")])
    exact = partitioned_join(
        hashed,
        winners,
        on=["__h", "doc_id"],
        right_on=["__h", "keep_id"],
        join_type="left_semi",
        num_partitions=8,
    ).materialize()
    n_exact = exact.count()

    # near-dup removal: LSH pair list over the corpus (rare by construction)
    pairs = minhash_lsh_pairs(sf_dir)
    if distributed_labels and pairs.num_rows == 0:
        # no pairs → nothing to drop; skip the graph machinery (an empty
        # edge Dataset would hit the zero-row schema-less groupby limit)
        near = exact
    elif distributed_labels:
        import ray.data as rd

        from terrier_ray.ops.graph import connected_components
        from terrier_ray.ops.relational import union_all

        edges = rd.from_arrow(
            pa.table(
                {
                    "src": pc.cast(pairs.column("doc_a"), pa.int64()),
                    "dst": pc.cast(pairs.column("doc_b"), pa.int64()),
                }
            )
        )
        # labels stay a Dataset end-to-end (collect=False); winners too
        labels = connected_components(edges, collect=False)
        # restrict the winner choice to nodes that SURVIVED the upstream
        # gates — labels are corpus-wide, and a cluster whose corpus-wide
        # min was filtered must still keep its smallest surviving member
        surv_ids = exact.map_batches(
            lambda b: b.select(["doc_id"]), batch_format="pyarrow"
        )
        labels_surv = partitioned_join(
            labels,
            surv_ids,
            on=["node"],
            right_on=["doc_id"],
            join_type="left_semi",
            num_partitions=8,
        ).materialize()
        if labels_surv.count() == 0:
            # every clustered doc was already gate-filtered — nothing to
            # drop (and a zero-row groupby would come back schema-less)
            near = exact
        else:
            winners = grouped_aggregate(
                labels_surv, ["label"], [("min", "node", "keep_id")]
            )
            # keep = docs in no surviving cluster ∪ each cluster's
            # surviving representative; co-partitioned joins, no null
            # keys, driver-free
            non_dup = partitioned_join(
                exact,
                labels_surv,
                on=["doc_id"],
                right_on=["node"],
                join_type="left_anti",
                num_partitions=8,
            )
            reps = partitioned_join(
                exact,
                winners.map_batches(
                    lambda b: b.select(["keep_id"]), batch_format="pyarrow"
                ),
                on=["doc_id"],
                right_on=["keep_id"],
                join_type="left_semi",
                num_partitions=8,
            )
            near = union_all(non_dup, reps).materialize()
    else:
        # default: drop the larger doc_id of each surviving pair (driver-side
        # drop set, bounded by the pair list's rare-by-construction size)
        drop = np.unique(pairs.column("doc_b").to_numpy(zero_copy_only=False))
        near = filter_batches(
            exact,
            lambda b: pc.invert(
                pc.is_in(b.column("doc_id"), value_set=pa.array(drop))
            ),
        ).materialize()
    n_out = near.count()

    if out_dir is not None:
        near.drop_columns(["__h"]).write_parquet(out_dir)

    return pa.table(
        {
            "n_in": pa.array([n_in], type=pa.int64()),
            "n_lang_ok": pa.array([n_lang], type=pa.int64()),
            "n_quality_ok": pa.array([n_qual], type=pa.int64()),
            "n_decontaminated": pa.array([n_decon], type=pa.int64()),
            "n_redactions": pa.array([n_redactions], type=pa.int64()),
            "n_exact_unique": pa.array([n_exact], type=pa.int64()),
            "n_curated": pa.array([n_out], type=pa.int64()),
        }
    )


QUERIES = {
    "curate_documents": curate_documents,
    "curate_documents_distributed": (
        lambda sf_dir: curate_documents(sf_dir, distributed_labels=True)
    ),
    # the full real-world funnel: lang → quality → benchmark
    # decontamination → PII redaction → exact dedup → near-dup removal,
    # with zero driver-resident label/winner tables
    "curate_documents_full": (
        lambda sf_dir: curate_documents(
            sf_dir,
            distributed_labels=True,
            decontaminate_width=8,
            redact=True,
        )
    ),
}
