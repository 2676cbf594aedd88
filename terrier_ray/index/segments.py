"""Segment lifecycle helpers for the incremental-index path.

- ``add_segment``: ingest a new webtext batch as a DELTA index next to the
  existing segments (one ``build_index`` over only the new docs — the
  incremental-update answer; no monolithic rebuild).
- ``compact_segments``: merge N segments back into one index by building
  over the union corpus (run when query-time fan-out across segments starts
  to hurt — the Lucene-style merge policy, applied batch-wise).

Reference analog: the reference maintains indexes transactionally on every
INSERT (insert_translator.cpp maintains all indexes via StorageInterface);
an immutable-batch engine gets the same effect with delta segments +
periodic compaction.
"""

from __future__ import annotations

import glob
import os

from terrier_ray.index.build import build_index


def add_segment(segments_root: str, webtext_path: str, **build_kwargs) -> str:
    """Build a delta index for ``webtext_path`` under ``segments_root``;
    returns the new segment dir.  Resumable like any build (epoch
    manifests); idempotent per input fingerprint."""
    name = f"seg-{os.path.basename(webtext_path.rstrip('/'))}"
    seg_dir = os.path.join(segments_root, name)
    build_index(webtext_path, seg_dir, **build_kwargs)
    return seg_dir


def delta_part_files(
    snapshot_root: str, from_version: int, to_version: "int | None" = None
) -> "list[str]":
    """Part files APPENDED between two snapshot versions.

    ``state.snapshots.append_rows`` hardlinks the previous version's parts
    and adds new ones, so the delta is exactly the basenames present in
    v<to> but not v<from> (from_version=0 → everything: the initial load).
    Only valid across INSERT-only history — an UPDATE/DELETE rewrite
    replaces every part, and the caller should compact instead."""
    from terrier_ray.state import snapshots

    if to_version is None:
        to_version = snapshots.current_version(snapshot_root)
    new = {
        os.path.basename(f): f
        for f in glob.glob(
            os.path.join(snapshots.snapshot_dir(snapshot_root, to_version), "*.parquet")
        )
    }
    if from_version > 0:
        old = {
            os.path.basename(f)
            for f in glob.glob(
                os.path.join(
                    snapshots.snapshot_dir(snapshot_root, from_version), "*.parquet"
                )
            )
        }
        new = {b: f for b, f in new.items() if b not in old}
    return [new[b] for b in sorted(new)]


def ingest_snapshot_delta(
    segments_root: str,
    snapshot_root: str,
    from_version: int,
    to_version: "int | None" = None,
    **build_kwargs,
) -> "str | None":
    """DML → incremental index ingest: build ONE delta segment over the
    webtext rows a snapshot-store INSERT appended between two versions
    (VERDICT r4 #6 — the reference maintains indexes inside INSERT via
    insert_translator.cpp; the batch analog is a delta segment consumable
    by SegmentedBM25, no monolithic rebuild).  The delta corpus dir holds
    symlinks to the appended part files (no copy); build_index fingerprints
    the linked files, so re-running after the same INSERT reuses the
    segment.  Returns the segment dir, or None when nothing was appended."""
    from terrier_ray.state import snapshots

    if to_version is None:
        to_version = snapshots.current_version(snapshot_root)
    files = delta_part_files(snapshot_root, from_version, to_version)
    if not files:
        return None
    seg_dir = os.path.join(
        segments_root, f"seg-v{from_version:04d}-v{to_version:04d}"
    )
    corpus = os.path.join(seg_dir, "_delta_corpus")
    os.makedirs(corpus, exist_ok=True)
    for f in files:
        link = os.path.join(corpus, os.path.basename(f))
        if not os.path.exists(link):
            os.symlink(os.path.abspath(f), link)
    build_index(corpus, seg_dir, **build_kwargs)
    return seg_dir


def list_segments(segments_root: str) -> "list[str]":
    return sorted(
        d
        for d in glob.glob(os.path.join(segments_root, "seg-*"))
        if os.path.isdir(d)
    )


def compact_segments(
    webtext_dirs: "list[str]", out_dir: str, **build_kwargs
) -> str:
    """Compaction: one index over the union corpus.  The union dir holds
    symlinks to every segment's source shards (no data copy); build_index
    fingerprints the linked files, so re-running after adding a segment
    rebuilds exactly once."""
    union = os.path.join(out_dir, "_union_corpus")
    os.makedirs(union, exist_ok=True)
    for i, d in enumerate(sorted(webtext_dirs)):
        for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            link = os.path.join(union, f"{i:03d}-{os.path.basename(f)}")
            if not os.path.exists(link):
                os.symlink(os.path.abspath(f), link)
    build_index(union, out_dir, **build_kwargs)
    return out_dir
