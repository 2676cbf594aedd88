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
