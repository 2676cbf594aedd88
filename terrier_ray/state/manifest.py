"""Lineage manifests + resumable epochs.

The reference's durability story is WAL + recovery replay
(/root/reference/src/include/storage/write_ahead_log/log_manager.h:30-39,
storage/recovery/recovery_manager.h:42).  A batch engine does it the batch
way (SURVEY.md §7.2 M5): every pipeline epoch writes its outputs to its own
directory, then atomically drops a manifest recording inputs, outputs, row
counts and metrics.  A restarted job skips any epoch whose manifest verifies
against the same inputs — idempotent outputs instead of log replay.

Layout for a job rooted at ``out_dir``::

    out_dir/
      <epoch>/...            # epoch output files (parquet etc.)
      _manifest/<epoch>.json # written LAST, atomically (tmp + rename)
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any


@dataclass
class EpochManifest:
    epoch: str
    inputs: dict[str, Any]
    outputs: list[str] = field(default_factory=list)
    metrics: dict[str, Any] = field(default_factory=dict)
    wall_s: float = 0.0
    finished_at: float = 0.0


def _manifest_path(out_dir: str, epoch: str) -> str:
    return os.path.join(out_dir, "_manifest", f"{epoch}.json")


def epoch_done(out_dir: str, epoch: str, inputs: dict[str, Any]) -> bool:
    """True iff a manifest for ``epoch`` exists, matches ``inputs``, and all
    recorded outputs still exist on disk."""
    path = _manifest_path(out_dir, epoch)
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            m = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    if m.get("inputs") != inputs:
        return False
    return all(os.path.exists(p) for p in m.get("outputs", []))


def finish_epoch(
    out_dir: str,
    epoch: str,
    inputs: dict[str, Any],
    outputs: list[str],
    metrics: dict[str, Any],
    wall_s: float,
) -> None:
    """Atomically record epoch completion (write tmp, fsync, rename)."""
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    path = _manifest_path(out_dir, epoch)
    payload = {
        "epoch": epoch,
        "inputs": inputs,
        "outputs": outputs,
        "metrics": metrics,
        "wall_s": round(wall_s, 3),
        "finished_at": time.time(),
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def read_manifest(out_dir: str, epoch: str) -> dict[str, Any] | None:
    path = _manifest_path(out_dir, epoch)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)
