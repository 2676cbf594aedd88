"""Engine settings registry — the SettingsManager analog.

Reference: ~100 runtime knobs via settings::SettingsManager
(/root/reference/src/include/settings/settings_defs.h, e.g.
parallel_execution :168, num_parallel_execution_threads :375).  This engine
keeps the same posture — every tunable has ONE name, a documented default,
and an environment override — without threading a config object through
every call site: operators take explicit keyword arguments whose defaults
come from here.

Knobs (env var → meaning):

- GRAFT_SF_DIR            bench input directory (bench.py)
- RAY_GRAFT_CPUS          bench ray.init num_cpus (bench.py)
- GRAFT_BUCKETS           posting buckets for the flagship index
- GRAFT_SCALING_CPUS/REPS/DOCS  scaling-bench legs (bench.py --scaling)
- GRAFT_NUM_PARTITIONS    default bucket count for shuffling operators
- GRAFT_BATCH_SIZE        default map_batches batch size for heavy stages
"""

from __future__ import annotations

import os
from dataclasses import dataclass


def _int_env(name: str, default: int) -> int:
    v = os.environ.get(name)
    return int(v) if v else default


@dataclass(frozen=True)
class Settings:
    num_partitions: int = 32  #: default shuffle bucket count
    batch_size: int = 512  #: default heavy-stage batch size
    posting_buckets: int = 64  #: flagship index posting buckets
    sf_dir: str = "/root/testdata/sf0.1"
    num_cpus: int = 32


def get_settings() -> Settings:
    """Resolve the registry against the environment (call-time, not import-
    time, so tests can monkeypatch the env)."""
    return Settings(
        num_partitions=_int_env("GRAFT_NUM_PARTITIONS", 32),
        batch_size=_int_env("GRAFT_BATCH_SIZE", 512),
        posting_buckets=_int_env("GRAFT_BUCKETS", 64),
        sf_dir=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        num_cpus=_int_env("RAY_GRAFT_CPUS", 32),
    )
