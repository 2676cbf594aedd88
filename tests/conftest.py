"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    # avoid the StatsManager-thread vs shutdown race (raycompat docstring)
    from terrier_ray.raycompat import quiesce_ray_data_stats

    quiesce_ray_data_stats()
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correct() -> str:
    return SF_CORRECT


@pytest.fixture(scope="session")
def tmp_root(tmp_path_factory):
    return tmp_path_factory.mktemp("terrier_ray")


@pytest.fixture(scope="session")
def webtext_small(tmp_root):
    """Deterministic webtext parquet (small) shared across tests."""
    from terrier_ray.datagen.webtext import generate_webtext_parquet

    path = os.path.join(str(tmp_root), "webtext_small")
    generate_webtext_parquet(path, num_docs=400, seed=42)
    return path
