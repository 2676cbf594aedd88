"""HyperLogLog distinct sketch: accuracy within the theoretical error bound."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from terrier_ray.ops.sketch import hll_count_distinct


@pytest.mark.parametrize("true_n", [100, 5_000, 100_000])
def test_hll_within_error_bound(ray_session, true_n):
    import ray.data as rd

    rng = np.random.default_rng(17)
    # rows drawn with repetition; ground truth = distinct keys ACTUALLY drawn
    vals = rng.integers(0, true_n, true_n * 3)
    base = rng.permutation(10_000_000)[:true_n]  # non-contiguous key space
    data = base[vals]
    true = len(np.unique(data))
    ds = rd.from_arrow(pa.table({"k": data}))
    est = hll_count_distinct(ds, "k", p=12)
    rel = abs(est - true) / true
    # std error 1.04/sqrt(4096) ≈ 1.6%; allow 4 sigma
    assert rel < 0.065, f"estimate {est} vs true {true} (rel {rel:.3f})"


def test_hll_string_keys(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"s": [f"user_{i % 777}" for i in range(10_000)]})
    )
    est = hll_count_distinct(ds, "s", p=12)
    assert abs(est - 777) / 777 < 0.065


def test_mg_heavy_hitters_zipf(ray_session):
    """Heavy hitters over a zipf stream: top-k match exact counts."""
    import ray.data as rd

    from terrier_ray.ops.sketch import mg_heavy_hitters

    rng = np.random.default_rng(23)
    data = rng.zipf(1.3, 50_000)
    data = data[data < 10_000].astype(np.int64)
    out = mg_heavy_hitters(
        rd.from_arrow(pa.table({"v": data})), "v", k=10, capacity_factor=64
    ).to_pandas()
    vals, counts = np.unique(data, return_counts=True)
    order = np.lexsort((vals, -counts))
    want_vals, want_counts = vals[order[:10]], counts[order[:10]]
    assert (out["v"].values == want_vals).all()
    assert (out["count"].values == want_counts).all()
