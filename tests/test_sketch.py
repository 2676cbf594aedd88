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


def test_tdigest_rank_error_and_mergeability():
    import numpy as np
    import pyarrow as pa

    from terrier_ray.ops.sketch import tdigest_partials, tdigest_quantile

    rng = np.random.default_rng(5)
    v = rng.lognormal(0.0, 1.5, 100_000)
    qs = [0.01, 0.25, 0.5, 0.9, 0.99]
    sv = np.sort(v)

    # single-shot digest
    t1 = tdigest_partials(pa.array(v))
    est1 = tdigest_quantile(
        t1.column("mean").to_numpy(), t1.column("weight").to_numpy(), qs
    )
    # merged from 10 disjoint partials (the distributed shape)
    parts = [tdigest_partials(pa.array(c)) for c in np.array_split(v, 10)]
    merged = pa.concat_tables(parts)
    est2 = tdigest_quantile(
        merged.column("mean").to_numpy(), merged.column("weight").to_numpy(), qs
    )
    for q, e1, e2 in zip(qs, est1, est2):
        for e in (e1, e2):
            rank_err = abs(np.searchsorted(sv, e) / len(v) - q)
            assert rank_err < 0.01, (q, e, rank_err)


def test_approx_percentile_matches_exact_on_orders(ray_session, sf_smoke):
    import numpy as np
    import pyarrow.parquet as pq

    from terrier_ray.ops.relational import read_table
    from terrier_ray.ops.sketch import approx_percentile

    ds = read_table(sf_smoke, "orders", columns=["o_totalprice"])
    est = approx_percentile(ds, "o_totalprice", [0.5, 0.9])
    v = pq.read_table(f"{sf_smoke}/orders.parquet", columns=["o_totalprice"])
    sv = np.sort(v.column("o_totalprice").to_numpy())
    for q, e in zip([0.5, 0.9], est):
        rank_err = abs(np.searchsorted(sv, e) / len(sv) - q)
        assert rank_err < 0.02, (q, e, rank_err)


def test_count_min_bounds_and_mergeability():
    import numpy as np
    import pyarrow as pa

    from terrier_ray.ops.sketch import cm_dense, cm_partials, cm_query

    rng = np.random.default_rng(11)
    vocab = np.array([f"w{i}" for i in range(800)], dtype=object)
    vals = vocab[rng.integers(0, len(vocab), size=20000)]
    vals = np.concatenate([vals, np.array(["hot"] * 3000, dtype=object)])
    exact = {}
    for v in vals:
        exact[v] = exact.get(v, 0) + 1

    # single pass vs two merged half-passes must be identical
    whole = cm_partials(pa.array(vals.tolist()))
    half1 = cm_partials(pa.array(vals[:9000].tolist()))
    half2 = cm_partials(pa.array(vals[9000:].tolist()))
    merged = (
        pa.concat_tables([half1, half2])
        .group_by(["__slot"])
        .aggregate([("__count", "sum")])
        .rename_columns(["__slot", "__count"])
    )
    m_whole, m_merged = cm_dense(whole), cm_dense(merged)
    assert (m_whole == m_merged).all()

    probes = ["hot"] + [f"w{i}" for i in range(0, 50)] + ["absent"]
    est = cm_query(m_whole, pa.array(probes))
    n = len(vals)
    eps_bound = int(np.ceil(np.e / 2048 * n))
    for p, e in zip(probes, est):
        true = exact.get(p, 0)
        assert e >= true  # one-sided: never underestimates
        assert e <= true + eps_bound * 4  # loose multiple of the w.h.p. bound


def test_count_min_weighted_equals_unweighted():
    import numpy as np
    import pyarrow as pa

    from terrier_ray.ops.sketch import cm_dense, cm_partials

    vals = ["a"] * 5 + ["b"] * 3 + ["c"] * 1
    raw = cm_partials(pa.array(vals))
    weighted = cm_partials(
        pa.array(["a", "b", "c"]), weights=np.array([5, 3, 1], dtype=np.int64)
    )
    assert (cm_dense(raw) == cm_dense(weighted)).all()


def test_cm_term_counts_entry(ray_session, sf_smoke):
    from terrier_ray.pipelines.textops import cm_term_counts

    t = cm_term_counts(sf_smoke)
    assert t.num_rows == 6
    # "the"/"table" are corpus-frequent; estimates must be positive and
    # never below a trivially-true floor of 1
    assert all(v >= 1 for v in t.column("est_count").to_pylist())
