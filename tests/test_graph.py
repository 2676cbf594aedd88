"""connected_components (hash-min label propagation) + distributed dup_clusters."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from terrier_ray.ops.graph import connected_components


def _cc(edges, **kw):
    t = connected_components(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        ),
        **kw,
    )
    return dict(zip(t.column("node").to_pylist(), t.column("label").to_pylist()))


def test_cc_path_clique_and_isolated_pair(ray_session):
    # a 9-edge path (forces multiple propagation rounds), a clique, a pair
    path = [(i, i + 1) for i in range(10, 19)]
    clique = [(a, b) for a in (30, 31, 32, 33) for b in (30, 31, 32, 33) if a < b]
    got = _cc(path + clique + [(50, 51)])
    assert {got[n] for n in range(10, 20)} == {10}
    assert {got[n] for n in (30, 31, 32, 33)} == {30}
    assert got[50] == got[51] == 50
    # three components, every endpoint labeled
    assert len(got) == 10 + 4 + 2


def test_cc_direction_duplicates_selfloops(ray_session):
    got = _cc([(2, 1), (1, 2), (2, 3), (3, 3), (7, 7)])
    assert got[1] == got[2] == got[3] == 1
    assert got[7] == 7


def test_cc_empty_and_nonconvergence_guard(ray_session):
    t = connected_components(pa.table({"src": pa.array([], pa.int64()),
                                       "dst": pa.array([], pa.int64())}))
    assert t.num_rows == 0 and t.column_names == ["node", "label"]
    with pytest.raises(RuntimeError, match="converge"):
        _cc([(i, i + 1) for i in range(40)], max_rounds=2)


def test_cc_matches_union_find_random(ray_session):
    rng = np.random.default_rng(7)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 60, size=(120, 2))]

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {d: find(d) for d in parent}
    assert _cc(edges) == want


def test_dup_clusters_distributed_identical(ray_session, sf_smoke):
    from terrier_ray.pipelines.dedup import dup_clusters, dup_clusters_distributed

    a = dup_clusters(sf_smoke).to_pandas()
    b = dup_clusters_distributed(sf_smoke).to_pandas()
    import pandas as pd

    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )
    assert len(b) > 0, "sf_smoke must contain at least one dup cluster"


def test_cc_collect_false_returns_dataset(ray_session):
    import pyarrow as pa

    from terrier_ray.ops.graph import connected_components

    ds = connected_components(
        pa.table({"src": pa.array([1, 2], pa.int64()),
                  "dst": pa.array([2, 3], pa.int64())}),
        collect=False,
    )
    assert hasattr(ds, "iter_batches")  # a Dataset, not a driver table
    got = dict(zip(*[ds.to_pandas()[c].tolist() for c in ("node", "label")]))
    assert got == {1: 1, 2: 1, 3: 1}
