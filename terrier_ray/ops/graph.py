"""Distributed graph connectivity over Ray Data.

``connected_components`` is hash-min label propagation — the standard
MapReduce connectivity shape (public literature: PEGASUS / Hash-Min a.k.a.
"HCC", Kang et al.; the two-phase large-star/small-star refinement exists
for adversarial diameters, unnecessary here).  It is the documented
distributed fallback for ``pipelines.dedup.dup_clusters``'s driver-side
union-find: near-dup clusters are small-diameter by construction (LSH
candidate groups are near-cliques), so rounds ≈ 2–4 and each round moves
O(E) small ints through one co-partitioned join + one bucket-shuffled
groupby-min — never the corpus, never the graph on one node.

The reference system has no graph operator; this exists for the
training-data pipeline tier (duplicate-cluster extraction at corpus
scale), matching the repo's scale posture: all exchanges bucket-bounded,
labels-only payloads, driver sees one scalar per round.

Driver boundary, stated plainly: the propagation ROUNDS never collect —
labels live as a Dataset and every round is join + groupby-min.  The
default ``collect=True`` return gathers the final (node, label) table to
the driver for small results; pass ``collect=False`` (and a Dataset of
edges) to keep both ends distributed — the caller then consumes via
``write_parquet``/further stages.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from terrier_ray.ops.relational import (
    grouped_aggregate,
    partitioned_join,
    union_all,
)

_EMPTY_CC = pa.table(
    {
        "node": pa.array([], type=pa.int64()),
        "label": pa.array([], type=pa.int64()),
    }
)


def connected_components(
    edges,
    max_rounds: int = 25,
    num_partitions: int = 32,
    collect: bool = True,
):
    """Connected components of an undirected edge list.

    ``edges``: Dataset or pyarrow Table with two int64 columns ``src``,
    ``dst`` (direction ignored; self-loops and duplicates tolerated; pass a
    Dataset when the edge list itself is large).  Returns ``(node, label)``
    covering every endpoint, ``label`` = the component's minimum node id —
    as a pyarrow Table when ``collect=True`` (default; driver-resident, for
    small results), else as the materialized Dataset (nothing but the
    per-round convergence scalar ever reaches the driver).

    Per round: attach each node's current label to its outgoing edges
    (co-partitioned join), send it to the neighbour, and take the
    groupby-min of received labels and the node's own.  Labels only
    decrease, so ``sum(label)`` strictly decreases on any change — the
    convergence test is one scalar per round, no label-diff join.
    Rounds needed ≈ component diameter; ``max_rounds`` guards pathological
    inputs (a 10^6-node path) with a hard error rather than silent
    truncation.
    """
    import ray.data as rd

    if isinstance(edges, pa.Table):
        edges = rd.from_arrow(edges) if edges.num_rows else None
    if edges is None:
        return _EMPTY_CC if collect else rd.from_arrow(_EMPTY_CC)

    def undirect(b: pa.Table) -> pa.Table:
        s = pc.cast(b.column("src"), pa.int64())
        d = pc.cast(b.column("dst"), pa.int64())
        return pa.concat_tables(
            [pa.table({"src": s, "dst": d}), pa.table({"src": d, "dst": s})]
        )

    und = edges.map_batches(
        undirect, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # consumed once per round: pin the lineage
    if und.count() == 0:
        return _EMPTY_CC if collect else rd.from_arrow(_EMPTY_CC)

    # round 0 fused: label(v) = min(v, min neighbour)
    lab = grouped_aggregate(
        und, ["src"], [("min", "dst", "nmin")], num_partitions=num_partitions
    ).map_batches(
        lambda b: pa.table(
            {
                "node": b.column("src"),
                "label": pc.min_element_wise(b.column("src"), b.column("nmin")),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    cur = lab.sum("label")

    for _ in range(max_rounds):
        msgs = partitioned_join(
            und, lab, on=["src"], right_on=["node"], num_partitions=num_partitions
        ).map_batches(
            lambda b: pa.table({"node": b.column("dst"), "label": b.column("label")}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        lab = grouped_aggregate(
            union_all(msgs, lab),
            ["node"],
            [("min", "label", "label")],
            num_partitions=num_partitions,
        ).materialize()
        new = lab.sum("label")
        if new == cur:
            if not collect:
                return lab
            tabs = list(lab.iter_batches(batch_size=None, batch_format="pyarrow"))
            return pa.concat_tables(tabs) if tabs else _EMPTY_CC
        cur = new
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds "
        "(component diameter exceeds the bound; raise max_rounds)"
    )
