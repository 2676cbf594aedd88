"""Measure the postings exchange's per-posting byte bill, old vs packed.

The hash exchange's map→reduce payload is THE byte mover of the index
build (~9.7 GB through the object store at 7.68M docs — the measured
single-box DRAM ceiling, and a real cluster's network bill).  This tool
replays the explode+partition step of `_hash_exchange_postings` over a
sample of a tokenized corpus and reports what the map tasks would have
returned in

  * the round-3 format (term string, int64 docid, int32 tf/dl/salt/gkey)
  * the current wire format (`_pack_exchange` v2: docid-sorted rows,
    delta+varbyte docids, per-unique-doc dl, length-prefixed term dict +
    adaptive-width index/tf blobs, salt recomputed reduce-side)

NOTE: production parts are per (explode task, group) — a task covers
~_EXPLODE_CHUNK_BYTES (384 MB) of corpus, i.e. MANY row groups, and the
packed layout amortizes per part (docid delta gaps shrink, the term dict
and per-unique-doc dl are paid once per part), so a 1-row-group part
OVERSTATES the packed bytes.  `rgs_per_part` sets how many row groups
each replayed part covers; match it to the build's real task geometry
(corpus_bytes / _EXPLODE_CHUNK_BYTES tasks, or cpus if larger — e.g. the
7.68M-doc / 8-cpu scaling leg runs 8 explode tasks over ~832 row groups
= ~104 rgs/part) or sweep it and read the trendline.  rgs_per_part=1
reproduces the older tool's upper bound.

Bytes are `pa.Table.nbytes` — exactly what Ray's zero-copy Arrow
serialization puts in the object store.  Pure driver-side replay (no
ray.init): layout math, not wall-time, so host noise is irrelevant.

Usage: python tools/exchange_bytes.py <index_out_dir> [max_row_groups] [rgs_per_part]
"""

import glob
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from terrier_ray.index.build import _Exploder, _lpt_pack, _pack_exchange


def main() -> None:
    out_dir = sys.argv[1]
    max_rgs = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    corpus_dir = os.path.join(out_dir, "corpus")
    with open(os.path.join(out_dir, "stats.json")) as f:
        stats = json.load(f)
    num_buckets = stats["num_buckets"]
    num_groups = min(num_buckets, 64)
    mass = np.asarray(stats.get("bucket_mass", ()), dtype=np.float64)
    if len(mass) != num_buckets:
        mass = np.ones(num_buckets, dtype=np.float64)
    explode = _Exploder(
        num_buckets,
        heavy_terms=stats.get("heavy_terms", ()),
        num_salts=stats.get("num_salts", 1),
        group_of=_lpt_pack(mass, num_groups),
    )

    rgs_per_part = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    files = sorted(glob.glob(os.path.join(corpus_dir, "*.parquet")))
    old_bytes = new_bytes = postings = rgs_done = 0
    per_group: list[list] = [[] for _ in range(num_groups)]
    rgs_in_part = 0

    def flush() -> None:
        nonlocal old_bytes, new_bytes, postings, per_group, rgs_in_part
        for parts in per_group:
            if not parts:
                continue
            raw = pa.concat_tables(parts).combine_chunks()
            packed = _pack_exchange(raw)
            old_bytes += raw.nbytes
            new_bytes += packed.nbytes
            postings += raw.num_rows
        per_group = [[] for _ in range(num_groups)]
        rgs_in_part = 0

    for f in files:
        pf = pq.ParquetFile(f)
        for rg in range(pf.metadata.num_row_groups):
            if rgs_done >= max_rgs:
                break
            tab = pf.read_row_group(rg, columns=["docid", "dl", "terms", "tfs"])
            for s in range(0, tab.num_rows, 1024):
                out = explode(tab.slice(s, 1024))
                gk = out.column("gkey").to_numpy(zero_copy_only=False)
                order = np.argsort(gk, kind="stable")
                srt = out.take(pa.array(order))
                gks = gk[order]
                starts = np.searchsorted(gks, np.arange(num_groups))
                ends = np.concatenate((starts[1:], [len(gks)]))
                for g in range(num_groups):
                    if ends[g] > starts[g]:
                        per_group[g].append(
                            srt.slice(int(starts[g]), int(ends[g] - starts[g]))
                        )
            rgs_done += 1
            rgs_in_part += 1
            if rgs_in_part >= rgs_per_part:
                flush()
        if rgs_done >= max_rgs:
            break
    if rgs_in_part:
        flush()

    print(
        json.dumps(
            {
                "corpus": corpus_dir,
                "row_groups_sampled": rgs_done,
                "rgs_per_part": rgs_per_part,
                "postings": postings,
                "old_bytes_per_posting": round(old_bytes / max(postings, 1), 2),
                "new_bytes_per_posting": round(new_bytes / max(postings, 1), 2),
                "shrink_factor": round(old_bytes / max(new_bytes, 1), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
