"""Kill-and-resume demonstration (north rule: restart from last completed
shuffle epoch).

Launches an index build in a child process, SIGKILLs it mid-flight, then
resumes in a fresh process and verifies (a) completed epochs were skipped,
(b) the resumed index's per-term (df, cf) map is identical to an
uninterrupted reference build.

Usage: PYTHONPATH=/root/repo python tools/kill_resume_demo.py [num_docs]
Prints one JSON line.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import signal
import subprocess
import sys
import time

NUM_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
WEB = f"/tmp/terrier_ray_webtext/killdemo-{NUM_DOCS}"
IDX_KILLED = "/tmp/killdemo_idx_interrupted"
IDX_REF = "/tmp/killdemo_idx_reference"

CHILD = r"""
import sys, ray
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext; DataContext.get_current().enable_progress_bars=False
sys.path.insert(0, "/root/repo")
from terrier_ray.index.build import build_index
stats = build_index(sys.argv[1], sys.argv[2], num_buckets=8, num_salts=4)
print("BUILD_DONE", stats["timings"], flush=True)
from terrier_ray.raycompat import quiesce_ray_data_stats

quiesce_ray_data_stats()
ray.shutdown()
"""


def run_build(out_dir: str, kill_after_epoch: str | None = None) -> dict:
    p = subprocess.Popen(
        [sys.executable, "-c", CHILD, WEB, out_dir],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        env=dict(os.environ, PYTHONPATH="/root/repo"),
    )
    killed = False
    if kill_after_epoch:
        marker = os.path.join(out_dir, "_manifest", f"{kill_after_epoch}.json")
        deadline = time.time() + 300
        while time.time() < deadline and p.poll() is None:
            if os.path.exists(marker):
                time.sleep(0.7)  # let the next epoch get under way
                if p.poll() is None:
                    p.send_signal(signal.SIGKILL)
                    killed = True
                break
            time.sleep(0.05)
    out, _ = p.communicate()
    return {"killed": killed, "returncode": p.returncode, "stdout": out.strip()[-200:]}


def df_map(idx_dir: str) -> dict:
    import pyarrow.parquet as pq

    out = {}
    for f in sorted(glob.glob(os.path.join(idx_dir, "postings", "bucket-*.parquet"))):
        t = pq.read_table(f, columns=["term", "df", "cf"])
        for term, df, cf in zip(
            t.column("term").to_pylist(),
            t.column("df").to_pylist(),
            t.column("cf").to_pylist(),
        ):
            out[term] = (df, cf)
    return out


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from terrier_ray.datagen.webtext import generate_webtext_parquet

    generate_webtext_parquet(WEB, num_docs=NUM_DOCS, seed=42)
    for d in (IDX_KILLED, IDX_REF):
        shutil.rmtree(d, ignore_errors=True)

    # 1. interrupted build: SIGKILL shortly after the corpus epoch commits
    r1 = run_build(IDX_KILLED, kill_after_epoch="corpus")
    manifests_after_kill = sorted(
        os.path.basename(f)
        for f in glob.glob(os.path.join(IDX_KILLED, "_manifest", "*.json"))
    )

    # 2. resume in a fresh process
    t0 = time.perf_counter()
    r2 = run_build(IDX_KILLED)
    resume_s = time.perf_counter() - t0
    resumed_timings = r2["stdout"]

    # 3. uninterrupted reference build
    r3 = run_build(IDX_REF)

    same = df_map(IDX_KILLED) == df_map(IDX_REF)
    print(
        json.dumps(
            {
                "metric": "kill_resume",
                "killed_mid_build": r1["killed"],
                "manifests_at_kill": manifests_after_kill,
                "resume_skipped_corpus": "corpus_s" not in resumed_timings,
                "resume_wall_s": round(resume_s, 2),
                "df_cf_identical_to_uninterrupted": same,
                "n_terms": len(df_map(IDX_REF)),
            }
        )
    )


if __name__ == "__main__":
    main()
