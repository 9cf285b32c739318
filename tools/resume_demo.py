"""Crash-resume demonstration: run the partitioned KG build, SIGKILL it
mid-run, rerun, and verify the final adjacency equals an uninterrupted
build (FIXTURES.md §9 'resume-after-kill').

Usage: python tools/resume_demo.py [sf_dir] [target_partitions] [salt]
target_partitions/salt exercise the partition-count and hot-conversation
skew controls of build_kg_resumable (0 = default).
Prints one JSON line: {"partitions_before_kill": k, "partitions_total": n,
"resumed_ok": true, "edges_match": true}
"""

from __future__ import annotations

import glob
import json
import os
import signal
import subprocess
import sys
import time

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
TARGET = int(sys.argv[2]) if len(sys.argv) > 2 else 0
SALT = int(sys.argv[3]) if len(sys.argv) > 3 else 1
OUT = "/tmp/resume_demo_kg"
CHILD = f"""
import sys
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=16, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from deepkg_ray.pipelines import kg
kg.build_kg_resumable({SF!r}, {OUT!r},
                      target_partitions={TARGET!r} or None,
                      salt=max(1, {SALT!r}))
ray.shutdown()
"""


def n_done() -> int:
    m = os.path.join(OUT, "linked", "_manifest.json")
    if not os.path.exists(m):
        return 0
    with open(m) as f:
        return len(json.load(f)["partitions"])


def main():
    sys.path.insert(0, "/root/repo")
    import shutil
    if os.path.exists(OUT):
        shutil.rmtree(OUT)
    from deepkg_ray import synth
    synth.ensure_synth(SF)
    n_files = len(glob.glob(f"{synth.transcripts_path(SF)}/*.parquet"))
    n_parts = (min(TARGET, n_files) if TARGET else n_files) * max(1, SALT)

    # start, then SIGKILL once a few partitions are committed
    proc = subprocess.Popen([sys.executable, "-c", CHILD])
    deadline = time.time() + 600
    while time.time() < deadline and n_done() < max(2, n_parts // 3):
        if proc.poll() is not None:
            break
        time.sleep(0.5)
    killed_at = n_done()
    if proc.poll() is None:
        proc.send_signal(signal.SIGKILL)
        proc.wait()
    subprocess.run(["ray", "stop", "--force"], capture_output=True)

    # resume run (fresh process) completes the remaining partitions
    r = subprocess.run([sys.executable, "-c", CHILD], capture_output=True,
                       text=True)
    resumed_ok = r.returncode == 0 and n_done() == n_parts

    # compare against an uninterrupted build
    import duckdb
    con = duckdb.connect()
    a = con.execute(
        f"SELECT subj_id, pred, obj_id, weight FROM "
        f"read_parquet('{OUT}/adjacency/*.parquet') ORDER BY 1,2,3").fetchall()
    clean = "/tmp/resume_demo_clean"
    if os.path.exists(clean):
        shutil.rmtree(clean)
    subprocess.run([sys.executable, "-c",
                    CHILD.replace(OUT, clean)], capture_output=True)
    b = con.execute(
        f"SELECT subj_id, pred, obj_id, weight FROM "
        f"read_parquet('{clean}/adjacency/*.parquet') ORDER BY 1,2,3").fetchall()

    print(json.dumps({"partitions_before_kill": killed_at,
                      "partitions_total": n_parts,
                      "resumed_ok": resumed_ok,
                      "edges_match": a == b, "n_edges": len(a)}))


if __name__ == "__main__":
    main()
