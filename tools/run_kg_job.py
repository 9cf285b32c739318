"""`ray job submit` entrypoint for the flagship resumable KG build.

On a real cluster:

    ray job submit --working-dir /root/repo -- \
        python tools/run_kg_job.py --sf-dir s3://bucket/transcripts \
        --out-dir s3://bucket/kg

In this sandbox the same script runs standalone (`ray.init` falls back to
the local cluster; `RAY_ADDRESS=local` is preset).  The script OWNS a Ray
session (CLI entry points own their Ray session); it is the launch shell
around pipelines/kg.build_kg_resumable — per-partition checkpoint
manifest, lineage counters, idempotent resume — and prints one JSON line
with the run's metrics.

Resume semantics: re-submitting the identical command after a mid-run
failure skips every committed partition (state/checkpoint.py manifest)
and completes the rest; tools/resume_demo.py demonstrates byte-equality
with an uninterrupted run under SIGKILL.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                    help="input dir holding the transcript parquet tables")
    ap.add_argument("--out-dir", default="/tmp/kg_job_out",
                    help="output dir for adjacency/entity/predicate parquet")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU cap (ignored on a real cluster)")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        # under `ray job submit`, RAY_ADDRESS points at the cluster; the
        # num_cpus cap only applies to local-mode runs
        kw = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(address="local", **kw)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    from deepkg_ray.pipelines import kg
    from deepkg_ray.util import tune_data_context
    tune_data_context()

    t0 = time.time()
    result = kg.build_kg_resumable(args.sf_dir, args.out_dir)
    result["wall_sec"] = round(time.time() - t0, 3)
    print(json.dumps(result))
    ray.shutdown()


if __name__ == "__main__":
    main()
