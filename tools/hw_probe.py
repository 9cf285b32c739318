"""Zero-coordination hardware baseline for the scaling criterion.

Runs the SAME per-turn work as the fused KG hot path (normalize →
extract+link → partial adjacency) over pre-loaded in-heap batches in K
forked worker processes with NO coordination at all — no Ray, no object
store, no scheduler, perfect static partitioning.  Whatever efficiency this
loses between two K values is the host's own (DRAM bandwidth / cache /
co-tenant) scaling wall; the engine's relative efficiency is
eff_pipeline / eff_probe at the same two parallelism levels.

Usage: python tools/hw_probe.py <K> [repeat]   → one JSON line
(OMP_NUM_THREADS is pinned to 1 in workers to match Ray's worker env.)
"""

from __future__ import annotations

import glob
import json
import multiprocessing as mp
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 8192
BATCHES: list = []
SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _load() -> int:
    from deepkg_ray import synth
    d = synth.ensure_synth(SF)
    files = sorted(glob.glob(f"{d}/transcripts/*.parquet"))
    t = pa.concat_tables([pq.read_table(f, columns=["conv_id", "turn_idx", "text"])
                          for f in files])
    BATCHES.extend(t.slice(o, BATCH) for o in range(0, t.num_rows, BATCH))
    return t.num_rows


def _worker(idxs) -> int:
    import numpy as np
    from deepkg_ray import synth
    from deepkg_ray.functions.textnorm import add_text_norm
    from deepkg_ray.stages.canonical import _partial_adjacency
    from deepkg_ray.stages.relation import LinkedRelationExtractor
    ex = LinkedRelationExtractor(synth.dictionary_path(SF))
    for i in idxs:
        b = BATCHES[i]
        # compact-copy the slice first: kernels on contiguous buffers are
        # ~20% faster than on sliced views, and Ray blocks ARE contiguous —
        # without this the baseline UNDERSTATES the hardware ceiling
        b = b.take(np.arange(b.num_rows))
        out = ex(add_text_norm(b))
        if out.num_rows:
            _partial_adjacency(out)
    return len(idxs)


def run(k: int, repeat: int) -> dict:
    n_rows = _load()
    idx_all = list(range(len(BATCHES))) * repeat
    total = n_rows * repeat
    shares = [idx_all[i::k] for i in range(k)]
    t0 = time.time()
    with mp.get_context("fork").Pool(k) as p:
        p.map(_worker, shares)
    wall = time.time() - t0
    return {"k": k, "repeat": repeat, "wall_sec": round(wall, 3),
            "turns_per_sec": round(total / wall, 1)}


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    print(json.dumps(run(k, repeat)))
