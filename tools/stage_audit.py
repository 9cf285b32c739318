"""Per-operator audit of the flagship pipelines: run each named query
over $GRAFT_SF_DIR (default sf0.1), capture Ray Data's ds.stats() —
per-operator wall time, CPU time, rows and block sizes — and write a
markdown report.  This is the measure-don't-guess loop as a committed
artifact: a stage whose wall is dominated by anything but useful compute
shows up here first.

Usage: python tools/stage_audit.py [out_md]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stage_audit.md"


def main():
    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from deepkg_ray import synth
    synth.ensure_synth(SF)

    def q_kg_build():
        from deepkg_ray.pipelines import kg
        return kg.adjacency_dataset(SF)

    def q_mentions():
        from deepkg_ray.pipelines import kg
        return kg.mentions_dataset(SF)

    def q_mentions_sharded():
        from deepkg_ray.pipelines.kg import transcripts_with_norm
        from deepkg_ray.stages.shardeddict import detect_mentions_sharded
        return detect_mentions_sharded(transcripts_with_norm(SF),
                                       synth.dictionary_path(SF),
                                       n_shards=4)

    def q_dedup_minhash():
        from deepkg_ray.sources.readers import read_documents
        from deepkg_ray.stages.dedup import minhash_dedup_pairs
        return minhash_dedup_pairs(
            read_documents(SF, ["doc_id", "text"]),
            f"{SF}/documents.parquet", threshold=0.8,
            hash_mode="parity")

    sections = []
    for name, fn in [("kg_build", q_kg_build),
                     ("kg_mentions", q_mentions),
                     ("kg_mentions_sharded", q_mentions_sharded),
                     ("dedup_minhash", q_dedup_minhash)]:
        t0 = time.time()
        ds = fn()
        n = ds.count()
        wall = time.time() - t0
        try:
            stats = ds.stats()
        except Exception as e:                      # stats are best-effort
            stats = f"(stats unavailable: {e})"
        sections.append(f"## {name} — {wall:.2f}s, {n} rows\n\n"
                        f"```\n{stats}\n```\n")

    with open(OUT, "w") as f:
        f.write(f"# Stage audit — {SF}\n\n" + "\n".join(sections))
    print(OUT)
    ray.shutdown()


if __name__ == "__main__":
    main()
