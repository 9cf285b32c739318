"""Small runtime helpers (no ray.init here — session owned by the caller)."""

from __future__ import annotations


def cluster_cpus(default: int = 8) -> int:
    try:
        import ray
        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        pass
    return default


def heavy_pool(frac_min: float = 0.75, reserve: int = 1) -> tuple[int, int]:
    """Actor-pool sizing for a dominant compute stage: start near full size
    immediately (autoscaling from a small min ramps nondeterministically and
    dominates run-to-run variance on short jobs) but cap below the CPU count
    so read/write/shuffle tasks keep running (a full-size pool starves them
    and the pipeline serializes)."""
    n = cluster_cpus()
    # leave ~1/4 for read/write/shuffle; the floor is 1, NOT 2 — at 2 CPUs a
    # 2-actor pool owns every slot and serializes the pipeline (reads starve),
    # which showed up as a physically-impossible >1 scaling efficiency
    hi = max(1, n - max(reserve, n // 4))
    lo = max(1, min(hi, int(n * frac_min)))
    return (lo, hi)


_STATE_CACHE: dict = {}


def _key_part(v):
    """Stable cache-key token; non-hashable ctor args (numpy arrays, lists)
    key by content digest."""
    try:
        hash(v)
        return v
    except TypeError:
        import hashlib
        import pickle
        return ("digest", hashlib.sha1(pickle.dumps(v)).hexdigest())


_STATE_CACHE_MAX = 8


def _cached_instance(cls, kwargs: dict):
    key = (cls, tuple((k, _key_part(v)) for k, v in sorted(kwargs.items())))
    inst = _STATE_CACHE.get(key)
    if inst is None:
        inst = cls(**kwargs)
        # bounded FIFO: ctor kwargs can embed per-call data (query/centroid
        # matrices), so an unbounded cache would pin every variant in every
        # worker process for its lifetime
        if len(_STATE_CACHE) >= _STATE_CACHE_MAX:
            _STATE_CACHE.pop(next(iter(_STATE_CACHE)))
        _STATE_CACHE[key] = inst
    return inst


def stateful_map(ds, cls, ctor_kwargs: dict, *, concurrency=None,
                 batch_size: int = 4096, batch_format: str = "pyarrow"):
    """Run a stateful batch-kernel class over a Dataset.

    concurrency=None (default): TASK pool with a per-worker-process state
    cache — Ray reuses worker processes across map tasks, so the state
    (automaton, dictionary, compiled patterns) is built once per worker,
    the same amortization an actor pool gives WITHOUT pool-sizing or
    autoscaling-ramp pathologies (a (1,8)-actor pool on a ~5 s job spends
    most of the job ramping; a task pool runs on prestarted workers and
    scales elastically with the cluster).

    concurrency=tuple/int: ACTOR pool — the right shape when state must
    pin resources (GPU model replicas) or is too costly to build on every
    worker."""
    if concurrency is None:
        def fn(batch, _cls=cls, _kw=ctor_kwargs):
            from deepkg_ray.util import _cached_instance
            return _cached_instance(_cls, _kw)(batch)
        return ds.map_batches(fn, batch_format=batch_format,
                              batch_size=batch_size)
    return ds.map_batches(cls, fn_constructor_kwargs=ctor_kwargs,
                          batch_format=batch_format, batch_size=batch_size,
                          concurrency=concurrency)


def spread_small(ds, target: int | None = None):
    """Repartition ONLY when the dataset is backed by fewer input files
    than the cluster has cores — a small table read from one parquet file
    yields 1-3 blocks, serializing a CPU-heavy downstream stage to 1-3
    tasks no matter the batch_size (tasks are per block).  At real scale
    inputs already carry more blocks than CPUs and this is a no-op; when
    the file count is unknown (from_pandas etc.) the dataset is left
    untouched."""
    target = target or cluster_cpus() * 2
    try:
        n_files = len(ds.input_files())
        size = ds.size_bytes() or 0
    except Exception:
        return ds
    # tables under ~8 MiB aren't worth a repartition barrier — the
    # vectorized kernels chew them in well under the barrier's cost
    if 0 < n_files < target and size > 8 * 1024 * 1024:
        return ds.repartition(target)
    return ds


def tune_data_context() -> None:
    """Recommended Ray Data context for this engine's workloads — called by
    session OWNERS (bench.py, CLI tools), never from library code (the
    driver/tests own their sessions and their defaults must stand).

    - op_resource_reservation_enabled=False: the reservation allocator
      caps the fused hot operator at ~2-3 concurrent tasks of 8 on this
      pipeline shape (measured 184k → 395k turns/s at 8 CPUs when
      disabled); our pipelines are linear chains where starvation between
      operators isn't a risk.

    target_max_block_size is left at the 128 MiB default: raising it to
    64+ MiB looked good in contended trials but was noise (clean paired
    runs: 1183k vs 1145k turns/s), and at small inputs it coalesces the
    read into too few blocks to feed the cluster (repeat=1 kg_build
    regressed 4.4 s → 5.8-7.3 s at 32 CPUs)."""
    from ray.data import DataContext
    DataContext.get_current().op_resource_reservation_enabled = False


def tiny_task_cpus() -> float | None:
    """On clusters so small that the heavy stage runs fractional actors
    (cluster_cpus() <= 3 → 3 × 0.5-CPU actors, see extract_linked_triples),
    only a fractional CPU share remains for everything else — a 1-CPU read
    or map task can then NEVER schedule against the 1.5-CPU pool and the
    pipeline deadlocks (observed: 2-CPU scaling leg hung >20 min at 0%
    worker CPU).  Stages that run concurrently with the pool must request
    0.5 CPU on such clusters; returns None (use Ray's default) otherwise."""
    return 0.5 if cluster_cpus() <= 3 else None


def light_pool() -> tuple[int, int]:
    n = cluster_cpus()
    return (1, max(2, n // 2))


def join_partitions(cap: int = 64) -> int:
    """num_partitions for Dataset.join: the hash-shuffle join runs one
    aggregator actor per partition, so size it to the cluster (≈ half the
    CPUs, capped) — 16 fixed partitions deadlock-adjacent a 4-CPU test
    session and undershoot a 256-node cluster."""
    return max(2, min(cap, cluster_cpus() // 2))


def drop_empty_blocks(ds):
    """Rebuild a dataset keeping only its non-empty blocks.

    Hash-shuffle operators (groupby aggregate / join) emit 0-row blocks with
    ZERO columns for partitions that received no keys, and map_batches passes
    empty blocks through WITHOUT invoking the UDF — so a schema-repair lambda
    never sees them.  A downstream Dataset.join whose hash partition happens
    to receive only such shards then fails pyarrow schema resolution
    ("No match ... FieldRef on right side").  This strips them at the block
    level: the driver touches object refs + metadata only, never block data,
    so it is metadata-cost even at cluster scale.  Call it on join inputs
    that derive from a hash groupby.  Executes the dataset if it is lazy —
    pass materialized inputs to avoid recompute.  If EVERY block is empty the
    dataset is returned unchanged (callers guard the all-empty case, which
    breaks pyarrow joins regardless)."""
    import ray.data as rd
    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        return ds
    return rd.from_arrow_refs(refs)


def rows_all(ds) -> list[dict]:
    """Dataset.take_all() semantics at Dataset.to_pandas() speed.

    ray 2.49's take_all() drains the streaming executor through the
    row-iterator path, which carries a multi-second FIXED overhead per
    call even for a 2k-row single-block result (measured ~2 s on an idle
    32-CPU node; ~6 s behind a repartition); to_pandas() fetches the same
    blocks Arrow-native in <0.1 s.  Every driver-side collect of a small
    bounded result should go through here."""
    return ds.to_pandas().to_dict("records")
