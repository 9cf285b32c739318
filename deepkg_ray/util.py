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


def heavy_pool(frac_min: float = 0.75, reserve: int = 2) -> tuple[int, int]:
    """Actor-pool sizing for a dominant compute stage: start near full size
    immediately (autoscaling from a small min ramps nondeterministically and
    dominates run-to-run variance on short jobs) but cap below the CPU count
    so read/write/shuffle tasks keep running (a full-size pool starves them
    and the pipeline serializes)."""
    n = cluster_cpus()
    hi = max(2, n - max(reserve, n // 4))   # leave ~1/4 for read/write/shuffle
    lo = max(1, min(hi, int(n * frac_min)))
    return (lo, hi)


def light_pool() -> tuple[int, int]:
    n = cluster_cpus()
    return (1, max(2, n // 2))


def join_partitions(cap: int = 64) -> int:
    """num_partitions for Dataset.join: the hash-shuffle join runs one
    aggregator actor per partition, so size it to the cluster (≈ half the
    CPUs, capped) — 16 fixed partitions deadlock-adjacent a 4-CPU test
    session and undershoot a 256-node cluster."""
    return max(2, min(cap, cluster_cpus() // 2))
