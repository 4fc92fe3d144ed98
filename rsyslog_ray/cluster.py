"""Cluster-width helpers — derive shuffle parallelism from the actual
cluster instead of hard-coded constants (round-1 verdict: 64-bucket
ceilings cap shuffle parallelism regardless of cluster width).

Bucket counts only steer PARTITIONING (which worker handles which key
range); results are bucket-count-independent, so deriving them from
`ray.cluster_resources()` keeps outputs deterministic while letting a
256-node cluster fan out past 64 tasks.
"""

from __future__ import annotations


def cluster_cpus(default: int = 16) -> int:
    import ray
    if ray.is_initialized():
        return max(1, int(ray.cluster_resources().get("CPU", default)))
    return default


def cluster_buckets(multiplier: int = 4, floor: int = 64,
                    cap: int = 65_536) -> int:
    """Hash-bucket count for bucketed shuffles: 4× cluster CPUs, floored at
    the old constant (64) so single-node behavior is unchanged, capped so
    the groupby's per-bucket fixed cost stays amortized."""
    return max(floor, min(cap, multiplier * cluster_cpus()))


def fast_hash64(arr) -> "np.ndarray":
    """Vectorized 64-bit hash of an Arrow array → uint64 numpy, for
    BUCKET ASSIGNMENT only (values never surface in outputs; ops must be
    bucket-invariant regardless). polars' SIMD hash measures ~5x pandas'
    hash_array on 600k strings; falls back to pandas when polars is
    unavailable. For user-facing hash values (the hash32/hash64 script
    functions, by_hash dedup keys) keep functions.hash64 — its values
    are pinned by tests across processes."""
    import numpy as np
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # Backend is fixed at import time (polars is a pinned dependency of
    # this repo): a per-call try/except would let heterogeneous workers
    # hash the same key into different buckets, silently splitting one
    # group across bucket_merge partitions. If polars is genuinely
    # absent the import fails loudly on every worker alike.
    import polars as pl
    return pl.from_arrow(arr).hash().to_numpy().astype(np.uint64,
                                                       copy=False)


#: per-WORKER broadcast cache (bounded): ray.get of a PICKLED Python
#: object (dict/set) re-deserializes on every call — numpy/Arrow gets
#: are zero-copy and don't need this. Worker processes are reused
#: across tasks, so caching by ref gives actor-__init__ amortization
#: without actor startup cost.
_BCAST_CACHE: dict = {}


def cached_broadcast_get(ref, _cap: int = 8):
    """ray.get(ref) memoized per worker process (LRU, bounded).

    LRU rather than FIFO: a worker interleaving tasks from several
    broadcast consumers (LM scorer's two refs + DSIR weights +
    contamination map + ...) would otherwise evict the hottest ref and
    re-pay full dict unpickling per task — the exact cost this cache
    exists to amortize.
    """
    key = ref.hex()
    v = _BCAST_CACHE.get(key)
    if v is None:
        import ray
        if len(_BCAST_CACHE) >= _cap:        # bound worker memory
            _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
        v = _BCAST_CACHE[key] = ray.get(ref)
    else:                                    # refresh recency
        _BCAST_CACHE[key] = _BCAST_CACHE.pop(key)
    return v
