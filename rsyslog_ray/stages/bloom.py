"""Distributed Bloom filter build + membership filtering.

The log-pipeline / dedup primitive for "have we seen this value before"
at O(1) memory per member bound: build the bit array over a REFERENCE
dataset (eval lines, known URLs, already-ingested message hashes), then
filter a corpus with zero shuffle — the filter broadcasts once
(ray.put) and each batch tests membership vectorized.

Construction: per-batch local bit arrays OR-folded streaming on the
driver — OR is associative/commutative so the fold order is free;
driver traffic is n_blocks × m/8 bytes (1 MiB filter → 128 KiB per
block). For extreme block counts pre-coalesce the reference with
`.repartition()` or OR-fold in two tiers; the filter itself stays
m/8 bytes however large the reference row count is.

Double hashing (Kirsch–Mitzenmacher 2006): bit_i = (h1 + i·h2) mod m,
so two 64-bit hashes give k independent-enough probes. No false
negatives by construction; FPR ≈ (1 - e^{-kn/m})^k, pinned by pytest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import hash64

#: odd multiplier decorrelating h2 from h1 (h1 is pandas hash_array)
_H2_PRIME = np.uint64(0x9E3779B97F4A7C15)


def _probes(vals, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing."""
    h1 = hash64(vals).to_numpy(zero_copy_only=False)
    with np.errstate(over="ignore"):
        h2 = (h1 ^ (h1 >> np.uint64(33))) * _H2_PRIME | np.uint64(1)
        idx = (h1[:, None] + np.arange(k, dtype=np.uint64)[None, :] * h2[:, None])
    return (idx % np.uint64(m_bits)).astype(np.int64)


def bloom_build(ds, col: str, m_bits: int = 1 << 20, k: int = 4) -> np.ndarray:
    """Build the filter over `ds[col]` (any hashable dtype; strings
    typical). Returns a packed uint8 bit array of m_bits/8 bytes."""
    def partial(t: pa.Table) -> pa.Table:
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        if t.num_rows:
            pos = _probes(arr, m_bits, k).ravel()
            np.bitwise_or.at(bits, pos >> 3,
                             np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.table({"bytes": pa.array([bits.tobytes()], pa.binary())})

    acc = np.zeros(m_bits // 8, dtype=np.uint8)
    for t in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        for b in t["bytes"].to_pylist():
            acc |= np.frombuffer(b, dtype=np.uint8)
    return acc


class BloomFilterStage:
    """map_batches stage: keep rows whose `col` value is (negate=False)
    possibly-in-set / (negate=True) definitely-NOT-in-set."""

    def __init__(self, bits_ref, col: str, k: int, negate: bool):
        import ray
        b = ray.get(bits_ref) if isinstance(bits_ref, ray.ObjectRef) \
            else bits_ref
        self.bits = np.asarray(b, dtype=np.uint8)
        self.m_bits = len(self.bits) * 8
        self.col = col
        self.k = k
        self.negate = negate

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return batch
        arr = batch[self.col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        pos = _probes(arr, self.m_bits, self.k)
        got = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        member = got.all(axis=1)
        return batch.filter(pa.array(~member if self.negate else member))


def bloom_filter_rows(ds, bits: np.ndarray, col: str, k: int = 4,
                      negate: bool = False):
    import ray
    return ds.map_batches(
        BloomFilterStage(ray.put(bits), col, k, negate),
        batch_format="pyarrow")
