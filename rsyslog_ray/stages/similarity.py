"""Similarity search over an embedding column (list<float>).

- topk_cosine: brute-force cosine top-k against a broadcast query matrix —
  numpy matmul per batch, per-batch partial top-k, tiny final sort. The
  baseline every ANN variant is checked against.
- lsh_topk_cosine: random-hyperplane LSH bucketing — the scale path: only
  candidates sharing a bucket with the query are scored.

The query matrix is `ray.put` once and resolved in the actor's __init__.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // len(batch)
    return flat.reshape(len(batch), dim)


class CosineScorer:
    """Map stage (task instance or actor): per-batch cosine scores vs the
    broadcast query vector(s), emitting the batch-local top-k only (partial
    top-k combiner). The query ships once — in the serialized instance
    (task mode) or via ray.put ref resolved in __init__ (actor mode)."""

    def __init__(self, query_ref, k: int, id_col: str, col: str):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.q = np.asarray(q, dtype=np.float64)
        self.qn = self.q / np.linalg.norm(self.q)
        self.k = k
        self.id_col = id_col
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.col)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        scores = (m @ self.qn) / norms
        k = min(self.k, len(scores))
        idx = np.argpartition(-scores, k - 1)[:k]
        return pa.table({
            self.id_col: batch[self.id_col].take(pa.array(idx)),
            "score": pa.array(scores[idx], pa.float64()),
        })


def topk_cosine(ds, k: int = 20, id_col: str = "vec_id",
                col: str = "embedding", query: np.ndarray | None = None,
                concurrency: int = 2):
    """Brute-force cosine top-k. Default query = the embedding of the
    smallest id (deterministic).

    Per-batch partial top-k (the combiner) → driver-side merge of the
    ≤ k × #batches candidate rows (tiny) — no distributed sort; the
    shuffle a `ds.sort().limit(k)` would do is pure overhead for top-k."""
    if query is None:
        first = ds.sort(id_col).limit(1).take_all()[0]
        query = np.asarray(first[col], dtype=np.float64)
    partials = ds.map_batches(CosineScorer(query, k, id_col, col),
                              batch_format="pyarrow")
    rows = partials.take_all()
    ids = np.array([r[id_col] for r in rows])
    scores = np.array([r["score"] for r in rows], dtype=np.float64)
    order = np.lexsort((ids, -scores))[:k]
    return pa.table({
        id_col: pa.array(ids[order].tolist()),
        "score": pa.array(np.round(scores[order], 6), pa.float64()),
    })


class NearDupPairScorer:
    """Actor stage: exact all-pairs cosine — each batch is scored against
    the FULL broadcast matrix (ray.put once, resolved in __init__), emitting
    (a, b, score) pairs with a < b and score >= threshold. The scalable
    brute-force shape: O(batch × N) matmul per task, no shuffle."""

    def __init__(self, mat_ref, ids_ref, threshold: float, id_col: str,
                 col: str):
        m = ray.get(mat_ref) if isinstance(mat_ref, ray.ObjectRef) else mat_ref
        ids = ray.get(ids_ref) if isinstance(ids_ref, ray.ObjectRef) else ids_ref
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        self.mn = m / norms
        self.all_ids = np.asarray(ids, dtype=np.int64)
        self.threshold = threshold
        self.id_col = id_col
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.col)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        scores = (m / norms) @ self.mn.T                  # batch × N
        bid = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ii, jj = np.nonzero(scores >= self.threshold)
        a, b = bid[ii], self.all_ids[jj]
        keep = a < b                                      # dedupe + no self
        return pa.table({
            "a": pa.array(a[keep]),
            "b": pa.array(b[keep]),
            "score": pa.array(np.round(scores[ii, jj][keep], 6), pa.float64()),
        })


#: rows above which the exact broadcast-matrix path auto-switches to the
#: LSH-bucketed path: 500k × 128-dim float64 ≈ 0.5 GB broadcast matrix —
#: the last size where shipping the whole side to every scorer beats the
#: t×-duplication shuffle. Same dual-path rule as dedup.minhash_lsh_dedup.
EXACT_PAIRS_MAX_ROWS = 500_000


def neardup_pairs_exact(ds, threshold: float = 0.4, id_col: str = "vec_id",
                        col: str = "embedding", concurrency=2,
                        exact_max_rows: int = EXACT_PAIRS_MAX_ROWS):
    """Exact embedding-cosine near-duplicate pairs (a < b, score ≥ τ).

    The full matrix is broadcast — the small-scale oracle path that
    matches the DuckDB self-join bit-for-bit. Above exact_max_rows the
    driver-side take_all + N×d broadcast stops being a sane shape, so the
    call AUTO-SWITCHES to lsh_neardup_pairs (the 100 TB path; recall
    characteristics documented there). Pass exact_max_rows=None to force
    the exact path regardless of size."""
    if exact_max_rows is not None:
        n = ds.count()
        if n > exact_max_rows:
            return lsh_neardup_pairs(ds, threshold=threshold,
                                     id_col=id_col, col=col)
    rows = ds.select_columns([id_col, col]).take_all()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r[col] for r in rows], dtype=np.float64)
    order = np.argsort(ids, kind="stable")  # driver-side: cheaper than a
    ids, mat = ids[order], mat[order]       # distributed sort pre-take_all
    mref, iref = ray.put(mat), ray.put(ids)
    return ds.map_batches(
        NearDupPairScorer, fn_constructor_args=(mref, iref, threshold,
                                                id_col, col),
        batch_format="pyarrow", concurrency=concurrency)


class PairBucketStage:
    """Multi-table hyperplane-LSH bucketing for PAIR generation: each row is
    emitted once per hash table with gkey = (table << n_planes) | bucket.
    The t× row duplication is the price of recall — it shuffles ids +
    embeddings, never the corpus² pair space."""

    def __init__(self, dim: int, n_planes: int, n_tables: int, id_col: str,
                 col: str, seed: int = 13):
        rng = np.random.RandomState(seed)
        # (tables, dim, planes) — built once per task/actor instance
        self.planes = rng.normal(size=(n_tables, dim, n_planes))
        self.n_planes = n_planes
        self.n_tables = n_tables
        self.id_col = id_col
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.col)
        n = len(m)
        weights = 1 << np.arange(self.n_planes)
        gkeys = np.empty((self.n_tables, n), dtype=np.int64)
        for t in range(self.n_tables):
            bits = (m @ self.planes[t]) > 0
            gkeys[t] = (t << self.n_planes) | (bits @ weights)
        idx = pa.array(np.tile(np.arange(n), self.n_tables), pa.int64())
        ids = batch[self.id_col]
        emb = batch[self.col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        return pa.table({
            "gkey": pa.array(gkeys.ravel()),
            self.id_col: ids.take(idx),
            self.col: emb.take(idx),
        })


def _score_bucket(group: pa.Table, threshold: float, id_col: str, col: str,
                  block: int = 4096) -> pa.Table:
    """Exact all-pairs cosine WITHIN one LSH bucket (a < b, score ≥ τ).
    Blockwise so a pathological hot bucket stays memory-bounded."""
    n = group.num_rows
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "score": pa.array([], pa.float64())})
    if n < 2:
        return empty
    m = _batch_matrix(group, col)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mn = m / norms
    ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    outs = []
    for lo in range(0, n, block):
        hi = min(n, lo + block)
        scores = mn[lo:hi] @ mn.T                      # block × n
        ii, jj = np.nonzero(scores >= threshold)
        a, b = ids[lo + ii], ids[jj]
        keep = a < b
        if keep.any():
            outs.append((a[keep], b[keep],
                         np.round(scores[ii, jj][keep], 6)))
    if not outs:
        return empty
    return pa.table({
        "a": pa.array(np.concatenate([o[0] for o in outs])),
        "b": pa.array(np.concatenate([o[1] for o in outs])),
        "score": pa.array(np.concatenate([o[2] for o in outs]),
                          pa.float64()),
    })


def lsh_neardup_pairs(ds, threshold: float = 0.4, id_col: str = "vec_id",
                      col: str = "embedding", n_planes: int = 4,
                      n_tables: int = 16, dim: int | None = None,
                      driver_threshold: int = 5_000_000):
    """Distributed near-duplicate pair generation — the 100 TB shape.

    bucket (t tables × 2^p buckets, map_batches) → groupby(gkey) →
    within-bucket exact scoring (blockwise matmul) → per-(a,b) dedupe
    across tables (min(score); scores are equal, min is just the combiner).
    NOTHING materializes the corpus on the driver: the only driver read is
    one row to learn the embedding dim, and the all-to-all moves t× the
    corpus once — not the O(N²) pair space.

    Approximate by construction: a pair at exactly τ=0.4 (angle ≈ 66°,
    per-bit agreement ≈ 0.63) collides in ≥1 of 16 4-plane tables w.p.
    ≈ 0.94; higher-similarity pairs approach 1. Tune (n_planes, n_tables)
    per workload; the exact broadcast path (neardup_pairs_exact) remains
    the small-scale oracle. Recall is pinned by a unit test."""
    if dim is None:
        first = ds.limit(1).take_all()[0]
        dim = len(first[col])
    bucketed = ds.map_batches(
        PairBucketStage(dim, n_planes, n_tables, id_col, col),
        batch_format="pyarrow")
    pairs = bucketed.groupby("gkey").map_groups(
        lambda g: _score_bucket(g, threshold, id_col, col),
        batch_format="pyarrow")
    # dedupe pairs found in several tables. Near-dup pairs are sparse —
    # below the threshold one driver pass replaces a whole sort shuffle;
    # above it, a hash-partitioned distributed dedupe (same dual-path rule
    # as dedup.minhash_lsh_dedup).
    from ..stages.dedup import _materialize_nonempty
    i64, f64 = pa.int64(), pa.float64()
    pairs, n_pairs = _materialize_nonempty(
        pairs, [("a", i64), ("b", i64), ("score", f64)])
    if n_pairs <= driver_threshold:
        tbl = pa.concat_tables(ray.get(pairs.materialize().to_arrow_refs()))
        df = tbl.to_pandas().drop_duplicates(["a", "b"])
        import ray.data as rd
        return rd.from_arrow(pa.Table.from_pandas(df.reset_index(drop=True),
                                                  preserve_index=False))
    from ray.data.aggregate import Min
    out = pairs.groupby(["a", "b"]).aggregate(Min("score"))

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["a", "b", "score"])
    return out.map_batches(rename, batch_format="pyarrow")


class HyperplaneHasher:
    """Random-hyperplane signatures (deterministic seed) for cosine LSH."""

    def __init__(self, dim: int, n_planes: int = 16, seed: int = 13):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(dim, n_planes))

    def bucket(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes) > 0
        return (bits @ (1 << np.arange(bits.shape[1]))).astype(np.int64)


class LshBucketStage:
    def __init__(self, dim: int, n_planes: int, id_col: str, col: str):
        self.h = HyperplaneHasher(dim, n_planes)
        self.id_col = id_col
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.col)
        return batch.append_column("bucket", pa.array(self.h.bucket(m)))


def lsh_topk_cosine(ds, k: int = 20, id_col: str = "vec_id",
                    col: str = "embedding", n_planes: int = 8,
                    query: np.ndarray | None = None, concurrency: int = 2,
                    n_probes: int = 1):
    """Scale path: score only rows whose LSH bucket is within the probe
    set of the query's bucket. n_probes=1 checks the exact bucket;
    n_probes=p additionally probes the buckets reachable by flipping the
    p-1 hyperplane bits CLOSEST to the query (standard multi-probe LSH,
    Lv et al. 2007) — recall rises steeply with a few probes while the
    candidate set stays a tiny fraction of the corpus."""
    if query is None:
        first = ds.sort(id_col).limit(1).take_all()[0]
        query = np.asarray(first[col], dtype=np.float64)
    dim = len(query)
    hasher = HyperplaneHasher(dim, n_planes)
    qbucket = int(hasher.bucket(query.reshape(1, -1))[0])
    probes = [qbucket]
    if n_probes > 1:
        # flip bits in order of |projection| — the planes the query sits
        # closest to are the likeliest to disagree for true neighbors
        proj = (query @ hasher.planes).ravel()
        order = np.argsort(np.abs(proj))
        for bit in order[:max(0, n_probes - 1)]:
            probes.append(qbucket ^ (1 << int(bit)))
    bucketed = ds.map_batches(
        LshBucketStage, fn_constructor_args=(dim, n_planes, id_col, col),
        batch_format="pyarrow", concurrency=concurrency)
    pset = pa.array(probes, pa.int64())

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(pc.cast(t["bucket"], pa.int64()),
                                 value_set=pset))
    cand = bucketed.map_batches(keep, batch_format="pyarrow")
    return topk_cosine(cand, k=k, id_col=id_col, col=col, query=query,
                       concurrency=concurrency)


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# --------------------------------------------------------------------------


def train_ivf_centroids(ds, n_lists: int = 16, col: str = "embedding",
                        sample_size: int = 4096, iters: int = 10,
                        seed: int = 29) -> np.ndarray:
    """Coarse quantizer: k-means over a bounded SAMPLE of the corpus
    (standard IVF training — FAISS trains on a subsample too). Only the
    sample (≤ sample_size rows) reaches the driver; deterministic
    (seeded init, fixed iteration count). Returns (n_lists, dim)."""
    sample = ds.limit(sample_size).take_all()
    m = np.asarray([r[col] for r in sample], dtype=np.float64)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cents = m[rng.choice(len(m), size=min(n_lists, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cents.T, axis=1)          # cosine on unit
        for j in range(len(cents)):
            members = m[assign == j]
            if len(members):
                c = members.mean(axis=0)
                cents[j] = c / max(np.linalg.norm(c), 1e-12)
    return cents


class IvfAssignStage:
    """map_batches stage: nearest-centroid list id per vector. Centroids
    ship once (serialized instance / ray.put ref resolved in __init__)."""

    def __init__(self, cents_ref, id_col: str, col: str):
        c = ray.get(cents_ref) if isinstance(cents_ref, ray.ObjectRef) \
            else cents_ref
        self.cents = np.asarray(c, dtype=np.float64)
        self.id_col = id_col
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.col)
        norms = np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        lists = np.argmax((m / norms) @ self.cents.T, axis=1)
        return batch.append_column("ivf_list",
                                   pa.array(lists.astype(np.int64)))


def ivf_topk_cosine(ds, k: int = 20, id_col: str = "vec_id",
                    col: str = "embedding", n_lists: int = 16,
                    n_probes: int = 4, query: np.ndarray | None = None,
                    centroids: np.ndarray | None = None):
    """IVF ANN: assign every vector to its nearest coarse centroid
    (one map_batches pass), then brute-score only the n_probes lists
    closest to the query — the candidate set shrinks ~n_probes/n_lists.
    At 100 TB the assignment column is written once and reused per query
    (the inverted file); here it is computed inline."""
    if query is None:
        first = ds.sort(id_col).limit(1).take_all()[0]
        query = np.asarray(first[col], dtype=np.float64)
    if centroids is None:
        centroids = train_ivf_centroids(ds, n_lists=n_lists, col=col)
    qn = query / max(np.linalg.norm(query), 1e-12)
    probe = np.argsort(-(centroids @ qn))[:n_probes].astype(np.int64)
    assigned = ds.map_batches(IvfAssignStage(centroids, id_col, col),
                              batch_format="pyarrow")
    pset = pa.array(probe)

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["ivf_list"], value_set=pset))
    cand = assigned.map_batches(keep, batch_format="pyarrow")
    return topk_cosine(cand, k=k, id_col=id_col, col=col, query=query)


def cosine_dedup(ds, threshold: float = 0.4, id_col: str = "vec_id",
                 col: str = "embedding", method: str = "exact"):
    """Embedding-cosine near-dup removal: drop every vector that has a
    smaller-id partner with cosine ≥ τ. method='exact' scores all pairs
    (broadcast matrix — verification scale, matches the SQL oracle);
    method='lsh' generates pairs through the distributed bucketed path
    (the 100 TB shape; recall bounded by the LSH table count). Either
    way the drop itself is a distributed anti-join, never a driver set."""
    from .dedup import drop_pair_partners
    pairs = (neardup_pairs_exact(ds, threshold, id_col, col)
             if method == "exact"
             else lsh_neardup_pairs(ds, threshold=threshold,
                                    id_col=id_col, col=col))
    # Arrow's hash join rejects list-typed non-key columns, so the anti-
    # join runs on the id projection; survivors re-attach their embedding
    # downstream with a second (id-keyed) pass over the source when needed.
    return drop_pair_partners(ds.select_columns([id_col]), pairs, id_col)


def sq8_train(ds, col: str = "embedding"):
    """Scalar-quantizer training (FAISS SQ8 analogue): per-dimension
    [min, max] over the corpus — one map_batches pass emitting O(d)
    partials per block, folded streaming on the driver. Returns
    (mins (d,), maxs (d,)) float64."""
    def partial(t: pa.Table) -> pa.Table:
        m = _batch_matrix(t, col)
        return pa.table({
            "dim": pa.array(np.arange(m.shape[1], dtype=np.int64)),
            "lo": pa.array(m.min(axis=0)),
            "hi": pa.array(m.max(axis=0)),
        })

    first = ds.limit(1).take_all()[0][col]
    d = len(first)
    lo = np.full(d, np.inf)
    hi = np.full(d, -np.inf)
    for t in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        if not t.num_rows:
            continue
        dim = t["dim"].to_numpy(zero_copy_only=False)
        np.minimum.at(lo, dim, t["lo"].to_numpy(zero_copy_only=False))
        np.maximum.at(hi, dim, t["hi"].to_numpy(zero_copy_only=False))
    return lo, hi


class Sq8Stage:
    """map_batches stage: embeddings → uint8 codes under broadcast
    per-dim [min, max] (code = round((v-min)/(max-min)·255), clipped)."""

    def __init__(self, lo_ref, hi_ref, id_col: str, col: str):
        self.lo = np.asarray(ray.get(lo_ref) if isinstance(
            lo_ref, ray.ObjectRef) else lo_ref)
        hi = np.asarray(ray.get(hi_ref) if isinstance(
            hi_ref, ray.ObjectRef) else hi_ref)
        self.scale = np.where(hi > self.lo, hi - self.lo, 1.0)
        self.id_col = id_col
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.col)
        codes = np.clip(np.rint((m - self.lo) / self.scale * 255.0),
                        0, 255).astype(np.uint8)
        return pa.table({
            self.id_col: pc.cast(batch[self.id_col], pa.int64()),
            "sq8": pa.array([r.tolist() for r in codes],
                            pa.list_(pa.uint8())),
        })


def sq8_quantize(ds, id_col: str = "vec_id", col: str = "embedding",
                 bounds: tuple | None = None):
    """Train (unless bounds given) + quantize: 4× memory cut for ANN
    shortlists; dequant error ≤ (max-min)/510 per dim by construction
    (pinned by pytest)."""
    if bounds is None:
        bounds = sq8_train(ds, col)
    lo, hi = bounds
    return ds.map_batches(
        Sq8Stage(ray.put(np.asarray(lo)), ray.put(np.asarray(hi)),
                 id_col, col),
        batch_format="pyarrow")
