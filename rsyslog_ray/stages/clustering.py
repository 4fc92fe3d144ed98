"""Distributed k-means over an embedding column + SemDeDup semantic dedup.

- kmeans_fit: Lloyd iterations where each round is ONE map_batches pass
  emitting per-batch partial (cluster, dim) sums/counts, merged by the
  same hash-bucketed combiner the other aggregates use (bucket_merge).
  Only O(k × dim) floats ever reach the driver per round — never the
  corpus. Unit-sphere (spherical) k-means: cosine assignment, centroids
  re-normalized each round, matching the similarity stack's metric.
- assign_clusters: one map_batches pass adding a `cluster` column
  (nearest-centroid by cosine; same kernel as similarity.IvfAssignStage).
- semdedup: SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — cluster the
  embeddings, then inside each cluster drop every vector that has a
  near-identical partner (cosine ≥ 1 - eps). Deviation from the paper's
  keep-farthest-from-centroid tiebreak: we keep the SMALLEST id of each
  ε-ball (the same deterministic, anti-join-friendly rule cosine_dedup
  uses), which keeps the drop SQL-expressible and batch-order-stable.

100 TB shape: k should grow with the corpus (the paper uses clusters of
~10k docs) so the within-cluster pairwise stays bounded at
O(n × cluster_size); assignment and drop are single passes, pair
generation is a groupby(cluster) shuffle of ids+vectors once, and the
drop set travels via the dedup.drop_pair_partners dual path (broadcast
below 5M ids, hash anti-join above).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .similarity import _batch_matrix, _score_bucket


def _unit_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-12)


def _project_materialize(ds, cols: list[str], rows_per_block: int = 65536):
    """Project to the iteration's working columns and materialize ONCE:
    every Lloyd/GD round then re-reads cached blocks from the object
    store instead of re-executing the whole upstream lineage per round
    (the round-3 scale-killer for iterative fits). The projection is
    tiny relative to the corpus (d floats ≪ text); spilling covers the
    rest at 100 TB.

    The projection inherits the upstream block count, which for a small
    feature table means many near-empty blocks — and each iteration pays
    one task per block, so 20 rounds × 64 tiny blocks is pure scheduler
    overhead. Coalesce to ≈rows_per_block rows per block first (a no-op
    at scale, where blocks are already ≥ that).

    An already-materialized input (a caller sharing one feature table
    across fit + apply) skips the second object-store copy: the column
    prune stays lazy over the cached blocks — zero-copy per round."""
    from ray.data.dataset import MaterializedDataset
    if isinstance(ds, MaterializedDataset):
        n, nb = ds.count(), ds.num_blocks()
        target = max(1, -(-n // rows_per_block))
        if target < nb // 2:       # still coalesce pathological splits
            return ds.select_columns(cols).repartition(target) \
                .materialize()
        return ds.select_columns(cols)
    mat = ds.select_columns(cols).materialize()
    n = mat.count()
    nb = mat.num_blocks()
    target = max(1, -(-n // rows_per_block))
    if target < nb // 2:
        mat = mat.repartition(target).materialize()
    return mat


def kmeans_fit(ds, k: int = 8, col: str = "embedding", iters: int = 5,
               seed: int = 37, init_sample: int = 4096,
               ndp: int = 7, fold: str = "driver") -> np.ndarray:
    """Spherical k-means. Init = seeded choice from a bounded sample
    (≤ init_sample rows reach the driver — same bound as IVF training);
    every Lloyd round is a full distributed pass of per-batch partial
    (cluster, dim) sums. The round fold is dual-path:
      fold='driver' (default): stream the k×dim-per-block partials to
        the driver and np.add.at-accumulate — no shuffle per round;
        driver traffic is O(n_blocks × k × dim) doubles, fine up to
        ~10M k·d·blocks (k=64, d=64 → 4096 doubles/block).
      fold='bucket': hash-bucketed distributed merge (bucket_merge) —
        only O(k × dim) reaches the driver; pick this when k×dim is
        large or block counts reach 100 TB territory.
    Centroids are rounded to `ndp` dp each round so the result is
    bit-stable under any batch split / fold order (float addition is
    order-sensitive; an ulp of jitter must not flip an assignment).
    The embedding projection materializes once up front, so the upstream
    lineage executes exactly once regardless of `iters`.
    Returns (k, dim) unit-norm float64."""
    ds = _project_materialize(ds, [col])
    sample = ds.limit(init_sample).take_all()
    sm = _unit_rows(np.asarray([r[col] for r in sample], dtype=np.float64))
    # lexicographically sort the sample before the seeded choice: block
    # arrival order (streaming/materialize completion order) is
    # nondeterministic and must not leak into the init (bit-stability
    # contract) — sorting makes init a pure function of the sample SET
    sm = sm[np.lexsort(sm.T[::-1])]
    rng = np.random.RandomState(seed)
    cents = sm[rng.choice(len(sm), size=min(k, len(sm)), replace=False)]
    cents = np.round(cents, ndp)

    for _ in range(iters):
        ref = ray.put(cents)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            m = _batch_matrix(t, col)
            mu = _unit_rows(m)
            assign = np.argmax(mu @ c.T, axis=1)
            kk, dims = c.shape
            sums = np.zeros((kk, dims))
            np.add.at(sums, assign, m)
            cnt = np.bincount(assign, minlength=kk).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.repeat(np.arange(kk), dims)),
                "dim": pa.array(np.tile(np.arange(dims), kk)),
                "s": pa.array(sums.ravel()),
                "n": pa.array(np.repeat(cnt, dims)),
            })

        partials = ds.map_batches(partial, batch_format="pyarrow")
        sums = np.zeros_like(cents)
        cnts = np.zeros(len(cents), dtype=np.int64)
        if fold == "driver":
            for tbl in partials.iter_batches(batch_format="pyarrow"):
                if not tbl.num_rows:
                    continue
                cl = tbl["cluster"].to_numpy(zero_copy_only=False)
                dm = tbl["dim"].to_numpy(zero_copy_only=False)
                np.add.at(sums, (cl, dm),
                          tbl["s"].to_numpy(zero_copy_only=False))
                d0 = dm == 0
                np.add.at(cnts, cl[d0],
                          tbl["n"].to_numpy(zero_copy_only=False)[d0])
        else:
            from .aggregate import bucket_merge
            merged = bucket_merge(partials, ["cluster", "dim"],
                                  {"s": ("s", "sum"), "n": ("n", "sum")})
            tbl = pa.concat_tables(
                [t for t in ray.get(merged.materialize().to_arrow_refs()) if t.num_rows],
                promote_options="default")
            cl = tbl["cluster"].to_numpy(zero_copy_only=False)
            dm = tbl["dim"].to_numpy(zero_copy_only=False)
            sums[cl, dm] = tbl["s"].to_numpy(zero_copy_only=False)
            d0 = dm == 0
            cnts[cl[d0]] = tbl["n"].to_numpy(zero_copy_only=False)[d0]
        new = cents.copy()
        nz = cnts > 0
        new[nz] = _unit_rows(sums[nz] / cnts[nz, None])
        cents = np.round(new, ndp)
    return cents


class ClusterAssignStage:
    """map_batches stage: nearest-centroid cluster id per vector (cosine).
    Centroids ship once in the serialized instance / via ray.put."""

    def __init__(self, cents_ref, col: str, out_col: str = "cluster"):
        c = ray.get(cents_ref) if isinstance(cents_ref, ray.ObjectRef) \
            else cents_ref
        self.cents = np.asarray(c, dtype=np.float64)
        self.col = col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mu = _unit_rows(_batch_matrix(batch, self.col))
        a = np.argmax(mu @ self.cents.T, axis=1)
        return batch.append_column(self.out_col,
                                   pa.array(a.astype(np.int64)))


def assign_clusters(ds, centroids: np.ndarray, col: str = "embedding",
                    out_col: str = "cluster"):
    return ds.map_batches(ClusterAssignStage(centroids, col, out_col),
                          batch_format="pyarrow")


def kmeans_cluster_stats(ds, k: int = 8, col: str = "embedding",
                         iters: int = 5, seed: int = 37, ndp: int = 7,
                         fold: str = "driver"):
    """Fit + one assign pass + per-cluster (size, mean cosine to own
    centroid) — the quality readout. Partial (count, sum-cos) per batch
    (k rows each), folded on the driver (streaming, O(k) memory; same
    dual-path note as kmeans_fit — only k rows per block here, so the
    driver fold holds to far larger block counts)."""
    cents = kmeans_fit(ds, k=k, col=col, iters=iters, seed=seed, fold=fold)
    ref = ray.put(cents)

    def partial(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        mu = _unit_rows(_batch_matrix(t, col))
        sims = mu @ c.T
        assign = np.argmax(sims, axis=1)
        best = sims[np.arange(len(assign)), assign]
        kk = len(c)
        return pa.table({
            "cluster": pa.array(np.arange(kk, dtype=np.int64)),
            "n": pa.array(np.bincount(assign, minlength=kk).astype(np.int64)),
            "s": pa.array(np.bincount(assign, weights=best, minlength=kk)),
        })

    n_tot = np.zeros(len(cents), np.int64)
    s_tot = np.zeros(len(cents))
    for tbl in ds.map_batches(partial, batch_format="pyarrow") \
                 .iter_batches(batch_format="pyarrow"):
        if not tbl.num_rows:
            continue
        cl = tbl["cluster"].to_numpy(zero_copy_only=False)
        np.add.at(n_tot, cl, tbl["n"].to_numpy(zero_copy_only=False))
        np.add.at(s_tot, cl, tbl["s"].to_numpy(zero_copy_only=False))
    mean = np.where(n_tot > 0, s_tot / np.maximum(n_tot, 1), 0.0)
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "cluster": pa.array(np.arange(len(cents), dtype=np.int64)),
        "n": pa.array(n_tot),
        "mean_cos": pa.array(np.round(mean, ndp), pa.float64()),
    }))


def semdedup_pairs(ds, k: int = 8, eps: float = 0.05,
                   id_col: str = "vec_id", col: str = "embedding",
                   iters: int = 5, seed: int = 37,
                   centroids: np.ndarray | None = None):
    """(a, b) pairs with cosine ≥ 1-eps INSIDE a shared k-means cluster,
    a < b. groupby(cluster) moves each vector once; within-cluster
    scoring reuses the blockwise LSH-bucket kernel (memory-bounded)."""
    if centroids is None:
        centroids = kmeans_fit(ds, k=k, col=col, iters=iters, seed=seed)
    assigned = assign_clusters(ds, centroids, col=col)
    thr = 1.0 - eps
    return assigned.groupby("cluster").map_groups(
        lambda g: _score_bucket(g, thr, id_col, col),
        batch_format="pyarrow")


def semdedup(ds, k: int = 8, eps: float = 0.05, id_col: str = "vec_id",
             col: str = "embedding", iters: int = 5, seed: int = 37):
    """SemDeDup: drop every vector with a smaller-id ε-near partner in its
    cluster. Returns the surviving id projection (embedding re-attaches
    via an id-keyed join downstream when needed — Arrow's hash join
    rejects list payload columns, same note as cosine_dedup)."""
    from .dedup import drop_pair_partners
    pairs = semdedup_pairs(ds, k=k, eps=eps, id_col=id_col, col=col,
                           iters=iters, seed=seed)
    return drop_pair_partners(ds.select_columns([id_col]), pairs, id_col)


def pca_fit(ds, col: str = "embedding", n_components: int = 8,
            ndp: int = 9):
    """Distributed PCA: ONE map_batches pass emits per-batch second-moment
    partials (dim×dim Gram matrix + mean vector + count — O(d²) floats per
    block, independent of rows); the driver folds them streaming, forms
    the covariance, and runs np.linalg.eigh on the d×d matrix (d is
    embedding width — hundreds — so the eig is trivial driver work).
    Sign convention: each component's largest-|loading| coordinate is
    made positive (eigenvector sign is arbitrary); rounded to `ndp` so
    results are stable across batch splits. Returns (components
    (n_components, d) float64, mean (d,), explained_var (n_components,))."""
    def partial(t: pa.Table) -> pa.Table:
        m = _batch_matrix(t, col)
        g = m.T @ m
        return pa.table({
            "i": pa.array(np.repeat(np.arange(g.shape[0]), g.shape[1])),
            "j": pa.array(np.tile(np.arange(g.shape[1]), g.shape[0])),
            "g": pa.array(g.ravel()),
            "s": pa.array(np.repeat(m.sum(axis=0), g.shape[1])),
            "n": pa.array(np.repeat(np.int64(len(m)), g.size)),
        })

    # dimension from one row (iter_batches may split a block's d² rows,
    # so it cannot be inferred from a yielded batch)
    d = len(ds.limit(1).take_all()[0][col])
    gram = np.zeros((d, d))
    ssum = np.zeros(d)
    n_tot = 0
    for t in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        if not t.num_rows:
            continue
        i = t["i"].to_numpy(zero_copy_only=False)
        j = t["j"].to_numpy(zero_copy_only=False)
        np.add.at(gram, (i, j), t["g"].to_numpy(zero_copy_only=False))
        jz = j == 0
        np.add.at(ssum, i[jz], t["s"].to_numpy(zero_copy_only=False)[jz])
        # each source block contributes exactly one (i=0, j=0) row, so
        # this count survives iter_batches splitting/coalescing
        z = jz & (i == 0)
        n_tot += int(t["n"].to_numpy(zero_copy_only=False)[z].sum())
    mean = ssum / n_tot
    cov = gram / n_tot - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:n_components]
    comps = v[:, order].T
    for r in range(comps.shape[0]):          # deterministic sign
        mx = np.argmax(np.abs(comps[r]))
        if comps[r, mx] < 0:
            comps[r] = -comps[r]
    return (np.round(comps, ndp), np.round(mean, ndp),
            np.round(np.maximum(w[order], 0.0), ndp))


class PcaTransformStage:
    """map_batches stage: project embeddings onto broadcast components."""

    def __init__(self, comps_ref, mean_ref, id_col: str, col: str,
                 ndp: int = 6):
        self.comps = np.asarray(ray.get(comps_ref) if isinstance(
            comps_ref, ray.ObjectRef) else comps_ref)
        self.mean = np.asarray(ray.get(mean_ref) if isinstance(
            mean_ref, ray.ObjectRef) else mean_ref)
        self.id_col = id_col
        self.col = col
        self.ndp = ndp

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.col)
        proj = np.round((m - self.mean) @ self.comps.T, self.ndp)
        return pa.table({
            self.id_col: pc.cast(batch[self.id_col], pa.int64()),
            "pca": pa.array([r.tolist() for r in proj],
                            pa.list_(pa.float64())),
        })


def pca_transform(ds, components: np.ndarray, mean: np.ndarray,
                  id_col: str = "vec_id", col: str = "embedding"):
    return ds.map_batches(
        PcaTransformStage(ray.put(components), ray.put(mean), id_col, col),
        batch_format="pyarrow")


def logreg_fit(ds, feature_cols: list[str], label_col: str,
               lr: float = 0.5, iters: int = 50, l2: float = 1e-3,
               standardize: bool = True, ndp: int = 9) -> pa.Table:
    """Distributed full-batch logistic regression — the linear
    quality-classifier trainer (the fastText-classifier shape on
    engineered features): every iteration is ONE map_batches pass
    emitting per-block gradient partials Xᵀ(σ(Xw+b)−y) (O(d+1) doubles
    per block — independent of rows); the driver sums partials and takes
    a gradient step with L2 on the weights. One extra first pass folds
    per-feature (n, Σx, Σx²) moments when `standardize` (z-scaling makes
    one global lr workable). Gradients round to `ndp` dp per round so
    the fit is bit-stable under any batch split (same convention as
    kmeans_fit). Returns a (feature, weight) table: standardized-space
    coefficients folded back to RAW-feature scale, plus '_intercept'.

    At 100 TB: driver traffic per round is O(n_blocks × d) doubles; for
    huge d switch the fold to bucket_merge like kmeans_fit (not needed
    for engineered quality features, d ≈ dozens). The feature projection
    materializes once up front, so the upstream lineage executes exactly
    once regardless of `iters`."""
    ds = _project_materialize(ds, [*feature_cols, label_col])
    d = len(feature_cols)

    def matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        x = np.stack([pc.cast(t[c], pa.float64())
                      .to_numpy(zero_copy_only=False)
                      for c in feature_cols], axis=1)
        y = pc.cast(t[label_col], pa.float64()) \
            .to_numpy(zero_copy_only=False)
        return x, y

    if standardize:
        def moments(t: pa.Table) -> pa.Table:
            x, _ = matrix(t)
            return pa.table({
                "n": pa.array([float(len(x))]),
                "s": pa.array([x.sum(axis=0).tolist()]),
                "ss": pa.array([(x * x).sum(axis=0).tolist()]),
            })
        n_tot, s, ss = 0.0, np.zeros(d), np.zeros(d)
        for b in ds.map_batches(moments, batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
            n_tot += float(np.sum(b["n"].to_numpy(zero_copy_only=False)))
            s += np.sum(np.asarray(b["s"].to_pylist(), dtype=np.float64),
                        axis=0)
            ss += np.sum(np.asarray(b["ss"].to_pylist(), dtype=np.float64),
                         axis=0)
        mean = np.round(s / max(n_tot, 1.0), ndp)
        var = np.maximum(ss / max(n_tot, 1.0) - mean ** 2, 1e-12)
        std = np.round(np.sqrt(var), ndp)
    else:
        n_cnt = ds.count()
        n_tot = float(n_cnt)
        mean, std = np.zeros(d), np.ones(d)

    w = np.zeros(d)
    b0 = 0.0
    for _ in range(iters):
        ref = ray.put((w, b0, mean, std))

        def grad_partial(t: pa.Table, _ref=ref) -> pa.Table:
            ww, bb, mu, sd = ray.get(_ref)
            x, y = matrix(t)
            xs = (x - mu) / sd
            z = xs @ ww + bb
            p = 1.0 / (1.0 + np.exp(-np.clip(z, -35, 35)))
            e = p - y
            return pa.table({
                "gw": pa.array([(xs * e[:, None]).sum(axis=0).tolist()]),
                "gb": pa.array([float(e.sum())]),
            })

        gw, gb = np.zeros(d), 0.0
        for bt in ds.map_batches(grad_partial, batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
            gw += np.sum(np.asarray(bt["gw"].to_pylist(),
                                    dtype=np.float64), axis=0)
            gb += float(np.sum(bt["gb"].to_numpy(zero_copy_only=False)))
        gw = np.round(gw / n_tot + l2 * w, ndp)
        gb = round(gb / n_tot, ndp)
        w = np.round(w - lr * gw, ndp)
        b0 = round(b0 - lr * gb, ndp)

    # fold standardization back into raw-feature coefficients
    w_raw = w / std
    b_raw = b0 - float((w * mean / std).sum())
    return pa.table({
        "feature": pa.array(list(feature_cols) + ["_intercept"],
                            pa.string()),
        "weight": pa.array(np.round(np.append(w_raw, b_raw), ndp),
                           pa.float64()),
    })


def logreg_apply(ds, weights: pa.Table, feature_cols: list[str],
                 threshold: float = 0.5, score_col: str = "score",
                 keep: bool | None = True, ndp: int = 6):
    """Model-based corpus filtering — the apply half of the GPT-3 /
    CCNet quality-classifier stage (logreg_fit trains, this scores and
    filters): the (feature, weight) table broadcasts via ray.put ONCE
    (read per task, never re-shipped); each batch is one vectorized
    sigmoid over the raw feature matrix. keep=True keeps rows with
    score ≥ threshold, keep=False the complement (inspection of the
    rejects), keep=None skips filtering and just appends `score_col`.
    Scores round to ndp dp so results are batch-split invariant. No
    shuffle — embarrassingly parallel over blocks at any scale."""
    wmap = dict(zip(weights["feature"].to_pylist(),
                    weights["weight"].to_pylist()))
    w = np.array([wmap[c] for c in feature_cols], np.float64)
    b = float(wmap.get("_intercept", 0.0))
    ref = ray.put((w, b))

    def score(t: pa.Table) -> pa.Table:
        ww, bb = ray.get(ref) if isinstance(ref, ray.ObjectRef) \
            else (w, b)
        x = np.stack([pc.cast(t[c], pa.float64())
                      .to_numpy(zero_copy_only=False)
                      for c in feature_cols], axis=1)
        z = x @ ww + bb
        p = np.round(1.0 / (1.0 + np.exp(-np.clip(z, -35, 35))), ndp)
        out = t.append_column(score_col, pa.array(p, pa.float64()))
        if keep is None:
            return out
        m = p >= threshold if keep else p < threshold
        return out.filter(pa.array(m))
    return ds.map_batches(score, batch_format="pyarrow")
