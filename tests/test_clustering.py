"""Distributed k-means + SemDeDup vs in-process numpy oracles."""

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from rsyslog_ray.stages.clustering import (assign_clusters, kmeans_fit,
                                           kmeans_cluster_stats, semdedup,
                                           semdedup_pairs)


def _vecs(n=240, dim=12, seed=11, n_dups=6):
    """Gaussian blobs around 4 anchors + planted near-identical pairs."""
    rng = np.random.RandomState(seed)
    anchors = rng.normal(size=(4, dim)) * 3.0
    m = anchors[rng.randint(0, 4, size=n)] + rng.normal(size=(n, dim))
    for i in range(n_dups):           # vec 2i+1 ≈ vec 2i (cosine ≈ 1)
        m[2 * i + 1] = m[2 * i] + rng.normal(scale=1e-3, size=dim)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([r.astype(np.float32).tolist() for r in m],
                              pa.list_(pa.float32())),
    })
    return tbl, m.astype(np.float32).astype(np.float64)


def _py_kmeans(m, k, iters, seed, ndp=7):
    """Oracle: same algorithm, single process (init from the ≤4096-row
    sample = whole fixture, lexsorted like kmeans_fit so block arrival
    order can't leak in; full-data Lloyd; same per-round rounding)."""
    mu = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    srt = mu[np.lexsort(mu.T[::-1])]
    rng = np.random.RandomState(seed)
    cents = np.round(srt[rng.choice(len(srt), size=k, replace=False)], ndp)
    for _ in range(iters):
        assign = np.argmax(mu @ cents.T, axis=1)
        new = cents.copy()
        for j in range(k):
            members = m[assign == j]
            if len(members):
                c = members.mean(axis=0)
                new[j] = c / max(np.linalg.norm(c), 1e-12)
        cents = np.round(new, ndp)
    return cents, np.argmax(mu @ cents.T, axis=1)


def test_kmeans_fit_matches_numpy_oracle(ray_session):
    tbl, m = _vecs()
    ds = rd.from_arrow(tbl).repartition(5)   # several batches → real fold
    cents = kmeans_fit(ds, k=4, iters=4, seed=5)
    ocents, oassign = _py_kmeans(m, 4, 4, 5)
    assert cents.shape == ocents.shape
    np.testing.assert_allclose(cents, ocents, atol=2e-7)
    # distributed bucket_merge fold path agrees with the driver fold
    cents_b = kmeans_fit(ds, k=4, iters=4, seed=5, fold="bucket")
    np.testing.assert_allclose(cents_b, cents, atol=2e-7)
    got = pa.concat_tables(
        ray.get(assign_clusters(ds, cents).to_arrow_refs())
    ).sort_by("vec_id")["cluster"].to_numpy(zero_copy_only=False)
    assert (got == oassign).all()


def test_kmeans_cluster_stats_sizes(ray_session):
    tbl, m = _vecs()
    ds = rd.from_arrow(tbl).repartition(4)
    t = pa.concat_tables(
        [x for x in ray.get(kmeans_cluster_stats(
            ds, k=4, iters=4, seed=5).to_arrow_refs()) if x.num_rows],
        promote_options="default").sort_by("cluster")
    _, oassign = _py_kmeans(m, 4, 4, 5)
    sizes = np.bincount(oassign, minlength=4)
    assert t["n"].to_pylist() == sizes.tolist()
    assert t.num_rows == 4
    assert all(0.0 <= c <= 1.0 for c in t["mean_cos"].to_pylist())


def test_semdedup_drops_planted_dups(ray_session):
    tbl, m = _vecs()
    ds = rd.from_arrow(tbl).repartition(5)
    surv = pa.concat_tables(
        [x for x in ray.get(semdedup(
            ds, k=4, eps=0.01, iters=4, seed=5).to_arrow_refs())
         if x.num_rows], promote_options="default")
    ids = set(surv["vec_id"].to_pylist())
    # oracle: same clusters, drop larger id of each within-cluster pair
    cents, assign = _py_kmeans(m, 4, 4, 5)
    mu = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    drop = set()
    for c in range(4):
        idx = np.nonzero(assign == c)[0]
        s = mu[idx] @ mu[idx].T
        ii, jj = np.nonzero(s >= 0.99)
        for a, b in zip(idx[ii], idx[jj]):
            if a < b:
                drop.add(int(b))
    assert ids == set(range(len(m))) - drop
    # every planted even/odd twin pair lost exactly its odd member
    for i in range(6):
        assert 2 * i in ids and (2 * i + 1) not in ids


def test_semdedup_pairs_symmetric_free_and_thresholded(ray_session):
    tbl, m = _vecs()
    ds = rd.from_arrow(tbl)
    pairs = pa.concat_tables(
        [x for x in ray.get(semdedup_pairs(
            ds, k=4, eps=0.01, iters=4, seed=5).to_arrow_refs())
         if x.num_rows], promote_options="default")
    a = pairs["a"].to_numpy(zero_copy_only=False)
    b = pairs["b"].to_numpy(zero_copy_only=False)
    sc = pairs["score"].to_numpy(zero_copy_only=False)
    assert (a < b).all() and (sc >= 0.99 - 1e-9).all()


def test_pca_matches_numpy(ray_session):
    from rsyslog_ray.stages.clustering import pca_fit, pca_transform
    rng = np.random.RandomState(21)
    # anisotropic cloud: PCA directions are well separated
    basis = rng.normal(size=(12, 12))
    scales = np.linspace(5, 0.1, 12)
    m = (rng.normal(size=(300, 12)) * scales) @ basis
    tbl = pa.table({
        "vec_id": pa.array(range(300), pa.int64()),
        "embedding": pa.array([r.tolist() for r in m.astype(np.float64)],
                              pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(tbl).repartition(6)
    comps, mean, ev = pca_fit(ds, n_components=4)
    # numpy oracle
    mu = m.mean(axis=0)
    cov = (m - mu).T @ (m - mu) / len(m)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:4]
    ocomps = v[:, order].T
    for r in range(4):
        mx = np.argmax(np.abs(ocomps[r]))
        if ocomps[r, mx] < 0:
            ocomps[r] = -ocomps[r]
    np.testing.assert_allclose(mean, mu, atol=1e-6)
    np.testing.assert_allclose(ev, np.maximum(w[order], 0), rtol=1e-6)
    np.testing.assert_allclose(comps, ocomps, atol=1e-6)
    assert ev[0] > ev[1] > ev[2]
    # transform: projections match, partition-invariant
    got = {r["vec_id"]: r["pca"] for r in
           pca_transform(ds, comps, mean).take_all()}
    want = np.round((m - mean) @ comps.T, 6)
    for i in range(300):
        np.testing.assert_allclose(got[i], want[i], atol=1e-9)


def test_sq8_roundtrip_error_bounded(ray_session):
    from rsyslog_ray.stages.similarity import sq8_quantize, sq8_train
    rng = np.random.RandomState(8)
    m = rng.normal(size=(200, 10)) * np.linspace(0.5, 4, 10)
    tbl = pa.table({
        "vec_id": pa.array(range(200), pa.int64()),
        "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(tbl).repartition(4)
    lo, hi = sq8_train(ds)
    np.testing.assert_allclose(lo, m.min(axis=0))
    np.testing.assert_allclose(hi, m.max(axis=0))
    got = {r["vec_id"]: np.asarray(r["sq8"]) for r in
           sq8_quantize(ds, bounds=(lo, hi)).take_all()}
    step = (hi - lo) / 255.0
    for i in range(200):
        deq = lo + got[i] * step
        assert (np.abs(deq - m[i]) <= step / 2 + 1e-12).all()
    # deterministic across partitionings
    got2 = {r["vec_id"]: np.asarray(r["sq8"]) for r in
            sq8_quantize(rd.from_arrow(tbl), bounds=(lo, hi)).take_all()}
    assert all((got[i] == got2[i]).all() for i in range(200))


def test_logreg_matches_numpy_oracle_and_batching(ray_session):
    """Distributed full-batch GD equals a single-machine numpy oracle
    with identical per-round rounding, under any partitioning; the fit
    separates a separable fixture."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rsyslog_ray.stages.clustering import logreg_fit

    rng = np.random.default_rng(21)
    n, d = 2000, 3
    x = rng.normal(0, 2.0, (n, d)) + np.array([5.0, -2.0, 0.0])
    true_w = np.array([1.5, -2.0, 0.5])
    y = (x @ true_w + 0.5 + rng.normal(0, 0.5, n) > 3.0).astype(np.int64)
    tbl = pa.table({"f0": x[:, 0], "f1": x[:, 1], "f2": x[:, 2],
                    "y": pa.array(y)})

    # numpy oracle with the same standardize + rounding schedule
    ndp, lr, l2, iters = 9, 0.5, 1e-3, 50
    mu = np.round(x.mean(axis=0), ndp)
    sd = np.round(np.sqrt(np.maximum(x.var(axis=0), 1e-12)), ndp)
    xs = (x - mu) / sd
    w, b = np.zeros(d), 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-np.clip(xs @ w + b, -35, 35)))
        gw = np.round((xs * (p - y)[:, None]).sum(axis=0) / n + l2 * w, ndp)
        gb = round(float((p - y).sum()) / n, ndp)
        w = np.round(w - lr * gw, ndp)
        b = round(b - lr * gb, ndp)
    want_w = w / sd
    want_b = b - float((w * mu / sd).sum())

    prev = None
    for nblocks in (1, 7):
        out = logreg_fit(rd.from_arrow(tbl).repartition(nblocks),
                         ["f0", "f1", "f2"], "y",
                         lr=lr, iters=iters, l2=l2) \
            .to_pandas().set_index("feature")["weight"]
        got = out[["f0", "f1", "f2"]].to_numpy()
        assert np.allclose(got, np.round(want_w, ndp), atol=1e-6), nblocks
        assert abs(out["_intercept"] - round(want_b, ndp)) < 1e-6
        if prev is not None:
            assert np.array_equal(got, prev)       # bit-stable
        prev = got
        # the fit actually separates
        p = 1.0 / (1.0 + np.exp(-(x @ got + out["_intercept"])))
        acc = ((p > 0.5).astype(int) == y).mean()
        assert acc > 0.9, acc


def test_iterative_fits_execute_upstream_once(ray_session):
    """Round-4 fix: kmeans_fit / logreg_fit must materialize the projected
    features ONCE — the upstream lineage (here a counting map_batches tap)
    must not re-execute per Lloyd/GD round."""
    from rsyslog_ray.stages.clustering import logreg_fit

    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def inc(self):
            self.n += 1

        def get(self):
            return self.n

    tbl, _ = _vecs()

    def run_kmeans(iters):
        c = Counter.remote()

        def tap(t: pa.Table) -> pa.Table:
            ray.get(c.inc.remote())
            return t
        ds = rd.from_arrow(tbl).map_batches(tap, batch_format="pyarrow")
        kmeans_fit(ds, k=3, iters=iters)
        return ray.get(c.get.remote())

    assert run_kmeans(5) == run_kmeans(1)  # tap count independent of iters

    lr_tbl = pa.table({
        "x1": pa.array(np.linspace(-2, 2, 200)),
        "x2": pa.array(np.linspace(1, -1, 200)),
        "label": pa.array((np.linspace(-2, 2, 200) > 0).astype(np.int64)),
    })

    def run_logreg(iters):
        c = Counter.remote()

        def tap(t: pa.Table) -> pa.Table:
            ray.get(c.inc.remote())
            return t
        ds = rd.from_arrow(lr_tbl).map_batches(tap, batch_format="pyarrow")
        logreg_fit(ds, ["x1", "x2"], "label", iters=iters)
        return ray.get(c.get.remote())

    assert run_logreg(8) == run_logreg(1)


def test_logreg_apply_scores_and_filters(ray_session):
    """Broadcast-apply equals the numpy sigmoid oracle, filters by
    threshold on both sides, and is batch-split invariant."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rsyslog_ray.stages.clustering import logreg_apply

    rng = np.random.default_rng(7)
    n = 500
    x = rng.normal(0, 1.5, (n, 2))
    w = np.array([1.25, -0.75])
    b = 0.3
    weights = pa.table({"feature": ["f0", "f1", "_intercept"],
                        "weight": [1.25, -0.75, 0.3]})
    tbl = pa.table({"doc_id": pa.array(np.arange(n)),
                    "f0": x[:, 0], "f1": x[:, 1]})
    p = np.round(1.0 / (1.0 + np.exp(-np.clip(x @ w + b, -35, 35))), 6)

    ds = rd.from_arrow(tbl).repartition(7)
    got = logreg_apply(ds, weights, ["f0", "f1"], keep=None) \
        .to_pandas().sort_values("doc_id")
    assert np.array_equal(got["score"].to_numpy(), p)

    kept = logreg_apply(ds, weights, ["f0", "f1"], threshold=0.5) \
        .to_pandas()
    assert set(kept["doc_id"]) == set(np.arange(n)[p >= 0.5])
    rej = logreg_apply(ds, weights, ["f0", "f1"], threshold=0.5,
                       keep=False).to_pandas()
    assert set(rej["doc_id"]) == set(np.arange(n)[p < 0.5])
    # batch-split invariance
    one = logreg_apply(rd.from_arrow(tbl), weights, ["f0", "f1"],
                       keep=None).to_pandas().sort_values("doc_id")
    assert np.array_equal(one["score"].to_numpy(),
                          got["score"].to_numpy())


def test_cluster_balanced_sample(ray_session):
    """Fixed-N per-cluster sample: exactly min(n, cluster size) rows per
    cluster, deterministic across partitionings."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rsyslog_ray.stages.clustering import assign_clusters, kmeans_fit
    from rsyslog_ray.stages.sampling import sample_n_per_key

    rng = np.random.default_rng(3)
    # two well-separated blobs on the unit sphere
    a = rng.normal(0, 0.05, (60, 4)) + np.array([1, 0, 0, 0])
    b = rng.normal(0, 0.05, (40, 4)) + np.array([0, 1, 0, 0])
    emb = np.vstack([a, b])
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    tbl = pa.table({"vec_id": pa.array(np.arange(100)),
                    "embedding": pa.array(emb.tolist())})

    def run(nparts):
        ds = rd.from_arrow(tbl).repartition(nparts)
        cents = kmeans_fit(ds, k=2, iters=3)
        assigned = assign_clusters(ds, cents).select_columns(
            ["vec_id", "cluster"])
        out = sample_n_per_key(assigned, key_col="cluster",
                               id_col="vec_id", n=10).to_pandas()
        return out.sort_values("vec_id")

    got = run(5)
    counts = got.groupby("cluster").size()
    assert sorted(counts.to_list()) == [10, 10]
    # the sample is cluster-pure: ids <60 are blob a, >=60 blob b
    by_cl = got.groupby("cluster")["vec_id"].apply(
        lambda s: set(int(v) >= 60 for v in s))
    assert all(len(v) == 1 for v in by_cl)
    # partitioning-invariant
    again = run(2)
    assert got["vec_id"].to_list() == again["vec_id"].to_list()
