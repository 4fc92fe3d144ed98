"""Dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard) and similarity
(brute cosine, LSH, near-dup pairs) vs hand-computed / numpy oracles."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from rsyslog_ray.stages.dedup import (MinHasher, SimHashStage, _shingles,
                                      exact_dedup, minhash_lsh_dedup,
                                      ngram_jaccard, simhash_table)
from rsyslog_ray.stages.similarity import (lsh_topk_cosine,
                                           neardup_pairs_exact, topk_cosine)

BASE = ("the quick brown fox jumps over the lazy dog while the rain "
        "in spain stays mainly in the plain and the cat sat on the mat")


def _doc_table():
    texts = [
        BASE,                                   # 0
        BASE.replace("cat", "bat"),             # 1 near-dup of 0
        BASE,                                   # 2 exact dup of 0
        "completely different text about ray data pipelines and arrow",  # 3
        "another unrelated document with its own words entirely",        # 4
        BASE.replace("dog", "dag"),             # 5 near-dup of 0
    ]
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_exact_dedup_keeps_min_id(ray_session):
    ds = rd.from_arrow(_doc_table())
    kept = sorted(r["doc_id"] for r in exact_dedup(ds).take_all())
    # doc 2 is an exact dup of 0 → dropped; near-dups survive exact dedup
    assert kept == [0, 1, 3, 4, 5]


def test_exact_dedup_by_hash_matches_text_mode(ray_session):
    ds = rd.from_arrow(_doc_table())
    by_text = sorted(r["doc_id"] for r in exact_dedup(ds).take_all())
    by_hash = sorted(r["doc_id"] for r in
                     exact_dedup(ds, by_hash=True).take_all())
    assert by_hash == by_text == [0, 1, 3, 4, 5]


def test_minhash_lsh_drops_near_dups(ray_session):
    ds = rd.from_arrow(_doc_table())
    kept = sorted(r["doc_id"] for r in
                  minhash_lsh_dedup(ds).select_columns(["doc_id"]).take_all())
    assert 0 in kept and 3 in kept and 4 in kept
    assert 2 not in kept            # exact dup always caught
    assert 1 not in kept and 5 not in kept  # near-dups bucket with 0


def test_minhash_stage_matches_per_doc_reference():
    """Round-3 vectorization: the batched windowed-FNV + segmented-min
    path must be bit-identical to signature(_shingles(t)) per doc,
    including the pad-to-k short-doc and empty-doc behaviors."""
    from rsyslog_ray.stages.dedup import MinHashStage
    texts = [BASE, "", "ab", "abcd", "abcde", "exact k!",
             "unicode café naïve 中文 text here",
             BASE.replace("cat", "bat"), "x" * 5, " " * 7, None]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.large_string())})
    stage = MinHashStage(num_perm=32, shingle_k=5)
    got = stage(tbl)["minhash"].to_pylist()
    mh = stage.mh
    for t, sig in zip(texts, got):
        want = mh.signature(_shingles(t or "", 5)).astype(np.int64)
        assert list(want) == sig, repr(t)
    # chunked + sliced input (nonzero array offset) takes the same path
    chunked = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.chunked_array([pa.array(texts[:4], pa.large_string()),
                                  pa.array(texts[4:], pa.large_string())]),
    }).slice(2)
    got2 = stage(chunked)["minhash"].to_pylist()
    assert got2 == got[2:]
    # force the large-batch cache-blocked path (both strategies must be
    # bit-identical; _CHUNK_W tiny so several chunks are exercised)
    stage2 = MinHashStage(num_perm=32, shingle_k=5)
    stage2._FLAT_MAX = 0
    stage2._CHUNK_W = 7
    assert stage2(tbl)["minhash"].to_pylist() == got


def test_minhash_signature_similarity_tracks_jaccard():
    mh = MinHasher(num_perm=128)
    s0 = mh.signature(_shingles(BASE))
    s1 = mh.signature(_shingles(BASE.replace("cat", "bat")))
    s3 = mh.signature(_shingles("completely different text entirely"))
    sim01 = (s0 == s1).mean()
    sim03 = (s0 == s3).mean()
    assert sim01 > 0.7 > sim03


def test_simhash_deterministic_and_discriminative(ray_session):
    ds = rd.from_arrow(_doc_table())
    rows = {r["doc_id"]: r["simhash"]
            for r in simhash_table(ds).take_all()}
    assert rows[0] == rows[2]       # identical text → identical hash
    ham_near = bin((rows[0] ^ rows[1]) & (2**64 - 1)).count("1")
    ham_far = bin((rows[0] ^ rows[3]) & (2**64 - 1)).count("1")
    assert ham_near < ham_far


def test_ngram_jaccard_bounds():
    assert ngram_jaccard(BASE, BASE) == 1.0
    assert ngram_jaccard(BASE, BASE.replace("cat", "bat")) > 0.8
    assert ngram_jaccard("abcdef", "uvwxyz") == 0.0


def _vec_table(n=60, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    m = rng.normal(size=(n, dim))
    m[7] = m[3] + rng.normal(scale=0.01, size=dim)   # planted near-dup pair
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([row.astype(np.float32).tolist() for row in m],
                              pa.list_(pa.float32())),
    }), m


def test_topk_cosine_matches_numpy(ray_session):
    tbl, m = _vec_table()
    ds = rd.from_arrow(tbl)
    got = topk_cosine(ds, k=5).to_pylist()
    md = m.astype(np.float64)
    mf = np.array([np.asarray(v, np.float64) for v in
                   tbl["embedding"].to_pylist()])   # float32-rounded values
    q = mf[0] / np.linalg.norm(mf[0])
    scores = (mf @ q) / np.linalg.norm(mf, axis=1)
    order = np.lexsort((np.arange(len(scores)), -scores))[:5]
    assert [r["vec_id"] for r in got] == order.tolist()
    del md


def test_neardup_pairs_exact_matches_numpy(ray_session):
    tbl, _ = _vec_table()
    ds = rd.from_arrow(tbl)
    got = {(r["a"], r["b"]) for r in
           neardup_pairs_exact(ds, threshold=0.9).take_all()}
    mf = np.array([np.asarray(v, np.float64) for v in
                   tbl["embedding"].to_pylist()])
    mn = mf / np.linalg.norm(mf, axis=1, keepdims=True)
    S = mn @ mn.T
    exp = {(i, j) for i in range(len(mf)) for j in range(i + 1, len(mf))
           if S[i, j] >= 0.9}
    assert got == exp and (3, 7) in got


def test_lsh_topk_subset_of_exact_and_finds_self(ray_session):
    tbl, _ = _vec_table()
    ds = rd.from_arrow(tbl)
    got = [r["vec_id"] for r in lsh_topk_cosine(ds, k=5, n_planes=4).to_pylist()]
    assert got[0] == 0              # the query vector itself tops the list
    exact = [r["vec_id"] for r in topk_cosine(ds, k=60).to_pylist()]
    assert set(got).issubset(set(exact))


def test_lsh_neardup_pairs_recall_and_exactness(ray_session):
    """Distributed LSH pair generation: every emitted pair must be a TRUE
    pair (within-bucket scoring is exact), and recall vs the exact
    broadcast path must clear the tuned floor on the planted corpus."""
    from rsyslog_ray.stages.similarity import lsh_neardup_pairs
    tbl, _ = _vec_table(n=80)
    ds = rd.from_arrow(tbl)
    exact = {(r["a"], r["b"]): r["score"] for r in
             neardup_pairs_exact(ds, threshold=0.6).take_all()}
    got = {(r["a"], r["b"]): r["score"] for r in
           lsh_neardup_pairs(ds, threshold=0.6, n_planes=4,
                             n_tables=16).take_all()}
    assert set(got).issubset(set(exact))            # no false positives
    assert (3, 7) in got                            # planted near-dup found
    recall = len(got) / max(1, len(exact))
    assert recall >= 0.8, f"recall {recall:.2f} below floor"
    for k, v in got.items():
        assert abs(v - exact[k]) < 1e-9             # same exact scores


def test_neardup_pairs_exact_size_gate(ray_session):
    """Above exact_max_rows the exact broadcast path must auto-switch to
    the LSH-bucketed path (no driver take_all of the corpus), and the two
    paths must agree on the planted pair at small scale."""
    from rsyslog_ray.stages.similarity import (EXACT_PAIRS_MAX_ROWS,
                                               lsh_neardup_pairs)
    assert EXACT_PAIRS_MAX_ROWS >= 100_000          # gate exists, sane size
    tbl, _ = _vec_table(n=80)
    ds = rd.from_arrow(tbl)
    # force the gate with a tiny threshold: result must equal the LSH path
    gated = {(r["a"], r["b"]) for r in
             neardup_pairs_exact(ds, threshold=0.6,
                                 exact_max_rows=10).take_all()}
    lsh = {(r["a"], r["b"]) for r in
           lsh_neardup_pairs(ds, threshold=0.6).take_all()}
    assert gated == lsh and (3, 7) in gated
    # under the gate the exact path runs and is a superset of LSH recall
    exact = {(r["a"], r["b"]) for r in
             neardup_pairs_exact(ds, threshold=0.6,
                                 exact_max_rows=1000).take_all()}
    assert lsh.issubset(exact) and (3, 7) in exact


def _brute_simhash_drop(tbl, radius):
    """Python oracle: brute-force Hamming pairs + union-find keep-min."""
    from rsyslog_ray.stages.dedup import SimHashStage, _driver_drop_set
    sigs = SimHashStage()(tbl)["simhash"].to_numpy().astype(np.int64).view(np.uint64)
    ids = tbl["doc_id"].to_numpy()
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if bin(int(sigs[i] ^ sigs[j])).count("1") <= radius:
                a.append(ids[i]); b.append(ids[j])
    return _driver_drop_set(np.array(a, np.int64), np.array(b, np.int64))


def test_simhash_dedup_matches_python_oracle(ray_session):
    from rsyslog_ray.stages.dedup import simhash_dedup
    tbl = _doc_table()
    drop = _brute_simhash_drop(tbl, radius=3)
    keep_exp = sorted(set(tbl["doc_id"].to_pylist()) - drop)
    got = sorted(r["doc_id"] for r in
                 simhash_dedup(rd.from_arrow(tbl), radius=3)
                 .select_columns(["doc_id"]).take_all())
    assert got == keep_exp
    assert 2 not in got          # exact dup of 0 must drop (hamming 0)


def test_simhash_dedup_distributed_path(ray_session):
    """Force the distributed pairing + connected-components + anti-join
    path with a zero driver threshold; results must match the driver path."""
    from rsyslog_ray.stages.dedup import simhash_dedup
    tbl = _doc_table()
    base = sorted(r["doc_id"] for r in
                  simhash_dedup(rd.from_arrow(tbl), radius=3).take_all())
    dist = sorted(r["doc_id"] for r in
                  simhash_dedup(rd.from_arrow(tbl), radius=3,
                                driver_threshold=0).take_all())
    assert dist == base


def test_minhash_dedup_distributed_path(ray_session):
    from rsyslog_ray.stages.dedup import minhash_lsh_dedup
    tbl = _doc_table()
    base = sorted(r["doc_id"] for r in
                  minhash_lsh_dedup(rd.from_arrow(tbl)).take_all())
    dist = sorted(r["doc_id"] for r in
                  minhash_lsh_dedup(rd.from_arrow(tbl),
                                    driver_threshold=0).take_all())
    assert dist == base


def test_connected_components_labels():
    import ray.data as rdd
    from rsyslog_ray.stages.dedup import connected_components
    # two components: {1,2,3,9} (chain) and {5,6}
    pairs = rdd.from_arrow(pa.table({"a": [2, 3, 9, 5], "b": [1, 2, 3, 6]}))
    labels = {r["node"]: r["label"]
              for r in connected_components(pairs, num_partitions=4).take_all()}
    assert labels == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}


def test_connected_components_warns_when_not_converged():
    import warnings
    import ray.data as rdd
    from rsyslog_ray.stages.dedup import connected_components
    # path graph 1-2-3-4-5-6: diameter 5 > max_iters=1 → must warn
    pairs = rdd.from_arrow(pa.table({"a": [1, 2, 3, 4, 5],
                                     "b": [2, 3, 4, 5, 6]}))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        connected_components(pairs, num_partitions=2, max_iters=1).take_all()
    assert any("did not converge" in str(x.message) for x in w
               if issubclass(x.category, RuntimeWarning))


def test_lsh_multiprobe_improves_recall(ray_session):
    tbl, _ = _vec_table()
    ds = rd.from_arrow(tbl)
    exact = [r["vec_id"] for r in topk_cosine(ds, k=10).to_pylist()]
    one = {r["vec_id"] for r in
           lsh_topk_cosine(ds, k=10, n_planes=6, n_probes=1).to_pylist()}
    multi = {r["vec_id"] for r in
             lsh_topk_cosine(ds, k=10, n_planes=6, n_probes=4).to_pylist()}
    r1 = len(one & set(exact)) / 10
    rm = len(multi & set(exact)) / 10
    assert rm >= r1                      # probing never hurts recall
    assert 0 in multi                    # query vector found
    assert multi.issubset(set(r["vec_id"] for r in
                              topk_cosine(ds, k=60).to_pylist()))


def test_ivf_topk_recall_and_determinism(ray_session):
    from rsyslog_ray.stages.similarity import ivf_topk_cosine
    tbl, _ = _vec_table(n=120)
    ds = rd.from_arrow(tbl)
    exact = [r["vec_id"] for r in topk_cosine(ds, k=10).to_pylist()]
    got = [r["vec_id"] for r in
           ivf_topk_cosine(ds, k=10, n_lists=8, n_probes=4).to_pylist()]
    assert got[0] == 0                   # finds the query itself
    recall = len(set(got) & set(exact)) / 10
    assert recall >= 0.6, f"recall {recall}"
    again = [r["vec_id"] for r in
             ivf_topk_cosine(ds, k=10, n_lists=8, n_probes=4).to_pylist()]
    assert got == again                  # deterministic training


def test_ivf_full_probe_equals_exact(ray_session):
    from rsyslog_ray.stages.similarity import ivf_topk_cosine
    tbl, _ = _vec_table(n=80)
    ds = rd.from_arrow(tbl)
    exact = [r["vec_id"] for r in topk_cosine(ds, k=10).to_pylist()]
    got = [r["vec_id"] for r in
           ivf_topk_cosine(ds, k=10, n_lists=8, n_probes=8).to_pylist()]
    assert got == exact                  # probing every list = brute force


def _py_wordgram_jaccard(texts: list[str], n: int = 3) -> dict:
    """Python oracle: exact word-n-gram Jaccard over every pair."""
    sets = []
    for t in texts:
        toks = [w for w in t.split() if w]
        sets.append({" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1)})
    out = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            u = len(sets[a] | sets[b])
            if u:
                out[(a, b)] = len(sets[a] & sets[b]) / u
    return out


def test_ngram_jaccard_pairs_matches_python_oracle(ray_session):
    from rsyslog_ray.stages.dedup import ngram_jaccard_pairs
    tbl = _doc_table()
    ds = rd.from_arrow(tbl)
    got = {(r["a"], r["b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(ds, threshold=0.2).take_all()}
    want = {k: v for k, v in
            _py_wordgram_jaccard(tbl["text"].to_pylist()).items()
            if v >= 0.2}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12
    # distributed bucket path (driver_threshold=0) must agree exactly
    dist = {(r["a"], r["b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(ds, threshold=0.2,
                                         driver_threshold=0).take_all()}
    assert dist == got


def test_ngram_jaccard_pairs_max_df_prunes_stop_grams(ray_session):
    from rsyslog_ray.stages.dedup import ngram_jaccard_pairs
    # every doc shares the boilerplate prefix; max_df=2 removes grams
    # present in >2 docs, so only the genuinely-duplicated tail pairs up
    texts = ["common header words here doc %d unique tail %d" % (i, i)
             for i in range(4)] + ["common header words here doc 0 unique tail 0"]
    tbl = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(tbl)
    full = {(r["a"], r["b"]) for r in
            ngram_jaccard_pairs(ds, threshold=0.9).take_all()}
    assert (0, 4) in full                      # exact dup pair survives
    pruned = ngram_jaccard_pairs(ds, threshold=0.01, max_df=2).take_all()
    # shared-by-all grams are pruned, so cross pairs lose their overlap
    assert all({r["a"], r["b"]} == {0, 4} for r in pruned)
    # distributed path with the same explicit cutoff agrees exactly
    dist = ngram_jaccard_pairs(ds, threshold=0.01, max_df=2,
                               driver_threshold=0).take_all()
    assert (sorted((r["a"], r["b"], r["jaccard"]) for r in dist)
            == sorted((r["a"], r["b"], r["jaccard"]) for r in pruned))


def test_ngram_jaccard_distributed_default_max_df(ray_session):
    """Round-3 ADVICE: the distributed path must never run with an
    unbounded max_df — a derived corpus-sized cap kicks in (and at this
    corpus size the floor cap of 1000 prunes nothing, so the result
    equals the unbounded driver-path result)."""
    from rsyslog_ray.stages.dedup import ngram_jaccard_pairs
    tbl = _doc_table()
    ds = rd.from_arrow(tbl)
    unbounded = sorted((r["a"], r["b"]) for r in
                       ngram_jaccard_pairs(ds, threshold=0.2).take_all())
    capped = sorted((r["a"], r["b"]) for r in
                    ngram_jaccard_pairs(ds, threshold=0.2, max_df=None,
                                        driver_threshold=0).take_all())
    assert capped == unbounded and len(capped) > 0


def test_jaccard_dedup_drops_partnered_docs(ray_session):
    from rsyslog_ray.stages.dedup import ngram_jaccard_dedup
    ds = rd.from_arrow(_doc_table())
    kept = sorted(r["doc_id"] for r in
                  ngram_jaccard_dedup(ds, threshold=0.4)
                  .select_columns(["doc_id"]).take_all())
    # 1, 2, 5 all pair with 0 (smaller id) → dropped; 3, 4 unrelated
    assert kept == [0, 3, 4]


def test_cosine_dedup_exact_and_lsh_agree(ray_session):
    from rsyslog_ray.stages.similarity import cosine_dedup
    tbl, _ = _vec_table(n=60)
    ds = rd.from_arrow(tbl)
    exact = sorted(r["vec_id"] for r in
                   cosine_dedup(ds, threshold=0.9)
                   .select_columns(["vec_id"]).take_all())
    # python oracle: drop any vec with a smaller-id partner >= 0.9
    import numpy as np
    m = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    s = mn @ mn.T
    drop = {j for i in range(len(m)) for j in range(i + 1, len(m))
            if s[i, j] >= 0.9}
    assert exact == sorted(set(range(len(m))) - drop)
    lsh = sorted(r["vec_id"] for r in
                 cosine_dedup(ds, threshold=0.9, method="lsh")
                 .select_columns(["vec_id"]).take_all())
    # LSH recall may miss pairs → keeps a superset of the exact survivors
    assert set(exact) <= set(lsh)


def test_minhash_stage_fuzz_vs_reference():
    """Property test: batched kernel ≡ per-doc signature() on arbitrary
    unicode docs (both reduceat strategies)."""
    from hypothesis import given, settings, strategies as st
    from rsyslog_ray.stages.dedup import MinHashStage

    stage = MinHashStage(num_perm=16, shingle_k=5)
    forced = MinHashStage(num_perm=16, shingle_k=5)
    forced._FLAT_MAX, forced._CHUNK_W = 0, 3
    mh = stage.mh

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.text(max_size=30), min_size=1, max_size=6))
    def check(texts):
        tbl = pa.table({"text": pa.array(texts, pa.large_string())})
        got = stage(tbl)["minhash"].to_pylist()
        got2 = forced(tbl)["minhash"].to_pylist()
        want = [list(mh.signature(_shingles(t, 5)).astype(np.int64))
                for t in texts]
        assert got == want and got2 == want
    check()


def test_drop_pair_partners_broadcast_and_join_paths_agree(ray_session):
    """The broadcast anti-filter (small drop set) and the hash-partitioned
    left-anti join (broadcast_threshold=0 forces it) must keep the same
    rows."""
    from rsyslog_ray.stages.dedup import drop_pair_partners

    ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(20), pa.int64())}))
    pairs = rd.from_arrow(pa.table({
        "a": pa.array([0, 1, 2], pa.int64()),
        "b": pa.array([5, 7, 5], pa.int64()),
    }))
    bcast = sorted(r["doc_id"] for r in
                   drop_pair_partners(ds, pairs, "doc_id").take_all())
    joined = sorted(r["doc_id"] for r in
                    drop_pair_partners(ds, pairs, "doc_id",
                                       broadcast_threshold=0).take_all())
    want = [i for i in range(20) if i not in (5, 7)]
    assert bcast == want and joined == want


def test_first_occurrence_global_line_dedup(ray_session):
    from rsyslog_ray.stages.dedup import first_occurrence
    t = pa.table({
        "conv_id": ["c2", "c1", "c1", "c2", "c3", "c1"],
        "turn_idx": [0, 0, 1, 1, 0, 2],
        "text": ["dup", "dup", "uniq", "uniq", "dup", "other"],
    })
    want = [("c1", 0), ("c1", 1), ("c1", 2)]
    for bh in (False, True):
        got = sorted((r["conv_id"], r["turn_idx"]) for r in
                     first_occurrence(rd.from_arrow(t),
                                      by_hash=bh).take_all())
        assert got == want, bh
    # partitioning-invariant
    got = sorted((r["conv_id"], r["turn_idx"]) for r in
                 first_occurrence(rd.from_arrow(t).repartition(4))
                 .take_all())
    assert got == want


def test_boilerplate_filter_drops_all_occurrences(ray_session):
    from rsyslog_ray.stages.dedup import boilerplate_filter
    # "banner" appears in 3 docs, "dup" in 2, "uniq"/"only" in 1 each.
    t = pa.table({
        "conv_id": ["c1", "c1", "c2", "c2", "c3", "c3", "c1", "c2"],
        "turn_idx": [0, 1, 0, 1, 0, 1, 2, 2],
        "text": ["banner", "dup", "banner", "dup",
                 "banner", "uniq", "only", "uniq"],
    })
    # min_docs=3 drops only "banner" (every occurrence; "uniq" is in 2
    # docs? no — c3 and c2 → 2 docs, under the bar). min_docs=2 drops
    # banner+dup+uniq, keeping just the singleton "only".
    ds = rd.from_arrow(t).repartition(4)  # docs span batches
    got3 = sorted((r["conv_id"], r["turn_idx"]) for r in
                  boilerplate_filter(ds, min_docs=3).take_all())
    assert got3 == [("c1", 1), ("c1", 2), ("c2", 1),
                    ("c2", 2), ("c3", 1)]
    got2 = sorted((r["conv_id"], r["turn_idx"]) for r in
                  boilerplate_filter(ds, min_docs=2).take_all())
    assert got2 == [("c1", 2)]
    # exact distinct-doc counting: the same (text, doc) pair in two
    # batches must count ONCE — "twice" is in 2 rows of ONE doc, so it
    # survives min_docs=2 even when those rows land in different blocks
    t2 = pa.table({
        "conv_id": ["a", "a", "b"],
        "turn_idx": [0, 1, 0],
        "text": ["twice", "twice", "x"],
    })
    got = sorted((r["conv_id"], r["turn_idx"]) for r in
                 boilerplate_filter(rd.from_arrow(t2).repartition(3),
                                    min_docs=2).take_all())
    assert got == [("a", 0), ("a", 1), ("b", 0)]
    # distributed fold + anti-join fallback path (threshold forced to 0)
    got_dist = sorted((r["conv_id"], r["turn_idx"]) for r in
                      boilerplate_filter(ds, min_docs=3,
                                         broadcast_threshold=0)
                      .take_all())
    assert got_dist == got3
    # by_hash (the 100 TB path): same answers on broadcast AND anti-join
    for thr in (5_000_000, 0):
        got_h = sorted((r["conv_id"], r["turn_idx"]) for r in
                       boilerplate_filter(ds, min_docs=3, by_hash=True,
                                          broadcast_threshold=thr)
                       .take_all())
        assert got_h == got3, thr


def test_bloom_no_false_negatives_and_bounded_fpr(ray_session):
    from rsyslog_ray.stages.bloom import bloom_build, bloom_filter_rows
    ref_vals = [f"seen-{i}" for i in range(2000)]
    ref = rd.from_arrow(pa.table({"v": pa.array(ref_vals)})).repartition(4)
    bits = bloom_build(ref, "v", m_bits=1 << 16, k=4)
    probe_vals = ref_vals[:500] + [f"new-{i}" for i in range(2000)]
    probe = rd.from_arrow(pa.table({"v": pa.array(probe_vals)}))
    kept = {r["v"] for r in bloom_filter_rows(probe, bits, "v").take_all()}
    assert set(ref_vals[:500]) <= kept          # no false negatives
    fp = len(kept) - 500
    # k=4, n=2000, m=65536 → theoretical FPR ≈ 1.2e-4; allow slack
    assert fp / 2000 < 0.01, fp
    # negate drops possible members, keeps the definite-new rows
    clean = {r["v"] for r in bloom_filter_rows(
        probe, bits, "v", negate=True).take_all()}
    assert clean.isdisjoint(set(ref_vals))
    assert len(clean) >= 2000 - fp - 1


def test_bloom_partition_invariant(ray_session):
    from rsyslog_ray.stages.bloom import bloom_build
    vals = pa.table({"v": pa.array([f"x{i}" for i in range(999)])})
    a = bloom_build(rd.from_arrow(vals), "v", m_bits=1 << 14)
    b = bloom_build(rd.from_arrow(vals).repartition(7), "v",
                    m_bits=1 << 14)
    assert (a == b).all()


def test_neardup_clusters_query(ray_session):
    """Cluster-id semantics: every near-dup pair shares a cluster, the
    cluster id is the component minimum, singletons label themselves."""
    from rsyslog_ray.pipelines.queries import (q_jaccard_pairs,
                                               q_neardup_clusters)

    sf = "/root/testdata/sf0.001"
    pairs = q_jaccard_pairs(sf).to_pandas()
    clusters = q_neardup_clusters(sf).to_pandas() \
        .set_index("doc_id")["cluster_id"]
    # transitive-closure oracle via union-find
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for d, c in clusters.items():
        assert c == find(int(d)), d
    assert len(pairs) > 0          # fixture actually has near-dups
    assert (clusters.index == clusters.values).sum() > 0  # singletons


def test_editdist_pairs_fastss(ray_session):
    """FastSS recall is complete for ed<=1 (substitution / insertion /
    deletion each found), precision exact, both fold paths agree."""
    import itertools

    import pyarrow as pa
    import ray.data as rd

    from rsyslog_ray.stages.dedup import _ed_le1, editdist_pairs

    texts = ["hello world", "hellx world",      # substitution
             "hello worl",                       # deletion
             "hello worlds",                     # insertion (of the del)
             "completely different",
             "hello world",                      # exact dup of 0
             "xy", "x", ""]                      # short/empty edges
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": texts})

    def oracle():
        out = set()
        for (i, a), (j, b) in itertools.combinations(
                enumerate(t[:24] for t in texts), 2):
            d = _ed_le1(a, b)
            if d is not None:
                out.add((i, j, d))
        return out

    want = oracle()
    for thresh in (5_000_000, 0):
        got = {(int(r["a"]), int(r["b"]), int(r["dist"]))
               for r in editdist_pairs(rd.from_arrow(tbl).repartition(3),
                                       prefix_len=24,
                                       driver_threshold=thresh).take_all()}
        assert got == want, (thresh, got ^ want)
    assert any(d == 0 for _, _, d in want)      # exact dup present
    assert any(d == 1 for _, _, d in want)


def test_editdist_dedup(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rsyslog_ray.stages.dedup import editdist_dedup

    texts = ["hello world", "hellx world", "goodbye", "hello world"]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": texts})
    out = editdist_dedup(rd.from_arrow(tbl)).to_pandas()["doc_id"] \
        .sort_values().tolist()
    assert out == [0, 2]    # 1 (ed=1 to 0) and 3 (ed=0 to 0) dropped


def test_minhash_threshold_gates_candidates(ray_session):
    """Round-4 fix: jaccard_threshold must gate band-collision candidates.
    At threshold=1.0 only the exact dup (signature agreement exactly 1.0)
    may drop — near-dups 1 and 5 band-collide with 0 but their estimated
    Jaccard is < 1.0, so dropping them would be the unverified-candidate
    bug VERDICT r3 flagged."""
    from rsyslog_ray.stages.dedup import minhash_lsh_dedup
    tbl = _doc_table()
    kept = sorted(r["doc_id"] for r in
                  minhash_lsh_dedup(rd.from_arrow(tbl),
                                    jaccard_threshold=1.0)
                  .select_columns(["doc_id"]).take_all())
    assert kept == [0, 1, 3, 4, 5]
    dist = sorted(r["doc_id"] for r in
                  minhash_lsh_dedup(rd.from_arrow(tbl),
                                    jaccard_threshold=1.0,
                                    driver_threshold=0)
                  .select_columns(["doc_id"]).take_all())
    assert dist == kept


def test_canonical_dedup_collapses_formatting_variants(ray_session):
    from rsyslog_ray.stages.dedup import canonical_dedup, canonicalize_text
    t = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": ["Hello,  World!", "hello world", "HELLO WORLD.",
                 "goodbye world", "Good-bye world", "unrelated doc"],
    })
    # 0/1/2 collapse (min id 0); 3/4 collapse ("goodbye world" vs
    # "goodbye world" after hyphen strip → "goodbye world"? no:
    # "Good-bye" → "goodbye", so 3 and 4 canonicalize identically)
    for bh in (False, True):
        kept = sorted(r["doc_id"] for r in
                      canonical_dedup(rd.from_arrow(t).repartition(3),
                                      by_hash=bh).take_all())
        assert kept == [0, 3, 5], bh
    assert canonicalize_text(pa.array(["  A--B  c "])).to_pylist() \
        == ["ab c"]


def test_canonicalize_text_matches_duckdb_fuzz():
    """Property fuzz: the Arrow canonicalization pipeline is
    byte-identical to the DuckDB regexp_replace oracle twin on arbitrary
    printable strings (the contract canonical_dedup's oracle rests on)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rsyslog_ray.stages.dedup import canonicalize_text

    con = duckdb.connect()
    sql = ("SELECT trim(regexp_replace(regexp_replace(lower(v), "
           "'[^a-z0-9\\s]+', '', 'g'), '\\s+', ' ', 'g')) FROM t")

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=40), min_size=1, max_size=8))
    def check(vals):
        eng = canonicalize_text(pa.array(vals, pa.string())).to_pylist()
        con.execute("CREATE OR REPLACE TABLE t AS SELECT "
                    "unnest(?) AS v", [vals])
        got = [r[0] for r in con.execute(sql).fetchall()]
        assert eng == got, (vals, eng, got)

    check()


def test_cluster_size_report_histogram(ray_session):
    import ray.data as rd
    from rsyslog_ray.stages.dedup import cluster_size_report

    # components: {0,1,2} {3,4} {5,6} {7} {8} -> sizes 3,2,2,1,1
    assign = pa.table({
        "doc_id": pa.array(range(9), pa.int64()),
        "cluster_id": pa.array([0, 0, 0, 3, 3, 5, 5, 7, 8], pa.int64())})
    got = cluster_size_report(rd.from_arrow(assign).repartition(4))
    assert got["cluster_size"].to_pylist() == [1, 2, 3]
    assert got["n_clusters"].to_pylist() == [2, 2, 1]


def test_by_hash_engine_switch_equivalence(ray_session, monkeypatch):
    """RSYSLOG_RAY_DEDUP_BY_HASH flips the 16 B-key mode on as the
    engine default; survivors must match the text-keyed oracle mode
    (scripts/scale_probe.py --ops by_hash_equiv is the at-scale twin)."""
    import pyarrow as pa
    import ray

    from rsyslog_ray.stages.dedup import exact_dedup, resolve_by_hash

    t = pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "text": pa.array([f"doc {i % 37}" for i in range(100)]),
    })

    def survivors(**kw):
        out = exact_dedup(ray.data.from_arrow(t), **kw).materialize()
        ids = []
        for ref in out.to_arrow_refs():
            ids.extend(ray.get(ref)["doc_id"].to_pylist())
        return sorted(ids)

    base = survivors(by_hash=False)
    assert len(base) == 37
    assert survivors(by_hash=True) == base
    monkeypatch.setenv("RSYSLOG_RAY_DEDUP_BY_HASH", "1")
    assert resolve_by_hash(None) is True
    assert survivors() == base          # env default -> hash mode
    monkeypatch.delenv("RSYSLOG_RAY_DEDUP_BY_HASH")
    assert resolve_by_hash(None) is False
    assert resolve_by_hash(True) is True
