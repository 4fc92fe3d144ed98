"""Scale probe: run the corpus/dedup operators on a synthetic corpus big
enough to cross their driver-vs-distributed thresholds (the per-round
testdata tops out at 5000 docs, which never exercises the scale paths
with default settings).

    python scripts/scale_probe.py [n_docs] [--ops op1,op2]

Synthesizes n_docs (default 100k) deterministic documents (~500 B each,
10% exact dups, 5% near-dups) under /tmp, then times each op with
DEFAULT thresholds and prints one JSON line. This is an engineering
probe, not the driver bench — results land in BASELINE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

_rng = np.random.default_rng(99)
_letters = np.array(list("abcdefghijklmnopqrstuvwxyz"), dtype=object)
WORDS = np.array(["".join(_rng.choice(_letters,
                                      size=int(_rng.integers(4, 10))))
                  for _ in range(20000)], dtype=object)


def synth_docs(n: int, out: str, seed: int = 7) -> str:
    path = os.path.join(out, f"docs_{n}.parquet")
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(seed)
    lens = rng.integers(40, 120, size=n)
    texts = []
    for i in range(n):
        words = WORDS[rng.integers(0, len(WORDS), size=lens[i])]
        texts.append(" ".join(words))
    # 10% exact dups, 5% near-dups (one word changed)
    for i in range(0, n, 10):
        if i + 1 < n:
            texts[i + 1] = texts[i]
    for i in range(0, n, 20):
        if i + 2 < n:
            w = texts[i].split(" ")
            w[len(w) // 2] = "CHANGED"
            texts[i + 2] = " ".join(w)
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.large_string()),
        "source": pa.array([f"src{i % 20}" for i in range(n)]),
    })
    os.makedirs(out, exist_ok=True)
    pq.write_table(tbl, path, row_group_size=16384)
    return path


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 100_000
    only = None
    if "--ops" in sys.argv:
        only = set(sys.argv[sys.argv.index("--ops") + 1].split(","))
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    path = synth_docs(n, "/tmp/rsyslog_ray_scale")
    results: dict = {"n_docs": n}

    def timed(name, fn):
        if only and name not in only:
            return
        t0 = time.perf_counter()
        try:
            out = fn()
            results[name] = {"sec": round(time.perf_counter() - t0, 2),
                             "rows": out}
        except Exception as ex:  # noqa: BLE001
            results[name] = {"error": f"{type(ex).__name__}: {ex}"[:300]}

    def ds():
        return rd.read_parquet(path)

    from rsyslog_ray.stages.dedup import (exact_dedup, minhash_lsh_dedup,
                                          ngram_jaccard_pairs,
                                          simhash_dedup)
    from rsyslog_ray.stages.sampling import (decontaminate, dedup_lines,
                                             hash_split, pack_sequences)

    timed("exact_dedup", lambda: exact_dedup(ds()).count())
    # the 100 TB mode: shuffle a 64-bit text hash, not the text bytes
    timed("exact_dedup_hash",
          lambda: exact_dedup(ds(), by_hash=True).count())
    timed("minhash_lsh_dedup", lambda: minhash_lsh_dedup(ds()).count())
    # force the fully-distributed band path + connected components
    timed("minhash_lsh_dedup_dist",
          lambda: minhash_lsh_dedup(ds(), driver_threshold=0).count())
    timed("simhash_dedup", lambda: simhash_dedup(ds()).count())
    timed("jaccard_pairs",
          lambda: ngram_jaccard_pairs(ds(), threshold=0.8).count())
    timed("dedup_lines", lambda: dedup_lines(ds(), sep=" ").count())
    timed("hash_split", lambda: hash_split(ds()).count())
    timed("pack_sequences", lambda: pack_sequences(ds()).count())

    import pyarrow.compute as pc

    def _side(want_eval):
        def fn(b):
            ids = pc.cast(b["doc_id"], pa.int64())
            mod = pc.subtract(ids, pc.multiply(pc.divide(ids, 1000), 1000))
            m = pc.equal(mod, 0) if want_eval else pc.not_equal(mod, 0)
            return b.filter(m)
        return fn

    def _decon():
        evald = ds().map_batches(_side(True), batch_format="pyarrow")
        corpus = ds().map_batches(_side(False), batch_format="pyarrow")
        return decontaminate(corpus, evald, n=5).count()
    timed("decontaminate", _decon)

    from rsyslog_ray.stages.aggregate import (concat_group_text,
                                              cumsum_by_key, lag_by_key,
                                              rank_by_key)
    from rsyslog_ray.stages.joins import equi_join
    from rsyslog_ray.stages.textstats import tfidf_top_terms

    timed("tfidf", lambda: tfidf_top_terms(ds(), k=5).count())

    from rsyslog_ray.stages.textstats import bigram_lm_score
    timed("lm_score", lambda: bigram_lm_score(ds()).count())

    def _equi():
        # fact-to-fact 1:1 self-join on doc_id (100k x 100k keys),
        # forced past the driver threshold
        left = ds().map_batches(
            lambda b: b.select(["doc_id", "source"]),
            batch_format="pyarrow")
        right = ds().map_batches(
            lambda b: pa.table({
                "doc_id": b["doc_id"],
                "n_chars": pc.utf8_length(
                    pc.cast(b["text"], pa.string()))}),
            batch_format="pyarrow")
        return equi_join(left, right, key="doc_id",
                         materialize_right=False,
                         driver_threshold=0).count()
    timed("equi_join", _equi)

    def _conv():
        withkey = ds().map_batches(
            lambda b: pa.table({
                "conv": pc.cast(
                    pc.divide(pc.cast(b["doc_id"], pa.int64()), 8),
                    pa.int64()),
                "doc_id": b["doc_id"], "text": b["text"]}),
            batch_format="pyarrow")
        return concat_group_text(withkey, key="conv",
                                 order_col="doc_id").count()
    timed("conv_docs", _conv)

    def _src_key():
        return ds().map_batches(
            lambda b: b.select(["doc_id", "source"]),
            batch_format="pyarrow")
    timed("lag_by_key", lambda: lag_by_key(
        _src_key(), key="source", order_cols=("doc_id",),
        value_col="doc_id").count())
    timed("cumsum_by_key", lambda: cumsum_by_key(
        _src_key(), key="source", order_cols=("doc_id",),
        value_col="doc_id").count())
    timed("ntile", lambda: rank_by_key(
        _src_key(), key="source", order_cols=("doc_id",),
        method="ntile").count())

    # round-3 continuation ops
    from rsyslog_ray.stages.bpe import bpe_token_counts, bpe_train
    from rsyslog_ray.stages.sampling import (dup_ngram_fraction,
                                             token_budget_sample)

    timed("bpe_vocab", lambda: bpe_train(ds(), n_merges=200).num_rows)

    def _bpe_tok():
        merges = bpe_train(ds(), n_merges=200)
        return bpe_token_counts(ds(), merges).count()
    timed("bpe_tokens", _bpe_tok)
    timed("dup_ngrams", lambda: dup_ngram_fraction(ds()).count())
    timed("dup_ngrams_join",
          lambda: dup_ngram_fraction(ds(),
                                     broadcast_threshold=0).count())
    timed("token_budget", lambda: token_budget_sample(
        ds(), budgets={f"src{i}": 50_000 for i in range(10)},
        default_budget=20_000).count())

    # second-continuation ops
    from rsyslog_ray.stages.aggregate import profile_columns
    from rsyslog_ray.stages.dedup import editdist_dedup, editdist_pairs
    from rsyslog_ray.stages.sampling import remove_dup_spans

    timed("dedup_spans", lambda: remove_dup_spans(ds()).count())
    timed("editdist_pairs",
          lambda: editdist_pairs(ds(), prefix_len=24).count())
    # force the variant-bucketed distributed pairing path
    timed("editdist_pairs_dist",
          lambda: editdist_pairs(ds(), prefix_len=24,
                                 driver_threshold=0).count())
    timed("editdist_dedup", lambda: editdist_dedup(ds()).count())
    timed("profile",
          lambda: profile_columns(ds(),
                                  ["doc_id", "text", "source"]).num_rows)
    timed("profile_dist",
          lambda: profile_columns(ds(), ["doc_id", "text", "source"],
                                  driver_threshold=0).num_rows)

    # embeddings ops: synthetic (n, 64) float32 with planted near-dups
    emb_path = os.path.join("/tmp/rsyslog_ray_scale", f"emb_{n}.parquet")
    if not os.path.exists(emb_path):
        rng = np.random.default_rng(31)
        m = rng.standard_normal((n, 64)).astype(np.float32)
        m[1::10] = m[0::10][:len(m[1::10])] + 1e-3  # ~10% near-dup twins
        pq.write_table(pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([r.tolist() for r in m],
                                  pa.list_(pa.float32())),
        }), emb_path, row_group_size=16384)

    def eds():
        return rd.read_parquet(emb_path)

    from rsyslog_ray.stages.clustering import (kmeans_cluster_stats,
                                               pca_fit, pca_transform,
                                               semdedup)
    timed("kmeans", lambda: kmeans_cluster_stats(
        eds(), k=64, iters=3).count())
    timed("semdedup", lambda: semdedup(eds(), k=64, eps=0.01,
                                       iters=3).count())

    def _pca():
        comps, mean, _ = pca_fit(eds(), n_components=8)
        return pca_transform(eds(), comps, mean).count()
    timed("pca", _pca)

    from rsyslog_ray.stages.similarity import sq8_quantize
    timed("sq8", lambda: sq8_quantize(eds()).count())

    from rsyslog_ray.stages.bloom import bloom_build, bloom_filter_rows

    def _bloom():
        evald = ds().map_batches(_side(True), batch_format="pyarrow")
        corpus = ds().map_batches(_side(False), batch_format="pyarrow")
        bits = bloom_build(evald, "text", m_bits=1 << 22)
        return bloom_filter_rows(corpus, bits, "text",
                                 negate=True).count()
    timed("bloom_decontaminate", _bloom)

    # round-4 ops: boilerplate-line removal (both fold paths) and
    # epoch-weighted fractional upsampling
    from rsyslog_ray.stages.dedup import boilerplate_filter
    from rsyslog_ray.stages.sampling import epoch_mix

    def _boiler_ds():
        # line-level shape: doc = source bucket, text = the doc text
        return ds().map_batches(
            lambda b: pa.table({"conv_id": pc.cast(b["source"],
                                                   pa.string()),
                                "text": b["text"]}),
            batch_format="pyarrow")
    timed("boilerplate",
          lambda: boilerplate_filter(_boiler_ds(), min_docs=2).count())
    timed("boilerplate_dist",
          lambda: boilerplate_filter(_boiler_ds(), min_docs=2,
                                     broadcast_threshold=0).count())
    # the 100 TB mode: 64-bit text hashes through shuffle/fold/filter
    timed("boilerplate_hash",
          lambda: boilerplate_filter(_boiler_ds(), min_docs=2,
                                     by_hash=True).count())
    timed("boilerplate_hash_dist",
          lambda: boilerplate_filter(_boiler_ds(), min_docs=2,
                                     by_hash=True,
                                     broadcast_threshold=0).count())
    def _survivor_ids(out_ds, col="doc_id"):
        t = out_ds.materialize()
        ids = []
        for ref in t.to_arrow_refs():
            tb = ray.get(ref)
            if col in tb.column_names:
                ids.extend(tb[col].to_pylist())
        return sorted(ids)

    def _by_hash_equiv():
        """Engine-switch equivalence: text-keyed vs 16 B-key modes (and
        the RSYSLOG_RAY_DEDUP_BY_HASH default resolution) must keep
        IDENTICAL survivors on this corpus — the documented guarantee
        behind flipping the switch on for scale runs."""
        a = _survivor_ids(exact_dedup(ds(), by_hash=False))
        b = _survivor_ids(exact_dedup(ds(), by_hash=True))
        assert a == b, (len(a), len(b))
        os.environ["RSYSLOG_RAY_DEDUP_BY_HASH"] = "1"
        try:
            c = _survivor_ids(exact_dedup(ds()))  # env default → hash
        finally:
            del os.environ["RSYSLOG_RAY_DEDUP_BY_HASH"]
        assert a == c, (len(a), len(c))
        fa = boilerplate_filter(_boiler_ds(), min_docs=2,
                                by_hash=False).count()
        fb = boilerplate_filter(_boiler_ds(), min_docs=2,
                                by_hash=True).count()
        assert fa == fb, (fa, fb)
        return len(a)

    timed("by_hash_equiv", _by_hash_equiv)
    timed("epoch_mix", lambda: epoch_mix(
        ds().map_batches(lambda b: b.select(["doc_id", "source"]),
                         batch_format="pyarrow"),
        {f"src{i}": 1.0 + i / 4.0 for i in range(5)}).count())

    print(json.dumps(results))
    ray.shutdown()


if __name__ == "__main__":
    main()
