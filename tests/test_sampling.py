"""Training-data corpus ops (stages/sampling.py): deterministic split,
weighted mixing, sequence packing. All decisions derive from row identity
— assert batching/partitioning invariance explicitly."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from rsyslog_ray.stages.sampling import (
    SPLIT_PRIME, hash_split, pack_sequences, sample_by_key,
)


def _docs(n=400, sources=4):
    rng = np.random.default_rng(11)
    texts = [" ".join(["tok"] * int(rng.integers(1, 40))) for _ in range(n)]
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array([f"s{i % sources}" for i in range(n)]),
        "text": pa.array(texts),
    })


def test_hash_split_ratios_and_determinism(ray_session):
    tbl = _docs(2000)
    out = hash_split(rd.from_arrow(tbl)).take_all()
    splits = {r["doc_id"]: r["split"] for r in out}
    frac = {s: sum(1 for v in splits.values() if v == s) / len(splits)
            for s in ("train", "val", "test")}
    assert abs(frac["train"] - 0.8) < 0.05
    assert abs(frac["val"] - 0.1) < 0.03 and abs(frac["test"] - 0.1) < 0.03
    # identical under different partitioning
    out2 = hash_split(rd.from_arrow(tbl).repartition(7)).take_all()
    assert {r["doc_id"]: r["split"] for r in out2} == splits
    # matches the documented integer formula
    u = (np.arange(2000, dtype=np.uint64) * np.uint64(SPLIT_PRIME))
    want_train = u < np.uint64(int(0.8 * 2**64))
    got_train = np.array([splits[i] == "train" for i in range(2000)])
    assert (want_train == got_train).all()


def test_sample_by_key_weights(ray_session):
    tbl = _docs(2000)
    kept = sample_by_key(rd.from_arrow(tbl),
                         weights={"s0": 0.5, "s1": 0.0}, key_col="source",
                         ).take_all()
    by_src = {}
    for r in kept:
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
    assert by_src.get("s1", 0) == 0                 # zero weight drops all
    assert abs(by_src["s0"] / 500 - 0.5) < 0.1      # ~half of s0
    assert by_src["s2"] == 500 and by_src["s3"] == 500  # default keeps

def test_pack_sequences_chunk_invariance_and_oracle(ray_session):
    tbl = _docs(400)
    big = pack_sequences(rd.from_arrow(tbl), max_tokens=64).take_all()
    # tiny chunk_span → many (group, chunk) partials; same assignment
    small = pack_sequences(rd.from_arrow(tbl).repartition(5), max_tokens=64,
                           chunk_span=16).take_all()
    key = lambda rows: {r["doc_id"]: r["seq_idx"] for r in rows}
    assert key(small) == key(big)
    # python oracle: per-source ordered cumulative // max_tokens
    toks = {r["doc_id"]: r["n_tokens"] for r in big}
    srcs = tbl["source"].to_pylist()
    want = {}
    for s in sorted(set(srcs)):
        acc = 0
        for i in range(400):
            if srcs[i] == s:
                want[i] = acc // 64
                acc += toks[i]
    assert key(big) == want


def test_decontaminate_drops_ngram_overlap(ray_session):
    from rsyslog_ray.stages.sampling import decontaminate, eval_ngram_set
    evald = rd.from_arrow(pa.table({
        "doc_id": pa.array([100], pa.int64()),
        "text": pa.array(["the quick brown fox jumps over the lazy dog"]),
    }))
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "totally unrelated content with no shared phrases at all here",
            "he said the quick brown fox jumps right past us",  # shares 5-gram
            "quick brown fox jumps over",                       # exact 5-gram
            "the quick brown fox",                              # only 4 words
        ]),
    }))
    kept = sorted(r["doc_id"] for r in
                  decontaminate(corpus, evald, n=5).take_all())
    assert kept == [1, 4]
    grams = set(eval_ngram_set(evald, n=5).to_pylist())
    assert "the quick brown fox jumps" in grams and len(grams) == 5


def test_dedup_lines_keeps_first_occurrence(ray_session):
    from rsyslog_ray.stages.sampling import dedup_lines
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "alpha\nbeta\nalpha\ngamma\nbeta",
            "same\nsame\nsame",
            "",                                   # empty doc unchanged
        ]),
    })
    out = {r["doc_id"]: r["text"] for r in
           dedup_lines(rd.from_arrow(tbl)).take_all()}
    assert out == {0: "alpha\nbeta\ngamma", 1: "same", 2: ""}
    # custom separator (fixture corpus has no newlines)
    t2 = pa.table({"doc_id": pa.array([0], pa.int64()),
                   "text": pa.array(["a b a c b"])})
    got = dedup_lines(rd.from_arrow(t2), sep=" ").take_all()[0]["text"]
    assert got == "a b c"


def test_curation_composite_stages_compose(ray_session):
    """The curation flagship chains quality→exact-dedup→line-dedup→split:
    check the composition drops a low-quality doc, collapses exact dups,
    and dedups lines in the survivor."""
    from rsyslog_ray.pipelines.queries import q_curation  # noqa: F401
    from rsyslog_ray.stages.dedup import exact_dedup
    from rsyslog_ray.stages.sampling import dedup_lines, hash_split
    from rsyslog_ray.stages.textstats import QualityScore
    import pyarrow.compute as pc
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "the cat and the dog in the house",   # stopword-rich: kept
            "zxqv wkjh qpzm vbnm",                # no stopwords: dropped
            "the cat and the dog in the house",   # exact dup of 0: dropped
            "the the bird bird is is here here",  # line-dedups to 4 words
        ]),
    })
    qs = QualityScore("text")

    def qf(b):
        s = qs(b)
        return s.filter(pc.greater_equal(s["stop_ratio"], 0.05)) \
                .select(["doc_id", "text"])
    ds = rd.from_arrow(tbl).map_batches(qf, batch_format="pyarrow")
    ds = exact_dedup(ds, text_col="text", id_col="doc_id")
    ds = dedup_lines(ds, sep=" ")
    out = {r["doc_id"]: r["text"] for r in hash_split(ds).take_all()}
    assert set(out) == {0, 3}
    assert out[3] == "the bird is here"


def test_sample_n_per_key_deterministic(ray_session):
    from rsyslog_ray.stages.sampling import sample_n_per_key
    tbl = _docs(400)
    a = sorted((r["source"], r["doc_id"]) for r in
               sample_n_per_key(rd.from_arrow(tbl), key_col="source",
                                n=3).take_all())
    b = sorted((r["source"], r["doc_id"]) for r in
               sample_n_per_key(rd.from_arrow(tbl).repartition(7),
                                key_col="source", n=3).take_all())
    assert a == b and len(a) == 4 * 3
    # python oracle: 3 smallest (id * PRIME) mod 2^64 per source
    import numpy as np
    from rsyslog_ray.stages.sampling import SAMPLE_N_PRIME
    ids = np.arange(400, dtype=np.uint64)
    h = ids * np.uint64(SAMPLE_N_PRIME)
    want = []
    for s in range(4):
        mine = np.arange(s, 400, 4)
        want += [(f"s{s}", int(i)) for i in
                 mine[np.argsort(h[mine], kind="stable")][:3]]
    assert a == sorted(want)


def test_shuffle_shards_matches_sql_and_is_partition_invariant(ray_session):
    import duckdb
    from rsyslog_ray.stages.sampling import shuffle_shards, shuffle_sql
    t = pa.table({"doc_id": pa.array(range(777), pa.int64())})
    got = sorted((r["doc_id"], r["shard"], r["pos"]) for r in
                 shuffle_shards(rd.from_arrow(t), n_shards=5,
                                seed=3).take_all())
    want = sorted(tuple(r) for r in
                  duckdb.sql(shuffle_sql(5, 3) + " FROM t").fetchall())
    assert got == want
    # partitioning-invariant and positions contiguous 0..n-1 per shard
    again = sorted((r["doc_id"], r["shard"], r["pos"]) for r in
                   shuffle_shards(rd.from_arrow(t).repartition(9), n_shards=5,
                                  seed=3, ubucket_bits=2).take_all())
    assert again == got
    by_shard = {}
    for _, s, p in got:
        by_shard.setdefault(s, []).append(p)
    for ps in by_shard.values():
        assert sorted(ps) == list(range(len(ps)))


def test_shuffle_shards_seed_changes_permutation(ray_session):
    from rsyslog_ray.stages.sampling import shuffle_shards
    t = pa.table({"doc_id": pa.array(range(100), pa.int64())})
    a = {r["doc_id"]: (r["shard"], r["pos"]) for r in
         shuffle_shards(rd.from_arrow(t), n_shards=4, seed=1).take_all()}
    b = {r["doc_id"]: (r["shard"], r["pos"]) for r in
         shuffle_shards(rd.from_arrow(t), n_shards=4, seed=2).take_all()}
    assert a != b and set(a) == set(b)


def test_dup_ngram_fraction_matches_python_oracle(ray_session):
    from rsyslog_ray.stages.sampling import dup_ngram_fraction
    texts = [
        "a b c d e f g",          # shares 5-gram "a b c d e" with doc 1
        "a b c d e x y",
        "p q r s t u",            # unique
        "short doc",              # < 5 words → 0.0
        "p q r s t u",            # exact dup of doc 2
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})

    def py_oracle():
        grams, total = {}, {}
        per_doc = []
        for i, txt in enumerate(texts):
            ws = txt.split()
            gs = [" ".join(ws[j:j + 5]) for j in range(len(ws) - 4)]
            per_doc.append(gs)
            total[i] = len(gs)
            for g in set(gs):
                grams.setdefault(g, set()).add(i)
        out = {}
        for i, gs in enumerate(per_doc):
            dup = sum(1 for g in gs if len(grams[g]) >= 2)
            out[i] = round(dup / total[i], 6) if total[i] else 0.0
        return out

    want = py_oracle()
    for thr in (5_000_000, 0):       # broadcast path, then join fallback
        got = {r["doc_id"]: r["dup_frac"] for r in dup_ngram_fraction(
            rd.from_arrow(t).repartition(3),
            broadcast_threshold=thr).take_all()}
        assert got == want, thr
    assert want[3] == 0.0 and want[2] > 0 and want[4] == 1.0


def test_token_budget_sample_properties(ray_session):
    import duckdb
    from rsyslog_ray.stages.sampling import (token_budget_sample,
                                             token_budget_sql)
    rng = np.random.RandomState(5)
    texts = [" ".join(f"w{rng.randint(100)}" for _ in range(rng.randint(1, 30)))
             for _ in range(200)]
    srcs = [f"s{rng.randint(3)}" for _ in range(200)]
    t = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                  "source": pa.array(srcs, pa.string()),
                  "text": pa.array(texts, pa.string())})
    budgets = {"s0": 300, "s1": 120}
    want = sorted(duckdb.sql(
        token_budget_sql(budgets, default_budget=60, table="t")
    ).fetchall())
    for parts in (1, 7):                      # partition-invariant
        got = sorted((r["doc_id"], r["source"], r["n_tokens"],
                      r["cum_tokens"]) for r in token_budget_sample(
            rd.from_arrow(t).repartition(parts), budgets,
            default_budget=60).take_all())
        assert [tuple(r) for r in want] == got
    # budget respected per source (inclusive rule)
    per_src = {}
    for _, s, n, cum in got:
        per_src[s] = max(per_src.get(s, 0), cum)
    for s, mx in per_src.items():
        assert mx <= budgets.get(s, 60)


def test_sample_global_n_matches_sql_and_partitioning(ray_session):
    import duckdb
    from rsyslog_ray.stages.sampling import (sample_global_n,
                                             sample_global_n_sql)
    t = pa.table({"doc_id": pa.array(range(500), pa.int64()),
                  "source": pa.array([f"s{i % 3}" for i in range(500)])})
    want = duckdb.sql(sample_global_n_sql(40, table="t")).fetchall()
    for parts in (1, 6):
        got = [(r["doc_id"], r["source"]) for r in sample_global_n(
            rd.from_arrow(t).repartition(parts), n=40).take_all()]
        assert got == [tuple(r) for r in want]
    assert len(got) == 40 and len(set(g[0] for g in got)) == 40


def test_blocklist_filter_matches_sql(ray_session):
    import duckdb
    from rsyslog_ray.stages.textstats import blocklist_filter, blocklist_sql
    texts = ["all clean words here", "contains BadWord middle",
             "badword", "embedded badwording is fine", "", "BADWORD end"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = sorted(r["doc_id"] for r in blocklist_filter(
        rd.from_arrow(t), ["badword"]).take_all())
    want = sorted(r[0] for r in duckdb.sql(
        "SELECT doc_id FROM t WHERE "
        + blocklist_sql(["badword"], table="t")).fetchall())
    assert got == want == [0, 3, 4]


def test_inverted_index_build_and_search(ray_session, tmp_path):
    from rsyslog_ray.stages.index import (build_inverted_index,
                                          search_index, token_partition)
    texts = ["alpha beta gamma", "beta delta", "ALPHA omega", "unrelated",
             "beta beta beta"]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    root = str(tmp_path / "idx")
    n = build_inverted_index(rd.from_arrow(t).repartition(3), root,
                             n_partitions=4)
    assert n == sum(len(set(x.lower().split())) for x in texts)
    assert search_index(root, "beta", 4)["doc_id"].to_pylist() == [0, 1, 4]
    assert search_index(root, "alpha", 4)["doc_id"].to_pylist() == [0, 2]
    assert search_index(root, "missing", 4)["doc_id"].to_pylist() == []
    # the lookup really is partition-pruned: only one part dir has beta
    import os
    import pyarrow.parquet as pq
    part = token_partition("beta", 4)
    others = [p for p in os.listdir(root) if p != f"part={part}"]
    for o in others:
        tt = pq.read_table(os.path.join(root, o), columns=["token"])
        assert "beta" not in set(tt["token"].to_pylist())


def test_chunk_documents_covers_everything(ray_session):
    import duckdb
    from rsyslog_ray.stages.sampling import chunk_documents, chunk_sql
    texts = ["abcdefghij", "x", "", "a" * 25]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = sorted((r["doc_id"], r["chunk_idx"], r["chunk"])
                 for r in chunk_documents(
        rd.from_arrow(t).repartition(2), size=8, stride=5).take_all())
    want = sorted(tuple(r) for r in duckdb.sql(
        chunk_sql(8, 5, table="t")).fetchall())
    assert got == [tuple(w) for w in want]
    # reassembly: stride-prefixes of chunks (plus the final tail) == doc
    doc0 = [c for (d, i, c) in got if d == 0]
    assert doc0 == ["abcdefgh", "fghij"]
    assert [c for (d, i, c) in got if d == 2] == [""]
    assert "".join(c[:5] for c in [x for (d, _, x) in got if d == 3])[:25] \
        == "a" * 25


def test_remove_dup_spans_planted(ray_session):
    """Planted duplicated 5-gram spans are removed from BOTH carriers
    (total-occurrence criterion, within-doc repeats included); unique
    text survives canonicalized."""
    from rsyslog_ray.stages.sampling import remove_dup_spans

    dup = "alpha beta gamma delta epsilon"
    docs = [
        f"one two {dup} three four",      # carrier A
        f"{dup} five six seven eight",    # carrier B
        "only unique words here nine",    # untouched (has 5 words, no dup)
        f"{dup} {dup} inner repeat",      # within-doc repeat
        "tiny doc",                       # < n words: pass-through
        "  spaced   out\ttext  here now ",  # canonicalization only
    ]
    tbl = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                    "text": docs})
    out = remove_dup_spans(rd.from_arrow(tbl), n=5).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[0, "cleaned"] == "one two three four"
    assert out.loc[1, "cleaned"] == "five six seven eight"
    assert out.loc[2, "cleaned"] == "only unique words here nine"
    # overlapping grams of the 10-word repeat cover everything dup-ish;
    # "inner repeat" tail survives only if no dup gram covers it
    assert "inner repeat" in out.loc[3, "cleaned"] or \
        out.loc[3, "cleaned"] == ""
    assert out.loc[4, "cleaned"] == "tiny doc"
    assert out.loc[5, "cleaned"] == "spaced out text here now"
    assert out.loc[0, "n_tokens"] == 9 and out.loc[0, "n_removed"] == 5
    assert out.loc[5, "n_removed"] == 0


def test_remove_dup_spans_python_oracle_and_batching(ray_session):
    """Exact Python-oracle recompute + batch-split invariance."""
    from collections import Counter

    from rsyslog_ray.stages.sampling import remove_dup_spans

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(3, 40)))
            for _ in range(80)]
    n = 5

    # oracle
    cf = Counter()
    toks = [d.split() for d in docs]
    for ws in toks:
        for i in range(len(ws) - n + 1):
            cf[" ".join(ws[i:i + n])] += 1
    dup = {g for g, c in cf.items() if c >= 2}
    want = []
    for ws in toks:
        cov = [False] * len(ws)
        for i in range(len(ws) - n + 1):
            if " ".join(ws[i:i + n]) in dup:
                for j in range(i, i + n):
                    cov[j] = True
        want.append(" ".join(w for w, c in zip(ws, cov) if not c))

    tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": docs})
    prev = None
    for nblocks in (1, 7):
        ds = rd.from_arrow(tbl).repartition(nblocks)
        out = remove_dup_spans(ds, n=n).to_pandas() \
            .set_index("doc_id").sort_index()
        assert list(out["cleaned"]) == want
        assert (out["n_removed"] >= 0).all()
        if prev is not None:
            assert list(out["cleaned"]) == prev
        prev = list(out["cleaned"])


def test_dictionary_encode(ray_session):
    import pyarrow as pa

    from rsyslog_ray.stages.sampling import dictionary_encode

    tbl = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                    "source": ["web", "book", "web", "code", None, "book"]})
    for nblocks in (1, 3):
        out = dictionary_encode(rd.from_arrow(tbl).repartition(nblocks),
                                col="source").to_pandas() \
            .sort_values("doc_id")
        # sorted vocab: book=1, code=2, web=3; null -> 0
        assert list(out["source_id"]) == [3, 1, 3, 2, 0, 1]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        dictionary_encode(rd.from_arrow(tbl), col="source",
                          max_categories=2)


def test_epoch_mix_fractional_upsampling(ray_session):
    """floor(w) replicas per doc + deterministic fractional extras;
    epoch indices are 0..copies-1; partitioning-invariant; composes as
    pure row-local work (no shuffle)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rsyslog_ray.stages.sampling import (EPOCH_PRIME, _TWO64, _u64,
                                             epoch_mix)

    n = 400
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n)),
        "source": pa.array(["a" if i % 2 == 0 else "b"
                            for i in range(n)]),
    })
    w = {"a": 2.25, "b": 0.5}
    out = epoch_mix(rd.from_arrow(tbl).repartition(5), w).to_pandas() \
        .sort_values(["doc_id", "epoch"]).reset_index(drop=True)
    # numpy oracle
    u = _u64(tbl["doc_id"], EPOCH_PRIME)
    src = np.array(tbl["source"].to_pylist())
    copies = np.where(src == "a",
                      2 + (u < np.uint64(int(0.25 * _TWO64))),
                      0 + (u < np.uint64(int(0.5 * _TWO64))))
    assert out.groupby("doc_id").size().reindex(
        range(n), fill_value=0).to_numpy().tolist() == copies.tolist()
    # epochs are exactly 0..c-1 per doc
    per = out.groupby("doc_id")["epoch"].agg(["min", "max", "size"])
    assert (per["min"] == 0).all()
    assert (per["max"] == per["size"] - 1).all()
    # a-docs appear 2 or 3 times; b-docs 0 or 1
    ca = copies[src == "a"]
    assert set(np.unique(ca)) <= {2, 3} and 2 in ca and 3 in ca
    cb = copies[src == "b"]
    assert set(np.unique(cb)) <= {0, 1}
    # partitioning-invariant
    again = epoch_mix(rd.from_arrow(tbl), w).to_pandas() \
        .sort_values(["doc_id", "epoch"]).reset_index(drop=True)
    assert out.equals(again)


def _mod20_split(ds):
    """(eval, corpus) halves on doc_id % 20 == 0, as pyarrow batch maps
    (Ray's filter(expr=) parser can't take a BinOp left operand)."""
    def side(want_eval):
        def fn(b: pa.Table) -> pa.Table:
            mod = pc.subtract(
                pc.cast(b["doc_id"], pa.int64()),
                pc.multiply(pc.divide(pc.cast(b["doc_id"], pa.int64()),
                                      20), 20))
            m = pc.equal(mod, 0) if want_eval else pc.not_equal(mod, 0)
            return b.filter(m)
        return fn
    return (ds.map_batches(side(True), batch_format="pyarrow"),
            ds.map_batches(side(False), batch_format="pyarrow"))


def test_contamination_report_planted_and_zero_rows():
    """Planted shared 5-grams: eval doc 0 is contaminated by exactly the
    two corpus docs that embed its opening 5-gram; eval doc 20 shares
    nothing; a too-short eval doc reports 0."""
    import ray.data as rd

    from rsyslog_ray.stages.sampling import contamination_report

    shared = "alpha beta gamma delta epsilon"
    rows = [
        {"doc_id": 0, "text": shared + " zeta eta"},          # eval
        {"doc_id": 20, "text": "one two three four five six"},  # eval
        {"doc_id": 40, "text": "tiny"},                        # eval, <5
        {"doc_id": 1, "text": "prefix " + shared + " suffix"},  # hit
        {"doc_id": 2, "text": shared + " more words here"},     # hit
        {"doc_id": 3, "text": "unrelated corpus text body words"},
    ]
    tbl = pa.Table.from_pylist(rows)
    ds = rd.from_arrow(tbl)
    eval_ds, corpus = _mod20_split(ds)
    got = contamination_report(corpus, eval_ds, n=5).to_pandas()
    assert got.eval_id.tolist() == [0, 20, 40]
    assert got.n_contaminated.tolist() == [2, 0, 0]


def test_contamination_report_partition_invariance():
    import ray.data as rd

    from rsyslog_ray.stages.sampling import contamination_report

    rows = [{"doc_id": i,
             "text": " ".join(f"w{(i * 3 + j) % 11}" for j in range(8))}
            for i in range(60)]
    tbl = pa.Table.from_pylist(rows)
    outs = []
    for nparts in (1, 7):
        ds = rd.from_arrow(tbl).repartition(nparts)
        eval_ds, corpus = _mod20_split(ds)
        outs.append(contamination_report(corpus, eval_ds, n=5)
                    .to_pandas())
    assert outs[0].equals(outs[1])
    assert (outs[0].n_contaminated > 0).any()


def test_temperature_mix_flattens_and_caps():
    """alpha=0 allocates the budget uniformly across sources, so the
    small source is kept whole (q capped at 1) while the big one is
    thinned; alpha=1 keeps natural proportions (q_s == frac for all)."""
    rows = [{"doc_id": i, "source": "big" if i < 900 else "small"}
            for i in range(1000)]
    tbl = pa.Table.from_pylist(rows)
    ds = rd.from_arrow(tbl)

    from rsyslog_ray.stages.sampling import temperature_mix
    out = temperature_mix(ds, alpha=0.0, frac=0.5).to_pandas()
    by = out.groupby("source").size()
    # N=1000, p uniform -> 250 per source; small has only 100 -> all kept
    assert by["small"] == 100
    assert 180 < by["big"] < 320          # ~250 expected, hash variance

    nat = temperature_mix(ds, alpha=1.0, frac=0.5).to_pandas()
    byn = nat.groupby("source").size()
    assert 400 < byn["big"] < 500          # ~450
    assert 30 < byn["small"] < 70          # ~50


def test_temperature_mix_partition_invariant():
    from rsyslog_ray.stages.sampling import temperature_mix
    rows = [{"doc_id": i, "source": f"s{i % 3}"} for i in range(600)]
    tbl = pa.Table.from_pylist(rows)
    outs = []
    for nparts in (1, 8):
        got = temperature_mix(rd.from_arrow(tbl).repartition(nparts),
                              alpha=0.3, frac=0.4).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        outs.append(got)
    assert outs[0].equals(outs[1])
    assert 0 < len(outs[0]) < 600


def test_temperature_mix_duckdb_parity_across_params(ray_session):
    """The SQL twin recomputes q_s from the data in float64; verify the
    kept-row SETS match bit-for-bit across alphas/fracs (the pow /
    ordered-sum / divide-chain parity claim)."""
    import duckdb
    from rsyslog_ray.stages.sampling import temperature_mix, temperature_mix_sql

    rng = np.random.default_rng(9)
    srcs = rng.choice([f"s{i}" for i in range(7)], size=3000,
                      p=[.4, .25, .15, .1, .05, .03, .02])
    tbl = pa.table({"doc_id": pa.array(range(3000), pa.int64()),
                    "source": pa.array(srcs)})
    con = duckdb.connect()
    con.register("documents", tbl)
    for alpha in (0.0, 0.3, 0.5, 0.7, 1.0, 1.7):
        for frac in (0.1, 0.37, 0.5, 0.93):
            got = sorted(
                temperature_mix(rd.from_arrow(tbl), alpha=alpha,
                                frac=frac).to_pandas().doc_id)
            want = sorted(con.execute(
                temperature_mix_sql(alpha=alpha, frac=frac)
            ).df().doc_id)
            assert got == want, (alpha, frac, len(got), len(want))


def test_length_batches_buckets_and_fill(ray_session):
    """Buckets are token-count ranges; every batch within a bucket holds
    exactly batch_docs docs except the last; assignment is partition-
    and batch-size-invariant."""
    from rsyslog_ray.stages.sampling import length_batches

    rows = [{"doc_id": i,
             "text": " ".join(["w"] * (5 if i < 50 else 100))}
            for i in range(80)]
    tbl = pa.Table.from_pylist(rows)
    outs = []
    for nparts in (1, 7):
        got = length_batches(rd.from_arrow(tbl).repartition(nparts),
                             width=64, n_buckets=8, batch_docs=8) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        outs.append(got)
    assert outs[0].equals(outs[1])
    g = outs[0]
    assert (g[g.doc_id < 50].bucket == 0).all()     # 5 tokens -> bucket 0
    assert (g[g.doc_id >= 50].bucket == 1).all()    # 100 // 64 = 1
    short = g[g.bucket == 0].groupby("batch_idx").size()
    assert short.iloc[:-1].eq(8).all() and short.sum() == 50
    long = g[g.bucket == 1].groupby("batch_idx").size()
    assert long.iloc[:-1].eq(8).all() and long.sum() == 30


def test_temperature_mix_null_source_dropped(ray_session):
    from rsyslog_ray.stages.sampling import temperature_mix
    tbl = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                    "source": pa.array(["a", None, "b", "a", None, "b"])})
    out = temperature_mix(rd.from_arrow(tbl), alpha=0.5,
                          frac=1.0).to_pandas()
    # frac=1 keeps every non-null-source doc; null-source rows drop
    assert sorted(out.doc_id) == [0, 2, 3, 5]


def test_length_batches_duckdb_parity_across_params(ray_session):
    import duckdb
    from rsyslog_ray.stages.sampling import length_batches, length_batches_sql

    rng = np.random.default_rng(13)
    texts = [" ".join(f"t{j}" for j in range(int(k)))
             for k in rng.integers(0, 300, size=150)]
    tbl = pa.table({"doc_id": pa.array(range(150), pa.int64()),
                    "text": pa.array(texts)})
    con = duckdb.connect()
    con.register("documents", tbl)
    for width, nb, bd in ((64, 8, 32), (16, 4, 5), (100, 2, 7)):
        got = length_batches(rd.from_arrow(tbl).repartition(6),
                             width=width, n_buckets=nb, batch_docs=bd) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        want = con.execute(
            length_batches_sql(width=width, n_buckets=nb, batch_docs=bd)
            + " ORDER BY doc_id").df()
        assert got.equals(want), (width, nb, bd)
