"""DSIR importance scoring / Gumbel-top-k resampling (stages/dsir.py)
against a pure-Python Naive-Bayes oracle; both fold paths pinned equal;
partition invariance; selection favors target-like documents."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from rsyslog_ray.stages.dsir import (GUMBEL_PRIME, _micro_away, dsir_resample,
                                     dsir_score)

TARGET_WORDS = ["alpha", "beta", "gamma"]
RAW_WORDS = ["delta", "epsilon", "zeta", "eta"]


def _corpus(n=60):
    """Deterministic mixed corpus: even ids lean target-vocab, odd ids
    lean raw-vocab; sources s0 (target) and s1/s2."""
    ids, srcs, txts = [], [], []
    for i in range(n):
        ids.append(i)
        srcs.append("s0" if i % 3 == 0 else f"s{1 + i % 2}")
        words = []
        for j in range(4 + i % 5):
            pool = TARGET_WORDS if (i + j) % 2 == 0 else RAW_WORDS
            words.append(pool[(i * 7 + j) % len(pool)])
        txts.append(" ".join(words))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "source": pa.array(srcs, pa.string()),
                     "text": pa.array(txts, pa.string())})


def _oracle_scores(tbl, target_keys):
    """Pure-Python NB log-ratio scorer with the same micro rounding."""
    ct, ca = {}, {}
    rows = tbl.to_pylist()
    for r in rows:
        toks = r["text"].split()
        for t in toks:
            ca[t] = ca.get(t, 0) + 1
            if r["source"] in target_keys:
                ct[t] = ct.get(t, 0) + 1
    tt, ta, v = sum(ct.values()), sum(ca.values()), len(ca)
    w = {t: int(_micro_away(np.array([
            math.log((ct.get(t, 0) + 1.0) / float(tt + v))
            - math.log((ca[t] + 1.0) / float(ta + v))]))[0])
         for t in ca}
    out = {}
    for r in rows:
        toks = r["text"].split()
        if toks:
            out[r["doc_id"]] = (sum(w[t] for t in toks), len(toks))
    return out


def test_score_matches_oracle_and_is_partition_invariant():
    tbl = _corpus()
    exp = _oracle_scores(tbl, {"s0"})
    for nparts in (2, 13):
        got = dsir_score(rd.from_arrow(tbl).repartition(nparts),
                         ["s0"]).to_pandas()
        assert len(got) == len(exp)
        for r in got.itertuples():
            assert (r.score_micro, r.n_tokens) == exp[r.doc_id], r.doc_id


def test_join_path_equals_broadcast_path():
    tbl = _corpus()
    a = dsir_score(rd.from_arrow(tbl).repartition(5), ["s0"]) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = dsir_score(rd.from_arrow(tbl).repartition(5), ["s0"],
                   vocab_threshold=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_target_docs_score_higher():
    """A doc made purely of target-distinctive vocabulary must outscore
    one made purely of background vocabulary."""
    rows = ([{"doc_id": i, "source": "tgt",
              "text": "alpha beta alpha gamma"} for i in range(10)]
            + [{"doc_id": 100 + i, "source": "raw",
                "text": "delta epsilon zeta delta"} for i in range(10)])
    tbl = pa.Table.from_pylist(rows)
    got = dsir_score(rd.from_arrow(tbl), ["tgt"]).to_pandas() \
        .set_index("doc_id")["score_micro"]
    assert got.loc[range(10)].min() > got.loc[range(100, 110)].max()


def test_resample_matches_gumbel_oracle():
    tbl = _corpus()
    exp = _oracle_scores(tbl, {"s0"})
    keys = {}
    for did, (sc, _n) in exp.items():
        u64 = (np.uint64(did) * np.uint64(GUMBEL_PRIME))
        u = (float(u64) + 0.5) / float(1 << 64)
        g = -math.log(-math.log(u))
        keys[did] = sc + int(_micro_away(np.array([g]))[0])
    want = sorted(sorted(keys), key=lambda d: (-keys[d], d))[:20]
    got = dsir_resample(rd.from_arrow(tbl).repartition(6), ["s0"],
                        n=20).to_pandas()
    assert sorted(got.doc_id) == sorted(want)
    sc = got.set_index("doc_id")["score_micro"]
    assert all(sc.loc[d] == exp[d][0] for d in want)


def test_resample_n_larger_than_corpus_keeps_all():
    tbl = _corpus(8)
    got = dsir_resample(rd.from_arrow(tbl), ["s0"], n=500).to_pandas()
    assert len(got) == 8


def test_empty_and_tokenless_docs_emit_no_row():
    tbl = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                    "source": pa.array(["s0", "s1", "s0"], pa.string()),
                    "text": pa.array(["alpha beta", "", "   "],
                                     pa.string())})
    got = dsir_score(rd.from_arrow(tbl), ["s0"]).to_pandas()
    assert sorted(got.doc_id) == [1]


@pytest.mark.parametrize("nparts", [1, 4])
def test_duckdb_twin_bit_equality(nparts):
    """Engine vs the generated SQL twin on the synthetic corpus —
    scores AND the Gumbel selection."""
    import duckdb

    from rsyslog_ray.stages.dsir import dsir_score_sql
    tbl = _corpus(80)
    con = duckdb.connect()
    con.register("documents", tbl)
    ds = rd.from_arrow(tbl).repartition(nparts)
    got = dsir_score(ds, ["s0"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = con.execute(dsir_score_sql(["s0"])).df()
    assert got.equals(exp)
    gsel = dsir_resample(ds, ["s0"], n=25).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    esel = con.execute(dsir_score_sql(["s0"], n=25)).df()
    assert gsel.equals(esel)
