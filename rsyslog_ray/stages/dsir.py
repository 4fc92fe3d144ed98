"""DSIR-style importance-weighted data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
NeurIPS — public method): score every document by the Naive-Bayes
log-likelihood ratio of a TARGET unigram distribution against the RAW
corpus distribution, then select top-n under deterministic hash-Gumbel
noise (Gumbel-top-k == sampling without replacement with probability
proportional to exp(score/T)).

Scale shape (the lm_score/tfidf pattern):
  1. ONE distributed fit pass — per-batch (token, c_tgt, c_all) count
     partials (np.unique + two bincounts) -> hash-bucketed merge, so a
     token's corpus totals land in exactly one bucket; nothing
     row-scaled touches the driver.
  2. scoring — below `vocab_threshold` the per-token weight table
     broadcasts once via ray.put and every doc scores batch-locally
     (one tokenize pass, one C-speed dict map, one segmented bincount);
     above it, doc tokens explode to rows and flow through a
     token-keyed equi_join + a doc-bucketed merge — both sides
     streamed.  Web-corpus unigram vocabularies follow Heaps' law
     (millions of types at TB scale, not billions), so the broadcast
     path is the common case and the join path is the unbounded
     fallback; both are pinned equal by tests/test_dsir.py.

Exactness contract (drives the DuckDB oracle): the per-token weight is
rounded half-away-from-zero to 6 dp and carried as INTEGER MICRO-NATS
(int64); a document's score is the plain integer sum over its token
OCCURRENCES — associative, order-free, bit-equal under any
partitioning.  The Gumbel key is micro-rounded the same way, so the
only float sensitivity anywhere is ln() parity per distinct value
(the same contract lm_score/tfidf already pin against DuckDB).

This is a SURVEY §2.11 training-data extension, not a reference
operator; the fit pass reuses the impstats-style bounded-count fold
machinery (stages/aggregate.bucket_merge, cf. rsyslog
runtime/dynstats.c counters for the counting-fold analogy).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sampling import _TWO64, _u64, _word_ngrams

#: independent odd multiplier (splitmix64's public mixing constant) —
#: the Gumbel-noise stream; independent of the split/sample/budget/
#: shuffle/global-sample streams so selection composes with them.
GUMBEL_PRIME = 0xBF58476D1CE4E5B9


def _micro_away(x: np.ndarray) -> np.ndarray:
    """round(x, 6) with DuckDB's half-away ties, returned as int64
    micro-units (exact integer arithmetic downstream)."""
    return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x).astype(np.int64)


def _fit_counts(ds, target_keys, key_col, text_col, vocab_threshold):
    """One distributed pass -> (counts dataset (gram, ct, ca),
    tot_tgt, tot_all, vocab_size). ct = target-occurrence count,
    ca = corpus-occurrence count per distinct token."""
    from .aggregate import bucket_merge

    tkeys = pa.array(sorted(target_keys), pa.string())

    def partial(t: pa.Table) -> pa.Table:
        g, rows = _word_ngrams(pc.cast(t[text_col], pa.string()), 1)
        if not len(g):
            return pa.table({"gram": pa.array([], pa.string()),
                             "ct": pa.array([], pa.int64()),
                             "ca": pa.array([], pa.int64())})
        is_tgt = pc.is_in(pc.cast(t[key_col], pa.string()),
                          value_set=tkeys) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        u, inv = np.unique(g.astype("U"), return_inverse=True)
        ca = np.bincount(inv, minlength=len(u))
        ct = np.bincount(inv, weights=is_tgt[rows], minlength=len(u))
        return pa.table({"gram": pa.array(u.astype(object), pa.string()),
                         "ct": pa.array(ct.astype(np.int64)),
                         "ca": pa.array(ca.astype(np.int64))})

    cnt = bucket_merge(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["gram"], {"ct": ("ct", "sum"), "ca": ("ca", "sum")}).materialize()

    # bounded totals fold: one row per block
    def totals(t: pa.Table) -> pa.Table:
        return pa.table({"tt": pa.array([int(pc.sum(t["ct"]).as_py() or 0)]),
                         "ta": pa.array([int(pc.sum(t["ca"]).as_py() or 0)]),
                         "v": pa.array([t.num_rows])})
    tt = ta = v = 0
    for b in cnt.map_batches(totals, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
        tt += int(pc.sum(b["tt"]).as_py() or 0)
        ta += int(pc.sum(b["ta"]).as_py() or 0)
        v += int(pc.sum(b["v"]).as_py() or 0)
    return cnt, tt, ta, v


def _weights_column(ct: np.ndarray, ca: np.ndarray,
                    tt: int, ta: int, v: int) -> np.ndarray:
    """Per-token importance weight in int64 micro-nats: the add-one
    smoothed NB log-ratio ln((ct+1)/(tt+V)) - ln((ca+1)/(ta+V)),
    written exactly as the DuckDB twin computes it."""
    x = (np.log((ct.astype(np.float64) + 1.0) / float(tt + v))
         - np.log((ca.astype(np.float64) + 1.0) / float(ta + v)))
    return _micro_away(x)


def dsir_score(ds, target_keys, key_col: str = "source",
               text_col: str = "text", id_col: str = "doc_id",
               vocab_threshold: int = 5_000_000):
    """Per-document DSIR importance score over whitespace unigrams:
    (id, score_micro int64, n_tokens int64); docs with zero tokens emit
    no row. score_micro = sum over token occurrences of the micro-nat
    NB log-ratio weight (target = rows whose `key_col` is in
    `target_keys`, background = the whole corpus)."""
    import pandas as pd
    import ray as _ray

    cnt, tt, ta, v = _fit_counts(ds, target_keys, key_col, text_col,
                                 vocab_threshold)

    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "score_micro": pa.array([], pa.int64()),
                      "n_tokens": pa.array([], pa.int64())})

    if v <= vocab_threshold:
        # broadcast path: {token: micro-weight} dict shipped once
        wmap: dict = {}
        for b in cnt.iter_batches(batch_size=None, batch_format="pyarrow"):
            wi = _weights_column(b["ct"].to_numpy(zero_copy_only=False),
                                 b["ca"].to_numpy(zero_copy_only=False),
                                 tt, ta, v)
            wmap.update(zip(b["gram"].to_pylist(), wi))
        wref = _ray.put(wmap)

        def score(t: pa.Table) -> pa.Table:
            # per-worker memoized get: the vocab-sized dict would
            # otherwise re-unpickle for every task
            from ..cluster import cached_broadcast_get
            w = cached_broadcast_get(wref)
            g, rows = _word_ngrams(pc.cast(t[text_col], pa.string()), 1)
            if not len(g):
                return empty
            # OOV (scoring a corpus the fit never saw) contributes 0
            wi = pd.Series(g).map(w).fillna(0).to_numpy(np.float64)
            nrow = t.num_rows
            sums = np.bincount(rows, weights=wi, minlength=nrow)
            cnts = np.bincount(rows, minlength=nrow)
            keep = cnts > 0
            ids = pc.cast(t[id_col], pa.int64()) \
                .to_numpy(zero_copy_only=False)[keep]
            return pa.table({id_col: pa.array(ids, pa.int64()),
                             "score_micro": pa.array(
                                 sums[keep].astype(np.int64)),
                             "n_tokens": pa.array(
                                 cnts[keep].astype(np.int64))})

        return ds.map_batches(score, batch_format="pyarrow")

    # join path: explode token occurrences, join weights by token
    from .aggregate import bucket_merge
    from .joins import equi_join

    def add_w(t: pa.Table) -> pa.Table:
        wi = _weights_column(t["ct"].to_numpy(zero_copy_only=False),
                             t["ca"].to_numpy(zero_copy_only=False),
                             tt, ta, v)
        return pa.table({"gram": t["gram"], "wi": pa.array(wi)})
    wtab = cnt.map_batches(add_w, batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        g, rows = _word_ngrams(pc.cast(t[text_col], pa.string()), 1)
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({id_col: pa.array(
                             ids[rows] if len(rows) else
                             np.empty(0, np.int64), pa.int64()),
                         "gram": pa.array(g, pa.string())})

    occ = ds.map_batches(explode, batch_format="pyarrow")
    j = equi_join(occ, wtab, key="gram", materialize_right=False)

    def part(t: pa.Table) -> pa.Table:
        import pandas as _pd
        g = (_pd.DataFrame({id_col: t[id_col].to_numpy(zero_copy_only=False),
                            "score_micro": t["wi"].to_numpy(
                                zero_copy_only=False),
                            "n_tokens": np.ones(t.num_rows, np.int64)})
             .groupby(id_col, as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    return bucket_merge(j.map_batches(part, batch_format="pyarrow"),
                        [id_col],
                        {"score_micro": ("score_micro", "sum"),
                         "n_tokens": ("n_tokens", "sum")})


def dsir_resample(ds, target_keys, n: int = 100,
                  key_col: str = "source", text_col: str = "text",
                  id_col: str = "doc_id",
                  vocab_threshold: int = 5_000_000):
    """Gumbel-top-k importance resampling over DSIR scores: keep the n
    docs with the largest key_micro = score_micro + round_micro(g_i),
    g_i = -ln(-ln(u_i)) with u_i = ((id * GUMBEL_PRIME mod 2^64) + 0.5)
    / 2^64 — a deterministic, reproducible draw without replacement
    with P(doc) proportional to exp(score) (Gumbel-max trick; unit
    temperature). Bounded partial-top-n fold per block, driver merges
    O(n x blocks) candidates — no global sort shuffle (the
    sample_global_n shape). Output (id, score_micro) of the selected
    docs."""
    import ray.data as rd

    scored = dsir_score(ds, target_keys, key_col=key_col,
                        text_col=text_col, id_col=id_col,
                        vocab_threshold=vocab_threshold)

    def partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "score_micro": pa.array([], pa.int64()),
                             "_key": pa.array([], pa.int64())})
        u64 = _u64(t[id_col], GUMBEL_PRIME)
        u = (u64.astype(np.float64) + 0.5) / float(_TWO64)
        key = (t["score_micro"].to_numpy(zero_copy_only=False)
               + _micro_away(-np.log(-np.log(u))))
        k = min(n, len(key))
        idx = np.argpartition(-key, k - 1)[:k] if k < len(key) else \
            np.arange(len(key))
        sel = t.select([id_col, "score_micro"]).take(pa.array(idx))
        return sel.append_column("_key", pa.array(key[idx]))

    parts = []
    for b in scored.map_batches(partial, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            parts.append(b)
    if not parts:
        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64()),
                                       "score_micro": pa.array([],
                                                               pa.int64())}))
    allc = pa.concat_tables(parts, promote_options="default")
    out = (allc.sort_by([("_key", "descending"), (id_col, "ascending")])
           .slice(0, n).select([id_col, "score_micro"]))
    return rd.from_arrow(out)


def dsir_score_sql(target_keys, n: int | None = None,
                   key_col: str = "source", text_col: str = "text",
                   id_col: str = "doc_id",
                   table: str = "documents") -> str:
    """The exact DuckDB twin: same tokenization (regexp_extract_all
    '\\S+'), same smoothing expression, same half-away micro rounding,
    integer score sum. With n set, appends the Gumbel-top-k selection
    (same hash stream, HUGEINT modular product)."""
    keys = ", ".join(f"'{k}'" for k in sorted(target_keys))
    base = rf"""
WITH toks AS (
  SELECT {id_col}, {key_col},
         unnest(regexp_extract_all({text_col}, '\S+')) AS tok
  FROM {table}),
cnt AS (
  SELECT tok,
         SUM(CASE WHEN {key_col} IN ({keys}) THEN 1 ELSE 0 END) AS ct,
         COUNT(*) AS ca
  FROM toks GROUP BY tok),
tot AS (SELECT SUM(ct) AS tt, SUM(ca) AS ta, COUNT(*) AS v FROM cnt),
w AS (
  SELECT tok, CAST(CASE WHEN x >= 0 THEN floor(x * 1e6 + 0.5)
                        ELSE -floor(-x * 1e6 + 0.5) END AS BIGINT) AS wi
  FROM (SELECT tok, ln((ct + 1.0) / (tt + v)) - ln((ca + 1.0) / (ta + v))
               AS x
        FROM cnt CROSS JOIN tot)),
sc AS (
  SELECT t.{id_col}, CAST(SUM(w.wi) AS BIGINT) AS score_micro,
         CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM toks t JOIN w ON t.tok = w.tok GROUP BY t.{id_col})"""
    if n is None:
        return base + f"\nSELECT {id_col}, score_micro, n_tokens " \
                      f"FROM sc ORDER BY {id_col}"
    return base + f""",
g AS (
  SELECT {id_col}, score_micro,
         score_micro + CAST(CASE WHEN gx >= 0 THEN floor(gx * 1e6 + 0.5)
                                 ELSE -floor(-gx * 1e6 + 0.5) END
                            AS BIGINT) AS key_micro
  FROM (SELECT {id_col}, score_micro,
               -ln(-ln((CAST((CAST({id_col} AS HUGEINT) * {GUMBEL_PRIME})
                             % {_TWO64} AS DOUBLE) + 0.5) / {_TWO64}.0))
                 AS gx
        FROM sc))
SELECT {id_col}, score_micro FROM (
  SELECT {id_col}, score_micro FROM g
  ORDER BY key_micro DESC, {id_col} LIMIT {n})
ORDER BY {id_col}"""
