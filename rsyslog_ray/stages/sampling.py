"""Deterministic corpus-partitioning operators for training-data
pipelines: train/val/test splitting, per-source weighted sampling, and
sequence packing. All three derive decisions from ROW IDENTITY only
(multiplicative Fibonacci hashing of the integer id — Knuth §6.4), so
results are invariant to batch size, partitioning and execution order,
and every op has an exact DuckDB oracle (HUGEINT arithmetic expresses
the same mod-2^64 products the numpy uint64 kernel computes).

No reference counterpart — rsyslog has no corpus ops; these are the
brief's "operations a large-scale training-data pipeline would need".
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: golden-ratio multiplier (2^64 / φ, odd) — Fibonacci hashing
SPLIT_PRIME = 0x9E3779B97F4A7C15
#: a second odd constant → an independent hash stream for sampling, so
#: sample membership is uncorrelated with split assignment
SAMPLE_PRIME = 0xC2B2AE3D27D4EB4F
_TWO64 = 1 << 64


def _u64(ids, prime: int) -> np.ndarray:
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    v = pc.cast(ids, pa.int64()).to_numpy(zero_copy_only=False)
    with np.errstate(over="ignore"):
        return v.astype(np.uint64) * np.uint64(prime)


def hash_split(ds, ratios: list[tuple[str, float]] | None = None,
               id_col: str = "doc_id", out: str = "split"):
    """Deterministic dataset split: row → named bucket with probability ~
    its ratio. u = (id * SPLIT_PRIME) mod 2^64 compared against exact
    integer cut points floor(cum_ratio · 2^64) — no floats anywhere, so
    the DuckDB HUGEINT oracle matches bit-for-bit. Stateless map_batches;
    nothing shuffles."""
    ratios = ratios or [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    names = np.asarray([n for n, _ in ratios], dtype=object)
    cum, cuts = 0.0, []
    for _, r in ratios[:-1]:
        cum += r
        cuts.append(min(_TWO64 - 1, int(cum * _TWO64)))
    cuts_arr = np.asarray(cuts, dtype=np.uint64)

    def fn(batch: pa.Table) -> pa.Table:
        u = _u64(batch[id_col], SPLIT_PRIME)
        idx = np.searchsorted(cuts_arr, u, side="right")
        return batch.append_column(out, pa.array(names[idx], pa.string()))
    return ds.map_batches(fn, batch_format="pyarrow")


def split_cut_sql(ratios: list[tuple[str, float]] | None = None,
                  id_col: str = "doc_id") -> str:
    """The matching DuckDB CASE expression for hash_split (same integer
    cut points; HUGEINT product mod 2^64)."""
    ratios = ratios or [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    u = (f"(CAST({id_col} AS HUGEINT) * {SPLIT_PRIME}) % "
         f"{_TWO64}")
    cum, whens = 0.0, []
    for name, r in ratios[:-1]:
        cum += r
        cut = min(_TWO64 - 1, int(cum * _TWO64))
        whens.append(f"WHEN {u} < {cut} THEN '{name}'")
    return ("CASE " + " ".join(whens)
            + f" ELSE '{ratios[-1][0]}' END")


def sample_by_key(ds, weights: dict[str, float], key_col: str = "source",
                  id_col: str = "doc_id", default: float = 1.0):
    """Per-source weighted downsampling (data-mixing): keep a row iff
    (id · SAMPLE_PRIME) mod 2^64 < floor(weight(key) · 2^64). The id
    hash stream is independent of hash_split's, so sampling composes
    with splitting without correlation. Stateless map_batches."""
    thresholds = {k: min(_TWO64 - 1, int(w * _TWO64))
                  for k, w in weights.items()}
    dflt = min(_TWO64 - 1, int(default * _TWO64))
    keys = pa.array(list(thresholds.keys()), pa.string())
    vals = np.asarray(list(thresholds.values()), dtype=np.uint64)

    def fn(batch: pa.Table) -> pa.Table:
        u = _u64(batch[id_col], SAMPLE_PRIME)
        idx = pc.index_in(pc.cast(batch[key_col], pa.string()),
                          value_set=keys)
        idxn = pc.fill_null(idx, -1).to_numpy(zero_copy_only=False)
        thr = np.where(idxn >= 0, vals[np.clip(idxn, 0, len(vals) - 1)],
                       np.uint64(dflt))
        return batch.filter(pa.array(u < thr))
    return ds.map_batches(fn, batch_format="pyarrow")


#: fourth independent odd multiplier — epoch-mix fractional replication
EPOCH_PRIME = 0xA24BAED4963EE407


def epoch_mix(ds, weights: dict[str, float], key_col: str = "source",
              id_col: str = "doc_id", default: float = 1.0,
              epoch_col: str = "epoch"):
    """Epoch-weighted source mixing — the LLaMA/Pile sampling-proportions
    op, the UPSAMPLING counterpart of sample_by_key: a source with weight
    2.3 contributes every doc twice plus a deterministic 30% of docs a
    third time. Each row replicates floor(w) times, plus once more iff
    (id · EPOCH_PRIME) mod 2^64 < frac(w) · 2^64; the replica index lands
    in `epoch_col` (0-based). Independent hash stream, so mixing composes
    with hash_split / sample_by_key without correlation. Stateless
    vectorized map_batches (one Arrow take per batch), no shuffle —
    output volume is Σ w_source · |source| rows by construction."""
    floors = {k: int(np.floor(w)) for k, w in weights.items()}
    fracs = {k: min(_TWO64 - 1, int((w - np.floor(w)) * _TWO64))
             for k, w in weights.items()}
    dflt_floor = int(np.floor(default))
    dflt_frac = min(_TWO64 - 1, int((default - np.floor(default)) * _TWO64))
    keys = pa.array(list(weights.keys()), pa.string())
    fl = np.asarray([floors[k.as_py()] for k in keys], dtype=np.int64)
    fr = np.asarray([fracs[k.as_py()] for k in keys], dtype=np.uint64)

    def fn(batch: pa.Table) -> pa.Table:
        u = _u64(batch[id_col], EPOCH_PRIME)
        idx = pc.fill_null(
            pc.index_in(pc.cast(batch[key_col], pa.string()),
                        value_set=keys), -1) \
            .to_numpy(zero_copy_only=False)
        hit = idx >= 0
        safe = np.clip(idx, 0, max(len(fl) - 1, 0))
        base = np.where(hit, fl[safe] if len(fl) else 0, dflt_floor)
        thr = np.where(hit, fr[safe] if len(fr) else 0,
                       np.uint64(dflt_frac))
        copies = base + (u < thr)
        total = int(copies.sum())
        sel = np.repeat(np.arange(batch.num_rows, dtype=np.int64), copies)
        offs = np.concatenate(([0], np.cumsum(copies)))[:-1]
        epoch = np.arange(total, dtype=np.int64) - offs.repeat(copies)
        out = batch.take(pa.array(sel))
        return out.append_column(epoch_col, pa.array(epoch))
    return ds.map_batches(fn, batch_format="pyarrow")


def epoch_mix_sql(weights: dict[str, float], key_col: str = "source",
                  id_col: str = "doc_id", default: float = 1.0,
                  epoch_col: str = "epoch") -> str:
    """Matching DuckDB copies expression + lateral range join fragment:
    returns the `copies` CASE expression; embed as
    `FROM (SELECT ..., <expr> AS copies FROM t) d,
     range(0, <maxc>) g({epoch_col}) WHERE g.{epoch_col} < d.copies`."""
    u = f"(CAST({id_col} AS HUGEINT) * {EPOCH_PRIME}) % {_TWO64}"
    fwhens = " ".join(f"WHEN '{k}' THEN {int(np.floor(w))}"
                      for k, w in weights.items())
    twhens = " ".join(
        f"WHEN '{k}' THEN CAST("
        f"{min(_TWO64 - 1, int((w - np.floor(w)) * _TWO64))} AS HUGEINT)"
        for k, w in weights.items())
    dflt_f = int(np.floor(default))
    dflt_t = min(_TWO64 - 1, int((default - np.floor(default)) * _TWO64))
    return (f"CASE {key_col} {fwhens} ELSE {dflt_f} END + "
            f"CASE WHEN {u} < CASE {key_col} {twhens} "
            f"ELSE CAST({dflt_t} AS HUGEINT) END THEN 1 ELSE 0 END")


#: fifth independent odd multiplier — temperature-mix keep decisions
TEMPERATURE_PRIME = 0xBF58476D1CE4E5B9
#: sixth independent odd multiplier — length-bucket batch ordering
BATCH_PRIME = 0x94D049BB133111EB


def length_batches(ds, width: int = 64, n_buckets: int = 8,
                   batch_docs: int = 32, text_col: str = "text",
                   id_col: str = "doc_id"):
    """Length-bucketed training-batch assembly — the padding-efficiency
    op every sequence trainer runs: docs bucket by whitespace-token
    count (bucket = min(n_tokens // width, n_buckets-1), so batchmates
    pad to similar lengths), then each bucket's docs take a
    deterministic hash order and fill fixed-size batches of
    `batch_docs` docs (batch_idx = row_number // batch_docs).

    One stateless tokenize-count pass (no text leaves the stage — the
    window carries only ints), then the per-bucket row_number window
    via rank_by_key's hash-bucketed pandas pass; bucket count is
    bounded by construction so no key skews beyond corpus/n_buckets.
    Output (doc_id, n_tokens, bucket, batch_idx); exact ROW_NUMBER SQL
    twin (same BATCH_PRIME hash order, id tie-break)."""
    from .aggregate import rank_by_key

    def prep(t: pa.Table) -> pa.Table:
        g, rows = _word_ngrams(pc.cast(t[text_col], pa.string()), 1)
        n = np.bincount(rows, minlength=t.num_rows).astype(np.int64) \
            if len(g) else np.zeros(t.num_rows, np.int64)
        bucket = np.minimum(n // width, n_buckets - 1)
        return pa.table({
            id_col: pc.cast(t[id_col], pa.int64()),
            "n_tokens": pa.array(n),
            "bucket": pa.array(bucket.astype(np.int64)),
            "_h": pa.array(_u64(t[id_col], BATCH_PRIME))})

    ranked = rank_by_key(ds.map_batches(prep, batch_format="pyarrow"),
                         key="bucket", order_cols=("_h", id_col),
                         method="row_number", out_col="_rn")

    def finish(t: pa.Table) -> pa.Table:
        rn = t["_rn"].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pc.cast(t[id_col], pa.int64()),
            "n_tokens": pc.cast(t["n_tokens"], pa.int64()),
            "bucket": pc.cast(t["bucket"], pa.int64()),
            "batch_idx": pa.array((rn - 1) // batch_docs)})
    return ranked.map_batches(finish, batch_format="pyarrow")


def length_batches_sql(width: int = 64, n_buckets: int = 8,
                       batch_docs: int = 32, table: str = "documents",
                       text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """Matching DuckDB query for length_batches (same hash order)."""
    return rf"""
WITH d AS (
  SELECT {id_col},
         len(regexp_extract_all({text_col}, '\S+')) AS n_tokens
  FROM {table}
),
b AS (SELECT {id_col}, n_tokens,
             LEAST(n_tokens // {width}, {n_buckets - 1}) AS bucket,
             (CAST({id_col} AS HUGEINT) * {BATCH_PRIME}) % {_TWO64} AS h
      FROM d),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket
          ORDER BY h, {id_col}) AS rn FROM b)
SELECT {id_col}, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(bucket AS BIGINT) AS bucket,
       CAST((rn - 1) // {batch_docs} AS BIGINT) AS batch_idx
FROM r"""


def temperature_mix(ds, alpha: float = 0.3, frac: float = 0.5,
                    key_col: str = "source", id_col: str = "doc_id"):
    """Temperature-weighted source mixing — the T5/mT5 alpha-sampling
    rule (Raffel et al. 2020 §3.1.2; Xue et al. 2021 §3.2): source s is
    sampled with probability p_s ∝ n_s^alpha, flattening the natural
    size distribution (alpha=1 keeps it, alpha=0 makes sources
    uniform). Realized as per-doc keep probability
    q_s = min(1, frac · N · p_s / n_s) with N = Σ n_s, i.e. the output
    is an expected frac·N docs allocated across sources by p_s, capped
    at each source's actual size. Deterministic id-hash threshold on an
    independent stream (TEMPERATURE_PRIME), so it composes with
    hash_split / sample_by_key / epoch_mix without correlation.

    Two passes over the input lineage: a tiny per-source count
    (count_by driver fold — source cardinality is bounded) computes
    q_s, then a stateless map_batches filter. Nothing corpus-sized
    moves or materializes. Float parity with the SQL twin: q_s is
    computed with the exact operation order temperature_mix_sql emits
    (pow → source-ordered sum → left-to-right multiply/divide chain)."""
    from .aggregate import count_by

    def drop_null_key(b: pa.Table) -> pa.Table:
        # null-source rows can't take a keep decision (and would break
        # the sorted driver fold) — they are dropped by the filter pass
        # below, so exclude them from the budget too
        return b.filter(pc.is_valid(b[key_col]))

    counts = count_by(ds.map_batches(drop_null_key,
                                     batch_format="pyarrow"),
                      [key_col], fold_driver=True)
    srcs = counts[key_col].to_pylist()
    ns = [int(x) for x in counts["rows"].to_pylist()]
    total = sum(ns)
    pows = {s: float(n) ** alpha for s, n in zip(srcs, ns)}
    sum_pow = 0.0
    for s in sorted(pows):          # source-ordered left fold (SQL twin)
        sum_pow += pows[s]
    qs = {s: min(1.0, frac * total * pows[s] / sum_pow / n)
          for s, n in zip(srcs, ns)}
    keys = pa.array(list(qs.keys()), pa.string())
    full = np.asarray([qs[k.as_py()] >= 1.0 for k in keys], bool)
    thr = np.asarray([min(_TWO64 - 1, int(qs[k.as_py()] * _TWO64))
                      for k in keys], np.uint64)

    def fn(batch: pa.Table) -> pa.Table:
        u = _u64(batch[id_col], TEMPERATURE_PRIME)
        idx = pc.fill_null(
            pc.index_in(pc.cast(batch[key_col], pa.string()),
                        value_set=keys), -1) \
            .to_numpy(zero_copy_only=False)
        hit = idx >= 0
        safe = np.clip(idx, 0, max(len(thr) - 1, 0))
        # unseen-in-count sources (hit==False) can't occur on the same
        # input; drop them rather than guess a threshold
        keep = hit & (full[safe] | (u < thr[safe]))
        return batch.filter(pa.array(keep))
    return ds.map_batches(fn, batch_format="pyarrow")


def temperature_mix_sql(alpha: float = 0.3, frac: float = 0.5,
                        key_col: str = "source", id_col: str = "doc_id",
                        table: str = "documents",
                        select: str = "doc_id, source") -> str:
    """Matching DuckDB query for temperature_mix: recomputes q_s from
    the data with the same float64 operation order (POWER, a
    list-ordered sum so the fold order matches Python's sorted-key
    loop, then the same multiply/divide chain) and applies the same
    hash threshold; FLOOR before the HUGEINT cast mirrors Python's
    truncating int()."""
    u = f"(CAST({id_col} AS HUGEINT) * {TEMPERATURE_PRIME}) % {_TWO64}"
    return f"""
WITH c AS (SELECT {key_col}, COUNT(*) AS n,
                  POWER(COUNT(*), {alpha!r}) AS p
           FROM {table} GROUP BY {key_col}),
t AS (SELECT SUM(n) AS total,
             list_aggregate(list(p ORDER BY {key_col}), 'sum') AS sp
      FROM c),
q AS (SELECT c.{key_col},
             LEAST(1.0, {frac!r} * t.total * c.p / t.sp / c.n) AS qs
      FROM c CROSS JOIN t)
SELECT {select} FROM {table} d JOIN q USING ({key_col})
WHERE q.qs >= 1.0
   OR {u} < CAST(FLOOR(q.qs * 18446744073709551616.0) AS HUGEINT)"""


def sample_threshold_sql(weights: dict[str, float],
                         key_col: str = "source",
                         id_col: str = "doc_id",
                         default: float = 1.0) -> str:
    """Matching DuckDB predicate for sample_by_key."""
    u = f"(CAST({id_col} AS HUGEINT) * {SAMPLE_PRIME}) % {_TWO64}"
    whens = " ".join(
        f"WHEN '{k}' THEN CAST({min(_TWO64 - 1, int(w * _TWO64))} "
        f"AS HUGEINT)" for k, w in weights.items())
    dflt = min(_TWO64 - 1, int(default * _TWO64))
    return (f"{u} < CASE {key_col} {whens} "
            f"ELSE CAST({dflt} AS HUGEINT) END")


def _word_ngrams_pos(txt: pa.Array, n: int):
    """Position-aware variant of _word_ngrams: additionally returns the
    flat word array, each word's row index, and each gram's flat start
    index — enough to rebuild documents after span removal.
    Returns (grams, gram_flat_starts, words, word_row)."""
    lists = pc.split_pattern_regex(pc.fill_null(txt, ""), pattern=r"\s+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = lists.flatten()
    counts = offsets[1:] - offsets[:-1]
    rowidx = np.repeat(np.arange(len(counts)), counts)
    words = np.asarray(flat.to_pylist(), dtype=object)
    nonempty = words != ""          # split artifacts at string edges
    words, rowidx = words[nonempty], rowidx[nonempty]
    m = len(words)
    if m < n:
        return (np.empty(0, object), np.empty(0, np.int64), words, rowidx)
    ws = words.astype("U")          # fixed-width → np.char C kernels
    g = ws[:m - n + 1]
    for j in range(1, n):
        g = np.char.add(np.char.add(g, " "), ws[j:j + m - n + 1])
    valid = rowidx[:m - n + 1] == rowidx[n - 1:]
    starts = np.arange(m - n + 1, dtype=np.int64)[valid]
    return g[valid].astype(object), starts, words, rowidx


def _word_ngrams(txt: pa.Array, n: int):
    """Whitespace-token word n-grams per row, space-joined — the exact
    string DuckDB's array_to_string(ws[i:i+n-1], ' ') builds over
    regexp_extract_all(text, '\\S+') tokens. Vectorized: one split pass,
    U-dtype word matrix, n-1 np.char.add joins; grams never cross rows.
    Returns (grams: np object array, gram_row: np int64 array)."""
    g, starts, words, rowidx = _word_ngrams_pos(txt, n)
    rows = rowidx[starts] if len(starts) else np.empty(0, np.int64)
    return g, rows


def eval_ngram_set(eval_ds, text_col: str = "text", n: int = 5) -> pa.Array:
    """Distinct word n-grams of the EVAL side, collected to the driver.
    Eval benchmarks are small by definition (MBs, not the corpus), so the
    driver set is bounded; at 10M grams it is ~100 MB — still a broadcast,
    never a shuffle."""
    def grams(batch: pa.Table) -> pa.Table:
        g, _ = _word_ngrams(pc.cast(batch[text_col], pa.string()), n)
        return pa.table({"g": pc.unique(pa.array(g, pa.string()))})
    parts = eval_ds.map_batches(grams, batch_format="pyarrow").take_all()
    return pc.unique(pa.array([r["g"] for r in parts], pa.string()))


def decontaminate(ds, eval_ds, n: int = 5, text_col: str = "text"):
    """Benchmark decontamination: drop every training document that
    shares ANY word n-gram with the eval set (the standard containment
    rule used before LM training runs). The eval gram set broadcasts via
    ray.put ONCE (read per task, never re-shipped); each batch builds its
    grams vectorized and keeps rows with zero hits. Exact string
    membership — no hashing, so no collision false-drops and the DuckDB
    NOT-EXISTS oracle matches exactly."""
    import ray as _ray
    gram_ref = _ray.put(eval_ngram_set(eval_ds, text_col, n))

    def keep_clean(batch: pa.Table) -> pa.Table:
        gset = _ray.get(gram_ref) if isinstance(
            gram_ref, _ray.ObjectRef) else gram_ref
        g, rows = _word_ngrams(pc.cast(batch[text_col], pa.string()), n)
        hit = np.zeros(batch.num_rows, dtype=bool)
        if len(g):
            m = pc.is_in(pa.array(g, pa.string()), value_set=gset)
            hit_rows = rows[m.to_numpy(zero_copy_only=False)]
            hit[hit_rows] = True
        return batch.filter(pa.array(~hit))
    return ds.map_batches(keep_clean, batch_format="pyarrow")


#: third independent odd multiplier (splitmix64's) — per-key N-sampling
SAMPLE_N_PRIME = 0xD6E8FEB86659FD93


def sample_n_per_key(ds, key_col: str = "source", id_col: str = "doc_id",
                     n: int = 5):
    """Deterministic per-key random N-sample: rank each key's rows by a
    multiplicative hash of the id and keep the n smallest — the
    fixed-size counterpart of sample_by_key's fractional mixing
    ("5 random docs per domain"). Multiplication by an odd constant is a
    BIJECTION mod 2^64, so ranks are tie-free and the result is
    batching/partitioning-invariant; the shuffle is one keyed
    co-location (head_per_key machinery, no global sort)."""
    from .aggregate import head_per_key

    def add_h(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_hkey", pa.array(_u64(batch[id_col], SAMPLE_N_PRIME)))
    picked = head_per_key(
        ds.map_batches(add_h, batch_format="pyarrow"),
        key=key_col, order_col="_hkey", n=n)

    def drop_h(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["_hkey"])
    return picked.map_batches(drop_h, batch_format="pyarrow")


def dedup_lines(ds, text_col: str = "text", id_col: str = "doc_id",
                sep: str = "\n"):
    """Intra-document line deduplication (the C4-style "remove repeated
    lines within a page" cleaning rule): keep each distinct line's FIRST
    occurrence per document, preserve order, re-join with newlines.

    Per-row only — embarrassingly parallel, no shuffle. Vectorized: one
    split per batch, first-occurrence mask via a single pandas
    duplicated() over (row, line) (hash-based, C speed), list rebuild
    from offsets, one binary_join back to text. Empty lines dedup like
    any other line (the SQL oracle agrees by construction)."""
    import pandas as pd

    def fn(batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
        lists = pc.split_pattern(txt, pattern=sep)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(
            np.int64)
        flat = lists.flatten()
        counts = offsets[1:] - offsets[:-1]
        rowidx = np.repeat(np.arange(len(counts)), counts)
        dup = pd.DataFrame({"r": rowidx,
                            "l": flat.to_pandas()}).duplicated().to_numpy()
        keep = ~dup
        new_counts = np.bincount(rowidx[keep], minlength=len(counts))
        new_offsets = np.concatenate(([0], np.cumsum(new_counts)))
        kept = flat.filter(pa.array(keep))
        relist = pa.ListArray.from_arrays(
            pa.array(new_offsets, pa.int32()), kept)
        joined = pc.binary_join(pc.cast(relist, pa.list_(pa.string())),
                                sep)
        return pa.table({id_col: batch[id_col], text_col: joined})
    return ds.map_batches(fn, batch_format="pyarrow")


def pack_sequences(ds, max_tokens: int = 2048, group_col: str = "source",
                   id_col: str = "doc_id", text_col: str = "text",
                   chunk_span: int = 1 << 20):
    """Concat-then-chunk sequence packing: within each group (ordered by
    id), documents are conceptually concatenated and cut every
    `max_tokens` tokens; a document's sequence index is
    floor(tokens_before_it / max_tokens) — the standard packing
    assignment for LM training shards (a doc may straddle a boundary;
    the chunker downstream handles the split).

    100 TB shape — a global per-group ordered prefix sum without a global
    sort: (1) one map_batches pass computes per-(group, id-chunk) partial
    token sums (id-chunks are the contiguous ranges id // chunk_span, so
    chunk order IS id order); the partials are O(groups × chunks) tiny
    rows folded on the driver into exclusive prefix offsets and broadcast
    back; (2) a groupby((group, chunk)).map_groups pass sorts each
    bounded chunk locally, local-cumsums, and adds the chunk's offset.
    Nothing global ever sorts or materializes; the only shuffle is the
    (group, chunk) co-location.

    Output: (id, group, n_tokens, seq_idx). Token counting reuses the
    token_stats whitespace rule, so the DuckDB oracle is the proven
    regexp_extract_all count + a window cumsum."""
    import ray as _ray
    import ray.data as rd

    from .textstats import TOKEN_RE

    def partials(batch: pa.Table) -> pa.Table:
        txt = pc.cast(batch[text_col], pa.string())
        toks = pc.fill_null(pc.count_substring_regex(txt, pattern=TOKEN_RE),
                            0)
        ids = pc.cast(batch[id_col], pa.int64())
        chunk = pc.cast(pc.floor(pc.divide(pc.cast(ids, pa.float64()),
                                           float(chunk_span))), pa.int64())
        t = pa.table({"g": pc.cast(batch[group_col], pa.string()),
                      "c": chunk, "t": pc.cast(toks, pa.int64())})
        return (t.group_by(["g", "c"])
                 .aggregate([("t", "sum")])
                 .rename_columns(["g", "c", "tsum"]))

    # pass 1: tiny (group × chunk) partials → driver fold → exclusive
    # prefix offsets per (group, chunk) in chunk order. materialize
    # before to_arrow_refs: on a lazy plan it runs a limit-1 schema
    # probe whose task cancellation can race task completion (observed
    # ray 2.49 task_manager check-failure) and re-executes the plan
    part_tbls = _ray.get(ds.map_batches(
        partials, batch_format="pyarrow").materialize().to_arrow_refs())
    parts = pa.concat_tables([t for t in part_tbls if t.num_rows])
    folded = (parts.group_by(["g", "c"]).aggregate([("tsum", "sum")])
              .rename_columns(["g", "c", "tsum"]))
    gs = folded["g"].to_pylist()
    cs = folded["c"].to_pylist()
    ts = folded["tsum"].to_pylist()
    order = sorted(range(len(gs)), key=lambda i: (gs[i], cs[i]))
    offsets: dict[tuple[str, int], int] = {}
    run_g, acc = None, 0
    for i in order:
        if gs[i] != run_g:
            run_g, acc = gs[i], 0
        offsets[(gs[i], cs[i])] = acc
        acc += ts[i]
    off_ref = _ray.put(offsets)

    def add_keys(batch: pa.Table) -> pa.Table:
        txt = pc.cast(batch[text_col], pa.string())
        toks = pc.fill_null(pc.count_substring_regex(txt, pattern=TOKEN_RE),
                            0)
        ids = pc.cast(batch[id_col], pa.int64())
        chunk = pc.cast(pc.floor(pc.divide(pc.cast(ids, pa.float64()),
                                           float(chunk_span))), pa.int64())
        return pa.table({
            id_col: ids, "group": pc.cast(batch[group_col], pa.string()),
            "n_tokens": pc.cast(toks, pa.int64()), "_chunk": chunk})

    keyed = ds.map_batches(add_keys, batch_format="pyarrow")

    def per_chunk(g: pa.Table) -> pa.Table:
        offs = _ray.get(off_ref) if isinstance(
            off_ref, _ray.ObjectRef) else off_ref
        idx = np.argsort(g[id_col].to_numpy(zero_copy_only=False),
                         kind="stable")
        g = g.take(pa.array(idx))
        tok = g["n_tokens"].to_numpy(zero_copy_only=False)
        base = offs.get((g["group"][0].as_py(), g["_chunk"][0].as_py()), 0)
        before = base + np.concatenate(([0], np.cumsum(tok[:-1])))
        seq = (before // max_tokens).astype(np.int64)
        return pa.table({id_col: g[id_col], "group": g["group"],
                         "n_tokens": g["n_tokens"],
                         "seq_idx": pa.array(seq)})
    return (keyed.groupby(["group", "_chunk"])
            .map_groups(per_chunk, batch_format="pyarrow"))


#: fourth independent odd multiplier (xxhash64 prime 2) — global shuffle
SHUFFLE_PRIME = 0x9E3779B185EBCA87


def shuffle_shards(ds, n_shards: int = 16, seed: int = 1,
                   id_col: str = "doc_id", ubucket_bits: int | None = None):
    """Deterministic seeded global shuffle into training shards: every row
    gets u = (id·SHUFFLE_PRIME + seed) mod 2^64 (a bijection of id for any
    fixed seed → tie-free), shard = u mod n_shards, and pos = the row's
    rank by u within its shard — i.e. a reproducible random permutation
    cut into n_shards ordered shards, the standard pre-training shard
    shuffle.

    100 TB shape — rank WITHOUT a per-shard global sort: rows co-locate
    by (shard, ubucket) where ubucket is the top `ubucket_bits` bits of u
    (→ bounded groups however big a shard is); one cheap pass counts rows
    per (shard, ubucket), the tiny O(n_shards·2^bits) count table folds
    on the driver into exclusive prefix offsets and broadcasts back, then
    each group locally sorts its bounded slice and adds its offset. Same
    machinery as pack_sequences' chunked prefix sum; nothing global ever
    sorts. `ubucket_bits` defaults so total group count ≈ cluster_buckets
    (Ray's map_groups costs ~2.5 ms of fixed overhead PER GROUP —
    measured: 2048 groups cost ~5 s regardless of row count — so group
    count should track cluster width, not a constant)."""
    import ray as _ray

    if ubucket_bits is None:
        from ..cluster import cluster_buckets
        ubucket_bits = max(0, min(12, int(np.ceil(np.log2(
            max(1.0, cluster_buckets() / n_shards))))))
    shift = np.uint64(64 - ubucket_bits) if ubucket_bits else np.uint64(63)

    def keyed(batch: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            u = (_u64(batch[id_col], SHUFFLE_PRIME)
                 + np.uint64(seed))
        shard = (u % np.uint64(n_shards)).astype(np.int64)
        ub = (u >> shift).astype(np.int64)
        return pa.table({
            id_col: pc.cast(batch[id_col], pa.int64()),
            "_u": pa.array(u),
            "shard": pa.array(shard),
            "_ub": pa.array(ub),
        })

    with_keys = ds.map_batches(keyed, batch_format="pyarrow")

    def counts(batch: pa.Table) -> pa.Table:
        return (batch.select(["shard", "_ub"])
                .group_by(["shard", "_ub"])
                .aggregate([([], "count_all")])
                .rename_columns(["shard", "_ub", "n"]))

    # materialize first — same lazy-plan to_arrow_refs probe/cancel
    # race as pack_sequences above
    part_tbls = _ray.get(with_keys.map_batches(
        counts, batch_format="pyarrow").materialize().to_arrow_refs())
    parts = pa.concat_tables([t for t in part_tbls if t.num_rows])
    folded = (parts.group_by(["shard", "_ub"]).aggregate([("n", "sum")])
              .rename_columns(["shard", "_ub", "n"]))
    sh = folded["shard"].to_pylist()
    ub = folded["_ub"].to_pylist()
    ns = folded["n"].to_pylist()
    order = sorted(range(len(sh)), key=lambda i: (sh[i], ub[i]))
    offsets: dict[tuple[int, int], int] = {}
    run_s, acc = None, 0
    for i in order:
        if sh[i] != run_s:
            run_s, acc = sh[i], 0
        offsets[(sh[i], ub[i])] = acc
        acc += ns[i]
    off_ref = _ray.put(offsets)

    def per_group(g: pa.Table) -> pa.Table:
        offs = _ray.get(off_ref) if isinstance(
            off_ref, _ray.ObjectRef) else off_ref
        u = g["_u"].to_numpy(zero_copy_only=False)
        idx = np.argsort(u, kind="stable")       # u is tie-free
        g = g.take(pa.array(idx))
        base = offs[(g["shard"][0].as_py(), g["_ub"][0].as_py())]
        pos = base + np.arange(g.num_rows, dtype=np.int64)
        return pa.table({id_col: g[id_col], "shard": g["shard"],
                         "pos": pa.array(pos)})
    return (with_keys.groupby(["shard", "_ub"])
            .map_groups(per_group, batch_format="pyarrow"))


def shuffle_sql(n_shards: int = 16, seed: int = 1,
                id_col: str = "doc_id") -> str:
    """Matching DuckDB window query body (select-list + window) for
    shuffle_shards — same HUGEINT arithmetic mod 2^64."""
    u = (f"((CAST({id_col} AS HUGEINT) * {SHUFFLE_PRIME} + {seed}) % "
         f"{_TWO64})")
    return (f"SELECT {id_col}, CAST({u} % {n_shards} AS BIGINT) AS shard, "
            f"ROW_NUMBER() OVER (PARTITION BY {u} % {n_shards} "
            f"ORDER BY {u}) - 1 AS pos")


def dup_ngram_fraction(ds, n: int = 5, text_col: str = "text",
                       id_col: str = "doc_id", min_df: int = 2,
                       ndp: int = 6, broadcast_threshold: int = 5_000_000):
    """Per-document duplicated-span statistic (the readout behind exact
    substring dedup, Lee et al. 2021 "Deduplicating Training Data Makes
    Language Models Better"): the fraction of a document's word n-gram
    occurrences whose gram appears in ≥ min_df distinct documents
    corpus-wide. Docs with fewer than n words score 0.0.

    Shape: pass 1 emits per-batch (gram, distinct-doc-count) partials —
    exact because a document never spans batches — materialized once and
    merged into global df via a dual path: when the partial table is
    ≤ broadcast_threshold rows the fold is ONE driver pyarrow group_by
    over the materialized blocks (no sort shuffle at all — measured ~3 s
    saved at sf0.1); above it, the hash-bucketed distributed merge. The
    df ≥ min_df dup-gram set then broadcasts (ray.put once, pass 2 scores
    every doc with one vectorized is_in — zero corpus shuffle; dup grams
    are a small corpus slice by Zipf) or, when itself above the
    threshold, hash-joins the per-doc-gram occurrence table on gram with
    a doc-keyed merge. Exact string grams (no hashing), so the DuckDB
    oracle matches bit-for-bit."""
    import ray as _ray

    def df_partial(batch: pa.Table) -> pa.Table:
        g, rows = _word_ngrams(pc.cast(batch[text_col], pa.string()), n)
        if not len(g):
            return pa.table({"g": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        import pandas as pd
        dd = pd.DataFrame({"g": g, "r": rows}).drop_duplicates()
        vc = dd.groupby("g", sort=False).size()
        return pa.table({"g": pa.array(vc.index.to_numpy(object),
                                       pa.string()),
                         "df": pa.array(vc.to_numpy(np.int64))})

    from .dedup import _materialize_nonempty
    partials, n_part = _materialize_nonempty(
        ds.map_batches(df_partial, batch_format="pyarrow"),
        [("g", pa.string()), ("df", pa.int64())])

    if n_part <= broadcast_threshold:
        # driver fold: one group_by over the partial blocks
        tbl = pa.concat_tables(_ray.get(partials.materialize().to_arrow_refs()))
        folded = tbl.group_by(["g"]).aggregate([("df", "sum")])
        gset = folded.filter(
            pc.greater_equal(folded["df_sum"], min_df))["g"] \
            .combine_chunks()
        n_dup, dups = len(gset), None
    else:
        from .aggregate import bucket_merge
        df_tbl = bucket_merge(partials, ["g"], {"df": ("df", "sum")})

        def only_dup(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater_equal(t["df"],
                                             min_df)).select(["g"])
        dups, n_dup = _materialize_nonempty(
            df_tbl.map_batches(only_dup, batch_format="pyarrow"),
            [("g", pa.string())])
        gset = None

    scale = 10.0 ** ndp

    if n_dup <= broadcast_threshold:
        if gset is None:
            gset = pa.concat_tables(
                _ray.get(dups.materialize().to_arrow_refs()))["g"].combine_chunks()
        ref = _ray.put(gset)

        def score(batch: pa.Table) -> pa.Table:
            gs = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
            g, rows = _word_ngrams(pc.cast(batch[text_col], pa.string()), n)
            total = np.bincount(rows, minlength=batch.num_rows) \
                if len(g) else np.zeros(batch.num_rows, np.int64)
            dup = np.zeros(batch.num_rows, np.int64)
            if len(g) and len(gs):
                m = pc.is_in(pa.array(g, pa.string()), value_set=gs)
                dup = np.bincount(rows[m.to_numpy(zero_copy_only=False)],
                                  minlength=batch.num_rows)
            frac = np.where(total > 0, dup / np.maximum(total, 1), 0.0)
            frac = np.floor(frac * scale + 0.5) / scale
            return pa.table({
                id_col: pc.cast(batch[id_col], pa.int64()),
                "dup_frac": pa.array(frac, pa.float64()),
            })
        return ds.map_batches(score, batch_format="pyarrow")

    # scale fallback — nothing per-doc ever reaches the driver: occurrence
    # table ⋈ dup grams on gram (hash-partitioned), per-doc dup counts and
    # per-doc totals union into ONE bucket_merge keyed on doc id, then a
    # vectorized divide. Gram-less docs ride the totals side with total=0.
    def occ(batch: pa.Table) -> pa.Table:
        g, rows = _word_ngrams(pc.cast(batch[text_col], pa.string()), n)
        ids = pc.cast(batch[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({"g": pa.array(g, pa.string()),
                         id_col: pa.array(ids[rows] if len(g) else
                                          np.empty(0, np.int64))})

    occs = ds.map_batches(occ, batch_format="pyarrow")
    # join partition count scales with the cluster but stays ≤ CPUs so the
    # JoinOperator's per-partition actors all schedule (oversubscribing a
    # small cluster deadlocks the actor pool)
    from ..cluster import cluster_buckets
    joined = occs.join(dups, "inner", max(8, cluster_buckets() // 8),
                       on=("g",))

    def dup_partial(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        vc = pc.value_counts(ids)
        return pa.table({id_col: vc.field("values"),
                         "dup": pc.cast(vc.field("counts"), pa.int64()),
                         "total": pa.array(
                             np.zeros(len(vc), np.int64))})

    def total_partial(batch: pa.Table) -> pa.Table:
        g, rows = _word_ngrams(pc.cast(batch[text_col], pa.string()), n)
        total = np.bincount(rows, minlength=batch.num_rows) \
            if len(g) else np.zeros(batch.num_rows, np.int64)
        return pa.table({
            id_col: pc.cast(batch[id_col], pa.int64()),
            "dup": pa.array(np.zeros(batch.num_rows, np.int64)),
            "total": pa.array(total.astype(np.int64)),
        })

    parts = joined.map_batches(dup_partial, batch_format="pyarrow").union(
        ds.map_batches(total_partial, batch_format="pyarrow"))
    merged = bucket_merge(parts, [id_col],
                          {"dup": ("dup", "sum"), "total": ("total", "sum")})

    def finish(t: pa.Table) -> pa.Table:
        dup = t["dup"].to_numpy(zero_copy_only=False)
        total = t["total"].to_numpy(zero_copy_only=False)
        frac = np.where(total > 0, dup / np.maximum(total, 1), 0.0)
        frac = np.floor(frac * scale + 0.5) / scale
        return pa.table({id_col: pc.cast(t[id_col], pa.int64()),
                         "dup_frac": pa.array(frac, pa.float64())})
    return merged.map_batches(finish, batch_format="pyarrow")


def remove_dup_spans(ds, n: int = 5, text_col: str = "text",
                     id_col: str = "doc_id", min_count: int = 2,
                     broadcast_threshold: int = 5_000_000):
    """Exact duplicated-span REMOVAL (the cleaning step of Lee et al. 2021
    "Deduplicating Training Data Makes Language Models Better", ExactSubstr):
    every occurrence of a word n-gram appearing ≥ min_count times
    corpus-wide (TOTAL occurrences, within-document repeats included — the
    suffix-array criterion; dup_ngram_fraction's df counts distinct docs)
    marks its n tokens; a document's kept tokens re-join with single
    spaces. Whitespace canonicalization of the surviving text is the
    documented deviation from the byte-exact reference (the paper operates
    on token ids where the question doesn't arise). Docs with < n words
    pass through (canonicalized). Output: (id, cleaned, n_tokens,
    n_removed).

    Shape: pass 1 emits per-batch (gram, occurrence-count) partials,
    folded exactly like dup_ngram_fraction (driver group_by below
    broadcast_threshold partial rows, hash-bucketed bucket_merge above);
    the ≥min_count dup-gram set — a small corpus slice by Zipf — then
    broadcasts once (ray.put) and pass 2 rebuilds every doc with one
    vectorized is_in + interval-coverage cumsum + Arrow binary_join. No
    corpus shuffle on either pass. A corpus whose dup-gram set itself
    exceeds worker memory would need the (gram ⋈ occurrence) join path of
    dup_ngram_fraction plus a doc-keyed re-join of covered positions —
    out of scope here and log()-disclosed."""
    import ray as _ray

    def cf_partial(batch: pa.Table) -> pa.Table:
        g, _ = _word_ngrams(pc.cast(batch[text_col], pa.string()), n)
        if not len(g):
            return pa.table({"g": pa.array([], pa.string()),
                             "cf": pa.array([], pa.int64())})
        vc = pc.value_counts(pa.array(g, pa.string()))
        return pa.table({"g": vc.field("values"),
                         "cf": pc.cast(vc.field("counts"), pa.int64())})

    from .dedup import _materialize_nonempty
    partials, n_part = _materialize_nonempty(
        ds.map_batches(cf_partial, batch_format="pyarrow"),
        [("g", pa.string()), ("cf", pa.int64())])

    if n_part <= broadcast_threshold:
        tbl = pa.concat_tables(_ray.get(partials.materialize().to_arrow_refs()))
        folded = tbl.group_by(["g"]).aggregate([("cf", "sum")])
        gset = folded.filter(
            pc.greater_equal(folded["cf_sum"], min_count))["g"] \
            .combine_chunks()
    else:
        from .aggregate import bucket_merge
        cf_tbl = bucket_merge(partials, ["g"], {"cf": ("cf", "sum")})

        def only_dup(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater_equal(t["cf"],
                                             min_count)).select(["g"])
        dups, _n_dup = _materialize_nonempty(
            cf_tbl.map_batches(only_dup, batch_format="pyarrow"),
            [("g", pa.string())])
        gset = pa.concat_tables(
            _ray.get(dups.materialize().to_arrow_refs()))["g"].combine_chunks()
    ref = _ray.put(gset)

    def clean(batch: pa.Table) -> pa.Table:
        gs = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
        g, starts, words, rowidx = _word_ngrams_pos(
            pc.cast(batch[text_col], pa.string()), n)
        m = len(words)
        ntok = (np.bincount(rowidx, minlength=batch.num_rows)
                if m else np.zeros(batch.num_rows, np.int64))
        cov = np.zeros(m + 1, np.int64)
        if len(g) and len(gs):
            mdup = pc.is_in(pa.array(g, pa.string()),
                            value_set=gs).to_numpy(zero_copy_only=False)
            s = starts[mdup]
            # interval coverage: +1 at each dup gram start, -1 past its
            # end; a gram never crosses a row so coverage can't leak into
            # the next document
            np.add.at(cov, s, 1)
            np.add.at(cov, s + n, -1)
        covered = np.cumsum(cov[:-1]) > 0
        kept = ~covered
        keptr = rowidx[kept] if m else rowidx
        kcnt = (np.bincount(keptr, minlength=batch.num_rows)
                if m else np.zeros(batch.num_rows, np.int64))
        offs = np.concatenate(([0], np.cumsum(kcnt)))
        lists = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()),
            pa.array(words[kept] if m else words, pa.string()))
        return pa.table({
            id_col: pc.cast(batch[id_col], pa.int64()),
            "cleaned": pc.binary_join(lists, " "),
            "n_tokens": pa.array(ntok.astype(np.int64)),
            "n_removed": pa.array((ntok - kcnt).astype(np.int64)),
        })

    return ds.map_batches(clean, batch_format="pyarrow")


#: fourth independent odd multiplier (murmur3 fmix64's) — token-budget order
BUDGET_PRIME = 0xFF51AFD7ED558CCD


def token_budget_sample(ds, budgets: dict[str, int],
                        default_budget: int = 0,
                        text_col: str = "text", key_col: str = "source",
                        id_col: str = "doc_id"):
    """Token-budget data mixing: per source, keep documents in a
    deterministic pseudo-random order (Fibonacci-hash of the id — a
    reproducible uniform shuffle) until the source's whitespace-token
    budget fills; a doc is kept iff its INCLUSIVE running token total is
    ≤ budget. This is the "sample each source down to N tokens" step of
    mixture construction (cf. The Pile / DoReMi-style fixed mixtures),
    expressed as SUM(tokens) OVER (PARTITION BY source ORDER BY hash, id)
    ≤ budget — so it has an exact DuckDB window oracle.

    Shape: one stateless pass computes (tokens, hash); the running sum is
    the same hash-bucketed per-key pandas pass every window op here uses
    (ratelimit._per_bucket) — shuffle volume is (id, key, 2×int64), never
    the text."""
    import pandas as pd

    def prep(batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(
            pc.fill_null(pc.cast(batch[text_col], pa.string()), ""),
            pattern=r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        offs = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = lists.flatten().to_numpy(zero_copy_only=False)
        nonempty = (flat != "").astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(nonempty)])
        ntok = csum[offs[1:]] - csum[offs[:-1]]
        # exact u64 ordering survives Arrow/pandas as (hi, lo) halves
        h = _u64(batch[id_col], BUDGET_PRIME)
        return pa.table({
            id_col: pc.cast(batch[id_col], pa.int64()),
            key_col: pc.cast(batch[key_col], pa.string()),
            "n_tokens": pa.array(ntok),
            "h_hi": pa.array((h >> np.uint64(32)).astype(np.int64)),
            "h_lo": pa.array((h & np.uint64(0xFFFFFFFF)).astype(np.int64)),
        })

    from .ratelimit import _per_bucket

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "h_hi", "h_lo", id_col],
                          kind="mergesort")
        g["cum_tokens"] = g.groupby(key_col, sort=False)["n_tokens"].cumsum()
        bud = g[key_col].map(budgets).fillna(default_budget)
        g = g[g["cum_tokens"] <= bud]
        return g[[id_col, key_col, "n_tokens", "cum_tokens"]]

    return _per_bucket(ds.map_batches(prep, batch_format="pyarrow"),
                       fold, key=key_col)


def token_budget_sql(budgets: dict[str, int], default_budget: int = 0,
                     text_col: str = "text", key_col: str = "source",
                     id_col: str = "doc_id", table: str = "documents") -> str:
    """Matching DuckDB window oracle for token_budget_sample."""
    whens = " ".join(f"WHEN '{k}' THEN {v}" for k, v in budgets.items())
    return rf"""
WITH tb_base AS (
  SELECT {id_col}, {key_col},
    CAST(length(list_filter(regexp_extract_all({text_col}, '\S+'),
                            x -> x <> '')) AS BIGINT) AS n_tokens,
    (CAST({id_col} AS HUGEINT) * {BUDGET_PRIME}) % {_TWO64} AS h
  FROM {table}
), tb_cum AS (
  SELECT {id_col}, {key_col}, n_tokens,
    CAST(SUM(n_tokens) OVER (PARTITION BY {key_col} ORDER BY h, {id_col}
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM tb_base
)
SELECT {id_col}, {key_col}, n_tokens, cum_tokens FROM tb_cum
WHERE cum_tokens <= CASE {key_col} {whens} ELSE {default_budget} END
ORDER BY {id_col}"""


#: fifth independent odd multiplier — global uniform sampling order
GLOBAL_SAMPLE_PRIME = 0xD1B54A32D192ED03


def sample_global_n(ds, n: int = 100, id_col: str = "doc_id",
                    keep_cols: tuple = ("source",)):
    """Deterministic global uniform fixed-N sample: the n rows with the
    smallest (id·prime mod 2^64, id) — a reproducible ORDER BY hash
    LIMIT n without a global sort shuffle. Each block contributes its
    local n smallest (vectorized partial top-n), the driver merges
    O(n × blocks) candidates — the same bounded-fold shape as
    aggregate.global_topn. Independent hash stream from split/sample/
    budget ops so the draws compose without correlation."""
    import ray.data as rd

    cols = [id_col, *keep_cols]

    def partial(batch: pa.Table) -> pa.Table:
        h = _u64(batch[id_col], GLOBAL_SAMPLE_PRIME)
        k = min(n, len(h))
        idx = np.argpartition(h, k - 1)[:k] if k < len(h) else \
            np.arange(len(h))
        t = batch.select(cols).take(pa.array(idx))
        return (t.append_column("_hi", pa.array(
                    (h[idx] >> np.uint64(32)).astype(np.int64)))
                 .append_column("_lo", pa.array(
                    (h[idx] & np.uint64(0xFFFFFFFF)).astype(np.int64))))

    parts = []
    for t in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        if t.num_rows:
            parts.append(t)
    allc = pa.concat_tables(parts, promote_options="default")
    out = (allc.sort_by([("_hi", "ascending"), ("_lo", "ascending"),
                         (id_col, "ascending")])
           .slice(0, n).select(cols))
    return rd.from_arrow(out)


def sample_global_n_sql(n: int = 100, id_col: str = "doc_id",
                        keep_cols: tuple = ("source",),
                        table: str = "documents") -> str:
    cols = ", ".join([id_col, *keep_cols])
    return (f"SELECT {cols} FROM {table} ORDER BY "
            f"(CAST({id_col} AS HUGEINT) * {GLOBAL_SAMPLE_PRIME}) "
            f"% {_TWO64}, {id_col} LIMIT {n}")


def chunk_documents(ds, size: int = 128, stride: int = 96,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Overlapping character-window chunking (the RAG / long-context
    pre-processing op): doc → chunks of `size` chars starting every
    `stride` chars; the last window is the remainder (non-empty), so
    every character lands in ≥1 chunk. Fully vectorized explode: one
    offsets pass + one zero-copy substring kernel per batch; output
    (id, chunk_idx, chunk) with chunk_idx 0-based in document order."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")

    def explode(batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
        lens = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
        n_chunks = np.maximum((np.maximum(lens - 1, 0) // stride) + 1, 1)
        ids = pc.cast(batch[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        rowidx = np.repeat(np.arange(batch.num_rows), n_chunks)
        cidx = (np.arange(len(rowidx))
                - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks))
        starts = cidx * stride
        big = txt.take(pa.array(rowidx))
        # utf8_slice_codeunits takes scalar bounds only → slice per
        # distinct start offset (bounded by max chunks per doc, not rows)
        out_chunks = np.empty(len(rowidx), dtype=object)
        big_np = big.to_numpy(zero_copy_only=False)
        for st in np.unique(starts):
            m = starts == st
            seg = pa.array(big_np[m], pa.string())
            sl = pc.utf8_slice_codeunits(seg, int(st), int(st) + size)
            out_chunks[m] = sl.to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(ids[rowidx]),
            "chunk_idx": pa.array(cidx.astype(np.int64)),
            "chunk": pa.array(out_chunks, pa.string()),
        })
    return ds.map_batches(explode, batch_format="pyarrow")


def chunk_sql(size: int = 128, stride: int = 96, text_col: str = "text",
              id_col: str = "doc_id", table: str = "documents") -> str:
    """Matching DuckDB oracle (1-based substr)."""
    return f"""
WITH c AS (
  SELECT {id_col},
    CAST(unnest(range(0, CAST(
      greatest(length({text_col}) - 1, 0) // {stride} + 1 AS BIGINT)))
      AS BIGINT) AS chunk_idx,
    {text_col} AS t
  FROM {table}
)
SELECT {id_col}, chunk_idx,
       substr(t, chunk_idx * {stride} + 1, {size}) AS chunk
FROM c"""


def contamination_report(ds, eval_ds, n: int = 5, text_col: str = "text",
                         id_col: str = "doc_id",
                         eval_id_col: str = "doc_id") -> pa.Table:
    """Per-EVAL-document contamination audit — the report the
    `decontaminate` rule acts on: for every eval doc, how many distinct
    corpus docs share at least one word n-gram with it (eval docs with
    zero hits report 0, incl. docs too short to form a gram).

    Scale shape: the eval side is driver-bounded by definition (the
    same bound `decontaminate` documents), so the gram -> eval-ids map
    broadcasts once via ray.put. Each corpus doc is exactly ONE row, so
    within-batch-distinct (eval_id, corpus_id) hit pairs are already
    GLOBALLY distinct — no dedup shuffle exists at all; each batch
    emits eval-bounded per-eval hit counts and the driver folds
    O(eval x blocks) partials. Exact string membership, no hashing."""
    import ray as _ray

    # eval pass: gram -> dense eval index (first pass), eval id list
    eval_ids: list[int] = []
    gram_map: dict = {}
    for b in eval_ds.map_batches(
            lambda t: t.select([eval_id_col, text_col]),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        ids = pc.cast(b[eval_id_col], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        g, rows = _word_ngrams(pc.cast(b[text_col], pa.string()), n)
        base = len(eval_ids)
        eval_ids.extend(int(i) for i in ids)
        for gi, ri in zip(g, rows):
            gram_map.setdefault(gi, set()).add(base + int(ri))
    n_eval = len(eval_ids)
    packed = {k: np.fromiter(v, np.int64) for k, v in gram_map.items()}
    map_ref = _ray.put(packed)
    keys_ref = _ray.put(pa.array(sorted(packed), pa.string()))

    empty = pa.table({"eidx": pa.array([], pa.int64()),
                      "hits": pa.array([], pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        g, rows = _word_ngrams(pc.cast(batch[text_col], pa.string()), n)
        if not len(g):
            return empty
        # vectorized prefilter: the python expansion below runs only
        # over ACTUAL eval-gram hits (bounded by contamination volume)
        m = pc.is_in(pa.array(g, pa.string()),
                     value_set=_ray.get(keys_ref)) \
            .to_numpy(zero_copy_only=False)
        if not m.any():
            return empty
        # per-worker memoized get: the eval gram->ids dict would
        # otherwise re-unpickle for every task
        from ..cluster import cached_broadcast_get
        mp = cached_broadcast_get(map_ref)
        pair_rows, pair_eval = [], []
        for gi, ri in zip(g[m], rows[m]):
            hits = mp[gi]
            pair_rows.append(np.full(len(hits), ri, np.int64))
            pair_eval.append(hits)
        pr = np.concatenate(pair_rows)
        pe = np.concatenate(pair_eval)
        # distinct (corpus row, eval idx) pairs — each corpus doc is one
        # row of one batch, so batch-local distinct == global distinct
        uniq = np.unique(pr * np.int64(n_eval) + pe)
        counts = np.bincount((uniq % n_eval).astype(np.int64),
                             minlength=n_eval)
        nz = np.nonzero(counts)[0]
        return pa.table({"eidx": pa.array(nz.astype(np.int64)),
                         "hits": pa.array(counts[nz])})

    total = np.zeros(n_eval, np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            # iter_batches can coalesce several task outputs into one
            # batch, repeating an eidx — np.add.at handles duplicates
            # (fancy-index += would keep only the last occurrence)
            np.add.at(total, b["eidx"].to_numpy(zero_copy_only=False),
                      b["hits"].to_numpy(zero_copy_only=False))
    order = np.argsort(np.asarray(eval_ids, np.int64), kind="stable")
    return pa.table({
        "eval_id": pa.array(np.asarray(eval_ids, np.int64)[order]),
        "n_contaminated": pa.array(total[order])})


def decontaminate_frac(ds, eval_ds, n: int = 5, frac: float = 0.1,
                       text_col: str = "text"):
    """Fractional-overlap decontamination (the GPT-3-style rule: drop a
    training doc when ≥ `frac` of its word n-gram occurrences appear in
    the eval set, rather than on ANY single hit). Same broadcast shape
    as `decontaminate`; the per-batch membership mask feeds a bincount
    instead of an any-reduction. Docs with no grams are kept."""
    import ray as _ray
    gram_ref = _ray.put(eval_ngram_set(eval_ds, text_col, n))

    def keep_clean(batch: pa.Table) -> pa.Table:
        gset = _ray.get(gram_ref) if isinstance(
            gram_ref, _ray.ObjectRef) else gram_ref
        g, rows = _word_ngrams(pc.cast(batch[text_col], pa.string()), n)
        total = np.bincount(rows, minlength=batch.num_rows) \
            if len(g) else np.zeros(batch.num_rows, np.int64)
        hits = np.zeros(batch.num_rows, np.int64)
        if len(g) and len(gset):
            m = pc.is_in(pa.array(g, pa.string()), value_set=gset)
            hits = np.bincount(rows[m.to_numpy(zero_copy_only=False)],
                               minlength=batch.num_rows)
        ratio = np.where(total > 0, hits / np.maximum(total, 1), 0.0)
        return batch.filter(pa.array(ratio < frac))
    return ds.map_batches(keep_clean, batch_format="pyarrow")


def dictionary_encode(ds, col: str = "source", out_col: str | None = None,
                      max_categories: int = 1_000_000):
    """Categorical feature encoding: map each distinct value of `col` to
    its dense 1-based rank in sorted order (the deterministic label
    encoder — same ids on every run and any partitioning). Per-batch
    distinct partials (the combiner) fold into a global sorted vocabulary
    on the driver — categorical columns are bounded by assumption, and
    `max_categories` makes the assumption explicit (a high-cardinality
    column raises instead of silently building a huge broadcast); the
    mapping broadcasts once and ONE vectorized dictionary lookup encodes
    every batch. SQL twin: join against dense_rank() over the distinct
    values."""
    import ray as _ray

    def distinct(batch: pa.Table) -> pa.Table:
        return pa.table({col: pc.unique(
            pc.cast(batch[col], pa.string()).combine_chunks()
            if isinstance(batch[col], pa.ChunkedArray)
            else pc.cast(batch[col], pa.string()))})

    parts = ds.map_batches(distinct, batch_format="pyarrow")
    vocab = pc.unique(pa.concat_tables(
        [b for b in parts.iter_batches(batch_size=None,
                                       batch_format="pyarrow")])[col]
        .combine_chunks())
    if len(vocab) > max_categories:
        raise ValueError(
            f"{col!r} has {len(vocab)} categories > max_categories="
            f"{max_categories} — not a categorical column")
    svals = sorted(v for v in vocab.to_pylist() if v is not None)
    # broadcast the sorted vocab as an Arrow array: encode is then ONE
    # pc.index_in kernel per batch (rank = index + 1, miss/null → 0) —
    # no per-row Python (round-4 perf fix)
    ref = _ray.put(pa.array(svals, pa.string()))
    out_col = out_col or f"{col}_id"

    def encode(batch: pa.Table) -> pa.Table:
        vs = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
        idx = pc.index_in(pc.cast(batch[col], pa.string()), value_set=vs)
        ids = pc.fill_null(pc.add(pc.cast(idx, pa.int64()), 1), 0)
        return batch.append_column(out_col, ids)

    return ds.map_batches(encode, batch_format="pyarrow")
