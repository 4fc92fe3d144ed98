"""Aggregation stages — dynstats / impstats / mmcount analogues, plus the
north-star rollups, all with partial (combiner) pre-aggregation so the
all-to-all shuffle only moves one row per (key, batch), not per input row.

Reference: dyn_inc/dynstats runtime/dynstats.c:35-46, impstats counters
runtime/statsobj.c + runtime/queue.c:2581-2599, mmcount
contrib/mmcount/mmcount.c:49.

Skew note (SURVEY §7 'Hard parts'): algebraic aggregates (count/sum/min/max)
are made skew-proof by the per-batch partial pass — a hot conv_id
contributes at most one partial row per batch, so the shuffle sees bounded
fan-in and no salting is required. Holistic per-group computation
(map_groups) is where hot keys hurt; `salted_group_apply` below splits a
group across S salt buckets and merges — use it when the per-group function
is decomposable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum


def _partial_counts(batch: pa.Table, keys: list[str]) -> pa.Table:
    return batch.group_by(keys).aggregate([([], "count_all")]).rename_columns(
        keys + ["rows"])


def count_by(ds, keys: list[str], batch_size: int = 65536,
             fold_driver: bool = False, fold: str = "bucket"):
    """groupby(keys).count() with per-batch partials (dyn_inc analogue).

    fold_driver=True streams the partials back and merges on the driver
    (returns a pa.Table) — ONLY for bounded-cardinality keys (facility ×
    severity = 192, dynstats maxCardinality ≤ 2000): the partial stream is
    O(#batches × |keys|) tiny rows and skips the Aggregate shuffle's fixed
    cost (~1-2 s) entirely. Unbounded keys stay distributed: fold='bucket'
    (default) merges partials with the hash-bucketed vectorized
    bucket_merge (one pandas groupby per bucket — measured ~2 s under
    Ray's sort-based Aggregate at sf0.1, same shuffle volume);
    fold='sort' keeps the sort-based groupby().aggregate(Sum)."""
    partials = ds.map_batches(lambda t: _partial_counts(t, keys),
                              batch_format="pyarrow", batch_size=batch_size)
    if not fold_driver:
        if fold == "bucket":
            return bucket_merge(partials, keys, {"rows": ("rows", "sum")})
        return partials.groupby(keys).aggregate(Sum("rows", alias_name="rows"))
    acc: dict[tuple, int] = {}
    for b in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        cols = [b[k].to_pylist() for k in keys]
        ns = b["rows"].to_pylist()
        for i, n in enumerate(ns):
            kk = tuple(c[i] for c in cols)
            acc[kk] = acc.get(kk, 0) + n
    items = sorted(acc.items())
    out = {k: pa.array([it[0][j] for it in items])
           for j, k in enumerate(keys)}
    out["rows"] = pa.array([it[1] for it in items], pa.int64())
    return pa.table(out)


def facility_severity_counts(ds):
    """Per-facility/per-severity counts (north-star aggregate). 24×8 = 192
    possible keys → driver fold is bounded at any input scale."""
    return count_by(ds, ["facility", "severity"], fold_driver=True)


def _partial_conv_rollup(batch: pa.Table) -> pa.Table:
    t = batch.group_by(["conv_id"]).aggregate([
        ([], "count_all"),
        ("parse_success", "sum"),
        ("ts", "min"),
        ("ts", "max"),
    ])
    return t.rename_columns(["conv_id", "n_turns", "n_parsed_ok",
                             "first_ts", "last_ts"])


def conv_rollup(ds, batch_size: int = 65536, n_buckets: int | None = None):
    """Per-conv_id session rollup: n_turns, n_parsed_ok, first/last ts.

    Two-stage: per-batch partials (one row per conv per batch — hot convs
    collapse inside each batch) → hash-bucket merge: conversations are
    hashed into n_buckets groups and each bucket is combined in ONE
    vectorized pandas groupby (64 calls total). Ray's sort-based
    Aggregate over the same partials measured ~5 s of fixed overhead at
    sf0.1; the bucket merge is the same shuffle volume without it."""
    partials = ds.map_batches(_partial_conv_rollup, batch_format="pyarrow",
                              batch_size=batch_size)
    return bucket_merge(partials, ["conv_id"],
                        {"n_turns": ("n_turns", "sum"),
                         "n_parsed_ok": ("n_parsed_ok", "sum"),
                         "first_ts": ("first_ts", "min"),
                         "last_ts": ("last_ts", "max")},
                        n_buckets=n_buckets)


def bucket_merge(partials, keys: list[str], agg_spec: dict[str, tuple],
                 n_buckets: int | None = None):
    """Merge per-batch partial aggregates by hash-bucketed pandas groupby —
    ONE vectorized call per bucket instead of Ray's sort-based Aggregate
    (measured ~2s fixed cost + high variance on tiny partials).

    agg_spec: {out_col: (src_col, how)} where how ∈ sum/min/max/first and
    every src_col is already a partial (so the merge is algebraic);
    n_buckets defaults to cluster width (cluster.cluster_buckets)."""
    if n_buckets is None:
        from ..cluster import cluster_buckets
        n_buckets = cluster_buckets()
    import pandas as pd

    def add_bucket(t: pa.Table) -> pa.Table:
        # combine every key column into the bucket hash: bucketing on
        # keys[0] alone collapses to |distinct key0| buckets when the
        # leading key is low-cardinality (role, event_type, ...)
        from ..cluster import fast_hash64
        h = fast_hash64(t[keys[0]])
        for k in keys[1:]:
            h = h * np.uint64(0x9E3779B97F4A7C15) + fast_hash64(t[k])
        return t.append_column("_bucket",
                               pa.array((h % n_buckets).astype(np.int64)))

    def merge(g):
        g = g.drop(columns=["_bucket"])
        # canonical row order before summing: map_groups delivers bucket
        # rows in nondeterministic order and float addition is
        # order-sensitive — an ulp flip at a round() boundary makes
        # value sums flaky run-to-run without this sort. Integer sums
        # and min/max/first-of-sorted-key are order-insensitive, so the
        # sort is skipped when no SUMMED column is floating-point.
        import pandas.api.types as pdt
        needs_sort = any(how == "sum" and pdt.is_float_dtype(g[src])
                         for _, (src, how) in agg_spec.items()) \
            or any(how == "first" for _, (_, how) in agg_spec.items())
        if needs_sort:
            g = g.sort_values(list(g.columns), kind="mergesort")
        # dropna=False: SQL GROUP BY keeps the NULL-key group (DuckDB
        # oracles do); pandas' default silently drops it, which would
        # make count_by lose rows for nullable key columns.
        return (g.groupby(keys, sort=False, as_index=False, dropna=False)
                .agg(**{out: (src, how)
                        for out, (src, how) in agg_spec.items()}))

    return (partials.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("_bucket").map_groups(merge, batch_format="pandas"))


def dyn_inc(ds, bucket: str, key_col: str, max_cardinality: int = 2000,
            unused_metric_life_s: int | None = None,
            ts_col: str = "ts"):
    """dynstats bucket counter (grammar/rainerscript.c:2531, dynstats.c).

    Batch semantics: full counts per key; if cardinality exceeds
    max_cardinality we keep the top-N by count and emit an overflow row
    (the reference drops NEW keys past the cap and counts ops_overflow —
    arrival order is meaningless in a parallel batch engine, documented
    deviation).

    unused_metric_life_s = the unusedMetricLife TTL (dynstats.c:35-46
    survivor-table sweeper, default 3600 s wall-clock in the reference):
    here the deterministic event-time analogue — a key whose LAST
    increment is older than the TTL before the stream's max timestamp is
    expired from the emitted counter set (it did not survive the final
    sweep cycle). Partials carry per-key max(ts), so the fold stays
    O(#batches × |keys|)."""
    if unused_metric_life_s is not None:
        def partial(t: pa.Table) -> pa.Table:
            g = t.group_by([key_col]).aggregate(
                [([], "count_all"), (ts_col, "max")])
            return g.rename_columns(["key", "rows", "last_ts"])
        acc: dict = {}
        hi = None
        for b in ds.map_batches(partial, batch_format="pyarrow") \
                   .iter_batches(batch_size=None, batch_format="pyarrow"):
            ks = b["key"].to_pylist()
            ns = b["rows"].to_pylist()
            ls = b["last_ts"].to_pylist()
            for k, n, lt in zip(ks, ns, ls):
                n0, l0 = acc.get(k, (0, None))
                acc[k] = (n0 + n, lt if l0 is None or lt > l0 else l0)
                if lt is not None and (hi is None or lt > hi):
                    hi = lt
        import datetime as _dt
        cut = (hi - _dt.timedelta(seconds=unused_metric_life_s)
               if hi is not None else None)
        items = sorted((k, v[0]) for k, v in acc.items()
                       if cut is None or (v[1] is not None and v[1] >= cut))
        counts = pa.table({
            "key": pa.array([i[0] for i in items]),
            "rows": pa.array([i[1] for i in items], pa.int64())})
    else:
        counts = count_by(ds, [key_col],
                          fold_driver=True)  # ≤ maxCardinality+ε
        counts = counts.rename_columns(["key", "rows"])
    if counts.num_rows > max_cardinality:
        order = pc.sort_indices(
            counts, sort_keys=[("rows", "descending"), ("key", "ascending")])
        top = counts.take(order[:max_cardinality])
        total = pc.sum(counts["rows"]).as_py()
        kept = pc.sum(top["rows"]).as_py()
        overflow = pa.table({"key": pa.array(["_overflow"]),
                             "rows": pa.array([total - kept], pa.int64())})
        counts = pa.concat_tables([top, overflow])
    return counts.append_column("bucket",
                                pa.array([bucket] * counts.num_rows))


def salted_group_apply(ds, key: str, fn, salt_buckets: int = 16,
                       batch_format: str = "pandas"):
    """Two-stage map_groups for decomposable per-group functions under skew:
    group on (key, salt=hash64mod(row_key, S)) first, apply fn per
    sub-group, then apply fn again per key over the sub-results.

    fn must be an algebraic combiner: fn(fn(part1) ∪ fn(part2)) == fn(whole).
    """
    def add_salt(t: pa.Table) -> pa.Table:
        # round-robin within the batch: spreads a hot key over S sub-groups
        return t.append_column(
            "_salt", pa.array((np.arange(t.num_rows) % salt_buckets).astype(np.int64)))
    salted = ds.map_batches(add_salt, batch_format="pyarrow")
    stage1 = salted.groupby([key, "_salt"]).map_groups(fn, batch_format=batch_format)
    return stage1.groupby(key).map_groups(fn, batch_format=batch_format)


def pipeline_metrics(route_counts: dict, extra: dict | None = None) -> pa.Table:
    """impstats-shaped metrics table from route counters (+ any extras)."""
    rows = dict(route_counts)
    rows.update(extra or {})
    return pa.table({
        "counter": pa.array(list(rows.keys()), pa.string()),
        "value": pa.array([int(v) for v in rows.values()], pa.int64()),
    })


def _sessionize_bucket(g: "pd.DataFrame", key: str, ts_col: str,
                       gap_s: int) -> "pd.DataFrame":
    """Vectorized over every key in the bucket: a new session starts at the
    first event of a key or when the inactivity gap exceeds gap_s."""
    import pandas as pd
    g = g.sort_values([key, ts_col], kind="mergesort")
    ts = g[ts_col].astype("int64") // 1_000_000
    new_key = g[key].ne(g[key].shift())
    gap = ts - ts.shift()
    new_sess = new_key | (gap > gap_s)
    sid_global = new_sess.cumsum()
    # per-key 1-based session index
    first_rows = g[new_sess].groupby(key, sort=False).cumcount() + 1
    sess_idx = pd.Series(first_rows, index=g.index[new_sess]).reindex(
        g.index).ffill().astype("int64")
    out = (g.assign(_sid=sid_global, _sidx=sess_idx)
           .groupby("_sid", sort=False)
           .agg(**{key: (key, "first"), "session_idx": ("_sidx", "first"),
                   "n_events": (ts_col, "size"),
                   "start_ts": (ts_col, "min"), "end_ts": (ts_col, "max")})
           .reset_index(drop=True))
    out["n_events"] = out["n_events"].astype("int64")
    return out


def sessionize(ds, key: str = "user_id", ts_col: str = "ts",
               gap_s: int = 1800, n_buckets: int | None = None):
    """Gap-based session windows (the streaming sessionization every
    telemetry pipeline needs; the reference's nearest analogues are the
    ratelimit windows, ratelimit.c:145-205). Hash-bucketed per-key ordered
    computation — same scale shape as suppress_repeats: one vectorized
    pandas pass per bucket, a key never spans buckets."""
    from .ratelimit import _per_bucket
    return _per_bucket(ds.select_columns([key, ts_col]),
                       lambda g: _sessionize_bucket(g, key, ts_col, gap_s),
                       n_buckets=n_buckets, key=key)


def hopping_window_counts(ds, size_s: int = 3600, hop_s: int = 900,
                          key: str = "event_type", ts_col: str = "ts",
                          value_col: str | None = "value",
                          n_buckets: int | None = None):
    """Hopping (sliding) window aggregate: each event lands in every
    window [s, s+size) with s ≡ 0 (mod hop) — the overlapping-window
    generalization of the tumbling $now* buckets (§2.8). Implemented as a
    vectorized per-batch explode (size/hop window rows per event, offsets
    via repeat/arange — no per-row Python) + partial pre-aggregation per
    batch, then the small bucket-merge groupby; the shuffle carries one
    row per (key, window) per batch, never the exploded events."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        tss = (pc.cast(pc.cast(batch[ts_col], pa.timestamp("us")),
                       pa.int64()).to_numpy(zero_copy_only=False)
               // 1_000_000)
        smin = (tss - size_s) // hop_s * hop_s + hop_s
        smax = tss // hop_s * hop_s
        counts = (smax - smin) // hop_s + 1
        parents = np.repeat(np.arange(len(tss)), counts)
        total = int(counts.sum())
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(total) - np.repeat(starts, counts)
        wstart = np.repeat(smin, counts) + within * hop_s
        keys = batch[key]
        keys = (keys.combine_chunks()
                if isinstance(keys, pa.ChunkedArray) else keys)
        # sum exact integer cents, not floats: distributed partials add in
        # a different order than a single-pass oracle and float addition
        # is non-associative — a boundary-straddling round() would then
        # differ by one ulp from the oracle's
        cents = (pc.cast(pc.round(pc.multiply(
                     pc.cast(batch[value_col], pa.float64()), 100.0)),
                     pa.int64())
                 if value_col else pa.array(np.full(len(tss), 100,
                                                    dtype=np.int64)))
        t = pa.table({
            key: keys.take(pa.array(parents, pa.int64())),
            "wstart": pa.array(wstart),
            "value": cents.take(pa.array(parents, pa.int64())),
        })
        return (t.group_by([key, "wstart"])
                .aggregate([([], "count_all"), ("value", "sum")])
                .rename_columns([key, "wstart", "rows", "value_sum"]))

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = bucket_merge(partials, [key, "wstart"],
                       {"rows": ("rows", "sum"),
                        "value_sum": ("value_sum", "sum")},
                       n_buckets=n_buckets)

    def uncent(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("value_sum"), "value_sum",
            pc.divide(pc.cast(batch["value_sum"], pa.float64()), 100.0))
    return out.map_batches(uncent, batch_format="pyarrow")


def percentiles_by_key(ds, key: str = "event_type", value_col: str = "value",
                       qs: tuple = (0.5, 0.95, 0.99),
                       names: tuple = ("p50", "p95", "p99"),
                       n_buckets: int | None = None) -> pa.Table:
    """Exact distributed percentiles WITHOUT a distributed sort: per-batch
    (key, value-cent) histogram partials → bucket-merged counts → a tiny
    driver fold over the histogram (O(|keys| × |distinct values|),
    independent of row count — the 2-decimal value domain is bounded).
    Rank semantics match DuckDB quantile_disc: sorted element at
    ceil(q·n)−1. For an unbounded value domain use fixed-width bins
    (approximate) or a t-digest; the shuffle/fold shape stays the same."""
    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            pc.cast(batch[value_col], pa.float64()), 100.0)), pa.int64())
        t = pa.table({key: batch[key], "cents": cents})
        return (t.group_by([key, "cents"])
                .aggregate([([], "count_all")])
                .rename_columns([key, "cents", "n"]))

    partials = ds.map_batches(partial, batch_format="pyarrow")
    # the histogram is bounded (O(|keys| × |distinct cents|) per batch) —
    # stream the partials back and fold on the driver, skipping the
    # shuffle's fixed cost entirely (count_by fold_driver pattern); at an
    # unbounded domain switch to bucket_merge + fixed-width bins instead
    hist = (pa.concat_tables(
        [b for b in partials.iter_batches(batch_size=None,
                                          batch_format="pyarrow")])
        .to_pandas()
        .groupby([key, "cents"], sort=False, as_index=False)["n"].sum())
    out_keys, out_cols = [], {nm: [] for nm in names}
    for k, g in hist.groupby(key, sort=True):
        g = g.sort_values("cents")
        counts = g["n"].to_numpy()
        cum = np.cumsum(counts)
        n = int(cum[-1])
        vals = g["cents"].to_numpy().astype(np.float64) / 100.0
        out_keys.append(k)
        for q, nm in zip(qs, names):
            rank = int(np.ceil(q * n)) - 1
            out_cols[nm].append(vals[np.searchsorted(cum, rank + 1)])
    return pa.table({key: pa.array(out_keys),
                     **{nm: pa.array(out_cols[nm], pa.float64())
                        for nm in names}})


def roc_auc(ds, score_col: str = "score", label_col: str = "label",
            driver_threshold: int = 5_000_000) -> pa.Table:
    """Exact distributed ROC AUC of a score against a binary label —
    the calibration metric for model-based quality filters (does the
    classifier's score actually rank positives above negatives?).
    Tie-aware Mann-Whitney form: over distinct scores ascending,
    AUC = Σ_v pos(v)·(negBelow(v) + neg(v)/2) / (Σpos · Σneg).

    Shape: per-batch (score → pos, total) histogram partials via one
    np.unique + two bincounts → hash-bucketed merge → a driver fold
    over the merged histogram, O(|distinct scores|) — independent of
    row count for the bounded/rounded score domains quality scores
    live in (raises above `driver_threshold` distinct values rather
    than silently materializing; re-bin the score first at that
    point). Every summand is a half-integer < 2^53, so the float sum
    is EXACT and order-independent — bit-equal to a SQL window-sum
    oracle. Output: one row (auc, n_pos, n_neg); auc is null when a
    class is empty."""
    def partial(t: pa.Table) -> pa.Table:
        # rows with a null score or label carry no ranking information —
        # drop them (sklearn-style) instead of letting NaN poison counts
        t = t.filter(pc.and_(pc.is_valid(t[score_col]),
                             pc.is_valid(t[label_col])))
        s = pc.cast(t[score_col], pa.float64()).to_numpy(
            zero_copy_only=False)
        lab = pc.cast(t[label_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        u, inv = np.unique(s, return_inverse=True)
        pos = np.bincount(inv, weights=lab.astype(np.float64))
        tot = np.bincount(inv)
        return pa.table({"s": pa.array(u, pa.float64()),
                         "pos": pa.array(pos.astype(np.int64)),
                         "tot": pa.array(tot.astype(np.int64))})

    merged = bucket_merge(ds.map_batches(partial, batch_format="pyarrow"),
                          ["s"], {"pos": ("pos", "sum"),
                                  "tot": ("tot", "sum")})
    hist = pa.concat_tables(
        [b for b in merged.iter_batches(batch_size=None,
                                        batch_format="pyarrow")])
    if hist.num_rows > driver_threshold:
        raise ValueError(
            f"{hist.num_rows} distinct scores exceed driver_threshold="
            f"{driver_threshold}; round/bin the score column first")
    s = hist["s"].to_numpy(zero_copy_only=False)
    order = np.argsort(s, kind="mergesort")
    pos = hist["pos"].to_numpy(zero_copy_only=False)[order] \
        .astype(np.float64)
    tot = hist["tot"].to_numpy(zero_copy_only=False)[order] \
        .astype(np.float64)
    neg = tot - pos
    n_pos, n_neg = pos.sum(), neg.sum()
    if n_pos == 0 or n_neg == 0:
        auc = None
    else:
        cum_below = np.concatenate([[0.0], np.cumsum(neg)[:-1]])
        auc = float(np.sum(pos * (cum_below + 0.5 * neg))
                    / (n_pos * n_neg))
    return pa.table({"auc": pa.array([auc], pa.float64()),
                     "n_pos": pa.array([int(n_pos)], pa.int64()),
                     "n_neg": pa.array([int(n_neg)], pa.int64())})


def event_pattern_counts(ds, pattern: str, type_map: dict,
                         key: str = "user_id",
                         type_col: str = "event_type",
                         ts_col: str = "ts", id_col: str = "event_id",
                         n_buckets: int | None = None) -> "object":
    """CEP-style event-trend counting (the MATCH_RECOGNIZE-lite /
    SASE pattern staple — cf. event trend aggregation, SIGMOD'19):
    per key, order the events by (ts, id), render each event type as
    one character via `type_map` (unmapped types are skipped), and
    count NON-OVERLAPPING regex matches of `pattern` over the key's
    character sequence. Emits (key, n_matches) for keys with ≥1 match.

    Shape: project to (key, ts, id, 1 char) BEFORE the keyed shuffle
    (nothing wider moves), then per hash-bucket one vectorized pandas
    pass: sort → groupby-join → Series.str.count (C regex). A key's
    whole sequence lives in one bucket by construction; per-key event
    counts bound the string length. The DuckDB twin is
    string_agg(ch ORDER BY ts, id) + regexp_extract_all — leftmost
    non-overlapping on both sides, so keep `pattern` free of
    alternation ambiguity (greedy quantifiers are fine)."""
    import pandas as pd

    from .ratelimit import _per_bucket

    keys_arr = pa.array(list(type_map.keys()), pa.string())
    chs = np.asarray(list(type_map.values()), dtype=object)

    def project(t: pa.Table) -> pa.Table:
        idx = pc.index_in(pc.cast(t[type_col], pa.string()),
                          value_set=keys_arr)
        idxn = pc.fill_null(idx, -1).to_numpy(zero_copy_only=False)
        hit = idxn >= 0
        ch = np.where(hit, chs[np.clip(idxn, 0, max(len(chs) - 1, 0))],
                      "")
        out = pa.table({key: t[key], ts_col: t[ts_col],
                        id_col: t[id_col],
                        "_ch": pa.array(ch, pa.string())})
        return out.filter(pa.array(hit))

    def per_bucket_fn(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        seq = g.groupby(key, sort=False)["_ch"].agg("".join)
        n = seq.str.count(pattern).astype("int64")
        out = pd.DataFrame({key: seq.index.to_numpy(),
                            "n_matches": n.to_numpy()})
        return out[out.n_matches > 0].reset_index(drop=True)

    return _per_bucket(ds.map_batches(project, batch_format="pyarrow"),
                       per_bucket_fn, key=key, n_buckets=n_buckets)


def event_pattern_counts_sql(pattern: str, type_map: dict,
                             key: str = "user_id",
                             type_col: str = "event_type",
                             ts_col: str = "ts",
                             id_col: str = "event_id",
                             table: str = "events") -> str:
    """Matching DuckDB query for event_pattern_counts."""
    whens = " ".join(f"WHEN '{k}' THEN '{v}'"
                     for k, v in type_map.items())
    return f"""
WITH o AS (
  SELECT {key}, {ts_col}, {id_col},
         CASE {type_col} {whens} END AS ch
  FROM {table}
),
s AS (SELECT {key},
             string_agg(ch, '' ORDER BY {ts_col}, {id_col}) AS seq
      FROM o WHERE ch IS NOT NULL GROUP BY {key})
SELECT {key},
       CAST(len(regexp_extract_all(seq, '{pattern}')) AS BIGINT)
         AS n_matches
FROM s
WHERE len(regexp_extract_all(seq, '{pattern}')) > 0"""


def prf_at_threshold(ds, threshold: float, score_col: str = "score",
                     label_col: str = "label") -> pa.Table:
    """Precision / recall / F1 of the decision rule score >= threshold
    against a binary label — the operating-point companion to roc_auc
    for model-based quality filters. One stateless pass of 4-int
    confusion partials per batch, folded on the driver (O(#batches)
    rows); every output ratio is a single division of two exact int64
    sums, so the SQL twin matches bit-for-bit (f1 computed as
    2·tp / (2·tp + fp + fn) — one division, no p·r rounding chain)."""
    def partial(t: pa.Table) -> pa.Table:
        # null score/label rows carry no decision — drop (as roc_auc)
        t = t.filter(pc.and_(pc.is_valid(t[score_col]),
                             pc.is_valid(t[label_col])))
        s = pc.cast(t[score_col], pa.float64()).to_numpy(
            zero_copy_only=False)
        lab = pc.cast(t[label_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        pred = s >= threshold
        pos = lab == 1
        return pa.table({
            "tp": pa.array([int(np.sum(pred & pos))], pa.int64()),
            "fp": pa.array([int(np.sum(pred & ~pos))], pa.int64()),
            "fn": pa.array([int(np.sum(~pred & pos))], pa.int64()),
            "tn": pa.array([int(np.sum(~pred & ~pos))], pa.int64())})

    tp = fp = fn = tn = 0
    for b in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_size=None, batch_format="pyarrow"):
        tp += int(pc.sum(b["tp"]).as_py() or 0)
        fp += int(pc.sum(b["fp"]).as_py() or 0)
        fn += int(pc.sum(b["fn"]).as_py() or 0)
        tn += int(pc.sum(b["tn"]).as_py() or 0)
    prec = tp / (tp + fp) if tp + fp else None
    rec = tp / (tp + fn) if tp + fn else None
    f1 = 2 * tp / (2 * tp + fp + fn) if 2 * tp + fp + fn else None
    return pa.table({
        "tp": pa.array([tp], pa.int64()),
        "fp": pa.array([fp], pa.int64()),
        "fn": pa.array([fn], pa.int64()),
        "tn": pa.array([tn], pa.int64()),
        "precision": pa.array([prec], pa.float64()),
        "recall": pa.array([rec], pa.float64()),
        "f1": pa.array([f1], pa.float64())})


def prf_at_threshold_sql(score_expr: str, label_expr: str,
                         threshold: float,
                         table: str = "documents") -> str:
    """Matching DuckDB query for prf_at_threshold."""
    return f"""
WITH d AS (SELECT CAST({score_expr} AS DOUBLE) AS s,
                  CAST({label_expr} AS BIGINT) AS lab FROM {table}
           WHERE {score_expr} IS NOT NULL
             AND {label_expr} IS NOT NULL),
c AS (SELECT
        CAST(SUM(CASE WHEN s >= {threshold!r} AND lab = 1
                 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(SUM(CASE WHEN s >= {threshold!r} AND lab <> 1
                 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        CAST(SUM(CASE WHEN s < {threshold!r} AND lab = 1
                 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        CAST(SUM(CASE WHEN s < {threshold!r} AND lab <> 1
                 THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM d)
SELECT tp, fp, fn, tn,
       CASE WHEN tp + fp > 0
            THEN CAST(tp AS DOUBLE) / (tp + fp) END AS precision,
       CASE WHEN tp + fn > 0
            THEN CAST(tp AS DOUBLE) / (tp + fn) END AS recall,
       CASE WHEN 2 * tp + fp + fn > 0
            THEN CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) END AS f1
FROM c"""


def roc_auc_sql(score_expr: str, label_expr: str,
                table: str = "documents") -> str:
    """Matching DuckDB query for roc_auc (window cumulated negatives;
    same exact half-integer summands, so float equality is exact)."""
    return f"""
WITH d AS (SELECT CAST({score_expr} AS DOUBLE) AS s,
                  CAST({label_expr} AS BIGINT) AS lab FROM {table}
           WHERE {score_expr} IS NOT NULL
             AND {label_expr} IS NOT NULL),
h AS (SELECT s, CAST(SUM(lab) AS BIGINT) AS pos,
             CAST(COUNT(*) - SUM(lab) AS BIGINT) AS neg
      FROM d GROUP BY s),
o AS (SELECT s, pos, neg,
             CAST(COALESCE(SUM(neg) OVER (ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS BIGINT) AS cumneg
      FROM h)
SELECT SUM(pos * (cumneg + 0.5 * neg))
         / ((SELECT SUM(pos) FROM h) * (SELECT SUM(neg) FROM h)) AS auc,
       CAST((SELECT SUM(pos) FROM h) AS BIGINT) AS n_pos,
       CAST((SELECT SUM(neg) FROM h) AS BIGINT) AS n_neg
FROM o"""


def _td_k1(q: float, delta: float) -> float:
    """t-digest k1 scale function (Dunning & Ertl 2019, eq. 2):
    k(q) = δ/(2π)·asin(2q−1) — cluster size budget ∝ q(1−q), so accuracy
    concentrates at the tails."""
    return delta / (2.0 * np.pi) * np.arcsin(
        min(1.0, max(-1.0, 2.0 * q - 1.0)))


def _td_compress(means: np.ndarray, weights: np.ndarray, delta: float):
    """Merge (mean, weight) centroids into ≤ ~2δ clusters (the MergingDigest
    algorithm): sort by mean, greedily absorb neighbours while the merged
    cluster's k-size stays ≤ 1. O(|centroids|) after the sort — runs on
    partial digests (≤ a few thousand rows), never on raw values."""
    if len(means) == 0:
        return means.astype(np.float64), weights.astype(np.float64)
    order = np.argsort(means, kind="mergesort")
    means = means[order].astype(np.float64)
    weights = weights[order].astype(np.float64)
    total = weights.sum()
    out_m: list[float] = []
    out_w: list[float] = []
    q0 = 0.0
    k0 = _td_k1(q0, delta)
    cm, cw = means[0], weights[0]
    for i in range(1, len(means)):
        w = weights[i]
        if _td_k1(q0 + (cw + w) / total, delta) - k0 <= 1.0:
            cm += (means[i] - cm) * (w / (cw + w))
            cw += w
        else:
            out_m.append(cm)
            out_w.append(cw)
            q0 += cw / total
            k0 = _td_k1(q0, delta)
            cm, cw = means[i], w
    out_m.append(cm)
    out_w.append(cw)
    return np.asarray(out_m), np.asarray(out_w)


def _td_quantile(means: np.ndarray, weights: np.ndarray, q: float) -> float:
    """Interpolated quantile readout over sorted centroids (Dunning's
    reference readout: centroids sit at the midpoint of their weight
    span; linear interpolation between adjacent midpoints)."""
    n = len(means)
    if n == 0:
        return float("nan")
    if n == 1:
        return float(means[0])
    total = weights.sum()
    target = q * total
    # midpoint rank of each centroid
    cum = np.cumsum(weights)
    mids = cum - weights / 2.0
    if target <= mids[0]:
        return float(means[0])
    if target >= mids[-1]:
        return float(means[-1])
    j = int(np.searchsorted(mids, target)) - 1
    frac = (target - mids[j]) / (mids[j + 1] - mids[j])
    return float(means[j] + frac * (means[j + 1] - means[j]))


def tdigest_quantiles_by_key(ds, key: str = "event_type",
                             value_col: str = "value",
                             qs: tuple = (0.5, 0.95, 0.99),
                             names: tuple = ("p50", "p95", "p99"),
                             delta: float = 200.0,
                             driver_threshold: int = 2_000_000) -> pa.Table:
    """Approximate distributed percentiles for UNBOUNDED value domains —
    the scale companion to percentiles_by_key (whose exact cent histogram
    assumes a bounded discrete domain). Per-batch per-key t-digests
    (Dunning & Ertl 2019) emit centroid rows (key, mean, weight) —
    O(|keys|·δ) per batch, independent of row count AND value
    cardinality; digests are mergeable, so one tiny driver fold
    compresses per key and reads the quantiles out. Rank error is
    O(q(1−q)/δ): tight at the tails, the p99-monitoring sweet spot.
    Shuffle volume: centroid partials only — the raw values never move.
    Below `driver_threshold` centroid rows the fold runs on the driver;
    above (many blocks × keys at 100 TB), a key-partitioned map_groups
    merge-compresses each key's centroids distributed (digest merging is
    associative) and only the O(keys·δ) merged digests reach the
    driver readout."""
    def partial(batch: pa.Table) -> pa.Table:
        vals = pc.cast(batch[value_col], pa.float64())
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        keys_arr = batch[key]
        if isinstance(keys_arr, pa.ChunkedArray):
            keys_arr = keys_arr.combine_chunks()
        ok = pc.is_valid(vals)
        vals = vals.filter(ok).to_numpy(zero_copy_only=False)
        keys = np.asarray(keys_arr.filter(ok).to_pylist(), dtype=object)
        out_k: list = []
        out_m: list = []
        out_w: list = []
        if len(vals):
            uk, inv = np.unique(keys, return_inverse=True)
            for j, k in enumerate(uk):
                v = vals[inv == j]
                # equal values pre-collapse into weighted singletons
                vm, vw = np.unique(v, return_counts=True)
                m, w = _td_compress(vm, vw.astype(np.float64), delta)
                out_k.extend([k] * len(m))
                out_m.extend(m)
                out_w.extend(w)
        return pa.table({key: pa.array(out_k, pa.string()),
                         "mean": pa.array(out_m, pa.float64()),
                         "weight": pa.array(out_w, pa.float64())})

    partials = ds.map_batches(partial, batch_format="pyarrow") \
        .materialize()
    if partials.count() > driver_threshold:
        # distributed per-key digest merge: associative, so one
        # map_groups pass leaves O(δ) centroids per key
        def merge_key(g):
            import pandas as pd
            m, w = _td_compress(g["mean"].to_numpy(),
                                g["weight"].to_numpy(), delta)
            return pd.DataFrame({key: [g[key].iloc[0]] * len(m),
                                 "mean": m, "weight": w})
        partials = partials.groupby(key).map_groups(
            merge_key, batch_format="pandas").materialize()
    parts = pa.concat_tables(
        [b for b in partials.iter_batches(batch_size=None,
                                          batch_format="pyarrow")])
    df = parts.to_pandas()
    out_keys: list = []
    out_cols: dict = {nm: [] for nm in names}
    for k, g in df.groupby(key, sort=True):
        m, w = _td_compress(g["mean"].to_numpy(), g["weight"].to_numpy(),
                            delta)
        out_keys.append(k)
        for q, nm in zip(qs, names):
            out_cols[nm].append(_td_quantile(m, w, q))
    return pa.table({key: pa.array(out_keys),
                     **{nm: pa.array(out_cols[nm], pa.float64())
                        for nm in names}})


def distinct_count_by(ds, key: str = "event_type", val: str = "user_id",
                      n_buckets: int | None = None,
                      driver_threshold: int = 5_000_000) -> pa.Table:
    """Exact count-distinct per key without shuffling raw rows: per-batch
    distinct (key, val) pairs (the combiner — repeats inside a batch
    collapse before the exchange) → hash-bucket by val (a value's every
    occurrence co-locates, so per-bucket distincts are globally distinct)
    → per-bucket per-key partial counts → tiny driver fold. Shuffle
    volume = distinct pairs per batch at 16 B/row."""
    import pandas as pd
    from ..cluster import cluster_buckets
    nb = n_buckets or cluster_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({key: batch[key],
                      "v": pc.cast(batch[val], pa.int64())})
        return t.group_by([key, "v"]).aggregate([])

    def add_bucket(t: pa.Table) -> pa.Table:
        h = (t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
             % np.uint64(nb)).astype(np.int64)
        return t.append_column("_bucket", pa.array(h))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_bucket"]).drop_duplicates()
        return g.groupby(key, sort=False).size().reset_index(name="n")

    pairs = ds.map_batches(partial, batch_format="pyarrow").materialize()
    if pairs.count() <= driver_threshold:
        # per-batch distinct pairs fit on the driver: one dedupe pass
        # beats the bucket shuffle's fixed cost (jaccard/minhash pattern)
        import ray as _ray
        df = pa.concat_tables(_ray.get(pairs.materialize().to_arrow_refs())).to_pandas()
        folded = (df.drop_duplicates().groupby(key, sort=True)["v"].size())
        return pa.table({key: pa.array(folded.index.to_numpy()),
                         "n_distinct": pa.array(folded.to_numpy(),
                                                pa.int64())})
    counts = (pairs
              .map_batches(add_bucket, batch_format="pyarrow")
              .groupby("_bucket").map_groups(per_bucket,
                                             batch_format="pandas"))
    folded = (pa.concat_tables(
        [b for b in counts.iter_batches(batch_size=None,
                                        batch_format="pyarrow")])
        .to_pandas().groupby(key, sort=True)["n"].sum())
    return pa.table({key: pa.array(folded.index.to_numpy()),
                     "n_distinct": pa.array(folded.to_numpy(), pa.int64())})


_HLL_TWO32 = np.float64(2.0 ** 32)


def hll_distinct_by(ds, key: str = "event_type", val: str = "user_id",
                    p: int = 12) -> pa.Table:
    """HyperLogLog count-distinct estimate per key — the 100 TB path: ONE
    streaming pass, NO shuffle of values at all. Per-batch register
    partials (key, reg, rank) rows — at most |keys|·2^p per batch — are
    max-merged on the driver (bounded, independent of row count).
    Flajolet et al. 2007 with the standard small-range correction;
    σ ≈ 1.04/√2^p ≈ 1.6 % at p=12. The same register rows could instead
    feed a groupby(key, reg).max() for a fully-distributed merge when
    |keys| is unbounded."""
    import pandas as pd
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key].to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(
            pc.cast(batch[val], pa.int64()).to_numpy(zero_copy_only=False))
        reg = (h >> np.uint64(64 - p)).astype(np.int64)
        with np.errstate(over="ignore"):
            rest = h << np.uint64(p)
        hi = (rest >> np.uint64(32)).astype(np.float64)
        lo = (rest & np.uint64(0xFFFFFFFF)).astype(np.float64)
        # exact bit_length via float log2 of 32-bit halves (< 2^53: exact)
        bl = np.where(hi > 0, 33 + np.floor(np.log2(np.maximum(hi, 1))),
                      np.where(lo > 0,
                               1 + np.floor(np.log2(np.maximum(lo, 1))), 0))
        rank = np.where(rest == 0, 64 - p + 1, 65 - bl).astype(np.int8)
        kidx, uk = pd.factorize(keys)
        regs = np.zeros((len(uk), m), dtype=np.int8)
        np.maximum.at(regs, (kidx, reg), rank)
        ki, ri = np.nonzero(regs)
        return pa.table({key: pa.array(uk[ki]),
                         "reg": pa.array(ri.astype(np.int64)),
                         "rank": pa.array(regs[ki, ri].astype(np.int64))})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    regs: dict = {}
    for b in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        kv = b[key].to_numpy(zero_copy_only=False)
        rg = b["reg"].to_numpy(zero_copy_only=False)
        rk = b["rank"].to_numpy(zero_copy_only=False)
        for k in pd.unique(kv):
            r = regs.setdefault(k, np.zeros(m, dtype=np.int64))
            sel = kv == k
            np.maximum.at(r, rg[sel], rk[sel])
    alpha = 0.7213 / (1 + 1.079 / m)
    out_k, out_n = [], []
    for k in sorted(regs):
        r = regs[k]
        e = alpha * m * m / np.sum(np.exp2(-r.astype(np.float64)))
        v = int(np.sum(r == 0))
        if e <= 2.5 * m and v > 0:
            e = m * np.log(m / v)
        out_k.append(k)
        out_n.append(int(round(e)))
    return pa.table({key: pa.array(out_k),
                     "n_distinct_est": pa.array(out_n, pa.int64())})


def topk_by_key(ds, keys: list[str], val: str, k: int = 3) -> pa.Table:
    """Exact heavy hitters per key: bounded-cardinality (keys, val)
    counts via the count_by driver fold (per-batch partials — the
    shuffle-free path for bounded domains), then per-key top-k with
    deterministic ties (count desc, value asc). For unbounded value
    cardinality swap the fold for distributed count_by + a per-key
    bounded heap (SpaceSaving territory); the rank step is unchanged."""
    import pandas as pd
    counts = count_by(ds, keys + [val], fold_driver=True)
    df = counts.to_pandas()
    df = df.sort_values(keys + ["rows", val],
                        ascending=[True] * len(keys) + [False, True],
                        kind="mergesort")
    df["rank"] = (df.groupby(keys, sort=False).cumcount() + 1).astype("int64")
    df = df[df["rank"] <= k].reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def head_per_key(ds, key: str = "conv_id", order_col: str = "turn_idx",
                 n: int = 2, n_buckets: int | None = None):
    """First n rows per key in order_col order ("take the first N turns
    per conversation / first N docs per domain") — hash-bucketed: a key's
    rows co-locate, ONE vectorized pandas sort + groupby-head per bucket.
    No global sort; the shuffle moves only the selected columns."""
    from .ratelimit import _per_bucket

    def fn(g):
        g = g.sort_values([key, order_col], kind="mergesort")
        return g.groupby(key, sort=False).head(n)

    return _per_bucket(ds, fn, n_buckets=n_buckets, key=key)


def concat_group_text(ds, key: str = "conv_id", order_col: str = "turn_idx",
                      text_col: str = "text", sep: str = "\n",
                      n_buckets: int | None = None):
    """Ordered per-key text concatenation — the "turns → training
    document" reconstruction every conversational-data pipeline needs
    (string_agg(text, sep ORDER BY order_col) GROUP BY key). Hash-bucketed
    like head_per_key: a key's rows co-locate once, then ONE vectorized
    pass per bucket (sort → run-detect offsets → Arrow binary_join);
    no Python loop per group. Output: key, doc, n_turns, n_chars.

    Scale note: a group's whole text lands in one worker (inherent to
    the operator — the output row IS the group); per-key size is bounded
    by conversation length, not corpus size."""
    from .ratelimit import _with_bucket

    empty = pa.schema([(key, pa.string()), ("doc", pa.large_string()),
                       ("n_turns", pa.int64()), ("n_chars", pa.int64())])

    def fn(g: pa.Table) -> pa.Table:
        # pure-Arrow per-bucket pass: the text payload never round-trips
        # through pandas object arrays (measured ~30% of the stage on
        # long docs)
        if not g.num_rows:
            return empty.empty_table()
        g = g.drop_columns(["_bucket"]).sort_by(
            [(key, "ascending"), (order_col, "ascending")])
        keys = pc.cast(g[key], pa.string()).combine_chunks()
        n = len(keys)
        changed = pc.not_equal(keys.slice(1), keys.slice(0, n - 1))
        starts = np.r_[0, np.flatnonzero(
            changed.to_numpy(zero_copy_only=False)) + 1]
        offsets = np.r_[starts, n].astype(np.int64)
        texts = pc.cast(pc.fill_null(g[text_col], ""),
                        pa.large_string()).combine_chunks()
        lst = pa.LargeListArray.from_arrays(offsets, texts)
        docs = pc.binary_join(lst, pa.scalar(sep, pa.large_string()))
        return pa.table({
            key: keys.take(pa.array(starts)),
            "doc": docs,
            "n_turns": pa.array(np.diff(offsets)),
            "n_chars": pc.cast(pc.utf8_length(docs), pa.int64()),
        })

    return (_with_bucket(ds, key=key, n_buckets=n_buckets)
            .groupby("_bucket").map_groups(fn, batch_format="pyarrow"))


def global_topn(ds, sort_col: str = "value", n: int = 100,
                tie_cols: tuple = ("event_id",),
                descending: bool = True) -> pa.Table:
    """Exact global top-n rows under a total order (sort_col, then
    tie_cols ascending) WITHOUT a global sort shuffle: each block
    contributes its local top-n (a per-batch vectorized partial), the
    driver merges ≤ n×blocks candidate rows and takes the final head.
    Driver memory is O(n · #blocks) — the bounded-fold pattern, same as
    topk_by_key — vs a full all-to-all Sort for ds.sort().limit(n)."""
    order = "descending" if descending else "ascending"
    keys = [(sort_col, order)] + [(c, "ascending") for c in tie_cols]

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows > n:
            t = t.take(pc.sort_indices(t, sort_keys=keys)[:n])
        return t

    parts = ds.map_batches(partial, batch_format="pyarrow")
    cands = [b for b in parts.iter_batches(batch_size=None,
                                           batch_format="pyarrow")
             if b.num_rows]
    if not cands:
        s = parts.schema()
        return pa.schema(list(zip(s.names, s.types))).empty_table()
    merged = pa.concat_tables(cands, promote_options="default")
    return merged.take(pc.sort_indices(merged, sort_keys=keys)[:n])


# Count-Min sketch constants: d pairwise-independent-ish rows via fixed
# odd multipliers (same affine-mod-2^64 family as the MinHash perms).
_CM_MULT = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                     0x165667B19E3779F9, 0x27D4EB2F165667C5],
                    dtype=np.uint64)
_CM_ADD = np.array([0x85EBCA6B, 0xCC9E2D51, 0x1B873593, 0xE6546B64],
                   dtype=np.uint64)


def _cm_slots(h64: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, len(h64)) slot indices from a base uint64 key hash."""
    h = h64[None, :] * _CM_MULT[:depth, None] + _CM_ADD[:depth, None]
    # top bits have the best mixing under the affine map
    return (h >> np.uint64(64 - 30)).astype(np.int64) % width


def countmin_topk(ds, col: str = "user_id", k: int = 20,
                  width: int = 16384, depth: int = 4,
                  cand_per_block: int = 256) -> pa.Table:
    """Approximate heavy hitters via a Count-Min sketch (Cormode &
    Muthukrishnan 2005): estimate(x) = min_r sketch[r][h_r(x)], an
    OVER-estimate within εN (ε = e/width) with prob 1-δ (δ = e^-depth).

    One pass, shuffle-free: each batch groups locally, scatters its
    (key, partial-count) pairs into sketch cells and emits (a) ≤ d ×
    distinct nonzero sketch-cell increments and (b) its local top
    `cand_per_block` candidate keys. The driver folds cells into the
    d×w array (O(d·w) memory, independent of cardinality) and scores
    only candidate keys — any true global top-k key is necessarily a
    local top candidate in at least one block. Use when exact
    topk_by_key's count_by state (O(distinct keys)) no longer fits."""
    from ..functions import hash64

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by([col]).aggregate([([], "count_all")])
        cnts = g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        kstr = pc.cast(g[col], pa.string())
        if isinstance(kstr, pa.ChunkedArray):
            kstr = kstr.combine_chunks()
        # hash the STRING form — the estimate step below re-hashes
        # candidates from their string form, so both must agree
        h64 = hash64(kstr).to_numpy(zero_copy_only=False)
        slots = _cm_slots(h64, depth, width)              # (d, m)
        m = len(cnts)
        rows = np.repeat(np.arange(depth, dtype=np.int64), m)
        cells = pa.table({
            "kind": pa.array(np.zeros(depth * m, dtype=np.int8)),
            "row": pa.array(rows),
            "slot": pa.array(slots.ravel()),
            "weight": pa.array(np.tile(cnts, depth)),
            "key": pa.nulls(depth * m, pa.string()),
        })
        top = np.argsort(-cnts, kind="stable")[:cand_per_block]
        cand = pa.table({
            "kind": pa.array(np.ones(len(top), dtype=np.int8)),
            "row": pa.array(np.zeros(len(top), dtype=np.int64)),
            "slot": pa.array(np.zeros(len(top), dtype=np.int64)),
            "weight": pa.array(cnts[top]),
            "key": kstr.take(pa.array(top, pa.int64())),
        })
        return pa.concat_tables([cells, cand])

    sketch = np.zeros((depth, width), dtype=np.int64)
    cand_keys: set = set()
    for b in (ds.map_batches(partial, batch_format="pyarrow")
              .iter_batches(batch_size=None, batch_format="pyarrow")):
        kind = b["kind"].to_numpy(zero_copy_only=False)
        cells = kind == 0
        np.add.at(sketch,
                  (b["row"].to_numpy(zero_copy_only=False)[cells],
                   b["slot"].to_numpy(zero_copy_only=False)[cells]),
                  b["weight"].to_numpy(zero_copy_only=False)[cells])
        cand_keys.update(b.filter(pa.array(~cells))["key"].to_pylist())
    cand = sorted(x for x in cand_keys if x is not None)
    if not cand:
        return pa.table({col: pa.array([], pa.string()),
                         "est_rows": pa.array([], pa.int64())})
    h64 = hash64(pa.array(cand, pa.string())).to_numpy(zero_copy_only=False)
    slots = _cm_slots(h64, depth, width)
    est = sketch[np.arange(depth)[:, None], slots].min(axis=0)
    top = sorted(range(len(cand)), key=lambda i: (-est[i], cand[i]))[:k]
    return pa.table({col: pa.array([cand[i] for i in top], pa.string()),
                     "est_rows": pa.array(est[top], pa.int64())})


def lag_by_key(ds, key: str = "user_id", order_cols: tuple = ("ts",),
               value_col: str = "ts", periods: int = 1,
               out_col: str | None = None, n_buckets: int | None = None):
    """Per-key LAG(value_col, periods) under (key, *order_cols) order —
    the SQL window function (LAG ... OVER (PARTITION BY key ORDER BY
    order_cols)). Hash-bucketed like head_per_key: each key's rows
    co-locate once, then ONE vectorized pandas groupby-shift per bucket.
    Emits every input column plus `out_col` (null for the first
    `periods` rows of each key)."""
    from .ratelimit import _per_bucket
    out_col = out_col or f"prev_{value_col}"

    def fn(g):
        g = g.sort_values([key, *order_cols], kind="mergesort")
        g[out_col] = g.groupby(key, sort=False)[value_col].shift(periods)
        return g

    return _per_bucket(ds, fn, n_buckets=n_buckets, key=key)


def profile_columns(ds, columns: list[str] | None = None,
                    driver_threshold: int = 5_000_000) -> pa.Table:
    """Dataset profiler — the 'describe' of a 100 TB table: one long-form
    row per column with exact (n_rows, n_nulls, n_distinct), the data-
    audit readout run before training-corpus ingestion. n_distinct
    matches SQL COUNT(DISTINCT col) (nulls excluded).

    Shape: ONE pass emits per-batch per-column (rows, nulls) scalars plus
    the batch's DISTINCT (column, value-as-string) pairs (the combiner —
    within-batch repeats collapse before any exchange; casting to string
    is injective for the scalar types profiled, so string-distinct =
    value-distinct). Pairs then fold exactly like distinct_count_by:
    whole-pair dedupe on the driver below `driver_threshold`, else
    hash-bucketed by value so per-bucket distincts are globally distinct.
    Counts fold driver-side — O(columns), not O(rows)."""
    import ray as _ray

    if columns is None:
        columns = ds.schema().names
    from ..cluster import cluster_buckets
    nb = cluster_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        cols_out, rows_out, nulls_out, vals_col, vals_val = [], [], [], [], []
        for c in columns:
            arr = batch[c]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            cols_out.append(c)
            rows_out.append(len(arr))
            nulls_out.append(arr.null_count)
            u = pc.unique(pc.cast(arr.drop_null(), pa.string()))
            vals_col.extend([c] * len(u))
            vals_val.extend(u.to_pylist())
        stats = pa.table({"column": pa.array(cols_out, pa.string()),
                          "n_rows": pa.array(rows_out, pa.int64()),
                          "n_nulls": pa.array(nulls_out, pa.int64()),
                          "value": pa.nulls(len(cols_out), pa.string()),
                          "_kind": pa.array([0] * len(cols_out), pa.int8())})
        pairs = pa.table({"column": pa.array(vals_col, pa.string()),
                          "n_rows": pa.array(
                              np.zeros(len(vals_col), np.int64)),
                          "n_nulls": pa.array(
                              np.zeros(len(vals_col), np.int64)),
                          "value": pa.array(vals_val, pa.string()),
                          "_kind": pa.array([1] * len(vals_col), pa.int8())})
        return pa.concat_tables([stats, pairs])

    parts = ds.map_batches(partial, batch_format="pyarrow").materialize()
    import pandas as pd
    total = parts.count()
    if total <= driver_threshold:
        df = pa.concat_tables(_ray.get(parts.materialize().to_arrow_refs())).to_pandas()
    else:
        # value-bucketed distributed dedupe: a value's every occurrence
        # co-locates, so per-bucket distinct pair counts are globally
        # correct; scalar stat rows ride bucket 0
        def add_bucket(t: pa.Table) -> pa.Table:
            h = pd.util.hash_array(
                np.asarray(t["value"].to_pylist(), dtype=object),
                categorize=False).astype(np.uint64)
            h = np.where(np.asarray(t["_kind"]) == 0, np.uint64(0),
                         h % np.uint64(nb)).astype(np.int64)
            return t.append_column("_bucket", pa.array(h))

        def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
            stats = g[g["_kind"] == 0]
            p = g[g["_kind"] == 1].drop_duplicates(["column", "value"])
            dcnt = p.groupby("column", sort=False).size() \
                .reset_index(name="n")
            dcnt["_kind"] = 2
            out = pd.concat([stats[["column", "n_rows", "n_nulls",
                                    "_kind"]],
                             dcnt.rename(columns={"n": "n_rows"})
                             .assign(n_nulls=0)[["column", "n_rows",
                                                 "n_nulls", "_kind"]]])
            return out

        folded = (parts.map_batches(add_bucket, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(per_bucket, batch_format="pandas"))
        fdf = pa.concat_tables(
            [b for b in folded.iter_batches(batch_size=None,
                                            batch_format="pyarrow")]
        ).to_pandas()
        base = (fdf[fdf["_kind"] == 0].groupby("column", sort=True)
                [["n_rows", "n_nulls"]].sum())
        dist = (fdf[fdf["_kind"] == 2].groupby("column", sort=True)
                ["n_rows"].sum())
        return pa.table({
            "column": pa.array(base.index.to_numpy(object), pa.string()),
            "n_rows": pa.array(base["n_rows"].to_numpy(np.int64)),
            "n_nulls": pa.array(base["n_nulls"].to_numpy(np.int64)),
            "n_distinct": pa.array(
                dist.reindex(base.index).fillna(0).to_numpy(np.int64)),
        })

    stats = df[df["_kind"] == 0]
    base = stats.groupby("column", sort=True)[["n_rows", "n_nulls"]].sum()
    pairs = df[df["_kind"] == 1].drop_duplicates(["column", "value"])
    dist = pairs.groupby("column", sort=True).size()
    return pa.table({
        "column": pa.array(base.index.to_numpy(object), pa.string()),
        "n_rows": pa.array(base["n_rows"].to_numpy(np.int64)),
        "n_nulls": pa.array(base["n_nulls"].to_numpy(np.int64)),
        "n_distinct": pa.array(
            dist.reindex(base.index).fillna(0).astype(np.int64)
            .to_numpy()),
    })


def sft_pairs(ds, key: str = "conv_id", order_col: str = "turn_idx",
              role_col: str = "role", text_col: str = "text",
              prompt_role: str = "user", response_role: str = "assistant",
              n_buckets: int | None = None):
    """Prompt→response pair construction for SFT training data: every
    `response_role` turn pairs with the LATEST preceding `prompt_role`
    turn of the same conversation (intervening turns — tool calls,
    system notes — are skipped); responses with no preceding prompt are
    dropped. SQL twin: last_value(... IGNORE NULLS) OVER (PARTITION BY
    conv ORDER BY turn ROWS ... 1 PRECEDING) + a role filter.

    Shape: the same hash-bucketed layout as lag_by_key — a
    conversation's rows co-locate once; inside the bucket a pure-Arrow
    pass (the text payload never converts to Python objects): the
    prompt forward-fill is a numpy running-max over ROW INDICES reset at
    conversation boundaries, and prompts resolve with one Arrow take.
    Shuffle volume is the projected 4 columns once."""
    from .ratelimit import _with_bucket

    empty = pa.schema([(key, pa.string()),
                       ("prompt_turn_idx", pa.int64()),
                       ("response_turn_idx", pa.int64()),
                       ("prompt", pa.large_string()),
                       ("response", pa.large_string())])

    def fn(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return empty.empty_table()
        g = g.drop_columns(["_bucket"]).sort_by(
            [(key, "ascending"), (order_col, "ascending")])
        keys = pc.cast(g[key], pa.string()).combine_chunks()
        texts = pc.cast(pc.fill_null(g[text_col], ""),
                        pa.large_string()).combine_chunks()
        order = pc.cast(g[order_col], pa.int64()).combine_chunks()
        n = len(keys)
        i = np.arange(n, dtype=np.int64)
        new = np.ones(n, dtype=bool)
        new[1:] = pc.not_equal(keys.slice(1), keys.slice(0, n - 1)) \
            .to_numpy(zero_copy_only=False)
        conv_start = np.maximum.accumulate(np.where(new, i, -1))
        is_p = pc.fill_null(pc.equal(g[role_col], prompt_role), False) \
            .to_numpy(zero_copy_only=False).astype(bool)
        last_p = np.maximum.accumulate(np.where(is_p, i, -1))
        is_r = pc.fill_null(pc.equal(g[role_col], response_role), False) \
            .to_numpy(zero_copy_only=False).astype(bool)
        m = is_r & (last_p >= conv_start)
        sel = pa.array(i[m])
        psel = pa.array(last_p[m])
        return pa.table({
            key: keys.take(sel),
            "prompt_turn_idx": order.take(psel),
            "response_turn_idx": order.take(sel),
            "prompt": texts.take(psel),
            "response": texts.take(sel),
        })

    return (_with_bucket(
        ds.select_columns([key, order_col, role_col, text_col]),
        key=key, n_buckets=n_buckets)
        .groupby("_bucket").map_groups(fn, batch_format="pyarrow"))


def turn_windows(ds, key: str = "conv_id", order_col: str = "turn_idx",
                 text_col: str = "text", k: int = 4, sep: str = "\n",
                 n_buckets: int | None = None):
    """Sliding context windows per conversation — the 'last k turns'
    training-context constructor (context-length curriculum, RAG window
    building): each turn emits the sep-joined text of the up-to-k turns
    ending at it. SQL twin: string_agg(text, sep) OVER (PARTITION BY conv
    ORDER BY turn ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW).

    Shape: hash-bucketed, ONE pure-Arrow pass per bucket (the text
    payload never converts to Python objects); inside the bucket every
    row's window indices explode once (repeat/cumsum, the same trick as
    the interval-explode in joins) into ONE Arrow LargeListArray +
    binary_join — O(k·rows) flat work, no per-row Python."""
    from .ratelimit import _with_bucket

    empty = pa.schema([(key, pa.string()), (order_col, pa.int64()),
                       ("context", pa.large_string())])

    def fn(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return empty.empty_table()
        g = g.drop_columns(["_bucket"]).sort_by(
            [(key, "ascending"), (order_col, "ascending")])
        keys = pc.cast(g[key], pa.string()).combine_chunks()
        texts = pc.cast(pc.fill_null(g[text_col], ""),
                        pa.large_string()).combine_chunks()
        n = len(keys)
        i = np.arange(n, dtype=np.int64)
        new = np.ones(n, dtype=bool)
        new[1:] = pc.not_equal(keys.slice(1), keys.slice(0, n - 1)) \
            .to_numpy(zero_copy_only=False)
        start_idx = np.maximum.accumulate(np.where(new, i, -1))
        length = np.minimum(k, i - start_idx + 1)
        offs = np.concatenate(([0], np.cumsum(length)))
        wstart = i - length + 1
        flat = (wstart.repeat(length)
                + (np.arange(offs[-1]) - offs[:-1].repeat(length)))
        lists = pa.LargeListArray.from_arrays(
            pa.array(offs, pa.int64()), texts.take(pa.array(flat)))
        return pa.table({
            key: keys,
            order_col: pc.cast(g[order_col], pa.int64()),
            "context": pc.binary_join(
                lists, pa.scalar(sep, pa.large_string())),
        })

    return (_with_bucket(ds.select_columns([key, order_col, text_col]),
                         key=key, n_buckets=n_buckets)
            .groupby("_bucket").map_groups(fn, batch_format="pyarrow"))


def cumsum_by_key(ds, key: str = "user_id", order_cols: tuple = ("ts",),
                  value_col: str = "value", out_col: str = "running_total",
                  n_buckets: int | None = None):
    """Per-key running total — SUM(value) OVER (PARTITION BY key ORDER BY
    order_cols ROWS UNBOUNDED PRECEDING). Same bucketed shape as
    lag_by_key; the accumulation order inside a key is the declared sort
    order, so float totals are reproducible and match a SQL window
    oracle bit-for-bit."""
    from .ratelimit import _per_bucket

    def fn(g):
        g = g.sort_values([key, *order_cols], kind="mergesort")
        g[out_col] = g.groupby(key, sort=False)[value_col].cumsum()
        return g

    return _per_bucket(ds, fn, n_buckets=n_buckets, key=key)


def rank_by_key(ds, key: str = "user_id", order_cols: tuple = ("value",),
                method: str = "rank", descending: bool = False,
                n_tiles: int = 4, out_col: str = "rnk",
                n_buckets: int | None = None):
    """Per-key ranking window functions — RANK / ROW_NUMBER / NTILE(n)
    OVER (PARTITION BY key ORDER BY order_cols). Same bucketed shape as
    lag_by_key; one vectorized pandas pass per bucket.

    method='rank': SQL RANK() (ties share the min rank, next rank skips)
    over order_cols[0] only — tie groups need no tie-break because equal
    keys get equal ranks. method='row_number' / 'ntile': total order
    over all order_cols (caller must make it deterministic); NTILE
    splits each key's rows into n_tiles groups whose sizes differ by at
    most one, larger tiles first (SQL semantics)."""
    if method not in ("rank", "row_number", "ntile"):
        raise ValueError(f"unknown method {method!r}")
    from .ratelimit import _per_bucket

    def fn(g):
        if method == "rank":
            g[out_col] = (g.groupby(key, sort=False)[order_cols[0]]
                          .rank(method="min", ascending=not descending)
                          .astype("int64"))
            return g
        g = g.sort_values([key, *order_cols], kind="mergesort",
                          ascending=[True] + [not descending]
                          * len(order_cols))
        idx = g.groupby(key, sort=False).cumcount().to_numpy()
        if method == "row_number":
            g[out_col] = idx + 1
            return g
        cnt = (g.groupby(key, sort=False)[order_cols[0]]
               .transform("size").to_numpy())
        base, rem = cnt // n_tiles, cnt % n_tiles
        big = rem * (base + 1)               # rows covered by +1-size tiles
        in_big = idx < big
        tile = np.where(
            in_big,
            idx // np.maximum(base + 1, 1),
            rem + (idx - big) // np.maximum(base, 1))
        # fewer rows than tiles: every row its own tile (base=0 branch)
        g[out_col] = (tile + 1).astype("int64")
        return g

    return _per_bucket(ds, fn, n_buckets=n_buckets, key=key)


def centroid_by_label(ds, label_col: str = "label",
                      vec_col: str = "embedding", ndp: int = 6,
                      driver_threshold: int = 2_000_000):
    """Per-label embedding centroid (the k-means / IVF building block) in
    long form (label, dim, centroid): per-batch partial (sum, count) per
    (label, dim) — one reshape + np.add.at per batch, no Python loop —
    then a merge and one divide. Shuffle volume is O(labels × dims) per
    batch, independent of row count. The merge is dual-path: below
    `driver_threshold` partial rows ONE driver group_by folds the
    materialized partials (skips the bucket shuffle's multi-second fixed
    cost — the dup_ngram_fraction pattern), else the hash-bucketed
    distributed merge. Rounded half-away to `ndp` dp to match a SQL
    avg() oracle."""
    def partial(t: pa.Table) -> pa.Table:
        emb = t[vec_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        offs = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        dims = int(offs[1] - offs[0]) if len(offs) > 1 else 0
        mat = flat.reshape(-1, dims).astype(np.float64)
        labels = t[label_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), dims))
        np.add.at(sums, inv, mat)
        cnts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        k = len(uniq)
        return pa.table({
            label_col: pa.array(np.repeat(uniq, dims).astype(np.int64)),
            "dim": pa.array(np.tile(np.arange(1, dims + 1), k)),
            "s": pa.array(sums.ravel()),
            "n": pa.array(np.repeat(cnts, dims)),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow") \
        .materialize()
    if partials.count() <= driver_threshold:
        import ray as _ray
        import ray.data as rd
        tbl = pa.concat_tables(_ray.get(partials.materialize().to_arrow_refs()))
        folded = tbl.group_by([label_col, "dim"]) \
            .aggregate([("s", "sum"), ("n", "sum")])
        merged = rd.from_arrow(pa.table({
            label_col: folded[label_col], "dim": folded["dim"],
            "s": folded["s_sum"], "n": folded["n_sum"]}))
    else:
        merged = bucket_merge(
            partials,
            [label_col, "dim"], {"s": ("s", "sum"), "n": ("n", "sum")})

    scale = 10.0 ** ndp

    def finish(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        c = s / n
        c = np.copysign(np.floor(np.abs(c) * scale + 0.5) / scale, c)
        return pa.table({label_col: pc.cast(t[label_col], pa.int64()),
                         "dim": pc.cast(t["dim"], pa.int64()),
                         "centroid": pa.array(c, pa.float64())})

    return merged.map_batches(finish, batch_format="pyarrow")


def pivot_counts(ds, row_key: str = "facility", col_key: str = "severity",
                 col_values: tuple | None = None,
                 prefix: str = "s") -> pa.Table:
    """Wide pivot of grouped counts — one output row per row_key, one
    int64 column per col_key value (zero-filled). Built on count_by's
    partial-count fold, so the driver holds O(|rows| × |cols|) cells —
    use ONLY for bounded domains (facility × severity = 192); unbounded
    pivots belong in long form. col_values pins the column set (and
    order) when a value may be absent from the data."""
    long = count_by(ds, [row_key, col_key], fold_driver=True)
    import pandas as pd
    df = long.to_pandas()
    if col_values is None:
        col_values = tuple(sorted(df[col_key].unique()))
    wide = (df.pivot_table(index=row_key, columns=col_key, values="rows",
                           aggfunc="sum", fill_value=0)
            .reindex(columns=list(col_values), fill_value=0)
            .sort_index())
    out = {row_key: pa.array(wide.index.to_numpy())}
    for c in col_values:
        out[f"{prefix}{c}"] = pa.array(
            wide[c].to_numpy().astype(np.int64), pa.int64())
    return pa.table(out)


def zscore_outliers(ds, key: str = "event_type", value_col: str = "value",
                    id_cols: tuple = ("event_id",), z: float = 3.0,
                    ndp: int = 6):
    """Per-key z-score outlier detection (the telemetry anomaly readout):
    emit rows with |value - mean(key)| > z·stddev_pop(key). Two passes:
    per-batch (n, Σv, Σv²) partials per key — O(keys) rows each — folded
    on the driver (key domains are bounded: event types, tools,
    facilities), then one broadcast filter pass computing the z column.
    Population stddev matches SQL STDDEV_POP; z rounded half-away to
    `ndp` so the DuckDB oracle hashes identically."""
    import ray as _ray

    def partial(t: pa.Table) -> pa.Table:
        k = t[key]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        v = pc.cast(t[value_col], pa.float64()).to_numpy(
            zero_copy_only=False)
        uniq, inv = np.unique(np.asarray(k.to_pylist(), dtype=object),
                              return_inverse=True)
        return pa.table({
            key: pa.array(uniq, pa.string()),
            "n": pa.array(np.bincount(inv, minlength=len(uniq))
                          .astype(np.int64)),
            "s": pa.array(np.bincount(inv, weights=v,
                                      minlength=len(uniq))),
            "s2": pa.array(np.bincount(inv, weights=v * v,
                                       minlength=len(uniq))),
        })

    stats: dict = {}
    for t in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        for kk, n_, s_, s2_ in zip(t[key].to_pylist(),
                                   t["n"].to_pylist(),
                                   t["s"].to_pylist(),
                                   t["s2"].to_pylist()):
            a = stats.setdefault(kk, [0, 0.0, 0.0])
            a[0] += n_
            a[1] += s_
            a[2] += s2_
    mean_sd = {}
    for kk, (n_, s_, s2_) in stats.items():
        mu = s_ / n_
        var = max(s2_ / n_ - mu * mu, 0.0)
        mean_sd[kk] = (mu, var ** 0.5)
    ref = _ray.put(mean_sd)
    scale = 10.0 ** ndp

    def filt(t: pa.Table) -> pa.Table:
        ms = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
        keys = t[key].to_pylist()
        mu = np.array([ms[kk][0] for kk in keys])
        sd = np.array([ms[kk][1] for kk in keys])
        v = pc.cast(t[value_col], pa.float64()).to_numpy(
            zero_copy_only=False)
        zs = np.where(sd > 0, (v - mu) / np.where(sd > 0, sd, 1.0), 0.0)
        keep = np.abs(v - mu) > z * sd
        zr = np.copysign(np.floor(np.abs(zs) * scale + 0.5) / scale, zs)
        out = t.select([*id_cols, key, value_col]) \
               .append_column("z", pa.array(zr, pa.float64()))
        return out.filter(pa.array(keep))

    return ds.map_batches(filt, batch_format="pyarrow")


def funnel_steps(ds, steps: list[str], key: str = "user_id",
                 type_col: str = "event_type", ts_col: str = "ts"):
    """Ordered funnel completion per key: for steps [s1, s2, …] emit one
    row per key that performed s1, then s2 STRICTLY after its s1 time,
    then s3 strictly after that, … with the step times (t1, t2, …).
    The events analytics staple (conversion funnels over telemetry).

    Shape: one keyed shuffle (_per_bucket on `key`), then per bucket a
    VECTORIZED cascade — one pandas groupby-min per step (no per-key
    Python): t_i = min ts of step-i rows with ts > t_{i-1}(key)."""
    import pandas as pd

    from .ratelimit import _per_bucket

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        cur = None            # Series: key → time of previous step
        outs = []
        for i, st in enumerate(steps):
            rows = g[g[type_col] == st]
            if cur is not None:
                prev = rows[key].map(cur)
                rows = rows[rows[ts_col] > prev.fillna(pd.Timestamp.max)]
            cur = rows.groupby(key, sort=False)[ts_col].min()
            outs.append(cur.rename(f"t{i + 1}"))
        res = pd.concat(outs, axis=1, join="inner").reset_index()
        return res.rename(columns={res.columns[0]: key})

    return _per_bucket(ds, fold, key=key)


def funnel_sql(steps: list[str], key: str = "user_id",
               type_col: str = "event_type", ts_col: str = "ts",
               table: str = "events") -> str:
    """Matching DuckDB chained-CTE oracle for funnel_steps."""
    ctes = []
    for i, st in enumerate(steps):
        s = st.replace("'", "''")
        if i == 0:
            ctes.append(
                f"f1 AS (SELECT {key}, MIN({ts_col}) AS t1 FROM {table} "
                f"WHERE {type_col} = '{s}' GROUP BY {key})")
        else:
            ctes.append(
                f"f{i + 1} AS (SELECT e.{key}, MIN(e.{ts_col}) AS t{i + 1} "
                f"FROM {table} e JOIN f{i} USING ({key}) "
                f"WHERE e.{type_col} = '{s}' AND e.{ts_col} > f{i}.t{i} "
                f"GROUP BY e.{key})")
    cols = ", ".join([f"f1.{key}"] + [f"t{i + 1}"
                                      for i in range(len(steps))])
    joins = " ".join(f"JOIN f{i + 1} USING ({key})"
                     for i in range(1, len(steps)))
    return (f"WITH {', '.join(ctes)} SELECT {cols} FROM f1 {joins}")


def ewma_by_key(ds, key: str = "user_id", order_cols: tuple = ("ts",),
                value_col: str = "value", alpha: float = 0.3,
                out_col: str = "ewma", ndp: int = 6):
    """Per-key exponentially-weighted moving average along the declared
    order — the streaming-smoother/anomaly-baseline op (EWMA is a
    recurrence, so no SQL oracle; pinned by a pandas-oracle pytest).
    Same one-keyed-shuffle shape as every window op here; inside a
    bucket pandas' C ewm kernel runs once per key group."""
    import pandas as pd

    from .ratelimit import _per_bucket

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, *order_cols], kind="mergesort")
        ew = (g.groupby(key, sort=False)[value_col]
              .transform(lambda s: s.ewm(alpha=alpha, adjust=True).mean()))
        g[out_col] = ew.round(ndp)
        return g

    return _per_bucket(ds, fold, key=key)


def corr_matrix(ds, cols: list[str], ndp: int = 6) -> pa.Table:
    """Pairwise Pearson correlation over numeric columns in ONE pass —
    the feature-audit readout before classifier training: per-block
    moment partials (n, Σx, ΣxᵀX — O(d²) doubles, independent of rows)
    fold on the driver; corr = cov/(σa·σb). Sample-vs-population
    normalization cancels, so the result equals SQL corr() exactly.
    Output long form (feature_a, feature_b, corr) for a < b, rounded
    half-away to `ndp` dp (DuckDB round() semantics). Null rows are the
    caller's concern (moments assume dense columns)."""
    d = len(cols)

    def moments(t: pa.Table) -> pa.Table:
        x = np.stack([pc.cast(t[c], pa.float64())
                      .to_numpy(zero_copy_only=False) for c in cols],
                     axis=1)
        return pa.table({
            "n": pa.array([float(len(x))]),
            "s": pa.array([x.sum(axis=0).tolist()]),
            "xx": pa.array([(x.T @ x).ravel().tolist()]),
        })

    n_tot, s, xx = 0.0, np.zeros(d), np.zeros(d * d)
    for b in ds.map_batches(moments, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        n_tot += float(np.sum(b["n"].to_numpy(zero_copy_only=False)))
        s += np.sum(np.asarray(b["s"].to_pylist(), np.float64), axis=0)
        xx += np.sum(np.asarray(b["xx"].to_pylist(), np.float64), axis=0)
    xx = xx.reshape(d, d)
    mean = s / max(n_tot, 1.0)
    cov = xx / max(n_tot, 1.0) - np.outer(mean, mean)
    sd = np.sqrt(np.maximum(np.diag(cov), 0.0))
    scale = 10.0 ** ndp
    a_out, b_out, c_out = [], [], []
    for i in range(d):
        for j in range(i + 1, d):
            denom = sd[i] * sd[j]
            c = cov[i, j] / denom if denom > 0 else float("nan")
            c = float(np.copysign(np.floor(abs(c) * scale + 0.5) / scale,
                                  c))
            a_out.append(cols[i])
            b_out.append(cols[j])
            c_out.append(c)
    return pa.table({"feature_a": pa.array(a_out, pa.string()),
                     "feature_b": pa.array(b_out, pa.string()),
                     "corr": pa.array(c_out, pa.float64())})


def winsorize_by_key(ds, key: str = "event_type", value_col: str = "value",
                     p_lo: float = 0.05, p_hi: float = 0.95,
                     out_col: str = "clipped"):
    """Per-key winsorization — clip every value to its key's
    [p_lo, p_hi] quantiles (quantile_disc rank semantics), the standard
    outlier-capping feature step. The bounds come from ONE
    percentiles_by_key fold (O(keys) driver state), broadcast once
    (ray.put), then a single vectorized clip pass — the corpus never
    shuffles."""
    import ray as _ray

    bounds = percentiles_by_key(ds, key=key, value_col=value_col,
                                qs=(p_lo, p_hi), names=("lo", "hi"))
    bmap = {r[key]: (r["lo"], r["hi"]) for r in bounds.to_pylist()}
    ref = _ray.put(bmap)

    def clip(batch: pa.Table) -> pa.Table:
        bm = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
        keys = batch[key].to_numpy(zero_copy_only=False)
        v = pc.cast(batch[value_col], pa.float64()) \
            .to_numpy(zero_copy_only=False)
        lo = np.array([bm.get(k, (-np.inf, np.inf))[0] for k in keys])
        hi = np.array([bm.get(k, (-np.inf, np.inf))[1] for k in keys])
        return batch.append_column(
            out_col, pa.array(np.minimum(np.maximum(v, lo), hi)))

    return ds.map_batches(clip, batch_format="pyarrow")


def rollup_counts(ds, cols: list[str], n_buckets: int | None = None):
    """Hierarchical totals — SQL GROUP BY ROLLUP(cols...): one row per
    prefix level (full key, each shorter prefix, grand total) with the
    unused trailing columns null. Computed from ONE pass of full-key
    partials (the count_by combiner); every coarser level folds from the
    finest counts on the driver — O(distinct full keys), no second scan,
    no extra shuffle."""
    fine = count_by(ds, cols)
    if isinstance(fine, pa.Table):
        tbl = fine
    else:
        tbl = pa.concat_tables(
            [b for b in fine.iter_batches(batch_size=None,
                                          batch_format="pyarrow")])
    import pandas as pd
    df = tbl.to_pandas()
    frames = [df.assign(_lvl=len(cols))]
    for lvl in range(len(cols) - 1, -1, -1):
        keep = cols[:lvl]
        g = (df.groupby(keep, sort=False, as_index=False)["rows"].sum()
             if keep else
             pd.DataFrame({"rows": [df["rows"].sum()]}))
        for c in cols[lvl:]:
            g[c] = None
        frames.append(g.assign(_lvl=lvl))
    out = pd.concat(frames, ignore_index=True)[cols + ["rows"]]
    fields = []
    for c in cols:
        t = tbl.schema.field(c).type
        fields.append((c, t))
    cols_out = {c: pa.array(out[c].astype(object).where(out[c].notna(),
                                                        None),
                            type=t) for c, t in fields}
    cols_out["rows"] = pa.array(out["rows"].to_numpy(np.int64))
    return pa.table(cols_out)


def mad_outliers(ds, key: str = "event_type", value_col: str = "value",
                 id_cols: tuple = ("event_id",), k: float = 3.0):
    """Robust per-key outlier detection via the median absolute
    deviation: emit rows with |value − median(key)| > k · MAD(key)
    (MAD = median of |value − median|) — immune to the heavy tails that
    inflate zscore_outliers' stddev. Two bounded-histogram quantile
    folds (median, then MAD over the residuals — both quantile_disc rank
    semantics over the 2-dp cent domain, O(keys × distinct values)
    driver state) + one broadcast filter pass; the corpus never
    shuffles. Exact quantile_disc SQL twin."""
    import ray as _ray

    med_t = percentiles_by_key(ds, key=key, value_col=value_col,
                               qs=(0.5,), names=("med",))
    med = {r[key]: r["med"] for r in med_t.to_pylist()}
    mref = _ray.put(med)

    def resid(batch: pa.Table) -> pa.Table:
        mm = _ray.get(mref) if isinstance(mref, _ray.ObjectRef) else mref
        keys = batch[key].to_numpy(zero_copy_only=False)
        v = pc.cast(batch[value_col], pa.float64()) \
            .to_numpy(zero_copy_only=False)
        m = np.array([mm.get(kk, np.nan) for kk in keys])
        # residuals stay on the 2-dp cent grid, so the second
        # bounded-histogram quantile fold stays exact; drop null values
        # and keys with no median (NaN residual would crash the cent
        # cast downstream)
        r = np.round(np.abs(v - m), 2)
        ok = ~np.isnan(r)
        return pa.table({key: batch[key].filter(pa.array(ok)),
                         value_col: pa.array(r[ok])})

    mad_t = percentiles_by_key(ds.map_batches(resid,
                                              batch_format="pyarrow"),
                               key=key, value_col=value_col,
                               qs=(0.5,), names=("mad",))
    mad = {r[key]: r["mad"] for r in mad_t.to_pylist()}
    bref = _ray.put({kk: (med[kk], mad[kk]) for kk in med})

    def flag(batch: pa.Table) -> pa.Table:
        bm = _ray.get(bref) if isinstance(bref, _ray.ObjectRef) else bref
        keys = batch[key].to_numpy(zero_copy_only=False)
        v = pc.cast(batch[value_col], pa.float64()) \
            .to_numpy(zero_copy_only=False)
        m = np.array([bm.get(kk, (np.nan, np.nan))[0] for kk in keys])
        d = np.array([bm.get(kk, (np.nan, np.nan))[1] for kk in keys])
        mask = np.abs(v - m) > k * d
        out = batch.select([*id_cols, key, value_col]) \
            .filter(pa.array(mask))
        return out

    return ds.map_batches(flag, batch_format="pyarrow")
