"""Temporal joins Ray Data lacks natively.

- asof_join: each left row pairs with the LATEST right row whose
  timestamp is <= the left row's, per key (DuckDB `ASOF JOIN` / pandas
  `merge_asof` semantics) — the canonical enrich-with-versioned-
  dimension operator (e.g. join every event to the user's most recent
  signup / config version / model snapshot).
- range_join: each left row pairs with EVERY right interval containing
  its timestamp, per key (the inequality/interval join: events ↔
  maintenance windows, sessions, campaigns).

Shape (shared): both sides widen to a common schema and hash-bucket by
the join key via a union (a key's rows co-locate), then ONE vectorized
pandas pass per bucket. Shuffle volume = both inputs once; the only
blowup is range_join's genuine per-key match multiplicity. A hot key
can't be salted here (every salt would need the key's full right side);
at web scale the right side (versions/windows) is bounded per key, so
skew cost is the left side only — same bound as any keyed shuffle.

Dual path (same pattern as stages/dedup.py): below `driver_threshold`
total rows the co-bucketed union is folded in ONE driver-side pandas
pass — Ray's sort-shuffle has a multi-second fixed cost that dwarfs the
work at small scale. The union is materialized either way: the groupby
shuffle would materialize its input internally anyway, so the count
costs no extra pass.

Output dtypes: pandas merge/merge_asof upcast int64→float64 whenever an
intermediate holds NaN (unmatched left rows before the inner filter,
null-widened side columns), which corrupts int ids above 2^53 and broke
the driver's value-hash compare in round 2. Every join path therefore
rebuilds its output as a pa.Table with the DECLARED schema (the left
input's exact types + the renamed right types) before returning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _key_hash(col) -> np.ndarray:
    """uint64 hash of a join-key column, identical on both sides of the
    union regardless of chunking: integers hash as their value, strings
    via pandas' vectorized SipHash-1-3 (fixed default key — deterministic
    across processes, same primitive functions.hash64 uses)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        return (pc.cast(col, pa.int64())
                .to_numpy(zero_copy_only=False).astype(np.uint64))
    vals = np.asarray(col.to_pylist(), dtype=object)
    return pd.util.hash_array(vals, categorize=False).astype(np.uint64)


def _cobucket(left, right, key: str, rsuffix: str,
              n_buckets: int | None, materialize_right: bool = True,
              tb_spec: tuple | None = None):
    """Widen both sides to a common schema, tag origin, hash-bucket by
    key, union. Returns (both, lcols, rcols, ren, allcols, types).

    materialize_right=True (default — a small dimension side) runs the
    right plan once so schema inference and the union don't re-execute
    it; pass False for a LARGE right side (fact-to-fact join): schema()
    may then partially execute the right plan once for inference, but
    the full dataset is never pinned in the object store.

    tb_spec=(ts_col, start_col, end_col, tb_us) co-partitions by
    (key, coarse time bucket) for range joins: the left row gets
    _tb = ts // tb_us, the right interval EXPLODES to every bucket it
    spans, and the shuffle bucket hashes (key, _tb) — bounding the
    per-group merge cross-product for dense overlapping intervals at
    the cost of duplicating interval rows span/tb_us times."""
    from ..cluster import cluster_buckets
    nb = n_buckets or cluster_buckets()
    # Coerce both sides to Arrow blocks: a pandas-block Dataset
    # (rd.from_pandas) reports numpy/Python classes from .schema(), which
    # would poison the declared Arrow output schema below. The identity
    # map fuses with the widen stage — no extra pass.
    left = left.map_batches(lambda t: t, batch_format="pyarrow")
    right = right.map_batches(lambda t: t, batch_format="pyarrow")
    if materialize_right:
        right = right.materialize()
    lsch, rsch = left.schema(), right.schema()
    lcols = lsch.names
    rnames = rsch.names
    ren = {c: (c + rsuffix if c in lcols and c != key else c)
           for c in rnames}
    rcols = [ren[c] for c in rnames]
    allcols = lcols + [c for c in rcols if c != key]
    types = {c: t for c, t in zip(lcols, lsch.types)}
    types.update({ren[c]: t for c, t in zip(rnames, rsch.types)
                  if ren[c] not in types})

    def widen(side: int, rename: dict | None):
        def fn(t: pa.Table) -> pa.Table:
            if rename:
                t = t.rename_columns([rename[c] for c in t.schema.names])
            cols = {c: t[c] for c in t.schema.names}
            n = t.num_rows
            if tb_spec is not None:
                ts_col, start_col, end_col, tb_us = tb_spec
                if side == 0:
                    ts = pc.cast(pc.cast(cols[ts_col], pa.timestamp("us")),
                                 pa.int64()).to_numpy(zero_copy_only=False)
                    tb = ts // tb_us
                else:
                    s = pc.cast(pc.cast(cols[start_col], pa.timestamp("us")),
                                pa.int64()).to_numpy(zero_copy_only=False)
                    e = pc.cast(pc.cast(cols[end_col], pa.timestamp("us")),
                                pa.int64()).to_numpy(zero_copy_only=False)
                    tb0, tb1 = s // tb_us, e // tb_us
                    # inverted intervals (end < start — dirty data) match
                    # nothing; clip so np.repeat doesn't raise on them
                    counts = np.maximum(tb1 - tb0 + 1, 0).astype(np.int64)
                    idx = np.repeat(np.arange(n), counts)
                    # offset within each interval's bucket run
                    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
                    off = np.arange(counts.sum()) - np.repeat(starts, counts)
                    tb = tb0[idx] + off
                    taken = pa.array(idx, pa.int64())
                    cols = {c: (v.combine_chunks()
                                if isinstance(v, pa.ChunkedArray) else v)
                            .take(taken) for c, v in cols.items()}
                    n = len(idx)
            for c in allcols:
                if c not in cols:
                    cols[c] = pa.nulls(n, type=types[c])
            kh = _key_hash(cols[key])
            if tb_spec is not None:
                kh = kh * np.uint64(0x9E3779B97F4A7C15) + tb.astype(np.uint64)
                cols["_tb"] = pa.array(tb.astype(np.int64))
            h = (kh % np.uint64(nb)).astype(np.int64)
            cols["_bucket"] = pa.array(h)
            cols["_side"] = pa.array(np.full(n, side, dtype=np.int8))
            extra = (["_tb"] if tb_spec is not None else [])
            return pa.table({c: cols[c] for c in
                             allcols + extra + ["_bucket", "_side"]})
        return fn

    both = (left.map_batches(widen(0, None), batch_format="pyarrow")
            .union(right.map_batches(widen(1, ren),
                                     batch_format="pyarrow")))
    return both, lcols, rcols, ren, allcols, types


def _out_schema(types: dict, allcols: list[str]) -> pa.Schema:
    return pa.schema([(c, types[c]) for c in allcols])


def _from_pandas(df: pd.DataFrame, schema: pa.Schema) -> pa.Table:
    """pandas frame → pa.Table with the DECLARED schema: undoes the
    int64→float64 NaN upcast (NaN → null, values cast back exactly) and
    datetime64[ns]→timestamp[us]. Safe cast — lossy values raise."""
    df = df[[f.name for f in schema]]
    return pa.Table.from_pandas(df, schema=schema,
                                preserve_index=False
                                ).replace_schema_metadata(None)


def _dual_path(both, per_group, schema: pa.Schema, driver_threshold: int):
    """Run `per_group` once on the driver below the row threshold, else
    as a hash-bucketed map_groups. `both` is materialized either way —
    the groupby shuffle would materialize its input internally anyway,
    so the count costs no extra execution."""
    import ray as _ray
    import ray.data as rd
    both = both.materialize()
    if both.count() <= driver_threshold:
        tbls = _ray.get(both.materialize().to_arrow_refs())
        tbls = [t for t in tbls if t.num_rows]
        if not tbls:
            return rd.from_arrow(schema.empty_table())
        tbl = pa.concat_tables(tbls, promote_options="default")
        return rd.from_arrow(per_group(tbl.to_pandas()))
    return both.groupby("_bucket").map_groups(per_group,
                                              batch_format="pandas")


def asof_join(left, right, key: str = "user_id", ts_col: str = "ts",
              right_ts: str = "ts", rsuffix: str = "_r",
              inner: bool = True, n_buckets: int | None = None,
              driver_threshold: int = 2_000_000,
              materialize_right: bool = True,
              tolerance_s: float | None = None):
    """As-of join of two Datasets on `key`, matching the greatest
    right[right_ts] <= left[ts_col]. Overlapping right column names get
    `rsuffix`. inner=True drops unmatched left rows (DuckDB ASOF JOIN
    default); False keeps them with nulls. `tolerance_s` bounds the
    match's staleness (right_ts >= ts − tolerance — pandas merge_asof
    tolerance semantics; matches older than the window count as
    unmatched), the freshness guard on versioned-dimension enrichment.
    Output columns carry the inputs' exact Arrow types on every path."""
    both, lcols, rcols, ren, allcols, types = _cobucket(
        left, right, key, rsuffix, n_buckets,
        materialize_right=materialize_right)
    rts2 = ren[right_ts]
    schema = _out_schema(types, allcols)
    tol = (pd.Timedelta(seconds=tolerance_s)
           if tolerance_s is not None else None)

    def per_group(df: pd.DataFrame) -> pa.Table:
        ldf = (df[df["_side"] == 0][lcols]
               .sort_values(ts_col, kind="mergesort"))
        rdf = (df[df["_side"] == 1][[key] + [c for c in rcols if c != key]]
               .sort_values(rts2, kind="mergesort"))
        out = pd.merge_asof(ldf, rdf, left_on=ts_col, right_on=rts2,
                            by=key, direction="backward", tolerance=tol)
        if inner:
            out = out[out[rts2].notna()]
        return _from_pandas(out, schema)

    return _dual_path(both, per_group, schema, driver_threshold)


def range_join(left, right, key: str = "user_id", ts_col: str = "ts",
               start_col: str = "start_ts", end_col: str = "end_ts",
               rsuffix: str = "_r", n_buckets: int | None = None,
               driver_threshold: int = 2_000_000,
               materialize_right: bool = True,
               time_bucket_s: float | None = None):
    """Interval (range) join: every (left, right) pair of the same key
    with right[start_col] <= left[ts_col] <= right[end_col] — inner,
    one output row per containing interval. The within-bucket step is a
    per-key hash merge + vectorized interval mask; its intermediate is
    per-key |left|×|intervals|, which is the join's true output bound
    when intervals overlap. For DENSE overlapping intervals pass
    `time_bucket_s` (≈ the typical interval length): both sides then
    co-partition by (key, coarse time bucket) — the interval explodes
    to each bucket it spans, the merge runs on (key, _tb), and the
    cross-product intermediate shrinks from |L_key|×|R_key| to
    Σ_tb |L_key,tb|×|R_key,tb|. Each matching pair still appears
    exactly once (the left row's bucket is unique and the containing
    interval spans it). Output dtypes match the inputs on every path."""
    tb_spec = None
    merge_keys = [key]
    if time_bucket_s is not None:
        tb_spec = (ts_col, start_col, end_col,
                   int(time_bucket_s * 1_000_000))
        merge_keys = [key, "_tb"]
    both, lcols, rcols, ren, allcols, types = _cobucket(
        left, right, key, rsuffix, n_buckets,
        materialize_right=materialize_right, tb_spec=tb_spec)
    s2, e2 = ren[start_col], ren[end_col]
    schema = _out_schema(types, allcols)
    extra = merge_keys[1:]

    def per_group(df: pd.DataFrame) -> pa.Table:
        ldf = df[df["_side"] == 0][lcols + extra]
        rdf = df[df["_side"] == 1][
            merge_keys + [c for c in rcols if c != key]]
        m = ldf.merge(rdf, on=merge_keys)
        m = m[(m[ts_col] >= m[s2]) & (m[ts_col] <= m[e2])]
        return _from_pandas(m, schema)

    return _dual_path(both, per_group, schema, driver_threshold)


def equi_join(left, right, key: str = "user_id", rsuffix: str = "_r",
              how: str = "inner", n_buckets: int | None = None,
              driver_threshold: int = 2_000_000,
              materialize_right: bool = True):
    """General distributed hash equi-join of two Datasets on `key`
    (`how` = 'inner', 'left', 'semi' or 'anti') — the keyed-shuffle join
    for fact-to-fact sizes where a broadcast (lookup.LookupTable /
    LookupEnrich) no longer fits in a worker heap. 'semi' keeps left
    rows whose key exists on the right (no right columns, no
    multiplicity), 'anti' keeps the complement — the decontamination /
    blocklist shape.

    Same shape as asof_join/range_join: both sides hash-co-bucket by
    `key` (string or integer — see _key_hash) via one union, then ONE
    vectorized pandas merge (or isin mask) per bucket. Shuffle volume =
    both inputs once; per-key output multiplicity |L_key|×|R_key| is the
    join's own output bound (1 for semi/anti). Output columns keep the
    inputs' exact Arrow types on every path (left-join null fills stay
    typed, no float64 upcast)."""
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(
            f"how must be inner/left/semi/anti, got {how!r}")
    both, lcols, rcols, ren, allcols, types = _cobucket(
        left, right, key, rsuffix, n_buckets,
        materialize_right=materialize_right)
    if how in ("semi", "anti"):
        schema = _out_schema(types, lcols)

        def per_group(df: pd.DataFrame) -> pa.Table:
            ldf = df[df["_side"] == 0][lcols]
            mask = ldf[key].isin(df.loc[df["_side"] == 1, key].unique())
            return _from_pandas(ldf[mask if how == "semi" else ~mask],
                                schema)
    else:
        schema = _out_schema(types, allcols)

        def per_group(df: pd.DataFrame) -> pa.Table:
            ldf = df[df["_side"] == 0][lcols]
            rdf = df[df["_side"] == 1][[key]
                                       + [c for c in rcols if c != key]]
            out = ldf.merge(rdf, on=key, how=how)
            return _from_pandas(out, schema)

    return _dual_path(both, per_group, schema, driver_threshold)
