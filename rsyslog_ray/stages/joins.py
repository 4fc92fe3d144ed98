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
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _cobucket(left, right, key: str, rsuffix: str,
              n_buckets: int | None):
    """Widen both sides to a common schema, tag origin, hash-bucket by
    key, union. Returns (both, lcols, rcols, ren, allcols). The right
    (dimension) side is materialized once so schema inference and the
    union don't re-execute its plan."""
    from ..cluster import cluster_buckets
    nb = n_buckets or cluster_buckets()
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
            for c in allcols:
                if c not in cols:
                    cols[c] = pa.nulls(n, type=types[c])
            h = (pc.cast(t[key], pa.int64()).to_numpy(zero_copy_only=False)
                 .astype(np.uint64) % np.uint64(nb)).astype(np.int64)
            cols["_bucket"] = pa.array(h)
            cols["_side"] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table({c: cols[c] for c in
                             allcols + ["_bucket", "_side"]})
        return fn

    both = (left.map_batches(widen(0, None), batch_format="pyarrow")
            .union(right.map_batches(widen(1, ren),
                                     batch_format="pyarrow")))
    return both, lcols, rcols, ren, allcols


def asof_join(left, right, key: str = "user_id", ts_col: str = "ts",
              right_ts: str = "ts", rsuffix: str = "_r",
              inner: bool = True, n_buckets: int | None = None):
    """As-of join of two Datasets on `key`, matching the greatest
    right[right_ts] <= left[ts_col]. Overlapping right column names get
    `rsuffix`. inner=True drops unmatched left rows (DuckDB ASOF JOIN
    default); False keeps them with nulls."""
    both, lcols, rcols, ren, allcols = _cobucket(left, right, key,
                                                 rsuffix, n_buckets)
    rts2 = ren[right_ts]

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ldf = (df[df["_side"] == 0][lcols]
               .sort_values(ts_col, kind="mergesort"))
        rdf = (df[df["_side"] == 1][[key] + [c for c in rcols if c != key]]
               .sort_values(rts2, kind="mergesort"))
        out = pd.merge_asof(ldf, rdf, left_on=ts_col, right_on=rts2,
                            by=key, direction="backward")
        if inner:
            out = out[out[rts2].notna()]
        return out[allcols]

    return both.groupby("_bucket").map_groups(per_bucket,
                                              batch_format="pandas")


def range_join(left, right, key: str = "user_id", ts_col: str = "ts",
               start_col: str = "start_ts", end_col: str = "end_ts",
               rsuffix: str = "_r", n_buckets: int | None = None):
    """Interval (range) join: every (left, right) pair of the same key
    with right[start_col] <= left[ts_col] <= right[end_col] — inner,
    one output row per containing interval. The within-bucket step is a
    per-key hash merge + vectorized interval mask; its intermediate is
    per-key |left|×|intervals|, which is the join's true output bound
    when intervals overlap. For dense overlapping intervals co-partition
    by (key, coarse time bucket) upstream to cut the cross size."""
    both, lcols, rcols, ren, allcols = _cobucket(left, right, key,
                                                 rsuffix, n_buckets)
    s2, e2 = ren[start_col], ren[end_col]

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ldf = df[df["_side"] == 0][lcols]
        rdf = df[df["_side"] == 1][[key] + [c for c in rcols if c != key]]
        m = ldf.merge(rdf, on=key)
        m = m[(m[ts_col] >= m[s2]) & (m[ts_col] <= m[e2])]
        return m[allcols]

    return both.groupby("_bucket").map_groups(per_bucket,
                                              batch_format="pandas")
