"""Generic `foreach` — the RainerScript array/object iteration statement.

Reference: runtime/ruleset.c:323-417 (execForeach / foreachCallArray /
foreachCallObject): `foreach ($.elem in $!arr) do …` binds each JSON array
element (or each {key,value} pair of an object) and runs the body per
element. The Ray-Data-native analogue is a flat_map-style explode:

- explode_list: an Arrow list-typed column → one row per element
  (vectorized: ListArray.flatten + offsets → np.repeat of parent rows; no
  per-row Python). This is the 100 TB path for typed arrays.
- explode_json_object: a JSON-object string column → one row per (key,
  value) pair. JSON must be parsed per row (object keys are data, and
  absent-key vs null-value must stay distinguishable — which rules out a
  schema-unifying columnar parse), so the parse is per-value via the
  C-speed orjson path (functions.loads_fast) and the stage is bounded by
  the JSON-bearing subset — filter first, as the reference's foreach only
  runs on messages reaching the statement.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def explode_list(batch: pa.Table, col: str, out: str = "item",
                 idx_out: str | None = "idx",
                 keep: list[str] | None = None) -> pa.Table:
    """One output row per list element; parent columns repeated.
    idx_out (1-based, matching the reference's loop counter and DuckDB's
    generate_series zip) is optional."""
    la = batch[col]
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    if isinstance(la, pa.FixedSizeListArray):
        width = la.type.list_size
        counts = np.full(len(la), width, dtype=np.int64)
        flat = la.flatten()
    else:
        offsets = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = offsets[1:] - offsets[:-1]
        flat = la.flatten()
    parents = np.repeat(np.arange(len(la)), counts)
    total = int(counts.sum())
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]) \
        if len(counts) else np.array([], dtype=np.int64)
    idx = pa.array(np.arange(total) - np.repeat(starts, counts) + 1)
    take = pa.array(parents, pa.int64())
    cols: dict = {}
    keep_cols = keep if keep is not None else [
        c for c in batch.column_names if c != col]
    for c in keep_cols:
        src = batch[c]
        src = src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src
        cols[c] = src.take(take)
    if idx_out:
        cols[idx_out] = idx
    cols[out] = flat
    return pa.table(cols)


def explode_json_object(batch: pa.Table, col: str, key_out: str = "key",
                        value_out: str = "value",
                        keep: list[str] | None = None) -> pa.Table:
    """One output row per (key, value) of each JSON object. Non-object /
    invalid JSON rows produce no output (foreachCallObject skips them).
    String values pass through unquoted; other values render as compact
    JSON (matches DuckDB json_extract_string for scalars)."""
    src = batch[col]
    src = src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src
    src = pc.fill_null(pc.cast(src, pa.string()), "")
    parents, keys, vals = [], [], []
    from ..functions import loads_fast
    for i, raw in enumerate(src.to_pylist()):
        try:
            obj = loads_fast(raw) if raw else None
        except (ValueError, TypeError):
            continue
        if not isinstance(obj, dict):
            continue
        for k, v in obj.items():
            parents.append(i)
            keys.append(k)
            vals.append(v if isinstance(v, str)
                        else json.dumps(v, separators=(",", ":")))
    take = pa.array(np.asarray(parents, dtype=np.int64))
    cols: dict = {}
    keep_cols = keep if keep is not None else [
        c for c in batch.column_names if c != col]
    for c in keep_cols:
        s = batch[c]
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        cols[c] = s.take(take)
    cols[key_out] = pa.array(keys, pa.string())
    cols[value_out] = pa.array(vals, pa.string())
    return pa.table(cols)


def foreach_list(ds, col: str, out: str = "item", **kw):
    """Dataset-level foreach over a typed list column."""
    return ds.map_batches(lambda b: explode_list(b, col, out, **kw),
                          batch_format="pyarrow")


def foreach_json(ds, col: str, **kw):
    return ds.map_batches(lambda b: explode_json_object(b, col, **kw),
                          batch_format="pyarrow")
