"""Lookup tables — the reference's only join (broadcast small side).

File format & semantics: runtime/lookup.c:307-569 / lookup.h:25-27 and
tests/testsuites/xlate.lkp_tbl:

    {"version":1, "nomatch":"<stub>", "type":"string"|"array"|"sparseArray",
     "table":[{"index": <key>, "value": "<val>"}, ...]}

- string       exact key → value (binary-searched array in the reference;
               an Arrow dictionary-encode + take here)
- array        dense int index (offset by the smallest index)
- sparseArray  greatest index <= key wins; below the smallest → nomatch
               (runtime/lookup.c lookupKey_sprsArr)

Miss → the table-level `nomatch` stub (runtime/lookup.c:302-308).

Scale path: the table is `ray.put` ONCE on the driver; every enrich actor
resolves the ObjectRef in __init__ (never re-shipped per batch).
"""

from __future__ import annotations

import bisect
import json
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


@dataclass
class LookupTable:
    type: str
    nomatch: str
    keys: list          # sorted for array/sparseArray
    values: list[str]

    @classmethod
    def from_json(cls, text: str) -> "LookupTable":
        obj = json.loads(text)
        typ = obj.get("type", "string")
        entries = obj.get("table", [])
        if typ in ("array", "sparseArray"):
            entries = sorted(entries, key=lambda e: int(e["index"]))
            keys = [int(e["index"]) for e in entries]
        else:
            keys = [str(e["index"]) for e in entries]
        return cls(type=typ, nomatch=str(obj.get("nomatch", "")),
                   keys=keys, values=[str(e["value"]) for e in entries])

    @classmethod
    def from_file(cls, path: str) -> "LookupTable":
        with open(path) as fh:
            return cls.from_json(fh.read())

    @classmethod
    def from_dict(cls, d: dict, nomatch: str = "") -> "LookupTable":
        return cls(type="string", nomatch=nomatch,
                   keys=[str(k) for k in d], values=[str(v) for v in d.values()])

    # -- vectorized lookup ------------------------------------------------

    def lookup_array(self, keys: pa.Array | pa.ChunkedArray) -> pa.Array:
        """Column of keys → column of values (nomatch-filled)."""
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if not self.keys:       # empty (e.g. stubbed) table: all nomatch
            return pa.array(np.full(len(keys), self.nomatch, dtype=object),
                            pa.string())
        if self.type == "string":
            idx = pc.index_in(pc.cast(keys, pa.string()),
                              value_set=pa.array(self.keys, pa.string()))
            vals = pa.array(self.values, pa.string()).take(
                pc.fill_null(idx, 0))
            return pc.if_else(pc.is_valid(idx), vals, pa.scalar(self.nomatch))
        k = pc.fill_null(pc.cast(keys, pa.int64()), -(2**62)).to_numpy(zero_copy_only=False)
        karr = np.asarray(self.keys, dtype=np.int64)
        if self.type == "array":
            pos = k - karr[0]
            ok = (pos >= 0) & (pos < len(karr)) if len(karr) else np.zeros(len(k), bool)
            # dense: position must hold exactly that index
            pos_c = np.clip(pos, 0, max(0, len(karr) - 1)).astype(np.int64)
            if len(karr):
                ok &= karr[pos_c] == k
        elif self.type == "sparseArray":
            pos_c = np.searchsorted(karr, k, side="right") - 1
            ok = pos_c >= 0
            pos_c = np.clip(pos_c, 0, max(0, len(karr) - 1)).astype(np.int64)
        else:
            raise ValueError(f"unknown lookup table type {self.type!r}")
        out = np.full(len(k), self.nomatch, dtype=object)
        if len(karr):
            vals = np.asarray(self.values, dtype=object)
            out[ok] = vals[pos_c[ok]]
        return pa.array(out, pa.string())

    def lookup(self, key) -> str:
        """Scalar lookup(table, key) — grammar/rainerscript.c:2486."""
        if self.type == "string":
            try:
                return self.values[self.keys.index(str(key))]
            except ValueError:
                return self.nomatch
        k = int(key)
        if self.type == "array":
            pos = k - self.keys[0] if self.keys else -1
            if 0 <= pos < len(self.keys) and self.keys[pos] == k:
                return self.values[pos]
            return self.nomatch
        pos = bisect.bisect_right(self.keys, k) - 1
        return self.values[pos] if pos >= 0 else self.nomatch


class ReloadableLookup:
    """reload_lookup_table / HUP-reload analogue (runtime/lookup.c:717-866
    lookupReload; ruleset stmt runtime/ruleset.c:553-568) for long-running
    batch jobs: a file-backed table that hot-reloads when the backing file
    changes.

    Batch-native shape: LookupEnrich calls maybe_reload() once per batch —
    one os.stat (mtime_ns compare), re-parse only on change. No rwlock is
    needed: the reference guards one shared in-place table; here every
    actor/task swaps its OWN immutable copy. Failure semantics mirror the
    reference: a failed reload keeps serving the OLD table, unless `stub`
    was given, in which case the table becomes stubbed — every lookup
    returns the stub value (the reload_lookup_table(name, stub) second
    argument, runtime/lookup.c lookupReload stub path)."""

    def __init__(self, path: str, stub: str | None = None):
        import os
        self.path = path
        self.stub = stub
        self.table = LookupTable.from_file(path)
        self._mtime = os.stat(path).st_mtime_ns

    def maybe_reload(self) -> bool:
        """Reload if the backing file changed; returns True if swapped."""
        import os
        try:
            m = os.stat(self.path).st_mtime_ns
        except OSError:
            m = None
        if m == self._mtime:
            return False
        try:
            if m is None:
                raise OSError(f"lookup file missing: {self.path}")
            self.table = LookupTable.from_file(self.path)
            self._mtime = m
            return True
        except (OSError, ValueError, KeyError, TypeError):
            if self.stub is not None:
                self.table = LookupTable(type="string", nomatch=self.stub,
                                         keys=[], values=[])
                self._mtime = m
                return True
            return False            # keep serving the old table

    # duck-typed LookupTable surface (LookupEnrich/lookup() callers)
    def lookup_array(self, keys) -> pa.Array:
        return self.table.lookup_array(keys)

    def lookup(self, key) -> str:
        return self.table.lookup(key)


# Fixture tables (FIXTURES.md §3) — defined in code so engine, oracle and
# SQL share one source of truth.
ROLE_FACILITY = LookupTable(
    type="string", nomatch="unknown",
    keys=["user", "assistant", "system", "tool"],
    values=["local0", "local1", "daemon", "local7"])

TOOL_CLASS = LookupTable(
    type="string", nomatch="unclassified",
    keys=["bash", "search", "editor", ""],
    values=["exec", "net", "fs", "none"])

SEV_BUCKET = LookupTable(
    type="sparseArray", nomatch="na",
    keys=[0, 4, 6], values=["crit", "warn", "info"])
