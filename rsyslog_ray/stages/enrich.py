"""Stateful enrichment stages (mm* modifier analogues) as actor pools.

The canonical pattern (SURVEY §2.9): broadcast the small side once with
`ray.put`, resolve the ObjectRef in the actor's __init__ (once per worker,
never per batch), do a vectorized dictionary lookup per batch — the
mmdblookup / lookup_table / mmkubernetes-cache shape.

Also carries the stateless mm* kernels that need no state:
  mmfields (split → f1..fN), mmjsonparse (@cee), mmpstrucdata (RFC5424 SD),
  mmanon (IPv4 anonymize), mmrm1stspace, mmutf8fix (at ingest).
"""

from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..functions import loads_fast
from ..lookup import LookupTable


class LookupEnrich:
    """Actor-pool stage: add columns from broadcast lookup tables.

    spec: list of (out_col, key_col, table_or_objectref).
    Use:  ds.map_batches(LookupEnrich, fn_constructor_args=(spec,),
                         concurrency=N, batch_format="pyarrow")
    Reference: lookup() grammar/rainerscript.c:2486 + runtime/lookup.c.
    """

    def __init__(self, spec):
        self.spec = []
        for out_col, key_col, tbl in spec:
            if isinstance(tbl, ray.ObjectRef):
                tbl = ray.get(tbl)           # resolve broadcast ONCE per actor
            self.spec.append((out_col, key_col, tbl))

    def __call__(self, batch: pa.Table) -> pa.Table:
        for out_col, key_col, tbl in self.spec:
            if hasattr(tbl, "maybe_reload"):
                # reload_lookup_table analogue: one os.stat per batch
                tbl.maybe_reload()
            batch = batch.append_column(out_col, tbl.lookup_array(batch[key_col]))
        return batch


def enrich_with_lookups(ds, spec, concurrency=None, batch_size: int = 16384,
                        use_actors: bool = False):
    """spec: [(out_col, key_col, LookupTable)].

    Task mode (default): the LookupEnrich *instance* is the map fn — Ray
    serializes it once into the object store and every task reads that one
    copy (broadcast-by-closure; right for small tables, and tasks scale to
    all CPUs instantly with no pool ramp-up; measured 3× flagship throughput
    vs an actor pool at 32 cpus).

    Actor mode (use_actors=True): tables are ray.put once and resolved in
    each actor's __init__ — the mmdblookup shape; use for big/expensive
    state (mmap'd DBs, models) where per-actor setup must be explicit.
    """
    if use_actors:
        bspec = [(o, k, ray.put(t) if isinstance(t, LookupTable) else t)
                 for o, k, t in spec]
        return ds.map_batches(
            LookupEnrich, fn_constructor_args=(bspec,),
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency or 4)
    return ds.map_batches(LookupEnrich(spec), batch_format="pyarrow",
                          batch_size=batch_size)


# --------------------------------------------------------------------------
# mmfields — split MSG on a single-char separator → f1..fN columns
# (plugins/mmfields/mmfields.c:54-56,132; the reference caps at f32)
# --------------------------------------------------------------------------


def mmfields_table(batch: pa.Table, col: str = "msg", sep: str = ",",
                   max_fields: int = 8, prefix: str = "f") -> pa.Table:
    parts = pc.split_pattern(pc.cast(batch[col], pa.string()), pattern=sep)
    lens = pc.list_value_length(parts)
    for i in range(1, max_fields + 1):
        elem = pc.binary_join(
            pc.cast(pc.list_slice(parts, i - 1, i), pa.list_(pa.string())), "")
        val = pc.if_else(pc.greater_equal(lens, i), elem, pa.scalar(None, pa.string()))
        batch = batch.append_column(f"{prefix}{i}", val)
    return batch


# --------------------------------------------------------------------------
# mmjsonparse — '@cee:' cookie → parsed JSON (normalized string) + success
# (plugins/mmjsonparse/mmjsonparse.c:122-190)
# --------------------------------------------------------------------------


def mmjsonparse_table(batch: pa.Table, col: str = "msg",
                      cookie: str = "@cee:",
                      container: str = "!") -> pa.Table:
    """`cookie` as in mmjsonparse.c: rows must start with it (after
    leading whitespace) to be parsed; cookie="" attempts JSON on every
    message (mmjsonparse-w-o-cookie.sh).

    `container` (mmjsonparse.c container param): "!" (default) parses
    into the tree ROOT; "!name" nests the object under $!name
    (mmjsonparse_cim.sh); "$." / "." stores the parsed object's keys as
    LOCAL variables — flat "$.a!b" columns in this engine
    (mmjsonparse_localvar.sh)."""
    msg = pc.cast(batch[col], pa.string())
    stripped = pc.utf8_ltrim_whitespace(msg)
    if cookie:
        is_cee = pc.starts_with(stripped, pattern=cookie)
        np_mask = is_cee.to_numpy(zero_copy_only=False)
    else:
        np_mask = np.ones(len(stripped), dtype=bool)
    vals = stripped.to_pylist()
    n = len(vals)
    container = container.lstrip("$")
    if not container.startswith(("!", ".")):
        # mmjsonparse.c checkVarName: "invalid container name '%s',
        # name must start with '$.' or '$!'" — config-time error
        # (mmjsonparse-invalid-containerName.sh)
        raise ValueError(
            f"mmjsonparse: invalid container name {container!r}, name "
            "must start with '$!' or '$.'")
    to_locals = container == "."
    subkey = container[1:] if container.startswith("!") else ""
    out = [None] * n
    local_cols: dict[str, list] = {}
    ok = np.zeros(n, dtype=bool)
    for i in np.flatnonzero(np_mask):
        payload = vals[i][len(cookie):].lstrip()
        try:
            obj = loads_fast(payload)
        except ValueError:
            continue
        ok[i] = True
        if to_locals:
            if isinstance(obj, dict):
                flat = _flatten_bang(obj)
                for k, v in flat.items():
                    local_cols.setdefault(k, [None] * n)[i] = v
            continue
        if subkey:
            obj = {subkey: obj}
        out[i] = json.dumps(obj, separators=(",", ":"), sort_keys=True)
    if not to_locals:
        batch = batch.append_column("cee_json", pa.array(out, pa.string()))
    else:
        for k, col_vals in local_cols.items():
            name = "$." + k
            arr = pa.array(col_vals, pa.string())
            if name in batch.column_names:
                batch = batch.set_column(
                    batch.column_names.index(name), name, arr)
            else:
                batch = batch.append_column(name, arr)
    batch = batch.append_column("cee_parsesuccess", pa.array(ok))
    return batch


def _flatten_bang(obj: dict, prefix: str = "") -> dict:
    """Nested dict → flat {a!b: str-value} (the engine's local-column
    path spelling)."""
    out = {}
    for k, v in obj.items():
        key = f"{prefix}!{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten_bang(v, key))
        else:
            out[key] = (v if isinstance(v, str)
                        else json.dumps(v, separators=(",", ":")))
    return out


# --------------------------------------------------------------------------
# mmpstrucdata — RFC5424 STRUCTURED-DATA → flattened JSON
# (plugins/mmpstrucdata; SD grammar tools/pmrfc5424.c:124-180)
# --------------------------------------------------------------------------

_SD_ELEM = re.compile(r"\[([^\s\]]+)((?:\s+[^=\s\]]+=\"(?:[^\"\\]|\\.)*\")*)\]")
_SD_PARAM = re.compile(r"([^=\s\]]+)=\"((?:[^\"\\]|\\.)*)\"")


def parse_structured_data(sd: str):
    """One SD string → {sd_id: {param: value}} with \\" \\] \\\\ unescapes."""
    if not sd or sd == "-":
        return None
    out = {}
    for m in _SD_ELEM.finditer(sd):
        params = {}
        for pm in _SD_PARAM.finditer(m.group(2)):
            v = pm.group(2)
            v = v.replace('\\"', '"').replace("\\]", "]").replace("\\\\", "\\")
            params[pm.group(1)] = v
        out[m.group(1)] = params
    return out or None


def mmpstrucdata_table(batch: pa.Table, col: str = "structured_data",
                       sd_name_lowercase: bool = True) -> pa.Table:
    """mmpstrucdata (plugins/mmpstrucdata/mmpstrucdata.c): SD → JSON
    under the `rfc5424_sd` column. Reference-faithful naming:
    `sd_name.lowercase` (default ON, mmpstrucdata.c:132) lowercases
    BOTH SD-IDs and param names; names truncate at 32 chars
    (parseSD_NAME's 33-byte buffer, mmpstrucdata.c:241).  The exploded
    sd_params op keeps verbatim names by design (its own SQL twin)."""
    vals = pc.cast(batch[col], pa.string()).to_pylist()

    def xf(name: str) -> str:
        name = name[:32]
        return name.lower() if sd_name_lowercase else name

    out = []
    for v in vals:
        d = parse_structured_data(v) if v else None
        if d:
            d = {xf(sd_id): {xf(k): pv for k, pv in params.items()}
                 for sd_id, params in d.items()}
            out.append(json.dumps(d, separators=(",", ":"),
                                  sort_keys=True))
        else:
            out.append(None)
    return batch.append_column("rfc5424_sd", pa.array(out, pa.string()))


# --------------------------------------------------------------------------
# mmanon — anonymize IPv4 addresses in a column
# (plugins/mmanon/mmanon.c:53-126: zero / simple modes, bit count)
# --------------------------------------------------------------------------

# octet-strict, boundary-free scan — the reference's char scanner
# (mmanon.c getipv4): an invalid octet fails the parse and the scan
# advances ONE char ('256.0.0.0' -> '2' + anonymized '56.0.0.0';
# '1111.1.1.8.1' -> '1' + anonymized '111.1.1.8' + '.1'); embedded
# addresses with no word boundary anonymize too
# (mmanon_recognize_ipv4.sh)
_OCT = r"(25[0-5]|2[0-4]\d|[01]?\d?\d)"
_IPV4_RE = rf"{_OCT}\.{_OCT}\.{_OCT}\.{_OCT}"


def _anon_rand(ip_num: int, bits: int, seed: int) -> int:
    """Deterministic stand-in for the reference's rand_r low-bits fill
    (mmanon.c:624-641 RANDOMINT): derived from the ORIGINAL address, so
    the same input maps to the same output (random-consistent semantics,
    mmanon.c:700-735 findip) and the oracle/conformance contract holds.
    Documented deviation: the reference draws a fresh random per new IP."""
    import hashlib
    h = hashlib.sha1(f"{seed}:{ip_num}".encode()).digest()
    return int.from_bytes(h[:4], "big") & ((1 << bits) - 1)


def mmanon_table(batch: pa.Table, col: str = "msg", mode: str = "zero",
                 bits: int = 16, replace_char: str = "x",
                 seed: int = 4242) -> pa.Table:
    """IPv4 anonymization (plugins/mmanon/mmanon.c:53-126, code_int
    :624-641, simpleAnon :739-755):

    - zero: num = (ip >> bits) << bits, re-rendered. Octet-aligned bits run
      as ONE vectorized RE2 pass; arbitrary bit counts take the per-match
      path (canonical re-render, like the reference's REWRITE_MODE).
    - random / random-consistent: zeroed high bits + deterministic
      hash-derived low bits (consistent per input IP; see _anon_rand).
    - simple: overwrite the DIGITS of the last bits/8 octets with
      `replace_char`, preserving text layout (SIMPLE_MODE in-place).
    """
    src = pc.cast(batch[col], pa.string())
    if mode == "zero" and bits in (8, 16, 24, 32):
        keep = 4 - bits // 8
        repl = ".".join([f"\\{i+1}" for i in range(keep)]
                        + ["0"] * (bits // 8))
        out = pc.replace_substring_regex(src, pattern=_IPV4_RE,
                                         replacement=repl)
        return batch.set_column(batch.schema.get_field_index(col), col,
                                pc.cast(out, batch[col].type))
    if mode not in ("zero", "random", "random-consistent", "simple"):
        raise ValueError(f"unknown mmanon mode {mode!r}")
    import pandas as pd
    rex = re.compile(_IPV4_RE)
    n_oct = max(0, min(4, bits // 8 + (1 if bits % 8 else 0)))

    def fix(m: re.Match) -> str:
        octs = [int(x) for x in m.groups()]
        if any(o > 255 for o in octs):
            return m.group(0)       # not a valid address — leave untouched
        if mode == "simple":
            parts = m.group(0).split(".")
            for i in range(4 - n_oct, 4):
                parts[i] = replace_char * len(parts[i])
            return ".".join(parts)
        num = (octs[0] << 24) | (octs[1] << 16) | (octs[2] << 8) | octs[3]
        num = (num >> bits) << bits
        if mode.startswith("random"):
            num += _anon_rand((octs[0] << 24) | (octs[1] << 16)
                              | (octs[2] << 8) | octs[3], bits, seed)
        return f"{num >> 24 & 255}.{num >> 16 & 255}" \
               f".{num >> 8 & 255}.{num & 255}"

    s = pd.Series(src.to_pandas(), dtype="string").fillna("")
    out = pa.array(s.str.replace(rex, fix, regex=True).astype(object),
                   pa.string())
    return batch.set_column(batch.schema.get_field_index(col), col,
                            pc.cast(out, batch[col].type))


# liberal candidate pattern; every match is validated by ipaddress before
# rewriting (the reference's getipv6 does its own strict parse)
#: candidate scan: allows abbreviated ('::', '0::') and EMBEDDED
#: addresses (no word boundary — mmanon.c's char scanner anonymizes
#: 'textnoblank72:...:1AFEstillnoblank', see mmanon_zero_128_ipv6.sh);
#: invalid candidates fail IPv6Address() and pass through unchanged
_IPV6_RE = r"(?:(?:[0-9A-Fa-f]{1,4})?:){2,7}[0-9A-Fa-f]{0,4}"


def _render_ipv6(num: int) -> str:
    """mmanon.c rendering: eight explicit lowercase hex groups, no
    '::' compression ('0:0:0:0:0:0:0:0', per the mmanon_zero_*_ipv6
    goldens)."""
    return ":".join(format((num >> (112 - 16 * i)) & 0xFFFF, "x")
                    for i in range(8))


def mmanon_ipv6_table(batch: pa.Table, col: str = "msg",
                      mode: str = "zero", bits: int = 96,
                      seed: int = 4242) -> pa.Table:
    """IPv6 anonymization (mmanon.c ipv6.* params): zero the low `bits`
    (or fill them hash-deterministically for random-consistent),
    re-render as eight explicit hex groups like the reference.
    Per-match Python on regex candidates only — v6 literals are rare
    in log text."""
    if mode not in ("zero", "random-consistent", "random"):
        raise ValueError(f"unknown mmanon ipv6 mode {mode!r}")
    import ipaddress
    import pandas as pd
    rex = re.compile(_IPV6_RE)

    def fix(m: re.Match) -> str:
        try:
            addr = ipaddress.IPv6Address(m.group(0))
        except ValueError:
            return m.group(0)
        num = (int(addr) >> bits) << bits if bits else int(addr)
        if mode.startswith("random"):
            num += _anon_rand(int(addr), min(bits, 32), seed)
        return _render_ipv6(num)

    src = pc.cast(batch[col], pa.string())
    s = pd.Series(src.to_pandas(), dtype="string").fillna("")
    out = pa.array(s.str.replace(rex, fix, regex=True).astype(object),
                   pa.string())
    return batch.set_column(batch.schema.get_field_index(col), col,
                            pc.cast(out, batch[col].type))


def mmutf8fix_table(batch: pa.Table, col: str = "raw",
                    mode: str = "utf-8",
                    replacement_char: str = " ") -> pa.Table:
    """plugins/mmutf8fix — repair invalid bytes BEFORE Arrow string
    conversion, byte-for-byte (output length == input length):

    - mode="controlcharacters" (MODE_CC, mmutf8fix.c doCC): every byte
      < 32 or > 126 → replacement char.
    - mode="utf-8" (MODE_UTF8 default, doUTF8): greedy left-to-right
      UTF-8 state machine; each byte of an invalid sequence is replaced
      — stray continuation / 0xF8+ lead (1 byte), truncated multi-byte
      run (lead + available continuations), completed sequences that are
      overlong / UTF-16 surrogates / > 0x10FFFF (the whole sequence).
      Continuations beyond a completed sequence are stray.

    The C plugin's per-message byte loop is re-expressed as ONE pass over
    the flattened buffer of the whole batch: greedy parsing is locally
    decidable (every non-continuation byte begins a new sequence, exactly
    the reference's `goto startOfSequence`), so sequence starts, run
    lengths and codepoints all come from vectorized masks. Row boundaries
    break continuation runs (parser state never crosses messages).

    Accepts binary OR string input; emits a valid-UTF-8 string column in
    place (replacement char is ASCII, surviving sequences are valid)."""
    repl = np.uint8(ord(replacement_char))
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    nulls = pc.is_valid(arr)
    arr = pc.cast(arr, pa.large_binary())
    arr = pc.fill_null(arr, b"")
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    n = len(arr)
    offs = np.frombuffer(arr.buffers()[1],
                         np.int64)[arr.offset: arr.offset + n + 1]
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    base = offs[0]
    c = data[base:offs[-1]].copy()
    offs = offs - base
    N = len(c)
    if N:
        if mode == "controlcharacters":
            c[(c < 32) | (c > 126)] = repl
        else:
            row_start = np.zeros(N, dtype=bool)
            starts_pos = offs[:-1][np.diff(offs) > 0]
            row_start[starts_pos] = True
            is_cont = (c & 0xC0) == 0x80
            lead2 = (c & 0xE0) == 0xC0
            lead3 = (c & 0xF0) == 0xE0
            lead4 = (c & 0xF8) == 0xF0
            is_lead = lead2 | lead3 | lead4
            replace = (c >= 0xF8)             # 5/6-byte starts, RFC3629
            # continuation runs, broken at row starts
            prev_cont = np.empty(N, dtype=bool)
            prev_cont[0] = False
            prev_cont[1:] = is_cont[:-1]
            run_start_mask = is_cont & (~prev_cont | row_start)
            run_id_at = np.cumsum(run_start_mask) - 1   # valid where is_cont
            starts = np.flatnonzero(run_start_mask)
            n_runs = len(starts)
            cont_idx = np.flatnonzero(is_cont)
            counts = np.bincount(run_id_at[cont_idx], minlength=n_runs) \
                if n_runs else np.zeros(0, np.int64)
            # per-lead: how many continuations follow within the row
            lp = np.flatnonzero(is_lead)
            need = (np.int64(1) * lead2[lp] + 2 * lead3[lp] + 3 * lead4[lp])
            nxt = lp + 1
            has_run = (nxt < N)
            hr = np.flatnonzero(has_run)
            if len(hr):
                has_run[hr] &= is_cont[nxt[hr]] & ~row_start[nxt[hr]]
            avail = np.zeros(len(lp), np.int64)
            if n_runs:
                avail[has_run] = counts[run_id_at[nxt[has_run]]]
            complete = avail >= need
            # codepoints of completed sequences (per class, masked)
            cp = np.zeros(len(lp), np.uint32)
            b1 = c[lp].astype(np.uint32)
            for cls, klen in ((lead2, 2), (lead3, 3), (lead4, 4)):
                m = complete & cls[lp]
                if not m.any():
                    continue
                li = lp[m]
                v = b1[m] & np.uint32({2: 0x1F, 3: 0x0F, 4: 0x07}[klen])
                for j in range(1, klen):
                    v = (v << np.uint32(6)) | (c[li + j].astype(np.uint32)
                                               & np.uint32(0x3F))
                cp[m] = v
            seqlen = need + 1
            seq_bad = complete & (
                ((seqlen == 2) & (cp < 0x80))
                | ((seqlen == 3) & (cp < 0x800))
                | ((seqlen == 4) & (cp < 0x10000))
                | ((cp >= 0xD800) & (cp <= 0xDFFF))
                | (cp > 0x10FFFF))
            replace[lp[~complete | seq_bad]] = True
            # continuation bytes: kept iff among the first `need` of a run
            # owned by a complete, valid lead
            if n_runs:
                kept_per_run = np.zeros(n_runs, np.int64)
                owner = has_run & complete & ~seq_bad
                kept_per_run[run_id_at[nxt[owner]]] = need[owner]
                run_begin = np.zeros(n_runs, np.int64)
                np.cumsum(counts[:-1], out=run_begin[1:])
                rid = run_id_at[cont_idx]
                pos_in_run = np.arange(len(cont_idx)) - run_begin[rid]
                replace[cont_idx[pos_in_run >= kept_per_run[rid]]] = True
            c[replace] = repl
    fixed = pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(c.tobytes())])
    out = pc.if_else(nulls, pc.cast(fixed, pa.large_string()),
                     pa.scalar(None, pa.large_string()))
    out = pc.cast(out, pa.string())
    if col in batch.column_names:
        return batch.set_column(batch.schema.get_field_index(col), col, out)
    return batch.append_column(col, out)


def mmrm1stspace_table(batch: pa.Table, col: str = "msg") -> pa.Table:
    """plugins/mmrm1stspace — drop ONE leading space of MSG."""
    msg = pc.cast(batch[col], pa.string())
    fixed = pc.if_else(pc.starts_with(msg, pattern=" "),
                       pc.utf8_slice_codeunits(msg, 1, 2**30), msg)
    return batch.set_column(batch.schema.get_field_index(col), col,
                            pc.cast(fixed, batch[col].type))


#: (pattern, replacement) rules applied IN ORDER by redact_table and by the
#: matching DuckDB oracle (nested regexp_replace(..., 'g')). Both engines
#: are RE2, so the pattern subset used here (character classes, bounded
#: repetition — no backrefs/lookaround) behaves identically.
REDACT_RULES: list[tuple[str, str]] = [
    # emails first (their local part may contain digits)
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # international phone-ish: +country then 7-14 digits/separators
    (r"\+[0-9][0-9 ()-]{6,13}[0-9]", "<PHONE>"),
    # long digit runs (ids, ticket numbers, msgnums) — 6+ digits
    (r"[0-9]{6,}", "<NUM>"),
]


def redact_table(batch: pa.Table, col: str = "text",
                 rules: list[tuple[str, str]] | None = None) -> pa.Table:
    """PII / identifier redaction (training-data cleaning op): apply the
    ordered regex→placeholder rules to one string column. Fully
    vectorized (one pc.replace_substring_regex pass per rule), stateless,
    no shuffle — the mmanon family generalized to arbitrary patterns
    (reference analogue: mmanon's regex mode, plugins/mmanon/mmanon.c).
    """
    rules = REDACT_RULES if rules is None else rules
    out = pc.cast(batch[col], pa.string())
    for pat, repl in rules:
        out = pc.replace_substring_regex(out, pattern=pat, replacement=repl)
    if col in batch.column_names:
        return batch.set_column(batch.schema.get_field_index(col), col, out)
    return batch.append_column(col, out)


def redact_sql(col: str = "text",
               rules: list[tuple[str, str]] | None = None) -> str:
    """The matching DuckDB expression: nested global regexp_replace in the
    same rule order."""
    rules = REDACT_RULES if rules is None else rules
    expr = col
    for pat, repl in rules:
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    return expr


def mmtaghostname_table(batch: pa.Table, tag: str | None = None,
                        force_localhostname: bool = False,
                        localhostname: str = "localhost") -> pa.Table:
    """mmtaghostname (contrib/mmtaghostname/mmtaghostname.c doAction):
    optionally force the TAG and/or overwrite HOSTNAME with the local
    host name (useful ahead of relays that mangle either). Pure column
    rewrites; `localhostname` stands in for glbl.GetLocalHostName()
    (a deterministic engine cannot read the worker's hostname)."""
    out = batch
    n = batch.num_rows
    if tag is not None:
        arr = pa.array([tag] * n, pa.string())
        if "tag" in out.column_names:
            out = out.set_column(out.schema.get_field_index("tag"),
                                 "tag", arr)
        else:
            out = out.append_column("tag", arr)
    if force_localhostname:
        arr = pa.array([localhostname] * n, pa.string())
        if "hostname" in out.column_names:
            out = out.set_column(out.schema.get_field_index("hostname"),
                                 "hostname", arr)
        else:
            out = out.append_column("hostname", arr)
    return out


def mmrfc5424addhmac_table(batch: pa.Table, key: str,
                           hashfunction: str = "sha256",
                           sdid: str = "hmac@0",
                           text_col: str = "text") -> pa.Table:
    """mmrfc5424addhmac (contrib/mmrfc5424addhmac/mmrfc5424addhmac.c:
    311-334 hashMsg, 283-307 isHmacPresent): for RFC5424 messages whose
    structured data does not already carry `sdid`, append
    `[<sdid> hash="<hex hmac>"]` — HMAC(hashfunction, key) over the RAW
    message bytes; an empty ('-') SD is replaced, otherwise the element
    is concatenated (MsgAddToStructuredData, runtime/msg.c:5205-5224).
    The HMAC itself is per-row C code inside hashlib; only qualifying
    rows (5424 ∧ not-yet-signed) enter the loop."""
    import hashlib
    import hmac as _hmac
    import re as _re

    algo = getattr(hashlib, hashfunction)
    kb = key.encode()
    sd = pc.fill_null(pc.cast(batch["structured_data"], pa.string()), "-")
    proto = pc.fill_null(pc.cast(batch["protocol"], pa.int64()), -1)
    present = pc.match_substring_regex(
        sd, pattern=r"\[" + _re.escape(sdid) + r"[ =\]\"]")
    eligible = pc.and_(pc.equal(proto, 1), pc.invert(present))
    idx = np.flatnonzero(eligible.to_numpy(zero_copy_only=False))
    if not len(idx):
        return batch
    raw = pc.cast(batch[text_col], pa.string()).take(pa.array(idx)) \
        .to_pylist()
    old = sd.take(pa.array(idx)).to_pylist()
    new = []
    for r, o in zip(raw, old):
        dig = _hmac.new(kb, r.encode("utf-8", "surrogatepass"),
                        algo).hexdigest()
        el = f'[{sdid} hash="{dig}"]'
        new.append(el if o == "-" or o == "" else o + el)
    allsd = sd.to_numpy(zero_copy_only=False).astype(object)
    allsd[idx] = new
    i = batch.schema.get_field_index("structured_data")
    return batch.set_column(i, "structured_data",
                            pa.array(allsd, pa.string()))


def _audit_kv_parse(s: str) -> dict | None:
    """plugins/mmaudit/mmaudit.c audit_parse (parseName/parseValue,
    :122-167): name runs to '=', value is '\\''-/'"'-quoted (to the
    matching quote) or bare (to the next space); whitespace between
    pairs skips. Returns None on the parse error the C code FINALIZEs
    on (a name not followed by '=')."""
    data: dict = {}
    i, n = 0, len(s)
    while i < n:
        while i < n and s[i].isspace():
            i += 1
        j = i
        while j < n and s[j] != "=":
            j += 1
        name = s[i:j]
        if j >= n:                        # name without '='
            return None if name else data
        i = j + 1
        if i < n and s[i] in ("'", '"'):
            term = s[i]
            i += 1
        else:
            term = " "
        j = i
        while j < n and s[j] != term:
            j += 1
        data[name] = s[i:j]
        i = j + 1 if j < n else j
    return data


def mmaudit_table(batch: pa.Table, msg_col: str = "msg",
                  out_col: str = "audit_json") -> pa.Table:
    """plugins/mmaudit (mmaudit.c doAction:204-270): recognize Linux
    audit records 'type=NNNN audit(<id>): k=v ...' and parse them into a
    JSON tree {"data": {k: v, ...}, "hdr": {"auditid": ..., "type": N}}
    (normalized sorted-key string in `out_col`), plus
    `audit_parsesuccess`. Faithfully reproduces the reference's
    off-by-one: `buf += sizeof(" audit(")` skips one char PAST the '(',
    so the first character of the audit id is dropped (mmaudit.c:245).
    Vectorized prefilter (one RE2 match over the column); only matched
    rows pay the per-row k=v scan — same shape as pmpanngfw."""
    import json as _json

    msg = pc.cast(batch[msg_col], pa.string())
    n = batch.num_rows
    # leading-whitespace skip + header shape; auditID may be empty
    pre = pc.extract_regex(
        msg, r"^\s*type=(?P<t>[0-9]+) audit\((?P<id>[^)]*)\):(?P<rest>[\s\S]*)$")
    if isinstance(pre, pa.ChunkedArray):
        pre = pre.combine_chunks()
    ok = pc.is_valid(pre).to_numpy(zero_copy_only=False)
    out = np.full(n, None, dtype=object)
    success = np.zeros(n, dtype=bool)
    if ok.any():
        idx = np.flatnonzero(ok)
        st = pre.take(pa.array(idx))
        types = st.field("t").to_pylist()
        ids = st.field("id").to_pylist()
        rests = st.field("rest").to_pylist()
        for k, (t, aid, rest) in enumerate(zip(types, ids, rests)):
            data = _audit_kv_parse(rest)
            if data is None:
                continue
            tree = {"data": data,
                    # the reference skips the first id char (see above)
                    "hdr": {"auditid": aid[1:], "type": int(t)}}
            out[idx[k]] = _json.dumps(tree, separators=(",", ":"),
                                      sort_keys=True)
            success[idx[k]] = True
    return batch.append_column(out_col, pa.array(out, pa.string())) \
        .append_column("audit_parsesuccess", pa.array(success))


def mmsnmptrapd_table(batch: pa.Table, tag_name: str = "snmptrapd",
                      severity_mapping: str = "",
                      tag_col: str = "tag", host_col: str = "hostname",
                      sev_col: str = "severity") -> pa.Table:
    """plugins/mmsnmptrapd (mmsnmptrapd.c doAction:235-263): messages
    whose TAG starts with '<tag_name>/' carry '<tag>/<severity>/<host>:';
    the module extracts both components (getTagComponent: to the next
    ' ', '/' or end; the host component requires its leading '/'), strips
    a trailing ':' from the host, rewrites TAG to '<tag_name>:', sets
    HOSTNAME to the extracted host (even when empty), and maps the
    severity string to a numeric code via `severity_mapping`
    ('warning/4,error/3' — buildSeverityMapping:272-310; unmapped
    strings leave severity unchanged). Fully vectorized."""
    sev_map: dict[str, int] = {}
    if severity_mapping:
        for pair in severity_mapping.split(","):
            name, _, code = pair.partition("/")
            if not code.strip().isdigit():
                raise ValueError(f"invalid severity mapping entry {pair!r}")
            c = int(code)
            if not 0 <= c <= 7:
                raise ValueError(f"severity code {c} outside 0..7")
            sev_map[name] = c

    tag = pc.cast(batch[tag_col], pa.string())
    tag_id = tag_name + "/"
    m = pc.starts_with(pc.fill_null(tag, ""), pattern=tag_id)
    ex = pc.extract_regex(
        pc.fill_null(tag, ""),
        "^" + re.escape(tag_id) + r"(?P<sev>[^ /]*)(?P<hs>/?)(?P<host>[^ /]*)")
    if isinstance(ex, pa.ChunkedArray):
        ex = ex.combine_chunks()
    mask = pc.and_(m, pc.is_valid(ex)).to_numpy(zero_copy_only=False)
    out = batch
    if mask.any():
        sev_s = np.asarray(ex.field("sev").to_pylist(), dtype=object)
        has_slash = np.asarray(ex.field("hs").to_pylist(), dtype=object)
        host_s = np.asarray(ex.field("host").to_pylist(), dtype=object)
        # host component exists only behind its '/'
        host_s = np.where(has_slash == "/", host_s, "")
        host_s = np.array([h[:-1] if h.endswith(":") else h
                           for h in host_s], dtype=object)

        def _col(name):
            c = out[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        mk = pa.array(mask)
        # TAG → '<tag_name>:'
        newtag = pc.if_else(mk, pa.scalar(tag_name + ":"), _col(tag_col))
        out = out.set_column(out.schema.get_field_index(tag_col), tag_col,
                             pc.cast(newtag, out[tag_col].type))
        if host_col in out.column_names:
            hostv = _col(host_col).to_numpy(zero_copy_only=False) \
                .astype(object)
            hostv[mask] = host_s[mask]
            out = out.set_column(out.schema.get_field_index(host_col),
                                 host_col, pa.array(hostv, pa.string()))
        if sev_col in out.column_names and sev_map:
            codes = np.array([sev_map.get(s, -1) for s in sev_s],
                             dtype=np.int64)
            upd = mask & (codes >= 0)
            # validity-aware Arrow if_else (no numpy round-trip): rows
            # not updated keep their original value INCLUDING nulls —
            # a NaN-from-null would otherwise crash the int cast
            col = _col(sev_col)
            new = pc.if_else(pa.array(upd),
                             pc.cast(pa.array(codes), col.type), col)
            out = out.set_column(out.schema.get_field_index(sev_col),
                                 sev_col, new)
    return out


# --------------------------------------------------------------------------
# mmanon embeddedipv4.* — IPv4-embedded-in-IPv6 anonymization
# (mmanon.c syntax_embedded:1127-1190, isValidHexNum:463-523,
#  syntax_ipv4:414-459, findV4Start:1113-1124, num2embedded:990-1007)
# --------------------------------------------------------------------------

_HEXDIGITS = set("0123456789abcdefABCDEF")


def _emb_hexnum(s: str, pos: int, handle_dot: bool):
    """isValidHexNum port: (cyc, newpos) — cyc>0 hex-digit count (max 4;
    a 5th digit returns 0 with 4 consumed), -1 ':' consumed, -2 '.'
    consumed (handle_dot), 0 none."""
    cyc = 0
    i = pos
    while i < len(s):
        c = s[i]
        if c in _HEXDIGITS:
            cyc += 1
            if cyc == 5:
                return 0, i
            i += 1
        elif c == ".":
            if handle_dot and cyc == 0:
                return -2, i + 1
            return cyc, i
        elif c == ":":
            if cyc == 0:
                return -1, i + 1
            return cyc, i
        else:
            return cyc, i
    return cyc, i


def _emb_ipv4(s: str, pos: int):
    """syntax_ipv4 port: 4 dot-separated decimal octets <=255 starting
    at pos → (True, endpos)."""
    i = pos
    vals = []
    for k in range(4):
        j = i
        while j < len(s) and s[j].isdigit():
            j += 1
        if j == i:
            return False, pos
        v = int(s[i:j])
        if v > 255:
            return False, pos
        vals.append(v)
        i = j
        if k < 3:
            if i >= len(s) or s[i] != ".":
                return False, pos
            i += 1
    return True, i


def _emb_syntax(s: str, pos: int):
    """syntax_embedded port → (matched, endpos)."""
    i = pos
    last_sep = False
    had_abbrev = False
    ip_parts = 0
    while i < len(s):
        cyc, i = _emb_hexnum(s, i, True)
        if cyc > 0:
            if (ip_parts == 6 and had_abbrev) or ip_parts > 6:
                return False, pos
            if ip_parts == 0 and last_sep and not had_abbrev:
                return False, pos
            last_sep = False
            ip_parts += 1
        elif cyc == -1:
            if last_sep:
                if had_abbrev:
                    return False, pos
                had_abbrev = True
            last_sep = True
        elif cyc == -2:
            if last_sep or (ip_parts == 0 and had_abbrev) \
                    or (ip_parts <= 6 and not had_abbrev):
                return False, pos
            v4s = s.rfind(":", 0, i - 1) + 1
            ok4, end4 = _emb_ipv4(s, v4s)
            if ok4:
                return True, end4
            return False, pos
        else:
            return False, pos
    return False, pos


def _emb_to_num(text: str) -> int:
    v6part, _, v4 = text.rpartition(":")
    o = [int(x) for x in v4.split(".")]
    v4num = (o[0] << 24) | (o[1] << 16) | (o[2] << 8) | o[3]
    groups = v6part.split(":")
    # '::' abbreviation → empty strings; expand to six 16-bit groups
    if "" in groups:
        first_empty = groups.index("")
        tail = [g for g in groups[first_empty:] if g != ""]
        head = groups[:first_empty]
        groups = head + ["0"] * (6 - len(head) - len(tail)) + tail
    groups = (["0"] * (6 - len(groups)) + groups)[:6]
    high = 0
    for g in groups:
        high = (high << 16) | int(g or "0", 16)
    return (high << 32) | v4num


def _emb_render(num: int) -> str:
    """num2embedded: six lowercase hex groups + dotted quad."""
    groups = [(num >> (112 - 16 * i)) & 0xFFFF for i in range(6)]
    v4 = num & 0xFFFFFFFF
    return (":".join(format(g, "x") for g in groups) + ":"
            + f"{v4 >> 24 & 255}.{v4 >> 16 & 255}"
            + f".{v4 >> 8 & 255}.{v4 & 255}")


def mmanon_embedded_table(batch: pa.Table, col: str = "msg",
                          mode: str = "zero", bits: int = 96,
                          seed: int = 4242) -> pa.Table:
    """mmanon embeddedipv4.* (defaults per setInstParamDefaults:223-226):
    the reference char scanner — at each position try syntax_embedded;
    a match replaces the span with the anonymized render, a failure
    advances ONE char (so '13:abd:45:1:1:1:1:0.0.0.0' keeps '13:' and
    anonymizes the 6-group tail — mmanon_recognize_ipembedded.sh).
    Candidate rows prefiltered by regex; non-candidates never pay the
    scan."""
    if mode not in ("zero", "random", "random-consistent"):
        raise ValueError(f"unknown embeddedipv4 mode {mode!r}")
    src = pc.cast(batch[col], pa.string())
    cand = pc.match_substring_regex(
        pc.fill_null(src, ""),
        pattern=r"[0-9A-Fa-f:]*:[0-9A-Fa-f]*[0-9]\.[0-9]")
    cand_np = cand.to_numpy(zero_copy_only=False)
    vals = src.to_pylist()
    mask = ~((1 << bits) - 1) & ((1 << 128) - 1)
    for ri in np.flatnonzero(cand_np):
        s = vals[ri]
        out = []
        i = 0
        while i < len(s):
            ok, end = _emb_syntax(s, i)
            if ok:
                num = _emb_to_num(s[i:end]) & mask
                if mode.startswith("random"):
                    num |= _anon_rand(_emb_to_num(s[i:end]),
                                      min(bits, 32), seed)
                out.append(_emb_render(num))
                i = end
            else:
                out.append(s[i])
                i += 1
        vals[ri] = "".join(out)
    arr = pa.array(vals, pa.string())
    return batch.set_column(batch.schema.get_field_index(col), col,
                            pc.cast(arr, batch[col].type))
