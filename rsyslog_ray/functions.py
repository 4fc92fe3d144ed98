"""RainerScript scalar-function library as vectorized Arrow kernels.

Reference: the built-in function table at grammar/rainerscript.c:3730-3764 and
the per-function implementations cited next to each kernel.  Every function
here maps a pyarrow Array/ChunkedArray (plus python-scalar args) to a pyarrow
Array — these are the UDFs available to the expression compiler (expr.py) and
the template renderer (templates.py).

Deviations from the reference are noted inline; semantics otherwise follow
the C implementations (1-based field indexing, "***FIELD NOT FOUND***" miss
marker, PRI-mask composition rules, etc.).
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

FIELD_NOT_FOUND = "***FIELD NOT FOUND***"

# --------------------------------------------------------------------------
# string functions (grammar/rainerscript.c:1994-2466)
# --------------------------------------------------------------------------


def strlen(arr):
    """grammar/rainerscript.c:2371 — length in characters. A missing
    variable reads as "" (var2CString of an unset var), so its strlen
    is 0, not null — the imfile-endmsg k8s assembly loop guards on
    strlen($!stream) == 0 before the first set."""
    if isinstance(arr, (pa.Array, pa.ChunkedArray)) and (
            pa.types.is_string(arr.type)
            or pa.types.is_large_string(arr.type)):
        arr = pc.fill_null(arr, "")
    return pc.utf8_length(arr)


def substring(arr, start: int, length: int):
    """grammar/rainerscript.c:2398 — substring(s, start, len), 0-based."""
    return pc.utf8_slice_codeunits(arr, start, start + length)


def tolower(arr):
    """grammar/rainerscript.c:2093."""
    return pc.utf8_lower(arr)


def toupper(arr):
    return pc.utf8_upper(arr)


def ltrim(arr):
    """grammar/rainerscript.c:1994 — strip leading whitespace."""
    return pc.utf8_ltrim_whitespace(arr)


def rtrim(arr):
    """grammar/rainerscript.c:2024."""
    return pc.utf8_rtrim_whitespace(arr)


def replace(arr, find, repl):
    """grammar/rainerscript.c:2305 — literal global replace.  find/repl
    are expressions in the reference (rscript_replace.sh nests replace
    inside replace), so scalars/arrays coerce: constant patterns keep
    the vectorized kernel, per-row patterns take a bounded row loop."""
    if isinstance(find, pa.Scalar):
        find = find.as_py()
    if isinstance(repl, pa.Scalar):
        repl = repl.as_py()
    if isinstance(arr, str) and isinstance(find, str) \
            and isinstance(repl, str):
        return arr.replace(find, repl)  # constant-fold for nested calls
    if isinstance(find, str) and isinstance(repl, str):
        return pc.replace_substring(arr, pattern=find, replacement=repl)
    n = None
    for x in (arr, find, repl):
        if isinstance(x, (pa.Array, pa.ChunkedArray)):
            n = len(x)
            break
    def _vals(x):
        if isinstance(x, (pa.Array, pa.ChunkedArray)):
            return pc.cast(x, pa.string()).to_pylist()
        return [x] * n
    out = [None if s is None else
           s.replace(f if f is not None else "", r if r is not None else "")
           for s, f, r in zip(_vals(arr), _vals(find), _vals(repl))]
    return pa.array(out, pa.string())


def wrap(arr, wrapper: str, escape: str | None = None):
    """grammar/rainerscript.c:2323 — wrap(s, wrapper[, escape]): surround s
    with wrapper; occurrences of wrapper inside s are replaced by escape."""
    if escape is not None:
        arr = pc.replace_substring(arr, pattern=wrapper, replacement=escape)
    return pc.binary_join_element_wise(
        pa.scalar(wrapper), pc.cast(arr, pa.string()), pa.scalar(wrapper), ""
    )


def cstr(arr):
    """grammar/rainerscript.c:2114 — cast to string."""
    if pa.types.is_floating(arr.type):
        # match rsyslog's integer-centric rendering for whole numbers
        return pc.cast(pc.cast(arr, pa.int64()), pa.string())
    return pc.cast(arr, pa.string())


def cnum(arr):
    """grammar/rainerscript.c:2133 — cast to number (int64); non-numeric → 0
    (var2Number semantics, grammar/rainerscript.c:1413)."""
    if pa.types.is_integer(arr.type):
        return pc.cast(arr, pa.int64())
    digits = pc.extract_regex(pc.cast(arr, pa.string()), pattern=r"^\s*(?P<n>-?\d+)")
    n = pc.struct_field(digits, "n")
    out = pc.cast(n, pa.int64())
    return pc.fill_null(out, 0)


def re_match(arr, pattern: str):
    """grammar/rainerscript.c:2155 — ERE match → bool (RE2 here, not POSIX;
    documented deviation: RE2 lacks backrefs)."""
    return pc.match_substring_regex(arr, pattern=pattern)


def re_extract(arr, pattern: str, match_n: int = 0, submatch_n: int = 0,
               nomatch: str = ""):
    """grammar/rainerscript.c:1597-1621 — submatch_n of match_n'th match.

    match_n == 0 is vectorized via RE2; match_n > 0 falls back to a
    per-row loop (rare in practice)."""
    if match_n == 0:
        pat = _wrap_group(pattern, submatch_n)
        res = pc.extract_regex(arr, pattern=pat)
        out = pc.struct_field(res, "g")
        return pc.fill_null(out, nomatch)
    rx = re.compile(pattern)
    vals = []
    for v in _pylist(arr):
        if v is None:
            vals.append(nomatch)
            continue
        ms = list(rx.finditer(v))
        if match_n < len(ms):
            m = ms[match_n]
            vals.append(m.group(submatch_n) if submatch_n <= (m.lastindex or 0) else nomatch)
        else:
            vals.append(nomatch)
    return pa.array(vals, type=pa.string())


def re_match_i(arr, pattern: str):
    """re_match_i (grammar/rainerscript.c:3745) — case-insensitive ERE."""
    return pc.match_substring_regex(arr, pattern=pattern, ignore_case=True)


def re_extract_i(arr, pattern: str, match_n: int = 0, submatch_n: int = 0,
                 nomatch: str = ""):
    """re_extract_i — case-insensitive re_extract (RE2 inline flag)."""
    return re_extract(arr, f"(?i:{pattern})" if match_n == 0
                      else f"(?i){pattern}", match_n, submatch_n, nomatch)


def get_property(arr, name) -> pa.Array:
    """get_property(var, name) (grammar/rainerscript.c:1834-1933
    doFunc_get_property) — dynamic access on a variable's value:
    object + "" → the whole object; object + key → member (missing →
    "", errno); array + numeric name → element (bad/out-of-range →
    "", errno); bool/int/double → the number regardless of name;
    plain (non-JSON) string → the string itself.  `name` may be a
    per-row expression (rscript_get_property.sh)."""
    if isinstance(name, pa.Scalar):
        name = name.as_py()
    if isinstance(arr, str):
        # a string LITERAL source is ignored (rainerscript.c:1846-1849
        # "ignore string literals" → EINVAL, empty result; res16)
        return ""
    vals = _pylist(arr)
    if isinstance(name, (pa.Array, pa.ChunkedArray)):
        names = _pylist(name)
    else:
        names = [("" if name is None else str(name))] * len(vals)

    def render(cur):
        if cur is None:
            return ""
        if isinstance(cur, str):
            return cur
        if isinstance(cur, bool):
            return "1" if cur else "0"
        if isinstance(cur, (dict, list)):
            return json.dumps(cur, separators=(",", ":"), sort_keys=True)
        return str(cur)

    out = []
    for v, k in zip(vals, names):
        k = "" if k is None else str(k)
        if v is None:
            out.append("")
            continue
        try:
            cur = loads_fast(v)
        except (ValueError, TypeError):
            out.append(v)  # 'S' datatype: the string itself
            continue
        if isinstance(cur, dict):
            out.append(render(cur) if k == "" else render(cur.get(k)))
        elif isinstance(cur, list):
            m = re.match(r"^\s*(-?\d+)\s*$", k)
            idx = int(m.group(1)) if m else -1
            out.append(render(cur[idx])
                       if m and 0 <= idx < len(cur) else "")
        else:  # bool/int/float scalar: name ignored
            out.append(render(cur))
    return pa.array(out, pa.string())


def _wrap_group(pattern: str, submatch_n: int) -> str:
    """Name the submatch we want 'g' so pc.extract_regex can address it;
    every OTHER unnamed group becomes non-capturing, since extract_regex
    rejects unnamed groups (RE2 has no backrefs, so renumbering is safe).
    submatch 0 = whole match → neutralize all groups, wrap the pattern.
    (Pass submatch_n=-1 internally for neutralize-only.)"""
    if submatch_n == 0:
        return f"(?P<g>{_wrap_group(pattern, -1)})"
    # rename the Nth capturing group; naive scan for unescaped '('
    count = 0
    out = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\":
            out.append(pattern[i : i + 2])
            i += 2
            continue
        if ch == "(" and not pattern.startswith("(?", i):
            count += 1
            # pc.extract_regex rejects UNNAMED groups outright, so the
            # non-target groups become non-capturing (RE2 has no
            # backrefs, so renumbering is safe)
            out.append("(?P<g>" if count == submatch_n else "(?:")
            i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def field(arr, delim, n: int):
    """grammar/rainerscript.c:2422 / runtime/msg.c:3936-3960 — Nth field
    (1-based) split by delimiter; miss → '***FIELD NOT FOUND***'.
    A NUMERIC delim is the decimal char code (rscript_field.sh uses
    field($msg, 58, 2) for ':'); a string is a literal (multi-char ok)."""
    if isinstance(delim, pa.Scalar):
        delim = delim.as_py()
    if isinstance(n, pa.Scalar):
        n = int(n.as_py())
    if isinstance(delim, (int, float)):
        delim = chr(int(delim))
    n = int(n)
    if n < 1:
        return pa.array([FIELD_NOT_FOUND] * len(arr), type=pa.string())
    parts = pc.split_pattern(arr, pattern=delim)
    lens = pc.list_value_length(parts)
    ok = pc.greater_equal(lens, n)
    # list_element raises on short lists → slice to [n-1, n) and join
    elem = pc.binary_join(pc.cast(pc.list_slice(parts, n - 1, n), pa.list_(pa.string())), "")
    out = pc.if_else(ok, elem, pa.scalar(FIELD_NOT_FOUND))
    return pc.fill_null(out, FIELD_NOT_FOUND)


def int2hex(arr):
    """grammar/rainerscript.c:2277 — the argument coerces through
    var2Number first (rscript_int2Hex.sh goldens): non-numeric
    strings → 'NAN', '' → 0."""
    out = []
    for v in _pylist(arr):
        if v is None:
            out.append(None)
            continue
        if isinstance(v, str):
            s = v.strip()
            try:
                v = int(s) if s else 0
            except ValueError:
                out.append("NAN")
                continue
        out.append(format(int(v), "x"))
    return pa.array(out, type=pa.string())


def num2ipv4(arr):
    """grammar/rainerscript.c:3733 — int → dotted quad; out of range → '-1'."""
    v = pc.cast(arr, pa.int64())
    oct0 = pc.bit_wise_and(pc.shift_right(v, 24), 255)
    oct1 = pc.bit_wise_and(pc.shift_right(v, 16), 255)
    oct2 = pc.bit_wise_and(pc.shift_right(v, 8), 255)
    oct3 = pc.bit_wise_and(v, 255)
    s = pc.binary_join_element_wise(
        pc.cast(oct0, pa.string()), pc.cast(oct1, pa.string()),
        pc.cast(oct2, pa.string()), pc.cast(oct3, pa.string()), ".")
    bad = pc.or_(pc.less(v, 0), pc.greater(v, 0xFFFFFFFF))
    return pc.if_else(bad, pa.scalar("-1"), s)


def ipv42num(arr):
    """grammar/rainerscript.c:2204 — dotted quad → int; invalid → -1.
    Leading/trailing SPACES are accepted (the reference's startblank /
    endblank scan; rscript_ipv42num.sh goldens v11-v13), interior ones
    are not."""
    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(_pylist(arr), pa.string())
    res = pc.extract_regex(
        arr, pattern=r"^ *(?P<a>\d{1,3})\.(?P<b>\d{1,3})\.(?P<c>\d{1,3})\.(?P<d>\d{1,3}) *$")
    total = pa.array(np.zeros(len(arr), dtype=np.int64))
    ok = pc.is_valid(pc.struct_field(res, "a"))
    for g, shift in (("a", 24), ("b", 16), ("c", 8), ("d", 0)):
        p = pc.cast(pc.struct_field(res, g), pa.int64())
        ok = pc.and_(ok, pc.fill_null(pc.less_equal(p, 255), False))
        total = pc.add(total, pc.shift_left(pc.fill_null(p, 0), shift))
    return pc.if_else(ok, total, -1)


# --------------------------------------------------------------------------
# hashing (contrib/fmhash/fmhash.c:349-355 — xxhash in the reference; we use
# pandas' SipHash-1-3 with its fixed default key: deterministic across
# processes/runs, vectorized. Used for dedup content hashes and key salting.)
# --------------------------------------------------------------------------


def hash64(arr) -> pa.Array:
    vals = pd.array(_pylist(arr), dtype="object")
    h = pd.util.hash_array(np.asarray(vals, dtype=object), categorize=False)
    return pa.array(h.astype(np.uint64), type=pa.uint64())


def hash32(arr) -> pa.Array:
    h = hash64(arr)
    return pc.cast(pc.bit_wise_and(h, 0xFFFFFFFF), pa.uint32())


def hash64mod(arr, mod: int) -> pa.Array:
    return pc.cast(_pc_mod_u64(hash64(arr), mod), pa.int64())


def hash32mod(arr, mod: int) -> pa.Array:
    return pc.cast(_pc_mod_u64(pc.cast(hash32(arr), pa.uint64()), mod), pa.int64())


def _pc_mod_u64(arr: pa.Array, mod: int) -> pa.Array:
    np_arr = arr.to_numpy(zero_copy_only=False)
    return pa.array(np_arr % np.uint64(mod))


# ---- reference-exact script hashes (contrib/fmhash/fmhash.c) -------------
# The SCRIPT functions hash32/hash64(+mod) reproduce the reference's
# no-xxhash build bit-for-bit (rscript_hash64.sh golden): hash64 = djb2
# 33*h^c over uint64 + seed (fmhash.c:116-147), hash32 = FNV-1 with the
# caller's seed as offset over uint32 (fmhash.c:85-101).  The engine's
# INTERNAL hash64 above (pandas xxhash — C speed, used by dedup/uuid)
# is unchanged; only the fm* registry binds these.

def _iter_bytes_hash(vals: list, fold, init) -> np.ndarray:
    """Vectorized-across-rows byte fold: loop over byte POSITIONS (max
    string length), numpy ops across all rows at each step."""
    bs = [v.encode("utf-8") if isinstance(v, str) else b"" for v in vals]
    n = len(bs)
    lens = np.array([len(b) for b in bs], dtype=np.int64)
    maxlen = int(lens.max()) if n else 0
    mat = np.zeros((maxlen, n), dtype=np.uint64)
    for i, b in enumerate(bs):
        if b:
            mat[:len(b), i] = np.frombuffer(b, dtype=np.uint8)
    h = np.full(n, init, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(maxlen):
            h = np.where(i < lens, fold(h, mat[i]), h)
    return h


def _rs_hash_u64(arr, fold, init):
    scalar = isinstance(arr, str)
    vals = [arr] if scalar else _pylist(arr)
    return scalar, _iter_bytes_hash(vals, fold, init)


def rs_hash64(arr, seed=0):
    """fmhash hash64 (djb build): h=5381; h=33*h^c; +seed. Rendered as
    rsyslog numbers (signed int64)."""
    seed = np.uint64(int(_scalar_num(seed)) & 0xFFFFFFFF)
    scalar, h = _rs_hash_u64(
        arr, lambda h, c: (np.uint64(33) * h) ^ c, 5381)
    with np.errstate(over="ignore"):
        out = (h + seed).astype(np.int64)
    return int(out[0]) if scalar else pa.array(out)


def rs_hash32(arr, seed=0):
    """fmhash hash32 (fnv build): FNV-1 with `seed` as the running value
    over uint32 (fmhash.c:85-101 — seed*16777619, then ^c)."""
    seed = int(_scalar_num(seed)) & 0xFFFFFFFF

    def fold(h, c):
        h32 = (h * np.uint64(16777619)) & np.uint64(0xFFFFFFFF)
        return h32 ^ c
    scalar, h = _rs_hash_u64(arr, fold, seed)
    out = h.astype(np.int64)
    return int(out[0]) if scalar else pa.array(out)


def _scalar_num(v):
    if isinstance(v, pa.Scalar):
        v = v.as_py()
    return 0 if v is None else v


def _rs_mod(h, mod):
    mod = np.uint64(int(_scalar_num(mod)))
    if isinstance(h, pa.Array):
        u = h.to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.array((u % mod).astype(np.int64))
    return int(np.uint64(h) % mod)


def rs_hash64mod(arr, mod, seed=0):
    return _rs_mod(rs_hash64(arr, seed), mod)


def rs_hash32mod(arr, mod, seed=0):
    return _rs_mod(rs_hash32(arr, seed), mod)


# --------------------------------------------------------------------------
# time functions
# --------------------------------------------------------------------------

_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]

RFC3339_RE = (
    r"^(?P<base>\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})"
    r"(?P<frac>\.\d+)?(?P<tz>Z|[+-]\d{2}:\d{2})?$"
)
RFC3164_TS_RE = r"^(?P<mon>[A-Z][a-z]{2}) (?P<day>[ 0-3]?\d) (?P<hms>\d{2}:\d{2}:\d{2})$"


def parse_rfc3339(arr, unit: str = "us") -> pa.Array:
    """Vectorized RFC3339 → timestamp[us] (UTC-naive); unparseable → null.

    Handles fractional seconds and numeric UTC offsets (normalized to UTC).
    Reference semantics: grammar/rainerscript.c:2636 parse_time(rfc3339) and
    the rfc5424 TIMESTAMP field (tools/pmrfc5424.c)."""
    arr = pc.cast(arr, pa.string())
    m = pc.extract_regex(arr, pattern=RFC3339_RE)
    base = pc.struct_field(m, "base")
    frac = pc.struct_field(m, "frac")
    tz = pc.struct_field(m, "tz")
    ts = pc.strptime(base, format="%Y-%m-%dT%H:%M:%S", unit=unit, error_is_null=True)
    # fractional part → microseconds
    frac_named = pc.extract_regex(pc.fill_null(frac, ""), pattern=r"^\.(?P<d>\d{1,6})")
    frac_digits = pc.fill_null(pc.struct_field(frac_named, "d"), "0")
    frac_padded = pc.ascii_rpad(frac_digits, 6, "0")
    frac_us = pc.cast(frac_padded, pa.int64())
    # tz offset → seconds east of UTC (subtract to get UTC)
    tzm = pc.extract_regex(pc.fill_null(tz, ""),
                           pattern=r"^(?P<sign>[+-])(?P<hh>\d{2}):(?P<mm>\d{2})$")
    off_hh = pc.fill_null(pc.cast(pc.struct_field(tzm, "hh"), pa.int64()), 0)
    off_mm = pc.fill_null(pc.cast(pc.struct_field(tzm, "mm"), pa.int64()), 0)
    off_s = pc.add(pc.multiply(off_hh, 3600), pc.multiply(off_mm, 60))
    neg = pc.equal(pc.fill_null(pc.struct_field(tzm, "sign"), "+"), "-")
    off_signed = pc.if_else(neg, pc.negate(off_s), off_s)
    delta_us = pc.subtract(pc.multiply(frac_us, 1), pc.multiply(off_signed, 1_000_000))
    out = pc.add(pc.cast(ts, pa.int64()), delta_us)
    return pc.if_else(pc.is_valid(ts), pc.cast(out, pa.timestamp(unit)), pa.scalar(None, pa.timestamp(unit)))


def parse_rfc3164_ts(mon, day, hms, year: int = 2024) -> pa.Array:
    """'Jan'/' 1'/'00:00:03' component arrays → timestamp[us].

    RFC3164 carries no year; the engine pins the fixture year (2024) —
    deviation from rsyslog's nearest-year guess, documented."""
    mon_num = pc.cast(pc.add(pc.index_in(mon, pa.array(_MONTHS)), 1), pa.string())
    mon2 = pc.ascii_lpad(mon_num, 2, "0")
    day2 = pc.ascii_lpad(pc.utf8_ltrim(pc.cast(day, pa.string()), " "), 2, "0")
    iso = pc.binary_join_element_wise(
        pa.scalar(str(year)), mon2, day2, "-")
    full = pc.binary_join_element_wise(iso, pc.cast(hms, pa.string()), "T")
    return pc.strptime(full, format="%Y-%m-%dT%H:%M:%S", unit="us", error_is_null=True)


def format_time(arr, fmt: str) -> pa.Array:
    """grammar/rainerscript.c:2553 format_time(unixts, fmt) →
    datetime.c:1282 formatUnixTimeFromTime_t: gmtime second-precision
    rendering; date-rfc3339 ends in 'Z' with NO fraction, and a value
    var2Number can't parse falls back to its own string form (the
    rscript_format_time.sh golden: 'ABC' → 'ABC'). The extra date-*
    formats below are a documented superset (the property-replacer
    formats from datetime.c:825-896, exercised by templates)."""
    if isinstance(arr, pa.Scalar):
        arr = pa.array([arr.as_py()])
    elif not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(_pylist(arr))
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        # var2Number coercion with string fallback, per value
        raw = _pylist(arr)
        nums, ok = [], []
        for v in raw:
            try:
                nums.append(int(str(v).strip()) if v is not None
                            and str(v).strip() else 0)
                ok.append(v is not None and bool(str(v).strip()))
            except ValueError:
                nums.append(0)
                ok.append(False)
        formatted = format_time(pa.array(nums, pa.int64()), fmt)
        return pc.if_else(pa.array(ok), formatted,
                          pc.cast(arr, pa.string()))
    if pa.types.is_integer(arr.type):
        arr = pc.cast(pc.multiply(pc.cast(arr, pa.int64()), 1_000_000), pa.timestamp("us"))
    arr = pc.cast(arr, pa.timestamp("us"))
    # Arrow's %S renders fractional seconds — format from second precision
    secs = pc.cast(pc.divide(pc.cast(arr, pa.int64()), 1_000_000), pa.timestamp("s"))
    if fmt == "date-rfc3339":
        # script-function form (datetime.c:1282): 'Z', no fraction.
        # The PROPERTY-REPLACER rfc3339 (datetime.c:815, fraction +
        # '+00:00') is the separate fmt below, used by templates.
        base = pc.strftime(secs, format="%Y-%m-%dT%H:%M:%S")
        return pc.binary_join_element_wise(base, pa.scalar("Z"), "")
    if fmt == "date-rfc3339-full":
        # formatTimestamp3339 (datetime.c:815): fractional seconds +
        # numeric offset — what %prop:::date-rfc3339% renders
        base = pc.strftime(secs, format="%Y-%m-%dT%H:%M:%S")
        us = _pc_mod_u64(pc.cast(pc.cast(arr, pa.int64()), pa.uint64()),
                         1_000_000)
        frac = pc.ascii_lpad(
            pc.cast(pc.cast(us, pa.int64()), pa.string()), 6, "0")
        with_frac = pc.binary_join_element_wise(base, frac, ".")
        return pc.binary_join_element_wise(with_frac,
                                           pa.scalar("+00:00"), "")
    if fmt == "date-rfc3164":
        mon = pc.strftime(secs, format="%b")
        day = pc.ascii_lpad(pc.cast(pc.day(secs), pa.string()), 2, " ")
        hms = pc.strftime(secs, format="%H:%M:%S")
        return pc.binary_join_element_wise(mon, day, hms, " ")
    if fmt in ("date-unix", "date-unixtimestamp"):
        return pc.cast(pc.divide(pc.cast(arr, pa.int64()), 1_000_000), pa.string())
    if fmt == "date-mysql":            # datetime.c:825 YYYYMMDDhhmmss
        return pc.strftime(secs, format="%Y%m%d%H%M%S")
    if fmt == "date-pgsql":            # datetime.c:856
        return pc.strftime(secs, format="%Y-%m-%d %H:%M:%S")
    if fmt == "date-rfc3164-buggyday":  # zero-padded day (msg.c:1796)
        return pc.strftime(secs, format="%b %d %H:%M:%S")
    if fmt == "date-subseconds":       # datetime.c:896 (us precision → 6)
        us = _pc_mod_u64(pc.cast(pc.cast(arr, pa.int64()), pa.uint64()),
                         1_000_000)
        return pc.ascii_lpad(pc.cast(pc.cast(us, pa.int64()), pa.string()),
                             6, "0")
    if fmt == "date-year":
        return pc.strftime(secs, format="%Y")
    if fmt == "date-month":
        return pc.strftime(secs, format="%m")
    if fmt == "date-day":
        return pc.strftime(secs, format="%d")
    if fmt == "date-hour":
        return pc.strftime(secs, format="%H")
    if fmt == "date-minute":
        return pc.strftime(secs, format="%M")
    if fmt == "date-second":
        return pc.strftime(secs, format="%S")
    if fmt in ("date-tzoffshour", "date-tzoffsmin"):
        # engine timestamps are UTC-naive (sanitize normalizes) → 00
        return pa.array(np.full(len(arr), "00", dtype=object), pa.string())
    if fmt == "date-tzoffsdirection":
        return pa.array(np.full(len(arr), "+", dtype=object), pa.string())
    if fmt in ("date-wday", "date-wdayname", "date-week", "date-ordinal"):
        return _format_wday_week(secs, fmt)
    raise ValueError(f"unknown time format {fmt!r}")


_WDAY_NAMES = np.asarray(["Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat"],
                         dtype=object)


def _format_wday_week(secs: pa.Array, fmt: str) -> pa.Array:
    """rsyslog weekday/week renderings (runtime/datetime.c:1176-1266):
    weekday 0=Sunday via the reference's own Zeller-style formula; week =
    ((yday0 + 6) // 7) + (dow < jan1dow) zero-padded to two digits;
    ordinal = 1-based day-of-year zero-padded to three."""
    y = pc.year(secs).to_numpy(zero_copy_only=False).astype(np.int64)
    m = pc.month(secs).to_numpy(zero_copy_only=False).astype(np.int64)
    d = pc.day(secs).to_numpy(zero_copy_only=False).astype(np.int64)

    def wday(yy, mm, dd):
        g = np.where(mm < 3, yy - 1, yy)
        f = np.where(mm < 3, mm + 13, mm + 1)
        return ((36525 * g) // 100 + (306 * f) // 10 + dd - 621049) % 7

    if fmt == "date-wday":
        return pa.array(wday(y, m, d).astype(str), pa.string())
    if fmt == "date-wdayname":
        return pa.array(_WDAY_NAMES[wday(y, m, d)], pa.string())
    yday0 = (pc.day_of_year(secs).to_numpy(zero_copy_only=False)
             .astype(np.int64) - 1)
    if fmt == "date-ordinal":
        return pc.ascii_lpad(pa.array((yday0 + 1).astype(str), pa.string()),
                             3, "0")
    week = (yday0 + 6) // 7 + (wday(y, m, d)
                               < wday(y, np.ones_like(m), np.ones_like(d)))
    return pc.ascii_lpad(pa.array(week.astype(str), pa.string()), 2, "0")


_RFC3164_VALID_RE = (r"^(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)"
                     r" [ 0-3]?\d \d{2}:\d{2}:\d{2}$")
_UNIX_NUM_RE = r"^\s*-?\d+\s*$"


def is_time(arr, fmt=None) -> pa.Array:
    """doFunc_is_time (grammar/rainerscript.c:2682-2752): NUMBER 1/0.

    Explicit fmt must be date-rfc3164 / date-rfc3339 / date-unix —
    anything else is 0 with errno set (rscript_is_time.sh
    date-spoonix); without fmt, rfc3164 → rfc3339 → unix are tried in
    the reference's order.  date-unix succeeds iff var2Number does
    (signed integer text; numeric inputs always pass)."""
    if isinstance(fmt, pa.Scalar):
        fmt = fmt.as_py()
    if isinstance(arr, (int, float)) and not isinstance(arr, bool):
        arr = pa.array([str(int(arr))], pa.string())
        squeeze = True
    elif isinstance(arr, str):
        arr = pa.array([arr], pa.string())
        squeeze = True
    else:
        arr = pc.cast(arr, pa.string())
        squeeze = False
    s = pc.fill_null(arr, "")

    def m3164():
        return pc.match_substring_regex(s, pattern=_RFC3164_VALID_RE)

    def m3339():
        return pc.is_valid(parse_rfc3339(s))

    def munix():
        return pc.match_substring_regex(s, pattern=_UNIX_NUM_RE)

    if fmt is None:
        ok = pc.or_(pc.or_(m3164(), m3339()), munix())
    elif fmt == "date-rfc3164":
        ok = m3164()
    elif fmt == "date-rfc3339":
        ok = m3339()
    elif fmt == "date-unix":
        ok = munix()
    else:  # DATE_INVALID: unknown specifier → 0 / errno
        ok = pa.array([False] * len(s))
    out = pc.cast(ok, pa.int64())
    return out[0].as_py() if squeeze else out


# --------------------------------------------------------------------------
# PRI filter masks (grammar/rainerscript.c:340-430 mask build;
# runtime/ruleset.c:421-439 eval: pmask[facility] & (1 << severity))
# --------------------------------------------------------------------------

FACILITIES = {
    "kern": 0, "user": 1, "mail": 2, "daemon": 3, "auth": 4, "syslog": 5,
    "lpr": 6, "news": 7, "uucp": 8, "cron": 9, "authpriv": 10, "ftp": 11,
    "ntp": 12, "audit": 13, "alert": 14, "clock": 15,
    "local0": 16, "local1": 17, "local2": 18, "local3": 19, "local4": 20,
    "local5": 21, "local6": 22, "local7": 23,
}
SEVERITIES = {
    "emerg": 0, "panic": 0, "alert": 1, "crit": 2, "err": 3, "error": 3,
    "warning": 4, "warn": 4, "notice": 5, "info": 6, "debug": 7,
}
FACILITY_NAMES = {v: k for k, v in FACILITIES.items()}
SEVERITY_NAMES = {0: "emerg", 1: "alert", 2: "crit", 3: "err", 4: "warning",
                  5: "notice", 6: "info", 7: "debug"}


def parse_pri_selector(spec: str) -> np.ndarray:
    """'fac[,fac].sev;...' → bool mask shape (24, 8).

    BSD syslog.conf semantics as implemented by rsyslog's mask builder:
    selectors separated by ';' apply cumulatively left→right; 'sev' means
    that severity and all more-severe (numerically lower); '=sev' exactly;
    '!sev' clears sev-and-more-severe; '!=sev' clears exactly; 'none'
    clears the named facilities; '*' = all."""
    mask = np.zeros((24, 8), dtype=bool)
    for part in spec.split(";"):
        part = part.strip()
        if not part:
            continue
        fac_s, _, sev_s = part.rpartition(".")
        if not fac_s:
            raise ValueError(f"bad PRI selector {part!r}")
        if fac_s == "*":
            facs = list(range(24))
        else:
            facs = [FACILITIES[f.strip()] for f in fac_s.split(",")]
        sev_s = sev_s.strip()
        negate = sev_s.startswith("!")
        if negate:
            sev_s = sev_s[1:]
        exact = sev_s.startswith("=")
        if exact:
            sev_s = sev_s[1:]
        if sev_s == "none":
            sevs: list[int] = []
            mask[facs, :] = False
            continue
        elif sev_s == "*":
            sevs = list(range(8))
        else:
            s = SEVERITIES[sev_s]
            sevs = [s] if exact else list(range(s + 1))
        if negate:
            mask[np.ix_(facs, sevs)] = False
        else:
            mask[np.ix_(facs, sevs)] = True
    return mask


def prifilt(facility, severity, spec: str) -> pa.Array:
    """grammar/rainerscript.c:2468 — PRI-selector → boolean column."""
    mask = parse_pri_selector(spec)
    fac = _np_i64(facility)
    sev = _np_i64(severity)
    ok = (fac >= 0) & (fac < 24) & (sev >= 0) & (sev < 8)
    out = np.zeros(len(fac), dtype=bool)
    out[ok] = mask[fac[ok], sev[ok]]
    return pa.array(out)


# --------------------------------------------------------------------------
# JSON
# --------------------------------------------------------------------------


try:
    import orjson as _orjson
except ImportError:  # pragma: no cover - baked into this container
    _orjson = None


def loads_fast(s):
    """C-speed JSON parse for hot per-row loops: orjson when present,
    falling back to stdlib json for the inputs orjson rejects but stdlib
    accepts (NaN/Infinity literals) — acceptance semantics decide ok /
    script_error state, so they must not change with the parser."""
    if _orjson is not None:
        try:
            return _orjson.loads(s)
        except (ValueError, TypeError):
            pass
    return json.loads(s)


def parse_json_column(arr) -> tuple[pa.Array, pa.Array]:
    """grammar/rainerscript.c:1781 parse_json — returns (json_string, ok).

    The parsed tree is kept as a *normalized JSON string column* (dynamic
    `$!` tree ↔ static Arrow schema tradeoff, SURVEY §7 'Dynamic JSON
    tree'); engine-produced fields should be typed columns instead."""
    vals = _pylist(arr)
    out, ok = [], []
    for v in vals:
        if v is None:
            out.append(None)
            ok.append(False)
            continue
        try:
            obj = loads_fast(v)
            out.append(json.dumps(obj, separators=(",", ":"), sort_keys=True))
            ok.append(True)
        except (ValueError, TypeError):
            out.append(None)
            ok.append(False)
    return pa.array(out, type=pa.string()), pa.array(ok)


def parse_json(arr) -> pa.Array:
    """Expression-level parse_json (grammar/rainerscript.c:1781): JSON
    string column → normalized JSON string, null where unparseable. The
    expr layer derives script_error() state from the null mask (the
    wtiSetScriptErrno(EOK/EINVAL) pair at rainerscript.c:1807-1814)."""
    return parse_json_column(arr)[0]


_PATH_IDX_RE = re.compile(r"^(.*)\[(\d+)\]$")


def _path_step(cur, k):
    """One path segment incl. the `key[idx]` array form (runtime/msg.c
    jsonVarExtract:4786-4814)."""
    m = _PATH_IDX_RE.match(k)
    if m and m.group(1):
        if isinstance(cur, dict):
            cur = cur.get(m.group(1))
        else:
            return None
        idx = int(m.group(2))
        if isinstance(cur, list) and idx < len(cur):
            return cur[idx]
        return None
    if isinstance(cur, dict):
        return cur.get(k)
    return None


def json_get(arr, path: str) -> pa.Array:
    """Extract a (possibly nested) path 'a!b!c' from a JSON string column —
    the `$!a!b!c` property access analogue (runtime/msg.c
    msgGetJSONPropJSON); `key[N]` segments index arrays
    (jsonVarExtract)."""
    keys = path.split("!")
    vals = _pylist(arr)
    out = []
    for v in vals:
        cur = None
        if v is not None:
            try:
                cur = loads_fast(v)
                for k in keys:
                    cur = _path_step(cur, k)
                    if cur is None:
                        break
            except (ValueError, TypeError):
                cur = None
        if cur is None:
            out.append(None)
        elif isinstance(cur, str):
            out.append(cur)
        elif isinstance(cur, bool):
            out.append("1" if cur else "0")
        elif isinstance(cur, (dict, list)):
            out.append(json.dumps(cur, separators=(",", ":"), sort_keys=True))
        else:
            out.append(str(cur))
    return pa.array(out, type=pa.string())


def json_exists(arr, path: str) -> pa.Array:
    """exists($!a!b) (grammar/rainerscript.c doFunct_Exists): TRUE iff the
    key is PRESENT in the tree — a present null value still exists, which
    json_get cannot distinguish. Per-row parse (orjson path), bounded to
    the JSON-bearing subset like every tree op."""
    keys = path.split("!")
    out = []
    for v in _pylist(arr):
        ok = False
        if v is not None:
            try:
                cur = loads_fast(v)
                ok = True
                for k in keys:
                    if isinstance(cur, dict) and k in cur:
                        cur = cur[k]
                    else:
                        ok = False
                        break
            except (ValueError, TypeError):
                ok = False
        out.append(ok)
    return pa.array(out, pa.bool_())


def _edit_tree(v, keys: list[str], value, delete: bool):
    obj = loads_fast(v)
    if not isinstance(obj, dict):
        obj = {}
    cur = obj
    for k in keys[:-1]:
        nxt = cur.get(k)
        if not isinstance(nxt, dict):
            if delete:
                return obj          # path absent: unset is a no-op
            nxt = {}
            cur[k] = nxt
        cur = nxt
    if delete:
        cur.pop(keys[-1], None)
    else:
        cur[keys[-1]] = value
    return obj


def _json_set_fast(arr, key: str, values) -> pa.Array | None:
    """Vectorized fast path for json_set: single-key path over a column
    of fresh trees (every row null or '{}') — the 'first set on a fresh
    message' shape, which is the hot case in ruleset `set` statements.
    Builds '{"key":<json>}' with Arrow kernels; returns None (→ slow
    path) when the base has real trees, values need non-trivial JSON
    escaping (control chars), or the value type's JSON rendering can't
    be reproduced by a cast (floats)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    fresh = pc.or_(pc.is_null(arr), pc.equal(pc.fill_null(arr, "{}"), "{}"))
    if not pc.all(fresh).as_py():
        return None
    n = len(arr)
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        v = values.combine_chunks() if isinstance(values, pa.ChunkedArray) \
            else values
        if pa.types.is_integer(v.type):
            sval = pc.cast(v, pa.string())          # matches json.dumps(int)
        elif pa.types.is_string(v.type) or pa.types.is_large_string(v.type):
            v = pc.cast(v, pa.string())
            # bail to the slow path if any value needs \uXXXX escaping —
            # including non-ASCII, which json.dumps (ensure_ascii=True on
            # the slow path) renders as \uXXXX; the fast path must agree
            # byte-for-byte or cee_json output becomes batch-dependent
            if pc.any(pc.fill_null(pc.match_substring_regex(
                    v, r"[^\x20-\x7e]"), False)).as_py():
                return None
            esc = pc.replace_substring(v, pattern="\\", replacement="\\\\")
            esc = pc.replace_substring(esc, pattern='"', replacement='\\"')
            sval = pc.binary_join_element_wise(
                pa.array(['"'] * n), esc, pa.array(['"'] * n), "")
        else:
            return None
        if v.null_count:
            sval = pc.fill_null(sval, "null")
    elif isinstance(values, (bool, float)):
        return None
    elif isinstance(values, int):
        sval = pa.array([str(values)] * n)
    elif isinstance(values, str):
        sval = pa.array([json.dumps(values)] * n)
    else:
        return None
    head = json.dumps(key) + ":"
    return pc.binary_join_element_wise(
        pa.array(["{" + head] * n), sval, pa.array(["}"] * n), "")


def json_set(arr, path: str, values, raw: bool = False) -> pa.Array:
    """set $!a!b = value (v6 grammar `set` statement writing into the
    message JSON tree, grammar/rainerscript.c cnfstmtNewSet): returns the
    tree column with the path set per row. `values` may be a scalar or a
    column; intermediate non-dict nodes are replaced (msgAddJSON
    overwrite semantics). Null/absent trees start from {}. Output is the
    engine's normalized (sorted-key, compact) JSON string. Fresh-tree
    single-key sets take a fully vectorized fast path (_json_set_fast);
    real trees pay the per-row parse, which is inherent to JSON."""
    if isinstance(values, pa.Scalar):
        # constant expressions compile to an Arrow scalar (e.g.
        # `set $!x = substring("test", 0, 4)`) — unwrap to the Python
        # value so the tree edit and json.dumps see a plain type
        values = values.as_py()
    keys = path.split("!")
    if not raw and len(keys) == 1:
        fast = _json_set_fast(arr, keys[0], values)
        if fast is not None:
            return fast
    vals = values if isinstance(values, list) else None
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        vals = _pylist(values)
    out = []
    for i, v in enumerate(_pylist(arr)):
        val = vals[i] if vals is not None else values
        if raw == "auto":
            # J-datatype propagation (msgSetJSONFromVar): a value read
            # from another tree variable embeds object/array text as a
            # SUBTREE; scalar text stays a string leaf
            if isinstance(val, str) and val[:1] in ("{", "["):
                try:
                    parsed = loads_fast(val)
                    if isinstance(parsed, (dict, list)):
                        val = parsed
                except (ValueError, TypeError):
                    pass
        elif raw:
            # raw mode (two-arg parse_json): the value is JSON text to
            # embed as a SUBTREE; unparseable/null → no write
            # (doFunct_ParseJSON leaves the tree untouched on error)
            try:
                val = loads_fast(val) if val else None
            except (ValueError, TypeError):
                val = None
            if val is None:
                out.append(v)
                continue
        try:
            obj = _edit_tree(v if v is not None else "{}", keys, val, False)
        except (ValueError, TypeError):
            obj = _edit_tree("{}", keys, val, False)
        out.append(json.dumps(obj, separators=(",", ":"), sort_keys=True))
    return pa.array(out, pa.string())


def json_unset(arr, path: str) -> pa.Array:
    """unset $!a!b (cnfstmtNewUnset): removes the path per row; absent
    paths and unparseable trees pass through unchanged (null stays
    null)."""
    keys = path.split("!")
    out = []
    for v in _pylist(arr):
        if v is None:
            out.append(None)
            continue
        try:
            obj = _edit_tree(v, keys, None, True)
            out.append(json.dumps(obj, separators=(",", ":"),
                                  sort_keys=True))
        except (ValueError, TypeError):
            out.append(v)
    return pa.array(out, pa.string())


def unflatten(arr, sep: str = ".") -> pa.Array:
    """contrib/fmunflatten — dotted-key JSON object → nested JSON string."""
    vals = _pylist(arr)
    out = []
    for v in vals:
        if v is None:
            out.append(None)
            continue
        try:
            flat = loads_fast(v)
            nested: dict = {}
            for k, val in flat.items():
                cur = nested
                # key segments truncate at 255 chars (fmunflatten.c's
                # 256-byte key buffer — rscript_unflatten_key_truncated)
                parts = [p[:255] for p in k.split(sep)]
                for p in parts[:-1]:
                    nxt = cur.get(p)
                    if not isinstance(nxt, dict):
                        # existing non-object intermediate is overridden
                        # by an object (fmunflatten.c warning path —
                        # rscript_unflatten_conflict1.sh)
                        nxt = {}
                        cur[p] = nxt
                    cur = nxt
                cur[parts[-1]] = val
            out.append(json.dumps(nested, separators=(",", ":"), sort_keys=True))
        except (ValueError, TypeError, AttributeError):
            out.append(None)
    return pa.array(out, type=pa.string())


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------


def _pylist(arr) -> list:
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks().to_pylist()
    if isinstance(arr, pa.Array):
        return arr.to_pylist()
    if isinstance(arr, pa.Scalar):
        return [arr.as_py()]
    if isinstance(arr, (str, bytes, int, float)) or arr is None:
        # a constant expression arg is ONE value, not an iterable
        # (list('0.0.0.0') would explode a string into characters)
        return [arr]
    return list(arr)


def _np_i64(arr) -> np.ndarray:
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        return pc.fill_null(pc.cast(arr, pa.int64()), -1).to_numpy(zero_copy_only=False)
    return np.asarray(arr, dtype=np.int64)


# Registry for the expression compiler / external UDF hook (the fm* loadable
# function-module analogue, grammar/rainerscript.c:3727 modListRoot).
REGISTRY = {
    "strlen": strlen, "substring": substring, "tolower": tolower,
    "toupper": toupper, "ltrim": ltrim, "rtrim": rtrim, "replace": replace,
    "wrap": wrap, "cstr": cstr, "cnum": cnum, "re_match": re_match,
    "re_extract": re_extract, "field": field, "int2hex": int2hex,
    "num2ipv4": num2ipv4, "ipv42num": ipv42num, "hash32": rs_hash32,
    "hash64": rs_hash64, "hash32mod": rs_hash32mod,
    "hash64mod": rs_hash64mod,
    "format_time": format_time, "parse_time": parse_rfc3339,
    "is_time": is_time, "prifilt": prifilt, "json_get": json_get,
    "unflatten": unflatten, "parse_json": parse_json,
    "json_exists": json_exists, "json_set": json_set,
    "json_unset": json_unset, "re_match_i": re_match_i,
    "re_extract_i": re_extract_i, "get_property": get_property,
    "ip42num": ipv42num,       # the reference registers both spellings
}

#: functions that set the per-row script errno (wtiSetScriptErrno callers,
#: grammar/rainerscript.c:1814,1942,2670,2748): EOK=0 / EINVAL=1 per the
#: constants at grammar/rainerscript.h:334-335. The expr layer derives the
#: per-row ok mask from the result (null → failed; is_time: False → failed).
ERRNO_FUNCTIONS = {"parse_json", "parse_time", "is_time"}


def register_function(name: str, fn) -> None:
    """User-extension surface: register a scalar UDF by name (module ABI
    analogue, runtime/module-template.h)."""
    REGISTRY[name] = fn
