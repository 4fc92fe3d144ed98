"""RainerScript expression → Arrow columnar-mask compiler.

Reference: expression eval in grammar/rainerscript.c:3040-3630 (cmpOp
dispatch, var2Number/var2CString implicit coercion at :1413/:1459), PRI
filters runtime/ruleset.c:421-439, property filters :447-555.

An expression is a nested tuple AST (the cnfstmt/nfexpr analogue — we do not
re-implement the RainerScript *language*, only its operator semantics,
SURVEY §2.10.2):

    ("prop", name)                      property/column reference
    ("lit", value)                      constant
    ("==", a, b)  ("!=",) ("<",) ("<=",) (">",) (">=",)
    ("contains", a, b) ("contains_i", a, b)
    ("startswith", a, b) ("startswith_i", a, b)
    ("regex", a, pattern)               re_match / ereregex
    ("isempty", a)
    ("in", a, [v1, v2, ...])            array comparison evalStrArrayCmp
    ("and", a, b) ("or", a, b) ("not", a)
    ("+", a, b) ("-", a, b) ("*", a, b) ("/", a, b) ("%", a, b) ("neg", a)
    ("&", a, b)                         string concat
    ("prifilt", "spec")                 PRI-selector mask
    ("call", fname, arg_exprs..., *scalar_args)   REGISTRY function

Comparison coercion follows the reference: if both sides are numeric (or a
string side converts cleanly to a number), compare numerically; else compare
as strings (grammar/rainerscript.c:3056-3124 CMP_EQ).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .functions import ERRNO_FUNCTIONS, REGISTRY, prifilt

_CMP = {"==": pc.equal, "!=": pc.not_equal, "<": pc.less,
        "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal}


#: facility number → rsyslog name (runtime/srUtils.c syslog_fac_names)
FACILITY_NAMES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "audit", "alert", "clock",
    "local0", "local1", "local2", "local3", "local4", "local5", "local6",
    "local7",
]
#: severity number → name (runtime/srUtils.c syslog_severity_names)
SEVERITY_NAMES = ["emerg", "alert", "crit", "err", "warning", "notice",
                  "info", "debug"]


class PropertyRegistry:
    """Name → column (or derived expression) map; the MsgGetProp analogue
    (runtime/msg.c:3526). Covers the addressable-property surface of
    runtime/typedefs.h:193-246: message properties, *-text renderings,
    and the $now* system-time bucket family (derived from timegenerated —
    deterministic, documented deviation from wall-clock)."""

    #: rsyslog property name → engine column name (runtime/typedefs.h:193-246)
    ALIASES = {
        "msg": "msg", "rawmsg": "text", "hostname": "hostname",
        "source": "hostname", "fromhost": "hostname",
        "syslogtag": "syslogtag",
        "pri": "pri",
        "syslogfacility": "facility", "syslogseverity": "severity",
        "syslogpriority": "severity", "app-name": "appname",
        "procid": "procid", "msgid": "msgid",
        "structured-data": "structured_data",
        "timereported": "ts_reported", "timestamp": "ts_reported",
        "timegenerated": "ts", "parsesuccess": "parse_success",
        "protocol-version": "protocol",
    }

    def __init__(self, table: pa.Table, tables: dict | None = None):
        self.table = table
        # lookup tables addressable from expressions via lookup("name", key)
        # (grammar/rainerscript.c doFunct_Lookup) — bound by the ruleset
        # executor from the config's lookup_tables
        self.tables = tables or {}
        # per-row script errno (wti execState.script_errno analogue,
        # runtime/wti.h:82): set by the most recent errno-setting function
        # call evaluated against this batch; persists across statements
        # when one registry walks a whole ruleset (route_table)
        self.script_errno = None  # lazily: np.int64[n], 0 = RS_SCRIPT_EOK
        # previous_action_suspended() state (action.c bCurrentlySuspended
        # of the most recently walked write action; grammar/
        # rainerscript.c:3762): updated by the ruleset executor after each
        # write statement from the writer's cross-batch suspend map
        self.prev_action_suspended = False

    def rebind(self, table: pa.Table) -> None:
        """Point the registry at an updated batch (after a `set`/`unset`
        statement rewrote a column) while keeping cross-statement state
        (script errno, lookup tables). Row count must be unchanged —
        set/unset never add or drop rows."""
        self.table = table

    def _assemble_local_tree(self, prefix: str) -> pa.Array:
        """The local-variable tree (or the subtree under `prefix`) as a
        JSON object string per row, assembled from the flat "$.a!b"
        columns; unset/null vars omitted, rows with nothing set read ""
        (MsgGetProp empty-string fallback)."""
        import json as _json
        head = "$." + (prefix + "!" if prefix else "")
        cols = [c for c in self.table.column_names if c.startswith(head)]
        n = self.table.num_rows
        if not cols:
            return pa.array([""] * n, pa.string())
        data = {c[len(head):]: pc.cast(self._col(c),
                                       pa.string()).to_pylist()
                for c in cols}
        out = []
        for i in range(n):
            tree: dict = {}
            for path, vals in data.items():
                if vals[i] is None:
                    continue
                node = tree
                keys = path.split("!")
                for k in keys[:-1]:
                    node = node.setdefault(k, {})
                    if not isinstance(node, dict):
                        break
                else:
                    node[keys[-1]] = vals[i]
            out.append(_json.dumps(tree, separators=(",", ":"),
                                   sort_keys=True) if tree else "")
        return pa.array(out, pa.string())

    def set_errno(self, ok) -> None:
        """Record per-row errno from an errno-setting function's ok mask
        (EOK=0 / EINVAL=1, grammar/rainerscript.h:334-335)."""
        import numpy as np
        if isinstance(ok, pa.ChunkedArray):
            ok = ok.combine_chunks()
        if isinstance(ok, pa.Scalar):
            ok = ok.as_py()
        if isinstance(ok, (bool, type(None))):
            # constant-argument call: one verdict for every row
            ok = np.full(self.table.num_rows, bool(ok))
            self.script_errno = np.where(ok, 0, 1).astype(np.int64)
            return
        okn = pc.fill_null(ok, False).to_numpy(zero_copy_only=False)
        self.script_errno = np.where(okn, 0, 1).astype(np.int64)

    def get_errno(self) -> pa.Array:
        import numpy as np
        if self.script_errno is None:
            return pa.array(np.zeros(self.table.num_rows, dtype=np.int64))
        return pa.array(self.script_errno)

    def get(self, name: str) -> pa.Array | pa.ChunkedArray:
        stripped = name.lstrip("$")
        if stripped == "!":
            # bare root `$!` (rscript_bare_var_root.sh / the unflatten
            # arg shape): the WHOLE tree as its JSON string; absent
            # tree reads "" like any unset var
            for c in ("cee_json", "json_tree"):
                if c in self.table.column_names:
                    return pc.fill_null(
                        pc.cast(self._col(c), pa.string()), "")
            return pa.array([""] * self.table.num_rows, pa.string())
        if stripped.startswith("!"):
            # JSON-tree access `$!a!b` (runtime/msg.c msgGetJSONPropJSON):
            # the engine's parsed tree is a normalized JSON string column
            # (mmjsonparse/parse_json output — cee_json by convention).
            # Path keys keep their original case (JSON is case-sensitive).
            from .functions import json_get
            for c in ("cee_json", "json_tree"):
                if c in self.table.column_names:
                    return json_get(pc.cast(self._col(c), pa.string()),
                                    stripped[1:])
            # no tree column at all: every $! path reads as the empty
            # string, exactly like a missing path in a present tree
            # (msgGetJSONPropJSON not-found → "";
            # template-pos-from-to-missing-jsonvar.sh)
            return pa.array([""] * self.table.num_rows, pa.string())
        if stripped == ".":
            # bare `$.` (rscript_bare_var_root.sh `set $! = $.;`): the
            # whole LOCAL tree as a JSON object string, assembled from
            # the flat "$.a!b" columns (unset/null vars omitted)
            return self._assemble_local_tree("")
        if stripped.startswith("."):
            # local variable `$.name` (grammar/rainerscript.c VAR_LOCAL):
            # stored as a batch column under its literal spelling by the
            # `set` statement; an unset variable reads as "" (msg.c
            # MsgGetProp returns the empty string for unknown vars)
            col = "$." + stripped[1:]
            if col in self.table.column_names:
                c = self._col(col)
                # rows nulled by `unset` must read back as "" like a
                # never-set variable (msg.c MsgGetProp empty-string
                # fallback), so filters/concat see "" not null
                if c.null_count and (pa.types.is_string(c.type)
                                     or pa.types.is_large_string(c.type)):
                    return pc.fill_null(c, "")
                return c
            # locals are a TREE in the reference (local var root '.'):
            # a path read $.a!b whose own column is absent descends into
            # the longest-prefix column's JSON value (foreach loop vars
            # hold array elements as JSON text — json_array_looping.sh
            # reads $.quux!bar)
            rest = stripped[1:]
            best = None
            for c in self.table.column_names:
                if (c.startswith("$.") and rest.startswith(c[2:] + "!")
                        and (best is None or len(c) > len(best))):
                    best = c
            if best is not None:
                from .functions import json_get
                sub = json_get(pc.cast(self._col(best), pa.string()),
                               rest[len(best) - 2 + 1:])
                return pc.fill_null(sub, "")
            # container read: $.x with only deeper "$.x!..." columns
            # assembles the subtree object (the reference's local tree
            # has real container nodes — rscript_unflatten_conflict2.sh
            # passes $.x after `set $.x!a = 21`)
            if any(c.startswith("$." + rest + "!")
                   for c in self.table.column_names):
                return self._assemble_local_tree(rest)
            n = self.table.num_rows
            return pa.array([""] * n, pa.string())
        name_l = name.lower().lstrip("$")
        if name_l in self._COMPUTED:
            return self._COMPUTED[name_l](self)
        if name_l == "parsesuccess":
            return self._parsesuccess()
        col = self.ALIASES.get(name, self.ALIASES.get(name_l, name))
        if col == "syslogtag":
            return self._syslogtag()
        if col in self.table.column_names:
            c = self.table[col]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        raise KeyError(f"unknown property {name!r}")

    # ---- computed properties (runtime/msg.c:3526-3930) -------------------

    def _col(self, name: str):
        c = self.table[name]
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    def _fac_text(self):
        import numpy as np
        fac = self._col("facility").to_numpy(zero_copy_only=False)
        names = np.asarray(FACILITY_NAMES + ["invld"], dtype=object)
        return pa.array(names[np.clip(fac, 0, 24)], pa.string())

    def _sev_text(self):
        import numpy as np
        sev = self._col("severity").to_numpy(zero_copy_only=False)
        names = np.asarray(SEVERITY_NAMES, dtype=object)
        return pa.array(names[np.clip(sev, 0, 7)], pa.string())

    def _programname(self):
        # msg.c aquireProgramName:1562-1575: TAG up to the first ':',
        # '[', '/' (bPermitSlashInProgramname off) or non-printable —
        # prop-programname.sh: 'tag/with/slashes' -> 'tag'
        tag = pc.fill_null(pc.cast(self._syslogtag(), pa.string()), "")
        return pc.struct_field(
            pc.extract_regex(tag, pattern=r"^(?P<g>[^:\[/ ]*)"), "g")

    def _pri_text(self):
        # msg.c textpri(): "<facility-text>.<severity-text>"
        return pc.binary_join_element_wise(self._fac_text(),
                                           self._sev_text(), ".")

    def _fromhost_ip(self):
        # a parser that extracted the peer (pmnormalize fromhost-ip
        # field → fromhost_ip column) wins; otherwise the file/parquet
        # source has no socket peer and the reference resolves the
        # local sender to 127.0.0.1 (imdiag injection path)
        if "fromhost_ip" in self.table.column_names:
            return pc.fill_null(
                pc.cast(self._col("fromhost_ip"), pa.string()),
                "127.0.0.1")
        import numpy as np
        return pa.array(np.full(self.table.num_rows, "127.0.0.1",
                                dtype=object), pa.string())

    def _inputname(self):
        import numpy as np
        return pa.array(np.full(self.table.num_rows, "imfile",
                                dtype=object), pa.string())

    def _bom(self):
        import numpy as np
        return pa.array(np.full(self.table.num_rows, "\ufeff",
                                dtype=object), pa.string())

    def _uuid(self):
        # msg.c uuid is random per message; ours derives deterministically
        # from row identity (documented deviation — reproducible runs)
        from .functions import hash64
        import numpy as np
        key = pc.binary_join_element_wise(
            pc.cast(self._col("conv_id"), pa.string()),
            pc.cast(self._col("turn_idx"), pa.string()), "\x1f")
        h = hash64(key).to_numpy(zero_copy_only=False)
        h2 = hash64(pc.binary_join_element_wise(
            pc.cast(key, pa.string()), pa.scalar("#2"), "")).to_numpy(
                zero_copy_only=False)
        s = np.char.add(
            np.char.zfill(np.vectorize(lambda v: format(v, "x"))(h), 16),
            np.char.zfill(np.vectorize(lambda v: format(v, "x"))(h2), 16))
        out = [f"{x[0:8]}-{x[8:12]}-{x[12:16]}-{x[16:20]}-{x[20:32]}"
               for x in s]
        return pa.array(out, pa.string())

    def _jsonmesg(self):
        # msg.c jsonmesg: the message as a JSON object; subset of props,
        # keys in msg.c emission order
        from .templates import Template
        tpl = Template('{"msg":"%msg:::json%","rawmsg":"%rawmsg:::json%",'
                       '"hostname":"%hostname:::json%",'
                       '"syslogtag":"%syslogtag:::json%",'
                       '"syslogfacility":%syslogfacility%,'
                       '"syslogseverity":%syslogseverity%}')
        return pc.cast(tpl.render(self.table), pa.string())

    def _now_part(self, fmt: str):
        from .functions import format_time
        return format_time(self._col("ts"), fmt)

    def _now(self):
        ts = self._col("ts")
        secs = pc.cast(pc.divide(pc.cast(pc.cast(ts, pa.timestamp("us")),
                                         pa.int64()), 1_000_000),
                       pa.timestamp("s"))
        return pc.strftime(secs, format="%Y-%m-%d")

    def _hhour(self):
        mins = pc.minute(pc.cast(self._col("ts"), pa.timestamp("us")))
        return pc.cast(pc.divide(mins, 30), pa.string())

    def _qhour(self):
        mins = pc.minute(pc.cast(self._col("ts"), pa.timestamp("us")))
        return pc.cast(pc.divide(mins, 15), pa.string())

    def _wday(self):
        from .functions import _format_wday_week
        secs = pc.cast(pc.divide(pc.cast(pc.cast(self._col("ts"),
                                                 pa.timestamp("us")),
                                         pa.int64()), 1_000_000),
                       pa.timestamp("s"))
        return _format_wday_week(secs, "date-wday")

    _COMPUTED = {
        "syslogfacility-text": _fac_text,
        "syslogseverity-text": _sev_text,
        "syslogpriority-text": _sev_text,
        "pri-text": _pri_text,
        "programname": lambda self: self._programname(),
        "fromhost-ip": _fromhost_ip,
        "inputname": _inputname,
        "bom": _bom,
        "uuid": _uuid,
        "jsonmesg": _jsonmesg,
        "now": _now,
        "now-utc": _now,                  # engine time is already UTC
        "year": lambda self: self._now_part("date-year"),
        "year-utc": lambda self: self._now_part("date-year"),
        "month": lambda self: self._now_part("date-month"),
        "month-utc": lambda self: self._now_part("date-month"),
        "day": lambda self: self._now_part("date-day"),
        "day-utc": lambda self: self._now_part("date-day"),
        "hour": lambda self: self._now_part("date-hour"),
        "hour-utc": lambda self: self._now_part("date-hour"),
        "minute": lambda self: self._now_part("date-minute"),
        "minute-utc": lambda self: self._now_part("date-minute"),
        "hhour": _hhour,
        "hhour-utc": _hhour,
        "qhour": _qhour,
        "qhour-utc": _qhour,
        "wday": _wday,
        "wday-utc": _wday,
    }

    def _parsesuccess(self) -> pa.Array:
        """'OK'/'FAIL' strings for the state of the LAST parser
        (msg.c:2315 getParseSuccess): after mmjsonparse ran, that is
        the CEE parse result (mmjsonparse_simple.sh gates on
        $parsesuccess == \"OK\"); otherwise the header parse."""
        for c in ("cee_parsesuccess", "parse_success"):
            if c in self.table.column_names:
                return pc.if_else(pc.fill_null(
                    pc.cast(self._col(c), pa.bool_()), False),
                    pa.scalar("OK"), pa.scalar("FAIL"))
        return pa.array(["FAIL"] * self.table.num_rows, pa.string())

    def _syslogtag(self) -> pa.Array:
        """the VERBATIM 3164 TAG (colon included iff the source had
        one — MsgSetTAG stores the scan result as-is); appname for
        RFC5424 rows (deviation from rsyslog's exact TAG
        reconstruction, documented: runtime/msg.c getTAG composes
        APP-NAME[PROCID] for 5424)."""
        t = self.table
        tag = pc.fill_null(pc.cast(t["tag"].combine_chunks() if isinstance(t["tag"], pa.ChunkedArray) else t["tag"], pa.string()), "")
        app = pc.fill_null(pc.cast(t["appname"].combine_chunks() if isinstance(t["appname"], pa.ChunkedArray) else t["appname"], pa.string()), "")
        has_tag = pc.not_equal(tag, "")
        return pc.if_else(has_tag, tag, app)


def _is_str(arr) -> bool:
    t = arr.type if isinstance(arr, (pa.Array, pa.ChunkedArray, pa.Scalar)) else None
    return t is not None and (pa.types.is_string(t) or pa.types.is_large_string(t))


_NUMERIC_RE = r"^\s*-?\d+\s*$"


def _try_num(arr):
    """var2Number-style lenient string→int64: parseable values convert,
    the rest become null (caller decides the fallback). Vectorized."""
    s = pc.cast(arr, pa.string())
    ok = pc.match_substring_regex(pc.fill_null(s, ""), pattern=_NUMERIC_RE)
    safe = pc.if_else(ok, s, None)
    return pc.cast(safe, pa.int64()), ok


def _coerce_pair(a, b):
    """Implicit coercion: prefer numeric compare when either side is numeric
    (var2Number semantics, grammar/rainerscript.c:1413); non-numeric strings
    coerce to 0 rather than raising (the reference's var2Number default)."""
    def _str_to_num(v):
        # var2Number on a python-string literal: "  -12  " → -12,
        # anything else (incl. "") → 0 (rscript_str2num_empty.sh: 1+""
        # must evaluate to 1)
        import re as _re
        m = _re.match(r"^\s*(-?\d+)\s*$", v)
        return int(m.group(1)) if m else 0

    a_num = isinstance(a, (pa.Array, pa.ChunkedArray)) and pa.types.is_integer(a.type)
    b_num = isinstance(b, (pa.Array, pa.ChunkedArray)) and pa.types.is_integer(b.type)
    a_scalar_num = isinstance(a, (int, float)) and not isinstance(a, bool)
    b_scalar_num = isinstance(b, (int, float)) and not isinstance(b, bool)
    if (a_num or a_scalar_num) and (b_num or b_scalar_num):
        return a, b
    if (a_num or a_scalar_num) and _is_str(b):
        return a, pc.fill_null(_try_num(b)[0], 0)
    if _is_str(a) and (b_num or b_scalar_num):
        return pc.fill_null(_try_num(a)[0], 0), b
    if (a_num or a_scalar_num) and isinstance(b, str):
        return a, _str_to_num(b)
    if isinstance(a, str) and (b_num or b_scalar_num):
        return _str_to_num(a), b
    return a, b


def _mixed_compare(op: str, a, b):
    """Numeric-vs-string comparison with the reference's per-value fallback
    (grammar/rainerscript.c:3056-3124): each string value that parses as a
    number compares numerically; the rest compare as strings against the
    stringified numeric side. Fully vectorized (regex mask + if_else)."""
    a_str = _is_str(a)
    s, n = (a, b) if a_str else (b, a)  # s = string side, n = numeric side
    s_num, ok = _try_num(s)
    if isinstance(n, (pa.Array, pa.ChunkedArray)):
        n_str = pc.cast(n, pa.string())
    else:
        n_str = pa.scalar(str(n))
    num_cmp = (_CMP[op](s_num, n) if a_str else _CMP[op](n, s_num))
    str_cmp = (_CMP[op](pc.cast(s, pa.string()), n_str) if a_str
               else _CMP[op](n_str, pc.cast(s, pa.string())))
    return pc.if_else(ok, num_cmp, str_cmp)


def compile_expr(expr, props: PropertyRegistry):
    """Evaluate an expression AST against one Arrow batch → Array/scalar."""
    if not isinstance(expr, tuple):
        return expr  # bare literal
    op = expr[0]
    if op == "prop":
        return props.get(expr[1])
    if op == "lit":
        return expr[1]
    if op in _CMP:
        a = compile_expr(expr[1], props)
        b = compile_expr(expr[2], props)
        a_numish = ((isinstance(a, (pa.Array, pa.ChunkedArray))
                     and pa.types.is_integer(a.type))
                    or (isinstance(a, (int, float)) and not isinstance(a, bool)))
        b_numish = ((isinstance(b, (pa.Array, pa.ChunkedArray))
                     and pa.types.is_integer(b.type))
                    or (isinstance(b, (int, float)) and not isinstance(b, bool)))
        if a_numish and isinstance(b, str):
            b = pa.scalar(b)
        if b_numish and isinstance(a, str):
            a = pa.scalar(a)
        if (a_numish and _is_str(b)) or (_is_str(a) and b_numish):
            return _mixed_compare(op, a, b)
        a, b = _coerce_pair(a, b)
        if _is_str(a) and isinstance(b, (pa.Array, pa.ChunkedArray)) and _is_str(b) and a.type != b.type:
            b = pc.cast(b, a.type)
        return _CMP[op](a, b)
    if op in ("contains", "contains_i", "startswith", "startswith_i"):
        a = pc.cast(compile_expr(expr[1], props), pa.string())
        pat = compile_expr(expr[2], props)
        kw = {"ignore_case": op.endswith("_i")}
        fn = pc.match_substring if op.startswith("contains") else pc.starts_with
        return fn(a, pattern=pat, **kw)
    if op == "regex":
        a = pc.cast(compile_expr(expr[1], props), pa.string())
        return pc.match_substring_regex(a, pattern=expr[2])
    if op == "isempty":
        a = compile_expr(expr[1], props)
        return pc.equal(pc.fill_null(pc.cast(a, pa.string()), ""), "")
    if op == "in":
        a = compile_expr(expr[1], props)
        vals = expr[2]
        if _is_str(a):
            vals = [str(v) for v in vals]
            return pc.is_in(pc.cast(a, pa.string()), value_set=pa.array(vals, pa.string()))
        return pc.is_in(a, value_set=pa.array(vals))
    if op == "and":
        return pc.and_kleene(_to_bool(compile_expr(expr[1], props)),
                             _to_bool(compile_expr(expr[2], props)))
    if op == "or":
        return pc.or_kleene(_to_bool(compile_expr(expr[1], props)),
                            _to_bool(compile_expr(expr[2], props)))
    if op == "not":
        return pc.invert(_to_bool(compile_expr(expr[1], props)))
    if op in ("+", "-", "*", "/", "%"):
        a = compile_expr(expr[1], props)
        b = compile_expr(expr[2], props)
        a, b = _coerce_pair(a, b)
        fns = {"+": pc.add, "-": pc.subtract, "*": pc.multiply}
        if op in fns:
            return fns[op](a, b)
        if op == "/":
            return pc.divide(pc.cast(a, pa.int64()), b)  # integer division, rsyslog semantics
        ua = pc.cast(a, pa.int64()).to_numpy(zero_copy_only=False)
        import numpy as np
        ub = b.to_numpy(zero_copy_only=False) if isinstance(b, (pa.Array, pa.ChunkedArray)) else np.int64(b)
        return pa.array(ua % ub)
    if op == "neg":
        return pc.negate(compile_expr(expr[1], props))
    if op == "&":
        a = pc.cast(compile_expr(expr[1], props), pa.string())
        b = compile_expr(expr[2], props)
        if isinstance(b, (pa.Array, pa.ChunkedArray)):
            b = pc.cast(b, pa.string())
        else:
            b = pa.scalar(str(b))
        return pc.binary_join_element_wise(a, b, "")
    if op == "prifilt":
        return prifilt(props.get("syslogfacility"), props.get("syslogseverity"), expr[1])
    if op == "template":
        # exec_template(t) (grammar/rainerscript.c:1697): render a template
        # for every row → string column
        from .templates import Template
        return Template(expr[1]).render(props.table)
    if op == "getenv":
        # grammar/rainerscript.c:2058 — driver-env constant per run
        import os
        return os.environ.get(expr[1], "")
    if op == "random":
        # grammar/rainerscript.c:1956 random(max). Deviation (documented):
        # value derives from stable row identity (hash of the row's key
        # columns) so the result is deterministic regardless of batch_size
        # or partitioning — true randomness would break the oracle contract,
        # and a per-batch RNG would make a row's value depend on its
        # position within a batch.
        from .functions import hash64
        import numpy as np
        t = props.table
        key_cols = [c for c in ("conv_id", "turn_idx", "doc_id", "vec_id")
                    if c in t.column_names]
        if key_cols:
            parts = [pc.cast(t[c], pa.string()) for c in key_cols]
            ident = parts[0] if len(parts) == 1 else \
                pc.binary_join_element_wise(*parts, "\x1f")
            h = hash64(ident).to_numpy(zero_copy_only=False)
        else:  # no identity columns: fall back to a fixed per-row stream
            h = np.random.default_rng(4242).integers(
                0, 2**63, size=t.num_rows, dtype=np.uint64)
        return pa.array((h % np.uint64(int(expr[1]))).astype(np.int64))
    if op == "call":
        fname = expr[1]
        fn = REGISTRY[fname]
        args = [compile_expr(a, props) if isinstance(a, tuple) else a
                for a in expr[2:]]
        res = fn(*args)
        if fname in ERRNO_FUNCTIONS:
            # wtiSetScriptErrno analogue: is_time's 1/0 NUMBER result is
            # the ok mask (doFunc_is_time); parse_time/parse_json fail
            # as nulls
            if fname == "is_time":
                ok = (pc.not_equal(res, 0)
                      if isinstance(res, (pa.Array, pa.ChunkedArray))
                      else bool(res))
            elif (isinstance(res, (pa.Array, pa.ChunkedArray))
                  and pa.types.is_boolean(res.type)):
                ok = res
            else:
                ok = pc.is_valid(res) \
                    if isinstance(res, (pa.Array, pa.ChunkedArray)) \
                    else res is not None
            props.set_errno(ok)
        return res
    if op == "lookup":
        # lookup("table", key) (grammar/rainerscript.c doFunct_Lookup):
        # resolves against the registry's bound lookup tables (config
        # lookup_tables → Ruleset.tables). Key coerces to string like the
        # reference's es_str2cstr of the key expression.
        tbl = props.tables.get(expr[1])
        if tbl is None:
            raise KeyError(f"lookup table {expr[1]!r} not bound "
                           f"(config lookup_tables)")
        key = compile_expr(expr[2], props)
        if not isinstance(key, (pa.Array, pa.ChunkedArray)):
            key = pa.array([key] * props.table.num_rows)
        return tbl.lookup_array(pc.cast(key, pa.string()))
    if op == "exists":
        # exists($!a!b) (grammar/rainerscript.c doFunct_Exists): key
        # presence in the JSON tree — distinguishes present-null from
        # absent. No tree column → nothing exists.
        from .functions import json_exists
        path = expr[1].lstrip("$")
        if path.startswith("."):
            # local-variable tree (msg.c getJSONRootAndMutexByVarChar
            # '.'): locals are flat "$.a!b" columns here, so a path
            # exists iff its own column is set, or any deeper
            # "$.a!b!…" column is (containers along a set path exist
            # in the reference's local tree) — rscript_exists-yes2/not3
            import numpy as np
            base = "$." + path[1:]
            out = np.zeros(props.table.num_rows, dtype=bool)
            for c in props.table.column_names:
                if c == base or c.startswith(base + "!"):
                    out |= pc.is_valid(props._col(c)).to_numpy(
                        zero_copy_only=False)
            return pa.array(out)
        path = path[1:] if path.startswith("!") else path
        for c in ("cee_json", "json_tree"):
            if c in props.table.column_names:
                return json_exists(
                    pc.cast(props._col(c), pa.string()), path)
        import numpy as np
        return pa.array(np.zeros(props.table.num_rows, dtype=bool))
    if op == "script_error":
        # script_error() (grammar/rainerscript.c:2792 doFunct_ScriptError):
        # per-row errno of the most recent errno-setting function call
        return props.get_errno()
    if op == "previous_action_suspended":
        # previous_action_suspended() (grammar/rainerscript.c:3762
        # doFunct_PrevActSuspended): TRUE iff the most recently walked
        # write action is currently suspended (delivery-failure state
        # carried across batches by the RouteWriter)
        import numpy as np
        return pa.array(np.full(props.table.num_rows,
                                bool(props.prev_action_suspended)))
    raise ValueError(f"unknown expression op {op!r}")


def _to_bool(arr):
    if isinstance(arr, (pa.Array, pa.ChunkedArray)) and pa.types.is_boolean(arr.type):
        return arr
    if isinstance(arr, bool):
        return arr
    # rsyslog truthiness: nonzero number / nonempty handled by caller context
    return pc.not_equal(pc.cast(arr, pa.int64()), 0)


def eval_mask(expr, batch: pa.Table,
              props: PropertyRegistry | None = None) -> pa.Array:
    """Expression → boolean mask over a batch; nulls → False (a filter that
    cannot evaluate does not match, runtime/ruleset.c:447). Pass a shared
    `props` registry to persist script_error() state across the statements
    of one ruleset walk (the per-worker wti execState analogue)."""
    res = compile_expr(expr, props or PropertyRegistry(batch))
    if isinstance(res, (pa.Array, pa.ChunkedArray)) and \
            not pa.types.is_boolean(res.type):
        res = _to_bool(res)
    if isinstance(res, pa.ChunkedArray):
        res = res.combine_chunks()
    return pc.fill_null(res, False)
