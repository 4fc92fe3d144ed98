"""Template compiler: '%prop:from:to:options%' strings → Arrow kernel chains.

Reference: template.c (tplAddLine :1226 parses the mini-language; tplToString
:155 renders by walking entries through MsgGetProp runtime/msg.c:3526 with
the property-replacer options applied at runtime/msg.c:3936-4600).

Here a template compiles ONCE into a list of entries; `render` turns a batch
into a single `rendered` large_string column with one
`pc.binary_join_element_wise` — the strgen fast path (tools/smfile.c etc.)
falls out for free because every template is compiled.

Supported property-replacer options (template.h:77-148 subset):
  date-rfc3339 date-rfc3164 date-unix     — timestamp rendering
  lowercase uppercase                     — case conversion
  sp-if-no-1st-sp                         — emit " " iff value lacks one
  drop-last-lf                            — strip one trailing LF
  json                                    — JSON string-escape the value
  csv                                     — RFC4180 quote
  FromPos:ToPos                           — 1-based inclusive substring
  F,<ch>:N                                — field extraction by char code

Built-in templates mirror runtime/rsconf.c:86-110,1246-1277.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field as dfield

import pyarrow as pa
import pyarrow.compute as pc

from .expr import PropertyRegistry
from .functions import format_time, field as field_fn

BUILTIN_TEMPLATES = {
    # tools/smfile.c:5 / runtime/rsconf.c:1246-1277
    "RSYSLOG_FileFormat":
        "%TIMESTAMP:::date-rfc3339% %HOSTNAME% %syslogtag%"
        "%msg:::sp-if-no-1st-sp%%msg:::drop-last-lf%\n",
    "RSYSLOG_TraditionalFileFormat":
        "%TIMESTAMP% %HOSTNAME% %syslogtag%"
        "%msg:::sp-if-no-1st-sp%%msg:::drop-last-lf%\n",
    "RSYSLOG_ForwardFormat":
        "<%PRI%>%TIMESTAMP:::date-rfc3339% %HOSTNAME% %syslogtag:1:32%"
        "%msg:::sp-if-no-1st-sp%%msg%",
    "RSYSLOG_TraditionalForwardFormat":
        "<%PRI%>%TIMESTAMP% %HOSTNAME% %syslogtag:1:32%"
        "%msg:::sp-if-no-1st-sp%%msg%",
    "RSYSLOG_SyslogProtocol23Format":
        "<%PRI%>1 %TIMESTAMP:::date-rfc3339% %HOSTNAME% %APP-NAME% %PROCID% "
        "%MSGID% %STRUCTURED-DATA% %msg%\n",
}


@dataclass
class TplEntry:
    kind: str                      # "const" | "prop"
    text: str = ""                 # for const
    prop: str = ""                 # for prop
    outname: str | None = None     # jsonf field name (template.c fieldName)
    frompos: int | None = None     # 1-based inclusive
    topos: int | None = None
    field_delim: str | None = None
    field_n: int | None = None
    options: list[str] = dfield(default_factory=list)
    # regex extraction (template.c:839-930 "R" FromPos):
    re_pattern: str | None = None
    re_type: str = "BRE"           # BRE | ERE (template.h tplRegexType)
    re_submatch: int = 0
    re_match: int = 0
    re_nomatch: str = "DFLT"       # DFLT | BLANK | FIELD | ZERO
    # jsonf typing (template.h:136-145 TPE_DATATYPE_* / TPE_DATAEMPTY_*)
    datatype: str = "string"       # string | number | bool | auto
    onempty: str = "keep"          # keep | skip | null
    mandatory: bool = False        # bMandatory (tplToJSON emit-if-empty)
    const_raw: str | None = None   # constant's unwrapped value (tplToJSON)


_PROP_RE = re.compile(r"%([^%]*)%")

_NOMATCH_KEYWORDS = ("DFLT", "BLANK", "FIELD", "ZERO")


def _parse_regex_spec(e: TplEntry, body: str) -> None:
    """'name:R[,BRE|ERE][,submatch][,nomatch][,match]:regex--end[:options]'
    (template.c:839-930). The regex lives in the ToPos slot, terminated by
    the literal '--end' (template.c:1019-1027)."""
    flags_part, _, rest = body.partition(":")  # flags_part = 'R,...'
    idx = rest.find("--end")
    if idx < 0:
        raise ValueError(f"template regex missing '--end': %{body}%")
    e.re_pattern = rest[:idx]
    tail = rest[idx + 5:]
    if tail.startswith(":"):
        e.options = [o.strip() for o in tail[1:].split(",") if o.strip()]
    digits_seen = 0
    for tok in flags_part.split(",")[1:]:
        if tok in ("BRE", "ERE"):
            e.re_type = tok
        elif tok in _NOMATCH_KEYWORDS:
            e.re_nomatch = tok
        elif tok.isdigit():
            if digits_seen == 0:
                e.re_submatch = int(tok)
            else:
                e.re_match = int(tok)
            digits_seen += 1


def parse_template(tpl: str) -> list[TplEntry]:
    entries: list[TplEntry] = []
    pos = 0
    for m in _PROP_RE.finditer(tpl):
        if m.start() > pos:
            entries.append(TplEntry("const", text=tpl[pos:m.start()]))
        body = m.group(1)
        parts = body.split(":")
        name = parts[0]
        # rsyslog property names are case-insensitive (template.c uses
        # strcasecmp), but `$!` JSON-tree paths are case-SENSITIVE keys
        e = TplEntry("prop", prop=(name if name.lstrip("$").startswith("!")
                                   else name.lower()))
        if len(parts) > 1 and parts[1]:
            if parts[1].startswith("R"):
                _parse_regex_spec(e, body.partition(":")[2])
                entries.append(e)
                pos = m.end()
                continue
            if parts[1].startswith("F"):
                # field mode: F or F,<delimiter char code>
                ch = 9  # default TAB (template.c field mode default)
                if "," in parts[1]:
                    ch = int(parts[1].split(",")[1])
                e.field_delim = chr(ch)
                e.field_n = int(parts[2]) if len(parts) > 2 and parts[2] else 1
            else:
                e.frompos = int(parts[1])
                if len(parts) > 2 and parts[2]:
                    e.topos = int(parts[2])
        if len(parts) > 3 and parts[3]:
            e.options = [o.strip() for o in parts[3].split(",") if o.strip()]
        entries.append(e)
        pos = m.end()
    if pos < len(tpl):
        entries.append(TplEntry("const", text=tpl[pos:]))
    return entries


def _bre_to_ere(pat: str) -> str:
    """POSIX BRE → ERE: in BRE, unescaped ()|+?{} are literals and the
    escaped forms are operators — swap the escapedness. Char classes pass
    through untouched."""
    out = []
    i, n = 0, len(pat)
    in_class = False
    swap = set("()|+?{}")
    while i < n:
        c = pat[i]
        if in_class:
            out.append(c)
            if c == "]":
                in_class = False
            i += 1
        elif c == "[":
            in_class = True
            out.append(c)
            i += 1
        elif c == "\\" and i + 1 < n and pat[i + 1] in swap:
            out.append(pat[i + 1])           # \( → ( operator
            i += 2
        elif c in swap:
            out.append("\\" + c)             # ( → \( literal
            i += 1
        else:
            out.append(pat[i:i + 2] if c == "\\" and i + 1 < n else c)
            i += 2 if c == "\\" and i + 1 < n else 1
    return "".join(out)


def _name_groups(pat: str) -> tuple[str, int]:
    """Rename unnamed capture groups to g1..gN (pc.extract_regex requires
    named groups) and wrap the whole pattern as g0; returns (pattern,
    n_groups). Group numbers follow opening-paren order = POSIX submatch
    numbering."""
    out = []
    i, n = 0, len(pat)
    in_class = False
    gi = 0
    while i < n:
        c = pat[i]
        if c == "\\" and i + 1 < n:
            out.append(pat[i:i + 2])
            i += 2
            continue
        if in_class:
            out.append(c)
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
            out.append(c)
        elif c == "(" and pat[i + 1:i + 2] != "?":
            gi += 1
            out.append(f"(?P<g{gi}>")
        else:
            out.append(c)
        i += 1
    return "(?P<g0>" + "".join(out) + ")", gi


def _regex_extract(val: pa.Array, e: TplEntry) -> pa.Array:
    """Property-replacer regex extraction (runtime/msg.c:3990-4100):
    take match #re_match, submatch #re_submatch; apply the nomatch policy
    (DFLT '**NO MATCH**' / BLANK / WHOLE FIELD / ZERO) when the regex does
    not match. ERE runs vectorized on RE2 (match 0); BRE is translated to
    ERE first; match #>0 falls back to a pandas extractall pass."""
    pat = e.re_pattern or ""
    if e.re_type == "BRE":
        pat = _bre_to_ere(pat)
    named, ngroups = _name_groups(pat)
    sub = min(e.re_submatch, ngroups)
    gname = f"g{sub}"
    if e.re_match == 0:
        st = pc.extract_regex(val, pattern=named)
        matched = pc.is_valid(st)
        got = pc.fill_null(st.field(gname), "")
    else:
        import pandas as pd
        s = pd.Series(val.to_pandas(), dtype="string").fillna("")
        all_m = s.str.extractall(named)
        want = all_m.xs(e.re_match, level="match", drop_level=True) \
            if e.re_match in all_m.index.get_level_values("match") \
            else all_m.iloc[0:0]
        col = want[gname] if gname in want.columns else want.iloc[:, 0]
        out = pd.Series([None] * len(s), dtype="object")
        out.iloc[col.index] = col.to_numpy(dtype=object)
        got_pd = pa.array(out.tolist(), pa.string())
        matched = pc.is_valid(got_pd)
        got = pc.fill_null(got_pd, "")
    if e.re_nomatch == "BLANK":
        nomatch_val = pa.scalar("")
    elif e.re_nomatch == "ZERO":
        nomatch_val = pa.scalar("0")
    elif e.re_nomatch == "FIELD":
        nomatch_val = val
    else:
        nomatch_val = pa.scalar("**NO MATCH**")   # msg.c:4044
    return pc.if_else(matched, got, nomatch_val)


def _json_escape(arr: pa.Array) -> pa.Array:
    """Vectorized JSON string escape for \\ and \" (control chars were
    octal-escaped at sanitize — template.h:48-53 JSON escape mode)."""
    arr = pc.replace_substring(arr, pattern="\\", replacement="\\\\")
    return pc.replace_substring(arr, pattern='"', replacement='\\"')


def _csv_quote(arr: pa.Array) -> pa.Array:
    doubled = pc.replace_substring(arr, pattern='"', replacement='""')
    return pc.binary_join_element_wise(pa.scalar('"'), doubled, pa.scalar('"'), "")


_CC_RE = r"[\x00-\x1f\x7f]"


def _escape_cc(val: pa.Array) -> pa.Array:
    """'escape-cc': control chars → '#' + 3-digit octal (runtime/msg.c
    bEscapeCC). Regex-found chars are few post-sanitize; the replacement
    callable runs only on matches (pandas C match loop)."""
    import re as _re
    import pandas as pd
    s = pd.Series(val.to_pandas(), dtype="string")
    out = s.str.replace(_re.compile(_CC_RE),
                        lambda m: "#%03o" % ord(m.group(0)), regex=True)
    return pa.array(out.astype(object), pa.string())


def _secpath(val: pa.Array, mode: str) -> pa.Array:
    """secpath-drop / secpath-replace (runtime/msg.c:4366-4456): drop or
    '_'-replace slashes, then map '' → '_', '.' → '_', '..' → '_.' so the
    value is safe as a filesystem path component."""
    if mode == "drop":
        val = pc.replace_substring(val, pattern="/", replacement="")
    else:
        val = pc.replace_substring(val, pattern="/", replacement="_")
    val = pc.if_else(pc.equal(val, ""), pa.scalar("_"), val)
    val = pc.if_else(pc.equal(val, "."), pa.scalar("_"), val)
    return pc.if_else(pc.equal(val, ".."), pa.scalar("_."), val)


def _sql_escape(arr: pa.Array, mode: str) -> pa.Array:
    """template.c doEscape: 'sql' (MySQL-style: \\ and ' get backslash-
    escaped), 'stdsql' (' doubled), 'json' (\\ and \" escaped)."""
    if mode == "stdsql":
        return pc.replace_substring(arr, pattern="'", replacement="''")
    if mode == "sql":
        arr = pc.replace_substring(arr, pattern="\\", replacement="\\\\")
        return pc.replace_substring(arr, pattern="'", replacement="\\'")
    if mode == "json":
        return _json_escape(arr)
    return arr


def _render_entry(e: TplEntry, props: PropertyRegistry, n: int,
                  escape: str | None = None):
    if e.kind == "const":
        return e.text
    val = props.get(e.prop)
    if isinstance(val, pa.ChunkedArray):
        val = val.combine_chunks()
    is_ts = pa.types.is_timestamp(val.type)
    dateopt = next((o for o in e.options if o.startswith("date-")
                    and o != "date-utc"), None)
    if is_ts:
        # the property replacer's rfc3339 is the FULL form
        # (datetime.c:815 fraction + offset), unlike the script
        # function's 'Z' form (datetime.c:1282)
        if dateopt in (None, "date-rfc3164"):
            val = format_time(val, "date-rfc3164")
        elif dateopt == "date-rfc3339":
            val = format_time(val, "date-rfc3339-full")
        else:
            val = format_time(val, dateopt)
    elif pa.types.is_boolean(val.type):
        val = pc.if_else(val, pa.scalar("1"), pa.scalar("0"))
    elif not (pa.types.is_string(val.type) or pa.types.is_large_string(val.type)):
        val = pc.cast(val, pa.string())
    val = pc.fill_null(pc.cast(val, pa.string()), "")
    if e.re_pattern is not None:
        val = _regex_extract(val, e)
    if e.field_delim is not None:
        val = field_fn(val, e.field_delim, e.field_n or 1)
    if e.frompos is not None:
        fixed = "fixed-width" in e.options
        if "pos-end-relative" in e.options:
            # runtime/msg.c:4128: iFrom = len-from, iTo = len-to (negative
            # python-style indices give the same clamped window)
            start = -e.frompos
            stop = (-(e.topos - 1) if e.topos and e.topos > 1 else 2**30)
            val = pc.utf8_slice_codeunits(val, start, stop)
            width = (e.frompos - (e.topos or 1) + 1)
        else:
            val = pc.utf8_slice_codeunits(
                val, e.frompos - 1,
                e.topos if e.topos is not None else 2**30)
            width = ((e.topos - e.frompos + 1)
                     if e.topos is not None else None)
        if fixed and width and width > 0:
            # space-pad to the full window (msg.c:4158-4185 bFixedWidth)
            val = pc.utf8_rpad(val, width, " ")
    for o in e.options:
        if o == "lowercase":
            val = pc.utf8_lower(val)
        elif o == "uppercase":
            val = pc.utf8_upper(val)
        elif o == "sp-if-no-1st-sp":
            # emit ONLY the conditional space (runtime/msg.c option semantics)
            val = pc.if_else(pc.starts_with(val, pattern=" "),
                             pa.scalar(""), pa.scalar(" "))
        elif o == "drop-last-lf":
            val = pc.replace_substring_regex(val, pattern=r"\n$", replacement="")
        elif o == "drop-cc":
            val = pc.replace_substring_regex(val, pattern=_CC_RE,
                                             replacement="")
        elif o == "space-cc":
            val = pc.replace_substring_regex(val, pattern=_CC_RE,
                                             replacement=" ")
        elif o == "escape-cc":
            val = _escape_cc(val)
        elif o == "compressspace":
            val = pc.replace_substring_regex(val, pattern="  +",
                                             replacement=" ")
        elif o == "secpath-drop":
            val = _secpath(val, "drop")
        elif o == "secpath-replace":
            val = _secpath(val, "replace")
        elif o == "json":
            val = _json_escape(val)
        elif o == "jsonr":
            pass  # raw JSON value, no escaping (template.h bJSONr)
        elif o == "jsonf":
            # JSON name/value pair field (template.h bJSONf): emit
            # "outname":<value> — outname defaults to the property name
            # with any $! prefix dropped (template.c:1717); value typing
            # and empty-field policy per jsonField (runtime/msg.c:3408-3476)
            fname = e.outname or e.prop.removeprefix("$!").removeprefix("!")
            val = _jsonf_pair(fname, val, e.datatype, e.onempty)
        elif o == "csv":
            val = _csv_quote(val)
    if escape and not isinstance(val, str):
        val = _sql_escape(val, escape)
    return val


def _jsonf_pair(fname: str, val, datatype: str = "string",
                onempty: str = "keep"):
    """jsonField (runtime/msg.c:3408-3476): '"name":<typed value>'.

    onEmpty: keep (type rules decide), skip (whole field omitted — the
    raw empty value, i.e. nothing, renders), null ('"name":null').
    dataType: string (always quoted), number (unquoted; empty → 0 — and
    non-numeric content emits unquoted exactly like the reference, which
    never validates), bool ('0' → false, everything else incl. empty →
    true), auto (unquoted iff all-digits, else quoted).
    """
    val = pc.fill_null(pc.cast(val, pa.string()), "")
    empty = pc.equal(val, "")
    prefix = pa.scalar(f'"{fname}":')
    esc = _json_escape(val)
    quoted = pc.binary_join_element_wise(
        pa.scalar('"'), esc, pa.scalar('"'), "")
    if datatype == "auto":
        digits = pc.match_substring_regex(val, pattern=r"^[0-9]+$")
        body = pc.if_else(digits, esc, quoted)
    elif datatype == "number":
        body = pc.if_else(empty, pa.scalar("0"), esc)
    elif datatype == "bool":
        body = pc.if_else(pc.equal(val, "0"),
                          pa.scalar("false"), pa.scalar("true"))
    else:  # string
        body = quoted
    pair = pc.binary_join_element_wise(prefix, body, "")
    if onempty == "skip":
        return pc.if_else(empty, pa.scalar(""), pair)
    if onempty == "null":
        return pc.if_else(
            empty,
            pc.binary_join_element_wise(prefix, pa.scalar("null"), ""),
            pair)
    return pair


def _entry_from_property(p: dict) -> TplEntry:
    """template(type="list") { property(name=... ...) } → TplEntry.
    Param set mirrors template.c createPropertyTpe (:1449-1812); param
    names are case-insensitive like the reference's nvlst handling."""
    p = {k.lower(): v for k, v in p.items()}
    name = str(p.get("name", ""))
    e = TplEntry("prop", prop=(name if name.lstrip("$").startswith("!")
                               else name.lower()))
    if "outname" in p:
        e.outname = str(p["outname"])
    # position window (template.c:1725 sanity defaults)
    if "position.from" in p or "position.to" in p:
        e.frompos = int(p.get("position.from", 0)) or 1
        if "position.to" in p:
            e.topos = int(p["position.to"])
    if _onoff(p.get("position.relativetoend")):
        e.options.append("pos-end-relative")
    if _onoff(p.get("fixedwidth")):
        e.options.append("fixed-width")
    if "field.number" in p:
        e.field_n = int(p["field.number"])
        e.field_delim = chr(int(p.get("field.delimiter", 9)))
    if "regex.expression" in p:
        e.re_pattern = str(p["regex.expression"])
        e.re_type = str(p.get("regex.type", "BRE")).upper()
        e.re_submatch = int(p.get("regex.submatch", 0))
        e.re_match = int(p.get("regex.match", 0))
        e.re_nomatch = str(p.get("regex.nomatchmode", "DFLT")).upper()
    fmt = str(p.get("format", "")).lower()
    if fmt in ("csv", "json", "jsonf", "jsonr"):
        e.options.append(fmt)
    if "datatype" in p:
        dt = str(p["datatype"]).lower()
        if dt not in ("string", "number", "bool", "auto"):
            raise ValueError(  # template.c:1507 LogError + ABORT
                f"invalid dataType {p['datatype']!r} for property")
        e.datatype = dt
    if "onempty" in p:
        oe = str(p["onempty"]).lower()
        if oe not in ("keep", "skip", "null"):
            raise ValueError(  # template.c:1521
                f"invalid onEmpty value {p['onempty']!r} for property")
        e.onempty = oe
    if "mandatory" in p:
        e.mandatory = _onoff(p["mandatory"])
    cc = str(p.get("controlcharacters", "")).lower()
    if cc in ("escape", "space", "drop"):
        e.options.append({"escape": "escape-cc", "space": "space-cc",
                          "drop": "drop-cc"}[cc])
    sp = str(p.get("securepath", "")).lower()
    if sp in ("drop", "replace"):
        e.options.append(f"secpath-{sp}")
    cs = str(p.get("caseconversion", "")).lower()
    if cs in ("lower", "upper"):
        e.options.append({"lower": "lowercase", "upper": "uppercase"}[cs])
    if _onoff(p.get("compressspace")):
        e.options.append("compressspace")
    if _onoff(p.get("droplastlf")):
        e.options.append("drop-last-lf")
    if _onoff(p.get("spifno1stsp")):
        e.options.append("sp-if-no-1st-sp")
    if "dateformat" in p:
        e.options.append(f"date-{str(p['dateformat']).lower()}")
    return e


def _onoff(v) -> bool:
    return str(v).lower() in ("on", "1", "true", "yes")


def entries_from_list(items: list[dict]) -> list[TplEntry]:
    """Compile a list-template body (template.c:1226 tplAddLine list path:
    constant(...) / property(...) objects) onto the same TplEntry chain
    the %...% string compiler produces — both template types render
    through one code path."""
    out: list[TplEntry] = []
    for it in items:
        kind = it.get("kind", "property")
        if kind in ("constant", "const"):
            p = {k.lower(): v for k, v in it.items()}
            txt = str(p.get("value", ""))
            if str(p.get("format", "")).lower() == "jsonf":
                # constant jsonf requires outname (template.c:1411)
                if not p.get("outname"):
                    raise ValueError(
                        "constant with format=jsonf needs outname=")
                # constant jsonf goes through json-c's object printer and
                # strips "{ "/" }" (template.c:1433-1436) — that printer
                # puts a SPACE after the colon, unlike property jsonf
                # (jsonField writes "name": directly).  Byte-faithful:
                # template-const-jsonf.sh expects '"@version": "1"'.
                txt = (f'"{p["outname"]}": '
                       + json.dumps(txt, ensure_ascii=True))
            e = TplEntry("const", text=txt, outname=p.get("outname"))
            e.const_raw = str(p.get("value", ""))
            out.append(e)
        else:
            out.append(_entry_from_property(it))
    return out


class Template:
    """A compiled template; call .render(batch) → large_string column.

    `spec` is either a %...% format string (string templates, incl. the
    RSYSLOG_* builtins), or a dict for the modern object forms:
      {"type": "list", "entries": [{"kind": "constant"|"property", ...}]}
      {"type": "subtree", "subtree": "$!path"}   (template.c:1926)
    Both compile onto the same TplEntry chain / render path.

    `escape` = template-level option.sql / option.stdsql / option.json
    (template.h optFormatEscape, applied per field by tplToString:215)."""

    def __init__(self, spec, name: str = "", escape: str | None = None):
        self.subtree: str | None = None
        if isinstance(spec, dict):
            self.name = name or spec.get("name", "")
            self.spec = spec
            if escape is None:  # template-level option.sql/stdsql/json
                escape = spec.get("escape")
            ttype = spec.get("type", "list")
            if ttype == "subtree":
                st = spec.get("subtree", "$!")
                self.subtree = st.removeprefix("$!").removeprefix("!")
                self.entries = []
            elif ttype == "list":
                self.entries = entries_from_list(spec.get("entries", []))
            elif ttype == "string":
                s = spec.get("string", "")
                self.spec = BUILTIN_TEMPLATES.get(s, s)
                self.entries = parse_template(self.spec)
            else:
                raise ValueError(f"unsupported template type {ttype!r}")
        else:
            self.name = name or spec
            self.spec = BUILTIN_TEMPLATES.get(spec, spec)
            self.entries = parse_template(self.spec)
        self.escape = escape

    def render(self, batch: pa.Table) -> pa.Array:
        props = PropertyRegistry(batch)
        n = batch.num_rows
        if self.subtree is not None:
            # type="subtree": render the (normalized) JSON subtree text
            # (template.c:288 jsonFind; missing subtree → empty string)
            col = next((c for c in ("cee_json", "json_tree")
                        if c in batch.column_names), None)
            if col is None:
                return pa.nulls(n, pa.large_string())
            tree = pc.cast(batch[col], pa.string())
            if self.subtree:
                from .functions import json_get
                tree = json_get(tree, self.subtree)
            return pc.cast(pc.fill_null(tree, ""), pa.large_string())
        parts = [_render_entry(e, props, n, self.escape)
                 for e in self.entries]
        if self.escape == "jsonf":
            # option.jsonf (tplToString, template.c:194-240): '{' prefix;
            # each entry's NON-EMPTY rendering is followed by ", ", the
            # final entry's by '}\n' (the separator is skipped entirely
            # for empty renderings — reference-faithful, including the
            # missing-brace quirk when the last entry renders empty)
            wrapped = ["{"]
            for i, p in enumerate(parts):
                sep = "}\n" if i == len(parts) - 1 else ", "
                if isinstance(p, str):
                    wrapped.append(p + sep if p else "")
                else:
                    p = pc.fill_null(pc.cast(p, pa.string()), "")
                    wrapped.append(pc.if_else(
                        pc.equal(p, ""), pa.scalar(""),
                        pc.binary_join_element_wise(p, pa.scalar(sep),
                                                    "")))
            parts = wrapped
        arrays = []
        for p in parts:
            if isinstance(p, str):
                arrays.append(pa.scalar(p))
            else:
                arrays.append(pc.cast(p, pa.string()))
        if not arrays:
            return pa.nulls(n, pa.large_string())
        if len(arrays) == 1 and isinstance(parts[0], str):
            import numpy as np
            return pa.array(np.full(n, parts[0], dtype=object), pa.large_string())
        joined = pc.binary_join_element_wise(*arrays, "")
        return pc.cast(joined, pa.large_string())


    def render_json(self, batch: pa.Table) -> pa.Array:
        """tplToJSON analogue (template.c:270-338): render the template as
        one JSON OBJECT text per row, for JSON-document sinks.

        Per the reference: constants emit only when they carry an outname
        (template.c:302); `$!`/`$.` fields embed their subtree as raw JSON
        (msgGetJSONPropJSON), a missing subtree emitting `"name":null`
        only when mandatory (template.c:316); all other fields emit as
        JSON strings iff mandatory or non-empty (template.c:323 —
        dataType/onEmpty are jsonField string-path options and do NOT
        apply here, faithfully).
        """
        from dataclasses import replace as dc_replace
        props = PropertyRegistry(batch)
        n = batch.num_rows
        if self.subtree is not None:
            txt = self.render(batch)
            return pc.cast(
                pc.if_else(pc.equal(pc.cast(txt, pa.string()), ""),
                           pa.scalar("{}"), pc.cast(txt, pa.string())),
                pa.large_string())
        parts = []  # each: string-array of '"name":value' or "" (omitted)
        for e in self.entries:
            if e.kind == "const":
                if not e.outname:
                    continue
                raw = e.const_raw if e.const_raw is not None else e.text
                pair = ('"%s":%s' % (e.outname, json.dumps(raw)))
                parts.append(pa.array([pair] * n, pa.string()))
                continue
            fname = e.outname or e.prop.removeprefix("$!").removeprefix("!")
            stripped = e.prop.lstrip("$")
            if stripped.startswith("!") or stripped.startswith("."):
                raw = _raw_json_values(props, e.prop, n)
                if e.mandatory:
                    pair = pc.binary_join_element_wise(
                        pa.scalar(f'"{fname}":'),
                        pc.fill_null(raw, "null"), "")
                else:
                    pair = pc.if_else(
                        pc.is_null(raw), pa.scalar(""),
                        pc.binary_join_element_wise(
                            pa.scalar(f'"{fname}":'),
                            pc.fill_null(raw, ""), ""))
            else:
                plain = dc_replace(e, options=[
                    o for o in e.options
                    if o not in ("json", "jsonf", "jsonr", "csv")])
                val = _render_entry(plain, props, n, None)
                if isinstance(val, str):
                    val = pa.array([val] * n, pa.string())
                val = pc.fill_null(pc.cast(val, pa.string()), "")
                quoted = pc.binary_join_element_wise(
                    pa.scalar(f'"{fname}":"'), _json_escape(val),
                    pa.scalar('"'), "")
                if e.mandatory:
                    pair = quoted
                else:
                    pair = pc.if_else(pc.equal(val, ""),
                                      pa.scalar(""), quoted)
            parts.append(pc.cast(pair, pa.string()))
        if not parts:
            return pa.array(["{}"] * n, pa.large_string())
        # comma-join only present fields: prefix each with "," when
        # non-empty, concatenate, strip the leading comma, wrap in {}
        pieces = [pc.if_else(pc.equal(p, ""), pa.scalar(""),
                             pc.binary_join_element_wise(
                                 pa.scalar(","), p, ""))
                  for p in parts]
        joined = (pieces[0] if len(pieces) == 1
                  else pc.binary_join_element_wise(*pieces, ""))
        joined = pc.replace_substring_regex(joined, pattern=r"^,",
                                            replacement="")
        return pc.cast(pc.binary_join_element_wise(
            pa.scalar("{"), joined, pa.scalar("}"), ""), pa.large_string())


def render_template(batch: pa.Table, spec: str) -> pa.Array:
    return Template(spec).render(batch)


def _raw_json_values(props: PropertyRegistry, prop: str, n: int) -> pa.Array:
    """Per-row raw-JSON encoding of a `$!`/`$.` property subtree
    (msgGetJSONPropJSON): null where the path is absent.  Bounded per-row
    loop — this is the JSON-document sink path, where each row becomes a
    document anyway."""
    stripped = prop.lstrip("$")
    if stripped.startswith("."):
        # local var: a string column by convention
        arr = props.get(prop)
        vals = pc.cast(arr, pa.string()).to_pylist()
        return pa.array([json.dumps(v) if v not in (None, "") else None
                         for v in vals], pa.string())
    path = stripped[1:]
    tbl = props.table
    col = next((c for c in ("cee_json", "json_tree")
                if c in tbl.column_names), None)
    if col is None:
        return pa.nulls(n, pa.string())
    from .functions import loads_fast
    out = []
    for v in pc.cast(tbl[col], pa.string()).to_pylist():
        cur = None
        found = False
        if v:
            try:
                cur = loads_fast(v)
                found = True
                for k in (path.split("!") if path else []):
                    if isinstance(cur, dict) and k in cur:
                        cur = cur[k]
                    else:
                        found = False
                        break
            except (ValueError, TypeError):
                found = False
        out.append(json.dumps(cur, separators=(",", ":"), sort_keys=True)
                   if found else None)
    return pa.array(out, pa.string())
