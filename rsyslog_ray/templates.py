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
    frompos: int | None = None     # 1-based inclusive
    topos: int | None = None
    field_delim: str | None = None
    field_n: int | None = None
    options: list[str] = dfield(default_factory=list)


_PROP_RE = re.compile(r"%([^%]*)%")


def parse_template(tpl: str) -> list[TplEntry]:
    entries: list[TplEntry] = []
    pos = 0
    for m in _PROP_RE.finditer(tpl):
        if m.start() > pos:
            entries.append(TplEntry("const", text=tpl[pos:m.start()]))
        body = m.group(1)
        parts = body.split(":")
        name = parts[0]
        e = TplEntry("prop", prop=name.lower())
        if len(parts) > 1 and parts[1]:
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


def _json_escape(arr: pa.Array) -> pa.Array:
    """Vectorized JSON string escape for \\ and \" (control chars were
    octal-escaped at sanitize — template.h:48-53 JSON escape mode)."""
    arr = pc.replace_substring(arr, pattern="\\", replacement="\\\\")
    return pc.replace_substring(arr, pattern='"', replacement='\\"')


def _csv_quote(arr: pa.Array) -> pa.Array:
    doubled = pc.replace_substring(arr, pattern='"', replacement='""')
    return pc.binary_join_element_wise(pa.scalar('"'), doubled, pa.scalar('"'), "")


def _render_entry(e: TplEntry, props: PropertyRegistry, n: int):
    if e.kind == "const":
        return e.text
    val = props.get(e.prop)
    if isinstance(val, pa.ChunkedArray):
        val = val.combine_chunks()
    is_ts = pa.types.is_timestamp(val.type)
    dateopt = next((o for o in e.options if o.startswith("date-")), None)
    if is_ts:
        val = format_time(val, dateopt or "date-rfc3164")
    elif pa.types.is_boolean(val.type):
        val = pc.if_else(val, pa.scalar("1"), pa.scalar("0"))
    elif not (pa.types.is_string(val.type) or pa.types.is_large_string(val.type)):
        val = pc.cast(val, pa.string())
    val = pc.fill_null(pc.cast(val, pa.string()), "")
    if e.field_delim is not None:
        val = field_fn(val, e.field_delim, e.field_n or 1)
    if e.frompos is not None:
        val = pc.utf8_slice_codeunits(val, e.frompos - 1,
                                      e.topos if e.topos is not None else 2**30)
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
        elif o == "json":
            val = _json_escape(val)
        elif o == "csv":
            val = _csv_quote(val)
    return val


class Template:
    """A compiled template; call .render(batch) → large_string column."""

    def __init__(self, spec: str, name: str = ""):
        self.name = name or spec
        self.spec = BUILTIN_TEMPLATES.get(spec, spec)
        self.entries = parse_template(self.spec)

    def render(self, batch: pa.Table) -> pa.Array:
        props = PropertyRegistry(batch)
        n = batch.num_rows
        parts = [_render_entry(e, props, n) for e in self.entries]
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


def render_template(batch: pa.Table, spec: str) -> pa.Array:
    return Template(spec).render(batch)
