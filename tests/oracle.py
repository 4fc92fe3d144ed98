"""Single-threaded pure-Python oracle for the canonical pipeline.

Independent re-implementation of the engine's semantics (SURVEY §2 /
FIXTURES §4): row-at-a-time `re`/manual-walk parsing in the style of the C
reference (tools/pmrfc5424.c field walk, tools/pmrfc3164.c heuristics,
runtime/parser.c PRI/Sanitize), NOT the engine's vectorized RE2 cascade.
If both implementations agree byte-for-byte the conformance bar of
BASELINE.json (per-sink counts, routed-row sets, per-turn text equality
under (conv_id, turn_idx) order) is met.
"""

from __future__ import annotations

import json
import re
from collections import Counter
from dataclasses import dataclass, field
from datetime import datetime, timedelta

MAX_LINE = 8096
MONTHS = {m: i + 1 for i, m in enumerate(
    ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
     "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"])}

ROLE_FACILITY = {"user": "local0", "assistant": "local1",
                 "system": "daemon", "tool": "local7"}
ROLE_FACILITY_NOMATCH = "unknown"
TOOL_CLASS = {"bash": "exec", "search": "net", "editor": "fs", "": "none"}
TOOL_CLASS_NOMATCH = "unclassified"


def sanitize(text: str | None) -> str:
    if text is None:
        text = ""
    while text and text[-1] in "\n\r\x00":
        text = text[:-1]
    text = text[:MAX_LINE]
    return re.sub(r"[\x00-\x1f]", lambda m: "#%03o" % ord(m.group()), text)


def parse_pri(s: str) -> tuple[int, str, bool]:
    """runtime/parser.c:577-609 — returns (pri, rest, valid)."""
    if s.startswith("<"):
        i = 1
        while i < len(s) and s[i].isdigit() and i <= 3:
            i += 1
        if 1 < i <= 4 and i < len(s) and s[i] == ">":
            pri = int(s[1:i])
            if 0 <= pri <= 191:
                return pri, s[i + 1:], True
    return 13, s, False


def parse_rfc5424(rest: str):
    """tools/pmrfc5424.c field walk. Returns dict or None."""
    if not rest.startswith("1 "):
        return None
    s = rest[2:]
    fields = []
    for _ in range(5):  # TS HOST APP PROCID MSGID
        if not s or s[0] == " ":
            return None
        j = s.find(" ")
        if j <= 0:
            return None
        fields.append(s[:j])
        s = s[j + 1:]
    # SD: '-' or one+ bracket-balanced elements with backslash escapes.
    # The reference IGNORES an SD parse failure (pmrfc5424.c:287
    # unchecked return): the lenient fallback keeps SD empty and the
    # whole remainder as MSG.
    def _strict_sd(s):
        if s.startswith("-"):
            sd = "-"
            s = s[1:]
        elif s.startswith("["):
            k = 0
            while k < len(s) and s[k] == "[":
                k += 1
                while k < len(s):
                    if s[k] == "\\" and k + 1 < len(s):
                        k += 2
                        continue
                    if s[k] == "]":
                        k += 1
                        break
                    k += 1
                else:
                    return None
                if k == 0 or s[k - 1] != "]":
                    return None
            sd = s[:k]
            s = s[k:]
        else:
            return None
        if s == "":
            return sd, ""
        if s.startswith(" "):
            return sd, s[1:]
        return None

    strict = _strict_sd(s)
    if strict is not None:
        sd, msg = strict
    else:
        sd, msg = "", s
    ts = parse_rfc3339_str(fields[0]) if fields[0] != "-" else None
    return {"ts_reported": ts, "hostname": fields[1], "appname": fields[2],
            "procid": fields[3], "msgid": fields[4],
            "structured_data": sd, "msg": msg}


RFC3339_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})(\.\d+)?"
    r"(Z|[+-]\d{2}:\d{2})?$")


def parse_rfc3339_str(s: str):
    m = RFC3339_RE.match(s)
    if not m:
        return None
    y, mo, d, h, mi, sec = (int(m.group(i)) for i in range(1, 7))
    try:
        dt = datetime(y, mo, d, h, mi, sec)
    except ValueError:
        return None
    frac = m.group(7)
    if frac:
        # truncate to 6 digits (engine takes \d{1,6} and right-pads)
        dt += timedelta(microseconds=int(frac[1:7].ljust(6, "0")))
    tz = m.group(8)
    if tz and tz != "Z":
        off = int(tz[1:3]) * 3600 + int(tz[4:6]) * 60
        if tz[0] == "+":
            dt -= timedelta(seconds=off)
        else:
            dt += timedelta(seconds=off)
    return dt


RFC3164_HDR = re.compile(
    r"^ ?(?:(?P<t3339>\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?"
    r"(?:Z|[+-]\d{2}:\d{2})?)|"
    r"(?P<mon>[A-Z][a-z]{2}) (?P<day>[ 0-3]?\d) "
    r"(?P<hms>\d{2}:\d{2}:\d{2})) "
    r"(?P<host>[A-Za-z0-9._-]+)"
    r"(?: (?P<body>[\s\S]*))?$")

TAG_MAX = 32


def split_tag3164(body: str) -> tuple[str, str]:
    """The reference TAG scan (tools/pmrfc3164.c:341-366), row-at-a-time:
    tag runs to ':' (included) or SP (excluded, stays in msg) or
    end-of-body; first words longer than TAG_MAX yield no tag. The scan
    counts BYTES like the C loop (and the engine), so it runs over the
    utf-8 encoding; ASCII delimiters make the split boundaries safe."""
    bb = body.encode("utf-8")
    ic = bb.find(b":")
    isp = bb.find(b" ")
    if ic != -1 and (isp == -1 or ic < isp) and ic <= TAG_MAX:
        return (bb[:ic + 1].decode("utf-8"),
                bb[ic + 1:].decode("utf-8"))
    if isp != -1 and (ic == -1 or isp < ic) and isp <= TAG_MAX:
        return bb[:isp].decode("utf-8"), bb[isp:].decode("utf-8")
    if ic == -1 and isp == -1 and 0 < len(bb) <= TAG_MAX:
        return body, ""
    return "", body


def parse_rfc3164(rest: str, year: int = 2024):
    m = RFC3164_HDR.match(rest)
    if not m:
        return None
    if m.group("t3339"):
        ts = parse_rfc3339_str(m.group("t3339"))
    else:
        mon = MONTHS.get(m.group("mon"))
        if mon is None:
            ts = None
        else:
            day = int(m.group("day").strip())
            hh, mi, ss = (int(x) for x in m.group("hms").split(":"))
            try:
                ts = datetime(year, mon, day, hh, mi, ss)
            except ValueError:
                ts = None
    tag, msg = split_tag3164(m.group("body") or "")
    return {"ts_reported": ts, "hostname": m.group("host"),
            "tag": tag, "msg": msg}


@dataclass
class ParsedRow:
    conv_id: str
    turn_idx: int
    role: str
    tool: str
    ts: datetime
    text: str
    pri: int = 13
    protocol: int = -1
    parse_success: bool = False
    hostname: str = ""
    tag: str = ""
    appname: str = ""
    procid: str = ""
    msgid: str = ""
    structured_data: str = ""
    msg: str = ""
    ts_reported: datetime | None = None
    is_cee: bool = False
    cee_json: str | None = None
    cee_parsesuccess: bool = False
    role_fac: str = ""
    tool_class: str = ""

    @property
    def facility(self) -> int:
        return self.pri // 8

    @property
    def severity(self) -> int:
        return self.pri % 8

    @property
    def syslogtag(self) -> str:
        # MsgSetTAG stores the scan result verbatim (colon included
        # iff colon-terminated); 5424 rows fall back to appname
        return self.tag if self.tag else self.appname


def parse_row(conv_id, turn_idx, role, text, tool, ts) -> ParsedRow | None:
    s = sanitize(text)
    if not s:
        return None  # RS_RET_EMPTY_MSG drop
    r = ParsedRow(conv_id=conv_id, turn_idx=turn_idx, role=role, tool=tool,
                  ts=ts, text=s)
    pri, rest, _valid = parse_pri(s)
    r.pri = pri
    p5 = parse_rfc5424(rest)
    if p5 is not None:
        r.protocol = 1
        r.parse_success = True
        r.hostname = p5["hostname"]
        r.appname = p5["appname"]
        r.procid = p5["procid"]
        r.msgid = p5["msgid"]
        r.structured_data = p5["structured_data"]
        r.msg = p5["msg"]
        r.ts_reported = p5["ts_reported"] or ts
    else:
        p3 = parse_rfc3164(rest)
        if p3 is not None:
            r.protocol = 0
            r.parse_success = True
            r.hostname = p3["hostname"]
            r.tag = p3["tag"]
            r.appname = p3["tag"][:-1] if p3["tag"].endswith(":") \
                else p3["tag"]
            r.msg = p3["msg"]
            r.ts_reported = p3["ts_reported"] or ts
        elif re.match(r"^ *[\[{]", rest):
            r.protocol = 0
            r.parse_success = True
            r.msg = rest
            r.ts_reported = ts
        else:
            r.protocol = -1
            r.parse_success = False
            r.msg = rest
            r.ts_reported = ts
    ml = r.msg.lstrip()
    r.is_cee = ml.startswith("@cee:")
    if r.is_cee:
        try:
            obj = json.loads(ml[5:].lstrip())
            r.cee_json = json.dumps(obj, separators=(",", ":"), sort_keys=True)
            r.cee_parsesuccess = True
        except ValueError:
            pass
    r.role_fac = ROLE_FACILITY.get(role, ROLE_FACILITY_NOMATCH)
    r.tool_class = TOOL_CLASS.get(tool, TOOL_CLASS_NOMATCH)
    return r


# ---- template rendering ---------------------------------------------------


def fmt_rfc3339(dt: datetime) -> str:
    return dt.strftime("%Y-%m-%dT%H:%M:%S.") + f"{dt.microsecond:06d}+00:00"


def fmt_rfc3164(dt: datetime) -> str:
    return f"{dt.strftime('%b')} {dt.day:2d} {dt.strftime('%H:%M:%S')}"


def jesc(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')


def sp(msg: str) -> str:
    return "" if msg.startswith(" ") else " "


def render_forward(r: ParsedRow) -> str:
    return (f"<{r.pri}>{fmt_rfc3339(r.ts_reported)} {r.hostname} "
            f"{r.syslogtag[:32]}{sp(r.msg)}{r.msg}")


def render_file(r: ParsedRow) -> str:
    msg = r.msg[:-1] if r.msg.endswith("\n") else r.msg
    return (f"{fmt_rfc3339(r.ts_reported)} {r.hostname} "
            f"{r.syslogtag}{sp(r.msg)}{msg}\n")


def render_cee(r: ParsedRow) -> str:
    return (f'{{"ts":"{fmt_rfc3339(r.ts_reported)}","host":"{jesc(r.hostname)}",'
            f'"tag":"{jesc(r.syslogtag)}","role":"{jesc(r.role)}",'
            f'"cee":{r.cee_json}}}')


# ---- the canonical ruleset ------------------------------------------------


@dataclass
class OracleResult:
    rows: list[ParsedRow] = field(default_factory=list)
    dropped_empty: int = 0
    discarded: int = 0
    sinks: dict = field(default_factory=lambda: {"errors": [], "files": [], "cee": []})
    fac_sev: Counter = field(default_factory=Counter)
    conv: dict = field(default_factory=dict)

    def sink_keys(self, name) -> set:
        return {(r.conv_id, r.turn_idx) for r, _ in self.sinks[name]}

    def sink_rendered_sorted(self, name) -> list[str]:
        return [t for _, t in sorted(self.sinks[name],
                                     key=lambda x: (x[0].conv_id, x[0].turn_idx))]


def run_oracle(table) -> OracleResult:
    """table: pyarrow Table of transcripts. Single-threaded reference run."""
    res = OracleResult()
    cols = [table.column(c).to_pylist()
            for c in ["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
    for conv_id, turn_idx, role, text, tool, ts in zip(*cols):
        r = parse_row(conv_id, turn_idx, role, text, tool, ts)
        if r is None:
            res.dropped_empty += 1
            continue
        res.rows.append(r)
        # ruleset order: discard(stop) → errors → files → cee
        if r.severity == 7 and r.role == "system":
            res.discarded += 1
            continue
        if r.severity <= 3:
            res.sinks["errors"].append((r, render_forward(r)))
        if "msgnum:" in r.msg and 16 <= r.facility <= 23:
            res.sinks["files"].append((r, render_file(r)))
        if r.is_cee and r.cee_parsesuccess:
            res.sinks["cee"].append((r, render_cee(r)))
        # aggregates (post-parse, pre-discard rows are out; alive rows only)
        res.fac_sev[(r.facility, r.severity)] += 1
    # per-conv rollup over ALL parsed rows (incl. discarded)
    for r in res.rows:
        c = res.conv.setdefault(r.conv_id, {"n_turns": 0, "n_parsed_ok": 0,
                                            "first_ts": r.ts, "last_ts": r.ts})
        c["n_turns"] += 1
        c["n_parsed_ok"] += int(r.parse_success)
        c["first_ts"] = min(c["first_ts"], r.ts)
        c["last_ts"] = max(c["last_ts"], r.ts)
    return res
