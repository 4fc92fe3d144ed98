"""Vectorized sanitize + parser-chain cascade (mask-cascaded extraction).

Reference semantics reimplemented Ray-Data-first:

- SanitizeMsg  (runtime/parser.c:380-430): strip trailing LF/CR/NUL, escape
  interior control chars to '#ooo' octal, truncate to MAX_LINE (8096).
  Empty-after-sanitize rows are *dropped* (RS_RET_EMPTY_MSG,
  runtime/parser.c:628) but counted.
- ParsePRI     (runtime/parser.c:577-609): '<NNN>' prefix, 0<=pri<=191;
  malformed/absent → DEFUPRI 13 (facility 1 'user', severity 5 'notice')
  and the PRI prefix stays part of the message.
- pmrfc5424    (tools/pmrfc5424.c:60-180): '1 TS HOST APP PROCID MSGID SD
  [MSG]', SP-delimited, '-' = nil (kept as literal '-'), SD bracket-balanced
  with \\] escapes.
- pmrfc3164    (tools/pmrfc3164.c:175-360): RFC3164 or RFC3339 timestamp
  (one leading space tolerated — HP-procurve), charset-validated HOSTNAME,
  colon-terminated TAG, remainder = MSG (leading space preserved);
  '{'/'[' after spaces ⇒ headerless JSON (msg = whole rest).
- fallback: neither matched → parse_success=false, msg = rest-after-PRI.

The chain (runtime/parser.c:618-695 'first parser wins') becomes one
`map_batches` pass: both RE2 extractions run over the full column and
per-field `pc.if_else` selects by branch mask — no per-row Python.

All regex patterns are RE2 and shared verbatim with the DuckDB oracle SQL
(__ray_entry__.oracle_sql), so engine and oracle cannot drift.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import parse_rfc3339, parse_rfc3164_ts

MAX_LINE = 8096  # runtime/glbl.c:100 iMaxLine default
DEF_PRI = 13  # DEFUPRI: facility 1 (user), severity 5 (notice)

PRI_RE = r"^<(?P<pri>\d{1,3})>(?P<rest>[\s\S]*)$"

RFC5424_RE = (
    # the reference's pmrfc5424 IGNORES a structured-data parse failure
    # (parseRFCStructuredData's return value is unchecked,
    # pmrfc5424.c:287): a non-'-'/non-'[' token does not fail the
    # parser — SD stays unset and the remainder (including that token)
    # becomes MSG. The second alternation branch is that lenient path.
    # (Not replicated: the reference then sets SD from a STALE buffer
    # still holding MSGID — we set SD empty instead.)
    r"^1 (?P<t5424>\S+) (?P<host5424>\S+) (?P<app5424>\S+) "
    r"(?P<procid5424>\S+) (?P<msgid5424>\S+) "
    r"(?:(?P<sd5424>-|(?:\[(?:[^\]\\]|\\[\s\S])*\])+)"
    r"(?: (?P<msg5424>[\s\S]*))?"
    r"|(?P<msgbad5424>[\s\S]*))$"
)

RFC3164_RE = (
    r"^ ?(?:(?P<t3339>\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?"
    r"(?:Z|[+-]\d{2}:\d{2})?)|"
    r"(?P<mon3164>[A-Z][a-z]{2}) (?P<day3164>[ 0-3]?\d) "
    r"(?P<hms3164>\d{2}:\d{2}:\d{2})) "
    r"(?P<host3164>[A-Za-z0-9._-]+)"
    # the TAG/MSG split happens OUTSIDE the regex — _split_tag3164
    # implements the reference scan loop (pmrfc3164.c:341-366)
    r"(?: (?P<body3164>[\s\S]*))?$"
)

HEADERLESS_RE = r"^ *[\[{]"

#: classic TAG bound kept from RFC3164 (the reference dropped it in
#: 2008 in favor of CONF_TAG_MAXSIZE=512 — documented subset)
TAG_MAX = 32


def _split_tag3164(body):
    """The reference TAG scan (tools/pmrfc3164.c:341-366) vectorized:
    copy chars until ':' or SP — a ':' terminator is PART of the tag
    (stored verbatim), a SP is NOT (it stays in MSG), and a first word
    that runs to end-of-line is entirely TAG. Longer-than-TAG_MAX first
    words yield no tag (subset bound). Returns (tag, msg) where tag is
    the verbatim TAG (incl. its colon when colon-terminated) and
    appname derives from it by stripping that colon. All offsets are
    BYTE positions at ASCII delimiters, so slicing is UTF-8 safe."""
    b = pc.cast(body, pa.binary())
    ic = pc.find_substring(b, b":")
    isp = pc.find_substring(b, b" ")
    blen = pc.binary_length(b)
    no_c = pc.equal(ic, -1)
    no_sp = pc.equal(isp, -1)
    colon_first = pc.and_(pc.not_equal(ic, -1),
                          pc.or_(no_sp, pc.less(ic, isp)))
    colon_ok = pc.and_(colon_first, pc.less_equal(ic, TAG_MAX))
    space_first = pc.and_(pc.not_equal(isp, -1),
                          pc.or_(no_c, pc.less(isp, ic)))
    space_ok = pc.and_(space_first, pc.less_equal(isp, TAG_MAX))
    whole_ok = pc.and_(pc.and_(no_c, no_sp),
                       pc.and_(pc.greater(blen, 0),
                               pc.less_equal(blen, TAG_MAX)))
    zero = pa.scalar(0, pa.int64())
    cut = pc.if_else(                     # tag byte length per row
        colon_ok, pc.add(pc.cast(ic, pa.int64()), 1),
        pc.if_else(space_ok, pc.cast(isp, pa.int64()),
                   pc.if_else(whole_ok, pc.cast(blen, pa.int64()),
                              zero))).to_numpy(zero_copy_only=False)
    # per-row variable slicing: Arrow slice kernels take scalar bounds
    # only, so gather the bytes with numpy (one fancy-index per side)
    if isinstance(b, pa.ChunkedArray):
        b = b.combine_chunks()
    n = len(b)
    bufs = b.buffers()                   # [validity, offsets, data]
    offs = np.frombuffer(bufs[1], np.int32)[
        b.offset:b.offset + n + 1].astype(np.int64)
    data = np.frombuffer(bufs[2] or b"", np.uint8)
    starts = offs[:-1]
    rowlen = np.diff(offs)
    cut = np.minimum(cut, rowlen)

    def _gather(seg_start, seg_len):
        total = int(seg_len.sum())
        base = np.repeat(seg_start, seg_len)
        local = (np.arange(total, dtype=np.int64)
                 - np.repeat(np.concatenate(([0],
                             np.cumsum(seg_len)))[:-1], seg_len))
        new_offs = np.concatenate(([0], np.cumsum(seg_len)))
        return pa.StringArray.from_buffers(
            n, pa.py_buffer(new_offs.astype(np.int32).tobytes()),
            pa.py_buffer(data[base + local].tobytes()))

    tag = _gather(starts, cut)
    msg = _gather(starts + cut, rowlen - cut)
    return tag, msg

CEE_COOKIE = "@cee:"  # plugins/mmjsonparse/mmjsonparse.c:122

_CTRL_RE = re.compile(r"[\x00-\x1f]")
_CTRL_DETECT = r"[\x00-\x1f]"


def _escape_ctl(s: str) -> str:
    """Interior control chars → '#ooo' octal (parser.c SanitizeMsg default)."""
    return _CTRL_RE.sub(lambda m: "#%03o" % ord(m.group()), s)


def sanitize(text: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, pa.Array]:
    """Returns (sanitized, keep_mask). keep=False ⇔ empty after sanitize."""
    s = pc.cast(text, pa.large_string())
    s = pc.fill_null(s, "")
    # strip trailing LF / CR / NUL (repeatedly)
    s = pc.replace_substring_regex(s, pattern=r"[\n\r\x00]+$", replacement="")
    s = pc.utf8_slice_codeunits(s, 0, MAX_LINE)
    # escape interior control chars — only rows that have any (small subset)
    has_ctl = pc.match_substring_regex(s, pattern=_CTRL_DETECT)
    n_ctl = pc.sum(has_ctl).as_py() or 0
    if n_ctl:
        np_mask = has_ctl.to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(np_mask)
        py = s.take(pa.array(idx)).to_pylist()
        fixed = [_escape_ctl(v) for v in py]
        np_all = s.to_numpy(zero_copy_only=False).astype(object)
        np_all[idx] = fixed
        s = pa.array(np_all, type=pa.large_string())
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    keep = pc.greater(pc.utf8_length(s), 0)
    return s, keep


def _f(struct_arr, name):
    return pc.struct_field(struct_arr, name)


def _nz(arr, fill=""):
    return pc.fill_null(arr, fill)


def parse_table(batch: pa.Table, text_col: str = "text",
                ts_col: str = "ts") -> pa.Table:
    """The full sanitize→PRI→cascade parse of one Arrow batch.

    Appends columns:
      pri:int32 facility:int32 severity:int32 protocol:int32
      parse_success:bool hostname,tag,appname,procid,msgid,
      structured_data:string msg:large_string ts_reported:timestamp[us]
      is_cee:bool
    Drops empty-after-sanitize rows; the caller reads the dropped count from
    len(in) - len(out) (metrics stage records it).
    """
    san, keep = sanitize(batch[text_col])
    batch = batch.set_column(
        batch.schema.get_field_index(text_col), text_col, san
    ).filter(keep)
    if batch.num_rows == 0:
        return _empty_with_schema(batch)
    text = batch[text_col].combine_chunks() if isinstance(batch[text_col], pa.ChunkedArray) else batch[text_col]

    # --- PRI ---------------------------------------------------------------
    prim = pc.extract_regex(text, pattern=PRI_RE)
    pri_raw = pc.cast(_f(prim, "pri"), pa.int32())
    pri_ok = pc.fill_null(pc.less_equal(pri_raw, 191), False)
    pri = pc.if_else(pri_ok, _nz(pri_raw, DEF_PRI), DEF_PRI)
    rest = pc.if_else(pri_ok, _nz(_f(prim, "rest")), pc.cast(text, pa.string()))

    # --- RFC5424 -----------------------------------------------------------
    m5 = pc.extract_regex(rest, pattern=RFC5424_RE)
    is5424 = pc.is_valid(_f(m5, "t5424"))

    # --- RFC3164 (incl. RFC3339-date variant) ------------------------------
    m3 = pc.extract_regex(rest, pattern=RFC3164_RE)
    has3339 = pc.fill_null(pc.not_equal(_nz(_f(m3, "t3339")), ""), False)
    is3164 = pc.and_(pc.is_valid(_f(m3, "host3164")), pc.invert(is5424))

    # --- headerless JSON ---------------------------------------------------
    is_hdrless = pc.and_(
        pc.match_substring_regex(rest, pattern=HEADERLESS_RE),
        pc.invert(pc.or_(is5424, is3164)),
    )

    parse_success = pc.or_(pc.or_(is5424, is3164), is_hdrless)
    protocol = pc.if_else(
        is5424, pa.scalar(1, pa.int32()),
        pc.if_else(parse_success, pa.scalar(0, pa.int32()),
                   pa.scalar(-1, pa.int32())))

    # --- fields by branch --------------------------------------------------
    empty = pa.scalar("", pa.string())
    hostname = pc.if_else(is5424, _nz(_f(m5, "host5424")),
                          pc.if_else(is3164, _nz(_f(m3, "host3164")), empty))
    tag3164, msg3164 = _split_tag3164(_nz(_f(m3, "body3164")))
    tag = pc.if_else(is3164, tag3164, empty)
    # APP-NAME from TAG: the trailing colon is not part of the name
    # (msg.c getAPPNAME truncates at ':'/'['); TAG itself stays verbatim
    appname3164 = pc.if_else(
        pc.ends_with(tag3164, pattern=":"),
        pc.utf8_replace_slice(tag3164, start=-1, stop=2**30,
                              replacement=""),
        tag3164)
    appname = pc.if_else(is5424, _nz(_f(m5, "app5424")),
                         pc.if_else(is3164, appname3164, empty))
    procid = pc.if_else(is5424, _nz(_f(m5, "procid5424")), empty)
    msgid = pc.if_else(is5424, _nz(_f(m5, "msgid5424")), empty)
    sd = pc.if_else(is5424, _nz(_f(m5, "sd5424")), empty)

    # non-participating RE2 groups extract as EMPTY strings (not null),
    # so the strict/lenient branch choice keys off sd5424 — the strict
    # branch always captured '-' or '[...]' there
    msg5424 = pc.if_else(
        pc.equal(_nz(_f(m5, "sd5424")), ""),
        _nz(_f(m5, "msgbad5424")), _nz(_f(m5, "msg5424")))
    msg = pc.if_else(
        is5424, msg5424,
        pc.if_else(is3164, msg3164, rest))

    # --- reported timestamp ------------------------------------------------
    # ts_col = timegenerated (ingestion time). Raw file sources
    # (sources/files.read_syslog_text) carry no ingestion timestamp; the
    # reference would stamp wall-clock `now` there, which a deterministic
    # engine cannot — unparseable-timestamp rows then keep a null
    # ts_reported instead (documented deviation).
    if ts_col in batch.column_names:
        ts_rcvd = batch[ts_col].combine_chunks() if isinstance(batch[ts_col], pa.ChunkedArray) else batch[ts_col]
        ts_rcvd = pc.cast(ts_rcvd, pa.timestamp("us"))
    else:
        ts_rcvd = pa.nulls(batch.num_rows, pa.timestamp("us"))
    t5 = parse_rfc3339(pc.if_else(is5424, _nz(_f(m5, "t5424"), "-"), "-"))
    t3339 = parse_rfc3339(pc.if_else(has3339, _nz(_f(m3, "t3339")), ""))
    t3164 = parse_rfc3164_ts(_nz(_f(m3, "mon3164"), "Jan"),
                             _nz(_f(m3, "day3164"), "1"),
                             _nz(_f(m3, "hms3164"), "00:00:00"))
    ts_reported = pc.if_else(
        is5424, pc.fill_null(t5, pa.scalar(None, pa.timestamp("us"))),
        pc.if_else(pc.and_(is3164, has3339), t3339,
                   pc.if_else(is3164, t3164,
                              pa.scalar(None, pa.timestamp("us")))))
    ts_reported = pc.coalesce(ts_reported, ts_rcvd)

    # --- CEE cookie --------------------------------------------------------
    msg_l = pc.utf8_ltrim_whitespace(msg)
    is_cee = pc.starts_with(msg_l, pattern=CEE_COOKIE)

    out = batch
    for name, col in [
        ("pri", pri),
        ("facility", pc.cast(pc.divide(pri, 8), pa.int32())),
        ("severity", pc.cast(pc.bit_wise_and(pri, 7), pa.int32())),
        ("protocol", protocol),
        ("parse_success", parse_success),
        ("hostname", hostname),
        ("tag", tag),
        ("appname", appname),
        ("procid", procid),
        ("msgid", msgid),
        ("structured_data", sd),
        ("msg", pc.cast(msg, pa.large_string())),
        ("ts_reported", ts_reported),
        ("is_cee", is_cee),
    ]:
        out = out.append_column(name, col)
    return out


PMLASTMSG_RE = r"^\s*last message repeated (?P<n>\d+) times\s*$"


def detect_repeat_markers(batch: pa.Table, col: str = "msg") -> pa.Table:
    """pmlastmsg (plugins/pmlastmsg): recognize 'last message repeated n
    times' suppression markers so they parse into typed fields instead of
    falling through the chain. Appends is_repeat_marker:bool and
    repeat_count:int64 (0 for non-markers). The emitting side of the same
    protocol is ratelimit.suppress_repeats."""
    m = pc.extract_regex(pc.cast(batch[col], pa.string()),
                         pattern=PMLASTMSG_RE)
    n = pc.struct_field(m, "n")
    return (batch
            .append_column("is_repeat_marker", pc.is_valid(n))
            .append_column("repeat_count",
                           pc.cast(pc.fill_null(n, "0"), pa.int64())))


PARSED_FIELDS: dict[str, pa.DataType] = {
    "pri": pa.int32(), "facility": pa.int32(), "severity": pa.int32(),
    "protocol": pa.int32(), "parse_success": pa.bool_(),
    "hostname": pa.string(), "tag": pa.string(), "appname": pa.string(),
    "procid": pa.string(), "msgid": pa.string(),
    "structured_data": pa.string(), "msg": pa.large_string(),
    "ts_reported": pa.timestamp("us"), "is_cee": pa.bool_(),
}


def _empty_with_schema(batch: pa.Table) -> pa.Table:
    out = batch
    for name, typ in PARSED_FIELDS.items():
        out = out.append_column(name, pa.array([], type=typ))
    return out


def parse_dataset(ds, text_col: str = "text", ts_col: str = "ts",
                  batch_size: int = 32768):
    """Dataset-level parse stage: stateless map_batches, zero-copy Arrow."""
    return ds.map_batches(
        lambda t: parse_table(t, text_col, ts_col),
        batch_format="pyarrow", batch_size=batch_size,
    )


# ---------------------------------------------------------------------------
# pmciscoios — CISCO IOS "syslog" format (plugins/pmciscoios/pmciscoios.c)
# ---------------------------------------------------------------------------

def _ciscoios_regex(present_origin: bool, present_xr: bool) -> str:
    """Anchored RE mirroring pmciscoios.c:144-258 field by field:
    [<PRI>] SEQNO ': ' [ORIGIN ': '] [XR ':'] ['*'|'.'] TIMESTAMP3164
    [.frac] [' ' TZWORD] ': ' [XR-junk] '%'TAG(':'|' ')-terminated ': ' MSG.
    SEQNO may be empty (the C digit loop admits zero digits); ORIGIN is
    the shortest scan to the first ': ' (admits IPv6 like '::1'); TAG
    stops at ':' or ' ' and must be followed by ': '."""
    parts = [r"^(?:<(?P<pri>\d{1,3})>)?(?P<seq>\d*): "]
    if present_origin:
        parts.append(r"(?P<origin>.*?): ")
    if present_xr:
        parts.append(r"[^:]*:")
    parts.append(r"[*.]?(?P<mon>[A-Z][a-z]{2}) +(?P<day>[0-3]?\d) "
                 r"(?P<hms>\d{2}:\d{2}:\d{2})(?:\.(?P<frac>\d{1,6}))?"
                 r"(?: (?P<tz>[A-Za-z]{1,5}))?")
    if present_xr:
        # XR: anything up to the '%' tag start (pmciscoios.c:223-234
        # scans forward to '%'; the ': ' check is skipped in this mode)
        parts.append(r"[^%]*")
    else:
        parts.append(r": ")
    parts.append(r"(?P<tag>%[^: ]*):(?P<msg> .*)$")
    return "".join(parts)


def parse_ciscoios_table(batch: pa.Table, col: str = "text",
                         present_origin: bool = False,
                         present_xr: bool = False,
                         year: int = 2024) -> pa.Table:
    """Vendor parser branch (plugins/pmciscoios): one vectorized
    extract_regex pass per batch. Faithful details: empty SEQNO → 0; the
    TAG column keeps the leading '%' and gains a trailing ':'
    (MsgSetTAG appends it, pmciscoios.c:255-257); MSG keeps the leading
    space (the C code advances past ':' only). Deviations (documented):
    no-PRI rows default pri=13 like the chain's ParsePRI fallback; a
    trailing TZ word is accepted but treated as naive local time; the
    missing RFC3164 year pins to the fixture year."""
    from ..functions import parse_rfc3164_ts
    src = batch[col]
    src = src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src
    s = pc.fill_null(pc.cast(src, pa.large_string()), "")
    st = pc.extract_regex(pc.cast(s, pa.string()),
                          pattern=_ciscoios_regex(present_origin,
                                                  present_xr))
    ok = pc.is_valid(st)
    pri = pc.cast(pc.fill_null(
        pc.if_else(pc.equal(_nz(_f(st, "pri")), ""), None, _f(st, "pri")),
        "13"), pa.int64())
    pri = pc.if_else(pc.greater(pri, 191), 13, pri)   # ParsePRI invalid→13
    seq = pc.cast(pc.if_else(pc.equal(_nz(_f(st, "seq")), ""),
                             pa.scalar("0"), _nz(_f(st, "seq"))), pa.int64())
    ts = parse_rfc3164_ts(_f(st, "mon"), _f(st, "day"), _f(st, "hms"),
                          year=year)
    frac = pc.utf8_rpad(_nz(_f(st, "frac"), "0"), 6, "0")
    ts = pc.cast(pc.add(pc.cast(ts, pa.int64()),
                        pc.cast(frac, pa.int64())), pa.timestamp("us"))
    out = {
        "seqno": pc.if_else(ok, seq, pa.scalar(None, pa.int64())),
        "pri": pc.if_else(ok, pri, pa.scalar(None, pa.int64())),
        "ts_reported": pc.if_else(ok, ts, pa.scalar(None,
                                                    pa.timestamp("us"))),
        "syslogtag": pc.if_else(ok, pc.binary_join_element_wise(
            _nz(_f(st, "tag")), pa.scalar(":"), ""),
            pa.scalar(None, pa.string())),
        "msg": _f(st, "msg"),
        "parse_success": ok,
    }
    if present_origin:
        out["origin"] = _f(st, "origin")
    res = batch
    for name, arr in out.items():
        res = res.append_column(name, arr)
    return res


# ---------------------------------------------------------------------------
# contrib "message fixer" parsers — pmaixforwardedfrom / pmcisconames /
# pmsnare. In the reference each rewrites pszRawMsg IN PLACE and then
# returns RS_RET_COULD_NOT_PARSE so the chain continues with the repaired
# text (contrib/*/..c). Here each is a vectorized text→text kernel meant
# to run ahead of the RFC3164/5424 cascade; unmatched rows pass through
# untouched, exactly like the C abort paths.
# ---------------------------------------------------------------------------

_PRI_RE = r"(?P<pri><\d{1,3}>)?"


def _fix_apply(batch: pa.Table, col: str, new_text) -> pa.Table:
    idx = batch.schema.get_field_index(col)
    return batch.set_column(idx, col, pa.array(new_text, pa.string()))


def fix_aixforwardedfrom_table(batch: pa.Table,
                               col: str = "text") -> pa.Table:
    """pmaixforwardedfrom (contrib/pmaixforwardedfrom/pmaixforwardedfrom.c
    :69-146): after PRI and any leading spaces, a ≥24-char body whose
    16-char timestamp is followed by 'Message forwarded from ' (23) or
    'From ' (5, both case-insensitive) has that preamble spliced out;
    then, faithful to the C order of operations, the trailing ':' after
    the forwarded hostname is removed ONLY when the first delimiter hit
    is ':' (a space first leaves the preamble-stripped text as is —
    the C code mutates before the colon check and keeps the mutation on
    abort, .c:134-137)."""
    import pandas as pd
    s = pd.Series(pc.fill_null(pc.cast(
        batch[col], pa.string()), "").to_pandas())
    m = s.str.extract(
        r"(?s)^(?P<pri><\d{1,3}>)?(?P<sp> *)(?P<body>.*)$")
    body = m["body"].fillna("")
    pre = m["pri"].fillna("") + m["sp"].fillna("")
    ts, rest = body.str.slice(0, 16), body.str.slice(16)
    op = rest.str.extract(
        r"(?s)^(?i:Message\ forwarded\ from\ )(?P<r23>.{2,})$")["r23"]
    op5 = rest.str.extract(r"(?s)^(?i:From\ )(?P<r5>.{2,})$")["r5"]
    # C checks OpeningText before OpeningText2; both matching is
    # impossible ('Message…' ≠ 'From ') so precedence is moot
    rem = op.where(op.notna(), op5)
    eligible = (body.str.len() >= 24) & rem.notna()
    rem = rem.fillna("")
    # colon removal: first [ :] delimiter must be ':'
    colon = rem.str.extract(r"(?s)^(?P<h>[^ :]*):(?P<t>.*)$")
    fixed_rem = (colon["h"] + colon["t"]).where(colon["h"].notna(), rem)
    out = (pre + ts + fixed_rem).where(eligible, s)
    return _fix_apply(batch, col, out.to_numpy(object))


_CISCONAMES_TS = (r"(?:.{3} .{2} .{2}:.{2}:.{2} |"
                  r".{3} .{2} .{4} .{2}:.{2}:.{2} )")


def fix_cisconames_table(batch: pa.Table, col: str = "text") -> pa.Table:
    """pmcisconames (contrib/pmcisconames/pmcisconames.c:72-147): after
    PRI + optional spaces, a ≥34-char body starting with the 16- or
    21-char positional timestamp (spaces/colons checked at fixed
    offsets only), then hostname up to a space, then ': %' — the ': '
    is spliced out so 'host : %ASA…' becomes 'host %ASA…'."""
    import pandas as pd
    s = pd.Series(pc.fill_null(pc.cast(
        batch[col], pa.string()), "").to_pandas())
    m = s.str.extract(
        r"(?s)^(?P<pri><\d{1,3}>)?(?P<sp> *)(?P<body>.*)$")
    body = m["body"].fillna("")
    pre = m["pri"].fillna("") + m["sp"].fillna("")
    g = body.str.extract(
        r"(?s)^(?P<ts>" + _CISCONAMES_TS + r")(?P<host>[^ ]*) : (?P<msg>%.*)$")
    eligible = (body.str.len() >= 34) & g["ts"].notna()
    out = (pre + g["ts"].fillna("") + g["host"].fillna("") + " "
           + g["msg"].fillna("")).where(eligible, s)
    return _fix_apply(batch, col, out.to_numpy(object))


_SNARE_TAG = r"(?i:MSWinEventLog|LinuxKAudit)"


def fix_snare_table(batch: pa.Table, col: str = "text") -> pa.Table:
    """pmsnare (contrib/pmsnare/pmsnare.c:147-261, tabLength=1 literal
    tab): two shapes, both ≥30 chars after PRI —
    * non-syslog Snare 'host<TAB>MSWinEventLog<TAB>…': the tab before
      AND the separator right after the tag become spaces;
    * syslog Snare '16-char ts + hostname SP MSWinEventLog<TAB>…': only
      the separator after the tag becomes a space.
    A tab-first line whose tag is NOT a Snare tag aborts without trying
    the syslog shape (.c:186), and the char after the tag is overwritten
    with a space whatever it is (.c:242), both mirrored here."""
    import pandas as pd
    s = pd.Series(pc.fill_null(pc.cast(
        batch[col], pa.string()), "").to_pandas())
    m = s.str.extract(r"(?s)^(?P<pri><\d{1,3}>)?(?P<body>.*)$")
    body = m["body"].fillna("")
    pre = m["pri"].fillna("")
    long_enough = body.str.len() >= 30
    tab_first = body.str.match(r"[^ \t]*\t", na=False)
    a = body.str.extract(
        r"(?s)^(?P<h>[^ \t]*)\t(?P<tag>" + _SNARE_TAG
        + r")(?P<sep>.)(?P<rest>.*)$")
    a_ok = long_enough & tab_first & a["tag"].notna()
    a_out = (pre + a["h"].fillna("") + " " + a["tag"].fillna("") + " "
             + a["rest"].fillna(""))
    b = body.str.extract(
        r"(?s)^(?P<ts>.{16})(?P<h>[^ ]*) (?P<tag>" + _SNARE_TAG
        + r")(?P<sep>.)(?P<rest>.*)$")
    b_ok = long_enough & ~tab_first & b["tag"].notna()
    b_out = (pre + b["ts"].fillna("") + b["h"].fillna("") + " "
             + b["tag"].fillna("") + " " + b["rest"].fillna(""))
    out = s.where(~a_ok, a_out).where(~b_ok, b_out)
    return _fix_apply(batch, col, out.to_numpy(object))


_PAN_HEAD_RE = re.compile(
    r"^[^,]*,[^,]*,[^,]*,(?:TRAFFIC,|THREAT,|SYSTEM,|CONFIG,)")
_PAN_QUOTED_RE = re.compile(r'"((?:[^"]|"")*)"')


def fix_panngfw_table(batch: pa.Table, col: str = "text") -> pa.Table:
    """pmpanngfw (contrib/pmpanngfw/pmpanngfw.c:101-259): Palo Alto NGFW
    CSV → TAB repair. A row qualifies when, after the PRI, the 4th
    comma-field starts with TRAFFIC, / THREAT, / SYSTEM, / CONFIG, (the
    C code compares the 8 bytes after the 3rd comma against masked
    little-endian constants, .c:62-66 — i.e. exactly these prefixes).
    The first 3 commas become TABs and the remainder is re-tokenized as
    RFC-4180 CSV: ',' separators → TAB, quotes stripped, '""' → '"'.

    Deviations (documented): on a martian char after a closing quote the
    C code aborts mid-rewrite and keeps the half-mangled buffer
    (.c:235-238); here the row is left untouched instead, and an
    unterminated quote (which the C loop silently accepts, writing the
    partial field) also leaves the row untouched. The un-quoting
    state machine is inherently sequential, so it runs per MATCHED row
    only — the vectorized prefilter keeps non-PAN rows (the common case)
    out of the Python loop."""
    src = pc.fill_null(pc.cast(batch[col], pa.string()), "").to_pylist()
    out = list(src)
    for i, s in enumerate(src):
        pri = re.match(r"^<\d{1,3}>", s)
        off = pri.end() if pri else 0
        body = s[off:]
        if not _PAN_HEAD_RE.match(body):
            continue
        a = body.index(",")
        b = body.index(",", a + 1)
        c = body.index(",", b + 1)
        head = body[:a] + "\t" + body[a + 1:b] + "\t" + body[b + 1:c] + "\t"
        tail = body[c + 1:]
        fields, pos, ok, ln = [], 0, True, len(tail)
        while True:
            if pos < ln and tail[pos] == '"':
                m = _PAN_QUOTED_RE.match(tail, pos)
                if m is None:           # unterminated quote
                    ok = False
                    break
                fields.append(m.group(1).replace('""', '"'))
                pos = m.end()
                if pos == ln:
                    break
                if tail[pos] != ",":
                    ok = False          # martian char → leave untouched
                    break
                pos += 1
            else:
                nxt = tail.find(",", pos)
                if nxt == -1:
                    fields.append(tail[pos:])
                    break
                fields.append(tail[pos:nxt])
                pos = nxt + 1
        if ok:
            out[i] = s[:off] + head + "\t".join(fields)
    return _fix_apply(batch, col, np.asarray(out, dtype=object))


def _strptime_to_regex(fmt: str) -> str:
    """Translate the strptime subset pmdb2diag uses into a capturing
    regex (groups y mo d h mi s)."""
    mapping = {"%Y": r"(?P<y>\d{4})", "%m": r"(?P<mo>\d{2})",
               "%d": r"(?P<d>\d{2})", "%H": r"(?P<h>\d{2})",
               "%M": r"(?P<mi>\d{2})", "%S": r"(?P<s>\d{2})"}
    out, i = [], 0
    while i < len(fmt):
        tok = fmt[i:i + 2]
        if tok in mapping:
            out.append(mapping[tok])
            i += 2
        else:
            out.append(re.escape(fmt[i]))
            i += 1
    return "".join(out)


#: level first-char → (severity, level word length) — pmdb2diag.c:103-134;
#: 'E' resolves by 2nd char: 'r'→ERR(3) else NOTICE(5) (Error vs Event)
_DB2_LEVELS = {"C": (0, 8), "A": (1, 5), "S": (2, 6), "W": (4, 7),
               "I": (6, 4), "D": (7, 5)}


def parse_db2diag_table(batch: pa.Table, col: str = "text",
                        levelpos: int = 59, timepos: int = 0,
                        timeformat: str = "%Y-%m-%d-%H.%M.%S.",
                        pid_to_prog_shift: int = 49) -> pa.Table:
    """pmdb2diag (contrib/pmdb2diag/pmdb2diag.c:84-211): positional DB2
    diagnostic-log parser. Appends best-effort columns —
      db2_severity   level word's FIRST char only (2nd for Error/Event),
                     .c:103-134; null when the char is no known level
      db2_ts         strptime(timeformat) at `timepos` + fraction digits
                     + '[+-]MIN' minute offset, normalized to UTC
                     microseconds; null when the format doesn't match
                     (the C keeps the ingest time then)
      db2_procid     text after the first ': ' following the level word
                     up to the next space
      db2_appname    text at pid_start + pid_to_prog_shift up to the
                     first space or backslash
      db2_success    message long enough for the level probe
                     (.c:94 length gate; the C returns OK even when
                     level/pid extraction bails — fields stay null)
    Faithful quirk: the pid search starts at RAW offset levelpos+lvl_len
    WITHOUT re-adding the PRI length (.c:177 uses pszRawMsg, not
    pszRawMsg+offAfterPRI) — visible only on messages with a PRI."""
    import pandas as pd
    raw = pd.Series(pc.fill_null(pc.cast(
        batch[col], pa.string()), "").to_pandas())
    m = raw.str.extract(r"(?s)^(?P<pri><\d{1,3}>)?(?P<body>.*)$")
    body = m["body"].fillna("")
    ok_len = body.str.len() >= levelpos + 4

    lvl1 = body.str.slice(levelpos, levelpos + 1)
    lvl2 = body.str.slice(levelpos + 1, levelpos + 2)
    sev = pd.Series(np.full(len(raw), np.nan))
    lvl_len = pd.Series(np.zeros(len(raw), dtype=np.int64))
    for ch, (s_, ln_) in _DB2_LEVELS.items():
        hit = ok_len & (lvl1 == ch)
        sev = sev.mask(hit, s_)
        lvl_len = lvl_len.mask(hit, ln_)
    e_err = ok_len & (lvl1 == "E") & (lvl2 == "r")
    e_evt = ok_len & (lvl1 == "E") & (lvl2 != "r")
    sev = sev.mask(e_err, 3).mask(e_evt, 5)
    lvl_len = lvl_len.mask(e_err | e_evt, 5)
    lvl_ok = ok_len & (body.str.len() >= levelpos + lvl_len) & sev.notna()

    # timestamp at timepos
    ts_re = ("(?s)^" + _strptime_to_regex(timeformat)
             + r"(?P<frac>\d*)(?:(?P<sign>[+-])(?P<tz>\d+))?")
    t = body.str.slice(timepos).str.extract(ts_re)
    t_ok = t["y"].notna()
    frac = t["frac"].fillna("").str.slice(0, 6)
    frac_us = (frac + "000000").str.slice(0, 6)
    frac_us = pd.to_numeric(frac_us.where(t_ok, "0"),
                            errors="coerce").fillna(0)
    base = pd.to_datetime(
        t["y"] + "-" + t["mo"] + "-" + t["d"] + " " + t["h"] + ":"
        + t["mi"] + ":" + t["s"], errors="coerce", format="%Y-%m-%d %H:%M:%S")
    tz_min = pd.to_numeric(t["tz"], errors="coerce").fillna(0)
    tz_sign = t["sign"].fillna("+").map({"+": 1, "-": -1})
    # local = UTC + signed offset → UTC = local - signed offset
    ts_vals = np.full(len(raw), np.datetime64("NaT", "us"))
    okt = (t_ok & base.notna()).to_numpy()
    if okt.any():
        b_us = base[okt].astype("datetime64[us]").to_numpy()
        off_us = (tz_sign[okt] * tz_min[okt] * 60_000_000).to_numpy(
            np.int64)
        f_us = frac_us[okt].to_numpy(np.int64)
        # frac captured as left-padded µs digits already (rpad to 6)
        ts_vals[okt] = b_us + f_us.astype("timedelta64[us]") \
            - off_us.astype("timedelta64[us]")

    # pid / prog — from RAW (C quirk), after level word
    start = (levelpos + lvl_len).where(lvl_ok, 0)
    colon = pd.Series([raw.iat[i].find(":", int(start.iat[i]))
                       if lvl_ok.iat[i] else -1
                       for i in range(len(raw))])
    pid_start = colon + 2
    sp = pd.Series([raw.iat[i].find(" ", int(pid_start.iat[i]))
                    if lvl_ok.iat[i] and colon.iat[i] != -1 else -1
                    for i in range(len(raw))])
    pid_ok = lvl_ok & (colon != -1) & (sp != -1)
    procid = pd.Series([
        raw.iat[i][int(pid_start.iat[i]):int(sp.iat[i])]
        if pid_ok.iat[i] else None for i in range(len(raw))])
    prog_start = pid_start + pid_to_prog_shift
    appname = []
    for i in range(len(raw)):
        if not pid_ok.iat[i] or int(prog_start.iat[i]) >= len(raw.iat[i]):
            appname.append(None)
            continue
        seg = raw.iat[i][int(prog_start.iat[i]):]
        esp = seg.find(" ")
        ebs = seg.find("\\")
        if ebs == -1:
            ebs = len(seg)
        end = esp if (esp != -1 and esp < ebs) else ebs
        appname.append(seg[:end])

    return (batch
            .append_column("db2_severity", pa.array(
                [None if np.isnan(v) else int(v) for v in sev],
                pa.int64()))
            .append_column("db2_ts", pa.array(ts_vals,
                                              pa.timestamp("us")))
            .append_column("db2_procid", pa.array(procid, pa.string()))
            .append_column("db2_appname", pa.array(appname, pa.string()))
            .append_column("db2_success", pa.array(
                ok_len.to_numpy(bool))))


def parse_null_table(batch: pa.Table, col: str = "text",
                     tag: str | None = None, syslogfacility: int = 1,
                     syslogseverity: int = 5) -> pa.Table:
    """pmnull (plugins/pmnull/pmnull.c:150-159): no parsing at all — MSG
    is the whole raw message (offset 0, INCLUDING any PRI prefix, which
    is how MsgSetMSGoffs(pMsg, 0) behaves), PRI forced to
    facility*8+severity (defaults 1/5 → 13), TAG set only when
    configured."""
    s = pc.fill_null(pc.cast(batch[col], pa.string()), "")
    pri = syslogfacility * 8 + syslogseverity
    n = batch.num_rows
    out = (batch
           .append_column("pri", pa.array([pri] * n, pa.int64()))
           .append_column("facility", pa.array([syslogfacility] * n,
                                               pa.int64()))
           .append_column("severity", pa.array([syslogseverity] * n,
                                               pa.int64()))
           .append_column("msg", s)
           .append_column("parse_success", pa.array([True] * n)))
    if tag is not None:
        out = out.append_column("tag", pa.array([tag] * n, pa.string()))
    return out
