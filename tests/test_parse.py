"""Engine parse cascade vs the independent row-at-a-time oracle."""

import pyarrow as pa
import pytest

from rsyslog_ray.stages.parse import parse_table
from tests import oracle as O


def _engine_rows(table):
    out = parse_table(table)
    cols = ["conv_id", "turn_idx", "pri", "facility", "severity", "protocol",
            "parse_success", "hostname", "tag", "appname", "procid", "msgid",
            "structured_data", "msg", "ts_reported", "is_cee"]
    return out.select(cols).to_pylist()


def _oracle_rows(table):
    cols = [table.column(c).to_pylist()
            for c in ["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
    rows = []
    for conv_id, turn_idx, role, text, tool, ts in zip(*cols):
        r = O.parse_row(conv_id, turn_idx, role, text, tool, ts)
        if r is None:
            continue
        rows.append({
            "conv_id": r.conv_id, "turn_idx": r.turn_idx, "pri": r.pri,
            "facility": r.facility, "severity": r.severity,
            "protocol": r.protocol, "parse_success": r.parse_success,
            "hostname": r.hostname, "tag": r.tag, "appname": r.appname,
            "procid": r.procid, "msgid": r.msgid,
            "structured_data": r.structured_data, "msg": r.msg,
            "ts_reported": r.ts_reported, "is_cee": r.is_cee,
        })
    return rows


def test_parse_matches_oracle(tiny_table):
    eng = _engine_rows(tiny_table)
    ora = _oracle_rows(tiny_table)
    assert len(eng) == len(ora)
    for e, o in zip(eng, ora):
        for k in o:
            assert e[k] == o[k], (
                f"mismatch at ({o['conv_id']},{o['turn_idx']}) field {k}: "
                f"engine={e[k]!r} oracle={o[k]!r}")


def test_empty_rows_dropped():
    t = pa.table({
        "conv_id": ["c"] * 4, "turn_idx": [0, 1, 2, 3],
        "role": ["user"] * 4,
        "text": ["", "\n", "\x00\n", "<13>Jan  1 00:00:00 h t: x"],
        "tool": [""] * 4,
        "ts": pa.array([0, 1, 2, 3], pa.timestamp("us")),
    })
    out = parse_table(t)
    assert out.num_rows == 1
    assert out["tag"][0].as_py() == "t:"     # verbatim, colon included


@pytest.mark.parametrize("text,pri,proto", [
    ("<0>1 2024-01-01T00:00:00Z h a p m - msg", 0, 1),
    ("<191>1 2024-01-01T00:00:00Z h a p m - msg", 191, 1),
    ("<192>1 2024-01-01T00:00:00Z h a p m - msg", 13, -1),
    ("<999>oops", 13, -1),
    ("<13x>oops", 13, -1),
    ("<>oops", 13, -1),
    ("no pri here", 13, -1),
    ("  {\"j\": 1}", 13, 0),
    ("  [listy]", 13, 0),
    ("<7>Mar  1 01:00:00 172.20.245.8 tag msgnum:00000001:", 7, 0),
])
def test_pri_edges(text, pri, proto):
    t = pa.table({"conv_id": ["c"], "turn_idx": [0], "role": ["user"],
                  "text": [text], "tool": [""],
                  "ts": pa.array([0], pa.timestamp("us"))})
    out = parse_table(t)
    assert out["pri"][0].as_py() == pri
    assert out["protocol"][0].as_py() == proto


def test_imdiag_shape():
    """The injectmsg fixture line (plugins/imdiag/imdiag.c:224)."""
    t = pa.table({"conv_id": ["c"], "turn_idx": [0], "role": ["user"],
                  "text": ["<167>Mar  1 01:00:00 172.20.245.8 tag msgnum:00000000:"],
                  "tool": [""], "ts": pa.array([0], pa.timestamp("us"))})
    out = parse_table(t).to_pylist()[0]
    assert out["facility"] == 20 and out["severity"] == 7
    assert out["hostname"] == "172.20.245.8"
    # the reference TAG scan (pmrfc3164.c:341-366): a SP-terminated
    # first word IS the TAG (SP stays in MSG) — what template-pos-
    # from-to.sh's %msg:9:16:% seq_check relies on
    assert out["tag"] == "tag"
    assert out["msg"] == " msgnum:00000000:"


def test_pmlastmsg_recognizer():
    import pyarrow as pa
    from rsyslog_ray.stages.parse import detect_repeat_markers
    t = pa.table({"msg": pa.array([
        "last message repeated 42 times",
        " last message repeated 7 times ",
        "last message repeated x times",
        "ordinary line",
    ])})
    out = detect_repeat_markers(t)
    assert out["is_repeat_marker"].to_pylist() == [True, True, False, False]
    assert out["repeat_count"].to_pylist() == [42, 7, 0, 0]


# ---------------------------------------------------------------------------
# pmciscoios (plugins/pmciscoios/pmciscoios.c:144-258)
# ---------------------------------------------------------------------------

def test_pmciscoios_default_and_goldens():
    import pyarrow as pa
    from rsyslog_ray.stages.parse import parse_ciscoios_table
    rows = [
        "123: *Mar  1 18:46:11: %SYS-5-CONFIG_I: Configured from console",
        "<189>000456: .Mar 12 03:01:02.123: %LINK-3-UPDOWN: Interface "
        "Gi0/1, changed state to up",
        ": *Jan  5 00:00:01: %X-1-Y: empty seqno is legal",  # 0-digit seq
        "9: Mar  1 18:46:11 UTC: %A-0-B: tz word accepted",
        "no delimiter after seqno",
        "55: *Mar  1 18:46:11: SYS-5-X: tag must start with %",
    ]
    out = parse_ciscoios_table(pa.table({"text": pa.array(rows)}))
    assert out["parse_success"].to_pylist() == [True, True, True, True,
                                                False, False]
    assert out["seqno"].to_pylist()[:4] == [123, 456, 0, 9]
    assert out["pri"].to_pylist()[:2] == [13, 189]   # no-PRI default 13
    # TAG keeps '%' and gains trailing ':' (MsgSetTAG), MSG keeps the
    # leading space (C advances past ':' only)
    assert out["syslogtag"].to_pylist()[0] == "%SYS-5-CONFIG_I:"
    assert out["msg"].to_pylist()[0] == " Configured from console"
    ts = out["ts_reported"].to_pylist()
    assert (ts[1].month, ts[1].day, ts[1].microsecond) == (3, 12, 123000)


def test_pmciscoios_origin_and_registry():
    import pyarrow as pa
    from rsyslog_ray.config import STAGE_REGISTRY
    out = STAGE_REGISTRY["pmciscoios"](
        pa.table({"text": pa.array([
            "77: ::1: *Mar  1 18:46:11: %T-2-U: ipv6 loopback origin",
            "78: router-a.example: *Mar  1 18:46:12: %T-2-V: named origin",
            "79: badorigin *Mar  1 18:46:13: %T-2-W: no ': ' after origin",
        ])}), present_origin=True)
    assert out["origin"].to_pylist()[:2] == ["::1", "router-a.example"]
    assert out["parse_success"].to_pylist() == [True, True, False]


def test_pmciscoios_xr_mode():
    import pyarrow as pa
    from rsyslog_ray.stages.parse import parse_ciscoios_table
    # XR RSP form: 'seq: RSP-node: ts : %TAG : msg' — an extra node field
    # before the timestamp and junk before the '%' (pmciscoios.c:196-209,
    # 223-234: scan to ':' pre-ts, scan to '%' post-ts)
    out = parse_ciscoios_table(pa.table({"text": pa.array([
        "33: RP/0/RSP0/CPU0:Mar  1 18:46:11.001 : "
        "%ROUTING-BGP-5-ADJCHANGE: neighbor up",
    ])}), present_xr=True)
    assert out["parse_success"].to_pylist() == [True]
    assert out["syslogtag"].to_pylist()[0] == "%ROUTING-BGP-5-ADJCHANGE:"


def test_file_sources_text_and_jsonl(ray_session, tmp_path):
    from rsyslog_ray.sources.files import read_jsonl, read_syslog_text
    from rsyslog_ray.stages.parse import parse_dataset
    log = tmp_path / "a.log"
    log.write_text("<13>Jan  5 00:00:01 host tag1: hello\n"
                   "<14>Jan  5 00:00:02 host tag2: world\n")
    ds = read_syslog_text(str(log))
    rows = ds.take_all()
    # row ORDER from a distributed line read is not guaranteed
    # (preserve_order off) — compare sets, like the sinks doctrine
    assert sorted(r["text"] for r in rows) == [
        "<13>Jan  5 00:00:01 host tag1: hello",
        "<14>Jan  5 00:00:02 host tag2: world"]
    parsed = parse_dataset(ds).take_all()
    assert sorted(r["pri"] for r in parsed) == [13, 14]
    withp = read_syslog_text(str(log), include_path=True).take_all()
    assert all(r["path"].endswith("a.log") for r in withp)
    jl = tmp_path / "b.jsonl"
    jl.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    out = read_jsonl(str(jl)).take_all()
    assert sorted(r["a"] for r in out) == [1, 2]


def test_fix_aixforwardedfrom():
    from rsyslog_ray.stages.parse import fix_aixforwardedfrom_table
    ts = "Jun 11 11:11:11 "
    cases = {
        # full fix: preamble spliced, colon after hostname removed
        f"<13>{ts}Message forwarded from foohost: msg body":
            f"<13>{ts}foohost msg body",
        f"{ts}From bar: hello": f"{ts}bar hello",
        # case-insensitive openings (strncasecmp)
        f"{ts}MESSAGE FORWARDED FROM h: x": f"{ts}h x",
        # leading spaces permitted and preserved
        f"<4>  {ts}From h: x": f"<4>  {ts}h x",
        # space before colon → preamble already removed, colon kept
        # (the C code mutates, then aborts: .c:134-137)
        f"{ts}From host extra: y": f"{ts}host extra: y",
        # no colon at all → preamble still removed
        f"{ts}From hostonlyxx": f"{ts}hostonlyxx",
        # wrong opening → untouched
        f"{ts}Forwarded from h: x": f"{ts}Forwarded from h: x",
        # too short (<24 after spaces) → untouched
        "<13>short": "<13>short",
        # <2 chars after opening → untouched
        f"{ts}From x": f"{ts}From x",
    }
    t = pa.table({"text": pa.array(list(cases), pa.string())})
    got = fix_aixforwardedfrom_table(t)["text"].to_pylist()
    assert got == list(cases.values())


def test_fix_cisconames():
    from rsyslog_ray.stages.parse import fix_cisconames_table
    short = "Jun 11 11:11:11 "
    long = "Jun 11 2024 11:11:11 "
    keep = "%ASA-1-000000: interface down and some padding"
    cases = {
        f"<190>{short}fw01 : {keep}": f"<190>{short}fw01 {keep}",
        f"{long}fw02 : {keep}": f"{long}fw02 {keep}",
        # positional checks only — letters elsewhere in ts are accepted
        f"XXX 99 88:77:66 host : {keep}": f"XXX 99 88:77:66 host {keep}",
        # no ': %' after hostname → untouched
        f"{short}fw01 : notpercent and some more padding":
            f"{short}fw01 : notpercent and some more padding",
        # malformed timestamp → untouched
        f"Jun 11 11.11.11 fw01 : {keep}": f"Jun 11 11.11.11 fw01 : {keep}",
        # too short → untouched
        "<1>Jun 11 11:11:11 a : %A": "<1>Jun 11 11:11:11 a : %A",
    }
    t = pa.table({"text": pa.array(list(cases), pa.string())})
    got = fix_cisconames_table(t)["text"].to_pylist()
    assert got == list(cases.values())


def test_fix_snare():
    from rsyslog_ray.stages.parse import fix_snare_table
    ts = "May 17 02:25:10 "
    rest = "1\tSecurity\t606129\tWed May 17 02:25:10 2017"
    cases = {
        # non-syslog Snare: tab before AND after tag become spaces
        f"other.lab.home\tMSWinEventLog\t{rest}":
            f"other.lab.home MSWinEventLog {rest}",
        f"h.example\tLinuxKAudit\t{rest}": f"h.example LinuxKAudit {rest}",
        # PRI preserved
        f"<14>h\tMSWinEventLog\t{rest}x": f"<14>h MSWinEventLog {rest}x",
        # syslog Snare: only the separator after the tag is replaced
        f"<14>{ts}syslog.lab.home MSWinEventLog\t{rest}":
            f"<14>{ts}syslog.lab.home MSWinEventLog {rest}",
        # char after tag overwritten even when not a tab (.c:242)
        f"{ts}host LinuxKAudit_{rest}": f"{ts}host LinuxKAudit {rest}",
        # tab-first with wrong tag → abort, no syslog-shape retry
        f"h\tNotSnare\t{ts}MSWinEventLog\t{rest}":
            f"h\tNotSnare\t{ts}MSWinEventLog\t{rest}",
        # no Snare tag anywhere → untouched
        f"{ts}host prog[1]: normal syslog line":
            f"{ts}host prog[1]: normal syslog line",
        # too short → untouched
        "h\tMSWinEventLog\tabc": "h\tMSWinEventLog\tabc",
    }
    t = pa.table({"text": pa.array(list(cases), pa.string())})
    got = fix_snare_table(t)["text"].to_pylist()
    assert got == list(cases.values())


def test_fixers_registered_as_config_stages():
    from rsyslog_ray.config import STAGE_REGISTRY
    for name in ("pmaixforwardedfrom", "pmcisconames", "pmsnare"):
        assert name in STAGE_REGISTRY


def test_fix_panngfw():
    from rsyslog_ray.stages.parse import fix_panngfw_table
    cases = {
        # plain CSV → TAB, all four log types
        "1,2022/01/01 00:00:00,0001,TRAFFIC,end,1,f5,f6":
            "1\t2022/01/01 00:00:00\t0001\tTRAFFIC\tend\t1\tf5\tf6",
        "<14>a,b,c,THREAT,x,y": "<14>a\tb\tc\tTHREAT\tx\ty",
        "a,b,c,SYSTEM,x": "a\tb\tc\tSYSTEM\tx",
        "a,b,c,CONFIG,x": "a\tb\tc\tCONFIG\tx",
        # quoted field unquoted, '""' → '"', commas inside quotes kept
        'a,b,c,TRAFFIC,"f,ield","qu""ote",tail':
            'a\tb\tc\tTRAFFIC\tf,ield\tqu"ote\ttail',
        # empty fields preserved (incl. trailing)
        "a,b,c,TRAFFIC,,x,": "a\tb\tc\tTRAFFIC\t\tx\t",
        # wrong 4th field → untouched
        "a,b,c,NOTPAN,x,y": "a,b,c,NOTPAN,x,y",
        # fewer than 3 commas → untouched
        "a,b TRAFFIC,rest": "a,b TRAFFIC,rest",
        # martian char after closing quote → untouched (documented dev.)
        'a,b,c,TRAFFIC,"q"x,y': 'a,b,c,TRAFFIC,"q"x,y',
        # log type needs the comma after the keyword
        "a,b,c,TRAFFICX,y": "a,b,c,TRAFFICX,y",
    }
    t = pa.table({"text": pa.array(list(cases), pa.string())})
    got = fix_panngfw_table(t)["text"].to_pylist()
    assert got == list(cases.values())


def test_parse_db2diag():
    from rsyslog_ray.stages.parse import parse_db2diag_table
    # canonical db2diag FIRST line layout: level word at offset 59,
    # pid after the ': ' that follows it, prog 49 chars past pid start
    header = "2013-05-23-14.58.27.184000-240 I1744034E583"
    line = (header.ljust(52) + "LEVEL: Error"
            + " PID : 1020502 TID : 1").ljust(120) + "db2fmp (C) 0"
    assert line[59:64] == "Error" and line[120:126] == "db2fmp"
    short = "too short"
    evt = line[:59] + "Event" + line[64:]
    warn = line[:59] + "Warnin" + line[64:]   # 'W' char is what matters
    t = pa.table({"text": pa.array([line, short, evt, warn], pa.string())})
    out = parse_db2diag_table(t)
    assert out["db2_success"].to_pylist() == [True, False, True, True]
    assert out["db2_severity"].to_pylist() == [3, None, 5, 4]
    # ts: 14:58:27.184 local at -240 min → UTC = local + 240 min
    ts = out["db2_ts"].to_pylist()[0]
    assert ts is not None and ts.strftime("%H:%M:%S") == "18:58:27" \
        and ts.microsecond == 184000
    pid = out["db2_procid"].to_pylist()[0]
    assert pid == "1020502"
    prog = out["db2_appname"].to_pylist()[0]
    assert prog == "db2fmp"


def test_parse_null():
    from rsyslog_ray.stages.parse import parse_null_table
    t = pa.table({"text": pa.array(["<99>raw line", "plain"], pa.string())})
    out = parse_null_table(t, tag="mytag", syslogfacility=4,
                           syslogseverity=2)
    assert out["pri"].to_pylist() == [34, 34]
    # MSG offset 0 keeps the PRI prefix in msg (MsgSetMSGoffs(pMsg, 0))
    assert out["msg"].to_pylist() == ["<99>raw line", "plain"]
    assert out["tag"].to_pylist() == ["mytag", "mytag"]
    assert parse_null_table(t)["pri"].to_pylist() == [13, 13]


def test_read_syslog_text_multiline_modes(ray_session, tmp_path):
    """imfile readMode 1 (paragraph) / 2 (indented) and startmsg.regex
    record assembly (runtime/stream.c:886-1010 semantics)."""
    from rsyslog_ray.sources.files import read_syslog_text

    f1 = tmp_path / "a.log"
    f1.write_text(
        "first line\nsecond line\n\npara two\n\n\npara three\n")
    got = sorted(r["text"] for r in
                 read_syslog_text(str(f1), read_mode=1).take_all())
    assert got == sorted([
        "first line#012second line", "para two", "para three"])

    f2 = tmp_path / "b.log"
    f2.write_text(
        "Exception in thread\n  at Foo.bar()\n\tat Baz.qux()\n"
        "next message\nanother\n  cont\n")
    got = sorted(r["text"] for r in
                 read_syslog_text(str(f2), read_mode=2).take_all())
    assert got == sorted([
        "Exception in thread#012  at Foo.bar()#012\tat Baz.qux()",
        "next message", "another#012  cont"])

    # literal newlines when escape_lf=False
    got = sorted(r["text"] for r in
                 read_syslog_text(str(f2), read_mode=2,
                                  escape_lf=False).take_all())
    assert "Exception in thread\n  at Foo.bar()\n\tat Baz.qux()" in got

    # startmsg.regex: records start at timestamped lines
    f3 = tmp_path / "c.log"
    f3.write_text(
        "preamble\n2024-01-01 ok\ndetail a\n2024-01-02 next\ndetail b\n")
    got = [r["text"] for r in
           read_syslog_text(str(f3),
                            startmsg_regex=r"^\d{4}-\d{2}-\d{2}").take_all()]
    assert sorted(got) == sorted([
        "preamble", "2024-01-01 ok#012detail a",
        "2024-01-02 next#012detail b"])

    # include_path carries shard identity
    rows = read_syslog_text(str(f1), read_mode=1,
                            include_path=True).take_all()
    assert all(r["path"].endswith("a.log") for r in rows)


def test_read_syslog_text_endmsg_regex(ray_session, tmp_path):
    from rsyslog_ray.sources.files import read_syslog_text

    f = tmp_path / "d.log"
    f.write_text("part a\npart b END\npart c\nDONE END\ntrailing\n")
    got = [r["text"] for r in
           read_syslog_text(str(f), endmsg_regex=r"END$").take_all()]
    assert sorted(got) == sorted([
        "part a#012part b END", "part c#012DONE END", "trailing"])

    import pytest as _pytest
    with _pytest.raises(ValueError):
        read_syslog_text(str(f), startmsg_regex="a", endmsg_regex="b")


def test_immark_heartbeat_rows(ray_session):
    """Event-time immark analogue: marks at period multiples strictly
    inside (min ts, max ts]; with_marks unions parseable raw lines."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rsyslog_ray.sources.marks import (immark_table, mark_times_us,
                                           with_marks)

    us = 1_000_000
    # stream spanning 100..7300 s → marks at 1200..7200 (6 marks)
    ts = pa.array(np.array([100, 3000, 7300], np.int64) * us,
                  pa.timestamp("us"))
    tbl = pa.table({
        "conv_id": ["a", "a", "b"], "turn_idx": pa.array([0, 1, 0],
                                                         pa.int32()),
        "role": ["user"] * 3, "text": ["x", "y", "z"],
        "tool": ["t"] * 3, "ts": ts,
    })
    ds = rd.from_arrow(tbl).repartition(3)
    marks = immark_table(ds, period_s=1200)
    got = [t.value // us for t in marks["ts"]]
    assert got == [1200 * k for k in range(1, 7)]
    assert marks["pri"].to_pylist() == [46] * 6
    assert marks["text"].to_pylist() == ["-- MARK --"] * 6
    # boundary semantics: lo exactly on a mark is excluded, hi included
    assert mark_times_us(1200 * us, 2400 * us, 1200).tolist() \
        == [2400 * us]
    # stream union keeps schema and parses as <46> syslog lines
    merged = with_marks(ds, period_s=1200)
    assert merged.schema().names == ds.schema().names
    rows = [r for r in merged.take_all() if r["conv_id"] == "_immark"]
    assert len(rows) == 6
    assert all(r["text"].startswith("<46>") and
               r["text"].endswith("rsyslogd: -- MARK --") for r in rows)
    from rsyslog_ray.stages.parse import parse_dataset
    parsed = parse_dataset(merged).take_all()
    mk = [r for r in parsed if r["conv_id"] == "_immark"]
    assert all(r["facility"] == 5 and r["severity"] == 6 and
               r["parse_success"] for r in mk)
