"""Conformance against the reference's OWN testbench artifacts
(/root/reference/tests): the RainerScript expression-compiler cases
(*.rstest) round-trip through the language front-end, and raw
testsuites/ input files parse with the header fields rsyslog's own
tests rely on. Inputs only — no reference code is executed."""

import datetime as dt
import glob
import os
import re

import pyarrow as pa
import pytest

REF = "/root/reference/tests"

needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference tree not present")


def _rstest_expr(path: str) -> tuple[str, bool]:
    txt = open(path).read()
    expr = re.search(r"\nin:\n(.*?)\$\$\$", txt, re.S).group(1).strip()
    expr = re.sub(r"\bthen\s*$", "", expr).strip()
    ok = re.search(r"^result:\s*(-?\d+)", txt, re.M)
    return expr, (ok is not None and int(ok.group(1)) == 0)


@needs_ref
def test_rstest_expressions_round_trip():
    """Every valid *.rstest expression parses through the language
    front-end; the reference's own error case must NOT parse."""
    from rsyslog_ray.rainerscript import ParseError, load_rainerscript

    paths = sorted(glob.glob(f"{REF}/*.rstest"))
    assert paths, "no rstest files found"
    seen_ok = seen_err = 0
    for p in paths:
        expr, should_parse = _rstest_expr(p)
        src = f"if {expr} then {{ stop }}"
        if should_parse:
            load_rainerscript(src)          # raises on regression
            seen_ok += 1
        else:
            with pytest.raises(ParseError):
                load_rainerscript(src)
            seen_err += 1
    assert seen_ok >= 3 and seen_err >= 1


def _parse_ref_input(name: str):
    from rsyslog_ray.stages.parse import parse_table

    lines = [ln for ln in open(f"{REF}/testsuites/{name}",
                               errors="replace").read().splitlines()
             if ln.strip()]
    t = pa.table({
        "conv_id": pa.array([name] * len(lines)),
        "turn_idx": pa.array(range(len(lines)), pa.int64()),
        "role": pa.array(["user"] * len(lines)),
        "text": pa.array(lines),
        "tool": pa.array([""] * len(lines)),
        "ts": pa.array([dt.datetime(2026, 1, 1)] * len(lines),
                       pa.timestamp("us")),
    })
    return lines, parse_table(t)


@needs_ref
def test_reference_pix_inputs_parse():
    """testsuites/{complex_replace_input,dynstats_input,date_time_msg}:
    the PIX-style RFC3164 lines rsyslog's own tests inject — PRI 167 →
    facility 20 / severity 7, positional hostname, '%PIX-7-710005:'
    tag, every line parse_success."""
    for name in ("complex_replace_input", "dynstats_input",
                 "date_time_msg"):
        lines, out = _parse_ref_input(name)
        assert out.num_rows == len(lines), name
        assert set(out["pri"].to_pylist()) == {167}, name
        assert set(out["facility"].to_pylist()) == {20}, name
        assert set(out["severity"].to_pylist()) == {7}, name
        assert set(out["hostname"].to_pylist()) == {"172.20.245.8"}, name
        # TAG is stored VERBATIM as MsgSetTAG does — the colon is part
        # of a colon-terminated tag (pmrfc3164.c:345-349)
        assert set(out["tag"].to_pylist()) == {"%PIX-7-710005:"}, name
        assert all(out["parse_success"].to_pylist()), name
        # the RFC3164 header timestamp round-trips (month=3, day=6)
        ts = out["ts_reported"].to_pylist()
        assert all(x is not None and (x.month, x.day) == (3, 6)
                   for x in ts), name


@needs_ref
def test_reference_json_array_inputs_parse_as_cee():
    """testsuites/json_{array,object,nonarray}_input feed mmjsonparse
    in the reference; our chain must parse the header and flag @cee
    lines (is_cee) exactly for the JSON-payload files that carry it."""
    for name, any_cee in (("json_array_input", True),
                          ("json_object_input", True),
                          ("json_nonarray_input", True)):
        lines, out = _parse_ref_input(name)
        assert out.num_rows == len(lines), name
        assert all(out["parse_success"].to_pylist()), name
        assert any(out["is_cee"].to_pylist()) == any_cee, name


@needs_ref
def test_reference_dynstats_counter_totals(ray_session):
    """tests/dynstats.sh: inject testsuites/dynstats_input, bucket each
    msg by field($msg, 32, 1) into dyn_stats('msg_stats') — the shell
    test's first_column_sum_check expects totals foo=3, bar=1 (and the
    remaining lines are baz=2)."""
    import ray.data as rd

    from rsyslog_ray.functions import field
    from rsyslog_ray.stages.aggregate import dyn_inc

    _lines, out = _parse_ref_input("dynstats_input")
    keyed = pa.table({
        "ts": out["ts_reported"],
        "key": field(out["msg"].combine_chunks(), " ", 1),
    })
    got = dyn_inc(rd.from_arrow(keyed), "msg_stats", "key")
    counts = dict(zip(got["key"].to_pylist(), got["rows"].to_pylist()))
    assert counts == {"foo": 3, "bar": 1, "baz": 2}


@needs_ref
def test_reference_imptcp_multiline_golden(ray_session, tmp_path):
    """tests/imptcp_multi_line.sh golden: multiline='on' frames a new
    record at each PRI-opening line and joins continuations with the
    #012 LF escape — byte-equal replay via read_syslog_text's
    startmsg_regex path over the reference's own testdata file."""
    import shutil

    from rsyslog_ray.sources.files import read_syslog_text

    src = f"{REF}/testsuites/imptcp_multi_line.testdata"
    p = tmp_path / "in.log"
    shutil.copy(src, p)
    ds = read_syslog_text([str(p)], startmsg_regex=r"^<\d+>")
    got = [r["text"] for r in ds.take_all()]
    assert got == [
        "<133>Mar  1 01:00:00 172.20.245.8 tag test1",
        "<133>Mar  1 01:00:00 172.20.245.8 tag test2",
        "<133>Mar  1 01:00:00 172.20.245.8 tag multi#012line1",
        "<133>Mar  1 01:00:00 172.20.245.8 tag multi#012l#012i#012n"
        "#012#012e2",
        "<133>Mar  1 01:00:00 172.20.245.8 tag test3",
        "<133>Mar  1 01:00:00 172.20.245.8 tag multi#012line3",
        "<133>Mar  1 01:00:00 172.20.245.8 tag test4",
        "<133>Mar  1 01:00:00 172.20.245.8 tag test end",
    ]


def _run_sets(set_block: str) -> dict:
    """Execute a reference rscript set-statement block through the
    engine (one-row batch) and return the resulting $! JSON tree."""
    import json

    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.route import route_table

    src = set_block + '\naction(type="omfile" name="out")\n'
    cc = load_rainerscript(src)
    batch = pa.table({"msg": ["msgnum:0"],
                      "severity": pa.array([6], pa.int64())})
    routed = route_table(batch, cc.ruleset)
    return json.loads(routed["out"]["cee_json"][0].as_py())


@needs_ref
def test_reference_rscript_substring_golden(ray_session):
    """tests/rscript_substring.sh — the exact set statements and the
    cmp-checked expected values."""
    tree = _run_sets('''
set $!str!var1 = substring("", 0, 0);
set $!str!var2 = substring("test", 0, 4);
set $!str!var3 = substring("test", 1, 2);
set $!str!var4 = substring("test", 4, 2);
set $!str!var5 = substring("test", 0, 5);
set $!str!var6 = substring("test", 0, 6);
set $!str!var7 = substring("test", 3, 4);
set $!str!var8 = substring("test", 1, 0);
''')
    assert tree["str"] == {"var1": "", "var2": "test", "var3": "es",
                           "var4": "", "var5": "test", "var6": "test",
                           "var7": "t", "var8": ""}


@needs_ref
def test_reference_rscript_ipv42num_golden(ray_session):
    """tests/rscript_ipv42num.sh — incl. the whitespace-trim cases and
    every malformed-input -1 (values compared semantically; the
    reference cmp-checks the same numbers)."""
    tree = _run_sets('''
set $!ip!v1 = ipv42num("0.0.0.0");
set $!ip!v2 = ipv42num("0.0.0.1");
set $!ip!v3 = ipv42num("0.0.1.0");
set $!ip!v4 = ipv42num("0.1.0.0");
set $!ip!v5 = ipv42num("1.0.0.0");
set $!ip!v6 = ipv42num("0.0.0.135");
set $!ip!v7 = ipv42num("1.1.1.1");
set $!ip!v8 = ipv42num("225.33.1.10");
set $!ip!v9 = ipv42num("172.0.0.1");
set $!ip!v10 = ipv42num("255.255.255.255");
set $!ip!v11 = ipv42num("1.0.3.45         ");
set $!ip!v12 = ipv42num("      0.0.0.1");
set $!ip!v13 = ipv42num("    0.0.0.1   ");
set $!ip!e1 = ipv42num("a");
set $!ip!e2 = ipv42num("");
set $!ip!e3 = ipv42num("123.4.6.*");
set $!ip!e4 = ipv42num("172.0.0.1.");
set $!ip!e5 = ipv42num("172.0.0..1");
set $!ip!e6 = ipv42num(".172.0.0.1");
set $!ip!e7 = ipv42num(".17 2.0.0.1");
''')
    assert tree["ip"] == {
        "v1": 0, "v2": 1, "v3": 256, "v4": 65536, "v5": 16777216,
        "v6": 135, "v7": 16843009, "v8": 3777036554, "v9": 2885681153,
        "v10": 4294967295, "v11": 16778029, "v12": 1, "v13": 1,
        "e1": -1, "e2": -1, "e3": -1, "e4": -1, "e5": -1, "e6": -1,
        "e7": -1}


@needs_ref
def test_reference_rscript_num2ipv4_golden(ray_session):
    """tests/rscript_num2ipv4.sh expected mapping (errors render the
    string '-1')."""
    tree = _run_sets('''
set $!ip!v1 = num2ipv4(0);
set $!ip!v2 = num2ipv4(1);
set $!ip!v3 = num2ipv4(256);
set $!ip!v4 = num2ipv4(65536);
set $!ip!v5 = num2ipv4(16777216);
set $!ip!v6 = num2ipv4(135);
set $!ip!v7 = num2ipv4(16843009);
set $!ip!v8 = num2ipv4(3777036554);
set $!ip!v9 = num2ipv4(2885681153);
set $!ip!v10 = num2ipv4(4294967295);
set $!ip!e1 = num2ipv4(-1);
set $!ip!e2 = num2ipv4(4294967296);
''')
    assert tree["ip"] == {
        "v1": "0.0.0.0", "v2": "0.0.0.1", "v3": "0.0.1.0",
        "v4": "0.1.0.0", "v5": "1.0.0.0", "v6": "0.0.0.135",
        "v7": "1.1.1.1", "v8": "225.33.1.10", "v9": "172.0.0.1",
        "v10": "255.255.255.255", "e1": "-1", "e2": "-1"}


@needs_ref
def test_reference_rscript_int2hex_golden(ray_session):
    """tests/rscript_int2Hex.sh — incl. the ''→'0' and non-numeric→
    'NAN' edges the reference cmp_exact-checks."""
    tree = _run_sets('''
set $!ip!v0 = int2hex("");
set $!ip!v1 = int2hex("0");
set $!ip!v2 = int2hex("1");
set $!ip!v4 = int2hex("375894");
set $!ip!v6 = int2hex("16");
set $!ip!v8 = int2hex("4294967295");
set $!ip!e1 = int2hex("a");
''')
    assert tree["ip"] == {"v0": "0", "v1": "0", "v2": "1", "v4": "5bc56",
                          "v6": "10", "v8": "ffffffff", "e1": "NAN"}


@needs_ref
def test_reference_rscript_format_time_golden(ray_session):
    """tests/rscript_format_time.sh — epoch → rfc3164/rfc3339 incl.
    negative epochs and the invalid-input pass-through ('ABC')."""
    tree = _run_sets('''
set $!datetime!rfc3164 = format_time(1507165811, "date-rfc3164");
set $!datetime!rfc3339 = format_time(1507165811, "date-rfc3339");
set $!datetime!rfc3164Neg = format_time(-1507165811, "date-rfc3164");
set $!datetime!rfc3339Neg = format_time(-1507165811, "date-rfc3339");
set $!datetime!str1 = format_time("1507165811", "date-rfc3339");
set $!datetime!strinv1 = format_time("ABC", "date-rfc3339");
''')
    assert tree["datetime"] == {
        "rfc3164": "Oct  5 01:10:11",
        "rfc3339": "2017-10-05T01:10:11Z",
        "rfc3164Neg": "Mar 29 22:49:49",
        "rfc3339Neg": "1922-03-29T22:49:49Z",
        "str1": "2017-10-05T01:10:11Z",
        "strinv1": "ABC"}


@needs_ref
def test_reference_rscript_trim_golden(ray_session):
    """tests/rscript_trim.sh (l/r subset + the chained b-cases'
    representative shapes) — SPACE-only trimming per the reference."""
    tree = _run_sets('''
set $!str!l1 = ltrim("");
set $!str!l3 = ltrim("   test");
set $!str!l4 = ltrim("test   ");
set $!str!l5 = ltrim("   test   ");
set $!str!l8 = ltrim(" ");
set $!str!l10 = ltrim(" te st");
set $!str!r3 = rtrim("   test");
set $!str!r4 = rtrim("test   ");
set $!str!r5 = rtrim("   test   ");
set $!str!r8 = rtrim(" ");
set $!str!r10 = rtrim("te st ");
set $!str!b2 = ltrim(" test ");
set $!str!b2 = rtrim($!str!b2);
''')
    assert tree["str"] == {
        "l1": "", "l3": "test", "l4": "test   ", "l5": "test   ",
        "l8": "", "l10": "te st",
        "r3": "   test", "r4": "test", "r5": "   test", "r8": "",
        "r10": "te st", "b2": "test"}


@needs_ref
def test_reference_rscript_str2num_negative_golden(ray_session):
    """tests/rscript_str2num_negative.sh: cnum('-13') in the reference
    yields 0 for the negative-string path under test — replicate the
    exact statement and expected value."""
    import re as _re
    src = open(f"{REF}/rscript_str2num_negative.sh").read() \
        if os.path.isfile(f"{REF}/rscript_str2num_negative.sh") else ""
    stmts = "\n".join(_re.findall(r"^set \$.*;$", src, _re.M))
    expected = _re.search(r"echo '(\{[^']*\})'", src)
    if not stmts or not expected:
        pytest.skip("could not extract statements from the shell test")
    import json as _json
    tree = _run_sets(stmts)
    want = _json.loads(expected.group(1))
    got = tree[next(iter(tree))]
    assert got == want


@needs_ref
def test_reference_rscript_unflatten_object_golden(ray_session):
    """tests/rscript_unflatten_object.sh: dotted keys set into $! then
    unflatten($!, '.') — semantic equality with the EXPECTED tree
    (key order differs: json-c preserves insertion order, the engine
    normalizes to sorted keys), script_error() == 0."""
    import json

    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.route import route_table

    src = '''
set $!source.ip = "1.2.3.4";
set $!source.bytes = 3258;
set $!source.geo.country_iso_code = "FR";
set $!destination.ip = "4.3.2.1";
set $.unflatten = unflatten($!, ".");
set $.ret = script_error();
action(type="omfile" name="out" template="t")
template(name="t" type="string" string="%$.ret% %$.unflatten%")
'''
    cc = load_rainerscript(src)
    batch = pa.table({"msg": ["msgnum:00000000:"]})
    routed = route_table(batch, cc.ruleset)
    ret, _, uf = routed["out"]["rendered"][0].as_py().partition(" ")
    assert ret == "0"
    assert json.loads(uf) == {
        "source": {"ip": "1.2.3.4", "bytes": 3258,
                   "geo": {"country_iso_code": "FR"}},
        "destination": {"ip": "4.3.2.1"}}


@needs_ref
def test_reference_rscript_wrap2_and_re_extract_goldens(ray_session):
    """tests/rscript_wrap2.sh + rscript_re_extract.sh: both inject
    testsuites/date_time_msg and content_check one rendered line —
    replayed through the full parse → script → template chain."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.route import route_table

    _lines, parsed = _parse_ref_input("date_time_msg")
    src = '''
set $.replaced_msg = wrap("foo says" & $msg, "*" & "*");
set $.number = re_extract($msg, '.* ([0-9]+)$', 0, 1, 'none');
action(type="omfile" name="w" template="tw")
action(type="omfile" name="n" template="tn")
template(name="tw" type="string" string="%$.replaced_msg%")
template(name="tn" type="string" string="*Number is %$.number%*")
'''
    cc = load_rainerscript(src)
    routed = route_table(parsed, cc.ruleset)
    assert routed["w"]["rendered"].to_pylist() == [
        "**foo says at Thu Oct 30 13:20:18 IST 2014 "
        "random number is 19597**"]
    assert routed["n"]["rendered"].to_pylist() == ["*Number is 19597*"]


@needs_ref
def test_reference_template_pos_from_to_golden(ray_session):
    """tests/template-pos-from-to.sh: imdiag-style injected msgs
    (doInjectMsg format) rendered through %msg:9:16:% must yield the
    zero-padded sequence numbers (the script's seq_check 0 8)."""
    import datetime as dt

    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    lines = [f"<167>Mar  1 01:00:00 172.20.245.8 tag msgnum:{i:08d}:"
             for i in range(9)]
    t = pa.table({
        "conv_id": pa.array(["inj"] * 9),
        "turn_idx": pa.array(range(9), pa.int64()),
        "role": pa.array(["user"] * 9),
        "text": pa.array(lines),
        "tool": pa.array([""] * 9),
        "ts": pa.array([dt.datetime(2026, 1, 1)] * 9,
                       pa.timestamp("us")),
    })
    parsed = parse_table(t)
    cc = load_rainerscript('''
template(name="outfmt" type="string" string="%msg:9:16:%")
:msg, contains, "msgnum:" action(type="omfile" name="out" template="outfmt")
''')
    routed = route_table(parsed, cc.ruleset)
    assert sorted(routed["out"]["rendered"].to_pylist()) == [
        f"{i:08d}" for i in range(9)]


@needs_ref
def test_reference_json_var_case_golden(ray_session):
    """tests/json_var_case.sh: case-sensitive JSON tree variables plus
    a set overriding one key — content_check
    'abc:1 ABC:2 aBc:3 _abc:4 _ABC:5 _aBc:7'."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.enrich import mmjsonparse_table
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    line = ('<167>Nov  6 12:34:56 172.0.0.1 test: @cee: { "abc": "1", '
            '"ABC": "2", "aBc": "3", "_abc": "4", "_ABC": "5", '
            '"_aBc": "6" }')
    t = pa.table({
        "conv_id": ["c"], "turn_idx": pa.array([0], pa.int64()),
        "role": ["user"], "text": [line], "tool": [""],
        "ts": pa.array([dt.datetime(2026, 1, 1)], pa.timestamp("us"))})
    parsed = mmjsonparse_table(parse_table(t))
    cc = load_rainerscript('''
template(name="outfmt" type="string"
         string="abc:%$!abc% ABC:%$!ABC% aBc:%$!aBc% _abc:%$!_abc% _ABC:%$!_ABC% _aBc:%$!_aBc%")
set $!_aBc = "7";
action(type="omfile" name="out" template="outfmt")
''')
    routed = route_table(parsed, cc.ruleset)
    assert routed["out"]["rendered"].to_pylist() == [
        "abc:1 ABC:2 aBc:3 _abc:4 _ABC:5 _aBc:7"]


@needs_ref
def test_reference_mmjsonparse_simple_golden(ray_session):
    """tests/mmjsonparse_simple.sh: '@cee: {json}' messages pass
    $parsesuccess == "OK" after mmjsonparse (msg.c:2315 last-parser
    state as 'OK'/'FAIL' strings); a non-JSON message fails."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.enrich import mmjsonparse_table
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    lines = [
        '<167>Mar  1 01:00:00 h tag: @cee: {"msgnum": "00000000"}',
        '<167>Mar  1 01:00:00 h tag: @cee: {"msgnum": "00000001"}',
        '<167>Mar  1 01:00:00 h tag: not json at all',
    ]
    t = pa.table({
        "conv_id": ["c"] * 3, "turn_idx": pa.array(range(3), pa.int64()),
        "role": ["user"] * 3, "text": pa.array(lines), "tool": [""] * 3,
        "ts": pa.array([dt.datetime(2026, 1, 1)] * 3,
                       pa.timestamp("us"))})
    parsed = mmjsonparse_table(parse_table(t))
    cc = load_rainerscript('''
template(name="outfmt" type="string" string="%$!msgnum%")
if $parsesuccess == "OK" then {
    action(type="omfile" name="out" template="outfmt")
}
''')
    routed = route_table(parsed, cc.ruleset)
    assert routed["out"]["rendered"].to_pylist() == ["00000000",
                                                     "00000001"]


@needs_ref
def test_reference_mmjsonparse_without_cookie_golden(ray_session):
    """tests/mmjsonparse-w-o-cookie.sh: action(type='mmjsonparse'
    cookie='') parses plain-JSON messages with no @cee cookie; the
    seq gate is the same $parsesuccess == 'OK'."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.enrich import mmjsonparse_table
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    lines = [
        '<167>Mar  1 01:00:00 h tag: {"msgnum": "00000000"}',
        '<167>Mar  1 01:00:00 h tag: plain text',
    ]
    t = pa.table({
        "conv_id": ["c"] * 2, "turn_idx": pa.array(range(2), pa.int64()),
        "role": ["user"] * 2, "text": pa.array(lines), "tool": [""] * 2,
        "ts": pa.array([dt.datetime(2026, 1, 1)] * 2,
                       pa.timestamp("us"))})
    parsed = mmjsonparse_table(parse_table(t), cookie="")
    cc = load_rainerscript('''
template(name="outfmt" type="string" string="%$!msgnum%")
if $parsesuccess == "OK" then {
    action(type="omfile" name="out" template="outfmt")
}
''')
    routed = route_table(parsed, cc.ruleset)
    assert routed["out"]["rendered"].to_pylist() == ["00000000"]


@needs_ref
def test_reference_mmanon_zero_128_ipv6_golden(ray_session):
    """tests/mmanon_zero_128_ipv6.sh: the exact seven injected msg
    payloads and the cmp-checked outputs — incl. abbreviated ('::',
    '0::'), embedded-in-text, and NOT-an-address ('13:abd:45:')
    cases; bits=129 clamps to 128 in the reference (we pass 128)."""
    from rsyslog_ray.stages.enrich import mmanon_ipv6_table

    msgs = [" asdfghjk",
            " FFFF:FFFF:FFFF:FFFF:FFFF:FFFF:FFFF:FFFF",
            " 61:34:ad::7:F aa:ff43::756:99:0",
            " ::",
            " 0::",
            " 13:abd:45:",
            " textnoblank72:8374:adc7:47FF::43:0:1AFEstillnoblank"]
    t = pa.table({"msg": pa.array(msgs)})
    out = mmanon_ipv6_table(t, bits=128, mode="zero")["msg"].to_pylist()
    assert out == [
        " asdfghjk",
        " 0:0:0:0:0:0:0:0",
        " 0:0:0:0:0:0:0:0 0:0:0:0:0:0:0:0",
        " 0:0:0:0:0:0:0:0",
        " 0:0:0:0:0:0:0:0",
        " 13:abd:45:",
        " textnoblank0:0:0:0:0:0:0:0stillnoblank"]


def _inject_table(lines: list[str]) -> pa.Table:
    n = len(lines)
    return pa.table({
        "conv_id": pa.array(["inj"] * n),
        "turn_idx": pa.array(range(n), pa.int64()),
        "role": pa.array(["user"] * n),
        "text": pa.array(lines),
        "tool": pa.array([""] * n),
        "ts": pa.array([dt.datetime(2026, 1, 1)] * n, pa.timestamp("us")),
    })


def _injectmsg(n: int) -> pa.Table:
    """diag.sh injectmsg analogue: local4.=debug msgnum records."""
    return _inject_table(
        [f"<167>Mar  1 01:00:00 172.20.245.8 tag msgnum:{i:08d}:"
         for i in range(n)])


@needs_ref
def test_reference_rscript_replace_golden(ray_session):
    """tests/rscript_replace.sh — nested replace() + exec_template of a
    regex-extract list template over the date_time_msg fixture;
    content_check 'date time: Thu 0ct0ber 30 13:20:18 IST 2014'."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    line = open(f"{REF}/testsuites/date_time_msg").read().strip()
    parsed = parse_table(_inject_table([line]))
    cc = load_rainerscript('''
template(name="outfmt" type="string" string="%$.replaced_msg%")
template(name="date_time" type="list") {
  property(name="msg" regex.Expression="Thu .+ 2014" regex.Type="ERE"
           regex.Match="0")
}
set $.replaced_msg = replace("date time: " & exec_template("date_time"),
                             "O" & "ct", replace("october", "o", "0"));
action(type="omfile" name="out" template="outfmt")
''')
    routed = route_table(parsed, cc.ruleset)
    assert routed["out"]["rendered"].to_pylist() == [
        "date time: Thu 0ct0ber 30 13:20:18 IST 2014"]


@needs_ref
def test_reference_rscript_field_golden(ray_session):
    """tests/rscript_field.sh — set $!usr!msgnum = field($msg, 58, 2)
    rendered through a list template; seq_check over injectmsg."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_injectmsg(50))
    cc = load_rainerscript('''
template(name="outfmt" type="list") {
    property(name="$!usr!msgnum")
}
if $msg contains "msgnum" then {
    set $!usr!msgnum = field($msg, 58, 2);
    action(type="omfile" name="out" template="outfmt")
}
''')
    routed = route_table(parsed, cc.ruleset)
    assert sorted(routed["out"]["rendered"].to_pylist()) == [
        f"{i:08d}" for i in range(50)]


@needs_ref
def test_reference_rscript_prifilt_golden(ray_session):
    """tests/rscript_prifilt.sh — prifilt("local4.*") passes the
    injectmsg PRI (167 = local4.debug); field-mode template extracts the
    msgnum (seq_check)."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    # 40 local4 rows pass, 10 local3 (159) rows must not
    lines = ([f"<167>Mar  1 01:00:00 h tag msgnum:{i:08d}:"
              for i in range(40)]
             + [f"<159>Mar  1 01:00:00 h tag msgnum:{i:08d}:"
                for i in range(40, 50)])
    parsed = parse_table(_inject_table(lines))
    cc = load_rainerscript('''
template(name="outfmt" type="list") {
    property(name="msg" field.delimiter="58" field.number="2")
}
if prifilt("local4.*") then
    action(type="omfile" name="out" template="outfmt")
''')
    routed = route_table(parsed, cc.ruleset)
    assert sorted(routed["out"]["rendered"].to_pylist()) == [
        f"{i:08d}" for i in range(40)]


@needs_ref
def test_reference_template_const_jsonf_golden(ray_session):
    """tests/template-const-jsonf.sh — cmp_exact '"@version": "1"':
    constant jsonf goes through json-c's printer, which puts a SPACE
    after the colon (template.c:1433-1436), unlike property jsonf."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_injectmsg(1))
    cc = load_rainerscript('''
template(name="outfmt" type="list") {
    constant(outname="@version" value="1" format="jsonf")
}
action(type="omfile" name="out" template="outfmt")
''')
    routed = route_table(parsed, cc.ruleset)
    assert routed["out"]["rendered"].to_pylist() == ['"@version": "1"']


@needs_ref
def test_reference_template_json_option_golden(ray_session):
    """tests/template-json.sh — option.json="on" escapes backslash and
    quote in FIELD values but not '/' and not constants; cmp against
    the script's printf-built expected line."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_injectmsg(1))
    cc = load_rainerscript(r'''
set $!backslash = "a \\ \"b\" c / d";
template(name="json" type="list" option.json="on") {
        constant(value="{")
        constant(value="\"backslash\":\"")
        property(name="$!backslash")
        constant(value="\"}")
}
:msg, contains, "msgnum:" action(type="omfile" name="out" template="json")
''')
    routed = route_table(parsed, cc.ruleset)
    assert routed["out"]["rendered"].to_pylist() == [
        '{"backslash":"a \\\\ \\"b\\" c / d"}']


@needs_ref
def test_reference_rscript_replace_complex_golden(ray_session):
    """tests/rscript_replace_complex.sh — chained replace() over the
    complex_replace_input fixture; the script's four content_checks."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    lines = [ln for ln in open(
        f"{REF}/testsuites/complex_replace_input").read().splitlines()
        if ln.strip()]
    parsed = parse_table(_inject_table(lines))
    cc = load_rainerscript('''
template(name="outfmt" type="string" string="%$.replaced_msg%")
set $.replaced_msg = replace($msg, "syslog", "rsyslog");
set $.replaced_msg = replace($.replaced_msg, "hello", "hello_world");
set $.replaced_msg = replace($.replaced_msg, "foo_bar_baz", "FBB");
set $.replaced_msg = replace($.replaced_msg,
    "as_longer_this_string_as_more_probability_to_catch_the_bug", "ss");
action(type="omfile" name="out" template="outfmt")
''')
    routed = route_table(parsed, cc.ruleset)
    got = "\n".join(routed["out"]["rendered"].to_pylist())
    for expected in (
            "try to replace rsyslog and syrsyslog with rrsyslog",
            "try to replace hello_world in hello_worldlo and "
            "helhello_world with hello_world_world",
            "try to FBB in FBB_quux and quux_FBB with FBB",
            "in the end of msg; try to not lose "
            "as_longer_this_string_as_more_probability_to_catch_the_bu"):
        assert expected in got, expected


@needs_ref
def test_reference_template_pure_json_golden(ray_session):
    """tests/template-pure-json.sh — option.jsonf="on" wraps the jsonf
    fields in braces with ', ' separators and '}\\n' after the last
    (tplToString template.c:194-240); cmp_exact
    '{"message":" msgnum:00000000:", "@version": "1"}'."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_injectmsg(1))
    cc = load_rainerscript('''
template(name="outfmt" type="list" option.jsonf="on") {
    property(outname="message" name="msg" format="jsonf")
    constant(outname="@version" value="1" format="jsonf")
}
action(type="omfile" name="out" template="outfmt")
''')
    routed = route_table(parsed, cc.ruleset)
    assert routed["out"]["rendered"].to_pylist() == [
        '{"message":" msgnum:00000000:", "@version": "1"}\n']


@needs_ref
def test_reference_call_indirect_basic_golden(ray_session):
    """tests/rscript_ruleset_call_indirect-basic.sh — the target name is
    the constant expression "r" & "s"; seq_check 0 99."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_injectmsg(100))
    cc = load_rainerscript('''
template(name="outfmt" type="list") {
    property(name="msg" field.delimiter="58" field.number="2")
}
ruleset(name="rs") {
    action(type="omfile" name="out" template="outfmt")
}
if $msg contains "msgnum" then call_indirect "r" & "s";
''')
    routed = route_table(parsed, cc.ruleset)
    assert sorted(routed["out"]["rendered"].to_pylist()) == [
        f"{i:08d}" for i in range(100)]


@needs_ref
def test_reference_call_indirect_var_golden(ray_session):
    """tests/rscript_ruleset_call_indirect-var.sh — target from a local
    variable set earlier; seq_check 0 99."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_injectmsg(100))
    cc = load_rainerscript('''
template(name="outfmt" type="list") {
    property(name="msg" field.delimiter="58" field.number="2")
}
ruleset(name="rs") {
    action(type="omfile" name="out" template="outfmt")
}
set $.var = "rs";
if $msg contains "msgnum" then call_indirect $.var;
''')
    routed = route_table(parsed, cc.ruleset)
    assert sorted(routed["out"]["rendered"].to_pylist()) == [
        f"{i:08d}" for i in range(100)]


@needs_ref
def test_reference_call_indirect_invld_golden(ray_session):
    """tests/rscript_ruleset_call_indirect-invld.sh — an unknown target
    is a NOP ("we accept that a NOP will survive", ruleset.c:256-261):
    the message continues through later statements unharmed."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_injectmsg(5))
    cc = load_rainerscript('''
ruleset(name="rs") {
    action(type="omfile" name="never" template="RSYSLOG_FileFormat")
}
if $msg contains "msgnum" then call_indirect "does-not-exist";
action(type="omfile" name="after" template="RSYSLOG_FileFormat")
''')
    routed = route_table(parsed, cc.ruleset)
    assert routed.get("never") is None or routed["never"].num_rows == 0
    assert routed["after"].num_rows == 5


@needs_ref
@pytest.mark.parametrize("setup,probe,expected", [
    ('set $!p1!p2!val="yes!";', "$!p1!p2!val", "on"),    # exists-yes
    ("", "$!p1!p2!val", "off"),                          # exists-not1
    ('set $!somevar = "test";', "$!p1!p2!val", "off"),   # exists-not2
    ("", "$.p1!p2!val", "off"),                          # exists-not3
    ('set $.p1!p2!val="yes!";', "$.p1!p2!val", "on"),    # exists-yes2
])
def test_reference_exists_goldens(ray_session, setup, probe, expected):
    """tests/rscript_exists-{yes,not1,not2,not3,yes2}.sh — exists() over
    JSON-tree and local-variable paths, cmp_exact on/off."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_injectmsg(1))
    cc = load_rainerscript(f'''
template(name="outfmt" type="string" string="%!result%")
{setup}
if $msg contains "msgnum" then {{
    if exists({probe}) then
        set $!result = "on";
    else
        set $!result = "off";
    action(type="omfile" name="out" template="outfmt")
}}
''')
    routed = route_table(parsed, cc.ruleset)
    assert routed["out"]["rendered"].to_pylist() == [expected]


@needs_ref
def test_reference_exists_not4_golden(ray_session):
    """tests/rscript_exists-not4.sh — `not exists(...)` on an unset
    local path takes the then-branch (cmp_exact 'off')."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_injectmsg(1))
    cc = load_rainerscript('''
template(name="outfmt" type="string" string="%!result%")
if $msg contains "msgnum" then {
    if not exists($.p1!p2!val) then
        set $!result = "off";
    else
        set $!result = "on";
    action(type="omfile" name="out" template="outfmt")
}
''')
    routed = route_table(parsed, cc.ruleset)
    assert routed["out"]["rendered"].to_pylist() == ["off"]


@needs_ref
def test_reference_set_modify_golden(ray_session):
    """tests/rscript_set_modify.sh — the second set of the same tree
    path wins (seq_check: field 2, not field 1)."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_injectmsg(100))
    cc = load_rainerscript('''
template(name="outfmt" type="list") {
    property(name="$!usr!msgnum")
}
if $msg contains "msgnum" then {
    set $!usr!msgnum = field($msg, 58, 1);
    set $!usr!msgnum = field($msg, 58, 2);
    action(type="omfile" name="out" template="outfmt")
}
''')
    routed = route_table(parsed, cc.ruleset)
    assert sorted(routed["out"]["rendered"].to_pylist()) == [
        f"{i:08d}" for i in range(100)]


@needs_ref
def test_reference_hash64_golden(ray_session):
    """tests/rscript_hash64.sh — content-pattern-check accepts the djb
    build's values: hash64(uuid) = -50452361579464591, hash64mod 100 =
    25 (fmhash.c:116-147; we reproduce the no-xxhash build exactly)."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_injectmsg(3))
    cc = load_rainerscript('''
template(name="outfmt" type="string" string="%$.hash_no_1% -  %$.hash_no_2%")
set $.hash_no_1 = hash64("0f9a1d07-a8c9-43a7-a6f7-198dca3d932e");
set $.hash_no_2 = hash64mod("0f9a1d07-a8c9-43a7-a6f7-198dca3d932e", 100);
action(type="omfile" name="out" template="outfmt")
''')
    routed = route_table(parsed, cc.ruleset)
    assert routed["out"]["rendered"].to_pylist() == [
        "-50452361579464591 -  25"] * 3


@needs_ref
def test_reference_unaffected_reset_golden(ray_session):
    """tests/rscript_unaffected_reset.sh — setting a SIBLING tree path
    must not clobber the first path (seq_check)."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_injectmsg(100))
    cc = load_rainerscript('''
template(name="outfmt" type="list") {
    property(name="$!usr!msgnum")
}
if $msg contains "msgnum" then {
    set $!usr!msgnum = field($msg, 58, 2);
    set $!usr!msgnum_reset = "dummy";
    action(type="omfile" name="out" template="outfmt")
}
''')
    routed = route_table(parsed, cc.ruleset)
    assert sorted(routed["out"]["rendered"].to_pylist()) == [
        f"{i:08d}" for i in range(100)]


@needs_ref
def test_reference_str2num_empty_golden(ray_session):
    """tests/rscript_str2num_empty.sh — `set $!ip!v1 = 1+"";` coerces ""
    to 0 and stores NUMBER 1 in the tree. (The reference's json-c
    printer spaces `{ "v1": 1 }`; the engine normalizes JSON text
    compactly — compared semantically, documented deviation.)"""
    import json as _json

    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_injectmsg(1))
    cc = load_rainerscript('''
set $!ip!v1 = 1+"";
template(name="outfmt" type="subtree" subtree="$!ip")
action(type="omfile" name="out" template="outfmt")
''')
    routed = route_table(parsed, cc.ruleset)
    tree = _json.loads(routed["out"]["rendered"].to_pylist()[0])
    assert tree == {"v1": 1} and isinstance(tree["v1"], int)


@needs_ref
def test_reference_template_missing_jsonvar_golden(ray_session):
    """tests/template-pos-from-to-missing-jsonvar.sh — a position window
    over a MISSING $! var renders empty ('--' line)."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_injectmsg(1))
    cc = load_rainerscript('''
template(name="outfmt" type="string"
         string="-%$!non!existing!var:109:116:%-")
:msg, contains, "msgnum:" action(type="omfile" name="out"
                                 template="outfmt")
''')
    routed = route_table(parsed, cc.ruleset)
    assert routed["out"]["rendered"].to_pylist() == ["--"]


@needs_ref
@pytest.mark.parametrize("script", [
    # rscript_stop.sh — stop inside the nested if
    '''
template(name="outfmt" type="list") { property(name="$!usr!msgnum") }
if $msg contains "msgnum" then {
    set $!usr!msgnum = field($msg, 58, 2);
    if cnum($!usr!msgnum) >= 50 then
        stop
    action(type="omfile" name="out" template="outfmt")
}
''',
    # rscript_stop2.sh — guard-style stops at top level, bare action
    '''
template(name="outfmt" type="list") { property(name="$!usr!msgnum") }
if not ($msg contains "msgnum") then
    stop
set $!usr!msgnum = field($msg, 58, 2);
if cnum($!usr!msgnum) >= 50 then
    stop
action(type="omfile" name="out" template="outfmt")
''',
], ids=["stop", "stop2"])
def test_reference_stop_goldens(ray_session, script):
    """tests/rscript_stop.sh / rscript_stop2.sh — STOP keeps only
    msgnum < threshold (seq_check 0 49 of 80 injected)."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_injectmsg(80))
    cc = load_rainerscript(script)
    routed = route_table(parsed, cc.ruleset)
    assert sorted(routed["out"]["rendered"].to_pylist()) == [
        f"{i:08d}" for i in range(50)]


@needs_ref
def test_reference_bare_var_root_golden(ray_session):
    """tests/rscript_bare_var_root.sh — `set $! = $.;` replaces the
    whole message tree with the local tree; template %$!% renders it.
    (json-c spacing normalized compactly — compared semantically.)"""
    import json as _json

    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_injectmsg(1))
    cc = load_rainerscript('''
template(name="outfmt" type="string" string="%$!%")
set $!a = "TEST1";
set $.a = "TEST-overwritten";
set $! = $.;
action(type="omfile" name="out" template="outfmt")
''')
    routed = route_table(parsed, cc.ruleset)
    assert _json.loads(routed["out"]["rendered"].to_pylist()[0]) == {
        "a": "TEST-overwritten"}


@needs_ref
def test_reference_bare_var_root_empty_golden(ray_session):
    """tests/rscript_bare_var_root-empty.sh — `set $. = $!; set $! = $.;`
    with both trees empty renders 'empty--' (cmp_exact)."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_injectmsg(1))
    cc = load_rainerscript('''
template(name="outfmt" type="string" string="empty-%$!%-")
set $. = $!;
set $! = $.;
action(type="omfile" name="out" template="outfmt")
''')
    routed = route_table(parsed, cc.ruleset)
    assert routed["out"]["rendered"].to_pylist() == ["empty--"]


@needs_ref
def test_reference_parse_json_function_golden(ray_session):
    """tests/rscript_parse_json.sh — two-arg parse_json stores at the
    named tree path; %$!% renders the tree (semantic compare; the
    engine normalizes json-c's spacing)."""
    import json as _json

    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_injectmsg(1))
    cc = load_rainerscript(r'''
template(name="outfmt" type="string" string="%$!%")
set $.ret = parse_json("{ \"c1\":\"data\" }", "\$!parsed");
action(type="omfile" name="out" template="outfmt")
''')
    routed = route_table(parsed, cc.ruleset)
    assert _json.loads(routed["out"]["rendered"].to_pylist()[0]) == {
        "parsed": {"c1": "data"}}


@needs_ref
def test_reference_is_time_golden(ray_session):
    """tests/rscript_is_time.sh — all 18 is_time probes (auto, explicit
    format, failures incl. unknown format) with the per-statement
    script_error() sequencing; values are NUMBERS 1/0 in the tree."""
    import json as _json

    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    cases = [
        ("date_auto_1", 'is_time("Oct  5 01:10:11")', 1),
        ("date_auto_2", 'is_time("2017-10-05T01:10:11Z")', 1),
        ("date_auto_3", 'is_time("2017-10-05T01:10:11-03:00")', 1),
        ("date_auto_4", 'is_time("90210")', 1),
        ("date_explicit_1", 'is_time("Oct  5 01:10:11", "date-rfc3164")', 1),
        ("date_explicit_2",
         'is_time("2017-10-05T01:10:11Z", "date-rfc3339")', 1),
        ("date_explicit_3",
         'is_time("2017-10-05T01:10:11+04:00", "date-rfc3339")', 1),
        ("date_explicit_4", 'is_time(90210, "date-unix")', 1),
        ("date_explicit_5", 'is_time(-88, "date-unix")', 1),
        ("date_explicit_6", 'is_time(0, "date-unix")', 1),
        ("date_explicit_7", 'is_time("90210", "date-unix")', 1),
        ("date_explicit_8", 'is_time("-88", "date-unix")', 1),
        ("date_fail_1", 'is_time("Oct 88 01:10:11")', 0),
        ("date_fail_2", 'is_time("not at all a date")', 0),
        ("date_fail_3", 'is_time("Oct  5 01:10:11", "date-rfc3339")', 0),
        ("date_fail_4",
         'is_time("2017-10-05T01:10:11Z", "date-rfc3164")', 0),
        ("date_fail_5", 'is_time("Oct  5 01:10:11", "date-unix")', 0),
        ("date_fail_6", 'is_time("90210", "date-spoonix")', 0),
    ]
    script = ['template(name="outfmt" type="subtree" subtree="$!result")']
    for name, call, _ok in cases:
        script.append(f"set $!result!{name} = {call};")
        script.append(f"set $!result!errno_{name} = script_error();")
    script.append('action(type="omfile" name="out" template="outfmt")')
    parsed = parse_table(_injectmsg(1))
    cc = load_rainerscript("\n".join(script))
    routed = route_table(parsed, cc.ruleset)
    got = _json.loads(routed["out"]["rendered"].to_pylist()[0])
    expected = {}
    for name, _call, ok in cases:
        expected[name] = ok
        expected[f"errno_{name}"] = 0 if ok else 1
    assert got == expected


@needs_ref
def test_reference_get_property_golden(ray_session):
    """tests/rscript_get_property.sh — dynamic object/array access,
    `key[idx]` paths, reset statements, dynamic keys; res1..res16
    compared as rendered strings (the engine's $. locals are string
    columns — typed-tree rendering is a documented deviation)."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_injectmsg(1))
    tmpl = "|".join(f"%$.res{i}%" for i in range(1, 17))
    cc = load_rainerscript(r'''
template(name="outfmt" type="string" string="''' + tmpl + r'''")
set $.ret = parse_json("{\"offsets\": [ { \"a\": 9, \"b\": 0, \"c\": \"boo\", \"d\": null }, { \"a\": 9, \"b\": 3, \"c\": null, \"d\": null } ], \"booltest\": true, \"int64\": 1234567890, \"nulltest\": null, \"foo\": 3, \"bar\": 28 }", "\$!parsed");
if $.ret == 0 then {
    set $!foo!bar = 3;
    set $.index = "1";
    set $.test = "a";
    set $.res1 = get_property($!parsed!offsets, $.index);
    set $.res2 = get_property($!parsed!offsets[1], $.test);
    reset $.test = "bar";
    set $.res3 = get_property($!foo, $.test);
    reset $.index = 5;
    set $.res4 = get_property($!parsed!offsets, $.index);
    set $.key = "test";
    set $.res5 = get_property($., $.key);
    reset $.key = "foo";
    set $.res6 = get_property($!, $.key);
    set $.res7 = get_property($!foo, "bar");
    reset $.key = "ar";
    set $.res8 = get_property($!foo, "b" & $.key);
    set $.res9 = get_property($!foo!bar, "");
    reset $.key = "";
    set $.res10 = get_property($!foo!bar, $.key);
    set $.res11 = get_property($!parsed!booltest, "");
    reset $.key = "int64";
    set $.res12 = get_property($!parsed, $.key);
    reset $.key = "nulltest";
    set $.res13 = get_property($!parsed, $.key);
    set $.res15 = get_property($msg, "");
    set $.res16 = get_property("string literal", "");
    action(type="omfile" name="out" template="outfmt")
}
''')
    routed = route_table(parsed, cc.ruleset)
    got = routed["out"]["rendered"].to_pylist()[0].split("|")
    assert got[0] == '{"a":9,"b":3,"c":null,"d":null}'   # res1
    assert got[1] == "9"                                  # res2
    assert got[2] == "3"                                  # res3
    assert got[3] == ""                                   # res4 (oob)
    assert got[4] == "bar"                                # res5 ($. tree)
    assert got[5] == '{"bar":3}'                          # res6 ($! tree)
    assert got[6] == "3" and got[7] == "3"                # res7/res8
    assert got[8] == "3" and got[9] == "3"                # res9/res10
    assert got[10] == "1"                                 # res11 bool
    assert got[11] == "1234567890"                        # res12
    assert got[12] == ""                                  # res13 null
    # res14 (double) omitted: C double printing differs, documented
    assert got[14] == " msgnum:00000000:"                 # res15 ($msg)
    assert got[15] == ""                                  # res16 literal


@needs_ref
@pytest.mark.parametrize("cond,stop_form,expected", [
    ('$!usr!msgnum == "00000050" or $!usr!msgnum == "00000051" '
     'or $!usr!msgnum == "00000052"', False, [50, 51, 52]),     # eq
    ('$!usr!msgnum != "00000050" and $!usr!msgnum != "00000051" '
     'and $!usr!msgnum != "00000052"', True, [50, 51, 52]),     # ne
    ('$!usr!msgnum > "00000049"', False, list(range(50, 100))),  # gt
    ('$!usr!msgnum >= "00000050"', True, list(range(50))),       # ge
    ('$!usr!msgnum < "00000050"', False, list(range(50))),       # lt
    ('$!usr!msgnum <= "00000050"', False, list(range(51))),      # le
], ids=["eq", "ne", "gt", "ge", "lt", "le"])
def test_reference_compare_goldens(ray_session, cond, stop_form, expected):
    """tests/rscript_{eq,ne,gt,ge,lt,le}.sh — tree-var comparisons over
    zero-padded msgnum fields (each script's seq_check window, scaled
    to 100 injected messages)."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    body = (f"if {cond} then\n    stop\n"
            'action(type="omfile" name="out" template="outfmt")'
            if stop_form else
            f"if {cond} then\n"
            '    action(type="omfile" name="out" template="outfmt")')
    parsed = parse_table(_injectmsg(100))
    cc = load_rainerscript(f'''
template(name="outfmt" type="list") {{ property(name="$!usr!msgnum") }}
if $msg contains "msgnum" then {{
    set $!usr!msgnum = field($msg, 58, 2);
    {body}
}}
''')
    routed = route_table(parsed, cc.ruleset)
    assert sorted(routed["out"]["rendered"].to_pylist()) == [
        f"{i:08d}" for i in expected]


@needs_ref
def test_reference_eq_var_golden(ray_session):
    """tests/rscript_eq_var.sh — var-to-var equality with mutation and
    unset between compares; every message must survive to the sink."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_injectmsg(20))
    cc = load_rainerscript('''
template(name="outfmt" type="list") {
    property(name="msg" field.delimiter="58" field.number="2")
}
set $!var1 = "value";
set $!var2 = "value";
if $!var1 == $!var2 then {
    set $!var2 = "bad";
    if $!var1 == $!var2 then {
        stop
    } else {
        unset $!var1;
        unset $!var2;
    }
} else {
    stop
}
action(type="omfile" name="out" template="outfmt")
''')
    routed = route_table(parsed, cc.ruleset)
    assert sorted(routed["out"]["rendered"].to_pylist()) == [
        f"{i:08d}" for i in range(20)]


@needs_ref
def test_reference_json_array_looping_golden(ray_session):
    """tests/json_array_looping.sh — nested foreach over a JSON array
    (incl. reading paths INTO the loop variable: $.quux!bar,
    $.grault!baz), call inside the loop body, and a cross-iteration
    string accumulator; the script's content_checks."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.enrich import mmjsonparse_table
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    line = open(f"{REF}/testsuites/json_array_input").read().strip()
    parsed = mmjsonparse_table(parse_table(_inject_table([line])))
    cc = load_rainerscript('''
template(name="garply" type="string" string="garply: %$.garply%")
template(name="grault" type="string" string="grault: %$.grault%")
template(name="prefixed_grault" type="string"
         string="prefixed_grault: %$.grault%")
template(name="quux" type="string" string="quux: %$.quux%")
set $.garply = "";
ruleset(name="prefixed_writer") {
  action(type="omfile" name="prefixed" template="prefixed_grault")
}
foreach ($.quux in $!foo) do {
  action(type="omfile" name="quux_out" template="quux")
  foreach ($.corge in $.quux!bar) do {
     reset $.grault = $.corge;
     action(type="omfile" name="async" template="grault")
     call prefixed_writer
     if ($.garply != "") then
         set $.garply = $.garply & ", ";
     reset $.garply = $.garply & $.grault!baz;
  }
}
action(type="omfile" name="out" template="garply")
''')
    routed = route_table(parsed, cc.ruleset)
    quux = routed["quux_out"]["rendered"].to_pylist()
    assert "quux: abc0" in quux and "quux: def1" in quux \
        and "quux: ghi2" in quux
    # the 4th element renders as the (normalized) object text
    assert any(q.startswith('quux: {"bar":') for q in quux)
    for key in ("async", "prefixed"):
        got = routed[key]["rendered"].to_pylist()
        assert any("important_msg" in g for g in got), key
        assert any("other_msg" in g for g in got), key
    assert routed["out"]["rendered"].to_pylist() == [
        "garply: important_msg, other_msg"]


@needs_ref
def test_reference_json_array_subscripting_golden(ray_session):
    """tests/json_array_subscripting.sh — [N] subscripts in template
    property paths and set sources, incl. chained array hops
    ($!foo[3]!bar[1]!baz); object renders normalized-compact."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.enrich import mmjsonparse_table
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    line = open(f"{REF}/testsuites/json_array_input").read().strip()
    parsed = mmjsonparse_table(parse_table(_inject_table([line])))
    cc = load_rainerscript('''
template(name="outfmt" type="string"
  string="msg: %$!foo[1]% | %$.quux% | %$.corge% | %$.grault% | %$!foo[3]!bar[1]!baz%")
set $.quux = $!foo[2];
set $.corge = $!foo[3]!bar[0]!baz;
set $.grault = $!foo[3]!bar[1];
action(type="omfile" name="out" template="outfmt")
''')
    routed = route_table(parsed, cc.ruleset)
    assert routed["out"]["rendered"].to_pylist() == [
        'msg: def1 | ghi2 | important_msg | {"baz":"other_msg"} | '
        'other_msg']


@needs_ref
@pytest.mark.parametrize("sets,expected_a", [
    # conflict1: intermediate string node overridden by an object
    ('set $!a!b = "foo";\nset $!a.b.c = "bar";',
     {"b": {"c": "bar"}}),
    # conflict2: final node overridden by an OBJECT from a local subtree
    ('set $.x!a = 21;\nset $!a!b = "foo";\nset $!a.b = $.x;',
     {"b": {"a": "21"}}),
    # conflict3: final node plain override
    ('set $!a!b = "foo";\nset $!a.b = "bar";',
     {"b": "bar"}),
], ids=["conflict1", "conflict2", "conflict3"])
def test_reference_unflatten_conflicts(ray_session, sets, expected_a):
    """tests/rscript_unflatten_conflict{1,2,3}.sh — flat dotted keys
    override existing nested values during unflatten; script_error
    stays 0. (conflict2's 21 renders as "21": locals are string
    columns, documented deviation.)"""
    import json as _json

    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_injectmsg(1))
    cc = load_rainerscript(f'''
template(name="outfmt" type="string" string="%$.ret% %$.unflatten%")
{sets}
set $.unflatten = unflatten($!, ".");
set $.ret = script_error();
action(type="omfile" name="out" template="outfmt")
''')
    routed = route_table(parsed, cc.ruleset)
    ret, _, tree_txt = routed["out"]["rendered"].to_pylist()[0].partition(
        " ")
    assert ret == "0"
    assert _json.loads(tree_txt)["a"] == expected_a


@needs_ref
def test_reference_prop_programname_golden(ray_session):
    """tests/prop-programname.sh — programname is the TAG up to the
    first ':', '[', '/' (aquireProgramName, slashes not permitted by
    default); cmp_exact 'tag/with/slashes,tag'."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_inject_table(
        ["<133>2011-03-01T11:22:12Z host tag/with/slashes msgh ...x"]))
    cc = load_rainerscript('''
template(name="outfmt" type="string" string="%syslogtag%,%programname%")
local0.* action(type="omfile" name="out" template="outfmt")
''')
    routed = route_table(parsed, cc.ruleset)
    assert routed["out"]["rendered"].to_pylist() == [
        "tag/with/slashes,tag"]


@needs_ref
def test_reference_empty_prop_comparison_golden(ray_session):
    """tests/empty-prop-comparison.sh — an empty-string tree var
    compares equal to "" (the stop guard passes only the msgnum:0
    row); %msg:F,58:2% field template."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    lines = ["<167>Mar  6 16:57:54 172.20.245.8 test: msgnum:0",
             "<167>Mar  6 16:57:54 172.20.245.8 test: msgnum:"]
    parsed = parse_table(_inject_table(lines))
    cc = load_rainerscript('''
template(name="outfmt" type="string" string="%msg:F,58:2%")
set $!doOutput = "";
if $msg contains "msgnum:0" then
    set $!doOutput = "1";
if $!doOutput == "" then stop
action(type="omfile" name="out" template="outfmt")
''')
    routed = route_table(parsed, cc.ruleset)
    assert routed["out"]["rendered"].to_pylist() == ["0"]


@needs_ref
def test_reference_mmpstrucdata_case_goldens(ray_session):
    """tests/mmpstrucdata.sh + mmpstrucdata-case.sh — sd_name.lowercase
    defaults ON (eventID → eventid); off keeps case; names truncate at
    32 chars (parseSD_NAME buffer)."""
    import json as _json

    from rsyslog_ray.stages.enrich import mmpstrucdata_table
    from rsyslog_ray.stages.parse import parse_table

    line = ('<161>1 2003-03-01T01:00:00.000Z mymachine.example.com '
            'tcpflood - tag [tcpflood@32473 eventID="1011"] '
            'valid structured data')
    parsed = parse_table(_inject_table([line]))
    on = mmpstrucdata_table(parsed)
    assert _json.loads(on["rfc5424_sd"].to_pylist()[0]) == {
        "tcpflood@32473": {"eventid": "1011"}}
    off = mmpstrucdata_table(parsed, sd_name_lowercase=False)
    assert _json.loads(off["rfc5424_sd"].to_pylist()[0]) == {
        "tcpflood@32473": {"eventID": "1011"}}
    # 32-char name truncation
    long = parse_table(_inject_table([
        '<161>1 2003-03-01T01:00:00.000Z h t - g '
        '[sd@1 ' + "k" * 40 + '="v"] m']))
    t = mmpstrucdata_table(long)
    assert _json.loads(t["rfc5424_sd"].to_pylist()[0]) == {
        "sd@1": {"k" * 32: "v"}}


@needs_ref
def test_reference_mmjsonparse_container_goldens(ray_session):
    """tests/mmjsonparse_cim.sh (+_cim2) and mmjsonparse_localvar.sh —
    cookie="@cim:" with container="!cim" nests under $!cim; container
    "$." stores into local variables."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.enrich import mmjsonparse_table
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    lines = [f'<167>Mar  1 01:00:00 h tag: @cim: {{"msgnum":"{i:08d}"}}'
             for i in range(5)]
    parsed = parse_table(_inject_table(lines))

    cim = mmjsonparse_table(parsed, cookie="@cim:", container="!cim")
    cc = load_rainerscript('''
template(name="outfmt" type="string" string="%$!cim!msgnum%")
if $parsesuccess == "OK" then {
    action(type="omfile" name="out" template="outfmt")
}
''')
    routed = route_table(cim, cc.ruleset)
    assert sorted(routed["out"]["rendered"].to_pylist()) == [
        f"{i:08d}" for i in range(5)]

    loc = mmjsonparse_table(parsed, cookie="@cim:", container="$.")
    cc2 = load_rainerscript('''
template(name="outfmt" type="string" string="%$.msgnum%")
if $parsesuccess == "OK" then {
    action(type="omfile" name="out" template="outfmt")
}
''')
    routed2 = route_table(loc, cc2.ruleset)
    assert sorted(routed2["out"]["rendered"].to_pylist()) == [
        f"{i:08d}" for i in range(5)]


@needs_ref
def test_reference_lookup_table_reload_golden(ray_session, tmp_path):
    """tests/lookup_table.sh — the reference's OWN xlate fixtures
    through lookup() + HUP hot reload: old table, reloaded table, then
    the duplicates+nomatch table (last-wins per the reference's sorted
    load; nomatch string for misses)."""
    import shutil

    from rsyslog_ray.lookup import ReloadableLookup
    from rsyslog_ray.rainerscript import parse_rainerscript
    from rsyslog_ray.config import load_config
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    tbl_path = tmp_path / "xlate.lkp_tbl"
    shutil.copy(f"{REF}/testsuites/xlate.lkp_tbl", tbl_path)
    cfg = parse_rainerscript(f'''
lookup_table(name="xlate" file="{tbl_path}" reloadOnHUP="on")
template(name="outfmt" type="string" string="%msg% %$.lkp%")
set $.lkp = lookup("xlate", $msg);
action(type="omfile" name="out" template="outfmt")
''')
    compiled = load_config(cfg)

    def run(n):
        parsed = parse_table(_injectmsg(n))
        routed = route_table(parsed, compiled.ruleset)
        return dict(r.rsplit(" ", 1) for r in
                    routed["out"]["rendered"].to_pylist())

    got = run(3)
    assert got[" msgnum:00000000:"] == "foo_old"
    assert got[" msgnum:00000001:"] == "bar_old"
    assert "baz" not in got.values()

    shutil.copy(f"{REF}/testsuites/xlate_more.lkp_tbl", tbl_path)
    for t in compiled.tables.values():
        if isinstance(t, ReloadableLookup):
            t.reload()
    # plain LookupTable loaded from file: rebuild the config's tables
    compiled2 = load_config(cfg)
    got = {}
    parsed = parse_table(_injectmsg(3))
    routed = route_table(parsed, compiled2.ruleset)
    got = dict(r.rsplit(" ", 1) for r in
               routed["out"]["rendered"].to_pylist())
    assert got[" msgnum:00000000:"] == "foo_new"
    assert got[" msgnum:00000001:"] == "bar_new"
    assert got[" msgnum:00000002:"] == "baz"

    shutil.copy(
        f"{REF}/testsuites/xlate_more_with_duplicates_and_nomatch.lkp_tbl",
        tbl_path)
    compiled3 = load_config(cfg)
    parsed = parse_table(_injectmsg(10))
    routed = route_table(parsed, compiled3.ruleset)
    got = dict(r.rsplit(" ", 1) for r in
               routed["out"]["rendered"].to_pylist())
    expected = {0: "foo_latest", 1: "quux", 2: "baz_latest",
                3: "foo_latest", 4: "foo_latest", 5: "baz_latest",
                6: "foo_latest", 7: "baz_latest", 8: "baz_latest",
                9: "quux"}
    for i, v in expected.items():
        assert got[f" msgnum:{i:08d}:"] == v, i


@needs_ref
def test_reference_array_lookup_table_golden(ray_session, tmp_path):
    """tests/array_lookup_table.sh (first phase) — type=array lookup
    over the numeric field key, with the reference's own fixture."""
    import shutil

    from rsyslog_ray.rainerscript import parse_rainerscript
    from rsyslog_ray.config import load_config
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    tbl_path = tmp_path / "xlate_array.lkp_tbl"
    shutil.copy(f"{REF}/testsuites/xlate_array.lkp_tbl", tbl_path)
    cfg = parse_rainerscript(f'''
lookup_table(name="xlate" file="{tbl_path}")
template(name="outfmt" type="string" string="%msg% %$.lkp%")
set $.num = field($msg, 58, 2);
set $.lkp = lookup("xlate", $.num);
action(type="omfile" name="out" template="outfmt")
''')
    routed = route_table(parse_table(_injectmsg(3)),
                         load_config(cfg).ruleset)
    got = dict(r.rsplit(" ", 1) for r in
               routed["out"]["rendered"].to_pylist())
    assert got[" msgnum:00000000:"] == "foo_old"
    assert got[" msgnum:00000001:"] == "bar_old"
    assert "baz" not in got.values()


@needs_ref
def test_reference_fieldtest_golden(ray_session):
    """tests/fieldtest.sh — %msg:F,32:2% field extraction bound through
    an input ruleset; cmp 'DROP_url_www.sina.com.cn:IN=eth1'."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    line = ("<167>Mar  6 16:57:54 172.20.245.8 %PIX-7-710005: "
            "DROP_url_www.sina.com.cn:IN=eth1 OUT=eth0 SRC=192.168.10.78 "
            "DST=61.172.201.194 LEN=1182 TOS=0x00 PREC=0x00 TTL=63 "
            "ID=14368 DF PROTO=TCP SPT=33343 DPT=80 WINDOW=92 RES=0x00 "
            "ACK PSH URGP=0")
    parsed = parse_table(_inject_table([line]))
    cc = load_rainerscript('''
template(name="outfmt" type="string" string="%msg:F,32:2%")
action(type="omfile" name="out" template="outfmt")
''')
    routed = route_table(parsed, cc.ruleset)
    assert routed["out"]["rendered"].to_pylist() == [
        "DROP_url_www.sina.com.cn:IN=eth1"]


@needs_ref
def test_reference_discard_golden(ray_session):
    """tests/discard.sh — the classic `~` discard selector plus a
    `?dynfile;outfmt` dynafile action with a legacy \$template;
    seq_check 1..N-1 (msgnum 0 discarded)."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_injectmsg(30))
    cc = load_rainerscript('''
:msg, contains, "00000000" ~

$template outfmt,"%msg:F,58:2%\\n"
template(name="dynfile" type="string" string="out")
:msg, contains, "msgnum:" ?dynfile;outfmt
''')
    routed = route_table(parsed, cc.ruleset)
    got = sorted(r.rstrip("\\n").rstrip("\n")
                 for r in routed["dyn_dynfile"]["rendered"].to_pylist())
    assert got == [f"{i:08d}" for i in range(1, 30)]


@needs_ref
def test_reference_mmjsonparse_cookie_empty_multispace_golden(ray_session):
    """tests/mmjsonparse-w-o-cookie-multi-spaces.sh — cookie='' parses
    JSON after arbitrary leading spaces in MSG."""
    from rsyslog_ray.stages.enrich import mmjsonparse_table
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.functions import json_get

    lines = [f'<167>Mar  1 01:00:00 h tag:       {{"msgnum":"{i:08d}"}}'
             for i in range(5)]
    parsed = mmjsonparse_table(parse_table(_inject_table(lines)),
                               cookie="")
    assert parsed["cee_parsesuccess"].to_pylist() == [True] * 5
    got = json_get(parsed["cee_json"].combine_chunks(),
                   "msgnum").to_pylist()
    assert sorted(got) == [f"{i:08d}" for i in range(5)]


@needs_ref
def test_reference_mmjsonparse_invalid_container_rejected(ray_session):
    """tests/mmjsonparse-invalid-containerName.sh — a container not
    starting with '!' or '.' (or '$'-prefixed forms) is a config
    error."""
    import pyarrow as pa
    import pytest

    from rsyslog_ray.stages.enrich import mmjsonparse_table

    with pytest.raises(ValueError, match="container"):
        mmjsonparse_table(pa.table({"msg": ["x"]}), container="foobar")


@needs_ref
def test_reference_optimizer1_golden(ray_session):
    """tests/rscript_optimizer1.sh — `if prifilt("syslog.*") then stop
    else <action>` with local4 traffic: nothing matches syslog.*, every
    message takes the else branch (seq_check)."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_injectmsg(40))
    cc = load_rainerscript('''
template(name="outfmt" type="list") {
    property(name="msg" field.delimiter="58" field.number="2")
}
if prifilt("syslog.*") then
    stop
else
    action(type="omfile" name="out" template="outfmt")
''')
    routed = route_table(parsed, cc.ruleset)
    assert sorted(routed["out"]["rendered"].to_pylist()) == [
        f"{i:08d}" for i in range(40)]


@needs_ref
def test_reference_template_pos_variants_goldens(ray_session):
    """tests/template-pos-from-to-{lowercase,oversize,
    oversize-lowercase}.sh — case conversion composes with the position
    window; an out-of-range window renders empty in BOTH string and
    list forms."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    parsed = parse_table(_inject_table(
        ["<167>Mar  1 01:00:00 172.20.245.8 tag msgnum:0000000A:"]))

    def render(tpl_block):
        cc = load_rainerscript(tpl_block + '''
:msg, contains, "msg" action(type="omfile" name="out" template="outfmt")
''')
        return route_table(parsed, cc.ruleset)["out"][
            "rendered"].to_pylist()

    # chars 9..16 of " msgnum:0000000A:" are the digits+'A'; lowercase
    # composes after the window (msg.c case conv order)
    assert render('template(name="outfmt" type="string" '
                  'string="%msg:9:16:%")') == ["0000000A"]
    assert render('template(name="outfmt" type="string" '
                  'string="%msg:9:16:lowercase%")') == ["0000000a"]
    assert render('template(name="outfmt" type="string" '
                  'string="-%msg:109:116:%-")') == ["--"]
    assert render('template(name="outfmt" type="string" '
                  'string="-%msg:109:116:lowercase%-")') == ["--"]
    assert render('''template(name="outfmt" type="list") {
    constant(value="-")
    property(name="msg" position.from="109" position.to="116")
    constant(value="-")
}''') == ["--"]


@needs_ref
def test_reference_mmanon_recognize_ipv4_golden(ray_session):
    """tests/mmanon_recognize_ipv4.sh — the char scanner's full
    recognition matrix (mode=zero ipv4.bits=32): invalid octets fail
    and the scan advances one char ('256.0.0.0' → '20.0.0.0',
    '1111.1.1.8.1' → '10.0.0.0.1'), embedded addresses with no word
    boundary anonymize, malformed dot runs pass through — the script's
    exact 26-line cmp."""
    import pyarrow as pa

    from rsyslog_ray.stages.enrich import mmanon_table

    msgs = [" asdfghjk", " before 172.9.6.4", " 75.123.123.0 after",
            " before 181.23.1.4 after", " nothingnothingnothing",
            " before 181.23.1.4 after 172.1.3.4", " 1.1.1.8", " 1.1.1.8",
            " 1.1.1.9", " 0.0.0.0", " 1.2.3.4.5.6.7.8.76",
            " 172.0.234.255", " 1.0.0.0", " 1.225.225.225",
            " 172.0.234.255", " 3.4.5.6", " 256.0.0.0",
            " 1....1....1....8", " 1..1..1..8", " 1..1.1.8",
            " 1.1..1.8", " 1.1.1..8", " 1111.1.1.8.1", " 111.1.1.8.1",
            " 111.1.1.8.", " textnoblank1.1.1.9stillnoblank"]
    expected = [" asdfghjk", " before 0.0.0.0", " 0.0.0.0 after",
                " before 0.0.0.0 after", " nothingnothingnothing",
                " before 0.0.0.0 after 0.0.0.0", " 0.0.0.0", " 0.0.0.0",
                " 0.0.0.0", " 0.0.0.0", " 0.0.0.0.0.0.0.0.76",
                " 0.0.0.0", " 0.0.0.0", " 0.0.0.0", " 0.0.0.0",
                " 0.0.0.0", " 20.0.0.0", " 1....1....1....8",
                " 1..1..1..8", " 1..1.1.8", " 1.1..1.8", " 1.1.1..8",
                " 10.0.0.0.1", " 0.0.0.0.1", " 0.0.0.0.",
                " textnoblank0.0.0.0stillnoblank"]
    out = mmanon_table(pa.table({"msg": msgs}), mode="zero", bits=32)
    assert out["msg"].to_pylist() == expected


@needs_ref
def test_reference_mmanon_recognize_ipembedded_golden(ray_session):
    """tests/mmanon_recognize_ipembedded.sh — the embedded-IPv4-in-IPv6
    recognizer matrix (embeddedipv4.bits=128, zero): 6-group + dotted
    quad forms (plain and '::'-abbreviated) anonymize to the reference
    render '0:0:0:0:0:0:0.0.0.0'; prefixes before an invalid extra
    group survive; >4-hex-digit groups, hex 'octets' and plain IPv6
    pass through — the script's exact 20-line cmp."""
    import pyarrow as pa

    from rsyslog_ray.stages.enrich import mmanon_embedded_table

    msgs = [" asdfghjk",
            " FFFF:FFFF:FFFF:FFFF:FFFF:FFFF:255.255.255.255",
            " 61:34:ad::7:F aa:ff43::756:172.2.3.4",
            " ::", " 0::", " ::0.0.0.0",
            " 13:abd:45:1:1:1:0.0.0.0",
            " 13:abd:45::1:1:0.0.0.0",
            " 13:abd:45:1:1:1:1:0.0.0.0",
            " 13:abd:45:1:1:1::1:0.0.0.0",
            " 13:abd:45:0.0.0.0",
            " 13:abd:45::. test",
            " 13:abd:45::1.2.3.4 test",
            " *13:abd:45::ac.2.3.5* test",
            " ewirnwem aa:ff43:756:99:ff:445:cc.1.2.3.4",
            " aa::ff:bb:122:0:44.1.23.4.0",
            " 12:12345::a.3.4.12.7",
            " textnoblank72:8374:adc7:47FF::43:172.1.1.0",
            " 72:8374:adc7:47FF::43:172.1.1.0stillnoblank",
            " textnoblank72:8374:adc7:47FF::43:172.1.1.0stillnoblank"]
    expected = [" asdfghjk",
                " 0:0:0:0:0:0:0.0.0.0",
                " 61:34:ad::7:F 0:0:0:0:0:0:0.0.0.0",
                " ::", " 0::",
                " 0:0:0:0:0:0:0.0.0.0",
                " 0:0:0:0:0:0:0.0.0.0",
                " 0:0:0:0:0:0:0.0.0.0",
                " 13:0:0:0:0:0:0:0.0.0.0",
                " 13:abd:0:0:0:0:0:0:0.0.0.0",
                " 13:abd:45:0.0.0.0",
                " 13:abd:45::. test",
                " 0:0:0:0:0:0:0.0.0.0 test",
                " *13:abd:45::ac.2.3.5* test",
                " ewirnwem aa:ff43:756:99:ff:445:cc.1.2.3.4",
                " 0:0:0:0:0:0:0.0.0.0.0",
                " 12:12345::a.3.4.12.7",
                " textnoblank0:0:0:0:0:0:0.0.0.0",
                " 0:0:0:0:0:0:0.0.0.0stillnoblank",
                " textnoblank0:0:0:0:0:0:0.0.0.0stillnoblank"]
    out = mmanon_embedded_table(pa.table({"msg": msgs}), mode="zero",
                                bits=128)
    assert out["msg"].to_pylist() == expected


@needs_ref
def test_reference_mmanon_recognize_ipv6_golden(ray_session):
    """tests/mmanon_recognize_ipv6.sh — the plain-IPv6 recognizer
    matrix (ipv6.bits=128, zero): full/abbreviated/embedded-in-text
    addresses anonymize to the explicit eight-group render; partial
    group runs and '*'-adjacent non-addresses survive; '12:12345::a'
    keeps '12:1' and anonymizes '2345::a' — the script's exact 16-line
    cmp."""
    import pyarrow as pa

    from rsyslog_ray.stages.enrich import mmanon_ipv6_table

    msgs = [" asdfghjk", " FFFF:FFFF:FFFF:FFFF:FFFF:FFFF:FFFF:FFFF",
            " 61:34:ad::7:F aa:ff43::756:99:0", " ::", " 0::",
            " 13:abd:45:", " 13:abd:45::. test", " 13:abd:45::* test",
            " *13:abd:45::* test", " 13:abd:45:* test",
            " ewirnwemaa:ff43::756:99:0", " a::, cc:: LLL",
            " 12:12345::a",
            " textnoblank72:8374:adc7:47FF::43:0:1AFE",
            " 72:8374:adc7:47FF::43:0:1AFEstillnoblank",
            " textnoblank72:8374:adc7:47FF::43:0:1AFEstillnoblank"]
    expected = [" asdfghjk", " 0:0:0:0:0:0:0:0",
                " 0:0:0:0:0:0:0:0 0:0:0:0:0:0:0:0", " 0:0:0:0:0:0:0:0",
                " 0:0:0:0:0:0:0:0", " 13:abd:45:",
                " 0:0:0:0:0:0:0:0. test", " 0:0:0:0:0:0:0:0* test",
                " *0:0:0:0:0:0:0:0* test", " 13:abd:45:* test",
                " ewirnwem0:0:0:0:0:0:0:0",
                " 0:0:0:0:0:0:0:0, 0:0:0:0:0:0:0:0 LLL",
                " 12:10:0:0:0:0:0:0:0",
                " textnoblank0:0:0:0:0:0:0:0",
                " 0:0:0:0:0:0:0:0stillnoblank",
                " textnoblank0:0:0:0:0:0:0:0stillnoblank"]
    out = mmanon_ipv6_table(pa.table({"msg": msgs}), mode="zero",
                            bits=128)
    assert out["msg"].to_pylist() == expected


@needs_ref
def test_reference_mmanon_simple_mode_goldens(ray_session):
    """tests/mmanon_simple_{8,12,33}_ipv4.sh — SIMPLE mode overwrites
    the digits of the last ceil(bits/8) octets with the replacement
    char, preserving layout; bits=33 clamps to whole-address."""
    import pyarrow as pa

    from rsyslog_ray.stages.enrich import mmanon_table

    msgs = [" 1.1.1.8", " 0.0.0.0", " 172.0.234.255", " 111.1.1.8."]
    t = pa.table({"msg": msgs})
    assert mmanon_table(t, mode="simple", bits=12)["msg"].to_pylist() == \
        [" 1.1.x.x", " 0.0.x.x", " 172.0.xxx.xxx", " 111.1.x.x."]
    assert mmanon_table(t, mode="simple", bits=8)["msg"].to_pylist() == \
        [" 1.1.1.x", " 0.0.0.x", " 172.0.234.xxx", " 111.1.1.x."]
    t2 = pa.table({"msg": [" before 172.9.6.4", " 12.123.123.1 after"]})
    assert mmanon_table(t2, mode="simple", bits=33,
                        replace_char="*")["msg"].to_pylist() == \
        [" before ***.*.*.*", " **.***.***.* after"]


@needs_ref
def test_reference_mmrm1stspace_basic_golden(ray_session):
    """tests/mmrm1stspace-basic.sh — exactly ONE leading space strips
    (double space keeps one; no space and empty msg unchanged), with a
    :syslogtag, contains filter."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.enrich import mmrm1stspace_table
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    lines = ["<129>Mar 10 01:00:00 172.20.245.8 tag: msgnum:1",
             "<129>Mar 10 01:00:00 172.20.245.8 tag:  msgnum:2",
             "<129>Mar 10 01:00:00 172.20.245.8 tag:msgnum:3",
             "<129>Mar 10 01:00:00 172.20.245.8 tag4:"]
    parsed = mmrm1stspace_table(parse_table(_inject_table(lines)))
    cc = load_rainerscript('''
template(name="outfmt" type="string" string="-%msg%-")
:syslogtag, contains, "tag" action(type="omfile" name="out"
                                   template="outfmt")
''')
    routed = route_table(parsed, cc.ruleset)
    assert routed["out"]["rendered"].to_pylist() == [
        "-msgnum:1-", "- msgnum:2-", "-msgnum:3-", "--"]


@needs_ref
def test_reference_mmtaghostname_tag_golden(ray_session):
    """tests/mmtaghostname_tag.sh — forced TAG on an RFC5424 message;
    hostname and msg untouched (cmp line)."""
    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.enrich import mmtaghostname_table
    from rsyslog_ray.stages.parse import parse_table
    from rsyslog_ray.stages.route import route_table

    line = ("<189>1 2019-03-03T16:09:56.185+00:00 server app 123.4 "
            "msgid - %SYS-5-CONFIG_I: Configured from console by "
            "adminsepp on vty0 (10.23.214.226)")
    parsed = mmtaghostname_table(parse_table(_inject_table([line])),
                                 tag="source-imtcp")
    cc = load_rainerscript('''
template(name="test" type="string"
         string="tag: %syslogtag%, server: %hostname%, msg: %msg%")
action(type="omfile" name="out" template="test")
''')
    routed = route_table(parsed, cc.ruleset)
    assert routed["out"]["rendered"].to_pylist() == [
        "tag: source-imtcp, server: server, msg: %SYS-5-CONFIG_I: "
        "Configured from console by adminsepp on vty0 (10.23.214.226)"]


@needs_ref
def test_reference_imfile_readmode2_golden(ray_session, tmp_path):
    """tests/imfile-readmode2.sh — ReadMode=2 joins indented
    continuation lines with the #012 LF escape (the script's grep
    checks for msgnum:1..4 inside joined records). Batch deviation,
    documented: EOF flushes the final record, where streaming imfile
    holds it for a possible continuation."""
    from rsyslog_ray.sources.files import read_syslog_text

    p = tmp_path / "in.input"
    p.write_text("msgnum:0\n msgnum:1\nmsgnum:2\n"
                 "msgnum:3\n msgnum:4\nmsgnum:5\n")
    got = [r["text"] for r in
           read_syslog_text([str(p)], read_mode=2).take_all()]
    assert got == ["msgnum:0#012 msgnum:1", "msgnum:2",
                   "msgnum:3#012 msgnum:4", "msgnum:5"]


@needs_ref
def test_reference_pmnormalize_basic_golden(ray_session):
    """tests/pmnormalize-basic.sh — pmnormalize as a PARSER: the
    reference's own rulebase extracts pri/hostname/syslogtag/
    fromhost-ip/msg from the raw line; the script's exact 3-line
    cmp_exact through the property template."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rsyslog_ray.stages.normalize import NormalizeStage, RuleBase
    from rsyslog_ray.templates import Template

    rb = RuleBase.from_file(
        f"{REF}/testsuites/pmnormalize_basic.rulebase")
    lines = ["<189> ubuntu tag1: is no longer listening on "
             "127.0.0.1 test",
             "<112> debian tag2: is no longer listening on "
             "255.255.255.255 test",
             "<177> centos tag3: is no longer listening on "
             "192.168.0.9 test"]
    st = NormalizeStage(rb, source="text", keep=[])
    out = st(pa.table({"text": lines}))
    assert out["parse_success"].to_pylist() == [True] * 3
    # pmnormalize maps the well-known field names onto the message
    # (pmnormalize.c): pri decomposes into facility/severity
    pri = pc.cast(out["pri"], pa.int64())
    batch = pa.table({
        "msg": out["msg"],
        "hostname": out["hostname"],
        "tag": out["syslogtag"],
        "appname": pa.array([""] * 3, pa.string()),
        "pri": pri,
        "facility": pc.divide(pri, 8),
        "severity": pc.bit_wise_and(pri, 7),
        "fromhost_ip": out["fromhost-ip"],
    })
    tpl = Template("host: %hostname%, ip: %fromhost-ip%, "
                   "tag: %syslogtag%, pri: %pri%, "
                   "syslogfacility: %syslogfacility%, "
                   "syslogseverity: %syslogseverity% msg: %msg%")
    assert tpl.render(batch).to_pylist() == [
        "host: ubuntu, ip: 127.0.0.1, tag: tag1, pri: 189, "
        "syslogfacility: 23, syslogseverity: 5 msg: test",
        "host: debian, ip: 255.255.255.255, tag: tag2, pri: 112, "
        "syslogfacility: 14, syslogseverity: 0 msg: test",
        "host: centos, ip: 192.168.0.9, tag: tag3, pri: 177, "
        "syslogfacility: 22, syslogseverity: 1 msg: test"]


@needs_ref
def test_reference_pmlastmsg_golden(ray_session):
    """tests/pmlastmsg.sh — the rsyslog.lastline → rfc5424 → rfc3164
    parser chain: strict 'last message repeated N times' markers keep
    the WHOLE message as MSG; near-misses (double space, trailing data,
    non-integer N) fall through to the regular parsers; a 5424 message
    whose SD-msg is a marker text parses as 5424 (the chain checks the
    RAW message)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rsyslog_ray.stages.parse import PMLASTMSG_RE, parse_table

    lines = ["<13>last message repeated 5 times",
             "<13>last message repeated 0090909787348927349875 times",
             "<13>last message  repeated 5 times",
             "<13>last message repeated 5 times -- more data",
             "<13>last message repeated 5.2 times",
             "<167>Mar  6 16:57:54 172.20.245.8 TAG: Rest of message...",
             "<34>1 2003-11-11T22:14:15.003Z mymachine.example.com su - "
             "ID47 last message repeated 5 times"]
    t = _inject_table(lines)
    parsed = parse_table(t)
    # chain front: pmlastmsg claims rows whose raw (after PRI) matches
    raw = pc.replace_substring_regex(
        pc.cast(t["text"], pa.string()), pattern=r"^<\d{1,3}>",
        replacement="")
    is_marker = pc.match_substring_regex(raw, pattern=PMLASTMSG_RE)
    msg = pc.if_else(is_marker, raw,
                     pc.cast(parsed["msg"], pa.string())).to_pylist()
    assert msg[0] == "last message repeated 5 times"
    assert msg[1] == "last message repeated 0090909787348927349875 times"
    # rows 2-4 are the critical pmlastmsg NEGATIVES: double space,
    # trailing data and non-integer N must NOT match the marker (they
    # fell to rfc3164 in the reference; our headerless-3164 fallback
    # keeps the full text as MSG — documented deviation in how the
    # NON-marker remainder parses, not in marker recognition)
    assert is_marker.to_pylist() == [True, True, False, False, False,
                                     False, False]
    assert msg[3].endswith("repeated 5 times -- more data")
    assert msg[4].endswith("repeated 5.2 times")
    assert msg[5] == " Rest of message..."
    assert msg[6] == "last message repeated 5 times"
