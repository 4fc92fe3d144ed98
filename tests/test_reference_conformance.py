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
        # engine stores TAG without the colon (the syslogtag property
        # re-appends it, as MsgSetTAG/PROP_SYSLOGTAG do)
        assert set(out["tag"].to_pylist()) == {"%PIX-7-710005"}, name
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
