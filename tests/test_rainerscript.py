"""RainerScript front-end: parse → object model → compiled pipeline
reproduces the hand-built flagship bit-for-bit."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from rsyslog_ray.config import load_config
from rsyslog_ray.pipelines.flagship import CEE_JSON_TEMPLATE, run_flagship
from rsyslog_ray.rainerscript import ParseError, parse_rainerscript

FLAGSHIP_SCRIPT = """
# flagship pipeline, RainerScript form
module(load="mmjsonparse")
template(name="marker" type="string" string="%msg%\\n")

if $syslogseverity == 7 and $role == 'system' then stop

if $syslogseverity <= 3 then
    action(type="omfile" name="errors" template="RSYSLOG_ForwardFormat")

if $msg contains 'msgnum:'
   and $syslogfacility == [16, 17, 18, 19, 20, 21, 22, 23] then {
    action(type="omfile" name="files" template="RSYSLOG_FileFormat"
           partition_by="facility")
}

if $is_cee and $cee_parsesuccess then
    action(type="omfile" name="cee" template="cee_json")
"""


def _rows(root, action):
    files = glob.glob(os.path.join(root, action, "**", "*.parquet"),
                      recursive=True)
    tbls = [pq.read_table(f, columns=["conv_id", "turn_idx"])
            for f in files]
    out = set()
    for t in tbls:
        out |= set(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()))
    return out


def test_rainerscript_reproduces_flagship(ray_session, tmp_path):
    cfg = parse_rainerscript(FLAGSHIP_SCRIPT)
    assert cfg["modifiers"] == ["mmjsonparse"]
    assert cfg["templates"]["marker"] == "%msg%\n"
    cfg.setdefault("templates", {})["cee_json"] = CEE_JSON_TEMPLATE
    ref_out = str(tmp_path / "ref")
    rs_out = str(tmp_path / "rs")
    ref_counts = run_flagship("/root/testdata/sf0.001", ref_out)
    rs_counts = load_config(cfg).run("/root/testdata/sf0.001", rs_out)
    # action names match; stop statement name is synthetic on both sides
    for k in ("errors", "files", "cee", "_input"):
        assert rs_counts[k] == ref_counts[k], k
    for action in ("errors", "files", "cee"):
        assert _rows(rs_out, action) == _rows(ref_out, action), action


def test_rainerscript_structures():
    cfg = parse_rainerscript("""
ruleset(name="sub") {
    if $msg contains 'x' then action(name="inner")
}
if prifilt('local0.err') then {
    call sub
    stop
} else action(name="other")
action(name="always")
""")
    acts = cfg["ruleset"]["actions"]
    assert [a.get("kind", "write") for a in acts] == \
        ["call", "stop", "write", "write"]
    assert acts[0]["ruleset"]["actions"][0]["name"] == "inner"
    assert acts[0]["filter"] == ["prifilt", "local0.err"]
    assert acts[2]["filter"] == ["not", ["prifilt", "local0.err"]]
    assert acts[3].get("filter") is None
    # nested if compounds with and; else negates
    cfg2 = parse_rainerscript("""
if $a == 1 then { if $b != 2 then action(name="n") }
""")
    f = cfg2["ruleset"]["actions"][0]["filter"]
    assert f == ["and", ["==", ["prop", "a"], 1],
                 ["!=", ["prop", "b"], 2]]


def test_rainerscript_expressions_and_errors():
    c = parse_rainerscript(
        "if not ($x > 3 or $y startswith 'ab') then stop")
    f = c["ruleset"]["actions"][0]["filter"]
    assert f == ["not", ["or", [">", ["prop", "x"], 3],
                         ["startswith", ["prop", "y"], ["lit", "ab"]]]]
    c = parse_rainerscript("if $a & '!' == 'z!' then stop")
    f = c["ruleset"]["actions"][0]["filter"]
    assert f == ["==", ["&", ["prop", "a"], ["lit", "!"]], ["lit", "z!"]]
    with pytest.raises(ParseError):
        parse_rainerscript("call missing_ruleset")
    with pytest.raises(ParseError):
        parse_rainerscript("if $a == then stop")
    with pytest.raises(ParseError):
        parse_rainerscript("frobnicate()")


def test_classic_selector_lines():
    cfg = parse_rainerscript("""
local0.err action(name="errs")
*.info;mail.none {
    action(name="info")
    stop
}
""")
    acts = cfg["ruleset"]["actions"]
    assert acts[0]["filter"] == ["prifilt", "local0.err"]
    assert acts[0]["name"] == "errs"
    assert acts[1]["filter"] == ["prifilt", "*.info;mail.none"]
    assert acts[2]["kind"] == "stop"
    assert acts[2]["filter"] == ["prifilt", "*.info;mail.none"]
    # numbers must still lex as numbers, not selectors
    c2 = parse_rainerscript("if $v == 1.5 then stop")
    assert c2["ruleset"]["actions"][0]["filter"] == \
        ["==", ["prop", "v"], 1.5]
