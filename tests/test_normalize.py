"""mmnormalize / pmnormalize / mmgrok rulebase stage (stages/normalize.py).

Goldens follow the reference's own rulebases + test inputs
(tests/testsuites/mmnormalize_*.rulebase, tokenized_input) — semantics,
not code, from plugins/mmnormalize/mmnormalize.c and contrib/mmgrok.
"""

import pyarrow as pa
import pytest

from rsyslog_ray.stages.normalize import (
    GROK_PATTERNS, NormalizeStage, Rule, RuleBase, compile_grok,
    grok_rulebase, mmnormalize_table,
)

REF = "/root/reference/tests/testsuites"


def _run(rb, msgs, **kw):
    batch = pa.table({"msg": pa.array(msgs, pa.string())})
    return NormalizeStage(rb, keep=[], **kw)(batch).to_pydict()


def test_tokenized_rulebase_reference_golden():
    rb = RuleBase.from_file(f"{REF}/mmnormalize_tokenized.rulebase")
    out = _run(rb, [
        "10.20.30.40, 50.60.70.80, 90.100.110.120",
        "local ips are 127.0.0.1, 192.168.1.1",
        "1.2.3.4, 5.6.7.8 are external ips",
        "for user1@localhost path was /a/b:/c/d:/e",
        # the reference's own tokenized_input payload line:
        "comma separated list of colon separated numbers: "
        "10, 20 : 30#40#50 : 60#70#80, 90 : 100",
        "no rule matches this",
    ])
    assert out["event_tag"] == ["only_ips", "local_ips", "external_ips",
                                "paths", "recur_comma_colon_nos", ""]
    assert out["only_ips"][0] == "10.20.30.40, 50.60.70.80, 90.100.110.120"
    assert out["external_ips"][2] == "1.2.3.4, 5.6.7.8"
    assert out["user"][3] == "user1"
    assert out["fragments"][3] == "/a/b:/c/d:/e"
    assert out["some_nos"][4] == "10, 20 : 30#40#50 : 60#70#80, 90 : 100"
    assert out["parse_success"] == [True] * 5 + [False]
    assert out["unparsed_data"][5] == "no rule matches this"


def test_regex_rulebase_requires_allowregex():
    text = open(f"{REF}/mmnormalize_regex.rulebase").read()
    # module gate: allowregex defaults off (mmnormalize.c modpdescr)
    with pytest.raises(ValueError, match="allow_regex"):
        RuleBase.from_string(text)
    rb = RuleBase.from_string(text, allow_regex=True)
    out = _run(rb, ["http host ports are 10.0.0.1:80, 10.0.0.2:8080 etc"])
    assert out["hps"] == ["10.0.0.1:80, 10.0.0.2:8080"]


def test_processing_rulebase_annotations_and_types():
    rb = RuleBase.from_file(f"{REF}/mmnormalize_processing_tests.rulebase")
    out = _run(rb, [
        "<37>1 2024-01-01T00:00:00.000Z host WIN - - - svc1 R1 WinOS hi all",
        "<12>2024-01-01T00:00:00.000Z esxhost vpxa: some esx message",
    ])
    assert out["event_tag"] == ["WIN", "ESX"]
    assert out["n1"] == [37, None]          # typed number capture
    assert out["v_tag"] == ["WIN", "vpxa"]
    # annotate= constants per matched tag
    assert out["v_analytics_prefix"] == ["EvntSLog: ", None]
    assert out["v_svc"] == ["svc1", "SER2"]
    assert out["v_os"] == ["WinOS", "ESX"]


def test_annotation_does_not_overwrite_captured_field():
    """setdefault semantics (round-3 ADVICE): a field CAPTURED by the
    matching rule wins over a same-named annotate= constant; fields the
    rule does NOT capture still get the annotation."""
    rb = RuleBase.from_string(
        "rule=t:%src:word% %n:number%\n"
        "annotate=t:+src=\"CONST\"\n"
        "annotate=t:+extra=\"E1\"")
    out = _run(rb, ["hello 42", "no match here at all ###"])
    assert out["src"] == ["hello", None]     # capture beats annotation
    assert out["extra"] == ["E1", None]      # pure annotation still lands
    assert out["n1" if "n1" in out else "n"] == [42, None]


def test_pmnormalize_basic_rulebase():
    rb = RuleBase.from_file(f"{REF}/pmnormalize_basic.rulebase")
    out = _run(rb, ["<17> server tag1: is no longer listening on "
                    "1.2.3.4 some trailing msg"])
    assert out["parse_success"] == [True]
    assert out["pri"] == [17]
    assert out["hostname"] == ["server"]
    assert out["syslogtag"] == ["tag1"]
    assert out["fromhost-ip"] == ["1.2.3.4"]
    assert out["msg"] == ["some trailing msg"]


def test_first_match_wins_order():
    rb = RuleBase.from_string(
        "rule=a:%x:word% one\nrule=b:%y:word% %-:rest%")
    out = _run(rb, ["hello one", "hello two"])
    assert out["event_tag"] == ["a", "b"]
    assert out["x"] == ["hello", None]
    assert out["y"] == [None, "hello"]


def test_char_sep_and_literal_percent():
    rb = RuleBase.from_string(r"rule=p:%v:char-sep:\x2c%,100%% done")
    out = _run(rb, ["abc,100% done", ",100% done"])
    assert out["v"] == ["abc", ""]
    assert out["parse_success"] == [True, True]


def test_grok_compile_and_match():
    g = grok_rulebase([
        ("req", "%{IPV4:client} %{WORD:method} %{NOTSPACE:path} "
                "%{INT:status} %{NUMBER:dur}"),
        ("lvl", "%{LOGLEVEL:level}: %{GREEDYDATA:body}"),
    ])
    out = _run(g, ["1.2.3.4 GET /x/y?q=1 200 0.25",
                   "ERROR: disk on fire",
                   "unmatched"])
    assert out["event_tag"] == ["req", "lvl", ""]
    assert out["client"] == ["1.2.3.4", None, None]
    assert out["status"] == [200, None, None]       # INT → int64
    assert out["dur"] == [0.25, None, None]         # NUMBER → float64
    assert out["level"] == [None, "ERROR", None]
    assert out["body"] == [None, "disk on fire", None]


def test_grok_unnamed_pattern_and_recursion():
    # %{PAT} without a field matches but captures nothing; dictionary
    # patterns may reference others
    r = compile_grok("%{SYSLOGTIMESTAMP} %{HOSTNAME:h} up",
                     extra_patterns={"HOSTPORT": "%{IPV4}:%{INT}"})
    assert "h" in r.fields
    out = _run(RuleBase([r], {}), ["Mar  6 16:57:54 web-1 up"])
    assert out["h"] == ["web-1"]
    r2 = compile_grok("conn to %{HOSTPORT:hp}",
                      extra_patterns={"HOSTPORT": "%{IPV4}:%{INT}"})
    out2 = _run(RuleBase([r2], {}), ["conn to 10.0.0.1:443"])
    assert out2["hp"] == ["10.0.0.1:443"]


def test_grok_patterns_have_no_unnamed_groups():
    # every builtin must be embeddable in pc.extract_regex
    import pyarrow.compute as pc
    for name in GROK_PATTERNS:
        r = compile_grok("x %{" + name + ":v} y")
        pc.extract_regex(pa.array(["probe"], pa.string()), pattern=r.regex)


def test_mmnormalize_registry_stage_and_variable_source():
    from rsyslog_ray.config import STAGE_REGISTRY
    fn = STAGE_REGISTRY["mmnormalize"]
    batch = pa.table({"doc_id": pa.array([1, 2]),
                      "line": pa.array(["err 42 boom", "nope"], pa.string())})
    out = fn(batch, rulebase="rule=e:err %code:number% %what:rest%",
             source="line", path="p_")
    d = out.to_pydict()
    assert d["p_code"] == [42, None]          # path prefix + typed field
    assert d["p_parse_success"] == [True, False]
    assert d["doc_id"] == [1, 2]              # keep column passthrough


def test_mmnormalize_table_cache_identity():
    import rsyslog_ray.stages.normalize as nz
    a = nz._cached_stage("rule=a:%x:word%", "msg", "", False, True)
    b = nz._cached_stage("rule=a:%x:word%", "msg", "", False, True)
    assert a is b


def test_v2_repeat_rulebases_crio_and_json():
    """liblognorm v2 `repeat` rules over the reference's OWN k8s
    multiline rulebases (tests/imfile-endmsg.regex.{crio,json}.rulebase)
    with the shell test's input shapes."""
    import json as _json
    import os

    import pyarrow as pa

    from rsyslog_ray.stages.normalize import NormalizeStage, RuleBase

    ref = "/root/reference/tests"
    if not os.path.isdir(ref):
        import pytest
        pytest.skip("reference tree not present")

    crio = RuleBase.from_file(f"{ref}/imfile-endmsg.regex.crio.rulebase")
    jsonrb = RuleBase.from_file(f"{ref}/imfile-endmsg.regex.json.rulebase")

    crio_msg = ("date stdout P msgnum:3\n"
                "date stdout P msgnum:4\n"
                "date stdout P msgnum:5\n"
                "date stdout F msgnum:6")
    st = NormalizeStage(crio, source="msg")
    out = st(pa.table({"msg": [crio_msg, "not crio ="]}))
    assert out["parse_success"].to_pylist() == [True, False]
    items = _json.loads(out["multilinecrio"].to_pylist()[0])
    assert [it["log"] for it in items] == [
        "msgnum:3", "msgnum:4", "msgnum:5", "msgnum:6"]
    assert {it["stream"] for it in items} == {"stdout"}
    assert [it["partial"] for it in items] == ["P", "P", "P", "F"]

    json_msg = ('{"time":"date", "stream":"stdout", "log":"msgnum:3"}\n'
                '{"time":"date", "stream":"stdout", "log":"msgnum:4"}\n'
                '{"time":"date", "stream":"stdout", "log":"msgnum:6\\n"}')
    st2 = NormalizeStage(jsonrb, source="msg")
    out2 = st2(pa.table({"msg": [json_msg]}))
    assert out2["parse_success"].to_pylist() == [True]
    items2 = _json.loads(out2["multilinejson"].to_pylist()[0])
    assert [it["log"] for it in items2] == [
        "msgnum:3", "msgnum:4", "msgnum:6\n"]


def test_v2_repeat_k8s_assembly_end_to_end(ray_session):
    """The imfile-endmsg.regex-with-example.sh assembly loop: foreach
    over the normalized array accumulates partial CRI-O lines into one
    $!log — replayed through the language front-end."""
    import json as _json

    import pyarrow as pa

    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.normalize import NormalizeStage, RuleBase
    from rsyslog_ray.stages.route import route_table

    ref = "/root/reference/tests"
    import os
    if not os.path.isdir(ref):
        import pytest
        pytest.skip("reference tree not present")
    crio = RuleBase.from_file(f"{ref}/imfile-endmsg.regex.crio.rulebase")
    msg = ("date stdout P msgnum:3\n"
           "date stdout P msgnum:4\n"
           "date stdout F msgnum:6")
    st = NormalizeStage(crio, source="msg", keep=[])
    parsed = st(pa.table({"msg": [msg]}))
    # mmnormalize-action shape: parsed array into the message tree
    batch = pa.table({
        "msg": pa.array([msg]),
        "cee_json": pa.array([_json.dumps(
            {"multilinecrio": _json.loads(
                parsed["multilinecrio"].to_pylist()[0])})]),
    })
    cc = load_rainerscript('''
template(name="outfmt" type="string" string="%$!stream%|%$!log%")
foreach ($.ii in $!multilinecrio) do {
    if strlen($!stream) == 0 then {
        set $!stream = $.ii!stream;
    }
    if strlen($!log) == 0 then {
        set $!log = $.ii!log;
    } else {
        reset $!log = $!log & $.ii!log;
    }
}
action(type="omfile" name="out" template="outfmt")
''')
    routed = route_table(batch, cc.ruleset)
    assert routed["out"]["rendered"].to_pylist() == [
        "stdout|msgnum:3msgnum:4msgnum:6"]
