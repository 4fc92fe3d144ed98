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
    # a then-branch containing a mutating statement (call) compiles to a
    # first-class `if` statement — condition evaluated ONCE at this
    # position (S_IF; rscript_eq_var.sh)
    assert [a.get("kind", "write") for a in acts] == ["if", "write"]
    assert acts[0]["filter"] == ["prifilt", "local0.err"]
    then_acts = acts[0]["then"]["actions"]
    assert [a.get("kind") for a in then_acts] == ["call", "stop"]
    assert then_acts[0]["ruleset"]["actions"][0]["name"] == "inner"
    assert acts[0]["else"]["actions"][0]["name"] == "other"
    assert acts[1].get("filter") is None
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


def test_set_unset_and_functions(ray_session):
    import json
    import pyarrow as pa

    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.route import route_table

    src = """
template(name="t" type="string" string="%$.cls%|%$!note%|%msg%")
set $.cls = tolower($app-name) & "!";
if $severity <= 3 then {
    set $!note = "sev" & cstr($severity);
}
if $.cls == "err!" then action(type="omfile" name="errs" template="t")
action(type="omfile" name="all" template="t");
unset $!note;
if $severity <= 3 then unset $.cls;
action(type="omfile" name="after" template="t")
"""
    cc = load_rainerscript(src)
    batch = pa.table({
        "msg": ["boom", "fine", "warn"],
        "appname": ["ERR", "Info", "other"],
        "severity": pa.array([2, 6, 3], pa.int64()),
    })
    routed = route_table(batch, cc.ruleset)
    # set gated by if: only sev<=3 rows carry $!note; $.cls set everywhere
    assert routed["errs"]["rendered"].to_pylist() == ["err!|sev2|boom"]
    assert routed["all"]["rendered"].to_pylist() == [
        "err!|sev2|boom", "info!||fine", "other!|sev3|warn"]
    # unset $!note for all rows; $.cls unset only where sev<=3 (renders "")
    assert routed["after"]["rendered"].to_pylist() == [
        "||boom", "info!||fine", "||warn"]
    # the JSON tree column reflects masked set/unset edits
    assert json.loads(
        routed["errs"]["cee_json"].to_pylist()[0]) == {"note": "sev2"}


def test_set_chain_and_stop_interaction(ray_session):
    import pyarrow as pa

    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.route import route_table

    # a set var drives a later stop; a second set reads the first
    src = """
set $.a = toupper($msg);
set $.b = $.a & "-x";
if $.b == "DROP-x" then stop
action(name="kept" keep_columns=["msg"])
"""
    cc = load_rainerscript(src)
    batch = pa.table({"msg": ["drop", "keep"]})
    routed = route_table(batch, cc.ruleset)
    assert routed["kept"]["msg"].to_pylist() == ["keep"]


def test_lookup_in_expressions(ray_session, tmp_path):
    import json
    import pyarrow as pa

    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.route import route_table

    tbl = {"version": 1, "type": "string", "nomatch": "?",
           "table": [{"index": "err", "value": "E"},
                     {"index": "info", "value": "I"}]}
    f = tmp_path / "tbl.json"
    f.write_text(json.dumps(tbl))
    src = f"""
lookup_table(name="m" file="{f}")
set $.cls = lookup("m", tolower($msg));
if lookup("m", tolower($msg)) == "E" then action(name="e" keep_columns=["msg"])
action(name="all" keep_columns=["$.cls"])
"""
    cc = load_rainerscript(src)
    batch = pa.table({"msg": ["ERR", "info", "zzz"]})
    routed = route_table(batch, cc.ruleset)
    assert routed["e"]["msg"].to_pylist() == ["ERR"]
    assert routed["all"]["$.cls"].to_pylist() == ["E", "I", "?"]


def test_function_calls_parse_and_errors():
    from rsyslog_ray.rainerscript import parse_rainerscript

    c = parse_rainerscript(
        "if re_match($msg, 'a+') and strlen($msg) > 2 then stop")
    f = c["ruleset"]["actions"][0]["filter"]
    assert f == ["and", ["call", "re_match", ["prop", "msg"], ["lit", "a+"]],
                 [">", ["call", "strlen", ["prop", "msg"]], 2]]
    c = parse_rainerscript("set $.f = field($msg, ',', 2);")
    a = c["ruleset"]["actions"][0]
    assert a["kind"] == "set" and a["var"] == "$.f"
    assert a["value"] == ["call", "field", ["prop", "msg"], ["lit", ","], 2]
    with pytest.raises(ParseError):
        parse_rainerscript("if nosuchfn($msg) then stop")
    # message properties are read-only: rejected at execution time
    import pyarrow as pa

    from rsyslog_ray.rainerscript import load_rainerscript
    from rsyslog_ray.stages.route import route_table

    cc = load_rainerscript("set $msg = 'x';\naction(name=\"a\")")
    with pytest.raises(ValueError, match="read-only"):
        route_table(pa.table({"msg": ["m"]}), cc.ruleset)


def test_classic_property_filters(ray_session):
    import pyarrow as pa

    from rsyslog_ray.rainerscript import load_rainerscript, parse_rainerscript
    from rsyslog_ray.stages.route import route_table

    cfg = parse_rainerscript("""
:msg, contains, "error" action(name="a")
:msg, !startswith, "ok" action(name="b")
:msg, isempty, "" action(name="c")
:msg, regex, "num[0-9]+" action(name="d")
""")
    acts = cfg["ruleset"]["actions"]
    assert acts[0]["filter"] == ["contains", ["prop", "msg"],
                                 ["lit", "error"]]
    assert acts[1]["filter"] == ["not", ["startswith", ["prop", "msg"],
                                         ["lit", "ok"]]]
    assert acts[2]["filter"] == ["isempty", ["prop", "msg"]]
    assert acts[3]["filter"] == ["regex", ["prop", "msg"], "num[0-9]+"]

    cc = load_rainerscript("""
:msg, contains, "error" {
    action(name="errs" keep_columns=["msg"])
    stop
}
action(name="rest" keep_columns=["msg"])
""")
    batch = pa.table({"msg": ["an error here", "all fine", ""]})
    routed = route_table(batch, cc.ruleset)
    assert routed["errs"]["msg"].to_pylist() == ["an error here"]
    assert routed["rest"]["msg"].to_pylist() == ["all fine", ""]

    with pytest.raises(ParseError):
        parse_rainerscript(':msg, frobnicate, "x" action(name="a")')


def test_dotted_param_names_accepted():
    from rsyslog_ray.rainerscript import parse_rainerscript

    cfg = parse_rainerscript("""
ruleset(name="r" queue.type="LinkedList" queue.size=50000) {
    action(name="a" type="omfile" queue.dequeueBatchSize=256
           action.resumeRetryCount=-1)
}
call r
""")
    acts = cfg["ruleset"]["actions"]
    assert acts[0]["kind"] == "call"
    # the queue.* / action.* params are accepted and ignored (the
    # reference warns on unused params; Ray provides the queueing)
    inner = acts[0]["ruleset"]["actions"][0]
    assert inner["name"] == "a"
    assert "queue.dequeueBatchSize" not in inner


def test_legacy_sysklogd_config(ray_session):
    """A real-world-shaped legacy rsyslog.conf loads end-to-end: $-line
    directives, classic selectors with file / @forward / omusrmsg
    targets, and '-' async-flagged paths."""
    import pyarrow as pa

    from rsyslog_ray.rainerscript import load_rainerscript, parse_rainerscript
    from rsyslog_ray.stages.route import route_table

    src = """
$ModLoad imuxsock
$ModLoad mmjsonparse
$FileOwner root
$umask 0022
$template DynFile,"%msg%\\n"
$ActionFileDefaultTemplate DynFile

*.info;mail.none -/var/log/messages
mail.* /var/log/maillog
*.emerg *
*.emerg @loghost.example.com:514
local0.err @@tcploghost
local1.* :omusrmsg:root
"""
    cfg = parse_rainerscript(src)
    assert cfg["modifiers"] == ["mmjsonparse"]      # imuxsock ignored
    assert cfg["templates"]["DynFile"] == "%msg%\n"
    acts = cfg["ruleset"]["actions"]
    names = [a["name"] for a in acts]
    assert names == ["var_log_messages", "var_log_maillog", "usrmsg_all",
                     "fwd_loghost.example.com_514", "fwd_tcploghost",
                     "usrmsg_omusrmsg_root"]
    # file actions picked up the $ActionFileDefaultTemplate
    assert acts[0]["template"] == "DynFile"
    assert acts[3]["template"] == "RSYSLOG_ForwardFormat"
    assert all(a["format"] == "text" for a in acts)
    assert acts[0]["filter"] == ["prifilt", "*.info;mail.none"]

    # compiles and routes (needs parse-chain columns for the templates)
    cc = load_rainerscript("""
$template T,"%msg%"
$ActionFileDefaultTemplate T
local0.err /var/log/errs
""")
    batch = pa.table({
        "msg": ["a", "b"],
        "facility": pa.array([16, 16], pa.int64()),
        "severity": pa.array([3, 6], pa.int64()),
    })
    routed = route_table(batch, cc.ruleset)
    assert routed["var_log_errs"].num_rows == 1


def test_continue_statement():
    from rsyslog_ray.rainerscript import parse_rainerscript

    c = parse_rainerscript("""
if $a == 1 then continue
else action(name="x")
continue;
""")
    acts = c["ruleset"]["actions"]
    assert len(acts) == 1
    assert acts[0]["filter"] == ["not", ["==", ["prop", "a"], 1]]


def test_legacy_duplicate_targets_get_sibling_names():
    from rsyslog_ray.rainerscript import parse_rainerscript

    cfg = parse_rainerscript("""
*.info /var/log/messages
mail.* /var/log/messages
*.emerg @host
local0.* @host
""")
    names = [a["name"] for a in cfg["ruleset"]["actions"]]
    assert names == ["var_log_messages", "var_log_messages_2",
                     "fwd_host", "fwd_host_2"]


def test_module_params_and_includes(ray_session, tmp_path):
    import pyarrow as pa

    from rsyslog_ray.rainerscript import (ParseError, load_rainerscript,
                                          parse_rainerscript)

    # module params pass through to the stage callable
    cfg = parse_rainerscript(
        'module(load="mmfields" separator=";")\naction(name="a")')
    assert cfg["modifiers"] == [{"name": "mmfields",
                                 "args": {"separator": ";"}}]

    # modern include() and legacy $IncludeConfig splice files in place
    inc1 = tmp_path / "10-templates.conf"
    inc1.write_text('template(name="t" type="string" string="%msg%")\n')
    inc2 = tmp_path / "20-rules.conf"
    inc2.write_text('action(name="from_include" template="t")\n')
    src = f"""
include(file="{tmp_path}/10-*.conf")
$IncludeConfig {tmp_path}/20-*.conf
action(name="main_act" template="t")
"""
    cfg = parse_rainerscript(src)
    assert cfg["templates"]["t"] == "%msg%"
    assert [a["name"] for a in cfg["ruleset"]["actions"]] == \
        ["from_include", "main_act"]

    # compiled end-to-end
    cc = load_rainerscript(src)
    from rsyslog_ray.stages.route import route_table
    routed = route_table(pa.table({"msg": ["x"]}), cc.ruleset)
    assert routed["from_include"]["rendered"].to_pylist() == ["x"]

    # missing includes: modern raises, optional/legacy ignores
    with pytest.raises(ParseError):
        parse_rainerscript(f'include(file="{tmp_path}/nope-*.conf")')
    parse_rainerscript(
        f'include(file="{tmp_path}/nope-*.conf" mode="optional")')
    parse_rainerscript(f"$IncludeConfig {tmp_path}/nope-*.conf")


def test_parser_never_crashes_on_garbage():
    """Stability fuzz: any input either parses or raises ParseError —
    never an unrelated exception (the config loader's error contract)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rsyslog_ray.rainerscript import ParseError, parse_rainerscript

    tokens = st.sampled_from([
        "if", "then", "else", "stop", "call", "set", "unset", "action",
        "template", "ruleset", "module", "continue", "and", "or", "not",
        "$msg", "$!a!b", "$.x", "'str'", '"str"', "42", "1.5", "==",
        "!=", "<=", "&", "+", "(", ")", "{", "}", "[", "]", ",", ";",
        "~", "*.info", "local0.err", ":msg, contains, \"x\"",
        "/var/log/x", "@host", "name=\"v\"", "prifilt('a.b')",
        "tolower($msg)", "=",
    ])

    @given(st.lists(tokens, min_size=0, max_size=12).map(" ".join))
    @settings(max_examples=300, deadline=None)
    def run(src):
        try:
            parse_rainerscript(src)
        except ParseError:
            pass

    run()

    @given(st.text(max_size=60))
    @settings(max_examples=300, deadline=None)
    def run_raw(src):
        try:
            parse_rainerscript(src)
        except ParseError:
            pass

    run_raw()


def test_foreach_statement_compiles_and_runs():
    """foreach ($.x in $!arr) do { ... } (grammar.y S_FOREACH,
    ruleset.c:323-417): body runs once per element with the loop var
    bound; per-message vars keep the LAST iteration's value after the
    loop; zero-iteration rows are untouched."""
    import pyarrow as pa
    from rsyslog_ray.config import CompiledConfig
    from rsyslog_ray.rainerscript import parse_rainerscript
    from rsyslog_ray.stages.route import route_table

    src = '''
    template(name="t" type="string" string="%hostname% x=%$.x% s=%$.seen%")
    foreach ($.x in $!arr) do {
        set $.seen = $.x & "!";
        action(type="omfile" name="items" template="t")
    }
    action(type="omfile" name="after" template="t")
    '''
    cfg = CompiledConfig(parse_rainerscript(src))
    batch = pa.table({
        "hostname": ["h1", "h2", "h3"],
        "msg": ["a", "b", "c"],
        "cee_json": ['{"arr":["p","q"]}', '{"arr":[1]}', '{}'],
    })
    out = route_table(batch, cfg.ruleset)
    # batch row order across MESSAGES is iteration-major (an engine
    # detail — the driver/oracle compare is order-insensitive); within
    # one message elements must appear in array order
    items = out["items"]["rendered"].to_pylist()
    assert sorted(items) == [
        "h1 x=p s=p!", "h1 x=q s=q!", "h2 x=1 s=1!"]
    h1 = [s for s in items if s.startswith("h1")]
    assert h1 == ["h1 x=p s=p!", "h1 x=q s=q!"]
    assert out["after"]["rendered"].to_pylist() == [
        "h1 x=q s=q!", "h2 x=1 s=1!", "h3 x= s="]


def test_foreach_object_iteration_and_stop():
    """Object iterables bind {key,value} pairs (foreachCallObject); a stop
    inside the body discards the parent message (DISCARDMSG propagates)."""
    import pyarrow as pa
    from rsyslog_ray.config import CompiledConfig
    from rsyslog_ray.rainerscript import parse_rainerscript
    from rsyslog_ray.stages.route import route_table

    src = '''
    template(name="kv" type="string" string="%$.p%")
    foreach ($.p in $!obj) do {
        action(type="omfile" name="pairs" template="kv")
        if $.p contains "drop" then stop
    }
    action(type="omfile" name="rest" template="kv")
    '''
    cfg = CompiledConfig(parse_rainerscript(src))
    batch = pa.table({
        "hostname": ["h1", "h2"],
        "msg": ["a", "b"],
        "cee_json": ['{"obj":{"k1":"v1","k2":"drop-me"}}',
                     '{"obj":{"k3":"v3"}}'],
    })
    out = route_table(batch, cfg.ruleset)
    rendered = out["pairs"]["rendered"].to_pylist()
    assert '{"key":"k1","value":"v1"}' in rendered
    assert '{"key":"k3","value":"v3"}' in rendered
    # h1 was stopped inside the loop → only h2 reaches `rest`
    assert out["rest"].num_rows == 1


def test_stock_distro_conf_loads():
    """A stock-distro-shaped rsyslog.conf — module/input/global/main_queue
    objects, legacy directives, classic selectors — loads without error
    (the round-3 gap: input()/global()/main_queue() used to raise)."""
    from rsyslog_ray.rainerscript import parse_rainerscript

    src = '''
    module(load="imuxsock")
    input(type="imfile" File="/var/log/app.log" Tag="app:"
          Severity="info" Facility="local7")
    global(workDirectory="/var/spool/rsyslog" maxMessageSize="64k")
    main_queue(queue.filename="main" queue.maxdiskspace="1g"
               queue.saveonshutdown="on")
    timezone(id="UTC" offset="+00:00")
    $ActionFileDefaultTemplate RSYSLOG_TraditionalFileFormat
    *.info;mail.none /var/log/messages
    local7.* /var/log/boot.log
    '''
    cfg = parse_rainerscript(src)
    names = [a["name"] for a in cfg["ruleset"]["actions"]]
    assert len(names) == 2            # the two classic file actions


def test_dyn_stats_object_registers_bucket_params():
    """dyn_stats(name=...) declarations (runtime/dynstats.c:35-46) parse
    into the config's dynstats registry with dyn_inc-ready kwargs."""
    from rsyslog_ray.config import load_config
    from rsyslog_ray.rainerscript import parse_rainerscript
    cfg = parse_rainerscript('''
dyn_stats(name="per_host" maxCardinality="500"
          unusedMetricLife="600" resettable="off")
dyn_stats(name="per_tool")
ruleset(name="r"){ action(type="omfile" file="/tmp/x") }
''')
    assert cfg["dynstats"]["per_host"] == {
        "max_cardinality": 500, "unused_metric_life_s": 600,
        "resettable": False}
    assert cfg["dynstats"]["per_tool"]["max_cardinality"] == 2000
    assert cfg["dynstats"]["per_tool"]["resettable"] is True
    assert load_config(cfg).dynstats["per_host"]["max_cardinality"] == 500
