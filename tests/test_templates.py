"""Template property-replacer option surface (templates.py).

Goldens follow template.c:839-930 (regex FromPos), template.h:62-68 (date
formats), runtime/msg.c:3936-4600 (option application order), doEscape
(template.c:341-450 SQL modes).
"""

import numpy as np
import pyarrow as pa
import pytest

from rsyslog_ray.expr import PropertyRegistry
from rsyslog_ray.templates import Template, _bre_to_ere, parse_template


def _batch(msgs, ts="2024-03-06T16:57:54.123456"):
    n = len(msgs)
    return pa.table({
        "msg": pa.array(msgs, pa.string()),
        "hostname": pa.array([f"h-{i}" for i in range(n)]),
        "tag": pa.array([""] * n), "appname": pa.array(["app"] * n),
        "ts_reported": pa.array(np.array([ts] * n, dtype="datetime64[us]")),
        "ts": pa.array(np.array([ts] * n, dtype="datetime64[us]")),
        "facility": pa.array([16] * n, pa.int64()),
        "severity": pa.array([3] * n, pa.int64()),
        "conv_id": pa.array([f"c{i}" for i in range(n)]),
        "turn_idx": pa.array(list(range(n)), pa.int32()),
        "text": pa.array(msgs, pa.string()),
    })


def test_regex_spec_parsing():
    [e] = parse_template("%msg:R,ERE,1,BLANK,0:port ([0-9]+)--end%")
    assert (e.re_type, e.re_submatch, e.re_nomatch, e.re_match) == \
        ("ERE", 1, "BLANK", 0)
    assert e.re_pattern == "port ([0-9]+)"
    [e2] = parse_template("%msg:R:x.*y--end%")      # all-default flags
    assert (e2.re_type, e2.re_submatch, e2.re_nomatch) == ("BRE", 0, "DFLT")


def test_regex_extract_nomatch_policies():
    b = _batch(["port 8080 open", "nothing here"])
    for policy, expect in (("BLANK", ""), ("ZERO", "0"),
                           ("FIELD", "nothing here"),
                           ("DFLT", "**NO MATCH**")):
        t = Template(f"%msg:R,ERE,1,{policy}:port ([0-9]+)--end%")
        got = t.render(b).to_pylist()
        assert got == ["8080", expect], policy


def test_regex_bre_translation():
    # BRE: \( \) are groups, bare parens are literals
    assert _bre_to_ere(r"a\(b+c\)d") == "a(b\\+c)d"
    b = _batch(["num 42!", "(literal)"])
    t = Template(r"%msg:R,BRE,1,BLANK:num \([0-9]*\)--end%")
    assert t.render(b).to_pylist() == ["42", ""]
    t2 = Template(r"%msg:R,BRE,0,BLANK:(literal)--end%")  # literal parens
    assert t2.render(b).to_pylist() == ["", "(literal)"]


def test_regex_match_number():
    b = _batch(["a=1 a=2 a=3"])
    t = Template("%msg:R,ERE,1,BLANK,1:a=([0-9])--end%")   # match #1 = 2nd
    assert t.render(b).to_pylist() == ["2"]


def test_date_formats():
    b = _batch(["x"])
    spec = ("%TIMESTAMP:::date-mysql%|%TIMESTAMP:::date-pgsql%|"
            "%TIMESTAMP:::date-wdayname%|%TIMESTAMP:::date-wday%|"
            "%TIMESTAMP:::date-ordinal%|%TIMESTAMP:::date-week%|"
            "%TIMESTAMP:::date-subseconds%|%TIMESTAMP:::date-year%|"
            "%TIMESTAMP:::date-month%|%TIMESTAMP:::date-day%|"
            "%TIMESTAMP:::date-hour%|%TIMESTAMP:::date-minute%|"
            "%TIMESTAMP:::date-second%|%TIMESTAMP:::date-tzoffshour%|"
            "%TIMESTAMP:::date-tzoffsdirection%|"
            "%TIMESTAMP:::date-rfc3164-buggyday%")
    got = Template(spec).render(b)[0].as_py()
    assert got == ("20240306165754|2024-03-06 16:57:54|Wed|3|066|10|123456|"
                   "2024|03|06|16|57|54|00|+|Mar 06 16:57:54")


def test_fixed_width_and_end_relative():
    b = _batch(["abcdef", "ab"])
    t = Template("[%msg:1:4:fixed-width%]")
    assert t.render(b).to_pylist() == ["[abcd]", "[ab  ]"]
    t2 = Template("[%msg:3:1:pos-end-relative%]")
    assert t2.render(b).to_pylist() == ["[def]", "[ab]"]


def test_cc_and_space_options():
    b = _batch(["a\x01b  c"])
    assert Template("%msg:::drop-cc%").render(b)[0].as_py() == "ab  c"
    assert Template("%msg:::space-cc%").render(b)[0].as_py() == "a b  c"
    assert Template("%msg:::escape-cc%").render(b)[0].as_py() == "a#001b  c"
    assert Template("%msg:::compressspace%").render(b)[0].as_py() == "a\x01b c"


def test_secpath_options():
    b = _batch(["../etc/passwd", ".", "..", ""])
    assert Template("%msg:::secpath-replace%").render(b).to_pylist() == \
        [".._etc_passwd", "_", "_.", "_"]
    assert Template("%msg:::secpath-drop%").render(b).to_pylist() == \
        ["..etcpasswd", "_", "_.", "_"]


def test_sql_escape_modes():
    b = _batch(["it's \\a"])
    assert Template("%msg%", escape="stdsql").render(b)[0].as_py() == \
        "it''s \\a"
    assert Template("%msg%", escape="sql").render(b)[0].as_py() == \
        "it\\'s \\\\a"
    assert Template("%msg%", escape="json").render(b)[0].as_py() == \
        "it's \\\\a"


def test_property_registry_text_and_buckets():
    b = _batch(["m"])
    p = PropertyRegistry(b)
    assert p.get("syslogfacility-text")[0].as_py() == "local0"
    assert p.get("syslogseverity-text")[0].as_py() == "err"
    assert p.get("pri-text")[0].as_py() == "local0.err"
    assert p.get("$now")[0].as_py() == "2024-03-06"
    assert p.get("$hhour")[0].as_py() == "1"     # minute 57 → half-hour 1
    assert p.get("$qhour")[0].as_py() == "3"     # minute 57 → quarter 3
    assert p.get("$wday")[0].as_py() == "3"      # Wednesday, 0=Sunday
    assert p.get("fromhost")[0].as_py() == "h-0"
    assert p.get("fromhost-ip")[0].as_py() == "127.0.0.1"
    assert p.get("inputname")[0].as_py() == "imfile"
    assert p.get("$bom")[0].as_py() == "﻿"


def test_uuid_deterministic_and_distinct():
    b = _batch(["m", "m"])
    p = PropertyRegistry(b)
    u = p.get("uuid").to_pylist()
    assert u == PropertyRegistry(b).get("uuid").to_pylist()
    assert u[0] != u[1] and len(u[0]) == 36


def test_jsonmesg_valid_json():
    import json
    b = _batch(['body "quoted"'])
    doc = json.loads(PropertyRegistry(b).get("jsonmesg")[0].as_py())
    assert doc["msg"] == 'body "quoted"'
    assert doc["syslogfacility"] == 16


def test_unknown_property_raises():
    with pytest.raises(KeyError):
        PropertyRegistry(_batch(["m"])).get("no-such-prop")


def test_jsonf_and_jsonr_options():
    b = _batch(['va"l'])
    assert Template("%msg:::jsonf%").render(b)[0].as_py() == '"msg":"va\\"l"'
    assert Template("%msg:::jsonr%").render(b)[0].as_py() == 'va"l'


def test_template_compiler_never_crashes_on_garbage(ray_session):
    """Stability fuzz: any template spec either compiles+renders or
    raises ValueError/KeyError (the config loader's error contract) —
    never an unrelated exception."""
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rsyslog_ray.templates import Template

    pieces = st.sampled_from([
        "%msg%", "%msg:1:5%", "%msg:::uppercase%", "%timestamp%",
        "%timereported:::date-rfc3339%", "%$!a!b%", "%$.x%", "%",
        "plain ", ":::", "%msg:R,ERE,0,DFLT:x--end%", "%HOSTNAME%",
        "\\n", "%syslogtag:1:32%", "%msg:F,58:2%", "%unknownprop%",
    ])
    import numpy as np
    tsv = np.array(["2024-01-01T00:00:00", "2024-01-02T03:04:05"],
                   dtype="datetime64[us]")
    batch = pa.table({
        "msg": ["hello", "x"],
        "hostname": ["h", "h2"],
        "ts": pa.array(tsv),
        "ts_reported": pa.array(tsv),
        "tag": ["t", "u"],
        "appname": ["a", "b"],
    })

    @given(st.lists(pieces, min_size=0, max_size=6).map("".join))
    @settings(max_examples=200, deadline=None)
    def run(spec):
        try:
            Template(spec, name="fuzz").render(batch)
        except (ValueError, KeyError):
            pass

    run()


def test_list_template_byte_equal_to_string_template():
    """template(type="list") compiles onto the same TplEntry chain as the
    %...% string form (template.c:1226 list path) — byte-equal output."""
    import pyarrow as pa
    from rsyslog_ray.templates import Template
    batch = pa.table({
        "hostname": ["h1", "h2"],
        "msg": [" hello", "world\n"],
    })
    s = Template("%hostname% %msg:::drop-last-lf%\n")
    lst = Template({"type": "list", "entries": [
        {"kind": "property", "name": "hostname"},
        {"kind": "constant", "value": " "},
        {"kind": "property", "name": "msg", "droplastlf": "on"},
        {"kind": "constant", "value": "\n"},
    ]})
    assert lst.render(batch).to_pylist() == s.render(batch).to_pylist()


def test_list_template_jsonf_golden():
    """jsonf fields use outname (default: property name sans $!); values
    JSON-escape; constants may be jsonf pairs too (outname mandatory,
    template.c:1411)."""
    import pyarrow as pa
    import pytest
    from rsyslog_ray.templates import Template
    batch = pa.table({
        "hostname": ['h"1'],
        "severity": pa.array([3], pa.int64()),
        "cee_json": ['{"user":"u1"}'],
    })
    t = Template({"type": "list", "entries": [
        {"kind": "constant", "value": "{"},
        {"kind": "constant", "value": "v1", "outname": "ver",
         "format": "jsonf"},
        {"kind": "constant", "value": ","},
        {"kind": "property", "name": "hostname", "outname": "host",
         "format": "jsonf"},
        {"kind": "constant", "value": ","},
        {"kind": "property", "name": "$!user", "format": "jsonf"},
        {"kind": "constant", "value": "}"},
    ]})
    # constant jsonf carries json-c's colon-space (template.c:1433-1436,
    # template-const-jsonf.sh golden); property jsonf has no space
    assert t.render(batch).to_pylist() == [
        '{"ver": "v1","host":"h\\"1","user":"u1"}']
    import json
    assert json.loads(t.render(batch).to_pylist()[0]) == {
        "ver": "v1", "host": 'h"1', "user": "u1"}
    with pytest.raises(ValueError):
        Template({"type": "list", "entries": [
            {"kind": "constant", "value": "x", "format": "jsonf"}]})


def test_subtree_template():
    """type="subtree" renders the normalized JSON subtree (template.c:1926);
    whole-tree "$!", nested path, and missing-subtree → empty string."""
    import pyarrow as pa
    from rsyslog_ray.templates import Template
    batch = pa.table({
        "cee_json": ['{"a":{"b":"x"},"n":1}', None, '{"n":2}'],
    })
    whole = Template({"type": "subtree", "subtree": "$!"})
    assert whole.render(batch).to_pylist() == [
        '{"a":{"b":"x"},"n":1}', "", '{"n":2}']
    sub = Template({"type": "subtree", "subtree": "$!a"})
    assert sub.render(batch).to_pylist() == ['{"b":"x"}', "", ""]


def test_list_template_property_options_parity():
    """Every list-property option maps onto the same kernel as its
    string-form spelling: position window, field mode, regex, case."""
    import pyarrow as pa
    from rsyslog_ray.templates import Template
    batch = pa.table({"msg": ["alpha,beta,gamma Error42 here"]})
    pairs = [
        ("%msg:2:5%",
         {"kind": "property", "name": "msg",
          "position.from": 2, "position.to": 5}),
        ("%msg:F,44:2%",
         {"kind": "property", "name": "msg",
          "field.delimiter": 44, "field.number": 2}),
        ("%msg:R,ERE,0,DFLT:Error[0-9]+--end%",
         {"kind": "property", "name": "msg",
          "regex.expression": "Error[0-9]+", "regex.type": "ERE"}),
        ("%msg:::uppercase%",
         {"kind": "property", "name": "msg", "caseconversion": "upper"}),
    ]
    for spec, entry in pairs:
        s = Template(spec).render(batch).to_pylist()
        l = Template({"type": "list",
                      "entries": [entry]}).render(batch).to_pylist()
        assert l == s, (spec, l, s)


def test_jsonf_datatype_onempty_matrix():
    """jsonField typing (runtime/msg.c:3408-3476): 4 dataTypes x 3
    onEmpty modes, value cases empty / digits / text / "0"."""
    import pyarrow as pa
    from rsyslog_ray.templates import Template

    def render(dt, oe, vals):
        batch = pa.table({"msg": pa.array(vals, pa.string())})
        t = Template({"type": "list", "entries": [
            {"kind": "property", "name": "msg", "outname": "f",
             "format": "jsonf", "datatype": dt, "onempty": oe}]})
        return t.render(batch).to_pylist()

    vals = ["", "123", "abc", "0"]
    # string: always quoted; empty value renders per onEmpty
    assert render("string", "keep", vals) == [
        '"f":""', '"f":"123"', '"f":"abc"', '"f":"0"']
    assert render("string", "skip", vals) == [
        '', '"f":"123"', '"f":"abc"', '"f":"0"']
    assert render("string", "null", vals) == [
        '"f":null', '"f":"123"', '"f":"abc"', '"f":"0"']
    # number: unquoted, empty -> 0 (msg.c:3459); non-numeric emits raw
    # unquoted exactly like the reference (never validated)
    assert render("number", "keep", vals) == [
        '"f":0', '"f":123', '"f":abc', '"f":0']
    assert render("number", "skip", vals) == [
        '', '"f":123', '"f":abc', '"f":0']
    assert render("number", "null", vals) == [
        '"f":null', '"f":123', '"f":abc', '"f":0']
    # bool: "0" -> false, everything else (incl. empty under keep) -> true
    assert render("bool", "keep", vals) == [
        '"f":true', '"f":true', '"f":true', '"f":false']
    assert render("bool", "skip", vals) == [
        '', '"f":true', '"f":true', '"f":false']
    assert render("bool", "null", vals) == [
        '"f":null', '"f":true', '"f":true', '"f":false']
    # auto: unquoted iff all-digits (msg.c:3440-3452)
    assert render("auto", "keep", vals) == [
        '"f":""', '"f":123', '"f":"abc"', '"f":0']
    assert render("auto", "skip", vals) == [
        '', '"f":123', '"f":"abc"', '"f":0']
    assert render("auto", "null", vals) == [
        '"f":null', '"f":123', '"f":"abc"', '"f":0']


def test_jsonf_invalid_datatype_onempty_rejected():
    import pytest
    from rsyslog_ray.templates import Template
    with pytest.raises(ValueError):  # template.c:1507
        Template({"type": "list", "entries": [
            {"kind": "property", "name": "msg", "format": "jsonf",
             "datatype": "float"}]})
    with pytest.raises(ValueError):  # template.c:1521
        Template({"type": "list", "entries": [
            {"kind": "property", "name": "msg", "format": "jsonf",
             "onempty": "drop"}]})


def test_render_json_tpltojson_semantics():
    """tplToJSON (template.c:270-338): constants need outname; $! subtrees
    embed raw JSON (missing -> omitted, or null when mandatory); plain
    fields emit iff mandatory or non-empty; dataType does NOT apply."""
    import json as _json
    import pyarrow as pa
    from rsyslog_ray.templates import Template
    batch = pa.table({
        "msg": pa.array(["hello", ""], pa.string()),
        "hostname": pa.array(["h1", "h2"], pa.string()),
        "cee_json": pa.array(['{"a":{"n":5},"s":"x"}', None], pa.string()),
    })
    t = Template({"type": "list", "entries": [
        {"kind": "constant", "value": "c1", "outname": "tag"},
        {"kind": "constant", "value": "dropped-no-outname"},
        {"kind": "property", "name": "msg", "outname": "message"},
        {"kind": "property", "name": "hostname", "outname": "host",
         "mandatory": "on"},
        {"kind": "property", "name": "$!a", "outname": "sub"},
        {"kind": "property", "name": "$!missing", "outname": "gone"},
        {"kind": "property", "name": "$!missing", "outname": "forced",
         "mandatory": "on"},
    ]})
    out = t.render_json(batch).to_pylist()
    assert _json.loads(out[0]) == {
        "tag": "c1", "message": "hello", "host": "h1",
        "sub": {"n": 5}, "forced": None}
    # row 2: empty msg omitted (not mandatory), no JSON tree at all
    assert _json.loads(out[1]) == {"tag": "c1", "host": "h2",
                                   "forced": None}


def test_render_json_subtree_template():
    import pyarrow as pa
    from rsyslog_ray.templates import Template
    batch = pa.table({"cee_json": ['{"a":1}', None]})
    t = Template({"type": "subtree", "subtree": "$!"})
    assert t.render_json(batch).to_pylist() == ['{"a":1}', "{}"]
