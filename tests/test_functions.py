"""Unit tests for the RainerScript function kernels vs hand-computed goldens
(the rscript_* test-family analogue, tests/rscript.c + tests/*.rstest)."""

import numpy as np
import pyarrow as pa
import pytest

from rsyslog_ray import functions as F
from rsyslog_ray.lookup import SEV_BUCKET, LookupTable


def L(arr):
    return arr.to_pylist()


def test_string_functions():
    a = pa.array(["Hello World", "x", ""])
    assert L(F.strlen(a)) == [11, 1, 0]
    assert L(F.tolower(a)) == ["hello world", "x", ""]
    assert L(F.toupper(a)) == ["HELLO WORLD", "X", ""]
    assert L(F.substring(a, 1, 3)) == ["ell", "", ""]
    assert L(F.replace(a, "l", "L")) == ["HeLLo WorLd", "x", ""]
    assert L(F.ltrim(pa.array(["  a", "a  "]))) == ["a", "a  "]
    assert L(F.rtrim(pa.array(["  a", "a  "]))) == ["  a", "a"]


def test_wrap():
    assert L(F.wrap(pa.array(['a"b']), '"', "'")) == ['"a\'b"']
    assert L(F.wrap(pa.array(["ab"]), "#")) == ["#ab#"]


def test_casts():
    assert L(F.cstr(pa.array([1, 2]))) == ["1", "2"]
    assert L(F.cnum(pa.array(["42", " -7x", "abc", None]))) == [42, -7, 0, 0]


def test_field():
    a = pa.array(["a,b,c", "a", "x,", ""])
    assert L(F.field(a, ",", 2)) == ["b", F.FIELD_NOT_FOUND, "", F.FIELD_NOT_FOUND]
    assert L(F.field(a, ",", 1)) == ["a", "a", "x", ""]


def test_re_match_extract():
    a = pa.array(["msgnum:00000042: body", "no"])
    assert L(F.re_match(a, r"msgnum:\d+")) == [True, False]
    assert L(F.re_extract(a, r"msgnum:(\d+):", 0, 1, nomatch="-")) == ["00000042", "-"]
    b = pa.array(["a1 a2 a3"])
    assert L(F.re_extract(b, r"a(\d)", 1, 1)) == ["2"]
    assert L(F.re_extract(b, r"a(\d)", 5, 1, nomatch="N")) == ["N"]


def test_ip_functions():
    assert L(F.num2ipv4(pa.array([0, 3232235777, -5]))) == ["0.0.0.0", "192.168.1.1", "-1"]
    assert L(F.ipv42num(pa.array(["192.168.1.1", "1.2.3.999", "x"]))) == [3232235777, -1, -1]
    assert L(F.int2hex(pa.array([255, 16]))) == ["ff", "10"]


def test_hash_deterministic():
    h1 = L(F.hash64(pa.array(["a", "b", "a"])))
    assert h1[0] == h1[2] != h1[1]
    m = L(F.hash64mod(pa.array(["a", "b", "c", "d"]), 4))
    assert all(0 <= v < 4 for v in m)


def test_prifilt():
    fac = pa.array([16, 0, 3, 16])
    sev = pa.array([3, 7, 4, 7])
    assert L(F.prifilt(fac, sev, "local0.err")) == [True, False, False, False]
    assert L(F.prifilt(fac, sev, "*.*")) == [True, True, True, True]
    assert L(F.prifilt(fac, sev, "*.=debug")) == [False, True, False, True]
    assert L(F.prifilt(fac, sev, "*.*;local0.none")) == [False, True, True, False]
    assert L(F.prifilt(fac, sev, "kern,daemon.warning")) == [False, False, True, False]


def test_time_functions():
    ts = F.parse_rfc3339(pa.array([
        "2024-01-01T00:00:02.123456+00:00", "2024-01-01T05:00:02Z",
        "2024-01-01T05:00:02+02:00", "junk"]))
    assert ts[0].as_py().microsecond == 123456
    assert ts[2].as_py().hour == 3
    assert ts[3].as_py() is None
    out = F.format_time(pa.array([1704067200]), "date-rfc3164")
    assert L(out) == ["Jan  1 00:00:00"]
    out = F.format_time(pa.array([1704067200]), "date-rfc3339")
    # datetime.c:1282 sprintf: second precision, 'Z', no fraction
    assert L(out) == ["2024-01-01T00:00:00Z"]


def test_json_functions():
    j, ok = F.parse_json_column(pa.array(['{"b":1,"a":2}', "notjson"]))
    assert L(j) == ['{"a":2,"b":1}', None]
    assert L(ok) == [True, False]
    assert L(F.json_get(pa.array(['{"a":{"b":3}}']), "a!b")) == ["3"]
    assert L(F.unflatten(pa.array(['{"a.b":1,"a.c":2}']), ".")) == ['{"a":{"b":1,"c":2}}']


def test_lookup_tables():
    t = LookupTable.from_json(
        '{"version":1,"nomatch":"NONE","type":"string",'
        '"table":[{"index":"a","value":"1"},{"index":"b","value":"2"}]}')
    assert t.lookup("a") == "1" and t.lookup("zz") == "NONE"
    assert L(t.lookup_array(pa.array(["b", "q", "a"]))) == ["2", "NONE", "1"]
    arr = LookupTable(type="array", nomatch="-", keys=[10, 11, 12],
                      values=["x", "y", "z"])
    assert L(arr.lookup_array(pa.array([10, 12, 13, 9]))) == ["x", "z", "-", "-"]
    assert L(SEV_BUCKET.lookup_array(pa.array([0, 3, 4, 5, 7, -1]))) == \
        ["crit", "crit", "warn", "warn", "info", "na"]
    assert SEV_BUCKET.lookup(6) == "info"


def test_script_error_tracks_errno_functions():
    """script_error() (grammar/rainerscript.c:2792): per-row errno of the
    most recent errno-setting call — parse_json/parse_time/is_time set
    EOK=0 / EINVAL=1 (rainerscript.h:334-335)."""
    import pyarrow as pa
    from rsyslog_ray.expr import PropertyRegistry, compile_expr
    batch = pa.table({"j": pa.array(['{"a":1}', "not json", None]),
                      "t": pa.array(["2024-01-01T00:00:00Z", "xx", "bad"])})
    props = PropertyRegistry(batch)
    # before any errno-setting call: all EOK
    assert L(compile_expr(("script_error",), props)) == [0, 0, 0]
    compile_expr(("call", "parse_json", ("prop", "j")), props)
    assert L(compile_expr(("script_error",), props)) == [0, 1, 1]
    # a later errno-setting call OVERWRITES the state (last-call-wins)
    compile_expr(("call", "parse_time", ("prop", "t")), props)
    assert L(compile_expr(("script_error",), props)) == [0, 1, 1]
    compile_expr(("call", "is_time", ("prop", "t")), props)
    assert L(compile_expr(("script_error",), props)) == [0, 1, 1]


def test_script_error_visible_to_later_ruleset_statements():
    """The forced-parse-failure fixture: statement 1's filter runs
    parse_json; statement 2 routes the failed rows via script_error()
    (the wti execState persists across a ruleset walk)."""
    import pyarrow as pa
    from rsyslog_ray.stages.route import Action, Ruleset, route_table
    batch = pa.table({
        "conv_id": pa.array(["c1", "c2", "c3"]),
        "j": pa.array(['{"ok":true}', "{broken", '{"x":2}']),
    })
    rs = Ruleset("se", [
        Action("parsed", filter=("not", ("isempty",
               ("call", "parse_json", ("prop", "j"))))),
        Action("errs", filter=("==", ("script_error",), 1)),
    ])
    routed = route_table(batch, rs)
    assert routed["parsed"]["conv_id"].to_pylist() == ["c1", "c3"]
    assert routed["errs"]["conv_id"].to_pylist() == ["c2"]


def test_json_tree_set_unset_exists():
    """set/unset into the $! tree + exists() (cnfstmtNewSet/Unset,
    doFunct_Exists): exists distinguishes present-null from absent;
    set creates intermediate objects; unset on absent paths no-ops."""
    import pyarrow as pa
    trees = pa.array(['{"a":{"b":1},"z":null}', "{}", None, "notjson"])
    assert L(F.json_exists(trees, "a!b")) == [True, False, False, False]
    assert L(F.json_exists(trees, "z")) == [True, False, False, False]
    assert L(F.json_exists(trees, "q")) == [False, False, False, False]
    got = L(F.json_set(trees, "a!c", 7))
    assert got[0] == '{"a":{"b":1,"c":7},"z":null}'
    assert got[1] == '{"a":{"c":7}}'
    assert got[2] == '{"a":{"c":7}}'      # null tree starts from {}
    assert got[3] == '{"a":{"c":7}}'      # unparseable tree replaced
    # per-row values column
    got2 = L(F.json_set(pa.array(["{}", "{}"]), "v",
                        pa.array(["x", "y"])))
    assert got2 == ['{"v":"x"}', '{"v":"y"}']
    un = L(F.json_unset(trees, "a!b"))
    assert un[0] == '{"a":{},"z":null}'
    assert un[1] == "{}" and un[2] is None and un[3] == "notjson"
    assert L(F.json_unset(trees, "missing!deep"))[0] == \
        '{"a":{"b":1},"z":null}'


def test_case_insensitive_regex_and_get_property():
    import pyarrow as pa
    a = pa.array(["Hello World", "goodbye", None])
    assert L(F.re_match_i(a, "hello")) == [True, False, None]
    assert L(F.re_match(a, "hello")) == [False, False, None]
    assert L(F.re_extract_i(a, "(HELLO) (\\w+)", 0, 2)) == \
        ["World", "", ""]
    assert L(F.re_extract_i(a, "o", 1, 0)) == ["o", "o", ""]  # 2nd match
    j = pa.array(['{"k":"v","n":{"x":1}}'])
    assert L(F.get_property(j, "k")) == ["v"]
    # reference get_property is a SINGLE member lookup (json-c
    # json_object_object_get_ex of the literal key) — "n!x" is a miss;
    # nested access chains two calls (rainerscript.c:1877-1886)
    assert L(F.get_property(j, "n!x")) == [""]
    assert L(F.get_property(F.get_property(j, "n"), "x")) == ["1"]
    assert F.REGISTRY["ip42num"] is F.ipv42num


def test_exists_expr_op():
    import pyarrow as pa
    from rsyslog_ray.expr import eval_mask
    batch = pa.table({
        "msg": pa.array(["a", "b"]),
        "cee_json": pa.array(['{"k":null}', '{"x":1}']),
    })
    assert eval_mask(("exists", "$!k"), batch).to_pylist() == [True, False]
    assert eval_mask(("not", ("exists", "$!k")), batch).to_pylist() == \
        [False, True]
    no_tree = pa.table({"msg": pa.array(["a"])})
    assert eval_mask(("exists", "$!k"), no_tree).to_pylist() == [False]
