"""mmexternal / omprog external-process stages.

Reference: plugins/mmexternal/mmexternal.c (line-JSON stdin/stdout
protocol, MsgSetPropsViaJSON merge), plugins/omprog/omprog.c
(confirmMessages / transaction marks / output capture).
"""

import json
import stat
import sys
import textwrap

import pyarrow as pa
import pytest

from rsyslog_ray.stages.external import (
    MMExternal, OmProg, apply_props_via_json,
    mmexternal_table, omprog_table,
)


def _script(tmp_path, name, body):
    p = tmp_path / name
    p.write_text(f"#!{sys.executable}\n" + textwrap.dedent(body))
    p.chmod(p.stat().st_mode | stat.S_IXUSR)
    return str(p)


# Toy mmexternal filter: replies {"$!": {"len": N}, "hostname": "ext"} per
# line; "{}" for lines containing "skip"; exits abruptly on "die".
FILTER = """\
    import json, sys
    for line in sys.stdin:
        line = line.rstrip("\\n")
        if "die" in line:
            sys.exit(1)
        if "skip" in line:
            print("{}")
        else:
            print(json.dumps({"$!": {"len": len(line)}, "hostname": "ext"}))
        sys.stdout.flush()
"""


def _msg_table(msgs, **extra):
    cols = {"msg": pa.array(msgs, pa.string()),
            "hostname": pa.array(["h"] * len(msgs), pa.string())}
    cols.update(extra)
    return pa.table(cols)


def test_mmexternal_merges_json(tmp_path):
    binary = _script(tmp_path, "filter.py", FILTER)
    st = MMExternal(binary)
    out = st(_msg_table(["hello world", "skip me", "abc"]))
    cee = [json.loads(s) if s else None
           for s in out["cee_json"].to_pylist()]
    assert cee[0] == {"len": 11}
    assert cee[1] is None          # "{}" shortcut: row untouched
    assert cee[2] == {"len": 3}
    assert out["hostname"].to_pylist() == ["ext", "h", "ext"]


def test_mmexternal_merge_into_existing_tree(tmp_path):
    binary = _script(tmp_path, "filter.py", FILTER)
    st = MMExternal(binary)
    t = _msg_table(["xy"], cee_json=pa.array(
        ['{"keep":1,"len":"old"}'], pa.string()))
    out = st(t)
    # msgAddJSON "!" root: shallow merge, new keys replace old
    assert json.loads(out["cee_json"].to_pylist()[0]) == {
        "keep": 1, "len": 2}


def test_mmexternal_child_death_degrades_and_restarts(tmp_path):
    binary = _script(tmp_path, "filter.py", FILTER)
    st = MMExternal(binary)
    out = st(_msg_table(["ok1", "die now", "after"]))
    # reply for "ok1" lands; the dead remainder degrades to "{}"
    # (mmexternal.c:238), including the row that killed the child
    host = out["hostname"].to_pylist()
    assert host[0] == "ext"
    assert host[1] == "h" and host[2] == "h"
    # child restarted: next batch works
    out2 = st(_msg_table(["recovered"]))
    assert out2["hostname"].to_pylist() == ["ext"]


def test_mmexternal_rawmsg_and_fulljson_inputs(tmp_path):
    echo = _script(tmp_path, "echo.py", """\
        import json, sys
        for line in sys.stdin:
            print(json.dumps({"$!": {"seen": line.rstrip("\\n")}}))
            sys.stdout.flush()
    """)
    t = pa.table({
        "msg": pa.array(["m1"], pa.string()),
        "text": pa.array(["<13>raw m1"], pa.string()),
        "hostname": pa.array(["h"], pa.string()),
        "tag": pa.array(["t:"], pa.string()),
        "appname": pa.array(["t"], pa.string()),
        "facility": pa.array([1], pa.int32()),
        "severity": pa.array([5], pa.int32()),
    })
    raw = MMExternal(echo, interface_input="rawmsg")(t)
    assert json.loads(raw["cee_json"].to_pylist()[0])["seen"] == "<13>raw m1"
    fj = MMExternal(echo, interface_input="fulljson")(t)
    seen = json.loads(json.loads(fj["cee_json"].to_pylist()[0])["seen"])
    assert seen["msg"] == "m1" and seen["hostname"] == "h"


def test_mmexternal_invalid_interface_input_rejected(tmp_path):
    with pytest.raises(ValueError):
        MMExternal("true", interface_input="bogus")  # mmexternal.c:570


def test_apply_props_key_table():
    t = pa.table({
        "msg": pa.array(["old"], pa.string()),
        "text": pa.array(["oldraw"], pa.string()),
        "tag": pa.array(["t:"], pa.string()),
        "pri": pa.array([13], pa.int32()),
        "facility": pa.array([1], pa.int32()),
        "severity": pa.array([5], pa.int32()),
        "procid": pa.array(["-"], pa.string()),
        "msgid": pa.array(["-"], pa.string()),
        "structured_data": pa.array(["-"], pa.string()),
        "hostname": pa.array(["h"], pa.string()),
    })
    resp = json.dumps({
        "msg": "newmsg", "rawmsg": "newraw", "syslogtag": "nt:",
        "pri": 165, "procid": "42", "msgid": "mid",
        "structured-data": "[x a=\"1\"]", "source": "s2",
        "unknown-key": "ignored",
    })
    out = apply_props_via_json(t, [resp])
    assert out["msg"].to_pylist() == ["newmsg"]
    assert out["text"].to_pylist() == ["newraw"]
    assert out["tag"].to_pylist() == ["nt:"]
    # msgSetPRI: pri=165 -> fac 20, sev 5
    assert out["pri"].to_pylist() == [165]
    assert out["facility"].to_pylist() == [20]
    assert out["severity"].to_pylist() == [5]
    assert out["procid"].to_pylist() == ["42"]
    assert out["msgid"].to_pylist() == ["mid"]
    assert out["structured_data"].to_pylist() == ['[x a="1"]']
    assert out["hostname"].to_pylist() == ["s2"]


def test_apply_props_range_checks_and_invalid_pri():
    t = pa.table({
        "pri": pa.array([13, 13], pa.int32()),
        "facility": pa.array([1, 1], pa.int32()),
        "severity": pa.array([5, 5], pa.int32()),
    })
    # out-of-range syslogfacility/syslogseverity ignored (msg.c:4626-4635);
    # pri > 191 -> invld.=debug (msgSetPRI -> LOG_PRI_INVLD)
    out = apply_props_via_json(t, [
        json.dumps({"syslogfacility": 99, "syslogseverity": 8}),
        json.dumps({"pri": 500}),
    ])
    assert out["facility"].to_pylist() == [1, 24]
    assert out["severity"].to_pylist() == [5, 7]
    assert out["pri"].to_pylist() == [13, 199]


def test_apply_props_unparseable_and_nonobject():
    t = pa.table({"hostname": pa.array(["h"], pa.string())})
    for bad in ["not json", "[1,2]", None, ""]:
        out = apply_props_via_json(t, [bad])
        assert out["hostname"].to_pylist() == ["h"]


def test_mmexternal_registry_fn(tmp_path):
    from rsyslog_ray.config import STAGE_REGISTRY
    binary = _script(tmp_path, "filter.py", FILTER)
    out = STAGE_REGISTRY["mmexternal"](_msg_table(["abcd"]), binary=binary)
    assert json.loads(out["cee_json"].to_pylist()[0]) == {"len": 4}
    # second call reuses the cached warm child (same pid)
    from rsyslog_ray.stages import external as ext
    pids = {id(v.child.proc) for k, v in ext._WORKER_CHILDREN.items()
            if k[0] == "MMExternal"}
    out2 = mmexternal_table(_msg_table(["xyzzy!"]), binary=binary)
    pids2 = {id(v.child.proc) for k, v in ext._WORKER_CHILDREN.items()
             if k[0] == "MMExternal"}
    assert pids == pids2
    assert json.loads(out2["cee_json"].to_pylist()[0]) == {"len": 6}


# Toy omprog consumer: confirms startup, then OKs every line except ones
# containing "bad", writing received lines to a side file.
CONSUMER = """\
    import sys
    outpath = sys.argv[1]
    print("OK"); sys.stdout.flush()   # startup confirmation (startChild)
    with open(outpath, "w", buffering=1) as f:
        for line in sys.stdin:
            line = line.rstrip("\\n")
            if line.startswith("BEGIN ") or line.startswith("COMMIT "):
                f.write(line + "\\n")
                continue
            f.write(line + "\\n")
            if "bad" in line:
                print("some error")   # recoverable failure
            else:
                print(".OK")          # keep-alive dot + OK
            sys.stdout.flush()
"""


def _omprog_table(msgs):
    n = len(msgs)
    return pa.table({
        "msg": pa.array(msgs, pa.string()),
        "hostname": pa.array(["host1"] * n, pa.string()),
        "tag": pa.array(["app:"] * n, pa.string()),
        "ts": pa.array([1700000000000000] * n, pa.timestamp("us")),
        "ts_reported": pa.array([1700000000000000] * n,
                                pa.timestamp("us")),
        "facility": pa.array([3] * n, pa.int32()),
        "severity": pa.array([6] * n, pa.int32()),
    })


def test_omprog_confirm_protocol(tmp_path):
    sink = tmp_path / "sink.txt"
    binary = _script(tmp_path, "consumer.py", CONSUMER)
    st = OmProg(binary, args=(str(sink),), template="%msg%\n",
                confirm_messages=True)
    out = st(_omprog_table(["alpha", "bad thing", "gamma"]))
    assert out["omprog_confirmed"].to_pylist() == [True, False, True]
    got = sink.read_text().splitlines()
    assert got == ["alpha", "bad thing", "gamma"]


def test_omprog_transactions_and_template(tmp_path):
    sink = tmp_path / "sink.txt"
    binary = _script(tmp_path, "consumer.py", CONSUMER)
    st = OmProg(binary, args=(str(sink),), template="%hostname% %msg%\n",
                confirm_messages=True, use_transactions=True)
    st(_omprog_table(["one", "two"]))
    st.child.close()  # flush + EOF so the consumer finishes the file
    got = sink.read_text().splitlines()
    assert got == ["BEGIN TRANSACTION", "host1 one", "host1 two",
                   "COMMIT TRANSACTION"]


def test_omprog_no_confirm_fire_and_forget(tmp_path):
    sink = tmp_path / "sink.txt"
    binary = _script(tmp_path, "consumer_nc.py", """\
        import sys
        with open(sys.argv[1], "w") as f:
            for line in sys.stdin:
                f.write(line)
    """)
    st = OmProg(binary, args=(str(sink),), template="%msg%\n")
    out = st(_omprog_table(["x", "y"]))
    assert "omprog_confirmed" not in out.column_names
    st.child.close()
    assert sink.read_text().splitlines() == ["x", "y"]


def test_mmexternal_in_ray_map_batches(tmp_path, ray_session):
    import ray
    binary = _script(tmp_path, "filter.py", FILTER)
    ds = ray.data.from_arrow(_msg_table(
        [f"row {i}" for i in range(64)] + ["skip 1"]))
    df = ds.map_batches(
        MMExternal, fn_constructor_kwargs={"binary": binary},
        batch_format="pyarrow", concurrency=2, batch_size=16,
    ).to_pandas()
    host = df["hostname"].tolist()
    assert host.count("ext") == 64 and host.count("h") == 1
