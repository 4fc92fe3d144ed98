"""Unit tests for the mm* modifier kernels (enrich.py) on hand-built
batches — complements the oracle-conformance queries."""

import json

import pyarrow as pa

from rsyslog_ray.stages.enrich import (mmanon_table, mmfields_table,
                                       mmjsonparse_table, mmpstrucdata_table,
                                       mmrm1stspace_table,
                                       parse_structured_data)


def _t(col, vals):
    return pa.table({col: pa.array(vals, pa.string())})


def test_mmfields_split_and_cap():
    t = mmfields_table(_t("msg", ["a,b,c", "x", "", "1,2,3,4,5,6"]),
                       col="msg", sep=",", max_fields=4)
    assert t["f1"].to_pylist() == ["a", "x", "", "1"]
    assert t["f3"].to_pylist() == ["c", None, None, "3"]
    assert t["f4"].to_pylist() == [None, None, None, "4"]
    assert "f5" not in t.column_names


def test_mmjsonparse_cookie_and_normalization():
    t = mmjsonparse_table(_t("msg", [
        '@cee: {"b":1,"a":2}', '  @cee: {"x": 1}', '@cee: notjson', 'plain']))
    assert t["cee_parsesuccess"].to_pylist() == [True, True, False, False]
    assert t["cee_json"].to_pylist()[0] == '{"a":2,"b":1}'   # sorted+compact


def test_mmpstrucdata_nested_and_escapes():
    sd = '[exam@32473 k="v1" q="a\\]b"][id2 z="q\\"w"]'
    parsed = parse_structured_data(sd)
    assert parsed == {"exam@32473": {"k": "v1", "q": "a]b"},
                      "id2": {"z": 'q"w'}}
    assert parse_structured_data("-") is None
    t = mmpstrucdata_table(_t("structured_data", [sd, "-", ""]))
    assert json.loads(t["rfc5424_sd"].to_pylist()[0])["id2"]["z"] == 'q"w'
    assert t["rfc5424_sd"].to_pylist()[1] is None


def test_mmanon_zero_modes():
    t = mmanon_table(_t("msg", ["src=192.168.1.77 x", "no ips", "1.2.3.4.5"]),
                     col="msg", mode="zero", bits=16)
    assert t["msg"].to_pylist()[0] == "src=192.168.0.0 x"
    assert t["msg"].to_pylist()[1] == "no ips"
    t24 = mmanon_table(_t("msg", ["ip 10.20.30.40"]), col="msg", bits=24)
    assert t24["msg"].to_pylist() == ["ip 10.0.0.0"]


def test_mmrm1stspace():
    t = mmrm1stspace_table(_t("msg", [" leading", "none", "  two"]))
    assert t["msg"].to_pylist() == ["leading", "none", " two"]


def test_mmanon_zero_suboctet_bits():
    from rsyslog_ray.stages.enrich import mmanon_table
    t = pa.table({"line": pa.array(["src=10.1.2.255 x", "no ip"], pa.string())})
    out = mmanon_table(t, col="line", mode="zero", bits=12)["line"].to_pylist()
    # 10.1.2.255 = 0x0A0102FF; >>12<<12 → 0x0A010000... wait low 12 bits of
    # 0x0102FF: 0x2FF cleared → 0x0A010000 | (0x02FF & ~0xFFF)=0 → 10.1.0.0
    assert out == ["src=10.1.0.0 x", "no ip"]


def test_mmanon_simple_mode_preserves_layout():
    from rsyslog_ray.stages.enrich import mmanon_table
    t = pa.table({"line": pa.array(["a 192.168.10.7 b 1.2.3.4"], pa.string())})
    out = mmanon_table(t, col="line", mode="simple", bits=16)["line"][0].as_py()
    assert out == "a 192.168.xx.x b 1.2.x.x"


def test_mmanon_random_consistent_and_prefix():
    from rsyslog_ray.stages.enrich import mmanon_table
    t = pa.table({"line": pa.array(["ip 10.1.2.3 and 10.1.2.3 again",
                                    "ip 10.1.9.9"], pa.string())})
    out = mmanon_table(t, col="line", mode="random-consistent",
                       bits=16)["line"].to_pylist()
    import re as _re
    ips = _re.findall(r"\d+\.\d+\.\d+\.\d+", out[0])
    assert ips[0] == ips[1]                       # consistent per input
    assert ips[0].startswith("10.1.")             # high bits preserved
    # deterministic across calls
    again = mmanon_table(t, col="line", mode="random-consistent",
                         bits=16)["line"].to_pylist()
    assert again == out


def test_mmanon_invalid_octet_advances_one_char():
    """The reference scanner (mmanon.c getipv4) fails an invalid octet
    and advances ONE char — '999.1.2.3' keeps the leading '9' and
    anonymizes '99.1.2.3' (mmanon_recognize_ipv4.sh's '256.0.0.0' →
    '20.0.0.0' pattern)."""
    from rsyslog_ray.stages.enrich import mmanon_table
    t = pa.table({"line": pa.array(["v=999.1.2.3"], pa.string())})
    out = mmanon_table(t, col="line", mode="zero", bits=12)["line"][0].as_py()
    assert out == "v=999.1.0.0"


def test_mmanon_ipv6_zero_and_random():
    from rsyslog_ray.stages.enrich import mmanon_ipv6_table
    t = pa.table({"line": pa.array(
        ["x 2001:db8:85a3::8a2e:370:7334 y", "none here"], pa.string())})
    out = mmanon_ipv6_table(t, col="line", mode="zero", bits=96)["line"]
    # reference rendering: eight explicit groups, no '::' compression
    assert out.to_pylist() == ["x 2001:db8:0:0:0:0:0:0 y", "none here"]
    r1 = mmanon_ipv6_table(t, col="line", mode="random-consistent",
                           bits=96)["line"][0].as_py()
    assert r1.startswith("x 2001:db8:") \
        and r1 != "x 2001:db8:0:0:0:0:0:0 y"
    r2 = mmanon_ipv6_table(t, col="line", mode="random-consistent",
                           bits=96)["line"][0].as_py()
    assert r1 == r2


# ---------------------------------------------------------------------------
# mmutf8fix (plugins/mmutf8fix/mmutf8fix.c doCC / doUTF8)
# ---------------------------------------------------------------------------

def _utf8fix_oracle(msg: bytes, repl: int = 0x20) -> bytes:
    """Direct sequential port of doUTF8 (mmutf8fix.c:221-295) as the
    test oracle for the vectorized kernel."""
    b = bytearray(msg)
    n = len(b)
    bytes_left = 0
    strt = 0
    cp = 0
    i = 0
    while i < n:
        c = b[i]
        if bytes_left:
            if (c & 0xC0) != 0x80:
                for j in range(strt, i):
                    b[j] = repl
                bytes_left = 0
                continue            # reprocess current byte as start
            cp = (cp << 6) | (c & 0x3F)
            bytes_left -= 1
            if bytes_left == 0:
                seqlen = i - strt + 1
                if ((seqlen == 2 and cp < 0x80)
                        or (seqlen == 3 and cp < 0x800)
                        or (seqlen == 4 and cp < 0x10000)
                        or (0xD800 <= cp <= 0xDFFF) or cp > 0x10FFFF):
                    for j in range(strt, min(strt + seqlen, n)):
                        b[j] = repl
        else:
            if (c & 0x80) == 0:
                pass
            elif (c & 0xE0) == 0xC0:
                strt, bytes_left, cp = i, 1, c & 0x1F
            elif (c & 0xF0) == 0xE0:
                strt, bytes_left, cp = i, 2, c & 0x0F
            elif (c & 0xF8) == 0xF0:
                strt, bytes_left, cp = i, 3, c & 0x07
            else:
                b[i] = repl
        i += 1
    if bytes_left:
        for j in range(strt, n):
            b[j] = repl
    return bytes(b)


def test_mmutf8fix_matches_reference_oracle():
    from rsyslog_ray.stages.enrich import mmutf8fix_table
    cases = [
        b"plain ascii stays",
        "valid utf-8 café 中文 \U0001f600".encode(),
        b"stray cont \x80 and \xbf here",
        b"truncated lead \xc3",                       # lead at end of row
        b"truncated 3seq \xe2\x82 end",
        b"overlong \xc0\xaf slash",                   # 2-byte overlong
        b"overlong3 \xe0\x80\xaf x",                  # 3-byte overlong
        b"overlong4 \xf0\x80\x80\xaf x",              # 4-byte overlong
        b"surrogate \xed\xa0\x80 pair",               # U+D800
        b"too large \xf4\x90\x80\x80 cp",             # > 0x10FFFF
        b"forbidden \xf8\x88\x80\x80\x80 5byte",
        b"\xffinvalid at both ends\xfe",
        b"extra cont \xc3\xa9\xa9 after valid 2seq",
        b"lead then lead \xc3\xc3\xa9",
        b"\x80",                                      # lone cont row
        b"",
        b"mixed \xe2\x98\x83 snowman then bad \xe2\x28\xa1 seq",
    ]
    tbl = pa.table({"i": pa.array(range(len(cases) + 1), pa.int64()),
                    "raw": pa.array(cases + [None], pa.large_binary())})
    out = mmutf8fix_table(tbl, col="raw")["raw"].to_pylist()
    for raw, got in zip(cases, out[:-1]):
        want = _utf8fix_oracle(raw).decode("utf-8")
        assert got == want, f"{raw!r}: {got!r} != {want!r}"
    assert out[-1] is None


def test_mmutf8fix_controlcharacters_mode_and_registry():
    from rsyslog_ray.config import STAGE_REGISTRY
    tbl = pa.table({"raw": pa.array([b"a\x01b\ttab\x7f~", b"ok"],
                                    pa.binary())})
    out = STAGE_REGISTRY["mmutf8fix"](tbl, col="raw",
                                      mode="controlcharacters",
                                      replacement_char="?")
    assert out["raw"].to_pylist() == ["a?b?tab?~", "ok"]


# ---------------------------------------------------------------------------
# reload_lookup_table analogue (runtime/lookup.c:717-866, ruleset.c:553-568)
# ---------------------------------------------------------------------------

def _write_lkp(path, pairs, nomatch="NONE"):
    import json
    with open(path, "w") as fh:
        json.dump({"version": 1, "nomatch": nomatch, "type": "string",
                   "table": [{"index": k, "value": v} for k, v in pairs]},
                  fh)


def test_reloadable_lookup_hot_reload_and_stub(tmp_path):
    import os
    from rsyslog_ray.lookup import ReloadableLookup
    from rsyslog_ray.stages.enrich import LookupEnrich
    p = str(tmp_path / "x.lkp_tbl")
    _write_lkp(p, [("a", "1"), ("b", "2")])
    tbl = ReloadableLookup(p)
    batch = pa.table({"k": pa.array(["a", "b", "z"])})
    enrich = LookupEnrich([("v", "k", tbl)])
    assert enrich(batch)["v"].to_pylist() == ["1", "2", "NONE"]
    # rewrite the backing file (bump mtime) → next batch sees new values
    _write_lkp(p, [("a", "10"), ("z", "26")])
    os.utime(p, ns=(1, 1))        # force a distinct mtime_ns
    assert enrich(batch)["v"].to_pylist() == ["10", "NONE", "26"]
    # corrupt file WITHOUT stub → keeps serving the old table
    with open(p, "w") as fh:
        fh.write("{broken json")
    os.utime(p, ns=(2, 2))
    assert enrich(batch)["v"].to_pylist() == ["10", "NONE", "26"]
    # corrupt file WITH stub → every lookup returns the stub
    stubbed = ReloadableLookup.__new__(ReloadableLookup)
    stubbed.path, stubbed.stub = p, "STUB"
    stubbed.table, stubbed._mtime = tbl.table, 0   # pretend old load
    stubbed.maybe_reload()
    assert stubbed.lookup_array(pa.array(["a"])).to_pylist() == ["STUB"]


def test_mmutf8fix_fuzz_vs_sequential_oracle():
    """Property test: on arbitrary byte strings the vectorized kernel must
    (a) equal the sequential mmutf8fix.c port byte-for-byte and (b) emit
    valid UTF-8 (the Arrow binary→string cast inside the stage enforces
    this — it raises on invalid output)."""
    from hypothesis import given, settings, strategies as st
    from rsyslog_ray.stages.enrich import mmutf8fix_table

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.binary(max_size=40), min_size=1, max_size=8))
    def check(rows):
        tbl = pa.table({"raw": pa.array(rows, pa.large_binary())})
        got = mmutf8fix_table(tbl, col="raw")["raw"].to_pylist()
        for raw, out in zip(rows, got):
            assert out == _utf8fix_oracle(raw).decode("utf-8"), raw
    check()


def test_redact_table_matches_duckdb():
    import duckdb
    from rsyslog_ray.stages.enrich import redact_table, redact_sql
    t = pa.table({"text": pa.array([
        "mail a.b+c@ex-ample.co.uk or JOE@X.IO now",
        "call +44 20 7946 0958 or +1-415-555-0199",
        "ids 123456 and 99999 and 1234567890123",
        "no pii here", "", None,
        "edge@case.c x@y.zz 12345",   # 1-char TLD not an email; 5 digits stay
    ])})
    got = redact_table(t)["text"].to_pylist()
    want = [r[0] for r in duckdb.sql(
        "SELECT " + redact_sql() + " FROM t").fetchall()]
    assert got == want
    assert got[0] == "mail <EMAIL> or <EMAIL> now"
    assert "<NUM>" in got[2] and "99999" in got[2]


def test_mmtaghostname():
    from rsyslog_ray.stages.enrich import mmtaghostname_table
    t = pa.table({"text": pa.array(["a", "b"]),
                  "hostname": pa.array(["h1", "h2"])})
    out = mmtaghostname_table(t, tag="mytag:", force_localhostname=True,
                              localhostname="lh")
    assert out["tag"].to_pylist() == ["mytag:", "mytag:"]
    assert out["hostname"].to_pylist() == ["lh", "lh"]
    # no-op config leaves columns alone
    same = mmtaghostname_table(t)
    assert same["hostname"].to_pylist() == ["h1", "h2"]


def test_mmrfc5424addhmac():
    import hashlib
    import hmac
    from rsyslog_ray.stages.enrich import mmrfc5424addhmac_table
    raw = ['<34>1 2024-01-01T00:00:00Z h app 1 m [x@1 a="b"] hello',
           '<34>1 2024-01-01T00:00:00Z h app 1 m - empty-sd',
           '<13>Feb  5 17:32:18 host prog: not5424',
           '<34>1 2024-01-01T00:00:00Z h app 1 m [hmac@0 hash="old"] signed']
    t = pa.table({
        "text": pa.array(raw, pa.string()),
        "protocol": pa.array([1, 1, 0, 1], pa.int64()),
        "structured_data": pa.array(
            ['[x@1 a="b"]', "-", "", '[hmac@0 hash="old"]'], pa.string()),
    })
    out = mmrfc5424addhmac_table(t, key="s3cret")["structured_data"] \
        .to_pylist()
    d0 = hmac.new(b"s3cret", raw[0].encode(), hashlib.sha256).hexdigest()
    d1 = hmac.new(b"s3cret", raw[1].encode(), hashlib.sha256).hexdigest()
    assert out[0] == f'[x@1 a="b"][hmac@0 hash="{d0}"]'   # concatenated
    assert out[1] == f'[hmac@0 hash="{d1}"]'              # '-' replaced
    assert out[2] == ""                                   # non-5424 skipped
    assert out[3] == '[hmac@0 hash="old"]'                # already signed


def test_mmaudit_parses_audit_records(ray_session):
    import json

    import pyarrow as pa

    from rsyslog_ray.stages.enrich import mmaudit_table

    batch = pa.table({"msg": [
        "type=1305 audit(1234.567:890): auid=0 ses=1 op='add rule' res=1",
        '  type=1300 audit(99.1:2): key="val with spaces" x=y',
        "type=1305 audit(1:2): trailing space ",     # parse error: bare
        "not an audit line",
        "type=1305 noparen",
    ]})
    out = mmaudit_table(batch)
    ok = out["audit_parsesuccess"].to_pylist()
    assert ok == [True, True, False, False, False]
    t0 = json.loads(out["audit_json"].to_pylist()[0])
    # reference off-by-one: first char of the audit id is dropped
    # (mmaudit.c buf += sizeof(" audit(") — documented quirk)
    assert t0["hdr"] == {"auditid": "234.567:890", "type": 1305}
    assert t0["data"] == {"auid": "0", "ses": "1", "op": "add rule",
                          "res": "1"}
    t1 = json.loads(out["audit_json"].to_pylist()[1])
    assert t1["data"]["key"] == "val with spaces"
    assert t1["hdr"]["auditid"] == "9.1:2"


def test_mmaudit_python_oracle(ray_session):
    """Property-ish check of the k=v scanner against a literal port of
    parseName/parseValue run per record."""
    import json

    import pyarrow as pa

    from rsyslog_ray.stages.enrich import mmaudit_table

    def c_oracle(rest):
        i, n, data = 0, len(rest), {}
        while i < n:
            while i < n and rest[i].isspace():
                i += 1
            name = ""
            while i < n and rest[i] != "=":
                name += rest[i]
                i += 1
            if i >= n:
                return None if name else data
            i += 1
            term = " "
            if i < n and rest[i] in "'\"":
                term = rest[i]
                i += 1
            val = ""
            while i < n and rest[i] != term:
                val += rest[i]
                i += 1
            if i < n:
                i += 1
            data[name] = val
        return data

    rests = [" a=1 b='x y' c=\"q\"", " a=1 b", "k='unterminated",
             " x=1  y=2", "=v", " a==b", ""]
    msgs = [f"type=7 audit(id:1):{r}" for r in rests]
    out = mmaudit_table(pa.table({"msg": msgs}))
    for r, js, ok in zip(rests, out["audit_json"].to_pylist(),
                         out["audit_parsesuccess"].to_pylist()):
        want = c_oracle(r)
        if want is None:
            assert not ok
        else:
            assert ok and json.loads(js)["data"] == want, r


def test_mmsnmptrapd_rewrites(ray_session):
    import pyarrow as pa

    from rsyslog_ray.stages.enrich import mmsnmptrapd_table

    batch = pa.table({
        "tag": ["snmptrapd/warning/box1:", "snmptrapd/error/box2:",
                "snmptrapd/unknownsev/box3:", "snmptrapd/warning box4",
                "othertag:", "snmptrapd//box5:"],
        "hostname": ["h"] * 6,
        "severity": pa.array([6, 6, 6, 6, 6, 6], pa.int64()),
    })
    out = mmsnmptrapd_table(batch,
                            severity_mapping="warning/4,error/3")
    assert out["tag"].to_pylist() == [
        "snmptrapd:", "snmptrapd:", "snmptrapd:", "snmptrapd:",
        "othertag:", "snmptrapd:"]
    # host extracted (trailing ':' stripped); missing '/'-host → ""
    assert out["hostname"].to_pylist() == [
        "box1", "box2", "box3", "", "h", "box5"]
    # mapped severities update; unmapped stay
    assert out["severity"].to_pylist() == [4, 3, 6, 4, 6, 6]

    import pytest as _pytest
    with _pytest.raises(ValueError):
        mmsnmptrapd_table(batch, severity_mapping="warning/9")


def test_mm_audit_snmptrapd_registered():
    from rsyslog_ray.config import STAGE_REGISTRY

    assert "mmaudit" in STAGE_REGISTRY
    assert "mmsnmptrapd" in STAGE_REGISTRY
