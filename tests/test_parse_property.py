"""Property-based conformance: the vectorized Arrow parse cascade must
agree with the straight-line Python oracle on arbitrary syslog-shaped and
garbage inputs (the engine/oracle pair is the seq_check analogue — any
divergence here would also poison the routed-row equality gate).

Pure-local (no Ray): parse_table is a plain Arrow function.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from rsyslog_ray.stages.parse import parse_table
from tests import oracle

TS = np.datetime64("2024-03-01T12:00:00.000000", "us")

safe = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126,
                           exclude_characters='<>"\\[]'),
    min_size=1, max_size=8)

rfc3339_ts = st.builds(
    lambda m, d, h, frac, tz: f"2024-{m:02d}-{d:02d}T{h:02d}:30:15{frac}{tz}",
    st.integers(1, 12), st.integers(1, 28), st.integers(0, 23),
    st.sampled_from(["", ".5", ".123456"]),
    st.sampled_from(["", "Z", "+02:00", "-05:30"]))

rfc5424_body = st.builds(
    lambda ts, host, app, procid, msgid, sd, msg:
        f"1 {ts} {host} {app} {procid} {msgid} {sd}"
        + (f" {msg}" if msg is not None else ""),
    st.one_of(rfc3339_ts, st.just("-"), safe),
    *(st.one_of(st.just("-"), safe) for _ in range(4)),
    st.sampled_from(["-", '[x@1 k="v"]', '[a b="c\\]d"][e f="g"]',
                     "[bad", "notsd"]),
    st.one_of(st.none(), st.text(max_size=20)))

mon = st.sampled_from(["Jan", "Mar", "Dec", "Xxx", "ja"])
rfc3164_body = st.builds(
    lambda m, d, hms, sp, host, tag, msg:
        f"{m} {d}{' ' if d < 10 and sp else ''} {hms} {host}"
        + (f" {tag}: {msg}" if tag else f" {msg}"),
    mon, st.integers(1, 31), st.sampled_from(["01:02:03", "99:99:99"]),
    st.booleans(), safe, st.one_of(st.none(), safe),
    st.text(max_size=15))

bodies = st.one_of(
    rfc5424_body, rfc3164_body,
    st.builds(lambda s: f"  {{{s}}}", st.text(max_size=10)),   # headerless
    st.builds(lambda s: f" [{s}]", st.text(max_size=10)),
    st.text(max_size=40),                                      # garbage
)

messages = st.one_of(
    st.builds(lambda p, b: f"<{p}>{b}", st.integers(0, 1500), bodies),
    st.builds(lambda b: f"<>{b}", bodies),
    st.builds(lambda b: f"<12x{b}", bodies),
    bodies,
    st.builds(lambda b, tail: b + tail, bodies,
              st.sampled_from(["", "\n", "\r\n", "\x00", "\n\n"])),
    st.builds(lambda b, c: b + c + "x", bodies,
              st.sampled_from(["\t", "\x07", "\x1f"])),
)

FIELDS = ["pri", "facility", "severity", "protocol", "parse_success",
          "hostname", "tag", "appname", "procid", "msgid",
          "structured_data", "msg", "is_cee"]


@settings(max_examples=300, deadline=None)
@given(text=messages)
def test_parse_matches_python_oracle(text):
    batch = pa.table({
        "conv_id": pa.array(["c"]), "turn_idx": pa.array([0], pa.int32()),
        "role": pa.array(["user"]), "text": pa.array([text], pa.large_string()),
        "tool": pa.array([""]),
        "ts": pa.array([TS], pa.timestamp("us")),
    })
    got = parse_table(batch)
    exp = oracle.parse_row("c", 0, "user", text, "", pd.Timestamp(TS))
    if exp is None:
        assert got.num_rows == 0, f"engine kept an empty-sanitized row: {text!r}"
        return
    assert got.num_rows == 1
    row = {f: got[f][0].as_py() for f in FIELDS}
    for f in FIELDS:
        expected = getattr(exp, f) if f not in ("facility", "severity") \
            else getattr(exp, f)
        assert row[f] == expected, (f, text, row[f], expected)
    # reported timestamp (fallback = reception ts)
    ts_rep = got["ts_reported"][0].as_py()
    assert pd.Timestamp(ts_rep) == pd.Timestamp(exp.ts_reported), (
        "ts_reported", text, ts_rep, exp.ts_reported)


def test_salted_group_apply_equals_direct(ray_session):
    """salted_group_apply(fn) == groupby(fn) for an algebraic combiner."""
    import ray.data as rd
    from rsyslog_ray.stages.aggregate import salted_group_apply
    rng = np.random.RandomState(5)
    n = 2000
    df = pd.DataFrame({
        "k": np.where(rng.rand(n) < 0.5, "hot", rng.choice(list("abcdef"), n)),
        "v": rng.randint(0, 100, n),
    })
    def combiner(g: pd.DataFrame) -> pd.DataFrame:
        # algebraic: accepts raw rows OR its own partial output
        if "v" in g.columns:
            return (g.groupby("k", as_index=False)
                    .agg(v_sum=("v", "sum"), v_max=("v", "max")))
        return (g.groupby("k", as_index=False)
                .agg(v_sum=("v_sum", "sum"), v_max=("v_max", "max")))
    ds = rd.from_pandas(df)
    got = {r["k"]: (r["v_sum"], r["v_max"])
           for r in salted_group_apply(ds, "k", combiner).take_all()}
    exp = {r["k"]: (r["v_sum"], r["v_max"])
           for _, r in combiner(df).iterrows()}
    assert got == exp


def test_json_tree_property_access():
    """`$!a!b` JSON-tree properties (runtime/msg.c msgGetJSONPropJSON)
    work in filters AND templates via the shared PropertyRegistry; keys
    stay case-sensitive; rows without a tree yield null."""
    import pyarrow as pa
    from rsyslog_ray.expr import PropertyRegistry, eval_mask
    from rsyslog_ray.templates import Template
    batch = pa.table({
        "msg": pa.array(["a", "b", "c"]),
        "cee_json": pa.array(['{"Event":"login","n":5,"u":{"id":9}}',
                              '{"Event":"logout","n":2}', None]),
    })
    p = PropertyRegistry(batch)
    assert p.get("$!Event").to_pylist() == ["login", "logout", None]
    assert p.get("$!u!id").to_pylist() == ["9", None, None]
    assert eval_mask(("==", ("prop", "$!Event"), "login"),
                     batch).to_pylist() == [True, False, False]
    assert Template("ev=%$!Event% n=%$!n%").render(batch).to_pylist() == \
        ["ev=login n=5", "ev=logout n=2", "ev= n="]
    # no tree column at all: every $! path reads as "" (msg.c
    # msgGetJSONPropJSON not-found semantics — reference's
    # template-pos-from-to-missing-jsonvar.sh renders '--')
    assert PropertyRegistry(
        pa.table({"msg": pa.array(["x"])})).get("$!a").to_pylist() == [""]
