"""Hypothesis fuzz: the vectorized expr compiler vs a per-row Python
interpreter over randomly generated ASTs (comparisons, bool algebra,
arithmetic, string concat, isempty) — batch semantics must equal the
obvious scalar semantics on every row."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from rsyslog_ray.expr import PropertyRegistry, eval_mask

COLS = {
    "msg": ["error: disk full", "", "ok", "warn high load", "panic",
            "error again"],
    "hostname": ["web1", "db1", "web2", "", "web1", "cache"],
    "syslogseverity": [3, 6, 1, 7, 0, 3],
    "syslogfacility": [4, 0, 23, 16, 1, 4],
}
BATCH = pa.table({
    "msg": pa.array(COLS["msg"], pa.string()),
    "hostname": pa.array(COLS["hostname"], pa.string()),
    "severity": pa.array(COLS["syslogseverity"], pa.int64()),
    "facility": pa.array(COLS["syslogfacility"], pa.int64()),
    "conv_id": pa.array([f"c{i}" for i in range(6)]),
    "turn_idx": pa.array(range(6), pa.int32()),
})

NUM_PROPS = ["syslogseverity", "syslogfacility"]
STR_PROPS = ["msg", "hostname"]


def num_expr(depth):
    if depth <= 0:
        return st.one_of(
            st.integers(-9, 9).map(lambda v: ("lit", v)),
            st.sampled_from(NUM_PROPS).map(lambda p: ("prop", p)))
    sub = num_expr(depth - 1)
    return st.one_of(
        num_expr(0),
        st.tuples(st.sampled_from(["+", "-", "*"]), sub, sub),
        sub.map(lambda e: ("neg", e)))


def str_expr():
    return st.one_of(
        st.sampled_from(["err", "web", "", "x"]).map(lambda v: ("lit", v)),
        st.sampled_from(STR_PROPS).map(lambda p: ("prop", p)),
        st.tuples(st.just("&"),
                  st.sampled_from(STR_PROPS).map(lambda p: ("prop", p)),
                  st.sampled_from(["!", ""]).map(lambda v: ("lit", v))))


def bool_expr(depth):
    cmps = st.one_of(
        st.tuples(st.sampled_from(["==", "!=", "<", "<=", ">", ">="]),
                  num_expr(1), num_expr(1)),
        st.tuples(st.sampled_from(["==", "!="]), str_expr(), str_expr()),
        # contains/startswith take a LITERAL needle (property filters
        # compare against constants, runtime/ruleset.c PRIFILT/PROPFILT)
        st.tuples(st.sampled_from(["contains", "startswith"]), str_expr(),
                  st.sampled_from(["err", "web", "w", ""])
                  .map(lambda v: ("lit", v))),
        str_expr().map(lambda e: ("isempty", e)),
        st.tuples(st.just("in"), str_expr(),
                  st.lists(st.sampled_from(["web1", "db1", "err", ""]),
                           min_size=1, max_size=3)))
    if depth <= 0:
        return cmps
    sub = bool_expr(depth - 1)
    return st.one_of(
        cmps,
        st.tuples(st.sampled_from(["and", "or"]), sub, sub),
        sub.map(lambda e: ("not", e)))


def py_eval(expr, i):
    """Scalar oracle for one row."""
    if not isinstance(expr, tuple):
        return expr
    op = expr[0]
    if op == "lit":
        return expr[1]
    if op == "prop":
        p = expr[1]
        if p in ("syslogseverity",):
            return COLS["syslogseverity"][i]
        if p in ("syslogfacility",):
            return COLS["syslogfacility"][i]
        return COLS[p][i]
    if op in ("+", "-", "*"):
        a, b = py_eval(expr[1], i), py_eval(expr[2], i)
        return {"+": a + b, "-": a - b, "*": a * b}[op]
    if op == "neg":
        return -py_eval(expr[1], i)
    if op == "&":
        return str(py_eval(expr[1], i)) + str(py_eval(expr[2], i))
    if op in ("==", "!=", "<", "<=", ">", ">="):
        a, b = py_eval(expr[1], i), py_eval(expr[2], i)
        return {"==": a == b, "!=": a != b, "<": a < b, "<=": a <= b,
                ">": a > b, ">=": a >= b}[op]
    if op == "contains":
        return str(py_eval(expr[2], i)) in str(py_eval(expr[1], i))
    if op == "startswith":
        return str(py_eval(expr[1], i)).startswith(
            str(py_eval(expr[2], i)))
    if op == "isempty":
        return str(py_eval(expr[1], i)) == ""
    if op == "in":
        return str(py_eval(expr[1], i)) in expr[2]
    if op == "and":
        return bool(py_eval(expr[1], i)) and bool(py_eval(expr[2], i))
    if op == "or":
        return bool(py_eval(expr[1], i)) or bool(py_eval(expr[2], i))
    if op == "not":
        return not bool(py_eval(expr[1], i))
    raise AssertionError(op)


@settings(max_examples=200, deadline=None)
@given(bool_expr(2))
def test_expr_compiler_matches_row_oracle(expr):
    res = eval_mask(expr, BATCH, PropertyRegistry(BATCH))
    if isinstance(res, pa.Scalar):          # constant-folded expression
        got = [bool(res.as_py())] * 6
    else:
        got = [bool(v) for v in res.to_pylist()]
    want = [bool(py_eval(expr, i)) for i in range(6)]
    assert got == want, expr
