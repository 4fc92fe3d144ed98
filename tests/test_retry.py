"""Action retry / suspend semantics (action.c:770-900 state machine,
omelasticsearch writeDataError error-rows, execOnlyWhenPreviousIsSuspended)."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rsyslog_ray.stages.route import Action, RouteWriter, Ruleset


def _batch():
    n = 10
    return pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(n)]),
        "turn_idx": pa.array(range(n), pa.int32()),
        "severity": pa.array([i % 8 for i in range(n)], pa.int32()),
        "msg": pa.array([f"m{i}" for i in range(n)]),
    })


RS = Ruleset("r", [
    Action("all", filter=None),
    Action("fallback", filter=None, only_if_previous_suspended=True),
])


class FlakyInjector:
    """Fail the first `fail_n` attempts of `action` (transient error)."""

    def __init__(self, action: str, fail_n: int):
        self.action = action
        self.fail_n = fail_n

    def __call__(self, action: str, attempt: int):
        if action == self.action and attempt < self.fail_n:
            raise OSError("injected transient failure")


def test_transient_failure_retries_and_succeeds(tmp_path):
    out = str(tmp_path / "out")
    rw = RouteWriter(RS, out, fail_injector=FlakyInjector("all", 2),
                     retry_backoff_s=0.001)
    m = rw(_batch())
    d = dict(zip(m["action"].to_pylist(), m["rows"].to_pylist()))
    assert d["all"] == 10
    assert d["fallback"] == 0                     # previous NOT suspended
    assert "_datafail:all" not in d
    assert not os.path.exists(os.path.join(out, "_error_rows"))
    files = glob.glob(os.path.join(out, "all", "*.parquet"))
    assert sum(pq.read_table(f).num_rows for f in files) == 10


def test_permanent_failure_writes_error_rows_and_triggers_fallback(tmp_path):
    out = str(tmp_path / "out")
    rw = RouteWriter(RS, out, fail_injector=FlakyInjector("all", 99),
                     max_retries=2, retry_backoff_s=0.001)
    m = rw(_batch())
    d = dict(zip(m["action"].to_pylist(), m["rows"].to_pylist()))
    assert d["all"] == 0                          # suspended, nothing written
    assert d["_datafail:all"] == 10
    assert d["fallback"] == 10                    # ran because prev suspended
    err = glob.glob(os.path.join(out, "_error_rows", "all", "*.parquet"))
    assert sum(pq.read_table(f).num_rows for f in err) == 10  # rows not lost
    fb = glob.glob(os.path.join(out, "fallback", "*.parquet"))
    assert sum(pq.read_table(f).num_rows for f in fb) == 10


def test_previous_action_suspended_expression(tmp_path):
    """previous_action_suspended() (grammar/rainerscript.c:3762) as a
    filter expression: the writer's cross-batch suspend map feeds the
    NEXT batch's evaluation — batch 1 sees False (nothing suspended yet),
    batch 2 sees True after 'all' suspended on batch 1."""
    out = str(tmp_path / "out")
    rs = Ruleset("r", [
        Action("all", filter=None),
        Action("mirror", filter=("previous_action_suspended",)),
    ])
    rw = RouteWriter(rs, out, fail_injector=FlakyInjector("all", 99),
                     max_retries=1, retry_backoff_s=0.001)
    m1 = rw(_batch())
    d1 = dict(zip(m1["action"].to_pylist(), m1["rows"].to_pylist()))
    assert d1["mirror"] == 0          # evaluated before any suspend known
    m2 = rw(_batch())
    d2 = dict(zip(m2["action"].to_pylist(), m2["rows"].to_pylist()))
    assert d2["mirror"] == 10         # sees 'all' suspended from batch 1
