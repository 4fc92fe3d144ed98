"""Ratelimit windows vs a straight-line Python oracle
(runtime/ratelimit.c:145-205 token bucket; fixed-window scalable variant)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from rsyslog_ray.stages.ratelimit import fixed_window_limit, token_bucket


def _mk(convs):
    """convs: {conv_id: [ts_seconds...]} (one row per turn, ordered)."""
    conv_id, turn_idx, ts = [], [], []
    for c, tss in convs.items():
        for i, t in enumerate(tss):
            conv_id.append(c)
            turn_idx.append(i)
            ts.append(np.datetime64(1_700_000_000 + t, "s"))
    return pa.table({
        "conv_id": pa.array(conv_id, pa.string()),
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "ts": pa.array(np.array(ts, dtype="datetime64[us]")),
    })


def _oracle_token_bucket(tss, interval, burst):
    keep, win, used = [], -1, 0
    for i, t in enumerate(tss):
        if win < 0 or t >= win + interval:
            win, used = t, 0
        if used < burst:
            keep.append(i)
            used += 1
    return keep


def test_token_bucket_matches_oracle(ray_session):
    convs = {
        "a": list(range(10)),                   # 10 msgs in 10s
        "b": [0, 1, 2, 70, 71, 72, 200],        # window restarts
        "c": [0, 30, 59, 60, 61, 200, 201],     # boundary at exactly interval
    }
    ds = rd.from_arrow(_mk(convs))
    got = {(r["conv_id"], r["turn_idx"])
           for r in token_bucket(ds, interval_s=60, burst=3).take_all()}
    exp = {(c, i) for c, tss in convs.items()
           for i in _oracle_token_bucket(tss, 60, 3)}
    assert got == exp


def test_fixed_window_limit_grid_aligned(ray_session):
    # windows aligned to the conv's FIRST ts: [0,60) [60,120) ...
    convs = {"a": [0, 1, 2, 3, 59, 60, 61, 62, 63, 119, 120]}
    ds = rd.from_arrow(_mk(convs))
    got = sorted(r["turn_idx"]
                 for r in fixed_window_limit(ds, interval_s=60, burst=3).take_all())
    # win0: ts 0,1,2 kept (3,59 over burst); win1: 60,61,62; win2: 120
    assert got == [0, 1, 2, 5, 6, 7, 10]


def test_exec_once_per_interval_matches_python_oracle(ray_session):
    from rsyslog_ray.stages.ratelimit import exec_once_per_interval
    # irregular spacing: the sequential last-emission recurrence differs
    # from any fixed-window formula here
    ts = np.array(["2024-01-01T00:00:00", "2024-01-01T00:00:10",
                   "2024-01-01T00:01:00", "2024-01-01T00:01:30",
                   "2024-01-01T00:02:30", "2024-01-01T00:02:31"],
                  dtype="datetime64[us]")
    t = pa.table({"conv_id": pa.array(["c"] * 6),
                  "turn_idx": pa.array(range(6), pa.int32()),
                  "ts": pa.array(ts)})
    got = sorted(r["turn_idx"] for r in
                 exec_once_per_interval(rd.from_arrow(t), 60).take_all())
    # keep t0 (00:00), next >= 00:01 → idx2 (00:01:00), next >= 00:02 →
    # idx4 (00:02:30), idx5 only 1s later → dropped
    assert got == [0, 2, 4]
