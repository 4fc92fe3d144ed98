"""Rate limiting / sampling — runtime/ratelimit.c + action exec-filters.

Ordered/consecutive semantics need per-key ordered partitions: every helper
here is `groupby(conv_id).map_groups(fn)` with an in-group sort by turn_idx
(SURVEY §2.8, §7 'Ordered/consecutive semantics'). The partitioning
assumption: one conv_id fits in one group/worker (bounded conv length —
hot convs are row-heavy but still single-machine-sized; for pathological
convs use salted_group_apply for decomposable variants).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _suppress_repeats_group(g: pd.DataFrame) -> pd.DataFrame:
    """'last message repeated n times' (runtime/ratelimit.c:46-90): collapse
    runs of consecutive identical `text` within a conv into the first
    occurrence + n_repeats (run length)."""
    g = g.sort_values("turn_idx", kind="mergesort")
    txt = g["text"].to_numpy(dtype=object)
    new_run = np.ones(len(g), dtype=bool)
    if len(g) > 1:
        new_run[1:] = txt[1:] != txt[:-1]
    run_id = np.cumsum(new_run)
    g = g.assign(_run=run_id)
    firsts = g[new_run].copy()
    sizes = g.groupby("_run", sort=False).size()
    firsts["n_repeats"] = sizes.to_numpy(dtype=np.int64)
    return firsts.drop(columns=["_run"])


def suppress_repeats(ds):
    """ds must carry conv_id, turn_idx, text. Returns first-of-run rows with
    an n_repeats column (per-conv shuffle on conv_id)."""
    return ds.groupby("conv_id").map_groups(
        _suppress_repeats_group, batch_format="pandas")


def _every_nth_group(g: pd.DataFrame, n: int) -> pd.DataFrame:
    """execOnlyEveryNthTime (action.c:406): deterministic batch reading —
    the 1st, (n+1)th, (2n+1)th … turn of each conv (ordered by turn_idx)."""
    g = g.sort_values("turn_idx", kind="mergesort")
    return g.iloc[::n]


def exec_every_nth(ds, n: int):
    return ds.groupby("conv_id").map_groups(
        lambda g: _every_nth_group(g, n), batch_format="pandas")


def _token_bucket_group(g: pd.DataFrame, interval_s: int, burst: int) -> pd.DataFrame:
    """Exact rsyslog token bucket (runtime/ratelimit.c:145-205): the window
    begins at the first message; messages beyond `burst` within
    `interval_s` of window start are dropped; a message after expiry starts
    a new window. Sequential by nature — python loop per conv (small groups;
    for the scalable approximation use fixed_window_limit)."""
    g = g.sort_values("turn_idx", kind="mergesort")
    ts = g["ts"].astype("int64").to_numpy() // 1_000_000
    keep = np.zeros(len(g), dtype=bool)
    win_start = -1
    used = 0
    for i in range(len(g)):
        if win_start < 0 or ts[i] >= win_start + interval_s:
            win_start = ts[i]
            used = 0
        if used < burst:
            keep[i] = True
            used += 1
    return g[keep]


def token_bucket(ds, interval_s: int = 60, burst: int = 20):
    return ds.groupby("conv_id").map_groups(
        lambda g: _token_bucket_group(g, interval_s, burst),
        batch_format="pandas")


def _fixed_window_group(g: pd.DataFrame, interval_s: int, burst: int) -> pd.DataFrame:
    """Scalable fixed-window variant: windows aligned to the conv's first ts
    on a fixed grid; vectorized (documented deviation from the reference's
    restart-at-next-message windows)."""
    g = g.sort_values("turn_idx", kind="mergesort")
    ts = g["ts"].astype("int64").to_numpy() // 1_000_000
    win = (ts - ts[0]) // interval_s if len(g) else ts
    rank = pd.Series(win).groupby(win).cumcount().to_numpy()
    return g[rank < burst]


def fixed_window_limit(ds, interval_s: int = 60, burst: int = 20):
    return ds.groupby("conv_id").map_groups(
        lambda g: _fixed_window_group(g, interval_s, burst),
        batch_format="pandas")
