"""immark analogue — periodic "-- MARK --" heartbeat injection.

The reference input module (plugins/immark/immark.c:263-286) sleeps
MarkInterval seconds (default 20 min, immark.c:55) and injects a message
with tag "rsyslogd:" and PRI = LOG_SYSLOG|LOG_INFO = 46
(immark.c:235-252, :285). A batch engine has no wall clock to sleep on;
the deterministic EVENT-TIME analogue generates one mark per
period-aligned epoch boundary inside the stream's [min ts, max ts] —
mark times are multiples of period_s strictly greater than min(ts) and
≤ max(ts), so the result is a pure function of the data (partitioning-
and batching-invariant, exactly SQL generate_series).

Scale shape: the ts bounds fold is a per-batch (min, max) partial —
O(#batches) tiny rows to the driver; the mark table itself is
span/period rows (a year of 20-minute marks is ~26k rows) and is
generated driver-side, then unioned into the stream as ordinary rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MARK_TEXT = "-- MARK --"
MARK_TAG = "rsyslogd:"
MARK_PRI = 46                       # LOG_SYSLOG|LOG_INFO (immark.c:285)
DEFAULT_PERIOD_S = 20 * 60          # immark.c:55 DEFAULT_MARK_PERIOD


def _ts_bounds_us(ds, ts_col: str) -> tuple[int, int] | None:
    """Distributed [min, max] of ts_col in microseconds (None if empty)."""
    def partial(t: pa.Table) -> pa.Table:
        ts = pc.cast(t[ts_col], pa.timestamp("us"))
        return pa.table({"lo": pa.array([pc.min(ts).value], pa.int64()),
                         "hi": pa.array([pc.max(ts).value], pa.int64())})

    lo = hi = None
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        blo = pc.min(b["lo"]).as_py()
        bhi = pc.max(b["hi"]).as_py()
        if blo is not None:
            lo = blo if lo is None else min(lo, blo)
        if bhi is not None:
            hi = bhi if hi is None else max(hi, bhi)
    if lo is None or hi is None:
        return None
    return lo, hi


def mark_times_us(lo_us: int, hi_us: int,
                  period_s: int = DEFAULT_PERIOD_S) -> np.ndarray:
    """Mark timestamps (µs): multiples of period_s in (lo, hi]."""
    p = int(period_s) * 1_000_000
    first = (lo_us // p + 1) * p
    if first > hi_us:
        return np.empty(0, np.int64)
    return np.arange(first, hi_us + 1, p, dtype=np.int64)


def immark_table(ds, ts_col: str = "ts",
                 period_s: int = DEFAULT_PERIOD_S) -> pa.Table:
    """The mark rows for a stream: (ts, pri, tag, text)."""
    bounds = _ts_bounds_us(ds, ts_col)
    times = (np.empty(0, np.int64) if bounds is None
             else mark_times_us(*bounds, period_s=period_s))
    n = len(times)
    return pa.table({
        "ts": pa.array(times, pa.timestamp("us")),
        "pri": pa.array(np.full(n, MARK_PRI, np.int64)),
        "tag": pa.array([MARK_TAG] * n, pa.string()),
        "text": pa.array([MARK_TEXT] * n, pa.string()),
    })


def with_marks(ds, ts_col: str = "ts",
               period_s: int = DEFAULT_PERIOD_S,
               host: str = "localhost"):
    """Union heartbeat rows into a transcripts-shaped stream: each mark
    becomes a raw syslog line `<46>... rsyslogd: -- MARK --` under
    conv_id '_immark' so the normal parse→route path sees it exactly as
    rsyslog's main queue does."""
    import ray.data as rd
    marks = immark_table(ds, ts_col=ts_col, period_s=period_s)
    n = marks.num_rows
    sch = ds.schema().base_schema          # underlying pyarrow schema

    def fmt(us: int) -> str:
        # RFC3164 header timestamp (Mmm dd hh:mm:ss, space-padded day —
        # same convention as the transcripts fixture)
        import datetime
        dt = datetime.datetime(1970, 1, 1) + \
            datetime.timedelta(microseconds=int(us))
        return (f"{dt.strftime('%b')} {dt.day:2d} "
                f"{dt.strftime('%H:%M:%S')}")

    lines = [f"<{MARK_PRI}>{fmt(t.value)} {host} {MARK_TAG} {MARK_TEXT}"
             for t in marks["ts"]]
    cols = {}
    for name in sch.names:
        if name == ts_col:
            cols[name] = marks["ts"]
        elif name == "text":
            cols[name] = pa.array(
                lines, pa.large_string()
                if pa.types.is_large_string(sch.field("text").type)
                else pa.string())
        elif name == "conv_id":
            cols[name] = pa.array(["_immark"] * n, pa.string())
        elif name == "turn_idx":
            cols[name] = pa.array(np.arange(n, dtype=np.int32),
                                  sch.field("turn_idx").type)
        else:
            cols[name] = pa.nulls(n, sch.field(name).type)
    return ds.union(rd.from_arrow(
        pa.table(cols, schema=pa.schema(
            [(nm, sch.field(nm).type) for nm in sch.names]))))
