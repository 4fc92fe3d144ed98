"""Aggregation stages — dynstats / impstats / mmcount analogues, plus the
north-star rollups, all with partial (combiner) pre-aggregation so the
all-to-all shuffle only moves one row per (key, batch), not per input row.

Reference: dyn_inc/dynstats runtime/dynstats.c:35-46, impstats counters
runtime/statsobj.c + runtime/queue.c:2581-2599, mmcount
contrib/mmcount/mmcount.c:49.

Skew note (SURVEY §7 'Hard parts'): algebraic aggregates (count/sum/min/max)
are made skew-proof by the per-batch partial pass — a hot conv_id
contributes at most one partial row per batch, so the shuffle sees bounded
fan-in and no salting is required. Holistic per-group computation
(map_groups) is where hot keys hurt; `salted_group_apply` below splits a
group across S salt buckets and merges — use it when the per-group function
is decomposable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Max, Min, Sum

from ..functions import hash64mod


def _partial_counts(batch: pa.Table, keys: list[str]) -> pa.Table:
    return batch.group_by(keys).aggregate([([], "count_all")]).rename_columns(
        keys + ["rows"])


def count_by(ds, keys: list[str], batch_size: int = 65536):
    """groupby(keys).count() with per-batch partials (dyn_inc analogue)."""
    partials = ds.map_batches(lambda t: _partial_counts(t, keys),
                              batch_format="pyarrow", batch_size=batch_size)
    return partials.groupby(keys).aggregate(Sum("rows", alias_name="rows"))


def facility_severity_counts(ds):
    """Per-facility/per-severity message counts (north-star aggregate)."""
    return count_by(ds, ["facility", "severity"])


def _partial_conv_rollup(batch: pa.Table) -> pa.Table:
    t = batch.group_by(["conv_id"]).aggregate([
        ([], "count_all"),
        ("parse_success", "sum"),
        ("ts", "min"),
        ("ts", "max"),
    ])
    return t.rename_columns(["conv_id", "n_turns", "n_parsed_ok",
                             "first_ts", "last_ts"])


def conv_rollup(ds, batch_size: int = 65536):
    """Per-conv_id session rollup: n_turns, n_parsed_ok, first/last ts.

    Two-stage: per-batch partials (one row per conv per batch — hot convs
    collapse inside each batch) → hash-shuffle groupby over partials."""
    partials = ds.map_batches(_partial_conv_rollup, batch_format="pyarrow",
                              batch_size=batch_size)
    return partials.groupby("conv_id").aggregate(
        Sum("n_turns", alias_name="n_turns"),
        Sum("n_parsed_ok", alias_name="n_parsed_ok"),
        Min("first_ts", alias_name="first_ts"),
        Max("last_ts", alias_name="last_ts"),
    )


def dyn_inc(ds, bucket: str, key_col: str, max_cardinality: int = 2000):
    """dynstats bucket counter (grammar/rainerscript.c:2531, dynstats.c).

    Batch semantics: full counts per key; if cardinality exceeds
    max_cardinality we keep the top-N by count and emit an overflow row
    (the reference drops NEW keys past the cap and counts ops_overflow —
    arrival order is meaningless in a parallel batch engine, documented
    deviation)."""
    counts = count_by(ds, [key_col])
    counts = counts.rename_columns(["key", "rows"])
    n = counts.count()
    if n > max_cardinality:
        top = counts.sort("rows", descending=True).limit(max_cardinality)
        kept = top.sum("rows")
        total = counts.sum("rows")
        import ray.data as rd
        overflow = rd.from_items(
            [{"key": "_overflow", "rows": total - kept}])
        counts = top.union(overflow)
    return counts.map_batches(
        lambda t: t.append_column("bucket", pa.array([bucket] * t.num_rows)),
        batch_format="pyarrow")


def salted_group_apply(ds, key: str, fn, salt_buckets: int = 16,
                       batch_format: str = "pandas"):
    """Two-stage map_groups for decomposable per-group functions under skew:
    group on (key, salt=hash64mod(row_key, S)) first, apply fn per
    sub-group, then apply fn again per key over the sub-results.

    fn must be an algebraic combiner: fn(fn(part1) ∪ fn(part2)) == fn(whole).
    """
    def add_salt(t: pa.Table) -> pa.Table:
        # round-robin within the batch: spreads a hot key over S sub-groups
        return t.append_column(
            "_salt", pa.array((np.arange(t.num_rows) % salt_buckets).astype(np.int64)))
    salted = ds.map_batches(add_salt, batch_format="pyarrow")
    stage1 = salted.groupby([key, "_salt"]).map_groups(fn, batch_format=batch_format)
    return stage1.groupby(key).map_groups(fn, batch_format=batch_format)


def pipeline_metrics(route_counts: dict, extra: dict | None = None) -> pa.Table:
    """impstats-shaped metrics table from route counters (+ any extras)."""
    rows = dict(route_counts)
    rows.update(extra or {})
    return pa.table({
        "counter": pa.array(list(rows.keys()), pa.string()),
        "value": pa.array([int(v) for v in rows.values()], pa.int64()),
    })
