"""Driver-gate query implementations (one per operator family).

Each function takes sf_dir (e.g. '/root/testdata/sf0.01') and returns a
pyarrow Table whose column names & types match the corresponding DuckDB SQL
in pipelines/oracle_sql.py exactly (the driver hashes values with columns
sorted by name, so names/types must line up).

Transcripts-based queries read the deterministic synthetic transcripts
parquet generated (cached) under /tmp by datagen.ensure_transcripts — the
oracle SQL reads the same files via read_parquet().
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..datagen import ensure_transcripts
from ..sources import read_scaled, read_transcripts
from ..lookup import ROLE_FACILITY, SEV_BUCKET, TOOL_CLASS
from ..stages.aggregate import conv_rollup, count_by, facility_severity_counts
from ..stages.enrich import LookupEnrich, mmjsonparse_table
from ..stages.parse import parse_dataset
from ..stages.ratelimit import exec_every_nth, suppress_repeats
from ..stages.route import apply_stops, route_table
from .flagship import CANONICAL_RULESET, build_parsed_dataset


def _to_table(ds) -> pa.Table:
    if isinstance(ds, pa.Table):
        return _finalize(ds)
    # materialize BEFORE to_arrow_refs: on a lazy plan, to_arrow_refs
    # triggers a schema probe (limit-1) that re-executes the whole plan
    # when it contains an all-to-all op — measured 2.2x on ccnet_buckets
    ds = ds.materialize()
    refs = ds.to_arrow_refs()
    tables = [t for t in ray.get(refs) if t.num_rows >= 0]
    tbl = pa.concat_tables(tables, promote_options="default") if tables else pa.table({})
    return _finalize(tbl)


def _finalize(t: pa.Table) -> pa.Table:
    """Normalize types to what DuckDB returns (BIGINT / VARCHAR / DOUBLE /
    TIMESTAMP[us]) so the driver's schema compare passes."""
    cols, names = [], []
    for fieldx in t.schema:
        c = t[fieldx.name]
        typ = fieldx.type
        if pa.types.is_integer(typ):
            c = pc.cast(c, pa.int64())
        elif pa.types.is_large_string(typ):
            c = pc.cast(c, pa.string())
        elif pa.types.is_floating(typ):
            c = pc.cast(c, pa.float64())
        elif pa.types.is_timestamp(typ):
            c = pc.cast(c, pa.timestamp("us"))
        names.append(fieldx.name)
        cols.append(c)
    return pa.table(dict(zip(names, cols)))


def _parsed(sf_dir: str):
    tdir = ensure_transcripts(sf_dir)
    return parse_dataset(read_transcripts(tdir))


PARSE_COLS = ["conv_id", "turn_idx", "pri", "facility", "severity",
              "protocol", "parse_success", "hostname", "tag", "appname",
              "procid", "msgid", "structured_data", "msg"]


def q_parse_fields(sf_dir: str) -> pa.Table:
    """Full parse cascade projection (§2.2)."""
    ds = _parsed(sf_dir).select_columns(PARSE_COLS)
    return _to_table(ds)


def q_parse_timestamps(sf_dir: str) -> pa.Table:
    """ts_reported extraction incl. RFC3339/RFC3164 paths (§2.2/§2.4)."""
    ds = _parsed(sf_dir).select_columns(["conv_id", "turn_idx", "protocol",
                                         "ts_reported"])
    return _to_table(ds)


def _routed(sf_dir: str, sink: str) -> pa.Table:
    ds = build_parsed_dataset(ensure_transcripts(sf_dir), concurrency=2)

    def fn(batch: pa.Table) -> pa.Table:
        routed = route_table(batch, CANONICAL_RULESET)
        sub = routed[sink]
        return sub.select(["conv_id", "turn_idx", "rendered"])
    return _to_table(ds.map_batches(fn, batch_format="pyarrow"))


def q_route_errors(sf_dir: str) -> pa.Table:
    """Sink A: severity<=3 → ForwardFormat rendering (§2.3/§2.5/§2.7)."""
    return _routed(sf_dir, "errors")


def q_route_files(sf_dir: str) -> pa.Table:
    """Sink B: msg contains msgnum: AND local0..7 → FileFormat (dynafile)."""
    return _routed(sf_dir, "files")


def q_route_cee(sf_dir: str) -> pa.Table:
    """Sink C: @cee rows → JSON template (mmjsonparse, §2.6)."""
    return _routed(sf_dir, "cee")


def q_agg_fac_sev(sf_dir: str) -> pa.Table:
    """Per-(facility, severity) counts after the stop statement (§2.8)."""
    ds = apply_stops(_parsed(sf_dir), CANONICAL_RULESET)
    return _to_table(facility_severity_counts(ds))


def q_conv_rollup(sf_dir: str) -> pa.Table:
    """Per-conv_id session rollup (§2.8 north-star)."""
    return _to_table(conv_rollup(_parsed(sf_dir)))


def q_lookup_enrich(sf_dir: str) -> pa.Table:
    """lookup() enrichment keyed on role and tool (§2.9) — counts per
    (role, role_fac, tool, tool_class) so every table path is exercised."""
    tdir = ensure_transcripts(sf_dir)
    ds = read_transcripts(tdir, columns=["role", "tool"])
    ds = ds.map_batches(LookupEnrich([("role_fac", "role", ROLE_FACILITY),
                                      ("tool_class", "tool", TOOL_CLASS)]),
                        batch_format="pyarrow")
    return _to_table(count_by(ds, ["role", "role_fac", "tool", "tool_class"]))


def q_sev_bucket(sf_dir: str) -> pa.Table:
    """sparseArray lookup table (first-le-key) over severity (§2.9)."""
    ds = apply_stops(_parsed(sf_dir), CANONICAL_RULESET)  # arbitrary slice

    def fn(batch: pa.Table) -> pa.Table:
        return batch.select(["severity"]).append_column(
            "bucket", SEV_BUCKET.lookup_array(batch["severity"]))
    ds = ds.map_batches(fn, batch_format="pyarrow")
    return _to_table(count_by(ds, ["severity", "bucket"]))


def q_suppress_repeats(sf_dir: str) -> pa.Table:
    """'last message repeated n times' collapse (§2.8 ratelimit)."""
    tdir = ensure_transcripts(sf_dir)
    ds = read_transcripts(tdir, columns=["conv_id", "turn_idx", "text"])
    out = suppress_repeats(ds)
    return _to_table(out.select_columns(["conv_id", "turn_idx", "n_repeats"]))


def q_every_nth(sf_dir: str) -> pa.Table:
    """execOnlyEveryNthTime sampling, n=3 (§2.8)."""
    tdir = ensure_transcripts(sf_dir)
    ds = read_transcripts(tdir, columns=["conv_id", "turn_idx"])
    return _to_table(exec_every_nth(ds, 3))


def q_strfun(sf_dir: str) -> pa.Table:
    """Scalar string functions over documents (§2.4)."""
    from .. import functions as F
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        txt = pc.cast(batch["text"], pa.string())
        return pa.table({
            "doc_id": batch["doc_id"],
            "len": F.strlen(txt),
            "lower8": F.tolower(F.substring(txt, 0, 8)),
            "field2": F.field(txt, " ", 2),
            "replaced": F.replace(F.substring(txt, 0, 12), "e", "_"),
        })
    return _to_table(ds.map_batches(fn, batch_format="pyarrow"))


SET_VARS_SCRIPT = """
template(name="t" type="string" string="%$.role_u%|%$!len%|%$.cls%")
set $.role_u = toupper($role);
set $!len = strlen($rawmsg);
if $tool != "" then set $.cls = "tool_" & $tool;
if $role == "system" then unset $!len;
action(type="omfile" name="out" template="t")
"""


def q_set_vars(sf_dir: str) -> pa.Table:
    """RainerScript `set`/`unset` statements (§2.3, grammar cnfstmtNewSet/
    NewUnset): local ($.x) and JSON-tree ($!x) variables written by gated
    set statements, read back by a later template — the whole path goes
    through the LANGUAGE front-end (rainerscript.py), not the object
    model."""
    from ..rainerscript import load_rainerscript

    rs = load_rainerscript(SET_VARS_SCRIPT).ruleset
    tdir = ensure_transcripts(sf_dir)
    ds = read_transcripts(tdir, columns=["conv_id", "turn_idx", "role",
                                         "tool", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        routed = route_table(batch, rs)
        return routed["out"].select(["conv_id", "turn_idx", "rendered"])
    return _to_table(ds.map_batches(fn, batch_format="pyarrow"))


def q_dedup_exact(sf_dir: str) -> pa.Table:
    """Exact dedup over documents: keep min doc_id per identical text
    (hash-partitioned groupby; §dedup extras)."""
    from ..stages.dedup import exact_dedup
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return _to_table(exact_dedup(ds, text_col="text", id_col="doc_id")
                     .select_columns(["doc_id"]))


def q_token_stats(sf_dir: str) -> pa.Table:
    """Text-quality token statistics over documents."""
    from ..stages.textstats import token_stats_table
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return _to_table(ds.map_batches(token_stats_table, batch_format="pyarrow"))


def q_events_window(sf_dir: str) -> pa.Table:
    """Tumbling 1h window count/sum per event_type over events (§2.8
    time-bucket properties $now* → floor_temporal)."""
    ds = read_scaled(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def fn(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(pc.cast(batch["ts"], pa.timestamp("us")),
                                 unit="hour")
        # exact integer-cent sums: order-independent across distributed
        # partials (see hopping_window_counts)
        cents = pc.cast(pc.round(pc.multiply(
            pc.cast(batch["value"], pa.float64()), 100.0)), pa.int64())
        t = pa.table({"event_type": batch["event_type"], "hour": hour,
                      "value": cents})
        return t.group_by(["event_type", "hour"]).aggregate(
            [([], "count_all"), ("value", "sum")]).rename_columns(
            ["event_type", "hour", "rows", "value_sum"])
    partials = ds.map_batches(fn, batch_format="pyarrow")
    from ..stages.aggregate import bucket_merge
    out = bucket_merge(partials, ["event_type", "hour"],
                       {"rows": ("rows", "sum"),
                        "value_sum": ("value_sum", "sum")})

    def uncent(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("value_sum"), "value_sum",
            pc.divide(pc.cast(batch["value_sum"], pa.float64()), 100.0))
    return _to_table(out.map_batches(uncent, batch_format="pyarrow"))


def q_hopping_window(sf_dir: str) -> pa.Table:
    """Hopping-window aggregate over events (1h windows every 15min):
    overlapping-window counts + value sums per event_type."""
    from ..stages.aggregate import hopping_window_counts
    ds = read_scaled(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])
    return _to_table(hopping_window_counts(ds, size_s=3600, hop_s=900))


def q_percentiles(sf_dir: str) -> pa.Table:
    """Exact p50/p95/p99 of value per event_type — histogram-fold shape
    (no distributed sort), quantile_disc rank semantics."""
    from ..stages.aggregate import percentiles_by_key
    ds = read_scaled(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    return percentiles_by_key(ds)


def q_tdigest(sf_dir: str) -> pa.Table:
    """Approximate p50/p95/p99 via mergeable t-digest sketches — the
    unbounded-value-domain scale path (rows-only: approximate by design;
    accuracy bounds pinned by pytest against the exact readout)."""
    from ..stages.aggregate import tdigest_quantiles_by_key
    ds = read_scaled(f"{sf_dir}/events.parquet",
                     columns=["event_type", "value"])
    return tdigest_quantiles_by_key(ds)


def q_head_per_conv(sf_dir: str) -> pa.Table:
    """First 2 turns per conversation (ordered group-head sampling) —
    hash-bucketed, no global sort."""
    from ..stages.aggregate import head_per_key
    tdir = ensure_transcripts(sf_dir)
    ds = read_transcripts(tdir, columns=["conv_id", "turn_idx", "role"])
    return _to_table(head_per_key(ds, key="conv_id", order_col="turn_idx",
                                  n=2))


def q_range_join(sf_dir: str) -> pa.Table:
    """Interval join: every event inside the 1-hour window after any
    signup by the same user — key-bucketed per-key merge + interval
    mask, DuckDB inequality-join oracle."""
    from ..stages.joins import range_join
    base = read_scaled(f"{sf_dir}/events.parquet",
                           columns=["event_id", "user_id", "ts",
                                    "event_type"])
    left = base.select_columns(["event_id", "user_id", "ts"])

    def windows(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.timestamp("us"))
        hour = pa.scalar(3_600_000_000, pa.duration("us"))
        return pa.table({"user_id": t["user_id"], "start_ts": ts,
                         "end_ts": pc.add(ts, hour)})
    right = (base.filter(expr="event_type == 'signup'")
             .map_batches(windows, batch_format="pyarrow"))
    out = range_join(left, right, key="user_id", ts_col="ts")
    return _to_table(out)


def q_topk_tools(sf_dir: str) -> pa.Table:
    """Top-3 tools per role by turn count — exact heavy hitters
    (count_by partials → driver fold → ranked head), deterministic ties
    (count desc, tool asc)."""
    from ..stages.aggregate import topk_by_key
    tdir = ensure_transcripts(sf_dir)
    ds = read_transcripts(tdir, columns=["role", "tool"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t["tool"])), batch_format="pyarrow")
    return topk_by_key(ds, ["role"], "tool", k=3)


def q_asof_join(sf_dir: str) -> pa.Table:
    """As-of join: each event paired with the user's most recent signup
    event (signup_ts <= ts) — key-bucketed merge_asof, DuckDB ASOF JOIN
    oracle."""
    from ..stages.joins import asof_join
    # one read (one parquet metadata pass), both sides derived from it
    base = read_scaled(f"{sf_dir}/events.parquet",
                           columns=["event_id", "user_id", "ts",
                                    "event_type"])
    left = base.select_columns(["event_id", "user_id", "ts"])
    right = (base.filter(expr="event_type == 'signup'")
             .select_columns(["user_id", "ts"]))
    out = asof_join(left, right, key="user_id", ts_col="ts")
    return _to_table(out.select_columns(["event_id", "user_id", "ts", "ts_r"])
                     )


def q_asof_tolerance(sf_dir: str) -> pa.Table:
    """As-of join with a staleness bound: matches older than 7 days count
    as unmatched (merge_asof tolerance semantics) — the freshness guard
    on versioned-dimension enrichment; correlated-subquery oracle."""
    from ..stages.joins import asof_join
    base = read_scaled(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id", "ts", "event_type"])
    left = base.select_columns(["event_id", "user_id", "ts"])
    right = (base.filter(expr="event_type == 'signup'")
             .select_columns(["user_id", "ts"]))
    out = asof_join(left, right, key="user_id", ts_col="ts",
                    tolerance_s=7 * 86400)
    return _to_table(out.select_columns(["event_id", "user_id", "ts",
                                         "ts_r"]))


def q_events_props(sf_dir: str) -> pa.Table:
    """JSON property extraction over the events side-table: parse
    props ($!k analogue) → exact int sum + count per event_type
    (partials → bucket merge)."""
    from .. import functions as F
    from ..stages.aggregate import bucket_merge
    ds = read_scaled(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])

    def fn(batch: pa.Table) -> pa.Table:
        k = pc.cast(F.json_get(pc.cast(batch["props"], pa.string()), "k"),
                    pa.int64())
        t = pa.table({"event_type": batch["event_type"], "k": k})
        return (t.group_by(["event_type"])
                .aggregate([([], "count_all"), ("k", "sum")])
                .rename_columns(["event_type", "rows", "k_sum"]))
    partials = ds.map_batches(fn, batch_format="pyarrow")
    return _to_table(bucket_merge(partials, ["event_type"],
                                  {"rows": ("rows", "sum"),
                                   "k_sum": ("k_sum", "sum")}))


def q_distinct_users(sf_dir: str) -> pa.Table:
    """Exact count-distinct users per event_type — distinct-pair combiner
    → value-bucketed global distinct → driver fold (16 B/row shuffle)."""
    from ..stages.aggregate import distinct_count_by
    ds = read_scaled(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    return distinct_count_by(ds)


def q_distinct_users_hll(sf_dir: str) -> pa.Table:
    """HyperLogLog distinct-user estimate per event_type (p=12, σ≈1.6%) —
    one pass, no value shuffle; accuracy pinned by a unit test vs the
    exact count; rows-only driver check (approximate by design)."""
    from ..stages.aggregate import hll_distinct_by
    ds = read_scaled(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    return hll_distinct_by(ds)


def q_sessionize(sf_dir: str) -> pa.Table:
    """Gap-based sessionization over events (10-min inactivity gap per
    user) — per-session rollup rows."""
    from ..stages.aggregate import sessionize
    ds = read_scaled(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return _to_table(sessionize(ds, key="user_id", ts_col="ts", gap_s=600))


def q_topk_cosine(sf_dir: str) -> pa.Table:
    """Brute-force cosine top-k over embeddings vs a fixed query vector
    (similarity-search baseline)."""
    from ..stages.similarity import topk_cosine
    ds = read_scaled(f"{sf_dir}/embeddings.parquet")
    return _to_table(topk_cosine(ds, k=20))


# --------------------------------------------------------------------------
# round-2 coverage: mm* modifiers, dynstats, ratelimit windows, templates,
# text analysis, dedup variants, similarity variants, multimodal stubs
# --------------------------------------------------------------------------


def q_mmfields(sf_dir: str) -> pa.Table:
    """mmfields: split on single-char separator → f1..f5 (§2.6)."""
    from ..stages.enrich import mmfields_table
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        b = mmfields_table(batch, col="text", sep=" ", max_fields=5)
        return b.select(["doc_id", "f1", "f2", "f3", "f4", "f5"])
    return _to_table(ds.map_batches(fn, batch_format="pyarrow"))


def q_mmanon(sf_dir: str) -> pa.Table:
    """mmanon: IPv4 anonymization, zero mode 16 bits (§2.6). The IP-bearing
    string is synthesized deterministically from doc_id (fixtures carry no
    IPs) — both engine and oracle build the identical input."""
    from ..stages.enrich import mmanon_table
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        txt = pc.utf8_slice_codeunits(pc.cast(batch["text"], pa.string()), 0, 16)
        ips = ["src=%d.%d.%d.%d dst=10.0.%d.7 " %
               (1 + i % 223, i % 191, i % 157, i % 119, i % 250) for i in ids]
        val = pc.binary_join_element_wise(pa.array(ips, pa.string()), txt, "")
        t = pa.table({"doc_id": batch["doc_id"], "line": val})
        return mmanon_table(t, col="line", mode="zero", bits=16)
    return _to_table(ds.map_batches(fn, batch_format="pyarrow"))


def q_mmanon_modes(sf_dir: str) -> pa.Table:
    """mmanon non-octet zero mode (bits=12 → arithmetic mask + canonical
    re-render) and simple mode (digit overwrite preserving layout), §2.6
    mmanon.c:624-641/739-755. Same synthesized IP line as q_mmanon."""
    from ..stages.enrich import mmanon_table
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        txt = pc.utf8_slice_codeunits(pc.cast(batch["text"], pa.string()), 0, 16)
        ips = ["src=%d.%d.%d.%d dst=10.0.%d.7 " %
               (1 + i % 223, i % 191, i % 157, i % 119, i % 250) for i in ids]
        val = pc.binary_join_element_wise(pa.array(ips, pa.string()), txt, "")
        t = pa.table({"doc_id": batch["doc_id"], "line": val})
        z = mmanon_table(t, col="line", mode="zero", bits=12)["line"]
        s = mmanon_table(t, col="line", mode="simple", bits=16)["line"]
        return pa.table({"doc_id": batch["doc_id"],
                         "zero12": z, "simple16": s})
    return _to_table(ds.map_batches(fn, batch_format="pyarrow"))


def q_exec_interval(sf_dir: str) -> pa.Table:
    """execOnlyOnceEveryInterval (action.c:408): at most one emission per
    45 s per conv, interval measured from the last emission."""
    from ..stages.ratelimit import exec_once_per_interval
    tdir = ensure_transcripts(sf_dir)
    ds = read_transcripts(tdir, columns=["conv_id", "turn_idx", "ts"])
    out = exec_once_per_interval(ds, interval_s=45)
    return _to_table(out.select_columns(["conv_id", "turn_idx"]))


def q_sd_params(sf_dir: str) -> pa.Table:
    """mmpstrucdata: RFC5424 STRUCTURED-DATA → exploded (sd_id, pname,
    pvalue) rows — flat_map explode (§2.6, foreach §2.3)."""
    from ..stages.enrich import _SD_ELEM, _SD_PARAM
    ds = _parsed(sf_dir).select_columns(
        ["conv_id", "turn_idx", "protocol", "structured_data"])

    def explode(batch: pa.Table) -> pa.Table:
        """Two-level regex explode, vectorized via pandas extractall (one
        batched regex pass per level, no per-row loop)."""
        mask = pc.and_(pc.equal(batch["protocol"], 1),
                       pc.invert(pc.is_in(
                           pc.cast(batch["structured_data"], pa.string()),
                           value_set=pa.array(["-", ""]))))
        sub = batch.filter(mask)
        empty = pa.table({
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int64()),
            "sd_id": pa.array([], pa.string()),
            "pname": pa.array([], pa.string()),
            "pvalue": pa.array([], pa.string()),
        })
        if sub.num_rows == 0:
            return empty
        sd = pd.Series(sub["structured_data"].to_pandas(), dtype="string")
        elems = sd.str.extractall(_SD_ELEM).reset_index()   # level_0, 0=id, 1=blob
        if not len(elems):
            return empty
        params = (elems[1].fillna("").astype("string")
                  .str.extractall(_SD_PARAM).reset_index())  # level_0 → elem row
        if not len(params):
            return empty
        erow = params["level_0"].to_numpy()
        srow = elems["level_0"].to_numpy()[erow]
        pval = (params[1].astype("string")
                .str.replace('\\"', '"', regex=False)
                .str.replace("\\]", "]", regex=False)
                .str.replace("\\\\", "\\", regex=False))
        convs = sub["conv_id"].to_pandas().to_numpy()
        turns = sub["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "conv_id": pa.array(convs[srow], pa.string()),
            "turn_idx": pa.array(turns[srow], pa.int64()),
            "sd_id": pa.array(elems[0].to_numpy()[erow], pa.string()),
            "pname": pa.array(params[0].astype(str).to_numpy(), pa.string()),
            "pvalue": pa.array(pval.astype(str).to_numpy(), pa.string()),
        })
    return _to_table(ds.map_batches(explode, batch_format="pyarrow"))


def q_foreach_list(sf_dir: str) -> pa.Table:
    """Generic foreach over a typed array column (runtime/ruleset.c:323-417
    foreachCallArray → flat_map explode): embeddings.embedding list<float>
    → one row per element with a 1-based loop index."""
    from ..stages.foreach import explode_list
    ds = read_scaled(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def fn(batch: pa.Table) -> pa.Table:
        out = explode_list(batch, "embedding", out="val", idx_out="idx")
        return pa.table({
            "vec_id": out["vec_id"],
            "idx": out["idx"],
            "val": pc.round(pc.cast(out["val"], pa.float64()), ndigits=6),
        })
    return _to_table(ds.map_batches(fn, batch_format="pyarrow"))


def q_foreach_obj(sf_dir: str) -> pa.Table:
    """foreach over a JSON object (foreachCallObject): CEE payloads →
    (key, value) rows."""
    from ..stages.foreach import explode_json_object
    ds = build_parsed_dataset(ensure_transcripts(sf_dir))

    def fn(batch: pa.Table) -> pa.Table:
        ok = pc.fill_null(batch["cee_parsesuccess"], False)
        sub = batch.filter(ok).select(["conv_id", "turn_idx", "cee_json"])
        return explode_json_object(sub, "cee_json")
    return _to_table(ds.map_batches(fn, batch_format="pyarrow"))


def q_dynstats_tool(sf_dir: str) -> pa.Table:
    """dyn_inc('tools', $tool) counter bucket (§2.4/§2.8 dynstats)."""
    from ..stages.aggregate import dyn_inc
    tdir = ensure_transcripts(sf_dir)
    ds = read_transcripts(tdir, columns=["tool"])
    return _to_table(dyn_inc(ds, "tools", "tool"))


def q_rate_window(sf_dir: str) -> pa.Table:
    """Fixed-window ratelimit (interval=60s, burst=5) per conv (§2.8)."""
    from ..stages.ratelimit import fixed_window_limit
    tdir = ensure_transcripts(sf_dir)
    ds = read_transcripts(tdir, columns=["conv_id", "turn_idx", "ts"])
    out = fixed_window_limit(ds, interval_s=60, burst=5)
    return _to_table(out.select_columns(["conv_id", "turn_idx"]))


def q_token_bucket(sf_dir: str) -> pa.Table:
    """Exact rsyslog token-bucket ratelimit (ratelimit.c:145-205) — the
    sequential reference semantics (no SQL oracle: stateful restart-window
    logic; covered by unit tests vs the Python oracle)."""
    from ..stages.ratelimit import token_bucket
    tdir = ensure_transcripts(sf_dir)
    ds = read_transcripts(tdir, columns=["conv_id", "turn_idx", "ts"])
    out = token_bucket(ds, interval_s=60, burst=5)
    return _to_table(out.select_columns(["conv_id", "turn_idx"]))


TPL_OPTS_SPEC = ("%HOSTNAME:::uppercase%|%msg:2:12%|%msg:F,58:2%|"
                 "%TIMESTAMP:::date-unix%|"
                 "%msg:R,ERE,1,BLANK:msgnum.([0-9]+)--end%|"
                 "%msg:1:6:fixed-width%|%msg:4:1:pos-end-relative%|"
                 "%TIMESTAMP:::date-mysql%|%TIMESTAMP:::date-wdayname%|"
                 "%HOSTNAME:::secpath-replace%")


def q_template_opts(sf_dir: str) -> pa.Table:
    """Property-replacer options: substring FromPos:ToPos, field F,ch:N,
    case conversion, date-unix, regex submatch extraction w/ nomatch
    policy, fixed-width + end-relative positions, date-mysql/wdayname,
    secpath (§2.5 template.h:62-148, template.c:839-930)."""
    from ..templates import Template
    tpl = Template(TPL_OPTS_SPEC, name="opts")
    ds = _parsed(sf_dir)

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table({"conv_id": batch["conv_id"],
                         "turn_idx": batch["turn_idx"],
                         "rendered": tpl.render(batch)})
    return _to_table(ds.map_batches(fn, batch_format="pyarrow"))


def q_properties(sf_dir: str) -> pa.Table:
    """Named-property surface (§1.1 runtime/typedefs.h:193-246): facility/
    severity text names, pri-text, $now*/$hhour/$qhour/$wday system
    buckets, fromhost-ip, inputname — all rendered per row."""
    from ..expr import PropertyRegistry
    ds = _parsed(sf_dir)

    def fn(batch: pa.Table) -> pa.Table:
        p = PropertyRegistry(batch)
        return pa.table({
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"],
            "fac_text": p.get("syslogfacility-text"),
            "sev_text": p.get("syslogseverity-text"),
            "pri_text": p.get("pri-text"),
            "now_day": p.get("$now"),
            "hhour": p.get("$hhour"),
            "qhour": p.get("$qhour"),
            "wday": p.get("$wday"),
            "fromhost_ip": p.get("fromhost-ip"),
            "inputname": p.get("inputname"),
        })
    return _to_table(ds.map_batches(fn, batch_format="pyarrow"))


def q_prifilt(sf_dir: str) -> pa.Table:
    """prifilt('local0,local1,local2,local3.warning') PRI-mask predicate
    (§2.3/§2.4): facility 16..19 AND severity <= 4."""
    from ..functions import prifilt
    ds = _parsed(sf_dir)

    def fn(batch: pa.Table) -> pa.Table:
        m = prifilt(batch["facility"], batch["severity"],
                    "local0,local1,local2,local3.warning")
        return batch.select(["conv_id", "turn_idx"]).filter(m)
    return _to_table(ds.map_batches(fn, batch_format="pyarrow"))


def q_quality(sf_dir: str) -> pa.Table:
    """Text-quality heuristics (stopword/punct/digit ratios, mean word
    length) over documents — training-data extras."""
    from ..stages.textstats import quality_scores
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = quality_scores(ds)
    return _to_table(out.select_columns(
        ["doc_id", "stop_ratio", "mean_word_len", "punct_ratio",
         "digit_ratio"]))


def q_langid(sf_dir: str) -> pa.Table:
    """Stopword-profile language ID over documents (training-data extras)."""
    from ..stages.textstats import langid
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return _to_table(langid(ds).select_columns(["doc_id", "lang_pred"]))


def q_fingerprint(sf_dir: str) -> pa.Table:
    """Rolling-hash (winnowing-style) document fingerprint — deterministic;
    no SQL oracle (byte-level rolling hash), rows-only + unit tests."""
    from ..stages.textstats import fingerprint_table
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return _to_table(ds.map_batches(fingerprint_table, batch_format="pyarrow"))


def q_dedup_minhash(sf_dir: str) -> pa.Table:
    """MinHash+LSH near-dup dedup over documents: surviving doc_ids —
    deterministic seeds; no SQL oracle (minhash), rows-only + unit tests."""
    from ..stages.dedup import minhash_lsh_dedup
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return _to_table(minhash_lsh_dedup(ds).select_columns(["doc_id"]))


def q_dedup_simhash(sf_dir: str) -> pa.Table:
    """64-bit SimHash per document — deterministic; rows-only + unit tests."""
    from ..stages.dedup import simhash_table
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return _to_table(simhash_table(ds).select_columns(["doc_id", "simhash"]))


def q_simhash_dedup(sf_dir: str) -> pa.Table:
    """SimHash near-dup removal (Hamming-radius block bucketing): surviving
    doc_ids — deterministic; rows-only + Python-oracle unit test."""
    from ..stages.dedup import simhash_dedup
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return _to_table(simhash_dedup(ds, radius=3).select_columns(["doc_id"]))


def q_jaccard_pairs(sf_dir: str) -> pa.Table:
    """Exact word-trigram Jaccard near-dup pairs (a<b, j>=0.4),
    gram-partitioned — shuffles 24-byte postings, never pair candidates;
    matches the DuckDB gram self-join oracle bit-exactly."""
    from ..stages.dedup import ngram_jaccard_pairs
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return _to_table(ngram_jaccard_pairs(ds, n=3, threshold=0.4))


def q_editdist_pairs(sf_dir: str) -> pa.Table:
    """Levenshtein ≤ 1 near-dup pairs over the documents' 24-char key
    prefix — FastSS deletion-neighborhood hashing vs DuckDB's
    levenshtein() self-join oracle."""
    from ..stages.dedup import editdist_pairs
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])
    return _to_table(editdist_pairs(ds, prefix_len=24))


def q_editdist_dedup(sf_dir: str) -> pa.Table:
    """Edit-distance dedup: surviving doc_ids after dropping every doc
    whose 24-char key has a smaller-id Levenshtein<=1 partner."""
    from ..stages.dedup import editdist_dedup
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])
    return _to_table(editdist_dedup(ds).select_columns(["doc_id"]))


def q_neardup_clusters(sf_dir: str) -> pa.Table:
    """Near-dup CLUSTER ids, not just drops: exact Jaccard pairs →
    distributed connected components (Hash-to-Min min-label propagation)
    → keyed left join back to the corpus; singleton docs keep their own
    id as cluster_id. The SQL twin closes the same transitive closure
    with a recursive CTE — a graph operator with an exact oracle."""
    return _to_table(_neardup_clusters_ds(sf_dir))


def _neardup_clusters_ds(sf_dir: str):
    """(doc_id, cluster_id) Dataset shared by q_neardup_clusters and
    q_dedup_report (see q_neardup_clusters for the shape)."""
    from ..stages.dedup import connected_components, ngram_jaccard_pairs
    from ..stages.joins import equi_join

    docs = read_scaled(f"{sf_dir}/documents.parquet",
                       columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.4) \
        .select_columns(["a", "b"]).materialize()
    ids = read_scaled(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    if pairs.count() <= 2_000_000:
        # near-dup pair sets are a small corpus slice: one driver
        # union-find + broadcast map beats several component-propagation
        # join rounds (the distributed path below stays for huge graphs)
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for r in pairs.take_all():
            ra, rb = find(int(r["a"])), find(int(r["b"]))
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
        labels_map = {x: find(x) for x in list(parent)}
        import ray as _ray
        ref = _ray.put(labels_map)

        def assign(t: pa.Table) -> pa.Table:
            lm = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
            d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            cid = np.array([lm.get(int(x), int(x)) for x in d],
                           dtype=np.int64)
            return pa.table({"doc_id": pa.array(d),
                             "cluster_id": pa.array(cid)})
        return ids.map_batches(assign, batch_format="pyarrow")

    labels = connected_components(pairs).map_batches(
        lambda t: t.rename_columns(["doc_id", "cluster_id"]),
        batch_format="pyarrow")
    joined = equi_join(ids, labels, key="doc_id", how="left")

    def finish(t: pa.Table) -> pa.Table:
        cid = pc.coalesce(pc.cast(t["cluster_id"], pa.int64()),
                          pc.cast(t["doc_id"], pa.int64()))
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "cluster_id": cid})
    return joined.map_batches(finish, batch_format="pyarrow")


def q_dedup_report(sf_dir: str) -> pa.Table:
    """Dedup audit histogram: cluster-size distribution of the
    near-dup components (cluster_size → n_clusters). Two bounded
    aggregations over the cluster assignment — sizes via bucket_merge,
    the histogram via a driver fold (size domain ≤ max cluster size)."""
    from ..stages.dedup import cluster_size_report
    return cluster_size_report(_neardup_clusters_ds(sf_dir))


def q_jaccard_dedup(sf_dir: str) -> pa.Table:
    """Word-trigram Jaccard dedup: surviving doc_ids after dropping every
    doc with a smaller-id near-dup (j>=0.4) — distributed anti-join."""
    from ..stages.dedup import ngram_jaccard_dedup
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return _to_table(ngram_jaccard_dedup(ds, threshold=0.4)
                     .select_columns(["doc_id"]))


def q_cosine_dedup(sf_dir: str) -> pa.Table:
    """Embedding-cosine dedup: surviving vec_ids after dropping every
    vector with a smaller-id partner at cosine>=0.4 (exact pair path for
    the oracle; method='lsh' is the corpus-scale shape)."""
    from ..stages.similarity import cosine_dedup
    ds = read_scaled(f"{sf_dir}/embeddings.parquet")
    return _to_table(cosine_dedup(ds, threshold=0.4)
                     .select_columns(["vec_id"]))


def q_neardup_pairs(sf_dir: str) -> pa.Table:
    """Exact embedding-cosine near-duplicate pairs (a<b, score>=0.4):
    broadcast-matrix brute force, matches the DuckDB self-join oracle."""
    from ..stages.similarity import neardup_pairs_exact
    ds = read_scaled(f"{sf_dir}/embeddings.parquet")
    return _to_table(neardup_pairs_exact(ds, threshold=0.4))


def q_lsh_neardup(sf_dir: str) -> pa.Table:
    """Distributed LSH-bucketed near-dup pairs (the 100 TB path: no driver
    materialization, no O(N²) broadcast) — approximate by design; recall
    vs the exact pairs is pinned by a unit test; rows-only driver check."""
    from ..stages.similarity import lsh_neardup_pairs
    ds = read_scaled(f"{sf_dir}/embeddings.parquet")
    return _to_table(lsh_neardup_pairs(ds, threshold=0.4))


def q_lsh_cosine(sf_dir: str) -> pa.Table:
    """LSH-bucketed cosine top-k (ANN scale path) — approximate by design;
    rows-only + recall unit test vs the exact baseline."""
    from ..stages.similarity import lsh_topk_cosine
    ds = read_scaled(f"{sf_dir}/embeddings.parquet")
    return _to_table(lsh_topk_cosine(ds, k=20, n_planes=4))


def q_ivf_cosine(sf_dir: str) -> pa.Table:
    """IVF coarse-quantizer ANN top-k (the FAISS-style inverted-file scale
    path) — approximate by design; rows-only + recall unit test."""
    from ..stages.similarity import ivf_topk_cosine
    ds = read_scaled(f"{sf_dir}/embeddings.parquet")
    return _to_table(ivf_topk_cosine(ds, k=20, n_lists=8, n_probes=4))


def q_parse_json(sf_dir: str) -> pa.Table:
    """parse_json + json path access (get_property/$!tree analogue,
    §2.4): extract $!event and $!n from CEE payloads."""
    from .. import functions as F
    ds = build_parsed_dataset(ensure_transcripts(sf_dir))

    def fn(batch: pa.Table) -> pa.Table:
        ok = pc.fill_null(batch["cee_parsesuccess"], False)
        sub = batch.filter(ok)
        cee = pc.cast(sub["cee_json"], pa.string())
        return pa.table({
            "conv_id": sub["conv_id"],
            "turn_idx": sub["turn_idx"],
            "event": F.json_get(cee, "event"),
            "n": pc.cast(F.json_get(cee, "n"), pa.int64()),
        })
    return _to_table(ds.map_batches(fn, batch_format="pyarrow"))


def q_multimodal_audio(sf_dir: str) -> pa.Table:
    """Audio pipeline over REAL WAV payloads READ from storage (cached
    media parquet, datagen.ensure_media) → actor-pool RIFF/PCM16 decode
    (multimodal.decode_wav — real sample_rate / channels / duration /
    rms). Rows-only (payload fixtures aren't SQL) + Python-oracle
    pytest."""
    from ..datagen import ensure_media
    from ..stages.multimodal import AudioDecodeStub
    ds = read_scaled(ensure_media(sf_dir), columns=["doc_id", "wav"])
    ds = ds.map_batches(
        lambda b: b.rename_columns(["doc_id", "payload"]),
        batch_format="pyarrow")
    ds = ds.map_batches(AudioDecodeStub, batch_format="pyarrow",
                        batch_size=256, concurrency=2)

    def proj(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_id", "sample_rate", "n_channels",
                             "duration_s", "rms"])
    return _to_table(ds.map_batches(proj, batch_format="pyarrow"))


def q_hash_split(sf_dir: str) -> pa.Table:
    """Deterministic train/val/test assignment (training-data op):
    Fibonacci-hash the doc id against exact integer cut points — both
    sides integer-only, so the HUGEINT oracle matches bit-for-bit."""
    from ..stages.sampling import hash_split
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "source"])
    return _to_table(hash_split(ds))


def q_sample_by_source(sf_dir: str) -> pa.Table:
    """Per-source weighted downsampling (data-mixing op): keep-fraction
    per source via an independent hash stream."""
    from ..stages.sampling import sample_by_key
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "source", "lang"])
    return _to_table(sample_by_key(
        ds, weights={"src0": 0.5, "src1": 0.25, "src2": 0.0},
        key_col="source"))


def q_pack_sequences(sf_dir: str) -> pa.Table:
    """Concat-then-chunk sequence packing: per-source ordered token
    prefix sum (two-pass distributed: tiny per-chunk partials → driver
    prefix fold → per-chunk local cumsum) → seq_idx = before //
    max_tokens. Oracle: window cumsum over the proven token count."""
    from ..stages.sampling import pack_sequences
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "source", "text"])
    # sort for a deterministic output row order — the grouped shuffle's
    # block order is nondeterministic and the driver hashes row order
    return _to_table(pack_sequences(ds, max_tokens=2048)) \
        .sort_by("doc_id")


def q_decontaminate(sf_dir: str) -> pa.Table:
    """Benchmark decontamination: eval set = doc_id % 20 == 0; keep the
    corpus docs sharing NO word 5-gram with it. Exact string containment
    (broadcast eval gram set, vectorized per-batch membership)."""
    from ..stages.sampling import decontaminate
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])

    def side(want_eval: bool):
        def fn(b: pa.Table) -> pa.Table:
            ids = pc.cast(b["doc_id"], pa.int64())
            mod = pc.subtract(ids, pc.multiply(pc.divide(ids, 20), 20))
            mask = pc.equal(mod, 0) if want_eval else pc.not_equal(mod, 0)
            return b.filter(mask)
        return fn
    eval_ds = ds.map_batches(side(True), batch_format="pyarrow")
    corpus = ds.map_batches(side(False), batch_format="pyarrow")
    clean = decontaminate(corpus, eval_ds, n=5)
    return _to_table(clean.select_columns(["doc_id"]))


def q_top_ngrams(sf_dir: str) -> pa.Table:
    """Corpus-wide top-50 word bigrams (vocabulary statistics): partial
    counts → hash-bucket merge → per-block top-k → driver merge (exact;
    ties count-desc, gram-asc on both sides)."""
    from ..stages.textstats import top_ngrams
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])
    return top_ngrams(ds, n=2, k=50)


def q_sample_n_per_source(sf_dir: str) -> pa.Table:
    """Fixed-size per-key random sampling: 5 hash-ranked docs per source
    (deterministic, batching-invariant)."""
    from ..stages.sampling import sample_n_per_key
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "source"])
    return _to_table(sample_n_per_key(ds, key_col="source", n=5))


def q_repetition(sf_dir: str) -> pa.Table:
    """Gopher-style duplicate-line(/char) fraction quality signals
    (separator ' ' on the newline-free fixture corpus)."""
    from ..stages.textstats import repetition_table
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])
    return _to_table(ds.map_batches(
        lambda b: repetition_table(b, sep=" "), batch_format="pyarrow"))


def q_curation(sf_dir: str) -> pa.Table:
    """The training-data FLAGSHIP composite: quality-filter (stopword
    ratio ≥ 0.05) → exact dedup (min doc_id per text) → intra-doc line
    dedup → deterministic train/val/test split → token count of the
    cleaned text. Every stage streams; the only shuffle is exact_dedup's
    keyed groupby. Oracle = the same four stages as nested CTEs."""
    from ..stages.dedup import exact_dedup
    from ..stages.sampling import dedup_lines, hash_split
    from ..stages.textstats import TOKEN_RE, QualityScore
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])
    qs = QualityScore("text")

    def qual_filter(b: pa.Table) -> pa.Table:
        scored = qs(b)
        keep = pc.greater_equal(scored["stop_ratio"], 0.05)
        return scored.filter(keep).select(["doc_id", "text"])
    ds = ds.map_batches(qual_filter, batch_format="pyarrow")
    ds = exact_dedup(ds, text_col="text", id_col="doc_id")
    ds = dedup_lines(ds, sep=" ")
    ds = hash_split(ds)

    def proj(b: pa.Table) -> pa.Table:
        toks = pc.count_substring_regex(pc.cast(b["text"], pa.string()),
                                        pattern=TOKEN_RE)
        return pa.table({"doc_id": b["doc_id"], "split": b["split"],
                         "n_tokens": pc.cast(toks, pa.int64())})
    return _to_table(ds.map_batches(proj, batch_format="pyarrow"))


def q_dedup_lines(sf_dir: str) -> pa.Table:
    """Intra-doc repeated-line removal (C4-style cleaning). The fixture
    corpus has no newlines, so the separator is ' ' here — the operator
    semantics (first occurrence per doc, order preserved, re-joined) are
    separator-independent."""
    from ..stages.sampling import dedup_lines
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])
    return _to_table(dedup_lines(ds, sep=" "))


def q_script_error(sf_dir: str) -> pa.Table:
    """script_error() end-to-end (grammar/rainerscript.c:2792): statement
    1's filter runs parse_json over a half-corrupted JSON column (even
    turn_idx gets a trailing '}' — invalid in every parser), statement 2
    routes the rows whose parse failed via the ("script_error",) expr op.
    The errno state set in one statement is visible to LATER statements of
    the same ruleset walk (wti execState analogue). Corruption is derived
    from row identity only, so the result is batching-invariant; the
    DuckDB oracle applies the identical corruption + TRY_CAST-IS-NULL."""
    from ..stages.route import Action, Ruleset, route_table
    ds = build_parsed_dataset(ensure_transcripts(sf_dir))
    rs = Ruleset("se", [
        Action("parsed_ok", filter=("not", ("isempty",
               ("call", "parse_json", ("prop", "j"))))),
        Action("errs", filter=("==", ("script_error",), 1)),
    ])

    def fn(batch: pa.Table) -> pa.Table:
        ok = pc.fill_null(batch["cee_parsesuccess"], False)
        sub = batch.filter(ok)
        cee = pc.fill_null(pc.cast(sub["cee_json"], pa.string()), "")
        even = pc.equal(pc.bit_wise_and(pc.cast(sub["turn_idx"],
                                                pa.int64()), 1), 0)
        j = pc.if_else(even, pc.binary_join_element_wise(
            cee, pa.scalar("}"), ""), cee)
        routed = route_table(sub.append_column("j", j), rs)
        errs = routed["errs"]
        return pa.table({"conv_id": errs["conv_id"],
                         "turn_idx": errs["turn_idx"]})
    return _to_table(ds.map_batches(fn, batch_format="pyarrow"))


# liblognorm-style rulebase applied to the RAW transcript text (the
# pmnormalize/useRawMsg shape): first-match-wins cascade over four sample
# rules + per-tag annotations. The oracle SQL is GENERATED from the same
# compiled RE2 regexes (oracle_sql._grok_sql) — semantics match by
# construction.
TRANSCRIPT_RULEBASE = r"""
rule=ietf:<%pri:number%>1 %ts5424:date-rfc5424% %host:word% %app:word% %procid:word% %msgid:word% %-:rest%
annotate=ietf:+proto="rfc5424"
rule=cee:<%pri:number%>%ts3164:date-rfc3164% %host:word% %tag:char-to:\x3a%: @cee: %cee:rest%
annotate=cee:+proto="rfc3164"
rule=bsd:<%pri:number%>%ts3164:date-rfc3164% %host:word% %tag:char-to:\x3a%: msgnum:%num:number%:%-:rest%
annotate=bsd:+proto="rfc3164"
rule=bsd3339:<%pri:number%>%ts5424:date-rfc5424% %host:word% %tag:char-to:\x3a%: msgnum:%num:number%:%-:rest%
annotate=bsd3339:+proto="rfc3164"
"""


def q_grok_parse(sf_dir: str) -> pa.Table:
    """mmnormalize/pmnormalize rulebase parse (§2.2/§2.6): vectorized
    first-match-wins regex-dictionary cascade over raw transcript text,
    typed captures + annotations + unparsed-data on failure."""
    from ..stages.normalize import NormalizeStage, RuleBase
    tdir = ensure_transcripts(sf_dir)
    ds = read_transcripts(tdir, columns=["conv_id", "turn_idx", "text"])
    stage = NormalizeStage(RuleBase.from_string(TRANSCRIPT_RULEBASE),
                           source="text")
    return _to_table(ds.map_batches(stage, batch_format="pyarrow"))


def q_dict_encode(sf_dir: str) -> pa.Table:
    """Deterministic label encoding of event_type: dense 1-based rank in
    sorted vocabulary order (dense_rank join twin)."""
    from ..stages.sampling import dictionary_encode
    ds = read_scaled(f"{sf_dir}/events.parquet",
                     columns=["event_id", "event_type"])
    return _to_table(dictionary_encode(ds, col="event_type"))


def q_mad_outliers(sf_dir: str) -> pa.Table:
    """Robust MAD outliers per event_type: |v - median| > 3 * MAD
    (quantile_disc twins for both folds)."""
    from ..stages.aggregate import mad_outliers
    ds = read_scaled(f"{sf_dir}/events.parquet",
                     columns=["event_id", "event_type", "value"])
    return _to_table(mad_outliers(ds))


def q_log_templates(sf_dir: str) -> pa.Table:
    """Log template mining over parsed msg: mask uuid/ip/hex/number runs,
    count per residual shape (Drain-family readout; nested
    regexp_replace twin)."""
    from ..stages.textstats import mine_templates
    ds = apply_stops(_parsed(sf_dir), CANONICAL_RULESET)
    return _to_table(mine_templates(ds, col="msg"))


def q_rollup(sf_dir: str) -> pa.Table:
    """GROUP BY ROLLUP(facility, severity) over the parsed+routed rows —
    hierarchical totals folded from one finest-level pass."""
    from ..stages.aggregate import rollup_counts
    ds = apply_stops(_parsed(sf_dir), CANONICAL_RULESET)
    return _to_table(rollup_counts(ds, ["facility", "severity"]))


def q_winsorize(sf_dir: str) -> pa.Table:
    """Per-event-type winsorization of value to [p05, p95] —
    quantile_disc-bounded clip, broadcast bounds, zero corpus shuffle."""
    from ..stages.aggregate import winsorize_by_key
    ds = read_scaled(f"{sf_dir}/events.parquet",
                     columns=["event_id", "event_type", "value"])
    return _to_table(winsorize_by_key(ds)
                     .select_columns(["event_id", "clipped"]))


def q_feature_corr(sf_dir: str) -> pa.Table:
    """One-pass Pearson correlation matrix over engineered text features
    — SQL corr() twin (normalization cancels, so population moments
    equal the sample statistic exactly)."""
    from ..stages.aggregate import corr_matrix

    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])

    def feats(batch: pa.Table) -> pa.Table:
        txt = pc.cast(batch["text"], pa.string())
        nch = pc.utf8_length(txt).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        toks = pc.split_pattern_regex(pc.fill_null(txt, ""), pattern=r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        nw = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        digits = pc.count_substring_regex(txt, pattern="[0-9]") \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"n_chars": pa.array(nch),
                         "n_words": pa.array(nw),
                         "n_digits": pa.array(digits)})

    fds = ds.map_batches(feats, batch_format="pyarrow")
    return _to_table(corr_matrix(fds, ["n_chars", "n_words", "n_digits"]))


def q_logreg(sf_dir: str) -> pa.Table:
    """Distributed quality-classifier training: full-batch logistic
    regression over engineered text features (words, mean word length,
    digit fraction) predicting a deterministic length label — every
    iteration one gradient-partial pass, O(d) driver state. Rows-only
    (iterative fit); exact numpy-oracle pytest pins the math."""
    from ..stages.clustering import logreg_fit

    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])
    # logreg_fit materializes its own (features, label) projection once,
    # so the feature stage stays lazy here — no second object-store copy
    fds = ds.map_batches(_quality_feature_table, batch_format="pyarrow")
    return _to_table(logreg_fit(fds, ["n_words", "mean_wlen",
                                      "digit_frac"], "y", iters=20))


def _quality_feature_table(batch: pa.Table) -> pa.Table:
    """Engineered quality features (words, mean word length, digit
    fraction) + the deterministic length label, doc_id preserved —
    shared by the logreg and classifier-filter pipelines. Null texts
    count as empty (a single NaN feature would poison the whole fit)."""
    txt = pc.fill_null(pc.cast(batch["text"], pa.string()), "")
    nch = pc.utf8_length(txt).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    toks = pc.split_pattern_regex(pc.fill_null(txt, ""), pattern=r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    nw = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    digits = pc.count_substring_regex(txt, pattern="[0-9]") \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    return pa.table({
        "doc_id": pc.cast(batch["doc_id"], pa.int64()),
        "n_words": pa.array(nw),
        "mean_wlen": pa.array(np.where(nw > 0, nch / np.maximum(nw, 1),
                                       0.0)),
        "digit_frac": pa.array(digits / np.maximum(nch, 1)),
        "y": pa.array((nch > 280).astype(np.int64)),
    })


def q_classifier_filter(sf_dir: str) -> pa.Table:
    """End-to-end model-based quality filtering (the GPT-3/CCNet corpus
    stage): train the distributed logistic quality classifier, broadcast
    its weights once, score every document with one vectorized sigmoid
    per batch, and keep docs with p ≥ 0.5. Rows-only (iterative fit);
    the fit math and the apply kernel are numpy-oracle pytest-pinned."""
    from ..stages.clustering import logreg_apply, logreg_fit

    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])
    fcols = ["n_words", "mean_wlen", "digit_frac"]
    fds = ds.map_batches(_quality_feature_table,
                         batch_format="pyarrow").materialize()
    w = logreg_fit(fds, fcols, "y", iters=20)
    kept = logreg_apply(fds.select_columns(["doc_id", *fcols]), w, fcols,
                        threshold=0.5)

    def proj(t: pa.Table) -> pa.Table:
        return t.select(["doc_id", "score"])
    return _to_table(kept.map_batches(proj, batch_format="pyarrow")) \
        .sort_by("doc_id")


def q_image_dedup(sf_dir: str) -> pa.Table:
    """Perceptual image near-dup removal over REAL decoded pixels:
    payloads are per-class gradient PNGs re-encoded with varying filter
    types and uniform brightness shifts (same image, different bytes) —
    dHash lands each class in one Hamming component, the dedup keeps the
    smallest doc_id per class. Payloads READ from the cached media
    parquet (datagen.ensure_media / dup_png_for_id). Rows-only (payload
    fixtures aren't SQL) + invariance/planted-group pytest."""
    from ..datagen import ensure_media
    from ..stages.multimodal import image_dedup

    ds = read_scaled(ensure_media(sf_dir), columns=["doc_id", "png_dup"])
    ds = ds.map_batches(
        lambda b: b.rename_columns(["doc_id", "payload"]),
        batch_format="pyarrow")
    return _to_table(image_dedup(ds).select_columns(["doc_id"]))


def q_audio_dedup(sf_dir: str) -> pa.Table:
    """Audio near-dup removal over REAL decoded PCM: per-class sine
    fixtures at varying gains/encodings collapse to one survivor per
    class. Payloads READ from the cached media parquet
    (datagen.ensure_media / dup_wav_for_id). Rows-only + invariance
    pytest."""
    from ..datagen import ensure_media
    from ..stages.multimodal import audio_dedup

    ds = read_scaled(ensure_media(sf_dir), columns=["doc_id", "wav_dup"])
    ds = ds.map_batches(
        lambda b: b.rename_columns(["doc_id", "payload"]),
        batch_format="pyarrow")
    return _to_table(audio_dedup(ds).select_columns(["doc_id"]))


def q_multimodal(sf_dir: str) -> pa.Table:
    """Multimodal pipeline over REAL image payloads READ from storage:
    opaque binary column from the cached media parquet
    (datagen.ensure_media — stdlib-zlib PNG fixtures) → typed metadata →
    actor-pool decode (stages/multimodal.decode_png: inflate + scanline
    unfilter, real width/height/mean_luma) → resize. Rows-only at the
    driver (payload fixtures aren't SQL) + Python-oracle pytest."""
    from ..datagen import ensure_media
    from ..stages.multimodal import attach_media_meta, image_features
    ds = read_scaled(ensure_media(sf_dir), columns=["doc_id", "png"])
    ds = ds.map_batches(
        lambda b: b.rename_columns(["doc_id", "payload"]),
        batch_format="pyarrow")
    ds = ds.map_batches(lambda b: attach_media_meta(b, fmt="png"),
                        batch_format="pyarrow")
    out = image_features(ds)

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bytes": pc.struct_field(batch["media_meta"], "n_bytes"),
            "width": batch["width"], "height": batch["height"],
            "resized_w": batch["resized_w"], "resized_h": batch["resized_h"],
            "mean_luma": batch["mean_luma"],
        })
    return _to_table(out.map_batches(project, batch_format="pyarrow"))


def q_redact(sf_dir: str) -> pa.Table:
    """PII / identifier redaction (training-data cleaning op): ordered
    email / phone / long-digit-run regex→placeholder rules, one vectorized
    RE2 replace per rule, no shuffle (mmanon generalized to arbitrary
    patterns; plugins/mmanon/mmanon.c regex mode analogue)."""
    from ..stages.enrich import redact_table
    tdir = ensure_transcripts(sf_dir)
    ds = read_transcripts(tdir, columns=["conv_id", "turn_idx", "text"])
    return _to_table(ds.map_batches(redact_table, batch_format="pyarrow"))


def q_canonical_dedup(sf_dir: str) -> pa.Table:
    """Fuzzy-exact dedup (Falcon/RefinedWeb canonicalization): keep the
    min doc_id per lowercase/punct-stripped/whitespace-collapsed text.
    Exact DuckDB regexp_replace twin."""
    from ..stages.dedup import canonical_dedup
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])
    return _to_table(canonical_dedup(ds).select_columns(["doc_id"]))


def q_epoch_mix(sf_dir: str) -> pa.Table:
    """Epoch-weighted source mixing (LLaMA/Pile sampling proportions):
    src0 at 2.3 epochs, src1 at 0.5, everything else 1.0 — floor(w)
    deterministic replicas per doc plus a hash-thresholded fractional
    one, replica index in `epoch`. Exact DuckDB lateral-range oracle."""
    from ..stages.sampling import epoch_mix
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "source"])
    out = epoch_mix(ds, {"src0": 2.3, "src1": 0.5})
    return _to_table(out).sort_by([("doc_id", "ascending"),
                                   ("epoch", "ascending")])


def q_immark(sf_dir: str) -> pa.Table:
    """immark heartbeat analogue (plugins/immark/immark.c:263-286):
    deterministic event-time marks — one (ts, pri=46, tag='rsyslogd:',
    '-- MARK --') row per period-aligned epoch boundary inside the
    stream's [min ts, max ts] (period 1200 s). Bounds fold is O(#batches)
    partials; exactly SQL generate_series."""
    from ..sources.marks import immark_table
    tdir = ensure_transcripts(sf_dir)
    ds = read_transcripts(tdir, columns=["ts"])
    return immark_table(ds, period_s=1200)


def q_boilerplate(sf_dir: str) -> pa.Table:
    """Boilerplate-line removal (C4 / RefinedWeb line rule): drop EVERY
    occurrence of a line whose text appears in ≥2 distinct conversations
    (nav-bar/banner analogue); unlike dedup_lines_global no first copy
    survives. Exact distinct-doc counting (pair-dedup across batches) →
    Zipf-bounded hot-line broadcast → vectorized is_in filter."""
    from ..stages.dedup import boilerplate_filter
    tdir = ensure_transcripts(sf_dir)
    ds = read_transcripts(tdir, columns=["conv_id", "turn_idx", "text"])
    out = boilerplate_filter(ds, doc_col="conv_id", min_docs=2)
    return _to_table(out.select_columns(["conv_id", "turn_idx"]))


def q_dedup_lines_global(sf_dir: str) -> pa.Table:
    """Corpus-level exact line dedup (MassiveText "remove lines duplicated
    across documents"): each transcript turn is a line; keep only the
    globally FIRST (conv_id, turn_idx) occurrence of each distinct text.
    Partial per-batch first-pick → text-hash-bucket co-location → one
    vectorized pandas pass per bounded bucket."""
    from ..stages.dedup import first_occurrence
    tdir = ensure_transcripts(sf_dir)
    ds = read_transcripts(tdir, columns=["conv_id", "turn_idx", "text"])
    out = first_occurrence(ds, order_cols=["conv_id", "turn_idx"])
    return _to_table(out.select_columns(["conv_id", "turn_idx"]))


def q_shuffle_shards(sf_dir: str) -> pa.Table:
    """Deterministic seeded global shuffle into training shards:
    (doc_id, shard, pos) where pos ranks a bijective hash of the id within
    its shard — a reproducible random permutation cut into ordered
    shards, ranked without any global sort (per-(shard, u-range) counts →
    driver prefix fold → bounded local sorts)."""
    from ..stages.sampling import shuffle_shards
    ds = read_scaled(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return _to_table(shuffle_shards(ds, n_shards=8, seed=42))


def q_equi_join(sf_dir: str) -> pa.Table:
    """General distributed hash equi-join (string key): every turn joined
    to its conversation's turn count — the keyed-shuffle join for
    fact-to-fact sizes where a broadcast lookup no longer fits."""
    from ..stages.joins import equi_join
    tdir = ensure_transcripts(sf_dir)
    left = read_transcripts(tdir, columns=["conv_id", "turn_idx", "role"])
    right = (count_by(read_transcripts(tdir, columns=["conv_id"]),
                      ["conv_id"])
             .map_batches(lambda t: t.rename_columns(["conv_id", "n_turns"]),
                          batch_format="pyarrow"))
    return _to_table(equi_join(left, right, key="conv_id",
                               materialize_right=False))


def q_turn_windows(sf_dir: str) -> pa.Table:
    """Sliding 'last 4 turns' context construction per conversation
    (windowed string_agg twin)."""
    from ..stages.aggregate import turn_windows
    tdir = ensure_transcripts(sf_dir)
    ds = read_transcripts(tdir, columns=["conv_id", "turn_idx", "text"])
    return _to_table(turn_windows(ds, k=4))


def q_profile(sf_dir: str) -> pa.Table:
    """Dataset profiler: exact per-column (rows, nulls, distinct) in one
    pass — the pre-ingestion data-audit readout."""
    from ..stages.aggregate import profile_columns
    tdir = ensure_transcripts(sf_dir)
    ds = read_transcripts(tdir, columns=["conv_id", "turn_idx", "role",
                                         "tool", "ts"])
    return _to_table(profile_columns(ds))


def q_sft_pairs(sf_dir: str) -> pa.Table:
    """SFT prompt→response pair construction: each assistant turn pairs
    with the latest preceding user turn of its conversation (window
    last_value IGNORE NULLS twin)."""
    from ..stages.aggregate import sft_pairs
    tdir = ensure_transcripts(sf_dir)
    ds = read_transcripts(tdir, columns=["conv_id", "turn_idx", "role",
                                         "text"])
    return _to_table(sft_pairs(ds))


def q_conv_docs(sf_dir: str) -> pa.Table:
    """Conversation-document reconstruction: per-conv ordered text concat
    (string_agg ORDER BY turn_idx) — the 'turns → training document'
    operator; hash-bucketed, one vectorized Arrow binary_join per
    bucket."""
    from ..stages.aggregate import concat_group_text
    tdir = ensure_transcripts(sf_dir)
    ds = read_transcripts(tdir, columns=["conv_id", "turn_idx", "text"])
    return _to_table(concat_group_text(ds, key="conv_id",
                                       order_col="turn_idx"))


def q_global_topn(sf_dir: str) -> pa.Table:
    """Exact global top-100 events by value (tie event_id) — per-block
    partial top-n → bounded driver merge; no all-to-all Sort."""
    from ..stages.aggregate import global_topn
    ds = read_scaled(f"{sf_dir}/events.parquet",
                     columns=["event_id", "ts", "user_id", "event_type",
                              "value"])
    return _finalize(global_topn(ds, sort_col="value", n=100,
                                 tie_cols=("event_id",), descending=True))


def q_nfc_normalize(sf_dir: str) -> pa.Table:
    """Unicode NFC normalization (text-cleaning before dedup): inject a
    decomposed 'a'+combining-acute into every document (the testdata is
    pure ASCII), then compose back with Arrow's vectorized
    utf8_normalize — DuckDB nfc_normalize twin."""
    from ..stages.textstats import normalize_text_table
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        decomposed = pc.replace_substring(
            pc.cast(t["text"], pa.string()), pattern="a",
            replacement="a\u0301")  # a + COMBINING ACUTE (decomposed NFD)
        t = pa.table({"doc_id": t["doc_id"], "text": decomposed})
        out = normalize_text_table(t, form="NFC")
        return out.select(["doc_id", "text_nfc"])

    return _to_table(ds.map_batches(fn, batch_format="pyarrow"))


def q_countmin_topk(sf_dir: str) -> pa.Table:
    """Count-Min-sketch heavy hitters over user_id (rows-only by design —
    a sketch; pytest proves the ≥-exact bound and exact-topk agreement
    at this scale). Sketch memory O(d·w), independent of key
    cardinality."""
    from ..stages.aggregate import countmin_topk
    ds = read_scaled(f"{sf_dir}/events.parquet", columns=["user_id"])
    return countmin_topk(ds, col="user_id", k=20)


def q_event_gaps(sf_dir: str) -> pa.Table:
    """Per-user inter-event time: LAG(ts) OVER (PARTITION BY user_id
    ORDER BY ts, event_id) + microsecond delta — the sessionization /
    inter-arrival primitive as a standalone window operator."""
    from ..stages.aggregate import lag_by_key
    ds = read_scaled(f"{sf_dir}/events.parquet",
                     columns=["event_id", "ts", "user_id"])
    out = lag_by_key(ds, key="user_id", order_cols=("ts", "event_id"),
                     value_col="ts", out_col="prev_ts")

    def gap(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.timestamp("us"))
        prev = pc.cast(t["prev_ts"], pa.timestamp("us"))
        gap_us = pc.cast(pc.subtract(ts, prev), pa.int64())
        return pa.table({"event_id": pc.cast(t["event_id"], pa.int64()),
                         "user_id": pc.cast(t["user_id"], pa.int64()),
                         "ts": ts, "prev_ts": prev, "gap_us": gap_us})

    return _to_table(out.map_batches(gap, batch_format="pyarrow"))


def q_running_total(sf_dir: str) -> pa.Table:
    """Per-user running sum of event value — SUM(value) OVER
    (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED
    PRECEDING); accumulation order pinned so doubles match the SQL
    window bit-for-bit (rounded half-away to 6 dp both sides)."""
    from ..stages.aggregate import cumsum_by_key
    from ..stages.textstats import _round_away6
    ds = read_scaled(f"{sf_dir}/events.parquet",
                     columns=["event_id", "ts", "user_id", "value"])
    out = cumsum_by_key(ds, key="user_id", order_cols=("ts", "event_id"),
                        value_col="value", out_col="running_total")

    def rnd(t: pa.Table) -> pa.Table:
        rt = _round_away6(
            t["running_total"].to_numpy(zero_copy_only=False))
        return pa.table({"event_id": pc.cast(t["event_id"], pa.int64()),
                         "user_id": pc.cast(t["user_id"], pa.int64()),
                         "ts": pc.cast(t["ts"], pa.timestamp("us")),
                         "value": pc.cast(t["value"], pa.float64()),
                         "running_total": pa.array(rt, pa.float64())})

    return _to_table(out.map_batches(rnd, batch_format="pyarrow"))


def q_anti_join(sf_dir: str) -> pa.Table:
    """Distributed anti-join (NOT IN blocklist): drop the top-100
    events by value (outlier removal) — the decontamination shape on a
    keyed shuffle instead of a broadcast bloom filter, integer key."""
    from ..stages.aggregate import global_topn
    from ..stages.joins import equi_join
    left = read_scaled(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id", "event_type"])
    top = global_topn(
        read_scaled(f"{sf_dir}/events.parquet",
                    columns=["event_id", "value"]),
        sort_col="value", n=100, tie_cols=("event_id",))
    block = rd.from_arrow(top.select(["event_id"]))
    return _to_table(equi_join(left, block, key="event_id", how="anti"))


def q_tfidf(sf_dir: str) -> pa.Table:
    """Per-document top-5 TF-IDF terms (tf · ln(N/df), whitespace
    tokens) — fully distributed: local tf partials, term-bucketed df
    merge, tf⋈df equi-join, per-doc top-k head."""
    from ..stages.textstats import tfidf_top_terms
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])
    return _to_table(tfidf_top_terms(ds, k=5))


def q_user_ntile(sf_dir: str) -> pa.Table:
    """Per-user value quartiles — NTILE(4) OVER (PARTITION BY user_id
    ORDER BY value, event_id), SQL tile-size semantics (larger tiles
    first)."""
    from ..stages.aggregate import rank_by_key
    ds = read_scaled(f"{sf_dir}/events.parquet",
                     columns=["event_id", "user_id", "value"])
    out = rank_by_key(ds, key="user_id", order_cols=("value", "event_id"),
                      method="ntile", n_tiles=4, out_col="quartile")
    return _to_table(out.map_batches(
        lambda t: pa.table({"event_id": pc.cast(t["event_id"], pa.int64()),
                            "user_id": pc.cast(t["user_id"], pa.int64()),
                            "value": pc.cast(t["value"], pa.float64()),
                            "quartile": pc.cast(t["quartile"], pa.int64())}),
        batch_format="pyarrow"))


def q_type_rank(sf_dir: str) -> pa.Table:
    """Per-user RANK() with real tie groups (event_type has 5 values):
    ties share the min rank, the next rank skips — no tie-break column
    needed because equal keys rank equal on both sides."""
    from ..stages.aggregate import rank_by_key
    ds = read_scaled(f"{sf_dir}/events.parquet",
                     columns=["event_id", "user_id", "event_type"])
    out = rank_by_key(ds, key="user_id", order_cols=("event_type",),
                      method="rank", out_col="rnk")
    return _to_table(out.map_batches(
        lambda t: pa.table({"event_id": pc.cast(t["event_id"], pa.int64()),
                            "user_id": pc.cast(t["user_id"], pa.int64()),
                            "event_type": pc.cast(t["event_type"],
                                                  pa.string()),
                            "rnk": pc.cast(t["rnk"], pa.int64())}),
        batch_format="pyarrow"))


def q_centroids(sf_dir: str) -> pa.Table:
    """Per-label embedding centroids in long (label, dim, centroid)
    form — the k-means/IVF building block as a standalone distributed
    aggregate (partial sums per batch, O(labels × dims) shuffle)."""
    from ..stages.aggregate import centroid_by_label
    ds = read_scaled(f"{sf_dir}/embeddings.parquet",
                     columns=["label", "embedding"])
    return _to_table(centroid_by_label(ds))


def q_dow_pivot(sf_dir: str) -> pa.Table:
    """Wide pivot: events per (event_type × ISO day-of-week) — long
    count_by fold reshaped to one int64 column per weekday (bounded
    5×7 cell domain)."""
    from ..stages.aggregate import pivot_counts
    ds = read_scaled(f"{sf_dir}/events.parquet",
                     columns=["event_type", "ts"])

    def add_dow(t: pa.Table) -> pa.Table:
        # Arrow day_of_week: Mon=0 → ISO Mon=1..Sun=7 (DuckDB isodow)
        dow = pc.add(pc.day_of_week(pc.cast(t["ts"], pa.timestamp("us"))),
                     1)
        return pa.table({"event_type": t["event_type"],
                         "dow": pc.cast(dow, pa.int64())})

    return _finalize(pivot_counts(
        ds.map_batches(add_dow, batch_format="pyarrow"),
        row_key="event_type", col_key="dow",
        col_values=tuple(range(1, 8)), prefix="d"))


def q_median_filter(sf_dir: str) -> pa.Table:
    """Quantile-threshold filter: keep documents strictly longer than
    their source's median n_chars — percentiles_by_key (bounded
    histogram fold, quantile_disc ranks) broadcast back into a
    vectorized filter pass."""
    from ..stages.aggregate import percentiles_by_key
    meds = percentiles_by_key(
        read_scaled(f"{sf_dir}/documents.parquet",
                    columns=["source", "n_chars"]),
        key="source", value_col="n_chars", qs=(0.5,), names=("p50",))
    med_map = dict(zip(meds["source"].to_pylist(),
                       meds["p50"].to_pylist()))
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "source", "n_chars"])

    def keep(t: pa.Table) -> pa.Table:
        src = t["source"].to_pylist()
        thr = np.array([med_map[s] for s in src])
        n = t["n_chars"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(n > thr))

    return _to_table(ds.map_batches(keep, batch_format="pyarrow"))


def q_lm_score(sf_dir: str) -> pa.Table:
    """Corpus-trained bigram LM quality scoring (CCNet-style): per-doc
    mean add-one-smoothed ln P(w|prev) over whitespace bigrams."""
    from ..stages.textstats import bigram_lm_score
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])
    return _to_table(bigram_lm_score(ds))


def q_contamination_report(sf_dir: str) -> pa.Table:
    """Per-eval-doc contamination audit (inverse of decontaminate):
    eval = doc_id % 20 == 0; for each eval doc, the number of distinct
    corpus docs sharing >=1 word 5-gram (0 rows included)."""
    from ..stages.sampling import contamination_report
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])

    def side(want_eval: bool):
        def fn(b: pa.Table) -> pa.Table:
            ids = pc.cast(b["doc_id"], pa.int64())
            mod = pc.subtract(ids, pc.multiply(pc.divide(ids, 20), 20))
            mask = pc.equal(mod, 0) if want_eval else pc.not_equal(mod, 0)
            return b.filter(mask)
        return fn
    eval_ds = ds.map_batches(side(True), batch_format="pyarrow")
    corpus = ds.map_batches(side(False), batch_format="pyarrow")
    return _to_table(contamination_report(corpus, eval_ds, n=5))


def q_temperature_mix(sf_dir: str) -> pa.Table:
    """Temperature-weighted source mixing (T5/mT5 alpha sampling):
    keep probability per source ∝ n_s^alpha, capped at 1, realized as
    a deterministic id-hash threshold. Map-only filter — output keeps
    the input's row order."""
    from ..stages.sampling import temperature_mix
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "source"])
    return _to_table(temperature_mix(ds, alpha=0.3, frac=0.5))


def q_ccnet_buckets(sf_dir: str) -> pa.Table:
    """CCNet perplexity bucketing: bigram-LM score → per-source
    NTILE(3) head/middle/tail quality tiles."""
    from ..stages.textstats import ccnet_buckets
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "source", "text"])
    # sort: the join+window shuffles reorder rows and the driver
    # hashes row order
    return _to_table(ccnet_buckets(ds)).sort_by("doc_id")


def q_auc_quality(sf_dir: str) -> pa.Table:
    """Classifier-calibration AUC: does doc length rank src0 docs above
    the rest? Exact tie-aware Mann-Whitney over a distributed score
    histogram (one output row)."""
    from ..stages.aggregate import roc_auc
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["source", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "score": pc.cast(t["n_chars"], pa.float64()),
            "label": pc.cast(pc.equal(t["source"], "src0"), pa.int64())})
    return roc_auc(ds.map_batches(prep, batch_format="pyarrow"))


def q_char_entropy(sf_dir: str) -> pa.Table:
    """Per-doc codepoint Shannon entropy (gibberish / binary-junk
    signal). Map-only — input row order preserved."""
    from ..stages.textstats import char_entropy
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])
    return _to_table(char_entropy(ds))


def q_length_batches(sf_dir: str) -> pa.Table:
    """Length-bucketed training-batch assembly: token-count buckets →
    deterministic hash order → fixed-size batch ids."""
    from ..stages.sampling import length_batches
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])
    # sort: the window shuffle reorders rows (driver hashes row order)
    return _to_table(length_batches(ds)).sort_by("doc_id")


EVENT_CHARS = {"click": "c", "error": "e", "purchase": "p",
               "signup": "s", "view": "v"}


def q_event_patterns(sf_dir: str) -> pa.Table:
    """CEP pattern counting: per user, non-overlapping matches of
    view → clicks* → purchase over the time-ordered event sequence."""
    from ..stages.aggregate import event_pattern_counts
    ds = read_scaled(f"{sf_dir}/events.parquet",
                     columns=["event_id", "user_id", "event_type", "ts"])
    out = event_pattern_counts(ds, pattern="vc*p", type_map=EVENT_CHARS)
    # sort: bucketed output order is shuffle-dependent
    return _to_table(out.map_batches(
        lambda t: pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "n_matches": pc.cast(t["n_matches"], pa.int64())}),
        batch_format="pyarrow")).sort_by("user_id")


def q_prf_quality(sf_dir: str) -> pa.Table:
    """Operating-point companion to auc_quality: precision/recall/F1 of
    the rule n_chars >= 500 predicting source == 'src0' (one row)."""
    from ..stages.aggregate import prf_at_threshold
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["source", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "score": pc.cast(t["n_chars"], pa.float64()),
            "label": pc.cast(pc.equal(t["source"], "src0"), pa.int64())})
    return prf_at_threshold(ds.map_batches(prep, batch_format="pyarrow"),
                            threshold=500.0)


def q_gopher_quality(sf_dir: str) -> pa.Table:
    """Gopher quality-rule composite (Rae et al. 2021): per-doc word
    count / mean word length / symbol ratio / line fractions / alpha
    fraction / stop-word hits + the keep decision; one stateless
    vectorized pass, thresholds tuned to the fixture's 10-99-word docs."""
    from ..stages.textstats import gopher_quality
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])
    return _to_table(gopher_quality(
        ds, min_words=30, max_words=90, min_stop_hits=1)).sort_by("doc_id")


def q_dsir_score(sf_dir: str) -> pa.Table:
    """DSIR importance scoring (Xie et al. 2023): per-doc Naive-Bayes
    unigram log-ratio of target (src0/src1) vs the raw corpus, as exact
    integer micro-nats; one distributed count fold + broadcast weights."""
    from ..stages.dsir import dsir_score
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "source", "text"])
    return _to_table(dsir_score(ds, ["src0", "src1"])).sort_by("doc_id")


def q_dsir_sample(sf_dir: str) -> pa.Table:
    """DSIR Gumbel-top-k importance resampling: select 150 docs with
    probability proportional to exp(score) via deterministic hash-Gumbel
    noise — bounded partial-top-n fold, no global sort."""
    from ..stages.dsir import dsir_resample
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "source", "text"])
    return _to_table(dsir_resample(ds, ["src0", "src1"], n=150)) \
        .sort_by("doc_id")


def q_kmeans(sf_dir: str) -> pa.Table:
    """Distributed spherical k-means over the embeddings table: per-round
    partial (cluster, dim) sums inside map_batches → bucket_merge →
    O(k × dim) driver fold; final per-cluster (size, mean cosine to own
    centroid). Deterministic (seeded init, fixed rounds, per-round
    rounding); rows-only + numpy-oracle pytest (test_clustering.py)."""
    from ..stages.clustering import kmeans_cluster_stats
    ds = read_scaled(f"{sf_dir}/embeddings.parquet",
                     columns=["vec_id", "embedding"])
    return _to_table(kmeans_cluster_stats(ds, k=8, iters=4))


def q_cluster_sample(sf_dir: str) -> pa.Table:
    """Cluster-balanced sampling (topic-diversity curation, the DoReMi /
    cluster-stratified shape): spherical k-means over the embeddings,
    assign every vector via the broadcast-centroid actor stage, then a
    fixed-N per-cluster sample ranked by a bijective id hash — equal
    representation per topic regardless of cluster skew. Rows-only
    (iterative fit); each piece is numpy-oracle pytest-pinned."""
    from ..stages.clustering import assign_clusters, kmeans_fit
    from ..stages.sampling import sample_n_per_key
    ds = read_scaled(f"{sf_dir}/embeddings.parquet",
                     columns=["vec_id", "embedding"])
    cents = kmeans_fit(ds, k=8, iters=4)
    assigned = assign_clusters(ds, cents).select_columns(
        ["vec_id", "cluster"])
    out = sample_n_per_key(assigned, key_col="cluster", id_col="vec_id",
                           n=25)
    return _to_table(out).sort_by("vec_id")


def q_semdedup(sf_dir: str) -> pa.Table:
    """SemDeDup (Abbas et al. 2023): k-means cluster the embeddings, drop
    every vector with a smaller-id ε-near partner (cosine ≥ 1-eps) in its
    cluster — within-cluster pairwise only, so the pair space is
    O(n × cluster_size) not O(n²). eps matches the cosine_dedup τ=0.4
    fixture geometry so the drop set is non-trivial on random vectors.
    Rows-only + numpy-oracle pytest (test_clustering.py)."""
    from ..stages.clustering import semdedup
    ds = read_scaled(f"{sf_dir}/embeddings.parquet",
                     columns=["vec_id", "embedding"])
    return _to_table(semdedup(ds, k=8, eps=0.6, iters=4))


def q_dup_ngrams(sf_dir: str) -> pa.Table:
    """Per-document duplicated-span fraction (Lee et al. 2021 exact
    substring dedup readout): share of each doc's word 5-gram occurrences
    whose gram appears in ≥2 distinct documents. Distributed df fold +
    broadcast dup-gram set (dual path above 5M grams)."""
    from ..stages.sampling import dup_ngram_fraction
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])
    return _to_table(dup_ngram_fraction(ds, n=5))


def q_dedup_spans(sf_dir: str) -> pa.Table:
    """Exact duplicated-span REMOVAL (Lee et al. 2021 ExactSubstr cleaning
    step): every occurrence of a word 5-gram with ≥2 total occurrences
    corpus-wide is cut out of the text; kept tokens re-join with single
    spaces."""
    from ..stages.sampling import remove_dup_spans
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])
    return _to_table(remove_dup_spans(ds, n=5))


def q_bpe_vocab(sf_dir: str) -> pa.Table:
    """Distributed BPE tokenizer induction (Sennrich 2016): one corpus
    pass builds the exact capped word histogram; the classic merge loop
    runs on the driver over the histogram only (the standard shape —
    tokenizer training never re-reads the corpus). Deterministic;
    rows-only + naive-recount oracle pytest (test_bpe.py)."""
    from ..stages.bpe import bpe_train
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])
    return _finalize(bpe_train(ds, n_merges=120))


def q_bpe_tokens(sf_dir: str) -> pa.Table:
    """Per-doc token counts under the corpus-trained BPE vocabulary:
    merge table broadcast once; the actor-pool counter encodes each
    batch's DISTINCT words (cached across batches) and scatters counts
    to rows. Rows-only + driver-side encode oracle pytest."""
    from ..stages.bpe import bpe_token_counts, bpe_train
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])
    merges = bpe_train(ds, n_merges=120)
    return _to_table(bpe_token_counts(ds, merges))


def q_token_budget(sf_dir: str) -> pa.Table:
    """Token-budget mixture sampling: per source, keep docs in
    deterministic hash order until the source's whitespace-token budget
    fills (inclusive running-total rule). Exact DuckDB window oracle."""
    from ..stages.sampling import token_budget_sample
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "source", "text"])
    # sort for a deterministic output row order (driver hashes row order)
    return _to_table(token_budget_sample(
        ds, budgets={"src0": 3000, "src1": 1500},
        default_budget=800)).sort_by("doc_id")


def q_sample_global(sf_dir: str) -> pa.Table:
    """Deterministic global uniform fixed-N sample (ORDER BY id-hash
    LIMIT n without a sort shuffle — bounded partial-top-n fold)."""
    from ..stages.sampling import sample_global_n
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "source"])
    return _to_table(sample_global_n(ds, n=100))


BLOCKLIST = ["slow", "error"]


def q_blocklist(sf_dir: str) -> pa.Table:
    """C4-style badword filter: drop docs containing any blocklist
    token (exact lowercase token match)."""
    from ..stages.textstats import blocklist_filter
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "source", "text"])
    out = blocklist_filter(ds, BLOCKLIST)

    def proj(t: pa.Table) -> pa.Table:
        return t.select(["doc_id", "source"])
    return _to_table(out.map_batches(proj, batch_format="pyarrow"))


def q_conv_dedup(sf_dir: str) -> pa.Table:
    """Conversation-level exact dedup composite: rebuild each
    conversation's document (ordered turn concat) then keep the min
    conv_id per identical document — two keyed shuffles end-to-end
    (conv concat, then doc-keyed dedup), no driver materialization.
    The dedup shuffles 64-bit doc hashes, not the reconstructed docs
    (exact_dedup by_hash — the 100 TB path; collision odds ~n²/2⁶⁵)."""
    from ..stages.aggregate import concat_group_text
    from ..stages.dedup import exact_dedup
    tdir = ensure_transcripts(sf_dir)
    ds = read_transcripts(tdir, columns=["conv_id", "turn_idx", "text"])
    docs = concat_group_text(ds, key="conv_id", order_col="turn_idx")
    return _to_table(exact_dedup(docs, text_col="doc", id_col="conv_id",
                                 by_hash=True)
                     .select_columns(["conv_id"]))


def q_zscore(sf_dir: str) -> pa.Table:
    """Per-event-type z-score outliers (|value − μ| > 3σ_pop): bounded
    per-key moment partials → driver fold → broadcast filter pass."""
    from ..stages.aggregate import zscore_outliers
    ds = read_scaled(f"{sf_dir}/events.parquet",
                     columns=["event_id", "event_type", "value"])
    return _to_table(zscore_outliers(ds, z=3.0))


def q_funnel(sf_dir: str) -> pa.Table:
    """view→click→purchase conversion funnel per user (each step strictly
    after the previous): one keyed shuffle, vectorized per-bucket
    groupby-min cascade."""
    from ..stages.aggregate import funnel_steps
    ds = read_scaled(f"{sf_dir}/events.parquet",
                     columns=["user_id", "event_type", "ts"])
    return _to_table(funnel_steps(ds, ["view", "click", "purchase"]))


def q_ewma(sf_dir: str) -> pa.Table:
    """Per-user EWMA of event value along (ts, event_id) order — the
    streaming anomaly-baseline recurrence; rows-only (no SQL form) +
    pandas-oracle pytest."""
    from ..stages.aggregate import ewma_by_key
    ds = read_scaled(f"{sf_dir}/events.parquet",
                     columns=["event_id", "ts", "user_id", "value"])
    out = ewma_by_key(ds, key="user_id", order_cols=("ts", "event_id"))

    def proj(t: pa.Table) -> pa.Table:
        return t.select(["event_id", "user_id", "ewma"])
    return _to_table(out.map_batches(proj, batch_format="pyarrow"))


def q_pca(sf_dir: str) -> pa.Table:
    """Distributed PCA over the embeddings table: one pass of O(d²)
    Gram/mean partials → driver eigh; output = per-vector projection
    onto the top-4 components. Rows-only + numpy-oracle pytest."""
    from ..stages.clustering import pca_fit, pca_transform
    ds = read_scaled(f"{sf_dir}/embeddings.parquet",
                     columns=["vec_id", "embedding"])
    comps, mean, _ = pca_fit(ds, n_components=4)
    out = pca_transform(ds, comps, mean)

    def explode(t: pa.Table) -> pa.Table:
        # long form (vec_id, dim, value): hash-friendly flat schema
        arr = t["pca"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        k = 4
        ids = pc.cast(t["vec_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, k)),
            "dim": pa.array(np.tile(np.arange(1, k + 1), len(ids))),
            "val": pa.array(flat, pa.float64()),
        })
    return _to_table(out.map_batches(explode, batch_format="pyarrow"))


def q_sq8(sf_dir: str) -> pa.Table:
    """Int8 scalar quantization of embeddings (FAISS SQ8 analogue):
    per-dim [min,max] fold + broadcast quantize pass; long-form output.
    Rows-only + roundtrip-error pytest."""
    from ..stages.similarity import sq8_quantize
    ds = read_scaled(f"{sf_dir}/embeddings.parquet",
                     columns=["vec_id", "embedding"])
    out = sq8_quantize(ds)

    def explode(t: pa.Table) -> pa.Table:
        arr = t["sq8"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        ids = pc.cast(t["vec_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        k = int(offs[1] - offs[0]) if len(offs) > 1 else 0
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, k)),
            "dim": pa.array(np.tile(np.arange(1, k + 1), len(ids))),
            "code": pa.array(flat.astype(np.int64)),
        })
    return _to_table(out.map_batches(explode, batch_format="pyarrow"))


def q_bloom_decontaminate(sf_dir: str) -> pa.Table:
    """Bloom-filter decontamination (probabilistic sibling of
    `decontaminate`): build the filter over eval-doc texts (doc_id%20==0)
    at O(1) memory, drop corpus docs that are possible members. No false
    negatives (every true contaminant is dropped); a ~1e-4 FPR of clean
    docs may be over-dropped — rows-only + FPR pytest."""
    from ..stages.bloom import bloom_build, bloom_filter_rows
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])

    def side(want_eval):
        def fn(b: pa.Table) -> pa.Table:
            ids = pc.cast(b["doc_id"], pa.int64())
            mod = pc.subtract(ids, pc.multiply(pc.divide(ids, 20), 20))
            m = pc.equal(mod, 0) if want_eval else pc.not_equal(mod, 0)
            return b.filter(m)
        return fn

    evald = ds.map_batches(side(True), batch_format="pyarrow")
    corpus = ds.map_batches(side(False), batch_format="pyarrow")
    bits = bloom_build(evald, "text", m_bits=1 << 20, k=4)
    out = bloom_filter_rows(corpus, bits, "text", negate=True)

    def proj(t: pa.Table) -> pa.Table:
        return t.select(["doc_id"])
    return _to_table(out.map_batches(proj, batch_format="pyarrow"))


def q_keyword_search(sf_dir: str) -> pa.Table:
    """Inverted-index build + partition-pruned keyword lookup: postings
    hash-partitioned by token; the search reads ONE partition of the
    index, never the corpus. Oracled vs a token-membership scan."""
    import shutil
    from ..stages.index import build_inverted_index, search_index
    from ..datagen import sf_tag_of_dir
    root = f"/tmp/rsyslog_ray_out/index_{sf_tag_of_dir(sf_dir)}"
    shutil.rmtree(root, ignore_errors=True)
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])
    build_inverted_index(ds, root)
    return _finalize(search_index(root, "slow"))


def q_chunk_docs(sf_dir: str) -> pa.Table:
    """Overlapping character-window chunking (RAG pre-processing):
    size-128 windows every 96 chars, vectorized explode."""
    from ..stages.sampling import chunk_documents
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])
    return _to_table(chunk_documents(ds, size=128, stride=96))


def q_decontaminate_frac(sf_dir: str) -> pa.Table:
    """GPT-3-style fractional decontamination: drop corpus docs whose
    eval-set 5-gram overlap ratio is ≥ 0.2 (vs the any-hit rule of
    `decontaminate`)."""
    from ..stages.sampling import decontaminate_frac
    ds = read_scaled(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"])

    def side(want_eval: bool):
        def fn(b: pa.Table) -> pa.Table:
            ids = pc.cast(b["doc_id"], pa.int64())
            mod = pc.subtract(ids, pc.multiply(pc.divide(ids, 20), 20))
            mask = pc.equal(mod, 0) if want_eval else pc.not_equal(mod, 0)
            return b.filter(mask)
        return fn

    evald = ds.map_batches(side(True), batch_format="pyarrow")
    corpus = ds.map_batches(side(False), batch_format="pyarrow")
    out = decontaminate_frac(corpus, evald, n=5, frac=0.2)

    def proj(t: pa.Table) -> pa.Table:
        return t.select(["doc_id"])
    return _to_table(out.map_batches(proj, batch_format="pyarrow"))


def q_mmexternal(sf_dir: str) -> pa.Table:
    """mmexternal end-to-end through Ray (plugins/mmexternal/mmexternal.c):
    an external Python filter reads each raw message line on stdin and
    replies {"$!":{"mlen":<char length>}}; the engine merges the reply
    into the JSON tree via the MsgSetPropsViaJSON path.  SQL-oracled:
    mlen must equal LENGTH(text).

    Scale shape: one warm child per map_batches actor (spawned in
    __init__), batch pipelined through the pipe by a writer thread — the
    subprocess round-trip is the inherent cost of the external-plugin
    protocol, identical to the reference's worker-instance model.  The
    filter script lives on local disk; on a multi-node cluster it ships
    via runtime_env/shared storage (single-node here).
    """
    import os
    import sys
    import textwrap

    from ..functions import json_get
    from ..stages.external import MMExternal

    tdir = ensure_transcripts(sf_dir)
    script = "/tmp/rsyslog_ray_out/mmexternal_len.py"
    os.makedirs(os.path.dirname(script), exist_ok=True)
    with open(script, "w") as f:
        f.write(f"#!{sys.executable}\n" + textwrap.dedent("""\
            import json, sys
            for line in sys.stdin:
                n = len(line.rstrip("\\n"))
                sys.stdout.write('{"$!":{"mlen":%d}}\\n' % n)
                sys.stdout.flush()
        """))
    os.chmod(script, 0o755)

    ds = read_transcripts(tdir, columns=["conv_id", "turn_idx", "text"])
    enriched = ds.map_batches(
        MMExternal,
        fn_constructor_kwargs={"binary": script,
                               "interface_input": "rawmsg"},
        batch_format="pyarrow", concurrency=(1, 8), batch_size=4096)

    def proj(b: pa.Table) -> pa.Table:
        mlen = pc.cast(json_get(pc.cast(b["cee_json"], pa.string()),
                                "mlen"), pa.int64())
        return pa.table({
            "conv_id": b["conv_id"],
            "turn_idx": pc.cast(b["turn_idx"], pa.int64()),
            "mlen": mlen,
        })
    return _to_table(enriched.map_batches(proj, batch_format="pyarrow"))


def q_omprog(sf_dir: str) -> pa.Table:
    """omprog end-to-end through Ray (plugins/omprog/omprog.c): every raw
    message feeds an external consumer via the confirm protocol; the
    consumer rejects lines containing 'error' and OKs the rest, so the
    confirmation column is SQL-oracled (confirmed = text NOT LIKE
    '%error%').  Same subprocess actor-pool shape as mmexternal."""
    import os
    import sys
    import textwrap

    from ..stages.external import OmProg

    tdir = ensure_transcripts(sf_dir)
    script = "/tmp/rsyslog_ray_out/omprog_consumer.py"
    os.makedirs(os.path.dirname(script), exist_ok=True)
    with open(script, "w") as f:
        f.write(f"#!{sys.executable}\n" + textwrap.dedent("""\
            import sys
            print("OK"); sys.stdout.flush()
            for line in sys.stdin:
                ok = "error" not in line
                sys.stdout.write("OK\\n" if ok else "REJECT\\n")
                sys.stdout.flush()
        """))
    os.chmod(script, 0o755)

    ds = read_transcripts(tdir, columns=["conv_id", "turn_idx", "text"])
    fed = ds.map_batches(
        OmProg,
        fn_constructor_kwargs={"binary": script, "template": "%rawmsg%",
                               "confirm_messages": True},
        batch_format="pyarrow", concurrency=(1, 8), batch_size=4096)

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": b["conv_id"],
            "turn_idx": pc.cast(b["turn_idx"], pa.int64()),
            "confirmed": b["omprog_confirmed"],
        })
    return _to_table(fed.map_batches(proj, batch_format="pyarrow"))
