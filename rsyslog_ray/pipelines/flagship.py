"""The canonical conformance pipeline (FIXTURES.md §4) — the flagship.

    read transcripts parquet
      → sanitize + parse cascade        (stages/parse.py, stateless tasks)
      → mmjsonparse (@cee)              (stages/enrich.py)
      → lookup enrichment               (actor pool, broadcast dicts)
      → ruleset: [discard(stop), errors, files(dynafile by facility), cee]
      → per-sink Parquet writes (single pass) + impstats metrics
      → aggregates: per-(facility,severity) counts, per-conv rollups

Ruleset order matters: `stop` precedes the sinks so discarded rows never
reach them (runtime/ruleset.c:596 S_STOP kills only LATER actions).
"""

from __future__ import annotations

import ray
import ray.data as rd


def auto_pool_size(frac: float = 1.0, lo: int = 1, hi: int = 64) -> tuple[int, int]:
    """Autoscaling actor-pool bounds (min=1, max=frac·CPUs).

    max defaults to the FULL CPU count: Ray Data fuses the upstream stateless
    parse/mmjsonparse tasks INTO the actor stage (task→actor fusion), so the
    pool's max is the parallelism ceiling of the whole parse+enrich chain —
    capping it at a fraction of the cluster caps pipeline throughput at that
    fraction (measured: 0.25 ⇒ scaling efficiency 0.19 at 8→32 cpus).
    min=1 keeps actor cold-start off the critical path of short runs; the
    pool only upscales while batches queue. Fixed full-size pools (the
    earlier design) deadlocked at num_cpus=8 — autoscaling min=1 avoids
    reserving every CPU up front."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return (1, max(lo, min(hi, int(cpus * frac))))

from ..datagen import ensure_transcripts
from ..lookup import ROLE_FACILITY, TOOL_CLASS
from ..stages.aggregate import conv_rollup, facility_severity_counts
from ..stages.enrich import enrich_with_lookups, mmjsonparse_table
from ..stages.parse import parse_dataset
from ..stages.route import Action, Ruleset, apply_stops, execute_and_write

CEE_JSON_TEMPLATE = (
    '{"ts":"%TIMESTAMP:::date-rfc3339%","host":"%HOSTNAME:::json%",'
    '"tag":"%syslogtag:::json%","role":"%role:::json%",'
    '"cee":%cee_json%}'
)

CANONICAL_RULESET = Ruleset("canonical", [
    # discard first: severity==7 and role=="system"  → stop (`~`)
    Action("discard",
           filter=("and", ("==", ("prop", "syslogseverity"), 7),
                   ("==", ("prop", "role"), "system")),
           kind="stop"),
    # sink A: errors (severity <= 3), ForwardFormat
    Action("errors",
           filter=("<=", ("prop", "syslogseverity"), 3),
           template="RSYSLOG_ForwardFormat"),
    # sink B: msg contains msgnum: AND facility local0..local7, FileFormat,
    # partitioned by facility (dynafile analogue)
    Action("files",
           filter=("and", ("contains", ("prop", "msg"), "msgnum:"),
                   ("in", ("prop", "syslogfacility"), list(range(16, 24)))),
           template="RSYSLOG_FileFormat",
           partition_by="facility"),
    # sink C: CEE rows that parsed, JSON template
    Action("cee",
           filter=("and", ("prop", "is_cee"), ("prop", "cee_parsesuccess")),
           template=CEE_JSON_TEMPLATE),
])


def build_parsed_dataset(transcripts_dir: str, parallelism: int = -1,
                         concurrency=None, batch_size: int = 16384):
    """read → parse → mmjsonparse → lookup-enrich (lazy)."""
    from ..sources import read_transcripts
    ds = read_transcripts(transcripts_dir)
    return parsed_stages(ds, concurrency=concurrency, batch_size=batch_size)


def parsed_stages(ds, concurrency=None, batch_size: int = 16384):
    """parse → mmjsonparse → lookup-enrich over an existing Dataset (used by
    both the plain flagship run and the resumable checkpointed runner)."""
    ds = parse_dataset(ds, batch_size=batch_size)
    ds = ds.map_batches(mmjsonparse_table, batch_format="pyarrow",
                        batch_size=batch_size)
    ds = enrich_with_lookups(
        ds,
        [("role_fac", "role", ROLE_FACILITY),
         ("tool_class", "tool", TOOL_CLASS)],
        concurrency=concurrency or auto_pool_size(), batch_size=batch_size)
    return ds


def run_flagship(sf_dir_or_tag: str, out_root: str,
                 batch_size: int = 16384, concurrency=None) -> dict:
    """End-to-end single-pass parse→enrich→route→write. Returns the
    impstats-style routed-count metrics dict."""
    tdir = ensure_transcripts(sf_dir_or_tag)
    ds = build_parsed_dataset(tdir, batch_size=batch_size,
                              concurrency=concurrency)
    return execute_and_write(ds, CANONICAL_RULESET, out_root,
                             batch_size=batch_size)


def run_aggregates(sf_dir_or_tag: str, batch_size: int = 65536):
    """The aggregate branches (separate consumption of the lazy pipeline)."""
    tdir = ensure_transcripts(sf_dir_or_tag)
    ds = build_parsed_dataset(tdir, batch_size=batch_size)
    return {
        # fac_sev sits AFTER the stop statement (alive rows only);
        # conv_rollup covers all parsed rows (placement per FIXTURES §4)
        "fac_sev": facility_severity_counts(apply_stops(ds, CANONICAL_RULESET)),
        "conv_rollup": conv_rollup(ds),
    }
