"""Declarative config loader: the JSON pipeline spec must reproduce the
hand-built flagship exactly (counts + routed row sets)."""

import glob
import os

import pyarrow.parquet as pq

from rsyslog_ray.config import load_config, register_stage, STAGE_REGISTRY
from rsyslog_ray.pipelines.flagship import CEE_JSON_TEMPLATE, run_flagship

FLAGSHIP_CFG = {
    "templates": {"cee_json": CEE_JSON_TEMPLATE},
    "lookup_tables": {
        "role_fac": {"type": "string", "nomatch": "unknown",
                     "table": [{"index": "user", "value": "local0"},
                               {"index": "assistant", "value": "local1"},
                               {"index": "system", "value": "daemon"},
                               {"index": "tool", "value": "local7"}]},
        "tool_class": {"type": "string", "nomatch": "unclassified",
                       "table": [{"index": "bash", "value": "exec"},
                                 {"index": "search", "value": "net"},
                                 {"index": "editor", "value": "fs"},
                                 {"index": "", "value": "none"}]},
    },
    "modifiers": ["mmjsonparse"],
    "enrich": [{"out": "role_fac", "key": "role", "table": "role_fac"},
               {"out": "tool_class", "key": "tool", "table": "tool_class"}],
    "ruleset": {"name": "canonical", "actions": [
        {"name": "discard", "kind": "stop",
         "filter": ["and", ["==", ["prop", "syslogseverity"], 7],
                    ["==", ["prop", "role"], "system"]]},
        {"name": "errors",
         "filter": ["<=", ["prop", "syslogseverity"], 3],
         "template": "RSYSLOG_ForwardFormat"},
        {"name": "files",
         "filter": ["and", ["contains", ["prop", "msg"], "msgnum:"],
                    ["in", ["prop", "syslogfacility"], list(range(16, 24))]],
         "template": "RSYSLOG_FileFormat", "partition_by": "facility"},
        {"name": "cee",
         "filter": ["and", ["prop", "is_cee"], ["prop", "cee_parsesuccess"]],
         "template": "cee_json"},
    ]},
}


def _rows(root, action):
    files = glob.glob(os.path.join(root, action, "**", "*.parquet"),
                      recursive=True)
    out = set()
    for f in files:
        t = pq.read_table(f, columns=["conv_id", "turn_idx", "rendered"])
        out |= set(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist(),
                       t["rendered"].to_pylist()))
    return out


def test_config_reproduces_flagship(ray_session, tmp_path):
    ref_out = str(tmp_path / "ref")
    cfg_out = str(tmp_path / "cfg")
    ref_counts = run_flagship("/root/testdata/sf0.001", ref_out)
    cfg = load_config(FLAGSHIP_CFG)
    cfg_counts = cfg.run("/root/testdata/sf0.001", cfg_out)
    assert cfg_counts == ref_counts
    for action in ("errors", "files", "cee"):
        assert _rows(cfg_out, action) == _rows(ref_out, action), action


def test_config_json_roundtrip_and_registry(ray_session, tmp_path):
    import json
    cfg = load_config(json.dumps(FLAGSHIP_CFG))   # JSON-string path
    assert [a.name for a in cfg.ruleset.actions] == [
        "discard", "errors", "files", "cee"]

    @register_stage("mm_testmark")
    def mark(batch):
        import pyarrow as pa
        return batch.append_column("marked", pa.array([True] * batch.num_rows))
    assert STAGE_REGISTRY["mm_testmark"] is mark
    cfg2 = load_config({"modifiers": ["mm_testmark"], "parse": False,
                        "ruleset": {"actions": [{"name": "all"}]}})
    import ray.data as rd
    import pyarrow as pa
    ds = rd.from_arrow(pa.table({"x": [1, 2]}))
    out = cfg2.build(ds).take_all()
    assert all(r["marked"] for r in out)
