"""E2E conformance: engine routed sinks vs oracle (counts, row sets,
rendered text equality under (conv_id, turn_idx) order) — the seq_check /
content_check analogue (tests/diag.sh:1352)."""

import os

import pyarrow as pa
import pyarrow.dataset as pads
import pytest
import ray.data as rd

from rsyslog_ray.lookup import ROLE_FACILITY, TOOL_CLASS
from rsyslog_ray.pipelines.flagship import CANONICAL_RULESET
from rsyslog_ray.stages.enrich import enrich_with_lookups, mmjsonparse_table
from rsyslog_ray.stages.parse import parse_dataset, parse_table
from rsyslog_ray.stages.route import execute_and_write, route_table
from rsyslog_ray.stages.enrich import LookupEnrich
from tests import oracle as O


@pytest.fixture(scope="module")
def oracle_result(tiny_table):
    return O.run_oracle(tiny_table)


@pytest.fixture(scope="module")
def engine_sinks(tiny_table, tmp_path_factory):
    out_root = str(tmp_path_factory.mktemp("sinks"))
    ds = rd.from_arrow(tiny_table).repartition(4)
    ds = parse_dataset(ds, batch_size=256)
    ds = ds.map_batches(mmjsonparse_table, batch_format="pyarrow")
    ds = enrich_with_lookups(
        ds, [("role_fac", "role", ROLE_FACILITY),
             ("tool_class", "tool", TOOL_CLASS)], concurrency=1)
    counts = execute_and_write(ds, CANONICAL_RULESET, out_root,
                               batch_size=256, concurrency=1)
    return out_root, counts


def _read_sink(root, name):
    d = os.path.join(root, name)
    if not os.path.isdir(d):
        return pa.table({})
    return pads.dataset(d, format="parquet").to_table()


def test_sink_counts(engine_sinks, oracle_result):
    _, counts = engine_sinks
    for sink in ("errors", "files", "cee"):
        assert counts[sink] == len(oracle_result.sinks[sink]), sink


def test_routed_row_sets_and_text(engine_sinks, oracle_result):
    root, _ = engine_sinks
    for sink in ("errors", "files", "cee"):
        t = _read_sink(root, sink)
        keys = set(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()))
        assert keys == oracle_result.sink_keys(sink), sink
        got = [r for _, r in sorted(
            zip(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()),
                t["rendered"].to_pylist()))]
        assert got == oracle_result.sink_rendered_sorted(sink), sink


def test_dynafile_partitioning(engine_sinks):
    """files sink is partitioned by facility (dynafile analogue)."""
    root, _ = engine_sinks
    d = os.path.join(root, "files")
    parts = sorted(os.listdir(d))
    assert parts and all(p.startswith("facility=") for p in parts)
    for p in parts:
        fac = int(p.split("=")[1])
        t = pads.dataset(os.path.join(d, p), format="parquet").to_table()
        assert set(t["facility"].to_pylist()) == {fac}
        assert 16 <= fac <= 23


def test_stop_semantics(tiny_table, oracle_result):
    """discarded rows (severity 7 + system role) reach NO later sink."""
    parsed = parse_table(tiny_table)
    parsed = mmjsonparse_table(parsed)
    parsed = LookupEnrich([
        ("role_fac", "role", ROLE_FACILITY),
        ("tool_class", "tool", TOOL_CLASS)])(parsed)
    routed = route_table(parsed, CANONICAL_RULESET)
    discarded = {(r.conv_id, r.turn_idx) for r in oracle_result.rows
                 if r.severity == 7 and r.role == "system"}
    assert discarded  # fixture must exercise the path
    for sink, tbl in routed.items():
        keys = set(zip(tbl["conv_id"].to_pylist(), tbl["turn_idx"].to_pylist()))
        assert not (keys & discarded), sink


def test_input_metric_counts_dropped(engine_sinks, oracle_result, tiny_table):
    _, counts = engine_sinks
    assert counts["_input"] == len(oracle_result.rows)
    assert tiny_table.num_rows - counts["_input"] == oracle_result.dropped_empty


def test_compact_partitions_preserves_rows(ray_session, tmp_path):
    import glob
    import pyarrow.parquet as pq
    from rsyslog_ray.stages.route import compact_partitions
    d = tmp_path / "sink" / "fac=7"
    d.mkdir(parents=True)
    total = 0
    for i in range(20):                      # 20 small part files
        t = pa.table({"x": pa.array(range(i * 10, i * 10 + 10), pa.int64())})
        pq.write_table(t, d / f"part-{i:04d}.parquet")
        total += t.num_rows
    res = compact_partitions(str(tmp_path), "sink", max_files_per_dir=4)
    files = glob.glob(str(d / "part-*.parquet"))
    assert len(files) < 20
    merged = pa.concat_tables([pq.read_table(f) for f in files])
    assert merged.num_rows == total
    assert sorted(merged["x"].to_pylist()) == list(range(total))
    (before, after) = res[str(d)]
    assert before == 20 and after == len(files)


def test_compact_partitions_multi_chunk_preserves_rows(ray_session, tmp_path):
    """target_rows_per_file small enough to force n_out > 1: chunks are
    zero-copy slices sharing buffers, so per-chunk names must differ or
    later renames destroy earlier chunks (round-3 ADVICE fix)."""
    import glob
    import pyarrow.parquet as pq
    from rsyslog_ray.stages.route import compact_partitions
    d = tmp_path / "sink" / "fac=3"
    d.mkdir(parents=True)
    total = 0
    for i in range(10):
        t = pa.table({"x": pa.array(range(i * 25, i * 25 + 25), pa.int64())})
        pq.write_table(t, d / f"part-{i:04d}.parquet")
        total += t.num_rows
    res = compact_partitions(str(tmp_path), "sink", max_files_per_dir=4,
                             target_rows_per_file=60)   # 250 rows → 5 chunks
    files = glob.glob(str(d / "part-*.parquet"))
    assert len(files) == 5
    merged = pa.concat_tables([pq.read_table(f) for f in files])
    assert merged.num_rows == total
    assert sorted(merged["x"].to_pylist()) == list(range(total))
    (before, after) = res[str(d)]
    assert before == 10 and after == 5


def test_text_sink_writes_rendered_lines(ray_session, tmp_path):
    import glob
    import ray.data as rd
    from rsyslog_ray.stages.route import Action, RouteWriter, Ruleset
    rs = Ruleset("m", [Action("logs", template="%msg%\n", format="text")])
    batch = pa.table({"msg": pa.array(["line one", "line two"]),
                      "conv_id": pa.array(["c1", "c2"]),
                      "turn_idx": pa.array([0, 1], pa.int32()),
                      "hostname": pa.array(["h", "h"]),
                      "tag": pa.array(["", ""]),
                      "appname": pa.array(["a", "a"])})
    w = RouteWriter(rs, str(tmp_path))
    w(batch)
    files = glob.glob(str(tmp_path / "logs" / "part-*.log"))
    assert len(files) == 1
    assert open(files[0]).read() == "line one\nline two\n"


def test_text_sink_zip_level(ray_session, tmp_path):
    import glob
    import gzip
    from rsyslog_ray.stages.route import Action, RouteWriter, Ruleset
    rs = Ruleset("m", [Action("logs", template="%msg%\n", format="text",
                              zip_level=6)])
    batch = pa.table({"msg": pa.array(["alpha", "beta"]),
                      "conv_id": pa.array(["c1", "c2"]),
                      "turn_idx": pa.array([0, 1], pa.int32()),
                      "hostname": pa.array(["h", "h"]),
                      "tag": pa.array(["", ""]),
                      "appname": pa.array(["a", "a"])})
    RouteWriter(rs, str(tmp_path))(batch)
    files = glob.glob(str(tmp_path / "logs" / "part-*.log.gz"))
    assert len(files) == 1
    assert gzip.open(files[0], "rt").read() == "alpha\nbeta\n"
