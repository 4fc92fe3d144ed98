"""Checkpoint/resume conformance (SURVEY §5c / §4 DA-queue analogue):
kill after K waves, rerun, assert completed shards are skipped and the
final per-sink outputs equal an uninterrupted run's exactly."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rsyslog_ray.datagen import generate_transcripts
from rsyslog_ray.pipelines.flagship import CANONICAL_RULESET
from rsyslog_ray.state import checkpoint as ckpt

N_SHARDS = 3
ROWS_PER_SHARD = 1000


@pytest.fixture(scope="module")
def sharded_input(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    t = generate_transcripts(N_SHARDS * ROWS_PER_SHARD, seed=7)
    for i in range(N_SHARDS):
        pq.write_table(t.slice(i * ROWS_PER_SHARD, ROWS_PER_SHARD),
                       str(d / f"part-{i:05d}.parquet"))
    return str(d)


def _sink_rows(out_root: str, action: str) -> set[tuple]:
    files = glob.glob(os.path.join(out_root, action, "**", "*.parquet"),
                      recursive=True)
    keys = set()
    for f in files:
        t = pq.read_table(f, columns=["conv_id", "turn_idx"])
        keys |= set(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()))
    return keys


def test_uninterrupted_run_writes_manifests(sharded_input, tmp_path, ray_session):
    out = str(tmp_path / "out")
    summary = ckpt.run_resumable(sharded_input, out, CANONICAL_RULESET,
                                 wave_size=2)
    assert summary["shards_done"] == N_SHARDS
    assert summary["shards_skipped"] == 0
    manifests = glob.glob(os.path.join(out, "_manifest", "*.json"))
    assert len(manifests) == N_SHARDS
    # manifest counts sum to the returned totals
    assert summary["counts"]["_input"] > 0


def test_kill_and_resume_no_recompute(sharded_input, tmp_path, ray_session):
    clean = str(tmp_path / "clean")
    ckpt.run_resumable(sharded_input, clean, CANONICAL_RULESET, wave_size=3)

    out = str(tmp_path / "crashy")
    with pytest.raises(RuntimeError, match="injected failure"):
        ckpt.run_resumable(sharded_input, out, CANONICAL_RULESET,
                           wave_size=1, fail_after_waves=1)
    assert len(glob.glob(os.path.join(out, "_manifest", "*.json"))) == 1

    resumed = ckpt.run_resumable(sharded_input, out, CANONICAL_RULESET,
                                 wave_size=1)
    assert resumed["shards_skipped"] == 1
    assert resumed["shards_done"] == N_SHARDS - 1

    # third run: everything checkpointed, zero work
    third = ckpt.run_resumable(sharded_input, out, CANONICAL_RULESET)
    assert third["shards_skipped"] == N_SHARDS
    assert third["shards_done"] == 0 and third["waves"] == 0

    # routed-row sets identical to the uninterrupted run, per sink
    for a in CANONICAL_RULESET.actions:
        if a.kind != "write":
            continue
        assert _sink_rows(out, a.name) == _sink_rows(clean, a.name), a.name
    # and totals match
    clean_totals = {}
    for f in glob.glob(os.path.join(clean, "_manifest", "*.json")):
        import json
        with open(f) as fh:
            for k, v in json.load(fh)["routed"].items():
                clean_totals[k] = clean_totals.get(k, 0) + v
    assert third["counts"] == clean_totals


def test_fingerprint_invalidates_checkpoints(sharded_input, tmp_path, ray_session):
    from rsyslog_ray.stages.route import Action, Ruleset
    out = str(tmp_path / "out")
    ckpt.run_resumable(sharded_input, out, CANONICAL_RULESET)
    other = Ruleset("other", [Action("everything", filter=None,
                                     template="RSYSLOG_FileFormat")])
    assert ckpt.done_shards(out, ckpt.job_fingerprint(other)) == {}
    summary = ckpt.run_resumable(sharded_input, out, other)
    assert summary["shards_skipped"] == 0
    assert summary["shards_done"] == N_SHARDS
