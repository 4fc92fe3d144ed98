"""Checkpoint / resume: per-shard lineage manifest + idempotent sinks.

The reference's durability contract is the disk-assisted queue: state is
persisted (`.qi` + queue stream files, runtime/queue.c:835-926, persist
:2620) so a killed daemon resumes without replaying delivered messages.
Ray gives task retry and object spilling WITHIN a job; cross-job resume is
ours to own (SURVEY §4 "Needs design"):

- Unit of recovery = one input shard (one Parquet part file). Natural at
  100 TB: the input is thousands of files; lineage is file-granular.
- A run processes pending shards in WAVES (wave_size shards per Dataset
  pass, all stages streaming inside the wave). After a wave completes, one
  manifest JSON per shard is committed atomically (tmp→rename) under
  `{out_root}/_manifest/{shard}.json` recording: input file, routed counts
  per action, and the job fingerprint.
- On (re)start: shards with a manifest whose fingerprint matches are
  skipped; partial sink output of unfinished shards (written under
  `{action}/shard={sid}/`) is deleted before reprocessing, so sinks stay
  exactly-once at shard granularity.
- The fingerprint hashes the ruleset structure, so a config change
  invalidates old checkpoints instead of silently mixing outputs.

Worst-case recompute after a kill = one wave.

Single-writer assumption: exactly one job drives an out_root at a time
(same contract as the reference's DA queue directory — one daemon per
`.qi`). Concurrent writers could double-write a shard between clean and
commit; serialize restarts at the `ray job submit` level.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def shard_id_of_path(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


def list_shards(input_dir: str) -> list[tuple[str, str]]:
    """[(shard_id, file_path)] sorted — the lineage universe."""
    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    return [(shard_id_of_path(f), f) for f in files]


def job_fingerprint(ruleset) -> str:
    acts = ruleset.all_actions() if hasattr(ruleset, "all_actions") else ruleset.actions
    spec = [(a.name, a.kind, repr(a.filter), a.template, a.partition_by,
             a.keep_columns, a.only_if_previous_suspended,
             getattr(a, "format", "parquet"))
            for a in acts]
    return hashlib.sha256(json.dumps(spec).encode()).hexdigest()[:16]


def _manifest_dir(out_root: str) -> str:
    return os.path.join(out_root, "_manifest")


def manifest_path(out_root: str, sid: str) -> str:
    return os.path.join(_manifest_dir(out_root), f"{sid}.json")


def done_shards(out_root: str, fingerprint: str) -> dict[str, dict]:
    """{shard_id: manifest} for shards already completed by a compatible job."""
    out = {}
    for f in glob.glob(os.path.join(_manifest_dir(out_root), "*.json")):
        try:
            with open(f) as fh:
                m = json.load(fh)
        except (json.JSONDecodeError, OSError):
            continue  # torn write (no tmp→rename would make this impossible,
            # but be forgiving about foreign files)
        if m.get("fingerprint") == fingerprint and m.get("done"):
            out[m["shard"]] = m
    return out


def commit_manifest(out_root: str, sid: str, record: dict) -> None:
    d = _manifest_dir(out_root)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f"._tmp-{sid}.json")
    with open(tmp, "w") as fh:
        json.dump(record, fh)
    os.rename(tmp, manifest_path(out_root, sid))


def clean_partial_outputs(out_root: str, ruleset, sids: list[str]) -> None:
    """Delete sink output of shards about to be (re)processed — makes the
    shard-level writes idempotent across killed runs."""
    acts = ruleset.all_actions() if hasattr(ruleset, "all_actions") else ruleset.actions
    for a in acts:
        if a.kind != "write":
            continue
        for sid in sids:
            shutil.rmtree(os.path.join(out_root, a.name, f"shard={sid}"),
                          ignore_errors=True)


def _chunks(seq, n):
    for i in range(0, len(seq), n):
        yield seq[i:i + n]


def run_resumable(input_dir: str, out_root: str, ruleset,
                  wave_size: int = 16, batch_size: int = 32768,
                  concurrency=None, fail_after_waves: int | None = None
                  ) -> dict:
    """Resumable flagship-shaped run. Returns summary:
    {counts: {action: rows}, shards_done, shards_skipped, waves}.

    fail_after_waves injects a crash AFTER committing N waves (test hook for
    the kill/resume conformance test — FIXTURES/SURVEY §5c).
    """
    from ..pipelines.flagship import parsed_stages

    fp = job_fingerprint(ruleset)
    shards = list_shards(input_dir)
    done = done_shards(out_root, fp)
    pending = [(sid, f) for sid, f in shards if sid not in done]

    totals: dict[str, int] = {}
    for m in done.values():
        for k, v in m["routed"].items():
            totals[k] = totals.get(k, 0) + v

    waves = 0
    for wave in _chunks(pending, wave_size):
        sids = [sid for sid, _ in wave]
        paths = [f for _, f in wave]
        clean_partial_outputs(out_root, ruleset, sids)

        import ray as _ray
        cpus = (int(_ray.cluster_resources().get("CPU", 8))
                if _ray.is_initialized() else 8)
        kw = ({"override_num_blocks": 2 * cpus}
              if len(paths) < 2 * cpus else {})
        ds = rd.read_parquet(paths, include_paths=True, **kw)

        def add_shard(batch: pa.Table) -> pa.Table:
            sid_arr = pc.replace_substring_regex(
                pc.cast(batch["path"], pa.string()),
                pattern=r"^.*/|\.parquet$", replacement="")
            return batch.drop_columns(["path"]).append_column("_shard", sid_arr)

        ds = ds.map_batches(add_shard, batch_format="pyarrow",
                            batch_size=batch_size)
        ds = parsed_stages(ds, batch_size=batch_size, concurrency=concurrency)
        from ..stages.route import execute_and_write
        counts, per_shard = execute_and_write(
            ds, ruleset, out_root, batch_size=batch_size,
            concurrency=concurrency, shard_col="_shard")

        by_sid: dict[str, dict[str, int]] = {sid: {} for sid in sids}
        for (action, sid), n in per_shard.items():
            by_sid.setdefault(sid, {})[action] = n
        for sid, f in wave:
            commit_manifest(out_root, sid, {
                "shard": sid, "input_file": f, "fingerprint": fp,
                "routed": by_sid.get(sid, {}), "done": True,
            })
        for k, v in counts.items():
            totals[k] = totals.get(k, 0) + v
        waves += 1
        if fail_after_waves is not None and waves >= fail_after_waves:
            raise RuntimeError(f"injected failure after {waves} waves")

    return {"counts": totals, "shards_done": len(pending),
            "shards_skipped": len(done), "waves": waves,
            "fingerprint": fp}
