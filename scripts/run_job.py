"""Resumable flagship job — the `ray job submit` entry point.

    ray job submit --working-dir /root/repo -- \
        python scripts/run_job.py --input <transcripts_dir_or_tag> \
            --out /tmp/rsyslog_ray_out/job [--wave-size 16]

Kill it at any point; re-submitting the same command resumes from the
per-shard lineage manifest without recomputing completed shards
(rsyslog DA-queue durability analogue — rsyslog_ray/state/checkpoint.py).
Standalone runs work too (Ray Data auto-inits; guarded explicit init for
a clean num_cpus override).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/rsyslog_ray_out/job")
    ap.add_argument("--wave-size", type=int, default=16)
    ap.add_argument("--fail-after-waves", type=int, default=None,
                    help="inject a crash after N committed waves (demo/test)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from rsyslog_ray.datagen import ensure_transcripts
    from rsyslog_ray.pipelines.flagship import CANONICAL_RULESET
    from rsyslog_ray.state.checkpoint import run_resumable

    input_dir = ensure_transcripts(args.input)
    summary = run_resumable(input_dir, args.out, CANONICAL_RULESET,
                            wave_size=args.wave_size,
                            fail_after_waves=args.fail_after_waves)
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
