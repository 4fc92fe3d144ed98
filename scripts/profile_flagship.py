"""Per-stage profiling of the flagship pipeline (ds.stats()).

Usage: RAY_GRAFT_CPUS=32 python scripts/profile_flagship.py [tag_or_dir]
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False

from rsyslog_ray.datagen import ensure_transcripts  # noqa: E402
from rsyslog_ray.pipelines.flagship import (  # noqa: E402
    CANONICAL_RULESET, parsed_stages, run_flagship)
from rsyslog_ray.stages.route import RouteWriter  # noqa: E402

tag = sys.argv[1] if len(sys.argv) > 1 else "rows2000000"
tdir = ensure_transcripts(tag)
import pyarrow.dataset as pads  # noqa: E402

n_rows = pads.dataset(tdir).count_rows()

run_flagship("/root/testdata/sf0.001", "/tmp/rsyslog_ray_prof/warmup")

out_root = "/tmp/rsyslog_ray_prof/flagship"
shutil.rmtree(out_root, ignore_errors=True)
t0 = time.perf_counter()
import ray.data as rd  # noqa: E402

ds = parsed_stages(rd.read_parquet(tdir))
metrics = ds.map_batches(RouteWriter(CANONICAL_RULESET, out_root),
                         batch_format="pyarrow", batch_size=16384)
counts: dict = {}
for b in metrics.iter_batches(batch_size=None, batch_format="pyarrow"):
    for a, n in zip(b["action"].to_pylist(), b["rows"].to_pylist()):
        counts[a] = counts.get(a, 0) + n
dt = time.perf_counter() - t0
print(metrics.stats())
print(counts)
print(f"WALL={dt:.2f}s cpus={num_cpus} rows_per_s={n_rows/dt:,.0f}")
ray.shutdown()
