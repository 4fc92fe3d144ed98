"""The engine's single source (SURVEY §2.1): Parquet transcripts.

Replaces every im* wire input — `ray.data.read_parquet` with two scale
disciplines:

- **Prune at the read**: pass `columns=` so only needed columns leave
  storage (callers that just need conv/turn/ts must not pay for `text`).
- **Split small file sets**: read tasks default to one-per-file; a
  600k-row table in 3 files caps read parallelism at 3 and was measured
  to dominate wall time (2s of a 3.3s run at 32 cpus). When the file
  count is below the cluster width we ask for row-group-granular
  splitting via override_num_blocks; with many files (the 100 TB case)
  the default block planning is already right and we leave it alone.
"""

from __future__ import annotations

import glob
import os

import ray
import ray.data as rd


def read_scaled(path: str, columns: list[str] | None = None,
                num_blocks: int | None = None):
    """read_parquet with read-splitting sized to the cluster (works for a
    directory of part files or a single .parquet file)."""
    if num_blocks is None:
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        n_files = (1 if path.endswith(".parquet")
                   else len(glob.glob(os.path.join(path, "*.parquet"))) or 1)
        if n_files < 2 * cpus:
            num_blocks = 2 * cpus
    kw = {}
    if num_blocks is not None:
        kw["override_num_blocks"] = num_blocks
    return rd.read_parquet(path, columns=columns, **kw)


read_transcripts = read_scaled
