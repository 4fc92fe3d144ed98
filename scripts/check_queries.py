"""Local driver-mimic: run each queries() entry and its oracle_sql() twin,
compare row count, schema, and order-insensitive values. Usage:

    python scripts/check_queries.py [sf_dir] [query ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import ray

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
only = set(sys.argv[2:])

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext  # noqa: E402
DataContext.get_current().enable_progress_bars = False

from rsyslog_ray.datagen import ensure_transcripts, transcripts_path, sf_tag_of_dir  # noqa: E402
from rsyslog_ray.pipelines.oracle_sql import build_oracle_sql  # noqa: E402
import __ray_entry__ as E  # noqa: E402

tag = sf_tag_of_dir(sf_dir)
ensure_transcripts(sf_dir)
sqls = build_oracle_sql(transcripts_path(tag) + "/part-*.parquet")

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

qs = E.queries()
fails = []
import time as _time
for name, fn in qs.items():
    if only and name not in only:
        continue
    t0 = _time.monotonic()
    try:
        got = fn(sf_dir)
        gdf = got.to_pandas() if hasattr(got, "to_pandas") else pd.DataFrame(got)
        sql = sqls.get(name)
        if sql is None:
            print(f"{name:20s} rows={len(gdf)} (no oracle — rows-only)"
                  f"  [{_time.monotonic() - t0:.2f}s]")
            continue
        edf = con.execute(sql).df()
        status = []
        if len(gdf) != len(edf):
            status.append(f"ROWCOUNT {len(gdf)} vs {len(edf)}")
        gcols, ecols = sorted(gdf.columns), sorted(edf.columns)
        if gcols != ecols:
            status.append(f"COLS {gcols} vs {ecols}")
        else:
            g = gdf[gcols].sort_values(gcols).reset_index(drop=True)
            e = edf[gcols].sort_values(gcols).reset_index(drop=True)
            for c in gcols:
                gv, ev = g[c], e[c]
                if gv.dtype != ev.dtype:
                    try:
                        ev = ev.astype(gv.dtype)
                    except (TypeError, ValueError):
                        status.append(f"DTYPE {c}: {gv.dtype} vs {ev.dtype}")
                        continue
                if len(g) == len(e):
                    if gv.dtype == object:
                        neq = (gv.fillna("\x01") != ev.fillna("\x01"))
                    elif np.issubdtype(gv.dtype, np.floating):
                        neq = ~np.isclose(gv.fillna(-9e99), ev.fillna(-9e99),
                                          rtol=0, atol=1e-9)
                    else:
                        neq = gv.fillna(-1) != ev.fillna(-1)
                    if neq.any():
                        i = int(np.flatnonzero(np.asarray(neq))[0])
                        status.append(
                            f"VALUE {c}[{i}]: {gv.iloc[i]!r} vs {ev.iloc[i]!r}")
        if status:
            fails.append(name)
            print(f"{name:20s} FAIL: {'; '.join(status[:4])}")
        else:
            print(f"{name:20s} OK rows={len(gdf)}"
                  f"  [{_time.monotonic() - t0:.2f}s]")
    except Exception as ex:  # noqa: BLE001
        fails.append(name)
        print(f"{name:20s} ERROR: {type(ex).__name__}: {str(ex)[:300]}")

print("\nFAILED:", fails if fails else "none")
ray.shutdown()
sys.exit(1 if fails else 0)
