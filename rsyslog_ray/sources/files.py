"""File sources beyond Parquet — the literal imfile analogues.

The reference's imfile tails flat log files (readMode=0 line-per-msg) and
its JSON pipelines consume line-delimited JSON; here both are thin
wrappers over Ray Data's native streaming readers, so 100 TB of raw logs
shard and pipeline exactly like the Parquet path:

- read_syslog_text: raw .log files → one `text` column (one row per
  line, imfile line mode), ready for the parse chain
  (`stages/parse.parse_dataset`). Encoding repair for dirty inputs is a
  `mmutf8fix` stage on top, matching the reference's module order.
- read_jsonl: line-delimited JSON files → typed columns (the imfile +
  mmjsonparse fast path for already-structured logs).

Both accept a path, a directory, or a list of paths; Ray's reader plans
one task per file/partition and streams blocks with backpressure —
nothing is materialized at the source.
"""

from __future__ import annotations

import ray.data as rd


def read_syslog_text(paths, include_path: bool = False):
    """Raw log file(s) → Dataset with a `text` column, one row per line
    (imfile readMode=0). include_path=True adds the source file path as a
    `path` column (the imfile `metadata` option / $!metadata!filename),
    which also gives resumable runs their shard identity."""
    ds = rd.read_text(paths, include_paths=include_path)

    def rename(batch):
        cols = {"text": batch["text"]}
        if include_path:
            cols["path"] = batch["path"]
        import pyarrow as pa
        return pa.table(cols)
    return ds.map_batches(rename, batch_format="pyarrow")


def read_jsonl(paths, **read_kwargs):
    """Line-delimited JSON file(s) → typed Dataset (Arrow JSON reader —
    C++-speed parse, schema inferred or passed via read_kwargs)."""
    return rd.read_json(paths, **read_kwargs)
