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


def read_syslog_text(paths, include_path: bool = False,
                     read_mode: int = 0, escape_lf: bool = True,
                     escape_lf_string: str = "#012",
                     startmsg_regex: str | None = None,
                     endmsg_regex: str | None = None):
    """Raw log file(s) → Dataset with a `text` column, one row per
    RECORD. read_mode follows imfile/strmReadLine (runtime/stream.c:886):

    - 0 (default): one record per line — Ray's streaming read_text path,
      tasks shard WITHIN files, nothing is assembled.
    - 1: paragraph mode — records separated by blank lines; inner
      newlines become `escape_lf_string` (escape_lf=True, the reference
      default "#012") or stay literal.
    - 2: indented-continuation mode — a line starting with space/tab
      continues the previous record (the stack-trace shape).
    - startmsg_regex: a record STARTS at each line matching the regex
      (imfile startmsg.regex / strmReadMultiLine); the pre-match
      preamble forms a record of its own. Overrides read_mode.
    - endmsg_regex: a record ENDS at each line matching the regex
      (imfile endmsg.regex — the matching line is the record's LAST
      line); a trailing unterminated segment still emits. Mutually
      exclusive with startmsg_regex, overrides read_mode.

    Multiline modes read per-FILE (rd.read_binary_files → flat assemble):
    a record never spans files — the same per-file statefulness imfile
    has — so parallelism is one task per file; empty records (blank-line
    runs) are dropped, as imfile's enqLine does. include_path=True adds
    the source path column (imfile metadata / shard identity)."""
    import pyarrow as pa

    if startmsg_regex is not None and endmsg_regex is not None:
        raise ValueError(
            "only one of startmsg_regex or endmsg_regex can be set "
            "(imfile.c:1985 rule)")
    if read_mode == 0 and startmsg_regex is None and endmsg_regex is None:
        ds = rd.read_text(paths, include_paths=include_path)

        def rename(batch):
            cols = {"text": batch["text"]}
            if include_path:
                cols["path"] = batch["path"]
            return pa.table(cols)
        return ds.map_batches(rename, batch_format="pyarrow")

    if read_mode not in (0, 1, 2):
        raise ValueError(f"read_mode must be 0/1/2, got {read_mode}")
    esc = escape_lf_string if escape_lf else "\n"

    def assemble(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc
        out_text: list = []
        out_path: list = []
        for payload, path in zip(batch["bytes"].to_pylist(),
                                 batch["path"].to_pylist()):
            lines = np.asarray(
                payload.decode("utf-8", "replace").split("\n"),
                dtype=object)
            n = len(lines)
            if n == 0:
                continue
            if startmsg_regex is not None or endmsg_regex is not None:
                # regex framing keeps INTERIOR empty lines inside a
                # record (strmReadMultiLine accumulates them — the
                # imptcp_framing golden has 'n#012#012e2'); only the
                # final '' artifact of split('\n') on a \n-terminated
                # payload is not a line
                keep = np.ones(n, dtype=bool)
                j = n - 1                  # trailing blank run: the
                while j >= 0 and lines[j] == "":   # split artifact +
                    keep[j] = False                # stream-close blanks
                    j -= 1
                arr = pa.array(lines, pa.string())
                if startmsg_regex is not None:
                    m = pc.match_substring_regex(
                        arr, startmsg_regex).to_numpy(
                            zero_copy_only=False)
                    grp = np.cumsum(m)
                else:
                    m = pc.match_substring_regex(
                        arr, endmsg_regex).to_numpy(zero_copy_only=False)
                    # the matching line closes its record: next line
                    # starts a new group
                    grp = np.concatenate(([0], np.cumsum(m)[:-1]))
            elif read_mode == 1:
                blank = lines == ""
                grp = np.cumsum(blank)
                keep = ~blank
            else:
                cont = np.array([bool(ln) and ln[0] in " \t"
                                 for ln in lines])
                grp = np.cumsum(~cont)
                keep = lines != ""
            lines, grp = lines[keep], grp[keep]
            if not len(lines):
                continue
            # group ids are monotonic → run-length offsets + binary_join
            newg = np.ones(len(grp), dtype=bool)
            newg[1:] = grp[1:] != grp[:-1]
            counts = np.diff(np.append(np.flatnonzero(newg), len(grp)))
            offs = np.concatenate(([0], np.cumsum(counts)))
            la = pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()), pa.array(lines, pa.string()))
            recs = [r for r in pc.binary_join(la, esc).to_pylist()
                    if r != ""]          # wholly-empty records drop
            out_text.extend(recs)
            out_path.extend([path] * len(recs))
        cols = {"text": pa.array(out_text, pa.string())}
        if include_path:
            cols["path"] = pa.array(out_path, pa.string())
        return pa.table(cols)

    return rd.read_binary_files(paths, include_paths=True) \
        .map_batches(assemble, batch_format="pyarrow", batch_size=8)


def read_jsonl(paths, **read_kwargs):
    """Line-delimited JSON file(s) → typed Dataset (Arrow JSON reader —
    C++-speed parse, schema inferred or passed via read_kwargs)."""
    return rd.read_json(paths, **read_kwargs)
