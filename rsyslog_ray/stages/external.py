"""mmexternal / omprog — external-process message modification and output.

Reference semantics:
  * plugins/mmexternal/mmexternal.c — write one ``\\n``-terminated line per
    message to the child's stdin (``interface.input`` = msg | rawmsg |
    fulljson, mmexternal.c:445-456), read exactly one ``\\n``-terminated
    JSON line back per message (processProgramReply, mmexternal.c:202-250;
    empty/EOF reads degrade to ``"{}"``), and merge that JSON into the
    message via the MsgSetPropsViaJSON key table (runtime/msg.c:4599-4667).
  * plugins/omprog/omprog.c — write one templated line per message to the
    child's stdin (writeToProcess); with ``confirmMessages`` the child
    answers one status line per message — leading ``.`` stripped
    (keep-alive), ``OK`` / ``DEFER_COMMIT`` / ``PREVIOUS_COMMITTED``
    succeed, anything else is a recoverable failure
    (lineToStatusCode, omprog.c:428-453).  With confirmMessages the child
    must also print ``OK`` once after startup (startChild).
    ``useTransactions`` brackets each batch in beginTransactionMark /
    commitTransactionMark lines (omprog.c:970-1037).

Ray shape: callable CLASSES for ``map_batches(..., concurrency=N)`` actor
pools — the subprocess is spawned once per actor in ``__init__`` (openPipe
analogue, mmexternal.c:329-376), and each ``__call__`` streams one batch
through it.  A helper thread writes the batch's input lines while the main
thread reads the replies, so the batch pipelines through the child without
the pipe-buffer deadlock a write-all-then-read-all would risk; the
reference's strict per-message lockstep (callExtProg) is the window-1
special case of this.  For the fn-style stage registry
(``register_stage``), module-level wrappers reuse one child per worker
process via a keyed cache — same spawn-once economics without an actor.

At 100 TB the subprocess round-trip is the cost: the child is a
user-supplied filter, so the engine's job is to keep it busy (pipelined
writes), keep it warm (one child per actor, not per batch), and bound its
blast radius (a dead child restarts and the in-flight remainder of the
batch degrades to "{}" exactly like the reference's EPIPE path).
"""

from __future__ import annotations

import json
import os
import shlex
import subprocess
import threading

import pyarrow as pa
import pyarrow.compute as pc

from ..functions import loads_fast

__all__ = [
    "MMExternal", "OmProg", "apply_props_via_json",
    "mmexternal_table", "omprog_table",
]


# --------------------------------------------------------------------------
# child-process plumbing
# --------------------------------------------------------------------------

class _Child:
    """One external program with line pipes (mmexternal.c openPipe)."""

    def __init__(self, argv: list[str], output: str | None,
                 want_stdout: bool = True):
        self.argv = argv
        self.output = output
        self.want_stdout = want_stdout
        self.proc: subprocess.Popen | None = None
        self._errfile = None
        self.spawn()

    def spawn(self):
        self.close()
        if self.output:
            # mmexternal execBinary: child stderr (and omprog's stdout when
            # not confirming) goes to the named file, else /dev/null
            self._errfile = open(self.output, "ab", buffering=0)
            err = self._errfile
        else:
            err = subprocess.DEVNULL
        self.proc = subprocess.Popen(
            self.argv,
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE if self.want_stdout else err,
            stderr=err,
        )

    def close(self):
        if self.proc is not None:
            try:
                if self.proc.stdin:
                    self.proc.stdin.close()
            except OSError:
                pass
            try:
                self.proc.wait(timeout=5)
            except subprocess.TimeoutExpired:  # killUnresponsive analogue
                self.proc.kill()
                self.proc.wait()
            self.proc = None
        if self._errfile is not None:
            self._errfile.close()
            self._errfile = None

    def __del__(self):  # actor teardown
        try:
            self.close()
        except Exception:
            pass


def _argv(binary: str, args) -> list[str]:
    """split_binary_parameters analogue: a single string is shell-split."""
    if args:
        return [binary, *args]
    return shlex.split(binary)


# --------------------------------------------------------------------------
# MsgSetPropsViaJSON (runtime/msg.c:4599-4667)
# --------------------------------------------------------------------------

# JSON key -> engine column (msg.c msgSetPropViaJSON key table).  Keys the
# batch schema has no column for are applied only when the column exists;
# unknown keys are ignored (msg.c:4663).
_PROP_COLS = {
    "rawmsg": "text",
    "msg": "msg",
    "syslogtag": "tag",
    "procid": "procid",
    "msgid": "msgid",
    "structured-data": "structured_data",
    "hostname": "hostname",
    "source": "hostname",
    "fromhost": "hostname",
}


def apply_props_via_json(batch: pa.Table, responses: list,
                         cee_col: str = "cee_json") -> pa.Table:
    """Merge per-row JSON reply objects into the batch.

    ``responses[i]`` is the child's reply line for row i (str) or None.
    "{}" / unparseable / non-object replies leave the row unchanged
    (msg.c:4695 shortcut, RS_RET_JSON_UNUSABLE).  The per-row Python loop
    is deliberate: rows that reach here each already paid a subprocess
    round-trip, which dominates by orders of magnitude.
    """
    n = batch.num_rows
    col_updates: dict[str, dict[int, object]] = {}
    pri_updates: dict[int, int] = {}
    fac_updates: dict[int, int] = {}
    sev_updates: dict[int, int] = {}
    cee_updates: dict[int, dict] = {}

    for i, resp in enumerate(responses):
        if not resp or resp == "{}":
            continue
        try:
            obj = loads_fast(resp)
        except ValueError:
            continue
        if not isinstance(obj, dict):
            continue
        for key, val in obj.items():
            if key == "$!":
                if isinstance(val, dict):
                    cee_updates[i] = val
            elif key == "pri":
                try:
                    pri = int(val)
                except (TypeError, ValueError):
                    continue
                # msgSetPRI (msg.c:1609): >191 -> invld.=debug (199);
                # fac capped at 24, sev = pri & 7
                if pri < 0 or pri > 191:
                    pri = 199
                pri_updates[i] = pri
                fac_updates[i] = min(pri >> 3, 24)
                sev_updates[i] = pri & 7
            elif key == "syslogfacility":
                try:
                    v = int(val)
                except (TypeError, ValueError):
                    continue
                if 0 <= v <= 24:  # msg.c:4626 range check, else ignored
                    fac_updates[i] = v
            elif key == "syslogseverity":
                try:
                    v = int(val)
                except (TypeError, ValueError):
                    continue
                if 0 <= v <= 7:
                    sev_updates[i] = v
            elif key in _PROP_COLS:
                col = _PROP_COLS[key]
                if col in batch.column_names:
                    # json_object_get_string semantics: scalars stringify
                    col_updates.setdefault(col, {})[i] = (
                        val if isinstance(val, str)
                        else json.dumps(val, separators=(",", ":")))
            # else: unknown property ignored (msg.c:4663)

    def _patch(col: str, updates: dict[int, object], typ=None):
        nonlocal batch
        if not updates:
            return
        idx = batch.column_names.index(col)
        old = batch.column(idx)
        vals = old.to_pylist()
        for i, v in updates.items():
            vals[i] = v
        batch = batch.set_column(
            idx, col, pa.array(vals, typ or old.type))

    for col, updates in col_updates.items():
        _patch(col, updates)
    if "pri" in batch.column_names:
        _patch("pri", pri_updates)
    if "facility" in batch.column_names:
        _patch("facility", fac_updates)
    if "severity" in batch.column_names:
        _patch("severity", sev_updates)

    if cee_updates:
        if cee_col in batch.column_names:
            idx = batch.column_names.index(cee_col)
            vals = pc.cast(batch.column(idx), pa.string()).to_pylist()
        else:
            idx = None
            vals = [None] * n
        for i, add in cee_updates.items():
            # msgAddJSON "!" root: shallow merge, added keys replace
            # existing ones (msg.c:4972-4976 jsonMerge)
            try:
                base = loads_fast(vals[i]) if vals[i] else {}
            except ValueError:
                base = {}
            if not isinstance(base, dict):
                base = {}
            base.update(add)
            vals[i] = json.dumps(base, separators=(",", ":"),
                                 sort_keys=True)
        arr = pa.array(vals, pa.string())
        if idx is None:
            batch = batch.append_column(cee_col, arr)
        else:
            batch = batch.set_column(idx, cee_col, arr)
    return batch


# --------------------------------------------------------------------------
# mmexternal
# --------------------------------------------------------------------------

def _pump(child: _Child, lines: list[bytes]) -> list[str | None]:
    """Stream ``lines`` through the child, one reply line per input line.

    Writer thread + reader loop = pipelined, deadlock-free.  A dead child
    (EPIPE / EOF) is restarted and the un-replied remainder of the batch
    degrades to None ("{}"), mirroring mmexternal.c:238 + tryRestart.
    """
    proc = child.proc
    if proc is None or proc.poll() is not None:
        child.spawn()
        proc = child.proc

    def write_all():
        try:
            for ln in lines:
                proc.stdin.write(ln)
            proc.stdin.flush()
        except (BrokenPipeError, OSError):
            pass  # reader sees EOF and degrades the remainder

    w = threading.Thread(target=write_all, daemon=True)
    w.start()
    out: list[str | None] = []
    dead = False
    for _ in lines:
        if dead:
            out.append(None)
            continue
        raw = proc.stdout.readline()
        if not raw:  # child died mid-batch
            dead = True
            out.append(None)
            continue
        out.append(raw.decode("utf-8", "replace").rstrip("\n"))
    w.join()
    if dead:
        child.spawn()  # tryRestart for the next batch
    return out


class MMExternal:
    """Actor-pool mmexternal stage for ``map_batches``.

    ``interface_input``: ``msg`` (the MSG part), ``rawmsg`` (full raw
    message) or ``fulljson`` (the jsonmesg property) — mmexternal.c
    INPUT_MSG/INPUT_RAWMSG/INPUT_JSON.
    """

    def __init__(self, binary: str, args=(), interface_input: str = "msg",
                 output: str | None = None, cee_col: str = "cee_json"):
        if interface_input not in ("msg", "rawmsg", "fulljson"):
            raise ValueError(
                f"invalid interface.input {interface_input!r}")  # c:570
        self.interface_input = interface_input
        self.cee_col = cee_col
        self.child = _Child(_argv(binary, args), output)

    def _input_lines(self, batch: pa.Table) -> list[bytes]:
        if self.interface_input == "fulljson":
            from ..expr import PropertyRegistry
            arr = PropertyRegistry(batch).get("jsonmesg")
        else:
            col = "msg" if self.interface_input == "msg" else "text"
            arr = pc.fill_null(pc.cast(batch[col], pa.string()), "")
        # LF inside a message would desync the line framing; the wire
        # parsers sanitize control chars upstream, but guard anyway
        return [s.replace("\n", " ").encode() + b"\n"
                for s in arr.to_pylist()]

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        replies = _pump(self.child, self._input_lines(batch))
        return apply_props_via_json(batch, replies, self.cee_col)


# --------------------------------------------------------------------------
# omprog
# --------------------------------------------------------------------------

class OmProg:
    """Actor-pool omprog action: feed templated lines to a program.

    Passthrough stage — the batch flows on unchanged, with an
    ``omprog_confirmed`` bool column appended when ``confirm_messages``
    (lineToStatusCode: OK / DEFER_COMMIT / PREVIOUS_COMMITTED succeed,
    leading '.' keep-alives stripped; anything else = recoverable failure,
    omprog.c:428-453).
    """

    _OK = {"OK", "DEFER_COMMIT", "PREVIOUS_COMMITTED"}

    def __init__(self, binary: str, args=(), template=None,
                 confirm_messages: bool = False, output: str | None = None,
                 use_transactions: bool = False,
                 begin_transaction_mark: str = "BEGIN TRANSACTION",
                 commit_transaction_mark: str = "COMMIT TRANSACTION"):
        from ..templates import Template
        spec = template or "RSYSLOG_FileFormat"
        self.template = spec if isinstance(spec, Template) else Template(spec)
        self.confirm = confirm_messages
        self.use_transactions = use_transactions
        self.begin_mark = begin_transaction_mark.encode() + b"\n"
        self.commit_mark = commit_transaction_mark.encode() + b"\n"
        self.child = _Child(_argv(binary, args), output,
                            want_stdout=confirm_messages)
        if self.confirm:
            self._await_status()  # startChild: wait for startup OK

    def _read_status(self) -> bool:
        raw = self.child.proc.stdout.readline()
        if not raw:
            return False
        line = raw.decode("utf-8", "replace").rstrip("\n").lstrip(".")
        return line in self._OK

    def _await_status(self) -> bool:
        return self._read_status()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        rendered = self.template.render(batch)
        # the stage owns the \n framing; a template's own trailing \n
        # (customary in omprog configs) must not double up
        lines = [s[:-1].replace("\n", " ").encode() + b"\n"
                 if s.endswith("\n") else
                 s.replace("\n", " ").encode() + b"\n"
                 for s in pc.fill_null(
                     pc.cast(rendered, pa.string()), "").to_pylist()]
        proc = self.child.proc
        if proc is None or proc.poll() is not None:
            self.child.spawn()
            if self.confirm:
                self._await_status()
            proc = self.child.proc
        try:
            if self.use_transactions:  # batch = transaction (omprog.c:970)
                proc.stdin.write(self.begin_mark)
            if self.confirm:
                confirmed = []
                for ln in lines:
                    proc.stdin.write(ln)
                    proc.stdin.flush()
                    confirmed.append(self._read_status())
            else:
                for ln in lines:
                    proc.stdin.write(ln)
                confirmed = None
            if self.use_transactions:
                proc.stdin.write(self.commit_mark)
            proc.stdin.flush()
        except (BrokenPipeError, OSError):
            confirmed = ([False] * batch.num_rows if self.confirm else None)
            self.child.spawn()
        if confirmed is not None:
            if len(confirmed) < batch.num_rows:
                confirmed += [False] * (batch.num_rows - len(confirmed))
            batch = batch.append_column(
                "omprog_confirmed", pa.array(confirmed, pa.bool_()))
        return batch


# --------------------------------------------------------------------------
# fn-style registry wrappers (one warm child per worker process)
# --------------------------------------------------------------------------

_WORKER_CHILDREN: dict[tuple, object] = {}


def _worker_stage(cls, key_fields: tuple, **kw):
    key = (cls.__name__, os.getpid()) + key_fields
    st = _WORKER_CHILDREN.get(key)
    if st is None:
        st = _WORKER_CHILDREN[key] = cls(**kw)
    return st


def mmexternal_table(batch: pa.Table, binary: str = "", args=(),
                     interface_input: str = "msg",
                     output: str | None = None,
                     cee_col: str = "cee_json") -> pa.Table:
    """register_stage("mmexternal") entry — child cached per worker."""
    st = _worker_stage(
        MMExternal, (binary, tuple(args), interface_input, output, cee_col),
        binary=binary, args=args, interface_input=interface_input,
        output=output, cee_col=cee_col)
    return st(batch)


def omprog_table(batch: pa.Table, binary: str = "", args=(),
                 template=None, confirm_messages: bool = False,
                 output: str | None = None,
                 use_transactions: bool = False) -> pa.Table:
    """register_stage("omprog") entry — child cached per worker."""
    st = _worker_stage(
        OmProg, (binary, tuple(args), str(template), confirm_messages,
                 output, use_transactions),
        binary=binary, args=args, template=template,
        confirm_messages=confirm_messages, output=output,
        use_transactions=use_transactions)
    return st(batch)
