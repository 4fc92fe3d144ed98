"""mmnormalize / pmnormalize / mmgrok — the rulebase parse stage.

Reference semantics:
- mmnormalize (plugins/mmnormalize/mmnormalize.c:75-150): a liblognorm
  rulebase (`rule=<tags>:<sample>` lines with `%name:type[:extra]%` fields)
  is loaded once per action (buildInstance), each message's `msg` (or
  `rawmsg` with useRawMsg, or an arbitrary `variable`) is matched against
  the samples, extracted fields land under `$!` (or a `path` subtree),
  `annotate=` lines add constant fields per matched rule tag, and on
  failure liblognorm emits `originalmsg` + `unparsed-data`.
- pmnormalize (plugins/pmnormalize/): the same matching as a *parser*, i.e.
  over the raw message.
- mmgrok (contrib/mmgrok/mmgrok.c:65,238-340): grok `%{PATTERN:name}`
  dictionary patterns, matches into a JSON target.

Ray-Data-first design (SURVEY §2.2/§2.6 mapping): every rule compiles to
ONE anchored RE2 regex with named capture groups; a batch is matched rule
by rule with a shrinking unmatched mask (first-match-wins cascade) —
`pc.extract_regex` runs vectorized over only the still-unmatched rows, and
scatter-back is numpy fancy indexing. No per-row Python in the hot path.
The same compiled regexes are exported for the DuckDB oracle (both engines
are RE2, so semantics match by construction — the parse-CTE trick).

Typed captures: `number`/`float` fields become int64/float64 columns;
everything else stays string. `-` field names are matched but discarded
(non-capturing groups), as in liblognorm.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# liblognorm v1 field types → RE2 fragments
# ---------------------------------------------------------------------------

_TYPE_RE = {
    "number": r"\d+",
    "float": r"[+-]?\d+(?:\.\d+)?",
    "hexnumber": r"0x[0-9a-fA-F]+",
    "word": r"[^ ]+",
    "alpha": r"[A-Za-z]+",
    "rest": r"[\s\S]*",
    "whitespace": r"\s+",
    "quoted-string": r'"(?:[^"\\]|\\.)*"',
    "op-quoted-string": r'(?:"(?:[^"\\]|\\.)*"|[^ ]+)',
    "ipv4": r"\d{1,3}(?:\.\d{1,3}){3}",
    "ipv6": r"[0-9A-Fa-f:]*:[0-9A-Fa-f:.]+",
    "mac48": r"(?:[0-9A-Fa-f]{2}[:-]){5}[0-9A-Fa-f]{2}",
    "date-rfc3164": r"[A-Z][a-z]{2} [ 0-3]?\d \d{2}:\d{2}:\d{2}",
    "date-rfc5424": (r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}"
                     r"(?:\.\d+)?(?:Z|[+-]\d{2}:\d{2})?"),
    "time-12hr": r"\d{1,2}:\d{2}:\d{2} ?[APap][Mm]",
    "time-24hr": r"\d{1,2}:\d{2}:\d{2}",
}

_HEXESC = re.compile(r"\\x([0-9a-fA-F]{2})")


def _degroup(pattern: str) -> str:
    """Rewrite unnamed capturing groups `(` → `(?:` — pc.extract_regex
    rejects regexes with unnamed groups, and user-supplied inline regex /
    grok dictionary fragments routinely contain them. Skips escaped parens
    and parens inside character classes."""
    out = []
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            out.append(pattern[i:i + 2])
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            out.append(c)
        elif c == "[":
            in_class = True
            out.append(c)
        elif c == "(" and pattern[i + 1:i + 2] != "?":
            out.append("(?:")
        else:
            out.append(c)
        i += 1
    return "".join(out)


def _unescape(s: str) -> str:
    """Decode liblognorm \\xNN escapes (tests/testsuites/*.rulebase)."""
    return _HEXESC.sub(lambda m: chr(int(m.group(1), 16)), s)


def _type_regex(ftype: str, extra: str | None, allow_regex: bool) -> str:
    if ftype in _TYPE_RE:
        return _TYPE_RE[ftype]
    if ftype == "char-to":
        c = _unescape(extra or "")
        return f"[^{re.escape(c)}]+"
    if ftype == "char-sep":
        c = _unescape(extra or "")
        return f"[^{re.escape(c)}]*"
    if ftype == "regex":
        # module param allowregex (mmnormalize.c modpdescr): inline regex
        # is opt-in, exactly like the reference
        if not allow_regex:
            raise ValueError("regex field type requires allow_regex=True "
                             "(mmnormalize allowregex module param)")
        return f"(?:{_degroup(extra or '')})"
    if ftype == "tokenized":
        # tokenized:<sep>:<subtype> — one-or-more subtype matches joined by
        # sep; value captured as the whole span (documented deviation:
        # liblognorm returns a JSON array, we return the matched string)
        sep_esc, sub = (extra or "").split(":", 1)
        sep = re.escape(_unescape(sep_esc))
        sub_t, _, sub_extra = sub.partition(":")
        inner = _type_regex(sub_t, sub_extra or None, allow_regex)
        return f"(?:{inner})(?:{sep}(?:{inner}))*"
    raise ValueError(f"unsupported rulebase field type {ftype!r}")


class Rule:
    """One compiled sample: anchored regex + capture-field metadata."""

    __slots__ = ("tag", "pattern", "regex", "fields", "types")

    def __init__(self, tag: str, regex: str,
                 fields: list[str], types: list[str]):
        self.tag = tag
        self.regex = regex          # anchored, named groups f0..fN
        self.fields = fields        # output column names, same order
        self.types = types          # liblognorm type per field


_FIELD_SPEC = re.compile(r"%([^%]*)%")


def _compile_sample(tag: str, sample: str, allow_regex: bool) -> Rule:
    """liblognorm sample → one anchored RE2 with named groups f0..fN."""
    out: list[str] = ["^"]
    fields: list[str] = []
    types: list[str] = []
    pos = 0
    gi = 0
    for m in _FIELD_SPEC.finditer(sample):
        lit = sample[pos:m.start()]
        out.append(re.escape(_unescape(lit.replace("%%", "%"))))
        spec = m.group(1)
        if spec == "":  # '%%' escaped literal percent
            out.append("%")
            pos = m.end()
            continue
        name, _, rest = spec.partition(":")
        ftype, _, extra = rest.partition(":")
        frag = _type_regex(ftype, extra or None, allow_regex)
        if name == "-":
            out.append(f"(?:{frag})")
        else:
            out.append(f"(?P<f{gi}>{frag})")
            fields.append(name)
            types.append(ftype)
            gi += 1
        pos = m.end()
    out.append(re.escape(_unescape(sample[pos:].replace("%%", "%"))))
    out.append("$")
    return Rule(tag, "".join(out), fields, types)


class V2RepeatRule:
    """liblognorm v2 `repeat` rule (the k8s CRI-O / docker-json multiline
    shape, imfile-endmsg.regex.{crio,json}.rulebase): parse the `parser`
    step sequence repeatedly, matching `while` between iterations; the
    field value is the JSON array of per-iteration objects.

    Supported step types: literal (text=), word, char-sep (extradata=,
    optional name), json (name "." merges the parsed object into the
    iteration). option.permitMismatchInParser ends the loop gracefully
    on a parser mismatch. Runs per row (sequential parsing is inherent
    to `repeat`); rows are only the ones earlier regex rules left
    unmatched."""

    __slots__ = ("tag", "field", "parser", "while_steps",
                 "permit_mismatch", "fields", "types")

    def __init__(self, tag: str, spec: dict):
        self.tag = tag
        self.field = spec["name"]
        self.parser = spec.get("parser", [])
        self.while_steps = spec.get("while", [])
        self.permit_mismatch = bool(
            spec.get("option.permitMismatchInParser", False))
        self.fields = [self.field]
        self.types = ["json"]

    @staticmethod
    def _steps(s: str, pos: int, steps: list):
        obj: dict = {}
        for st in steps:
            t = st.get("type")
            if t == "literal":
                txt = st.get("text", "")
                if not s.startswith(txt, pos):
                    return None
                pos += len(txt)
            elif t == "word":
                m = re.match(r"[^ ]+", s[pos:])
                if not m:
                    return None
                if st.get("name") not in (None, "-"):
                    obj[st["name"]] = m.group(0)
                pos += m.end()
            elif t == "char-sep":
                seps = st.get("extradata", "")
                i = pos
                while i < len(s) and s[i] not in seps:
                    i += 1
                if st.get("name") not in (None, "-"):
                    obj[st["name"]] = s[pos:i]
                pos = i
            elif t == "json":
                dec = json.JSONDecoder()
                try:
                    v, end = dec.raw_decode(s, pos)
                except ValueError:
                    return None
                name = st.get("name")
                if name == "." and isinstance(v, dict):
                    obj.update(v)
                elif name not in (None, "-", "."):
                    obj[name] = v
                pos = end
            else:
                return None
        return obj, pos

    def parse(self, s: str):
        pos = 0
        items: list = []
        while True:
            r = self._steps(s, pos, self.parser)
            if r is None:
                if self.permit_mismatch:
                    break
                if not items:
                    return None
                break
            obj, pos = r
            items.append(obj)
            w = self._steps(s, pos, self.while_steps)
            if w is None:
                break
            _, pos = w
        if s[pos:].strip(" \n"):
            return None  # the whole-sample rule must consume the input
        return items if items else None


class RuleBase:
    """Parsed liblognorm rulebase: ordered rules + per-tag annotations."""

    def __init__(self, rules: list[Rule],
                 annotations: dict[str, list[tuple[str, str]]]):
        self.rules = rules
        self.annotations = annotations

    @classmethod
    def from_string(cls, text: str, allow_regex: bool = False) -> "RuleBase":
        rules: list = []
        ann: dict[str, list[tuple[str, str]]] = {}
        # v2 rules may span lines (the reference's repeat rulebases do):
        # a rule whose sample opens a %{...} JSON field but has not yet
        # closed it absorbs following lines until it ends with }%
        lines_in = text.splitlines()
        joined: list[str] = []
        buf = None
        for raw in lines_in:
            line = raw.strip()
            if buf is not None:
                buf += " " + line
                if line.endswith("}%"):
                    joined.append(buf)
                    buf = None
                continue
            if (line.startswith("rule=") and "%{" in line
                    and not line.endswith("}%")):
                buf = line
                continue
            joined.append(line)
        if buf is not None:
            joined.append(buf)
        for line in joined:
            if not line or line.startswith("#"):
                continue
            if line.startswith("rule="):
                body = line[len("rule="):]
                tag, _, sample = body.partition(":")
                stripped_sample = sample.strip()
                if (stripped_sample.startswith("%{")
                        and stripped_sample.endswith("}%")):
                    # liblognorm's spec reader tolerates trailing commas
                    # (the reference crio rulebase has one)
                    spec_txt = re.sub(r",\s*([\]}])", r"\1",
                                      stripped_sample[1:-1])
                    spec = json.loads(spec_txt)
                    if spec.get("type") == "repeat":
                        rules.append(V2RepeatRule(tag, spec))
                        continue
                    raise ValueError(
                        f"unsupported v2 field type {spec.get('type')!r}"
                        " (only 'repeat' whole-sample rules)")
                rules.append(_compile_sample(tag, sample, allow_regex))
            elif line.startswith("annotate="):
                body = line[len("annotate="):]
                tag, _, spec = body.partition(":")
                m = re.match(r'\+([^=]+)="((?:[^"\\]|\\.)*)"', spec)
                if m:
                    ann.setdefault(tag, []).append((m.group(1), m.group(2)))
            elif line.startswith("version=") or line.startswith("prefix="):
                continue  # v2 directives: version noted, prefix unsupported
        return cls(rules, ann)

    @classmethod
    def from_file(cls, path: str, allow_regex: bool = False) -> "RuleBase":
        with open(path) as fh:
            return cls.from_string(fh.read(), allow_regex)

    def all_fields(self) -> list[tuple[str, str]]:
        """Union of output (field, type) in first-seen order, annotations
        included (as string constants)."""
        seen: dict[str, str] = {}
        for r in self.rules:
            for f, t in zip(r.fields, r.types):
                seen.setdefault(f, t)
        for pairs in self.annotations.values():
            for f, _ in pairs:
                seen.setdefault(f, "annotation")
        return list(seen.items())


# ---------------------------------------------------------------------------
# grok dictionary (mmgrok) → the same Rule form
# ---------------------------------------------------------------------------

GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r"[\s\S]*?",
    "GREEDYDATA": r"[\s\S]*",
    "INT": r"[+-]?\d+",
    "NONNEGINT": r"\d+",
    "POSINT": r"[1-9]\d*",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "NUMBER": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "IPV4": r"\d{1,3}(?:\.\d{1,3}){3}",
    "IP": r"\d{1,3}(?:\.\d{1,3}){3}",
    "HOSTNAME": r"[A-Za-z0-9](?:[A-Za-z0-9_.-]*[A-Za-z0-9])?",
    "USER": r"[A-Za-z0-9._-]+",
    "USERNAME": r"[A-Za-z0-9._-]+",
    "UUID": r"[0-9a-fA-F]{8}(?:-[0-9a-fA-F]{4}){3}-[0-9a-fA-F]{12}",
    "QUOTEDSTRING": r'"(?:[^"\\]|\\.)*"',
    "LOGLEVEL": (r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|"
                 r"[Nn]otice|NOTICE|[Ii]nfo|INFO|[Ww]arn(?:ing)?|"
                 r"WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|"
                 r"CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|"
                 r"EMERG(?:ENCY)?|[Ee]merg(?:ency)?)"),
    "TIMESTAMP_ISO8601": (r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}"
                          r"(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?"),
    "SYSLOGTIMESTAMP": r"[A-Z][a-z]{2} [ 0-3]?\d \d{2}:\d{2}:\d{2}",
    "SYSLOGHOST": r"[A-Za-z0-9._-]+",
    "PROG": r"[A-Za-z0-9._/-]+",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w@.\-\[\]]+))?\}")


def compile_grok(pattern: str, tag: str = "",
                 extra_patterns: dict[str, str] | None = None) -> Rule:
    """grok expression → Rule (contrib/mmgrok/mmgrok.c:238-340 match shape).

    `%{PAT:name}` captures, `%{PAT}` matches without capturing; PAT
    definitions may reference other patterns (resolved recursively)."""
    dict_ = dict(GROK_PATTERNS)
    if extra_patterns:
        dict_.update(extra_patterns)

    def resolve(p: str, depth: int = 0) -> str:
        if depth > 10:
            raise ValueError("grok pattern recursion too deep")
        def sub(m: re.Match) -> str:
            base = _degroup(dict_[m.group(1)])
            return f"(?:{resolve(base, depth + 1)})"
        return _GROK_REF.sub(sub, p)

    out: list[str] = ["^"]
    fields: list[str] = []
    types: list[str] = []
    pos = 0
    gi = 0
    for m in _GROK_REF.finditer(pattern):
        out.append(re.escape(pattern[pos:m.start()]))
        pat_name, field = m.group(1), m.group(2)
        if pat_name not in dict_:
            raise KeyError(f"unknown grok pattern %{{{pat_name}}}")
        frag = resolve(_degroup(dict_[pat_name]))
        if field:
            out.append(f"(?P<f{gi}>{frag})")
            fields.append(field)
            types.append("number" if pat_name in ("INT", "NONNEGINT",
                                                  "POSINT") else
                         "float" if pat_name in ("NUMBER", "BASE10NUM")
                         else "grok")
            gi += 1
        else:
            out.append(f"(?:{frag})")
        pos = m.end()
    out.append(re.escape(pattern[pos:]))
    out.append("$")
    return Rule(tag, "".join(out), fields, types)


def grok_rulebase(patterns: list[str | tuple[str, str]],
                  extra_patterns: dict[str, str] | None = None) -> RuleBase:
    """List of grok expressions (or (tag, expr)) → first-match-wins RuleBase."""
    rules = []
    for i, p in enumerate(patterns):
        tag, expr = p if isinstance(p, tuple) else (f"g{i}", p)
        rules.append(compile_grok(expr, tag, extra_patterns))
    return RuleBase(rules, {})


# ---------------------------------------------------------------------------
# the vectorized first-match-wins cascade executor
# ---------------------------------------------------------------------------

class NormalizeStage:
    """map_batches stage: rulebase cascade over one source column.

    Rulebase compiles ONCE per instance (serialized to tasks via the object
    store — the buildInstance-once analogue); __call__ handles one Arrow
    batch with zero per-row Python.

    Parameters mirror the reference action params (mmnormalize.c actpdescr):
    `rulebase`/`rule` → rb, `userawmsg` → source="text", `variable` →
    source=<any column>, `path` → column-name prefix for extracted fields.
    """

    def __init__(self, rb: RuleBase | str, source: str = "msg",
                 path: str = "", keep: list[str] | None = None,
                 allow_regex: bool = False, emit_unparsed: bool = True):
        if isinstance(rb, str):
            rb = RuleBase.from_string(rb, allow_regex=allow_regex)
        self.rb = rb
        self.source = source
        self.path = path
        self.keep = keep
        self.emit_unparsed = emit_unparsed
        # precomputed per-tag annotation rows
        self._fields = rb.all_fields()

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = batch[self.source]
        s = (src.combine_chunks() if isinstance(src, pa.ChunkedArray)
             else src)
        s = pc.fill_null(pc.cast(s, pa.string()), "")
        n = batch.num_rows

        unmatched = np.ones(n, dtype=bool)
        rule_of = np.full(n, -1, dtype=np.int32)
        vals: dict[str, np.ndarray] = {
            f: np.full(n, None, dtype=object) for f, _ in self._fields}

        s_py = None
        for ri, rule in enumerate(self.rb.rules):
            if not unmatched.any():
                break
            if isinstance(rule, V2RepeatRule):
                # sequential `repeat` parsing is per row by nature; only
                # rows every earlier regex rule left unmatched pay it
                if s_py is None:
                    s_py = s.to_pylist()
                for i in np.flatnonzero(unmatched):
                    items = rule.parse(s_py[i] or "")
                    if items is not None:
                        vals[rule.field][i] = json.dumps(
                            items, separators=(",", ":"), sort_keys=True)
                        rule_of[i] = ri
                        unmatched[i] = False
                continue
            idx = np.flatnonzero(unmatched)
            sub = s.take(pa.array(idx, pa.int64()))
            st = pc.extract_regex(sub, pattern=rule.regex)
            ok = pc.is_valid(st).to_numpy(zero_copy_only=False)
            hit = idx[ok]
            if hit.size == 0:
                continue
            rule_of[hit] = ri
            unmatched[hit] = False
            for gi, fname in enumerate(rule.fields):
                col = st.field(f"f{gi}").to_numpy(zero_copy_only=False)
                vals[fname][hit] = col[ok]
            for afield, aval in self.rb.annotations.get(rule.tag, []):
                # setdefault semantics: a field CAPTURED by the matching
                # rule wins over a same-named tag annotation (matches the
                # generated _grok_sql oracle, which emits the capture WHEN
                # ahead of the annotation constant).
                if afield in rule.fields:
                    continue
                vals[afield][hit] = aval

        cols: dict[str, pa.Array] = {}
        keep = self.keep if self.keep is not None else [
            c for c in ("conv_id", "turn_idx", "doc_id")
            if c in batch.column_names]
        for c in keep:
            cols[c] = batch[c]
        tags = np.asarray(
            [r.tag for r in self.rb.rules] + [""], dtype=object)
        cols[self.path + "event_tag"] = pa.array(
            tags[rule_of], type=pa.string())
        cols[self.path + "parse_success"] = pa.array(rule_of >= 0)
        for fname, ftype in self._fields:
            out = pa.array(vals[fname], type=pa.string())
            if ftype == "number":
                out = pc.cast(out, pa.int64())
            elif ftype == "float":
                out = pc.cast(out, pa.float64())
            cols[self.path + fname] = out
        if self.emit_unparsed:
            # liblognorm failure contract: originalmsg + unparsed-data
            cols[self.path + "unparsed_data"] = pa.array(
                np.where(unmatched, s.to_numpy(zero_copy_only=False), None),
                type=pa.string())
        return pa.table(cols)


def normalize(ds, rb: RuleBase | str, source: str = "msg", **kw):
    """Dataset-level mmnormalize: task-mode map_batches (stateless compiled
    instance broadcast once), zero-copy Arrow batches."""
    return ds.map_batches(NormalizeStage(rb, source=source, **kw),
                          batch_format="pyarrow")


# ---------------------------------------------------------------------------
# config-registry entry point (mmnormalize plugin shape)
# ---------------------------------------------------------------------------

from functools import lru_cache


@lru_cache(maxsize=64)
def _cached_stage(rulebase_text: str, source: str, path: str,
                  allow_regex: bool, emit_unparsed: bool) -> NormalizeStage:
    return NormalizeStage(rulebase_text, source=source, path=path,
                          allow_regex=allow_regex,
                          emit_unparsed=emit_unparsed)


def mmnormalize_table(batch: pa.Table, rulebase: str, source: str = "msg",
                      path: str = "", allow_regex: bool = False,
                      emit_unparsed: bool = True) -> pa.Table:
    """Batch-level modifier for STAGE_REGISTRY (config 'modifiers' list) —
    rulebase compiles once per process (lru cache), the action-param names
    mirror mmnormalize.c actpdescr (rulebase/variable/userawmsg→source)."""
    return _cached_stage(rulebase, source, path, allow_regex,
                         emit_unparsed)(batch)
