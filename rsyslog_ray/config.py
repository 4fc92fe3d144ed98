"""Declarative pipeline config → compiled Ray Data pipeline.

The RainerScript analogue (SURVEY §2.10.2): we do NOT re-implement the
config *language* (grammar/grammar.y); we compile the same object model —
templates / lookup_tables / modifier chain / rulesets of filtered actions
(grammar/rainerscript.h:35-49) — from a JSON-able dict:

    {
      "templates":     {"name": "%HOSTNAME% %msg%\\n", ...},
      "lookup_tables": {"xlate": {"file": "/path/tbl.json"}
                        | {"type": "string", "nomatch": "-", "table": [...]}},
      "modifiers":     ["mmjsonparse",
                        {"name": "mmfields", "args": {"sep": ","}}],
      "enrich":        [{"out": "role_fac", "key": "role", "table": "xlate"}],
      "ruleset": {"name": "main", "actions": [
          {"name": "discard", "kind": "stop",
           "filter": ["==", ["prop", "syslogseverity"], 7]},
          {"name": "errors", "filter": ["<=", ["prop", "syslogseverity"], 3],
           "template": "RSYSLOG_ForwardFormat"},
          {"name": "s1", "kind": "set", "var": "$!note",
           "value": ["call", "tolower", ["prop", "msg"]]},
          {"name": "u1", "kind": "unset", "var": "$.tmp"},
          {"name": "sub", "kind": "call", "ruleset": {...}}]}
    }

Filters are the expr AST (expr.py) with JSON lists instead of tuples.
Modifier names resolve through STAGE_REGISTRY — the module-ABI analogue
(runtime/module-template.h): @register_stage adds user modifiers exactly
like loadable mm* plugins.
"""

from __future__ import annotations

import json
from functools import partial

from .lookup import LookupTable
from .stages import enrich as _enrich_mod
from .stages.route import Action, Ruleset
from .templates import BUILTIN_TEMPLATES

# ---------------------------------------------------------------------------
# stage registry (plugin ABI analogue)
# ---------------------------------------------------------------------------

STAGE_REGISTRY: dict = {}


def register_stage(name: str, fn=None):
    """Register a batch-level modifier (pa.Table -> pa.Table). Usable as a
    decorator (@register_stage("mmfoo")) or a call."""
    if fn is None:
        def deco(f):
            STAGE_REGISTRY[name] = f
            return f
        return deco
    STAGE_REGISTRY[name] = fn
    return fn


register_stage("mmjsonparse", _enrich_mod.mmjsonparse_table)
register_stage("mmfields", _enrich_mod.mmfields_table)
register_stage("mmpstrucdata", _enrich_mod.mmpstrucdata_table)
register_stage("mmanon", _enrich_mod.mmanon_table)
register_stage("mmanon_ipv6", _enrich_mod.mmanon_ipv6_table)
register_stage("mmanon_embedded", _enrich_mod.mmanon_embedded_table)
register_stage("mmrm1stspace", _enrich_mod.mmrm1stspace_table)
register_stage("mmutf8fix", _enrich_mod.mmutf8fix_table)
register_stage("mmtaghostname", _enrich_mod.mmtaghostname_table)
register_stage("mmrfc5424addhmac", _enrich_mod.mmrfc5424addhmac_table)
register_stage("mmaudit", _enrich_mod.mmaudit_table)
register_stage("mmsnmptrapd", _enrich_mod.mmsnmptrapd_table)


def _mmnormalize(batch, **kw):
    from .stages.normalize import mmnormalize_table
    return mmnormalize_table(batch, **kw)


register_stage("mmnormalize", _mmnormalize)

from .stages import parse as _parse_mod  # noqa: E402
register_stage("pmciscoios", _parse_mod.parse_ciscoios_table)
register_stage("pmaixforwardedfrom", _parse_mod.fix_aixforwardedfrom_table)
register_stage("pmcisconames", _parse_mod.fix_cisconames_table)
register_stage("pmsnare", _parse_mod.fix_snare_table)
register_stage("pmpanngfw", _parse_mod.fix_panngfw_table)
register_stage("pmdb2diag", _parse_mod.parse_db2diag_table)
register_stage("pmnull", _parse_mod.parse_null_table)


def _mmexternal(batch, **kw):
    from .stages.external import mmexternal_table
    return mmexternal_table(batch, **kw)


def _omprog(batch, **kw):
    from .stages.external import omprog_table
    return omprog_table(batch, **kw)


register_stage("mmexternal", _mmexternal)
register_stage("omprog", _omprog)


# ---------------------------------------------------------------------------
# compile
# ---------------------------------------------------------------------------


def _to_expr(node):
    """JSON list AST → tuple AST (lists arriving from json.load)."""
    if isinstance(node, list):
        op = node[0]
        if op == "in":                      # value list stays a list
            return ("in", _to_expr(node[1]), list(node[2]))
        return tuple([op] + [_to_expr(a) for a in node[1:]])
    return node


def _load_tables(spec: dict) -> dict[str, LookupTable]:
    out = {}
    for name, t in (spec or {}).items():
        if isinstance(t, LookupTable):
            out[name] = t
        elif "file" in t:
            out[name] = LookupTable.from_file(t["file"])
        else:
            out[name] = LookupTable.from_json(json.dumps(t))
    return out


def _compile_ruleset(spec: dict, templates: dict[str, str],
                     _memo: dict | None = None) -> Ruleset:
    # _memo (id(spec) → Ruleset) shares one compiled object when the same
    # ruleset spec is reachable both by `call` and through a
    # call_indirect registry — validate() tolerates the same ACTION
    # object twice but rejects two distinct same-named compiles
    if _memo is None:
        _memo = {}
    cached = _memo.get(id(spec))
    if cached is not None:
        return cached
    actions = []
    for a in spec.get("actions", []):
        tpl = a.get("template")
        if tpl in templates:
            tpl = templates[tpl]            # custom named template → spec
        target = None
        targets = None
        else_target = None
        if a.get("kind") == "call":
            target = _compile_ruleset(a["ruleset"], templates, _memo)
        elif a.get("kind") == "call_indirect":
            # runtime/ruleset.c execCallIndirect: name expr resolves
            # against the full ruleset registry at run time; compile
            # every candidate target once here
            targets = {name: _compile_ruleset(sub, templates, _memo)
                       for name, sub in a.get("rulesets", {}).items()}
        elif a.get("kind") == "if":
            # grammar.y S_IF: then/else branch statement lists compile as
            # nested rulesets; the condition stays this statement's
            # filter and is evaluated once at run time
            target = _compile_ruleset(a["then"], templates, _memo)
            if a.get("else"):
                else_target = _compile_ruleset(a["else"], templates, _memo)
        elif a.get("kind") == "foreach":
            # loop body compiles like a nested ruleset (grammar.y S_FOREACH
            # block); `value` is the iterable expr, `var` the loop variable
            target = _compile_ruleset(
                {"name": f"{a['name']}_body", "actions": a.get("body", [])},
                templates)
        actions.append(Action(
            name=a["name"],
            filter=_to_expr(a["filter"]) if a.get("filter") else None,
            kind=a.get("kind", "write"),
            template=tpl,
            partition_by=a.get("partition_by"),
            keep_columns=a.get("keep_columns"),
            format=a.get("format", "parquet"),
            zip_level=a.get("zip_level", 0),
            only_if_previous_suspended=a.get("only_if_previous_suspended",
                                             False),
            target=target,
            var=a.get("var"),
            value=_to_expr(a["value"]) if a.get("value") is not None
            else None,
            targets=targets,
            else_target=else_target,
            raw_json=bool(a.get("raw_json", False)),
        ))
    rs = Ruleset(spec.get("name", "main"), actions)
    _memo[id(spec)] = rs
    return rs.validate()


class CompiledConfig:
    """A loaded config: .ruleset, .build(ds) adds parse+modifier+enrich
    stages, .run(input, out_root) executes end-to-end."""

    def __init__(self, cfg: dict):
        self.cfg = cfg
        self.templates = dict(cfg.get("templates", {}))
        self.tables = _load_tables(cfg.get("lookup_tables", {}))
        # dyn_stats bucket declarations (dynstats.c:35-46): kwargs for
        # stages.aggregate.dyn_inc keyed by bucket name
        self.dynstats = dict(cfg.get("dynstats", {}))
        self.ruleset = _compile_ruleset(cfg.get("ruleset", {"actions": []}),
                                        self.templates)
        # bind lookup tables for ("lookup", name, key) expressions
        self.ruleset.tables = self.tables
        self.modifiers = []
        for m in cfg.get("modifiers", []):
            if isinstance(m, str):
                name, args = m, {}
            else:
                name, args = m["name"], m.get("args", {})
            fn = STAGE_REGISTRY[name]
            self.modifiers.append(partial(fn, **args) if args else fn)
        self.enrich = [(e["out"], e["key"], self.tables[e["table"]])
                       for e in cfg.get("enrich", [])]

    def build(self, ds, batch_size: int = 16384):
        from .stages.enrich import enrich_with_lookups
        from .stages.parse import parse_dataset
        if self.cfg.get("parse", True):
            ds = parse_dataset(ds, batch_size=batch_size)
        for fn in self.modifiers:
            ds = ds.map_batches(fn, batch_format="pyarrow",
                                batch_size=batch_size)
        if self.enrich:
            ds = enrich_with_lookups(ds, self.enrich, batch_size=batch_size)
        return ds

    def run(self, input_dir_or_tag: str, out_root: str,
            batch_size: int = 16384) -> dict:
        from .datagen import ensure_transcripts
        from .sources import read_transcripts
        from .stages.route import execute_and_write
        tdir = ensure_transcripts(input_dir_or_tag)
        ds = self.build(read_transcripts(tdir), batch_size=batch_size)
        return execute_and_write(ds, self.ruleset, out_root,
                                 batch_size=batch_size)


def load_config(cfg: dict | str) -> CompiledConfig:
    """dict, JSON string, or path to a .json file → CompiledConfig."""
    if isinstance(cfg, str):
        if cfg.lstrip().startswith("{"):
            cfg = json.loads(cfg)
        else:
            with open(cfg) as fh:
                cfg = json.load(fh)
    return CompiledConfig(cfg)
