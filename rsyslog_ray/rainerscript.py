"""RainerScript front-end (subset) → the JSON config object model.

Round 1-2 compiled the OBJECT MODEL only (config.load_config over a
JSON dict), leaving the config *language* (grammar/grammar.y, lexer.l)
out of scope. This module closes that gap for the useful batch subset —
a hand-written tokenizer + recursive-descent parser (the reference uses
flex/bison; ~same grammar shape) producing exactly the dict
`config.load_config` consumes, so the whole existing compile path,
including nested call rulesets and stop semantics, is reused unchanged.

Supported subset (documented; the rest raises ParseError):
  template(name="t" type="string" string="%msg%\\n")
  ruleset(name="sub") { <statements> }          # callable via `call sub`
  action(type="omfile" name="n" template="t" partition_by="col"
         format="text" zipLevel=6 keep_columns=["a","b"])
  module(load="mmjsonparse")                     # → modifiers list
  lookup_table(name="t" file="/path/tbl.json")   # → lookup_tables
  stop                                           # also accepted: `~`
  call <rulesetname>
  set $!a!b = <expr>;  /  set $.local = <expr>;  # JSON-tree / local vars
  unset $!a!b;  /  unset $.local;
  if <expr> then <stmt-or-block> [else <stmt-or-block>]
  <pri-selector> <stmt-or-block>      # classic 'local0.err ...' /
      '*.info;mail.none {...}' lines → prifilt filters
  :prop, [!]op, "value" <stmt-or-block>   # classic property filter
      (op: contains|isequal|isempty|startswith|regex|ereregex)
  classic action targets after any filter: '/path' and '-/path'
      (omfile), '@host'/'@@host' (omfwd), ':omusrmsg:users' and bare
      '*' (wall) — each becomes a named text sink under out_root
  legacy $-directives: $ModLoad (mm*/pm* stages; wire transports are
      native and ignored), $template name,"fmt", and
      $ActionFileDefaultTemplate; other one-argument $Directives are
      accepted and ignored; $IncludeConfig path (and the modern
      include(file=...) object) inlines the referenced file(s), glob
      patterns included — see _include
  Param names may be dotted (queue.type="..."); unknown action/ruleset
  params are accepted and ignored (the reference warns on unused params).
  expressions: $properties (incl. $!json!paths and $.locals),
      'str'/"str", numbers, [lists],
      == != <= >= < > contains startswith, and / or / not, parens,
      prifilt("fac.sev"), lookup("table", <expr>), exists($!path),
      any registry function f(<expr>, ...) (strlen/tolower/re_match/
      field/format_time/..., functions.REGISTRY), arithmetic + - *,
      string concat &
Nested `if` compounds filters with `and`; `else` negates. Statements may
end with `;` (optional, as in the reference grammar).
  foreach ($.x in <expr>) do { ... }   # grammar.y S_FOREACH →
      stages/route.py _exec_foreach (explode / per-element body)
  template types: "string" (string="%...%"), "list" with a
      { constant(...) property(...) } body, and "subtree"
      (template.c:1226/:1926) — all compile to templates.Template
  input() / global() / main_queue() / timezone() / parser() objects are
      accepted and ignored (wire inputs and queue tuning are native to
      the Ray engine), so stock distro rsyslog.conf files load.
  dyn_stats(name="b" maxCardinality=... unusedMetricLife=...
      resettable=...) registers bucket params (dynstats.c:35-46) into
      cfg["dynstats"] → CompiledConfig.dynstats for dyn_inc.

Reference: grammar/grammar.y (cfline/script statements), lexer.l tokens.
"""

from __future__ import annotations

import re


class ParseError(ValueError):
    pass


_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+|\#[^\n]*|/\*(?s:.*?)\*/|//[^\n]*)
  | (?P<pfilt>:\$?[A-Za-z][A-Za-z0-9_-]*[ \t]*,[ \t]*!?[a-z]+[ \t]*,
              [ \t]*"(?:\\.|[^"\\])*")
  | (?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<ltarget>\??-?/[^\s;{}]+(?:;[A-Za-z0-9_.-]+)?|\?[A-Za-z0-9_.-]+(?:;[A-Za-z0-9_.-]+)?|@@?[A-Za-z0-9_.:*-]+|:[A-Za-z0-9]+:[^\s;{}]*)
  | (?P<num>-?\d+(?:\.\d+)?)
  | (?P<sel>[A-Za-z0-9*,]+\.[A-Za-z*!=]+(?:;[A-Za-z0-9*,]+\.[A-Za-z*!=]+)*)
  | (?P<prop>\$[!.]?[A-Za-z0-9_!./-]+(?:\[\d+\](?:[A-Za-z0-9_!./-]+)?)*
             |\$[!.])
  | (?P<op><>|==|!=|<=|>=|<|>|\(|\)|\{|\}|\[|\]|,|=|&|\+|-|\*|~|;)
  | (?P<word>[A-Za-z_][A-Za-z0-9_.]*)
""", re.VERBOSE)

#: classic property-filter compare operations → expr ops
#: (grammar/rainerscript.c DecodePropFilter:302-318; regex is handled by
#: the same ("regex", ...) op as ereregex — functions.re_match translates
#: BRE/ERE differences)
_PROPFILT_RE = re.compile(
    r'^:(\$?[A-Za-z][A-Za-z0-9_-]*)[ \t]*,[ \t]*(!?)([a-z]+)[ \t]*,'
    r'[ \t]*"((?:\\.|[^"\\])*)"$')


def _tokenize(src: str):
    out, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise ParseError(f"lex error at {src[i:i+30]!r}")
        i = m.end()
        if m.lastgroup == "ws":
            continue
        kind = m.lastgroup
        val = m.group()
        if kind == "str":
            body = val[1:-1]
            val = re.sub(r"\\(.)", lambda g: {"n": "\n", "t": "\t"}.get(
                g.group(1), g.group(1)), body)
        out.append((kind, val))
    out.append(("eof", ""))
    return out


class _Parser:
    def __init__(self, src: str):
        self.toks = _tokenize(src)
        self.i = 0
        self.templates: dict[str, str] = {}
        self.rulesets: dict[str, dict] = {}
        self.modifiers: list = []
        self.lookup_tables: dict[str, dict] = {}
        self.dynstats: dict[str, dict] = {}
        # $ActionFileDefaultTemplate (legacy) — template for path actions
        self.file_default_template = "RSYSLOG_TraditionalFileFormat"
        self._auto = 0

    # -- token helpers ----------------------------------------------------
    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        # never advance past the eof sentinel: a truncated input (e.g.
        # 'call' as the last token) keeps returning eof instead of
        # walking off the token list
        if self.i < len(self.toks) - 1:
            self.i += 1
        return t

    def expect(self, kind, val=None):
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise ParseError(f"expected {val or kind}, got {v!r}")
        return v

    def accept(self, kind, val=None):
        k, v = self.peek()
        if k == kind and (val is None or v == val):
            self.i += 1
            return True
        return False

    # -- params -----------------------------------------------------------
    def params(self) -> dict:
        """(key="v" key=123 key=["a","b"]) — name=value pairs."""
        self.expect("op", "(")
        out = {}
        while not self.accept("op", ")"):
            key = self.next()[1]
            # dotted param names (queue.type=...) lex as selector tokens,
            # which greedily include a trailing '='
            if key.endswith("="):
                key = key[:-1]
            else:
                self.expect("op", "=")
            k, v = self.next()
            if k == "num":
                out[key] = float(v) if "." in v else int(v)
            elif k == "str":
                out[key] = v
            elif k == "op" and v == "[":
                vals = []
                while not self.accept("op", "]"):
                    kk, vv = self.next()
                    if kk == "op" and vv == ",":
                        continue
                    vals.append(float(vv) if kk == "num" and "." in vv
                                else int(vv) if kk == "num" else vv)
                out[key] = vals
            else:
                raise ParseError(f"bad param value {v!r}")
        return out

    # -- expressions (precedence: or < and < not < cmp < add < mul) -------
    def expr(self):
        return self._or()

    def _or(self):
        left = self._and()
        while self.accept("word", "or"):
            left = ["or", left, self._and()]
        return left

    def _and(self):
        left = self._not()
        while self.accept("word", "and"):
            left = ["and", left, self._not()]
        return left

    def _not(self):
        if self.accept("word", "not"):
            return ["not", self._not()]
        return self._cmp()

    def _cmp(self):
        left = self._add()
        k, v = self.peek()
        if k == "op" and v in ("==", "!=", "<>", "<=", ">=", "<", ">"):
            self.next()
            if v == "<>":                # grammar.y CMP_NE alias
                v = "!="
            right = self._add()
            if v == "==" and isinstance(right, list) and right and \
                    right[0] == "_array":
                return ["in", left, right[1:]]
            if v == "!=" and isinstance(right, list) and right and \
                    right[0] == "_array":
                return ["not", ["in", left, right[1:]]]
            return [v, left, right]
        if k == "word" and v in ("contains", "startswith",
                                 "contains_i", "startswith_i"):
            self.next()
            return [v, left, self._add()]
        return left

    def _add(self):
        left = self._mul()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("+", "-", "&"):
                self.next()
                left = [v, left, self._mul()]
            else:
                return left

    def _mul(self):
        left = self._atom()
        while self.accept("op", "*"):
            left = ["*", left, self._atom()]
        return left

    def _atom(self):
        k, v = self.next()
        if k == "prop":
            name = v[1:]
            if v.startswith("$!"):
                return ["prop", v]        # JSON-tree path kept verbatim
            return ["prop", name]
        if k == "str":
            return ["lit", v]
        if k == "num":
            return float(v) if "." in v else int(v)
        if k == "op" and v == "(":
            e = self.expr()
            self.expect("op", ")")
            return e
        if k == "op" and v == "-":
            # unary minus (grammar.y UMINUS) — binds to the next atom
            return ["-", 0, self._atom()]
        if k == "op" and v == "[":
            vals = ["_array"]
            while not self.accept("op", "]"):
                kk, vv = self.next()
                if kk == "eof":          # truncated array literal
                    raise ParseError("unterminated [list] in expression")
                if kk == "op" and vv == ",":
                    continue
                vals.append(float(vv) if kk == "num" and "." in vv
                            else int(vv) if kk == "num" else vv)
            return vals
        if k == "word" and v == "prifilt":
            self.expect("op", "(")
            pat = self.expect("str")
            self.expect("op", ")")
            return ["prifilt", pat]
        if k == "word" and v == "exists":
            # exists($!a!b) — key presence in the JSON tree
            self.expect("op", "(")
            p = self.expect("prop")
            self.expect("op", ")")
            return ["exists", p]
        if k == "word" and v in ("script_error",
                                 "previous_action_suspended"):
            # zero-arg execution-state functions (grammar/rainerscript.c
            # :2792 / :3762) — dedicated expr ops, not REGISTRY kernels
            self.expect("op", "(")
            self.expect("op", ")")
            return [v]
        if k == "word" and v == "exec_template":
            # exec_template("name") (grammar/rainerscript.c:1697) — the
            # named template must already be defined; resolves to the
            # ("template", spec) expr op at parse time
            self.expect("op", "(")
            tname = self.expect("str")
            self.expect("op", ")")
            if tname not in self.templates:
                raise ParseError(
                    f"exec_template of undefined template {tname!r}")
            return ["template", self.templates[tname]]
        if k == "word" and v == "lookup":
            # lookup("table", key-expr) (grammar doFunct_Lookup)
            self.expect("op", "(")
            tname = self.expect("str")
            self.expect("op", ",")
            key = self.expr()
            self.expect("op", ")")
            return ["lookup", tname, key]
        if k == "word" and self.peek() == ("op", "("):
            # registry function call f(arg, ...) — the fm* loadable-module
            # surface (functions.REGISTRY); unknown names fail at parse
            # time like the reference's unresolved-function config error
            from .functions import REGISTRY
            if v not in REGISTRY:
                raise ParseError(f"unknown function {v!r}")
            self.next()  # "("
            args: list = []
            if not self.accept("op", ")"):
                args.append(self.expr())
                while self.accept("op", ","):
                    args.append(self.expr())
                self.expect("op", ")")
            return ["call", v] + args
        raise ParseError(f"unexpected token {v!r} in expression")

    # -- statements -------------------------------------------------------
    def statements(self, stop_at="}") -> list[dict]:
        out = []
        while True:
            k, v = self.peek()
            if (k == "op" and v == stop_at) or k == "eof":
                return out
            out.extend(self.statement())

    def statement(self) -> list[dict]:
        k, v = self.peek()
        if k == "word" and v == "action":
            self.next()
            p = self.params()
            self._auto += 1
            a = {"name": p.get("name", f"action_{self._auto}")}
            if "template" in p:
                a["template"] = p["template"]
            for src_key, dst in (("partition_by", "partition_by"),
                                 ("dynaFile", "partition_by"),
                                 ("format", "format"),
                                 ("keep_columns", "keep_columns")):
                if src_key in p:
                    a[dst] = p[src_key]
            if p.get("zipLevel"):
                a["zip_level"] = int(p["zipLevel"])
            if p.get("type") == "omdiscard":
                a["kind"] = "stop"
            self.accept("op", ";")
            return [a]
        if k == "op" and v == ";":      # empty statement
            self.next()
            return []
        if k == "ltarget" or (k == "op" and v == "*"):
            # classic sysklogd action target (runtime/conf.c
            # cflineDoAction): '/path' or '-/path' (omfile, '-' = legacy
            # async flag), '@host'/'@@host' (omfwd UDP/TCP),
            # ':omusrmsg:users' or bare '*' (wall message)
            self.next()
            return [self._legacy_action(v)]
        if k == "word" and v == "stop" or (k == "op" and v == "~"):
            self.next()
            self.accept("op", ";")
            return [{"name": f"stop_{self.i}", "kind": "stop"}]
        if k == "word" and v == "continue":
            # no-op statement (lexer.l CONTINUE → S_NOP): common as an
            # empty else-branch
            self.next()
            self.accept("op", ";")
            return []
        if k == "word" and v == "foreach":
            # foreach ($.x in <expr>) do { body } (grammar/grammar.y
            # S_FOREACH; runtime/ruleset.c:323-417 execForeach) — compiles
            # to a kind="foreach" statement whose body is a nested
            # statement list (stages/route.py _exec_foreach explodes the
            # iterable per stages/foreach.py semantics)
            self.next()
            self.expect("op", "(")
            kk, var = self.next()
            if kk != "prop" or not var.startswith(("$.", "$!")):
                raise ParseError(
                    f"foreach iterator must be a $./$! variable, got {var!r}")
            self.expect("word", "in")
            it = self.expr()
            self.expect("op", ")")
            self.accept("word", "do")
            body = self.block_or_stmt()
            self._auto += 1
            return [{"name": f"foreach_{self._auto}", "kind": "foreach",
                     "var": var, "value": it, "body": body}]
        if k == "word" and v in ("set", "reset"):
            # set $!a!b = expr; / set $.local = expr; — `reset` is the
            # overwrite-allowed spelling (grammar.y RESET), identical
            # here since set already overwrites
            self.next()
            var = self.expect("prop")
            self.expect("op", "=")
            val = self.expr()
            self.accept("op", ";")
            self._auto += 1
            if (isinstance(val, list) and len(val) == 4
                    and val[:2] == ["call", "parse_json"]
                    and isinstance(val[3], list) and val[3]
                    and val[3][0] == "lit"):
                # two-arg parse_json(str, "$!path") (grammar/
                # rainerscript.c:1781 / rscript_parse_json.sh): parses
                # into the NAMED tree path and yields errno — desugars
                # to `set <path> = parse_json(s); set var =
                # script_error();` (parse_json sets the errno state)
                path = str(val[3][1]).lstrip("\\")
                return [
                    {"name": f"set_{self._auto}", "kind": "set",
                     "var": path, "raw_json": True,
                     "value": ["call", "parse_json", val[2]]},
                    {"name": f"set_{self._auto}_err", "kind": "set",
                     "var": var, "value": ["script_error"]},
                ]
            return [{"name": f"set_{self._auto}", "kind": "set",
                     "var": var, "value": val}]
        if k == "word" and v == "unset":
            self.next()
            var = self.expect("prop")
            self.accept("op", ";")
            self._auto += 1
            return [{"name": f"unset_{self._auto}", "kind": "unset",
                     "var": var}]
        if k == "word" and v == "call":
            self.next()
            name = self.next()[1]
            self.accept("op", ";")
            if name not in self.rulesets:
                raise ParseError(f"call of undefined ruleset {name!r}")
            return [{"name": f"call_{name}", "kind": "call",
                     "ruleset": self.rulesets[name]}]
        if k == "word" and v == "call_indirect":
            # grammar.y CALL_INDIRECT expr ';' (lexer.l:336): the target
            # ruleset name is an arbitrary expression; it resolves at
            # run time against every ruleset defined so far
            self.next()
            target_expr = self.expr()
            self.accept("op", ";")
            self._auto += 1
            return [{"name": f"call_indirect_{self._auto}",
                     "kind": "call_indirect", "value": target_expr,
                     "rulesets": dict(self.rulesets)}]
        if k == "pfilt":
            # classic property-based filter line (lexer.l PROPFILT):
            #   :propname, [!]compare-op, "value" <statement-or-block>
            self.next()
            m = _PROPFILT_RE.match(v)
            if not m:
                raise ParseError(f"bad property filter {v!r}")
            prop, neg, cmp_op, val = m.groups()
            val = re.sub(r"\\(.)", r"\1", val)
            pexpr = ["prop", prop.lstrip("$")]
            ops = {"contains": lambda: ["contains", pexpr, ["lit", val]],
                   "isequal": lambda: ["==", pexpr, ["lit", val]],
                   "startswith": lambda: ["startswith", pexpr, ["lit", val]],
                   "isempty": lambda: ["isempty", pexpr],
                   "regex": lambda: ["regex", pexpr, val],
                   "ereregex": lambda: ["regex", pexpr, val]}
            if cmp_op not in ops:
                raise ParseError(
                    f"invalid compare operation {cmp_op!r} in {v!r}")
            cond = ops[cmp_op]()
            if neg:
                cond = ["not", cond]
            return [self._and_filter(s, cond)
                    for s in self.block_or_stmt()]
        if k == "sel":
            # classic PRI selector line: 'local0.err <statement>' /
            # '*.info;mail.none { ... }' — the most common rsyslog form;
            # identical semantics to if prifilt('<sel>') then <statement>
            self.next()
            out = []
            for stmt in self.block_or_stmt():
                out.append(self._and_filter(stmt, ["prifilt", v]))
            return out
        if k == "word" and v == "if":
            self.next()
            cond = self.expr()
            self.expect("word", "then")
            then_stmts = self.block_or_stmt()
            else_stmts = []
            if self.accept("word", "else"):
                else_stmts = self.block_or_stmt()
            # statements with NO possible mutation-after-condition hazard
            # flatten via filter-conjunction (cheap, no extra statement);
            # the general case compiles to a first-class `if` statement
            # whose condition is evaluated ONCE at this position (grammar.y
            # S_IF semantics) — a branch mutating a condition variable
            # must not re-route rows (rscript_eq_var.sh)
            muts = ("set", "unset", "call", "call_indirect", "foreach",
                    "if")

            def _no_muts(stmts):
                return not any(s.get("kind") in muts for s in stmts)

            if not else_stmts and _no_muts(then_stmts):
                return [self._and_filter(s, cond) for s in then_stmts]
            if not then_stmts and _no_muts(else_stmts):
                return [self._and_filter(s, ["not", cond])
                        for s in else_stmts]
            self._auto += 1
            return [{"name": f"if_{self._auto}", "kind": "if",
                     "filter": cond,
                     "then": {"name": f"if_{self._auto}_then",
                              "actions": then_stmts},
                     "else": ({"name": f"if_{self._auto}_else",
                               "actions": else_stmts}
                              if else_stmts else None)}]
        raise ParseError(f"unexpected statement start {v!r}")

    def _include(self, pattern: str | None, optional: bool = False) -> None:
        """Splice the token stream of every file matching `pattern` (glob,
        sorted) into the current position — include(file=) and
        $IncludeConfig both route here. Templates/rulesets/directives in
        included files behave exactly as if inlined."""
        import glob as _glob
        if not pattern:
            raise ParseError("include needs file=")
        files = sorted(_glob.glob(pattern))
        if not files and not optional:
            raise ParseError(f"include: no file matches {pattern!r}")
        toks: list = []
        for f in files:
            with open(f, encoding="utf-8") as fh:
                t = _tokenize(fh.read())
            toks.extend(t[:-1])                 # drop the eof marker
        self.toks[self.i:self.i] = toks

    def _legacy_directive(self, name: str) -> None:
        """Legacy `$Directive` lines (runtime/conf.c cfsysline):
        $ModLoad (mm*/pm* stages load, wire transports ignored — the
        engine provides them natively), $template name,"fmt" (options
        after a second comma are ignored), $ActionFileDefaultTemplate,
        and a one-argument accept-and-ignore for the remaining
        housekeeping directives ($FileOwner, $umask, $UDPServerRun, …).
        Multi-argument exotic directives are outside the subset."""
        self.next()                                # the $Directive token
        if name == "$ModLoad":
            mod = self.next()[1].rsplit("/", 1)[-1]
            mod = mod[:-3] if mod.endswith(".so") else mod
            from .config import STAGE_REGISTRY
            if mod in STAGE_REGISTRY:
                self.modifiers.append(mod)
        elif name == "$template":
            tname = self.next()[1]
            self.expect("op", ",")
            fmt = self.expect("str")
            while self.accept("op", ","):
                self.next()                        # template option
            self.templates[tname] = fmt
        elif name == "$ActionFileDefaultTemplate":
            self.file_default_template = self.next()[1]
        elif name == "$IncludeConfig":
            # legacy include: one path/glob argument; missing matches are
            # ignored (the reference warns and continues)
            k, v = self.next()
            self._include(v, optional=True)
        elif self.peek()[0] != "eof":
            self.next()                            # one-arg ignore

    def _legacy_action(self, target: str) -> dict:
        """Classic action target → write action dict. Sinks are Parquet/
        text roots under the run's out_root (wire targets stand in as
        named text sinks, the repo-wide transport substitution)."""
        self._auto += 1
        # classic ';template' suffix (conf.c cflineDoAction): selects the
        # output template; '?name' is an omfile DYNAFILE whose name
        # template renders the path (our sinks are per-action roots, so
        # the dynafile name becomes the sink name)
        tplsuffix = None
        if ";" in target and not target.startswith(":"):
            target, _, tplsuffix = target.partition(";")
        dynafile = target.startswith("?")
        if dynafile:
            target = target[1:]
        name = re.sub(r"[^A-Za-z0-9_.-]+", "_", target).strip("_") \
            or f"action_{self._auto}"
        if dynafile:
            name = f"dyn_{name}"
            tpl = tplsuffix or self.file_default_template
            if not hasattr(self, "_legacy_names"):
                self._legacy_names = {}
            seen = self._legacy_names.get(name, 0)
            self._legacy_names[name] = seen + 1
            if seen:
                name = f"{name}_{seen + 1}"
            return {"name": name, "template": tpl, "format": "text"}
        if target == "*" or target.startswith(":omusrmsg:"):
            tpl = "RSYSLOG_TraditionalFileFormat"   # wall-message text
            name = f"usrmsg_{name}" if target != "*" else "usrmsg_all"
        elif target.startswith("@"):
            tpl = "RSYSLOG_ForwardFormat"           # omfwd @/@@ target
            name = f"fwd_{name.lstrip('@')}"
        else:
            tpl = tplsuffix or self.file_default_template  # omfile path
            if target.startswith("-"):              # '-' async flag
                name = name.lstrip("-_")
        # the same target on several selector lines is idiomatic sysklogd
        # (each matching line writes); sink dirs are per-action, so later
        # lines get a numbered sibling instead of a name collision
        if not hasattr(self, "_legacy_names"):
            self._legacy_names: dict[str, int] = {}
        seen = self._legacy_names.get(name, 0)
        self._legacy_names[name] = seen + 1
        if seen:
            name = f"{name}_{seen + 1}"
        return {"name": name, "template": tpl, "format": "text"}

    def block_or_stmt(self) -> list[dict]:
        if self.accept("op", "{"):
            stmts = self.statements("}")
            self.expect("op", "}")
            return stmts
        return self.statement()

    @staticmethod
    def _and_filter(stmt: dict, cond) -> dict:
        stmt = dict(stmt)
        if stmt.get("kind") == "call":
            # gate the call action itself; the callee spec is untouched
            pass
        if "filter" in stmt and stmt["filter"] is not None:
            stmt["filter"] = ["and", cond, stmt["filter"]]
        else:
            stmt["filter"] = cond
        return stmt

    # -- top level --------------------------------------------------------
    def parse(self) -> dict:
        main_stmts: list[dict] = []
        while self.peek()[0] != "eof":
            k, v = self.peek()
            if k == "word" and v == "template":
                self.next()
                p = self.params()
                ttype = p.get("type", "string")
                # template-level escape options (template.h
                # optFormatEscape: option.sql / option.stdsql /
                # option.json, mutually exclusive in the reference)
                esc = next((e for e in ("sql", "stdsql", "jsonf", "json")
                            if str(p.get(f"option.{e}", "")).lower()
                            in ("on", "1", "true", "yes")), None)
                if ttype == "string":
                    self.templates[p["name"]] = (
                        {"type": "string", "name": p["name"],
                         "string": p["string"], "escape": esc}
                        if esc else p["string"])
                elif ttype == "list":
                    # template(type="list") { constant(...) property(...) }
                    # (template.c:1226 list path) → entry-dict spec that
                    # templates.Template compiles onto the TplEntry chain
                    entries = []
                    self.expect("op", "{")
                    while not self.accept("op", "}"):
                        kk, vv = self.next()
                        if kk == "op" and vv == ";":
                            continue
                        if kk != "word" or vv not in ("constant",
                                                      "property"):
                            raise ParseError(
                                f"unexpected {vv!r} in list template body")
                        ep = self.params()
                        ep["kind"] = vv
                        entries.append(ep)
                    self.templates[p["name"]] = {
                        "type": "list", "name": p["name"],
                        "entries": entries, "escape": esc}
                elif ttype == "subtree":
                    # template(type="subtree" subtree="$!...") —
                    # template.c:1926
                    self.templates[p["name"]] = {
                        "type": "subtree", "name": p["name"],
                        "subtree": p.get("subtree", "$!")}
                else:
                    raise ParseError(
                        f"unsupported template type {ttype!r}")
            elif k == "word" and v == "module":
                self.next()
                p = self.params()
                load = p.pop("load")
                # module parameters pass through to the stage callable
                # (module(load="mmnormalize" rulebase="...") etc.);
                # loads without params keep the plain-string form
                self.modifiers.append(
                    {"name": load, "args": p} if p else load)
            elif k == "word" and v in ("input", "global", "main_queue",
                                       "timezone", "parser"):
                # accepted and ignored (grammar.y obj types,
                # rainerscript.h:35-49): wire inputs, global tuning and
                # queue parameters are native to the Ray engine — parsing
                # them keeps stock distro rsyslog.conf files loadable
                self.next()
                self.params()
            elif k == "word" and v == "include":
                # modern include(file="...") (rsyslog 8.33+): splice the
                # included file's tokens into the stream at this point —
                # glob patterns expand in sorted order, missing files
                # raise unless mode="optional"
                self.next()
                p = self.params()
                self._include(p.get("file"),
                              optional=p.get("mode") == "optional")
            elif k == "prop" and not v.startswith(("$!", "$.")):
                # a top-level `$name` line can only be a legacy cfsysline
                # directive — statements never begin with a property
                self._legacy_directive(v)
            elif k == "word" and v == "lookup_table":
                # lookup_table(name="t" file="/path.json") —
                # plugins/lookup tables (runtime/lookup.c loadTable)
                self.next()
                p = self.params()
                if "file" not in p:
                    raise ParseError("lookup_table needs file=")
                self.lookup_tables[p["name"]] = {"file": p["file"]}
            elif k == "word" and v == "dyn_stats":
                # dyn_stats(name="b" maxCardinality="500"
                #           unusedMetricLife="600" resettable="on") —
                # dynstats bucket declaration (runtime/dynstats.c:35-46,
                # dynstats_newBucket :308); consumed by dyn_inc()
                self.next()
                p = self.params()
                if "name" not in p:
                    raise ParseError("dyn_stats needs name=")
                self.dynstats[p["name"]] = {
                    "max_cardinality": int(p.get("maxCardinality", 2000)),
                    "unused_metric_life_s":
                        int(p.get("unusedMetricLife", 3600)),
                    "resettable": str(p.get("resettable", "on"))
                        in ("on", "1", "true"),
                }
            elif k == "word" and v == "ruleset":
                self.next()
                p = self.params()
                self.expect("op", "{")
                stmts = self.statements("}")
                self.expect("op", "}")
                self.rulesets[p["name"]] = {"name": p["name"],
                                            "actions": stmts}
            else:
                main_stmts.extend(self.statement())
        cfg: dict = {"ruleset": {"name": "main", "actions": main_stmts}}
        if self.templates:
            cfg["templates"] = self.templates
        if self.modifiers:
            cfg["modifiers"] = self.modifiers
        if self.lookup_tables:
            cfg["lookup_tables"] = self.lookup_tables
        if self.dynstats:
            cfg["dynstats"] = self.dynstats
        return cfg


def parse_rainerscript(src: str) -> dict:
    """RainerScript (subset) text → config dict for config.load_config."""
    return _Parser(src).parse()


def load_rainerscript(src: str):
    """Parse + compile in one step → CompiledConfig."""
    from .config import load_config
    return load_config(parse_rainerscript(src))
