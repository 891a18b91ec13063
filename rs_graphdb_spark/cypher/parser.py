"""Recursive-descent Cypher parser.

Covers the reference grammar (`/root/reference/src/cypher/parser.rs`):
MATCH / OPTIONAL MATCH / WHERE / RETURN (aggregates, DISTINCT, AS) /
GROUP BY (reference extension, `:589-613`) / ORDER BY / SKIP / LIMIT /
UNION [ALL] (`:817-853`) / CREATE / DELETE / SET / MERGE.

Dispatch is by grammar, not keyword sniffing — reference quirk #9
(`src/cypher/parser.rs:855-929` dispatches on `input.contains("delete")`,
which misfires on literals containing keywords).
"""

from __future__ import annotations

import re

from rs_graphdb_spark.cypher import ast

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<float>-?\d+\.\d+)
  | (?P<int>-?\d+)
  | (?P<string>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<name>[A-Za-z_][A-Za-z0-9_#]*)
  | (?P<op><=|>=|<>|=~|<-|->|\.\.|[()\[\]{}:,.\-<>=*|])
    """,
    re.VERBOSE,
)

_AGGS = {
    "count", "sum", "avg", "min", "max", "collect",
    "stdev", "stdevp", "percentilecont", "percentiledisc",
}


class CypherSyntaxError(ValueError):
    pass


def _tokenize(text: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise CypherSyntaxError(f"bad token at: {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


class _P:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0

    # -- token helpers ---------------------------------------------------
    def peek(self, k: int = 0) -> tuple[str, str]:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def kw(self, word: str) -> bool:
        t, v = self.peek()
        return t == "name" and v.lower() == word.lower()

    def eat_kw(self, word: str) -> None:
        if not self.kw(word):
            raise CypherSyntaxError(f"expected {word}, got {self.peek()[1]!r}")
        self.i += 1

    def try_kw(self, word: str) -> bool:
        if self.kw(word):
            self.i += 1
            return True
        return False

    def eat_op(self, op: str) -> None:
        t, v = self.peek()
        if t != "op" or v != op:
            raise CypherSyntaxError(f"expected {op!r}, got {v!r}")
        self.i += 1

    def try_op(self, op: str) -> bool:
        t, v = self.peek()
        if t == "op" and v == op:
            self.i += 1
            return True
        return False

    def name(self) -> str:
        t, v = self.peek()
        if t != "name":
            raise CypherSyntaxError(f"expected identifier, got {v!r}")
        self.i += 1
        return v

    def literal(self):
        t, v = self.peek()
        self.i += 1
        if t == "int":
            return int(v)
        if t == "float":
            return float(v)
        if t == "string":
            return v[1:-1].replace("\\'", "'").replace('\\"', '"')
        if t == "name" and v.lower() in ("true", "false"):
            return v.lower() == "true"
        if t == "name" and v.lower() == "null":
            return None
        if t == "op" and v == "[":
            items = []
            if not self.try_op("]"):
                items.append(self.literal())
                while self.try_op(","):
                    items.append(self.literal())
                self.eat_op("]")
            return items
        raise CypherSyntaxError(f"expected literal, got {v!r}")

    # -- patterns --------------------------------------------------------
    def node_pattern(self, anon: list) -> ast.NodePattern:
        self.eat_op("(")
        var = None
        label = None
        props: list = []
        t, v = self.peek()
        if t == "name":
            var = self.name()
        if self.try_op(":"):
            label = self.name()
        if self.try_op("{"):
            while True:
                k = self.name()
                self.eat_op(":")
                props.append((k, self.literal()))
                if not self.try_op(","):
                    break
            self.eat_op("}")
        if var is None:
            var = f"_anon{len(anon)}"
            anon.append(var)
        self.eat_op(")")
        return ast.NodePattern(var=var, label=label, props=tuple(props))

    def rel_pattern(self) -> ast.RelPattern | None:
        # -[:T]->  |  <-[:T]-  |  -[:T]-
        t, v = self.peek()
        if not (t == "op" and v in ("-", "<-")):
            return None
        incoming = v == "<-"
        self.i += 1
        self.eat_op("[")
        t2, v2 = self.peek()
        if t2 == "name":  # relationship variable, unused for binding
            self.i += 1
        self.eat_op(":")
        rel_type = self.name()
        min_h, max_h = 1, 1
        if self.try_op("*"):
            # * | *n | *n..m | *..m | *n..  (src/cypher/parser.rs:151-175)
            min_h, max_h = 1, None
            t3, v3 = self.peek()
            if t3 == "int":
                self.i += 1
                min_h = int(v3)
                max_h = min_h
                if self.try_op(".."):
                    t4, v4 = self.peek()
                    if t4 == "int":
                        self.i += 1
                        max_h = int(v4)
                    else:
                        max_h = None
            elif self.try_op(".."):
                t4, v4 = self.peek()
                if t4 == "int":
                    self.i += 1
                    min_h, max_h = 1, int(v4)
        self.eat_op("]")
        if incoming:
            self.eat_op("-")
            direction = "in"
        elif self.try_op("->"):
            direction = "out"
        else:
            self.eat_op("-")
            direction = "both"
        return ast.RelPattern(rel_type=rel_type, direction=direction,
                              min_hops=min_h, max_hops=max_h)

    def pattern_path(self, anon: list) -> ast.PatternPath:
        start = self.node_pattern(anon)
        hops = []
        while True:
            rel = self.rel_pattern()
            if rel is None:
                break
            node = self.node_pattern(anon)
            hops.append((rel, node))
        return ast.PatternPath(start=start, hops=tuple(hops))

    def match_clause(self, anon: list, optional: bool) -> ast.MatchClause:
        self.eat_kw("match")
        paths = [self.pattern_path(anon)]
        while self.try_op(","):
            paths.append(self.pattern_path(anon))
        return ast.MatchClause(paths=tuple(paths), optional=optional)

    # -- expressions -----------------------------------------------------
    def prop_ref(self) -> ast.Prop:
        var = self.name()
        self.eat_op(".")
        return ast.Prop(var=var, key=self.name())

    def operand(self):
        t, v = self.peek()
        if t == "name" and self.peek(1) == ("op", "."):
            return self.prop_ref()
        return ast.Lit(self.literal())

    def condition(self):
        if self.try_kw("exists"):
            self.eat_op("(")
            p = self.prop_ref()
            self.eat_op(")")
            return ast.Exists(p)
        if self.try_op("("):
            e = self.or_expr()
            self.eat_op(")")
            return e
        if self.try_kw("not"):
            return ast.Not(self.condition())
        left = self.operand()
        if self.kw("is"):
            self.i += 1
            negate = self.try_kw("not")
            self.eat_kw("null")
            return ast.IsNull(left, negate=negate)
        if self.try_kw("in"):
            return ast.Cmp("in", left, ast.Lit(self.literal()))
        t, v = self.peek()
        if t == "op" and v in ("=", "<>", ">", "<", ">=", "<=", "=~"):
            self.i += 1
            return ast.Cmp(v, left, self.operand())
        raise CypherSyntaxError(f"expected comparison, got {v!r}")

    def and_expr(self):
        items = [self.condition()]
        while self.try_kw("and"):
            items.append(self.condition())
        return items[0] if len(items) == 1 else ast.BoolOp("and", tuple(items))

    def or_expr(self):
        items = [self.and_expr()]
        while self.try_kw("or"):
            items.append(self.and_expr())
        return items[0] if len(items) == 1 else ast.BoolOp("or", tuple(items))

    # -- return ----------------------------------------------------------
    def return_item(self) -> ast.ReturnItem:
        t, v = self.peek()
        if t == "name" and v.lower() in _AGGS and self.peek(1) == ("op", "("):
            agg = v.lower()
            self.i += 2
            distinct = self.try_kw("distinct")
            if self.try_op("*"):
                expr = None
            else:
                expr = self.prop_ref()
            q = None
            if self.try_op(","):
                q = float(self.literal())
            self.eat_op(")")
            alias = self.name() if self.try_kw("as") else None
            return ast.ReturnItem(expr=expr, alias=alias, agg=agg,
                                  agg_param=q, distinct=distinct)
        if t == "name" and self.peek(1) == ("op", "."):
            p = self.prop_ref()
            alias = self.name() if self.try_kw("as") else None
            return ast.ReturnItem(expr=p, alias=alias)
        var = self.name()
        alias = self.name() if self.try_kw("as") else None
        return ast.ReturnItem(expr=var, alias=alias)

    def read_tail(self, matches, anon) -> ast.ReadQuery:
        # clause pipeline: WHERE / WITH / further MATCHes in source order
        # (a bare WHERE is a WithClause that keeps every variable)
        where = None
        while True:
            if self.try_kw("where"):
                matches.append(ast.WithClause(vars=(), where=self.or_expr()))
            elif self.kw("with"):
                self.i += 1
                wvars: list = []
                wprops: list = []

                def _with_item():
                    if self.peek(1) == ("op", "."):
                        p = self.prop_ref()
                        alias = self.name() if self.try_kw("as") else None
                        wprops.append((p, alias))
                    else:
                        wvars.append(self.name())

                _with_item()
                while self.try_op(","):
                    _with_item()
                wwhere = self.or_expr() if self.try_kw("where") else None
                matches.append(ast.WithClause(
                    vars=tuple(wvars), where=wwhere, props=tuple(wprops)
                ))
            elif self.kw("match") or self.kw("optional"):
                optional = self.try_kw("optional")
                matches.append(self.match_clause(anon, optional))
            else:
                break
        self.eat_kw("return")
        distinct = self.try_kw("distinct")
        items = [self.return_item()]
        while self.try_op(","):
            items.append(self.return_item())
        group_by: list = []
        if self.try_kw("group"):
            self.eat_kw("by")

            def _group_key():
                # `GROUP BY n.prop` or `GROUP BY alias` — the reference
                # accepts the RETURN-item alias form
                # (`tests/aggregation_enhanced_test.rs:386-396`)
                if self.peek(1) == ("op", "."):
                    return self.prop_ref()
                alias = self.name()
                for it in items:
                    if it.alias == alias and isinstance(it.expr, ast.Prop):
                        return it.expr
                raise CypherSyntaxError(
                    f"GROUP BY {alias!r} does not name a returned property"
                )

            group_by.append(_group_key())
            while self.try_op(","):
                group_by.append(_group_key())
        order_by: list = []
        if self.try_kw("order"):
            self.eat_kw("by")
            while True:
                if self.peek(1) == ("op", "."):
                    p = self.prop_ref()
                    key = f"{p.var}.{p.key}"
                else:
                    key = self.name()
                asc = True
                if self.try_kw("desc"):
                    asc = False
                elif self.try_kw("asc"):
                    asc = True
                order_by.append(ast.OrderItem(key=key, asc=asc))
                if not self.try_op(","):
                    break
        skip = limit = None
        if self.try_kw("skip"):
            skip = int(self.literal())
        if self.try_kw("limit"):
            limit = int(self.literal())
        return ast.ReadQuery(
            matches=tuple(matches), where=where, items=tuple(items),
            ret_distinct=distinct, group_by=tuple(group_by),
            order_by=tuple(order_by), skip=skip, limit=limit,
        )

    def read_query(self) -> ast.ReadQuery:
        anon: list = []
        matches: list = []
        optional = self.try_kw("optional")
        matches.append(self.match_clause(anon, optional))
        return self.read_tail(matches, anon)

    # -- statements ------------------------------------------------------
    def _leading_with_literals(self):
        """`WITH 30 AS min_age [, ...] MATCH ...` — literal parameter
        bindings at statement start (reference
        `tests/call_enhanced_test.rs:77-106`, where the scenario is
        accepted-or-skipped; here it executes). Implemented as token
        substitution: every later BARE use of a bound name becomes its
        literal token, then the remaining statement parses normally.
        Property refs (`x.name`), labels (`:x`), aliases (`AS x`) and
        calls (`x(`) are never substituted."""
        self.i += 1  # WITH
        bindings: dict[str, tuple[str, str]] = {}
        while True:
            tok = self.peek()
            if tok[0] not in ("int", "float", "string"):
                raise CypherSyntaxError(
                    "leading WITH binds scalar literals only"
                )
            self.i += 1
            self.eat_kw("as")
            bindings[self.name()] = tok
            if not self.try_op(","):
                break
        for j in range(self.i, len(self.toks)):
            t, v = self.toks[j]
            if t != "name" or v not in bindings:
                continue
            prev = self.toks[j - 1]
            nxt = self.toks[j + 1] if j + 1 < len(self.toks) else ("eof", "")
            if prev in (("op", "."), ("op", ":")) or prev == ("name", "AS") \
                    or prev[0] == "name" and prev[1].lower() == "as":
                continue
            if nxt[1] in (".", ":", "("):
                continue
            self.toks[j] = bindings[v]
        return self.statement()

    def set_updates(self) -> tuple[str, tuple]:
        """`SET v.k = lit [, v.k2 = lit2]` → (var, ((k, lit), ...))."""
        var = None
        updates = []
        while True:
            p = self.prop_ref()
            if var is None:
                var = p.var
            elif p.var != var:
                raise CypherSyntaxError("SET supports one variable per statement")
            self.eat_op("=")
            updates.append((p.key, self.literal()))
            if not self.try_op(","):
                break
        return var, tuple(updates)

    def statement(self):
        if self.kw("with") and self.peek(1)[0] in ("int", "float", "string"):
            return self._leading_with_literals()
        for tx in ("begin", "commit", "rollback"):
            if self.kw(tx):
                self.i += 1
                if tx == "begin" and self.try_kw("transaction"):
                    pass
                return ast.TransactionStmt(kind=tx)
        if self.kw("create"):
            self.i += 1
            anon: list = []
            nodes = [self.node_pattern(anon)]
            t, v = self.peek()
            if t == "op" and v in ("-", "<-"):  # CREATE path form
                rel = self.rel_pattern()
                if rel.direction == "both":
                    raise CypherSyntaxError("CREATE rejects undirected relationships")
                dst = self.node_pattern(anon)
                return ast.CreateRelStmt(
                    path=ast.PatternPath(start=nodes[0], hops=((rel, dst),))
                )
            while self.try_op(","):
                nodes.append(self.node_pattern(anon))
            return ast.CreateStmt(nodes=tuple(nodes))
        if self.kw("merge"):
            self.i += 1
            anon = []
            node = self.node_pattern(anon)
            t, v = self.peek()
            if t == "op" and v in ("-", "<-"):  # relationship MERGE
                hops = []
                while True:  # chained path: (a)-[:T1]->(b)-[:T2]->(c)...
                    rel = self.rel_pattern()
                    if rel.direction == "both":
                        raise CypherSyntaxError(
                            "MERGE rejects undirected relationships"
                        )
                    hops.append((rel, self.node_pattern(anon)))
                    t, v = self.peek()
                    if not (t == "op" and v in ("-", "<-")):
                        break
                rel_on_create: tuple = ()
                rel_on_match: tuple = ()
                rel_on_create_var = rel_on_match_var = None
                while self.kw("on"):
                    self.i += 1
                    if self.try_kw("create"):
                        self.eat_kw("set")
                        rel_on_create_var, rel_on_create = self.set_updates()
                    else:
                        self.eat_kw("match")
                        self.eat_kw("set")
                        rel_on_match_var, rel_on_match = self.set_updates()
                return ast.MergeRelStmt(
                    path=ast.PatternPath(start=node, hops=tuple(hops)),
                    on_create=rel_on_create,
                    on_match=rel_on_match,
                    on_create_var=rel_on_create_var,
                    on_match_var=rel_on_match_var,
                )
            on_create: tuple = ()
            on_match: tuple = ()
            while self.kw("on"):
                self.i += 1
                if self.try_kw("create"):
                    self.eat_kw("set")
                    _, on_create = self.set_updates()
                else:
                    self.eat_kw("match")
                    self.eat_kw("set")
                    _, on_match = self.set_updates()
            return ast.MergeStmt(node=node, on_create=on_create, on_match=on_match)
        if self.kw("foreach"):
            # FOREACH (v IN [ids] | SET v.k = lit, ...)
            # (`src/cypher/parser.rs:724-759`)
            self.i += 1
            self.eat_op("(")
            var = self.name()
            self.eat_kw("in")
            ids = self.literal()
            if not isinstance(ids, list):
                raise CypherSyntaxError("FOREACH needs a literal list")
            self.eat_op("|")
            self.eat_kw("set")
            uvar, updates = self.set_updates()
            if uvar != var:
                raise CypherSyntaxError("FOREACH SET must target the loop variable")
            self.eat_op(")")
            return ast.ForeachStmt(var=var, ids=tuple(ids), updates=updates)
        if self.kw("call"):
            # CALL { subquery } RETURN cols (`src/cypher/parser.rs:761-815`)
            self.i += 1
            self.eat_op("{")
            inner = self.statement()
            if not isinstance(inner, ast.ReadQuery):
                raise CypherSyntaxError("CALL subquery must be a read query")
            self.eat_op("}")
            input_vars: tuple = ()
            if self.try_kw("in"):
                # CALL { ... } IN (v1, v2): recorded on the AST; the
                # reference treats the clause as syntax-only too
                # (`tests/call_enhanced_test.rs:49-51` "IN 子句只是语法支持")
                self.eat_op("(")
                vs = [self.name()]
                while self.try_op(","):
                    vs.append(self.name())
                self.eat_op(")")
                input_vars = tuple(vs)
            self.eat_kw("return")
            items = []
            while True:
                t, v = self.peek()
                if t == "name" and v.lower() in _AGGS and self.peek(1) == ("op", "("):
                    items.append(self.return_item())
                else:
                    nm = self.name()
                    alias = self.name() if self.try_kw("as") else None
                    items.append(ast.ReturnItem(expr=nm, alias=alias))
                if not self.try_op(","):
                    break
            order_by = []
            if self.try_kw("order"):
                self.eat_kw("by")
                while True:
                    key = self.name()
                    asc = not self.try_kw("desc")
                    if asc:
                        self.try_kw("asc")
                    order_by.append(ast.OrderItem(key=key, asc=asc))
                    if not self.try_op(","):
                        break
            skip = int(self.literal()) if self.try_kw("skip") else None
            limit = int(self.literal()) if self.try_kw("limit") else None
            return ast.CallStmt(inner=inner, items=tuple(items),
                                order_by=tuple(order_by), skip=skip,
                                limit=limit, input_vars=input_vars)
        if self.kw("match") or self.kw("optional"):
            # look ahead for DELETE / SET terminal
            anon = []
            matches = [self.match_clause(anon, self.try_kw("optional"))]
            where = None
            if self.try_kw("where"):
                where = self.or_expr()
            if self.try_kw("delete"):
                return ast.DeleteStmt(match=matches[0], where=where, var=self.name())
            if self.try_kw("set"):
                var, updates = self.set_updates()
                return ast.SetStmt(match=matches[0], where=where, var=var,
                                   updates=updates)
            # plain read query continuing from here
            if where is not None:
                matches.append(ast.WithClause(vars=(), where=where))
            return self.read_tail(matches, anon)
        raise CypherSyntaxError(f"unsupported statement start: {self.peek()[1]!r}")

    def parse(self):
        stmt = self.statement()
        parts = [stmt]
        union_all = None
        while self.kw("union"):
            if not isinstance(stmt, ast.ReadQuery):
                raise CypherSyntaxError("UNION only combines read queries")
            self.i += 1
            this_all = self.try_kw("all")
            if union_all is None:
                union_all = this_all
            elif union_all != this_all:
                raise CypherSyntaxError("mixed UNION / UNION ALL")
            parts.append(self.statement())
        t, v = self.peek()
        if t != "eof":
            raise CypherSyntaxError(f"trailing input at {v!r}")
        if len(parts) > 1:
            return ast.UnionQuery(parts=tuple(parts), all=bool(union_all))
        return stmt


def parse_cypher(text: str):
    """Parse one Cypher statement (reference entry
    `src/cypher/parser.rs:945-960`)."""
    return _P(text).parse()
