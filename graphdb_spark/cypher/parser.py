"""Cypher subset parser — hand-rolled tokenizer + recursive descent.

Grammar parity with the reference (cypher_parser.rs) plus the declared
extensions (queries_examples.txt): WHERE expressions, RETURN
projection/aliases/DISTINCT, ORDER BY/SKIP/LIMIT, OPTIONAL MATCH,
UNWIND, SET/REMOVE/DELETE/DETACH DELETE, relationship chains with
var-length `*min..max`, multi-type `:A|B`, multi-label `:A:B` / `:A&B`,
shortestPath(...).

Reference quirks preserved:
- ``is_cypher`` keyword sniff (cypher_parser.rs:76-79)
- multi-statement input (split on newline/semicolon) parses the FIRST
  valid statement (cypher_parser.rs:539-614)
- ``SET key = 'value'`` (no dot) is a KV set; a bare ``DELETE name``
  with no preceding MATCH is a KV delete; ``MATCH (name) RETURN`` with
  no return items is a KV get (cypher_parser.rs:780-804)
- int-preserving number literals (cypher_parser.rs:106-130)
"""

from __future__ import annotations

import re

from graphdb_spark.plans import (
    BinOp,
    CaseExpr,
    FieldAccess,
    CreateClause,
    CypherStatement,
    DeleteClause,
    DeleteKeyValue,
    Func,
    GetKeyValue,
    ListComp,
    ListExpr,
    Lit,
    MatchClause,
    NodePattern,
    OrderItem,
    PathPattern,
    PatternPred,
    Prop,
    RelPattern,
    RemoveClause,
    ReturnClause,
    ReturnItem,
    SetClause,
    SetKeyValue,
    SetPropItem,
    UnaryOp,
    UnionStatement,
    UnwindClause,
    Var,
    WithClause,
)

KEYWORDS = {
    "MATCH", "OPTIONAL", "CREATE", "MERGE", "RETURN", "WHERE", "SET",
    "REMOVE", "DELETE", "DETACH", "UNWIND", "AS", "ORDER", "BY", "SKIP",
    "LIMIT", "DISTINCT", "AND", "OR", "NOT", "XOR", "IN", "CONTAINS",
    "STARTS", "ENDS", "WITH", "IS", "NULL", "TRUE", "FALSE", "ASC",
    "ASCENDING", "DESC", "DESCENDING", "CASE", "WHEN", "THEN", "ELSE",
    "END", "UNION", "ALL",
}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<num>\d+\.\d+|\.\d+|\d+)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<op><>|<=|>=|=~|->|<-|\.\.|[()\[\]{},:;.=<>+\-*/%|&])
    """,
    re.VERBOSE,
)


class CypherSyntaxError(ValueError):
    pass


class Token:
    __slots__ = ("kind", "text", "pos", "orig")

    def __init__(self, kind, text, pos, orig=None):
        self.kind = kind  # 'num' | 'name' | 'kw' | 'str' | 'op' | 'eof'
        self.text = text
        self.pos = pos
        self.orig = orig if orig is not None else text

    def __repr__(self):
        return f"Token({self.kind},{self.text!r})"


def tokenize(s: str) -> list[Token]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise CypherSyntaxError(f"unexpected character {s[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "name" and text.upper() in KEYWORDS:
            out.append(Token("kw", text.upper(), m.start(), orig=text))
        else:
            out.append(Token(kind, text, m.start()))
    out.append(Token("eof", "", len(s)))
    return out


def is_cypher(query: str) -> bool:
    """Keyword sniff (cypher_parser.rs:76-79)."""
    kws = ("MATCH", "CREATE", "SET", "RETURN", "DELETE", "MERGE", "UNWIND",
           "OPTIONAL")
    q = query.strip().upper()
    return any(q.startswith(k) for k in kws)


class Parser:
    def __init__(self, text: str):
        self.toks = tokenize(text)
        self.i = 0

    # ------------------------------------------------------------ helpers

    @property
    def cur(self) -> Token:
        return self.toks[self.i]

    def peek(self, k=1) -> Token:
        j = min(self.i + k, len(self.toks) - 1)
        return self.toks[j]

    def advance(self) -> Token:
        t = self.cur
        self.i += 1
        return t

    def at_kw(self, *kws) -> bool:
        return self.cur.kind == "kw" and self.cur.text in kws

    def at_op(self, *ops) -> bool:
        return self.cur.kind == "op" and self.cur.text in ops

    def expect_kw(self, kw) -> Token:
        if not self.at_kw(kw):
            raise CypherSyntaxError(f"expected {kw} at {self.cur!r}")
        return self.advance()

    def expect_op(self, op) -> Token:
        if not self.at_op(op):
            raise CypherSyntaxError(f"expected {op!r} at {self.cur!r}")
        return self.advance()

    def name(self) -> str:
        if self.cur.kind == "name":
            return self.advance().text
        # keywords double as identifiers wherever an identifier is
        # *required* (labels, rel types like :CONTAINS, property keys,
        # aliases) — original casing preserved via Token.orig
        if self.cur.kind == "kw":
            return self.advance().orig
        raise CypherSyntaxError(f"expected identifier at {self.cur!r}")

    # ------------------------------------------------------------ literals

    def literal(self):
        t = self.cur
        if t.kind == "str":
            self.advance()
            body = t.text[1:-1]
            return Lit(re.sub(r"\\(.)", r"\1", body))
        if t.kind == "num":
            self.advance()
            # int-preserving doubles (cypher_parser.rs:106-130)
            return Lit(float(t.text)) if "." in t.text else Lit(int(t.text))
        if t.kind == "op" and t.text == "-" and self.peek().kind == "num":
            self.advance()
            n = self.advance()
            return Lit(-float(n.text)) if "." in n.text else Lit(-int(n.text))
        if self.at_kw("TRUE"):
            self.advance()
            return Lit(True)
        if self.at_kw("FALSE"):
            self.advance()
            return Lit(False)
        if self.at_kw("NULL"):
            self.advance()
            return Lit(None)
        raise CypherSyntaxError(f"expected literal at {t!r}")

    def properties_map(self) -> dict:
        """{k: v, ...}. Literal values stay plain Python (reference
        parse_properties); non-literal expressions (e.g. ``user.id``
        from an UNWIND row, corpus #25) stay as AST nodes — the
        executor evaluates them per binding row in CREATE."""
        self.expect_op("{")
        props = {}
        if not self.at_op("}"):
            while True:
                key = self.name()
                self.expect_op(":")
                val = self.expression()
                props[key] = val.value if isinstance(val, Lit) else val
                if self.at_op(","):
                    self.advance()
                    continue
                break
        self.expect_op("}")
        return props

    # ------------------------------------------------------------ patterns

    def node_pattern(self) -> NodePattern:
        self.expect_op("(")
        var = None
        if self.cur.kind == "name" and not self.at_op(")"):
            var = self.advance().text
        labels = []
        while self.at_op(":"):
            self.advance()
            labels.append(self.name())
            while self.at_op("&"):  # `:A&B` variant
                self.advance()
                labels.append(self.name())
        props = self.properties_map() if self.at_op("{") else {}
        self.expect_op(")")
        return NodePattern(var=var, labels=tuple(labels), properties=props)

    def rel_pattern(self) -> RelPattern:
        """-[r:T|U {p} *1..3]->  |  <-[:T]-  |  -[:T]-"""
        incoming = False
        if self.at_op("<-"):
            self.advance()
            incoming = True
        else:
            self.expect_op("-")
        var, types, props = None, [], {}
        min_h = max_h = None
        if self.at_op("["):
            self.advance()
            if self.cur.kind == "name":
                var = self.advance().text
            if self.at_op(":"):
                self.advance()
                types.append(self.name())
                while self.at_op("|"):
                    self.advance()
                    if self.at_op(":"):  # `|:T` form
                        self.advance()
                    types.append(self.name())
            if self.at_op("*"):
                self.advance()
                if self.cur.kind == "num":
                    min_h = int(self.advance().text)
                else:
                    min_h = 1
                if self.at_op(".."):
                    self.advance()
                    max_h = int(self.advance().text) if self.cur.kind == "num" else None
                else:
                    max_h = min_h
                if max_h is None:
                    max_h = 5  # reference examples cap at 5
            if self.at_op("{"):
                props = self.properties_map()
            self.expect_op("]")
        undirected = False
        if incoming:
            self.expect_op("-")
        elif self.at_op("->"):
            self.advance()
        elif self.at_op("-"):
            self.advance()
            undirected = True
        else:
            raise CypherSyntaxError(f"expected -> or - at {self.cur!r}")
        return RelPattern(
            var=var, types=tuple(types), properties=props, incoming=incoming,
            undirected=undirected, min_hops=min_h, max_hops=max_h,
        )

    def path_pattern(self) -> PathPattern:
        path_var = None
        shortest = False
        if (
            self.cur.kind == "name"
            and self.peek().kind == "op"
            and self.peek().text == "="
            and (
                self.peek(2).kind == "op" and self.peek(2).text == "("
                or self.peek(2).kind == "name"
                and self.peek(2).text.lower()
                in ("shortestpath", "allshortestpaths")
            )
        ):
            path_var = self.advance().text
            self.advance()  # =
        all_paths = False
        if self.cur.kind == "name" and self.cur.text.lower() in (
            "shortestpath", "allshortestpaths",
        ):
            all_paths = self.cur.text.lower() == "allshortestpaths"
            self.advance()
            shortest = True
            self.expect_op("(")
        p = PathPattern(path_var=path_var, shortest=shortest,
                        all_paths=all_paths)
        p.nodes.append(self.node_pattern())
        while self.at_op("-", "<-"):
            p.rels.append(self.rel_pattern())
            p.nodes.append(self.node_pattern())
        if shortest:
            self.expect_op(")")
        return p

    def pattern_list(self) -> list[PathPattern]:
        pats = [self.path_pattern()]
        while self.at_op(","):
            self.advance()
            pats.append(self.path_pattern())
        return pats

    # ------------------------------------------------------------ expressions

    def expression(self):
        return self._or()

    def _or(self):
        left = self._and()
        while self.at_kw("OR", "XOR"):
            op = self.advance().text
            left = BinOp(op, left, self._and())
        return left

    def _and(self):
        left = self._not()
        while self.at_kw("AND"):
            self.advance()
            left = BinOp("AND", left, self._not())
        return left

    def _not(self):
        if self.at_kw("NOT"):
            self.advance()
            return UnaryOp("NOT", self._not())
        return self._comparison()

    def _comparison(self):
        left = self._additive()
        while True:
            if self.at_op("=", "<>", "<", "<=", ">", ">=", "=~"):
                op = self.advance().text
                left = BinOp(op, left, self._additive())
            elif self.at_kw("CONTAINS"):
                self.advance()
                left = BinOp("CONTAINS", left, self._additive())
            elif self.at_kw("STARTS"):
                self.advance()
                self.expect_kw("WITH")
                left = BinOp("STARTS_WITH", left, self._additive())
            elif self.at_kw("ENDS"):
                self.advance()
                self.expect_kw("WITH")
                left = BinOp("ENDS_WITH", left, self._additive())
            elif self.at_kw("IN"):
                self.advance()
                left = BinOp("IN", left, self._additive())
            elif self.at_kw("IS"):
                self.advance()
                if self.at_kw("NOT"):
                    self.advance()
                    self.expect_kw("NULL")
                    left = UnaryOp("IS_NOT_NULL", left)
                else:
                    self.expect_kw("NULL")
                    left = UnaryOp("IS_NULL", left)
            else:
                return left

    def _additive(self):
        left = self._multiplicative()
        while self.at_op("+", "-"):
            op = self.advance().text
            left = BinOp(op, left, self._multiplicative())
        return left

    def _multiplicative(self):
        left = self._unary()
        while self.at_op("*", "/", "%"):
            op = self.advance().text
            left = BinOp(op, left, self._unary())
        return left

    def _unary(self):
        if self.at_op("-"):
            self.advance()
            return UnaryOp("-", self._unary())
        return self._primary()

    def _primary(self):
        t = self.cur
        if t.kind in ("str", "num") or self.at_kw("TRUE", "FALSE", "NULL"):
            return self.literal()
        if self.at_kw("CASE"):
            return self._case()
        if self.at_op("("):
            # pattern predicate? (a)-[:T]->(b) in WHERE — try-parse a
            # path pattern with backtracking; only a pattern with at
            # least one relationship wins (a bare parenthesized name is
            # an expression, and "(a) - 1" is arithmetic)
            save = self.i
            try:
                pat = self.path_pattern()
                if pat.rels:
                    return PatternPred(pat)
            except CypherSyntaxError:
                pass
            self.i = save
            self.advance()
            e = self.expression()
            self.expect_op(")")
            return e
        if self.at_op("{"):
            return Lit(self.properties_map())  # map literal (UNWIND rows)
        if self.at_op("["):
            self.advance()
            items = []
            # list comprehension: [x IN source | expr] — detect by
            # lookahead (expression() would swallow IN as a comparison)
            if (
                self.cur.kind == "name"
                and self.peek().kind == "kw"
                and self.peek().text == "IN"
            ):
                var = self.advance().text
                self.advance()  # IN
                source = self._additive()  # stops before '|'
                self.expect_op("|")
                body = self.expression()
                self.expect_op("]")
                return ListComp(var=var, source=source, expr=body)
            if not self.at_op("]"):
                while True:
                    items.append(self.expression())
                    if self.at_op(","):
                        self.advance()
                        continue
                    break
            self.expect_op("]")
            if all(isinstance(x, Lit) for x in items):
                return Lit([x.value for x in items])
            return ListExpr(items)
        if t.kind == "name" or (t.kind == "kw" and t.text == "DISTINCT"):
            # function call?
            if t.kind == "name" and self.peek().kind == "op" and self.peek().text == "(":
                fname = self.advance().text
                self.advance()  # (
                distinct = False
                args = []
                if self.at_kw("DISTINCT"):
                    self.advance()
                    distinct = True
                if self.at_op("*"):
                    self.advance()
                    args.append(Var("*"))
                elif not self.at_op(")"):
                    while True:
                        args.append(self.expression())
                        if self.at_op(","):
                            self.advance()
                            continue
                        break
                self.expect_op(")")
                fn = Func(fname.lower(), args, distinct)
                out = fn
                while self.at_op(".") and self.peek().kind in ("name", "kw"):
                    self.advance()
                    out = FieldAccess(out, self.advance().text)
                return out
            if t.kind == "name":
                nm = self.advance().text
                if self.at_op(".") and self.peek().kind in ("name", "kw"):
                    self.advance()
                    key = self.advance().text
                    return Prop(nm, key)
                return Var(nm)
        raise CypherSyntaxError(f"unexpected token {t!r} in expression")

    def _case(self):
        """CASE [operand] WHEN v THEN r ... [ELSE d] END. The simple
        (operand) form desugars to the generic form at parse time:
        WHEN operand = v THEN r."""
        self.expect_kw("CASE")
        operand = None
        if not self.at_kw("WHEN"):
            operand = self.expression()
        whens = []
        while self.at_kw("WHEN"):
            self.advance()
            test = self.expression()
            if operand is not None:
                test = BinOp("=", operand, test)
            self.expect_kw("THEN")
            whens.append((test, self.expression()))
        if not whens:
            raise CypherSyntaxError("CASE needs at least one WHEN")
        default = None
        if self.at_kw("ELSE"):
            self.advance()
            default = self.expression()
        self.expect_kw("END")
        return CaseExpr(whens=whens, default=default)

    # ------------------------------------------------------------ clauses

    def with_clause(self) -> WithClause:
        self.expect_kw("WITH")
        wc = WithClause()
        if self.at_kw("DISTINCT"):
            self.advance()
            wc.distinct = True
        while True:
            expr = self.expression()
            alias = None
            if self.at_kw("AS"):
                self.advance()
                alias = self.name()
            wc.items.append(ReturnItem(expr, alias))
            if self.at_op(","):
                self.advance()
                continue
            break
        if self.at_kw("ORDER"):
            self.advance()
            self.expect_kw("BY")
            while True:
                e = self.expression()
                desc = False
                if self.at_kw("DESC", "DESCENDING"):
                    self.advance()
                    desc = True
                elif self.at_kw("ASC", "ASCENDING"):
                    self.advance()
                wc.order_by.append(OrderItem(e, desc))
                if self.at_op(","):
                    self.advance()
                    continue
                break
        if self.at_kw("SKIP"):
            self.advance()
            wc.skip = int(self.advance().text)
        if self.at_kw("LIMIT"):
            self.advance()
            wc.limit = int(self.advance().text)
        if self.at_kw("WHERE"):
            self.advance()
            wc.where = self.expression()
        return wc

    def _set_items(self) -> list[SetPropItem]:
        """Comma-separated SET items: n.prop = expr | n:Label[:Label…].
        Shared by the SET clause and MERGE's ON CREATE/ON MATCH SET."""
        items: list[SetPropItem] = []
        while True:
            if (
                self.cur.kind == "name"
                and self.peek().kind == "op"
                and self.peek().text == ":"
            ):
                var = self.advance().text
                labels = []
                while self.at_op(":"):
                    self.advance()
                    labels.append(self.name())
                items.append(SetPropItem(target=Var(var), labels=tuple(labels)))
            else:
                target = self._primary()
                if not isinstance(target, (Prop, Var)):
                    raise CypherSyntaxError("SET target must be n.prop or n:Label")
                self.expect_op("=")
                items.append(SetPropItem(target=target, value=self.expression()))
            if self.at_op(","):
                self.advance()
                continue
            break
        return items

    def return_clause(self) -> ReturnClause:
        self.expect_kw("RETURN")
        rc = ReturnClause()
        if self.at_kw("DISTINCT"):
            self.advance()
            rc.distinct = True
        while True:
            expr = self.expression()
            alias = None
            if self.at_kw("AS"):
                self.advance()
                alias = self.name()
            rc.items.append(ReturnItem(expr, alias))
            if self.at_op(","):
                self.advance()
                continue
            break
        if self.at_kw("ORDER"):
            self.advance()
            self.expect_kw("BY")
            while True:
                e = self.expression()
                desc = False
                if self.at_kw("DESC", "DESCENDING"):
                    self.advance()
                    desc = True
                elif self.at_kw("ASC", "ASCENDING"):
                    self.advance()
                rc.order_by.append(OrderItem(e, desc))
                if self.at_op(","):
                    self.advance()
                    continue
                break
        if self.at_kw("SKIP"):
            self.advance()
            rc.skip = int(self.advance().text)
        if self.at_kw("LIMIT"):
            self.advance()
            rc.limit = int(self.advance().text)
        return rc

    def statement(self) -> CypherStatement | SetKeyValue | GetKeyValue | DeleteKeyValue:
        clauses = []
        saw_match = False
        while not self.cur.kind == "eof" and not self.at_op(";"):
            if self.at_kw("UNION"):
                break  # handled by parse_statement
            if self.at_kw("MATCH") or (self.at_kw("OPTIONAL") and self.peek().text == "MATCH"):
                optional = False
                if self.at_kw("OPTIONAL"):
                    self.advance()
                    optional = True
                self.advance()  # MATCH
                mc = MatchClause(patterns=self.pattern_list(), optional=optional)
                if self.at_kw("WHERE"):
                    self.advance()
                    mc.where = self.expression()
                clauses.append(mc)
                saw_match = True
            elif self.at_kw("WITH"):
                clauses.append(self.with_clause())
            elif self.at_kw("UNWIND"):
                self.advance()
                expr = self.expression()
                self.expect_kw("AS")
                clauses.append(UnwindClause(expr, self.name()))
            elif self.at_kw("CREATE", "MERGE"):
                is_merge = self.cur.text == "MERGE"
                self.advance()
                cc = CreateClause(patterns=self.pattern_list())
                cc.merge = is_merge
                # ON CREATE SET … / ON MATCH SET … (MERGE only; ON is
                # contextual — a plain name token, not a keyword, so
                # `n.on` stays a valid property)
                while (
                    is_merge
                    and self.cur.kind == "name"
                    and self.cur.text.upper() == "ON"
                ):
                    self.advance()
                    if self.at_kw("CREATE"):
                        self.advance()
                        self.expect_kw("SET")
                        cc.on_create.extend(self._set_items())
                    elif self.at_kw("MATCH"):
                        self.advance()
                        self.expect_kw("SET")
                        cc.on_match.extend(self._set_items())
                    else:
                        raise CypherSyntaxError(
                            "expected CREATE or MATCH after ON"
                        )
                clauses.append(cc)
            elif self.at_kw("SET"):
                self.advance()
                # KV form: SET name = 'value' (identifier with no dot)
                if (
                    not saw_match
                    and self.cur.kind == "name"
                    and self.peek().kind == "op"
                    and self.peek().text == "="
                    and self.peek(2).kind == "str"
                    and not clauses
                ):
                    key = self.advance().text
                    self.advance()  # =
                    val = self.literal().value
                    return SetKeyValue(key=key, value=str(val))
                clauses.append(SetClause(items=self._set_items()))
            elif self.at_kw("REMOVE"):
                self.advance()
                rm = RemoveClause()
                while True:
                    p = self._primary()
                    if not isinstance(p, Prop):
                        raise CypherSyntaxError("REMOVE target must be n.prop")
                    rm.items.append(p)
                    if self.at_op(","):
                        self.advance()
                        continue
                    break
                clauses.append(rm)
            elif self.at_kw("DELETE", "DETACH"):
                detach = False
                if self.at_kw("DETACH"):
                    self.advance()
                    detach = True
                self.expect_kw("DELETE")
                names = [self.name()]
                while self.at_op(","):
                    self.advance()
                    names.append(self.name())
                if not saw_match and not detach and not clauses:
                    # bare DELETE key with no MATCH = KV delete
                    return DeleteKeyValue(key=names[0])
                clauses.append(DeleteClause(vars=names, detach=detach))
            elif self.at_kw("RETURN"):
                # KV get: MATCH (key) RETURN <nothing>
                if (
                    saw_match
                    and self.peek().kind == "eof"
                    and len(clauses) == 1
                    and isinstance(clauses[0], MatchClause)
                    and len(clauses[0].patterns) == 1
                    and not clauses[0].patterns[0].rels
                    and clauses[0].patterns[0].nodes[0].var
                    and not clauses[0].patterns[0].nodes[0].labels
                    and not clauses[0].patterns[0].nodes[0].properties
                ):
                    self.advance()
                    return GetKeyValue(key=clauses[0].patterns[0].nodes[0].var)
                clauses.append(self.return_clause())
            else:
                raise CypherSyntaxError(f"unexpected token {self.cur!r}")
        return CypherStatement(clauses=clauses)


def parse_statement(text: str):
    p = Parser(text)
    stmt = p.statement()
    if p.at_kw("UNION"):
        parts, all_flags = [stmt], []
        while p.at_kw("UNION"):
            p.advance()
            is_all = False
            if p.at_kw("ALL"):
                p.advance()
                is_all = True
            all_flags.append(is_all)
            parts.append(p.statement())
        if len(set(all_flags)) > 1:
            raise CypherSyntaxError(
                "cannot mix UNION and UNION ALL in one query"
            )
        stmt = UnionStatement(parts=parts, union_all=all_flags[0])
    if p.cur.kind != "eof" and not p.at_op(";"):
        raise CypherSyntaxError(f"trailing input at {p.cur!r}")
    return stmt


def parse_cypher(query: str):
    """Reference-compatible entry: multi-statement input returns the
    FIRST statement that parses (cypher_parser.rs:539-614)."""
    if not is_cypher(query):
        raise CypherSyntaxError("Not a valid Cypher query.")
    statements = [
        s.strip() for s in re.split(r"[\n;]", query.strip()) if s.strip()
    ]
    errors = []
    for stmt in statements:
        try:
            return parse_statement(stmt)
        except CypherSyntaxError as e:
            errors.append(str(e))
    raise CypherSyntaxError("; ".join(errors) or "empty query")
