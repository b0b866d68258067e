"""Logical plan / AST nodes for the Cypher front-end.

Mirrors the reference's CypherQuery enum (cypher_parser.rs:30-72) but
extends it to the *declared* surface of queries_examples.txt (WHERE,
RETURN projection, ORDER BY/LIMIT/SKIP, aggregates, OPTIONAL MATCH,
UNWIND, SET/REMOVE/DELETE) — SURVEY.md §7.2 M4. The executor lowers
these onto DataFrame operations; Catalyst optimizes the result.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# ---------------------------------------------------------------- patterns


@dataclass
class NodePattern:
    var: str | None = None
    labels: tuple[str, ...] = ()  # multi-label `:A:B` / `:A&B`
    properties: dict = field(default_factory=dict)

    @property
    def label(self) -> str | None:
        """Combined label, colon-joined like the reference."""
        return ":".join(self.labels) if self.labels else None


@dataclass
class RelPattern:
    var: str | None = None
    types: tuple[str, ...] = ()  # multi-type `:A|B`
    properties: dict = field(default_factory=dict)
    incoming: bool = False  # <-[:T]-  vs  -[:T]->
    undirected: bool = False  # -[:T]-
    min_hops: int | None = None  # var-length *min..max (None = single hop)
    max_hops: int | None = None


@dataclass
class PathPattern:
    """node (rel node)* chain; optional path variable p = (...)"""

    path_var: str | None = None
    nodes: list[NodePattern] = field(default_factory=list)
    rels: list[RelPattern] = field(default_factory=list)
    shortest: bool = False  # shortestPath(...)
    all_paths: bool = False  # allShortestPaths(...)


# ---------------------------------------------------------------- expressions


@dataclass
class Lit:
    value: object  # str | int | float | bool | None | list


@dataclass
class Var:
    name: str


@dataclass
class Prop:
    var: str
    key: str


@dataclass
class Func:
    name: str  # lower-cased
    args: list = field(default_factory=list)
    distinct: bool = False


@dataclass
class BinOp:
    op: str  # = <> < <= > >= AND OR + - * / % CONTAINS STARTS_WITH ENDS_WITH =~ IN
    left: object = None
    right: object = None


@dataclass
class UnaryOp:
    op: str  # NOT, -, IS_NULL, IS_NOT_NULL
    operand: object = None


@dataclass
class ListExpr:
    items: list = field(default_factory=list)


@dataclass
class ListComp:
    """[var IN source | expr] list comprehension
    (queries_examples.txt:112-113)."""

    var: str = ""
    source: object = None
    expr: object = None


@dataclass
class FieldAccess:
    """Postfix .key access on a non-variable expression
    (startNode(r).id, head(nodes(p)).name)."""

    expr: object = None
    key: str = ""


@dataclass
class CaseExpr:
    """Generic CASE WHEN cond THEN result ... ELSE default END (simple
    CASE is desugared to this at parse time)."""

    whens: list = field(default_factory=list)  # [(cond_expr, result_expr)]
    default: object = None


@dataclass
class PatternPred:
    """Pattern predicate in WHERE: (a)-[:T]->(b) — existential
    subpattern, true when at least one match exists. Lowered to a
    semi-join (anti-join under NOT)."""

    pattern: object = None  # PathPattern


# ---------------------------------------------------------------- clauses


@dataclass
class ReturnItem:
    expr: object
    alias: str | None = None


@dataclass
class OrderItem:
    expr: object
    desc: bool = False


@dataclass
class MatchClause:
    patterns: list[PathPattern] = field(default_factory=list)
    optional: bool = False
    where: object = None


@dataclass
class UnwindClause:
    expr: object = None
    var: str = ""


@dataclass
class CreateClause:
    patterns: list[PathPattern] = field(default_factory=list)
    merge: bool = False  # MERGE = match-or-create
    # MERGE-only conditional SET lists (SetPropItem)
    on_create: list = field(default_factory=list)
    on_match: list = field(default_factory=list)


@dataclass
class SetPropItem:
    target: Prop | Var = None
    value: object = None  # expression; Var target = SET n:Label handled via labels
    labels: tuple[str, ...] = ()  # SET n:Label


@dataclass
class SetClause:
    items: list[SetPropItem] = field(default_factory=list)


@dataclass
class RemoveClause:
    items: list[Prop] = field(default_factory=list)


@dataclass
class DeleteClause:
    vars: list[str] = field(default_factory=list)
    detach: bool = False


@dataclass
class WithClause:
    """WITH projection/aggregation chaining; optional post-WHERE
    (HAVING-like when aggregating)."""

    items: list[ReturnItem] = field(default_factory=list)
    distinct: bool = False
    where: object = None
    order_by: list[OrderItem] = field(default_factory=list)
    skip: int | None = None
    limit: int | None = None


@dataclass
class ReturnClause:
    items: list[ReturnItem] = field(default_factory=list)
    distinct: bool = False
    order_by: list[OrderItem] = field(default_factory=list)
    skip: int | None = None
    limit: int | None = None


@dataclass
class CypherStatement:
    """A single statement: ordered clauses."""

    clauses: list = field(default_factory=list)


@dataclass
class UnionStatement:
    """RETURN ... UNION [ALL] MATCH ... RETURN ... — results combined
    by column name; DISTINCT across the whole result unless ALL
    (Cypher forbids mixing the two forms)."""

    parts: list = field(default_factory=list)  # CypherStatement
    union_all: bool = False


# KV statements (reference cypher_parser.rs:780-804 surface)


@dataclass
class SetKeyValue:
    key: str = ""
    value: str = ""


@dataclass
class GetKeyValue:
    key: str = ""


@dataclass
class DeleteKeyValue:
    key: str = ""
