"""SQL front-end.

Real execution is ``spark.sql`` over the registered views (the
reference parses SQL but never executes it — its QueryExecEngine
returns 'not implemented' for SQL, query_exec_engine.rs:38-44).

``parse_statement_info`` reproduces the reference's introspection IR
(sql_parser.rs:13-25): Select{table, columns} / CreateTable{name,
columns} / Empty / Unsupported / Unknown — so callers relying on that
shape keep working, while ``GraphSession.sql`` actually runs the query.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class ParsedStatement:
    kind: str  # select | create_table | empty | unsupported | unknown
    table_name: str | None = None
    columns: dict[str, str] | None = field(default=None)


_SELECT_RE = re.compile(
    r"^\s*SELECT\s+(?P<cols>.*?)\s+FROM\s+(?P<table>[A-Za-z_][\w.]*)",
    re.IGNORECASE | re.DOTALL,
)
_CREATE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?P<table>[A-Za-z_][\w.]*)\s*\((?P<cols>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def parse_statement_info(sql: str) -> ParsedStatement:
    """Reference-shaped SQL introspection (sql_parser.rs:52-92)."""
    if not sql or not sql.strip():
        return ParsedStatement("empty")
    m = _CREATE_RE.match(sql)
    if m:
        cols = {}
        for part in _split_top_level(m.group("cols")):
            toks = part.strip().split()
            if len(toks) >= 2:
                cols[toks[0]] = " ".join(toks[1:])
        return ParsedStatement("create_table", m.group("table"), cols)
    m = _SELECT_RE.match(sql)
    if m:
        raw = m.group("cols").strip()
        cols = (
            {}
            if raw == "*"
            else {c.strip().split()[-1].split(".")[-1]: "" for c in raw.split(",")}
        )
        return ParsedStatement("select", m.group("table"), cols)
    head = sql.strip().split(None, 1)[0].upper()
    if head in ("INSERT", "UPDATE", "DELETE", "DROP", "ALTER", "WITH"):
        return ParsedStatement("unsupported")
    return ParsedStatement("unknown")


def _split_top_level(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out
