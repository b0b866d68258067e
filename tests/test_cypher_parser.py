"""Cypher parser golden tests — the reference's 12 parser tests
(cypher_parser.rs:822-999) ported to our AST, plus the extended
surface (WHERE/ORDER BY/UNWIND/var-length/shortestPath)."""

import pytest

from graphdb_spark import plans as P
from graphdb_spark.cypher.parser import (
    CypherSyntaxError,
    is_cypher,
    parse_cypher,
)


def first_clause(stmt, kind):
    assert isinstance(stmt, P.CypherStatement)
    for c in stmt.clauses:
        if isinstance(c, kind):
            return c
    raise AssertionError(f"no {kind.__name__} in {stmt}")


# ---- reference goldens (cypher_parser.rs tests) -------------------------


def test_is_cypher():
    assert is_cypher("MATCH (n:Person) RETURN n")
    assert is_cypher("CREATE (n:Person {name: 'Alice'})")
    assert not is_cypher("SELECT * FROM table")


def test_parse_create_node():
    stmt = parse_cypher("CREATE (n:Person {name: 'Alice', age: 30})")
    cc = first_clause(stmt, P.CreateClause)
    node = cc.patterns[0].nodes[0]
    assert node.labels == ("Person",)
    assert node.properties == {"name": "Alice", "age": 30}
    assert isinstance(node.properties["age"], int)  # int-preserving


def test_parse_create_node_without_variable():
    stmt = parse_cypher("CREATE (:Person {name: 'Alice', age: 30})")
    node = first_clause(stmt, P.CreateClause).patterns[0].nodes[0]
    assert node.var is None
    assert node.labels == ("Person",)


def test_parse_create_node_with_float():
    stmt = parse_cypher(
        'CREATE (:Person {id: "alice", name: "Alice", age: 30, '
        "active: true, score: 95.5})"
    )
    node = first_clause(stmt, P.CreateClause).patterns[0].nodes[0]
    assert node.properties == {
        "id": "alice", "name": "Alice", "age": 30, "active": True, "score": 95.5,
    }
    assert isinstance(node.properties["age"], int)
    assert isinstance(node.properties["score"], float)


def test_parse_create_nodes_with_ampersand_labels():
    stmt = parse_cypher(
        "CREATE (charlie:Person&Actor {name: 'Charlie Sheen'}), "
        "(oliver:Person&Director {name: 'Oliver Stone'})"
    )
    pats = first_clause(stmt, P.CreateClause).patterns
    assert len(pats) == 2
    assert pats[0].nodes[0].label == "Person:Actor"
    assert pats[1].nodes[0].label == "Person:Director"


def test_parse_create_nodes_with_colon_labels():
    stmt = parse_cypher(
        "CREATE (charlie:Person:Actor {name: 'Charlie Sheen'}), "
        "(oliver:Person:Director {name: 'Oliver Stone'})"
    )
    pats = first_clause(stmt, P.CreateClause).patterns
    assert pats[0].nodes[0].label == "Person:Actor"
    assert pats[1].nodes[0].label == "Person:Director"


def test_parse_match_simple_return():
    stmt = parse_cypher("MATCH (n:Person) RETURN n")
    mc = first_clause(stmt, P.MatchClause)
    assert mc.patterns[0].nodes[0].label == "Person"
    rc = first_clause(stmt, P.ReturnClause)
    assert isinstance(rc.items[0].expr, P.Var)


def test_parse_match_multiple_nodes():
    stmt = parse_cypher(
        "MATCH (charlie:Person {name: 'Charlie Sheen'}), "
        "(oliver:Person {name: 'Oliver Stone'})"
    )
    mc = first_clause(stmt, P.MatchClause)
    assert len(mc.patterns) == 2
    assert mc.patterns[0].nodes[0].var == "charlie"
    assert mc.patterns[1].nodes[0].var == "oliver"


def test_parse_match_complex_return():
    stmt = parse_cypher("MATCH (n) RETURN n.name, labels(n) AS labels")
    rc = first_clause(stmt, P.ReturnClause)
    assert isinstance(rc.items[0].expr, P.Prop)
    assert rc.items[1].alias == "labels"
    assert rc.items[1].expr.name == "labels"


def test_parse_match_count_return():
    stmt = parse_cypher("MATCH (n) RETURN count(n) AS total_vertices")
    rc = first_clause(stmt, P.ReturnClause)
    assert rc.items[0].expr.name == "count"
    assert rc.items[0].alias == "total_vertices"


def test_parse_create_complex_pattern():
    stmt = parse_cypher(
        "CREATE (a:Person {name: 'Alice'})-[:KNOWS]->(b:Person {name: 'Bob'})"
    )
    pat = first_clause(stmt, P.CreateClause).patterns[0]
    assert len(pat.nodes) == 2
    assert len(pat.rels) == 1
    assert pat.rels[0].types == ("KNOWS",)
    assert not pat.rels[0].incoming


def test_parse_create_complex_bidirectional():
    stmt = parse_cypher("CREATE (a)-[:REL1]->(b)<-[:REL2]-(c)")
    pat = first_clause(stmt, P.CreateClause).patterns[0]
    assert len(pat.nodes) == 3
    assert len(pat.rels) == 2
    assert pat.rels[0].types == ("REL1",) and not pat.rels[0].incoming
    assert pat.rels[1].types == ("REL2",) and pat.rels[1].incoming


def test_parse_set_kv():
    stmt = parse_cypher("SET mykey = 'myvalue'")
    assert stmt == P.SetKeyValue(key="mykey", value="myvalue")


# ---- extended surface (queries_examples.txt) ----------------------------


def test_parse_where_expression():
    stmt = parse_cypher(
        "MATCH (p:Person) WHERE p.age >= 30 AND p.active = true RETURN p.name"
    )
    mc = first_clause(stmt, P.MatchClause)
    assert isinstance(mc.where, P.BinOp) and mc.where.op == "AND"
    assert mc.where.left.op == ">="


def test_parse_order_by_limit():
    stmt = parse_cypher(
        "MATCH (a)-[r:KNOWS]->(b) RETURN a.name, r.strength "
        "ORDER BY r.strength DESC LIMIT 20"
    )
    rc = first_clause(stmt, P.ReturnClause)
    assert rc.order_by[0].desc
    assert rc.limit == 20


def test_parse_var_length():
    stmt = parse_cypher("MATCH (a)-[:KNOWS*1..3]->(b) RETURN b")
    rel = first_clause(stmt, P.MatchClause).patterns[0].rels[0]
    assert rel.min_hops == 1 and rel.max_hops == 3


def test_parse_multi_type_edge():
    stmt = parse_cypher("MATCH (a)-[r:KNOWS|WORKS_WITH]->(b) RETURN type(r)")
    rel = first_clause(stmt, P.MatchClause).patterns[0].rels[0]
    assert rel.types == ("KNOWS", "WORKS_WITH")


def test_parse_shortest_path():
    stmt = parse_cypher(
        "MATCH p = shortestPath((a {name: 'Alice'})-[*..5]-(b {name: 'Bob'})) "
        "RETURN p"
    )
    pat = first_clause(stmt, P.MatchClause).patterns[0]
    assert pat.shortest and pat.path_var == "p"
    assert pat.rels[0].max_hops == 5


def test_parse_unwind():
    stmt = parse_cypher(
        "UNWIND [{name: 'Ian'}, {name: 'Kim'}] AS row CREATE (:Person {name: 'x'})"
    )
    uw = first_clause(stmt, P.UnwindClause)
    assert uw.var == "row"
    assert uw.expr.value == [{"name": "Ian"}, {"name": "Kim"}]


def test_parse_optional_match():
    stmt = parse_cypher(
        "MATCH (p:Person) OPTIONAL MATCH (p)-[:KNOWS]->(f) RETURN p.name, f.name"
    )
    matches = [c for c in stmt.clauses if isinstance(c, P.MatchClause)]
    assert not matches[0].optional and matches[1].optional


def test_parse_detach_delete():
    stmt = parse_cypher("MATCH (p:Person {name: 'Alice'}) DETACH DELETE p")
    dc = first_clause(stmt, P.DeleteClause)
    assert dc.detach and dc.vars == ["p"]


def test_kv_get_and_delete():
    assert parse_cypher("MATCH (mykey) RETURN") == P.GetKeyValue(key="mykey")
    assert parse_cypher("DELETE mykey") == P.DeleteKeyValue(key="mykey")


def test_multi_statement_takes_first_valid():
    stmt = parse_cypher(
        "CREATE (n:Person {name: 'A'});\nMATCH (n) RETURN n"
    )
    assert isinstance(first_clause(stmt, P.CreateClause), P.CreateClause)


def test_regex_and_string_predicates():
    stmt = parse_cypher(
        "MATCH (p:Person) WHERE p.name =~ '(?i)alice' AND "
        "toLower(p.name) CONTAINS 'ali' RETURN p"
    )
    w = first_clause(stmt, P.MatchClause).where
    assert w.op == "AND" and w.left.op == "=~"


def test_invalid_raises():
    with pytest.raises(CypherSyntaxError):
        parse_cypher("SELECT * FROM t")
    with pytest.raises(CypherSyntaxError):
        parse_cypher("MATCH (n RETURN n")
