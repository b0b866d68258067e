"""GraphSession facade: language-detecting execute() (QueryExecEngine
equivalent) + analytics method surface."""

import pytest


def test_execute_detects_cypher(person_graph):
    df = person_graph.execute("MATCH (p:Person) WHERE p.age > 30 RETURN p.name ORDER BY p.name")
    assert [r[0] for r in df.collect()] == ["Bob", "Diana"]


def test_execute_detects_sql(person_graph):
    df = person_graph.execute(
        "SELECT label, count(*) AS n FROM vertices GROUP BY label"
    )
    assert df.collect()[0]["n"] == 4


def test_execute_rejects_unknown(person_graph):
    with pytest.raises(ValueError):
        person_graph.execute("FROBNICATE ALL THE THINGS")


def test_facade_analytics(person_graph):
    assert person_graph.bfs("alice", direction="out").count() == 4
    assert person_graph.shortest_path("alice", "diana") == ["alice", "bob", "diana"]
    degs = {r["id"]: r["degree"] for r in person_graph.degrees().collect()}
    assert degs["alice"] == 2
    ranks = person_graph.pagerank(iterations=5)
    assert ranks.count() == 4
    comps = {r["id"]: r["component"] for r in person_graph.connected_components().collect()}
    assert len(set(comps.values())) == 1  # one connected component
    assert person_graph.find("(a)-[e:KNOWS]->(b)").count() == 2


def test_execute_detects_graphql(person_graph):
    """GraphQL detection parity: the reference detects GraphQL
    (query_parser.rs:33-51) but never executes it (REST mock) — we
    return the structured detection result."""
    res = person_graph.execute("query { person { name } }")
    assert res["language"] == "graphql" and res["status"] == "parse_only"
    res = person_graph.execute("{ person { name } }")
    assert res["language"] == "graphql"
