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


def test_cypher_plan_cache_hits_and_invalidates(spark):
    """Read statements are plan-cached per query text; mutations are
    not cached and set_state invalidates, so reads after DML see the
    new state."""
    from graphdb_spark.datamodel import local_df
    from graphdb_spark.session import GraphSession

    g = GraphSession(
        spark,
        local_df(spark, [("a", "N", {})],
                 "id string, label string, properties map<string,string>"),
        local_df(spark, [],
                 "src string, relationship string, dst string, "
                 "properties map<string,string>"),
    )
    q = "MATCH (n:N) RETURN n.id AS id"
    d1 = g.cypher(q)
    d2 = g.cypher(q)
    assert d1 is d2  # plan-cache hit (same lazy DataFrame object)
    assert d1.count() == 1
    # DML returns a summary (not cached), and invalidates the cache
    out = g.cypher("CREATE (:N {id: 'b'})")
    assert out["created_vertices"] == 1
    d3 = g.cypher(q)
    assert d3 is not d1
    assert d3.count() == 2


def test_cypher_plan_cache_is_lru_not_fifo(spark):
    """A cache hit must refresh recency: after filling the cache to
    capacity, re-using the OLDEST entry and then inserting one more
    must evict the second-oldest, not the just-hit one."""
    from graphdb_spark.datamodel import local_df
    from graphdb_spark.session import GraphSession

    g = GraphSession(
        spark,
        local_df(spark, [("a", "N", {})],
                 "id string, label string, properties map<string,string>"),
        local_df(spark, [],
                 "src string, relationship string, dst string, "
                 "properties map<string,string>"),
    )
    old_max = GraphSession.CYPHER_PLAN_CACHE_MAX
    GraphSession.CYPHER_PLAN_CACHE_MAX = 2
    try:
        q1 = "MATCH (n:N) RETURN n.id AS id"
        q2 = "MATCH (n:N) RETURN n.id AS id2"
        q3 = "MATCH (n:N) RETURN n.id AS id3"
        d1 = g.cypher(q1)
        g.cypher(q2)
        assert g.cypher(q1) is d1   # hit refreshes q1's recency
        g.cypher(q3)                # at capacity: evicts q2, NOT q1
        assert g.cypher(q1) is d1   # q1 survived (LRU); FIFO would evict it
        assert q2 not in g._cypher_plan_cache
    finally:
        GraphSession.CYPHER_PLAN_CACHE_MAX = old_max
