"""Graph analytics: PageRank, triangle counting, degrees, motif find."""

import pytest

from graphdb_spark.operators import analytics as AN


@pytest.fixture()
def diamond(spark):
    """a->b, a->c, b->d, c->d (+ d->a to make it strongly connected)."""
    rows = [("a", "E", "b"), ("a", "E", "c"), ("b", "E", "d"),
            ("c", "E", "d"), ("d", "E", "a")]
    return spark.createDataFrame(
        [(s, r, d, {}) for s, r, d in rows],
        "src string, relationship string, dst string, properties map<string,string>",
    )


def test_degrees(diamond):
    got = {r["id"]: (r["in_degree"], r["out_degree"], r["degree"])
           for r in AN.degrees(diamond).collect()}
    assert got == {
        "a": (1, 2, 3), "b": (1, 1, 2), "c": (1, 1, 2), "d": (2, 1, 3),
    }


def test_pagerank_sums_to_n_and_orders_sensibly(diamond):
    ranks = {r["id"]: r["rank"] for r in AN.pagerank(diamond, iterations=15).collect()}
    assert abs(sum(ranks.values()) - 4.0) < 1e-6
    # d receives from two nodes, b/c from one each (split) -> d > b == c
    assert ranks["d"] > ranks["b"]
    assert abs(ranks["b"] - ranks["c"]) < 1e-9  # symmetric positions


def test_pagerank_dangling_mass(spark):
    """Sink vertex (no out-edges) must not leak rank mass."""
    rows = [("a", "E", "b"), ("b", "E", "c")]  # c is a sink
    e = spark.createDataFrame(
        [(s, r, d, {}) for s, r, d in rows],
        "src string, relationship string, dst string, properties map<string,string>",
    )
    ranks = {r["id"]: r["rank"] for r in AN.pagerank(e, iterations=10).collect()}
    assert abs(sum(ranks.values()) - 3.0) < 1e-6


def test_triangle_count(spark):
    """K3 plus a pendant edge: triangle corners get 1, pendant 0."""
    rows = [("a", "E", "b"), ("b", "E", "c"), ("c", "E", "a"), ("c", "E", "d")]
    e = spark.createDataFrame(
        [(s, r, d, {}) for s, r, d in rows],
        "src string, relationship string, dst string, properties map<string,string>",
    )
    got = {r["id"]: r["triangles"] for r in AN.triangle_count(e).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}
    # reciprocal edges must not fabricate triangles
    rows2 = rows + [("b", "E", "a")]
    e2 = spark.createDataFrame(
        [(s, r, d, {}) for s, r, d in rows2],
        "src string, relationship string, dst string, properties map<string,string>",
    )
    got2 = {r["id"]: r["triangles"] for r in AN.triangle_count(e2).collect()}
    assert got2 == got


def test_motif_find(person_graph):
    df = AN.motif_find(person_graph, "(a)-[e:KNOWS]->(b); (b)-[e2:WORKS_WITH]->(c)")
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["a"]["id"] == "alice" and r["b"]["id"] == "bob" and r["c"]["id"] == "diana"
    assert r["e"]["relationship"] == "KNOWS"
    assert r["e2"]["relationship"] == "WORKS_WITH"


def test_motif_find_untyped(person_graph):
    df = AN.motif_find(person_graph, "(a)-[e]->(b)")
    assert df.count() == 3
