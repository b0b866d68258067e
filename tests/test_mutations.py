"""Mutation conformance tests — ports of the reference CRUD suite
semantics (SURVEY.md §2.8; lib/src/tests/vertex.rs, bulk_insert.rs)."""

import pytest

from graphdb_spark.algebra import OperationOnQueryError, Q
from graphdb_spark.operators import mutations as M


def ids(df):
    return sorted(r[0] for r in df.select("id").collect())


def test_create_vertex_rejects_duplicate(person_graph):
    """create_vertex returns false if id exists (rdb/datastore.rs:261-270)."""
    g = M.create_vertex(person_graph, "eve", "Person", {"age": 25})
    assert g.vertex_count() == 5
    with pytest.raises(M.VertexExistsError):
        M.create_vertex(g, "alice", "Person")


def test_create_edge_validates_endpoints(person_graph):
    """create_edge endpoint validation (rdb/datastore.rs:272-281)."""
    g = M.create_edge(person_graph, "charlie", "KNOWS", "diana", {"since": 2024})
    assert g.edge_count() == 4
    with pytest.raises(M.InvalidEdgeError):
        M.create_edge(g, "alice", "KNOWS", "ghost")
    # upsert: re-creating the same triple replaces, not duplicates
    g2 = M.create_edge(g, "charlie", "KNOWS", "diana", {"since": 2025})
    assert g2.edge_count() == 4
    row = g2.edges.filter("src = 'charlie' AND dst = 'diana'").collect()[0]
    assert row["properties"]["since"] == "2025"


def test_delete_vertex_cascades(person_graph):
    """Cascade delete removes incident edges both directions
    (rdb/managers.rs:119-159; tests/vertex.rs:150-174)."""
    g = M.delete(person_graph, Q.specific_vertices("bob"))
    assert ids(g.vertices) == ["alice", "charlie", "diana"]
    # alice->bob (out of bob: in-edge) and bob->diana (out-edge) both gone
    remaining = g.edges.select("src", "dst").collect()
    assert [(r[0], r[1]) for r in remaining] == [("alice", "charlie")]


def test_delete_by_query(person_graph):
    """delete(Query) on a filtered set (tests/vertex.rs:150-178)."""
    g = M.delete(
        person_graph, Q.range_vertices(t="Person").with_property_equal_to("active", False)
    )
    assert ids(g.vertices) == ["alice", "bob", "diana"]


def test_delete_count_invalid(person_graph):
    """Deleting a Count query raises (tests/vertex.rs:190-194)."""
    with pytest.raises(OperationOnQueryError):
        M.delete(person_graph, Q.vertices().count())
    with pytest.raises(OperationOnQueryError):
        M.delete(person_graph, Q.vertices().properties())


def test_delete_edges_only(person_graph):
    g = M.delete(person_graph, Q.edges_with_property("project"))
    assert g.edge_count() == 2
    assert g.vertex_count() == 4  # vertices untouched


def test_set_properties(person_graph):
    """set_properties over a query's selection (rdb/datastore.rs:342-362)."""
    g = M.set_properties(
        person_graph, Q.specific_vertices("alice", "bob"), "tier", "gold"
    )
    got = {
        r["id"]: (r["properties"] or {}).get("tier")
        for r in g.vertices.collect()
    }
    assert got == {"alice": "gold", "bob": "gold", "charlie": None, "diana": None}
    # overwrite existing value
    g2 = M.set_properties(g, Q.specific_vertices("alice"), "tier", "platinum")
    row = g2.vertices.filter("id = 'alice'").collect()[0]
    assert row["properties"]["tier"] == "platinum"
    # age preserved
    assert row["properties"]["age"] == "30"


def test_set_edge_properties(person_graph):
    g = M.set_properties(
        person_graph, Q.edges_with_property_value("since", 2018), "verified", True
    )
    row = g.edges.filter("dst = 'bob'").collect()[0]
    assert row["properties"]["verified"] == "true"
    other = g.edges.filter("dst = 'charlie'").collect()[0]
    assert "verified" not in other["properties"]


def test_remove_property(person_graph):
    """REMOVE n.prop (queries_examples.txt:140-143)."""
    g = M.remove_property(person_graph, Q.specific_vertices("alice"), "score")
    row = g.vertices.filter("id = 'alice'").collect()[0]
    assert "score" not in row["properties"]
    bob = g.vertices.filter("id = 'bob'").collect()[0]
    assert bob["properties"]["score"] == "87.2"


def test_bulk_insert_skips_validation(person_graph):
    """Redundant vertex + dangling edge allowed
    (tests/bulk_insert.rs:79-98)."""
    g = M.bulk_insert(
        person_graph,
        vertices=[("alice", "Person", {"age": 99}), ("zed", "Person", {})],
        edges=[("zed", "KNOWS", "nobody", {})],
    )
    # duplicate alice row exists (validation skipped)
    assert g.vertices.filter("id = 'alice'").count() == 2
    assert g.edges.filter("dst = 'nobody'").count() == 1


def test_create_edge_unvalidated_clears_integrity(person_graph):
    """create_edge(validate=False) skips the endpoint check exactly
    like bulk_insert, so it must also clear integrity_validated — or
    the Cypher anonymous-endpoint join elision would return the
    dangling edge as if its endpoint existed."""
    person_graph.integrity_validated = True  # simulate a validated state
    g = M.create_edge(person_graph, "alice", "KNOWS", "ghost",
                      validate=False)
    assert g.edges.filter("dst = 'ghost'").count() == 1
    assert not g.integrity_validated
    # the validating path preserves the flag
    g2 = M.create_edge(g, "alice", "KNOWS", "bob")
    assert not g2.integrity_validated  # already cleared, stays cleared


def test_update_vertex_upsert(person_graph):
    g = M.update_vertex(person_graph, "alice", "Admin", {"age": 31})
    row = g.vertices.filter("id = 'alice'").collect()[0]
    assert row["label"] == "Admin"
    assert row["properties"] == {"age": "31"}
    assert g.vertex_count() == 4
    g2 = M.update_vertex(g, "newbie", "Person", {})
    assert g2.vertex_count() == 5
