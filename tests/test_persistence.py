"""Persistence roundtrips: GraphSession save/load (parquet) and
snapshot export/import (reference durability/snapshot.rs surface)."""

from graphdb_spark.session import GraphSession
from graphdb_spark.sources.readers import snapshot_export, snapshot_import


def test_save_load_roundtrip(spark, person_graph, tmp_path):
    vp, ep = str(tmp_path / "v"), str(tmp_path / "e")
    person_graph.save(vp, ep)
    g2 = GraphSession.load(spark, vp, ep)
    assert g2.vertex_count() == person_graph.vertex_count()
    assert g2.edge_count() == person_graph.edge_count()
    row = g2.vertices.filter("id = 'alice'").collect()[0]
    assert row["properties"]["name"] == "Alice"
    # queries work on the reloaded graph
    from graphdb_spark.algebra import Q

    assert g2.df(Q.specific_vertices("alice").outbound(t="KNOWS")).count() == 2


def test_snapshot_json_roundtrip(spark, person_graph, tmp_path):
    """fmt='json' matches the reference's vertices.json/edges.json
    snapshot layout (snapshot.rs:33-62)."""
    path = str(tmp_path / "snap")
    snapshot_export(person_graph.vertices, person_graph.edges, path, fmt="json")
    v, e = snapshot_import(spark, path, fmt="json")
    assert v.count() == 4 and e.count() == 3
    assert set(v.columns) == {"id", "label", "properties"}
