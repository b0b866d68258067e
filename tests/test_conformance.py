"""1:1 port of the reference's datastore conformance suite.

Every test below carries the exact name from the reference's
`full_test_impl!` enumeration (lib/src/tests/macros.rs:26-105) and
reproduces that test's semantics on the Spark engine — same fixture
(util.rs:7-30: one outbound vertex, five inbound vertices, five
test_edge_type edges), same assertions. Where the reference asserts an
error type, we assert our port of it (OperationOnQueryError,
NotIndexedError, VertexExistsError/InvalidEdgeError).

Intentional divergences (documented in SURVEY.md §7.3):
- NotIndexed is strict-mode-only (default mode treats every property as
  indexed — a behavioral superset); indexing tests run strict sessions.
- ids are caller-supplied strings rather than generated UUIDv4 (the
  UUID itself is never semantically meaningful in the reference tests).
"""

from __future__ import annotations

import pytest

from graphdb_spark.algebra import OperationOnQueryError, OutputType, Q
from graphdb_spark.operators import mutations as M
from graphdb_spark.translator import NotIndexedError

NIL = "00000000-0000-0000-0000-000000000000"  # Uuid::default()


@pytest.fixture()
def g(spark):
    from graphdb_spark.session import GraphSession

    return GraphSession(spark)


@pytest.fixture()
def strict(spark):
    from graphdb_spark.session import GraphSession

    return GraphSession(spark, strict_indexing=True)


def create_edges(g):
    """util.rs:17-30: outbound vertex + 5 inbound via test_edge_type."""
    g2 = M.create_vertex(g, "out_1", "test_outbound_vertex_type")
    inbound = []
    for i in range(1, 6):
        vid = f"in_{i}"
        g2 = M.create_vertex(g2, vid, "test_inbound_vertex_type")
        g2 = M.create_edge(g2, "out_1", "test_edge_type", vid)
        inbound.append(vid)
    return g2, "out_1", inbound


def create_vertices(g, n=5):
    """vertex.rs:222-230: five test_vertex_type vertices."""
    ids = []
    for i in range(n):
        vid = f"v_{i}"
        g = M.create_vertex(g, vid, "test_vertex_type")
        ids.append(vid)
    return g, ids


def edge_count(g, vid, t, direction):
    """util.rs:48-67: SpecificVertex → pipe → optional t → count."""
    q = Q.specific_vertices(vid)
    q = q.outbound() if direction == "out" else q.inbound()
    if t is not None:
        q = Q.specific_vertices(vid).outbound(t=t) if direction == "out" \
            else Q.specific_vertices(vid).inbound(t=t)
    return g.get(q.count())[-1].count


# ------------------------------------------------------------------ sync


def test_should_sync(g, tmp_path):
    """sync.rs: sync() persists; our equivalent is save/load round-trip."""
    g2, _, _ = create_edges(g)
    vp, ep = str(tmp_path / "sync_v"), str(tmp_path / "sync_e")
    g2.save(vp, ep)
    from graphdb_spark.session import GraphSession

    g3 = GraphSession.load(g2.spark, vp, ep)
    assert g3.vertex_count() == 6 and g3.edge_count() == 5


# ----------------------------------------------------------- bulk insert


def test_should_bulk_insert(g):
    """bulk_insert.rs:10-77."""
    g2 = M.bulk_insert(
        g,
        vertices=[("bv_1", "bulk_t", {}), ("bv_2", "bulk_t", {})],
        edges=[("bv_1", "bulk_edge", "bv_2", {"k": "v"})],
    )
    assert g2.vertex_count() == 2 and g2.edge_count() == 1


def test_should_bulk_insert_a_redundant_vertex(g):
    """bulk_insert.rs:79-88: duplicate vertex allowed (no validation)."""
    g2 = M.create_vertex(g, "dup", "t")
    g3 = M.bulk_insert(g2, vertices=[("dup", "t", {})])
    # no error; engine keeps both rows until next dedup-on-ingest
    assert g3.vertices.filter("id = 'dup'").count() >= 1


def test_should_bulk_insert_an_invalid_edge(g):
    """bulk_insert.rs:90-98: dangling edge allowed (no validation)."""
    g2 = M.create_vertex(g, "only", "t")
    g3 = M.bulk_insert(g2, edges=[("only", "e", NIL, {})])
    assert g3.edge_count() == 1


# -------------------------------------------------------------- vertices


def test_should_create_vertex_from_type(g):
    """vertex.rs:13-17."""
    g2 = M.create_vertex(g, "cv_1", "test_vertex_type")
    assert g2.vertex_count() == 1


def test_should_get_all_vertices(g):
    """vertex.rs:19-24 (check_has_all_vertices :203-215)."""
    g2, ids = create_vertices(g)
    rows = g2.df(Q.vertices()).collect()
    assert len(rows) >= 5
    got = {r["id"]: r["label"] for r in rows}
    assert all(got[i] == "test_vertex_type" for i in ids)
    assert len(got) == len(rows)  # no duplicate ids


def test_should_get_range_vertices(g):
    """vertex.rs:26-31."""
    g2, ids = create_vertices(g)
    rows = g2.df(Q.range_vertices()).collect()
    assert {r["id"] for r in rows} >= set(ids)


def test_should_get_no_vertices_with_zero_limit(g):
    """vertex.rs:33-38."""
    g2, _ = create_vertices(g)
    assert g2.df(Q.range_vertices(limit=0)).count() == 0


def test_should_get_range_vertices_out_of_range(g):
    """vertex.rs:40-48: start_id past every id returns nothing."""
    g2, _ = create_vertices(g)
    assert g2.df(Q.range_vertices(start_id="￿")).count() == 0


def test_should_get_no_vertices_with_type_filter(g):
    """vertex.rs:50-56."""
    g2, _ = create_vertices(g)
    assert g2.df(Q.range_vertices(t="foo")).count() == 0


def test_should_get_single_vertex(g):
    """vertex.rs:58-66."""
    g2 = M.create_vertex(g, "sv_1", "test_vertex_type")
    rows = g2.df(Q.specific_vertices("sv_1")).collect()
    assert len(rows) == 1
    assert rows[0]["id"] == "sv_1" and rows[0]["label"] == "test_vertex_type"


def test_should_get_single_vertex_nonexisting(g):
    """vertex.rs:68-74."""
    g2 = M.create_vertex(g, "sv_1", "test_vertex_type")
    assert g2.df(Q.specific_vertices(NIL)).count() == 0


def test_should_get_vertices(g):
    """vertex.rs:76-100: membership lookup incl. one missing id."""
    g2, ids = create_vertices(g)
    rows = g2.df(Q.specific_vertices(ids[0], ids[1], ids[2], NIL)).collect()
    assert len(rows) == 3
    assert {r["id"] for r in rows} == set(ids[:3])


def test_should_get_vertices_piped(g):
    """vertex.rs:102-148: 4 chained pipe queries with limits + type
    filters."""
    g2 = M.create_vertex(g, "root", "test_vertex_type")
    g2 = M.create_vertex(g2, "leaf", "test_inbound_vertex_type")
    g2 = M.create_edge(g2, "root", "test_edge_type", "leaf")

    q1 = Q.specific_vertices("root").outbound(limit=1, t="test_edge_type").inbound(limit=1)
    rows = g2.df(q1).collect()
    assert len(rows) == 1 and rows[0]["id"] == "leaf"

    q2 = (Q.specific_vertices("root").outbound(limit=1, t="test_edge_type")
          .inbound(limit=1, t="test_inbound_vertex_type"))
    rows = g2.df(q2).collect()
    assert len(rows) == 1 and rows[0]["id"] == "leaf"

    q3 = (Q.specific_vertices("root").outbound(limit=1, t="test_edge_type")
          .inbound(limit=1, t="foo"))
    assert g2.df(q3).count() == 0

    q4 = q1.inbound(limit=1, t="test_edge_type").outbound(limit=1)
    rows = g2.df(q4).collect()
    assert len(rows) == 1 and rows[0]["id"] == "root"


def test_should_get_a_vertex_count(g):
    """vertex.rs:180-188."""
    g2 = M.create_vertex(g, "c_1", "test_vertex_type")
    assert g2.get(Q.vertices().count())[-1].count >= 1
    assert g2.get(Q.specific_vertices("c_1").count())[-1].count >= 1


def test_should_delete_a_valid_outbound_vertex(g):
    """vertex.rs:150-163: cascade removes outbound edges."""
    g2, out_id, _ = create_edges(g)
    g2 = M.set_properties(g2, Q.specific_vertices(out_id), "foo", True)
    g3 = M.delete(g2, Q.specific_vertices(out_id))
    assert g3.df(Q.specific_vertices(out_id)).count() == 0
    assert edge_count(g3, out_id, "test_edge_type", "out") == 0


def test_should_delete_a_valid_inbound_vertex(g):
    """vertex.rs:165-177: cascade removes inbound edges."""
    g2, _, inbound = create_edges(g)
    g3 = M.delete(g2, Q.specific_vertices(inbound[0]))
    assert g3.df(Q.specific_vertices(inbound[0])).count() == 0
    assert edge_count(g3, inbound[0], "test_edge_type", "in") == 0


def test_should_not_delete_an_invalid_vertex(g):
    """vertex.rs:179-181: deleting a nonexistent vertex is a no-op."""
    g2, _, _ = create_edges(g)
    g3 = M.delete(g2, Q.specific_vertices(NIL))
    assert g3.vertex_count() == 6


def test_should_not_delete_on_vertex_count(g):
    """vertex.rs:190-194: Error::OperationOnQuery."""
    with pytest.raises(OperationOnQueryError):
        M.delete(g, Q.vertices().count())


def test_should_not_pipe_on_vertex_count(g):
    """vertex.rs:196-208: piping a Count is a validation error."""
    with pytest.raises(OperationOnQueryError):
        Q.vertices().count().outbound()


# ----------------------------------------------------------------- edges


def test_should_get_all_edges(g):
    """edge.rs:11-22."""
    g2, out_id, inbound = create_edges(g)
    rows = g2.df(Q.edges()).collect()
    assert {(r["src"], r["relationship"], r["dst"]) for r in rows} == {
        (out_id, "test_edge_type", i) for i in inbound
    }


def test_should_get_a_valid_edge(g):
    """edge.rs:24-39."""
    g2 = M.create_vertex(g, "a", "test_vertex_type")
    g2 = M.create_vertex(g2, "b", "test_vertex_type")
    g2 = M.create_edge(g2, "a", "test_edge_type", "b")
    rows = g2.df(Q.specific_edges(("a", "test_edge_type", "b"))).collect()
    assert len(rows) == 1
    assert (rows[0]["src"], rows[0]["relationship"], rows[0]["dst"]) == (
        "a", "test_edge_type", "b")


def test_should_not_get_an_invalid_edge(g):
    """edge.rs:41-58: either endpoint wrong → no match."""
    g2 = M.create_vertex(g, "a", "test_vertex_type")
    g2 = M.create_vertex(g2, "b", "test_vertex_type")
    g2 = M.create_edge(g2, "a", "test_edge_type", "b")
    assert g2.df(Q.specific_edges(("a", "test_edge_type", NIL))).count() == 0
    assert g2.df(Q.specific_edges((NIL, "test_edge_type", "b"))).count() == 0


def test_should_create_a_valid_edge(g):
    """edge.rs:60-87 incl. the upsert + range regression."""
    g2 = M.create_vertex(g, "a", "test_vertex_type")
    g2 = M.create_vertex(g2, "b", "test_vertex_type")
    g2 = M.create_edge(g2, "a", "test_edge_type", "b")
    assert g2.df(Q.specific_edges(("a", "test_edge_type", "b"))).count() == 1
    # create again = update, not duplicate
    g2 = M.create_edge(g2, "a", "test_edge_type", "b")
    assert g2.df(Q.specific_edges(("a", "test_edge_type", "b"))).count() == 1
    # REGRESSION: range fetch returns exactly one edge
    assert g2.df(Q.specific_vertices("a").outbound(limit=10)).count() == 1


def test_should_not_create_an_invalid_edge(g):
    """edge.rs:89-97: missing inbound endpoint rejected."""
    g2 = M.create_vertex(g, "a", "test_vertex_type")
    with pytest.raises(M.InvalidEdgeError):
        M.create_edge(g2, "a", "test_edge_type", NIL)


def test_should_delete_a_valid_edge(g):
    """edge.rs:99-115."""
    g2 = M.create_vertex(g, "a", "test_edge_type")
    g2 = M.create_vertex(g2, "b", "test_edge_type")
    g2 = M.create_edge(g2, "a", "test_edge_type", "b")
    q = Q.specific_edges(("a", "test_edge_type", "b"))
    g2 = M.set_properties(g2, q, "foo", True)
    g3 = M.delete(g2, q)
    assert g3.df(q).count() == 0


def test_should_not_delete_an_invalid_edge(g):
    """edge.rs:117-128: no-op."""
    g2 = M.create_vertex(g, "a", "test_edge_type")
    g3 = M.delete(g2, Q.specific_edges(("a", "test_edge_type", NIL)))
    assert g3.vertex_count() == 1


def test_should_get_an_edge_count(g):
    """edge.rs:130-135."""
    g2, out_id, _ = create_edges(g)
    assert edge_count(g2, out_id, "test_edge_type", "out") == 5


def test_should_get_an_edge_count_with_no_type(g):
    """edge.rs:137-141."""
    g2, out_id, _ = create_edges(g)
    assert edge_count(g2, out_id, None, "out") == 5


def test_should_get_an_edge_count_for_an_invalid_edge(g):
    """edge.rs:143-147."""
    g2, _, _ = create_edges(g)
    assert edge_count(g2, NIL, "test_edge_type", "out") == 0


def test_should_get_an_inbound_edge_count(g):
    """edge.rs:149-153."""
    g2, _, inbound = create_edges(g)
    assert edge_count(g2, inbound[0], None, "in") == 1


def test_should_get_edges_with_no_type(g):
    """edge.rs:155-159 (check_edge_range :225-240)."""
    g2, out_id, _ = create_edges(g)
    rows = g2.df(Q.specific_vertices(out_id).outbound(limit=10)).collect()
    assert len(rows) == 5
    assert all(r["src"] == out_id and r["relationship"] == "test_edge_type"
               for r in rows)
    assert len({r["dst"] for r in rows}) == 5


def test_should_get_edge_range(g):
    """edge.rs:161-166."""
    g2, out_id, _ = create_edges(g)
    rows = g2.df(
        Q.specific_vertices(out_id).outbound(limit=100, t="test_edge_type")
    ).collect()
    assert len(rows) == 5


def test_should_get_edges(g):
    """edge.rs:168-180: membership by triple list."""
    g2, out_id, inbound = create_edges(g)
    triples = [(out_id, "test_edge_type", i) for i in inbound]
    rows = g2.df(Q.specific_edges(*triples)).collect()
    assert len(rows) == 5


def test_should_get_edges_piped(g):
    """edge.rs:182-214: chained vertex→edge→vertex→edge pipes."""
    g2 = M.create_vertex(g, "root", "test_vertex_type")
    g2 = M.create_vertex(g2, "leaf", "test_inbound_vertex_type")
    g2 = M.create_edge(g2, "root", "test_edge_type", "leaf")
    q1 = Q.specific_vertices("root").outbound(limit=1, t="test_edge_type")
    rows = g2.df(q1).collect()
    assert len(rows) == 1 and rows[0]["dst"] == "leaf"
    q2 = q1.inbound(limit=1).inbound(limit=1, t="test_edge_type")
    rows = g2.df(q2).collect()
    assert len(rows) == 1 and (rows[0]["src"], rows[0]["dst"]) == ("root", "leaf")


def test_should_delete_indexed_edge_with_property_value(strict):
    """edge.rs:216-222 (regression): delete by property value on an
    indexed property with no matches is a clean no-op."""
    g2 = strict
    g2.index_property("k")
    g3 = M.delete(g2, Q.edges_with_property_value("k", None))
    assert g3.edge_count() == 0


# --------------------------------------------------------------- include


def test_should_get_nested_include_query(g):
    """include_query.rs:7-32: vertices + edges + count from one query."""
    g2, out_id, inbound = create_edges(g)
    q = Q.specific_vertices(out_id).include().outbound().include().count()
    out = g2.get(q)
    assert [o.kind for o in out] == [
        OutputType.VERTICES, OutputType.EDGES, OutputType.COUNT]
    assert [r["id"] for r in out[0].df.collect()] == [out_id]
    assert {r["dst"] for r in out[1].df.collect()} == set(inbound)
    assert out[2].count == 5


def test_should_get_unnested_include_query(g):
    """include_query.rs:34-50: vertex + its properties."""
    g2 = M.create_vertex(g, "u_1", "foo")
    g2 = M.set_properties(g2, Q.specific_vertices("u_1"), "bar", True)
    out = g2.get(Q.specific_vertices("u_1").include().properties())
    assert [o.kind for o in out] == [
        OutputType.VERTICES, OutputType.VERTEX_PROPERTIES]
    props = out[1].df.collect()
    assert len(props) == 1


def test_should_include_with_property_presence(strict):
    """include_query.rs:52-77: include + presence / value filters."""
    g2 = M.create_vertex(strict, "p_1", "foo")
    g2.index_property("bar")
    g2 = M.set_properties(g2, Q.specific_vertices("p_1"), "bar", True)
    out = g2.get(Q.specific_vertices("p_1").include().with_property("bar"))
    assert [o.kind for o in out] == [OutputType.VERTICES, OutputType.VERTICES]
    assert out[0].df.count() == 1 and out[1].df.count() == 1
    out = g2.get(
        Q.specific_vertices("p_1").include().with_property_equal_to("bar", True)
    )
    assert out[0].df.count() == 1 and out[1].df.count() == 1


# -------------------------------------------------------------- indexing


def test_should_not_query_unindexed_vertex_property(strict):
    """indexing.rs:32-39."""
    with pytest.raises(NotIndexedError):
        strict.df(Q.vertices_with_property("nope")).count()


def test_should_not_query_unindexed_edge_property(strict):
    """indexing.rs:41-48."""
    with pytest.raises(NotIndexedError):
        strict.df(Q.edges_with_property("nope")).count()


def test_should_index_existing_vertex_property(strict):
    """indexing.rs:50-81: index AFTER data exists → backfilled."""
    g2 = M.create_vertex(strict, "iv_1", "t", {"existing": "x"})
    g2.index_property("existing")
    assert g2.df(Q.vertices_with_property("existing")).count() == 1
    assert g2.df(Q.vertices_with_property_value("existing", "x")).count() == 1


def test_should_index_existing_edge_property(strict):
    """indexing.rs:83-120."""
    g2 = M.create_vertex(strict, "a", "t")
    g2 = M.create_vertex(g2, "b", "t")
    g2 = M.create_edge(g2, "a", "e", "b", {"existing": "x"})
    g2.index_property("existing")
    assert g2.df(Q.edges_with_property("existing")).count() == 1
    assert g2.df(Q.edges_with_property_value("existing", "x")).count() == 1


def test_should_delete_indexed_vertex_property(strict):
    """indexing.rs:122-147: deleting the vertex empties the index."""
    g2 = M.create_vertex(strict, "dv_1", "t", {"k": "v"})
    g2.index_property("k")
    g3 = M.delete(g2, Q.specific_vertices("dv_1"))
    assert g3.df(Q.vertices_with_property("k")).count() == 0


def test_should_delete_indexed_edge_property(strict):
    """indexing.rs:149-176."""
    g2 = M.create_vertex(strict, "a", "t")
    g2 = M.create_vertex(g2, "b", "t")
    g2 = M.create_edge(g2, "a", "e", "b", {"k": "v"})
    g2.index_property("k")
    g3 = M.delete(g2, Q.specific_edges(("a", "e", "b")))
    assert g3.df(Q.edges_with_property("k")).count() == 0


def test_should_update_indexed_vertex_property(strict):
    """indexing.rs:178-207: updated value queryable, old value gone."""
    g2 = M.create_vertex(strict, "uv_1", "t", {"k": "v1"})
    g2.index_property("k")
    g3 = M.set_properties(g2, Q.specific_vertices("uv_1"), "k", "v2")
    assert g3.df(Q.vertices_with_property_value("k", "v1")).count() == 0
    assert g3.df(Q.vertices_with_property_value("k", "v2")).count() == 1


def test_should_update_indexed_edge_property(strict):
    """indexing.rs:209-242."""
    g2 = M.create_vertex(strict, "a", "t")
    g2 = M.create_vertex(g2, "b", "t")
    g2 = M.create_edge(g2, "a", "e", "b", {"k": "v1"})
    g2.index_property("k")
    g3 = M.set_properties(g2, Q.specific_edges(("a", "e", "b")), "k", "v2")
    assert g3.df(Q.edges_with_property_value("k", "v1")).count() == 0
    assert g3.df(Q.edges_with_property_value("k", "v2")).count() == 1


def test_should_query_indexed_vertex_property_empty(strict):
    """indexing.rs:244-249."""
    strict.index_property("empty")
    assert strict.df(Q.vertices_with_property("empty")).count() == 0


def test_should_query_indexed_edge_property_empty(strict):
    """indexing.rs:251-256."""
    strict.index_property("empty")
    assert strict.df(Q.edges_with_property("empty")).count() == 0


def test_should_get_vertex_with_property_value_empty(strict):
    """indexing.rs:258-264: value query on empty index → empty."""
    strict.index_property("empty")
    assert strict.df(Q.vertices_with_property_value("empty", "x")).count() == 0


def test_should_pipe_not_indexed_errors(strict):
    """indexing.rs:266-276: piped presence filter over unindexed
    property errors in strict mode."""
    g2 = M.create_vertex(strict, "a", "t")
    with pytest.raises(NotIndexedError):
        g2.df(Q.vertices().with_property("nope")).count()


# ------------------------------------------------------------ properties


def test_should_handle_vertex_properties(g):
    """properties.rs:10-50: set / get / overwrite / delete."""
    g2 = M.create_vertex(g, "pv_1", "t")
    q = Q.specific_vertices("pv_1")
    g2 = M.set_properties(g2, q, "prop", 42)
    out = g2.get(q.properties("prop"))
    rows = out[-1].df.collect()
    assert len(rows) == 1 and rows[0]["prop_value"] == "42"
    g2 = M.set_properties(g2, q, "prop", 43)
    rows = g2.get(q.properties("prop"))[-1].df.collect()
    assert rows[0]["prop_value"] == "43"
    g3 = M.remove_property(g2, q, "prop")
    assert g3.get(q.properties("prop"))[-1].df.count() == 0


def test_should_not_set_invalid_vertex_properties(g):
    """properties.rs:52-58: setting on a nonexistent vertex is a
    no-op, not an error."""
    g2 = M.set_properties(g, Q.specific_vertices(NIL), "foo", True)
    assert g2.get(Q.specific_vertices(NIL).properties())[-1].df.count() == 0


def test_should_not_delete_invalid_vertex_properties(g):
    """properties.rs:60-72: removing from nonexistent vertex no-ops."""
    g2 = M.remove_property(g, Q.specific_vertices(NIL), "foo")
    assert g2.vertex_count() == 0


def test_should_get_all_vertex_properties(g):
    """properties.rs:74-103: properties() with no name returns all."""
    g2 = M.create_vertex(g, "av_1", "t")
    q = Q.specific_vertices("av_1")
    g2 = M.set_properties(g2, q, "a", 1)
    g2 = M.set_properties(g2, q, "b", 2)
    rows = g2.get(q.properties())[-1].df.collect()
    assert {(r["prop_name"], r["prop_value"]) for r in rows} == {("a", "1"), ("b", "2")}


def test_should_handle_edge_properties(g):
    """properties.rs:105-146."""
    g2 = M.create_vertex(g, "a", "t")
    g2 = M.create_vertex(g2, "b", "t")
    g2 = M.create_edge(g2, "a", "e", "b")
    q = Q.specific_edges(("a", "e", "b"))
    g2 = M.set_properties(g2, q, "prop", "val")
    rows = g2.get(q.properties("prop"))[-1].df.collect()
    assert len(rows) == 1 and rows[0]["prop_value"] == "val"
    g3 = M.remove_property(g2, q, "prop")
    assert g3.get(q.properties("prop"))[-1].df.count() == 0


def test_should_not_set_invalid_edge_properties(g):
    """properties.rs:148-155."""
    g2 = M.set_properties(g, Q.specific_edges(("x", "e", "y")), "foo", True)
    assert g2.edge_count() == 0


def test_should_not_delete_invalid_edge_properties(g):
    """properties.rs:157-170."""
    g2 = M.remove_property(g, Q.specific_edges(("x", "e", "y")), "foo")
    assert g2.edge_count() == 0


def test_should_get_all_edge_properties(g):
    """properties.rs:172-199."""
    g2 = M.create_vertex(g, "a", "t")
    g2 = M.create_vertex(g2, "b", "t")
    g2 = M.create_edge(g2, "a", "e", "b")
    q = Q.specific_edges(("a", "e", "b"))
    g2 = M.set_properties(g2, q, "a1", 1)
    g2 = M.set_properties(g2, q, "b1", 2)
    rows = g2.get(q.properties())[-1].df.collect()
    assert {(r["prop_name"], r["prop_value"]) for r in rows} == {("a1", "1"), ("b1", "2")}


def test_should_get_an_edge_properties_count(g):
    """properties.rs:201-209."""
    g2 = M.create_vertex(g, "a", "t")
    g2 = M.create_vertex(g2, "b", "t")
    g2 = M.create_edge(g2, "a", "e", "b")
    q = Q.specific_edges(("a", "e", "b"))
    g2 = M.set_properties(g2, q, "p", 1)
    assert g2.get(q.properties("p").count())[-1].count == 1


def test_should_get_a_vertex_properties_count(g):
    """properties.rs:211-218."""
    g2 = M.create_vertex(g, "pc_1", "t")
    q = Q.specific_vertices("pc_1")
    g2 = M.set_properties(g2, q, "p", 1)
    assert g2.get(q.properties("p").count())[-1].count == 1


def test_should_not_set_properties_on_count(g):
    """properties.rs:220-226."""
    with pytest.raises(OperationOnQueryError):
        M.set_properties(g, Q.vertices().count(), "foo", True)


def test_should_not_pipe_properties_on_vertex_count(g):
    """properties.rs:228-237."""
    with pytest.raises(OperationOnQueryError):
        Q.vertices().count().properties()


def test_should_not_pipe_property_presence_on_vertex_count(g):
    """properties.rs:239-248."""
    with pytest.raises(OperationOnQueryError):
        Q.vertices().count().with_property("foo")
