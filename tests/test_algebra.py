"""Algebra validation tests — ports of the reference's query-shape
guards (models/src/queries.rs:129-174, 513-545; tests/vertex.rs:190-208,
tests/properties.rs:220-247)."""

import pytest

from graphdb_spark import algebra as A
from graphdb_spark.algebra import Q
from graphdb_spark.datamodel import InvalidIdentifierError


def test_output_types():
    assert Q.vertices().output_type() == A.OutputType.VERTICES
    assert Q.edges().output_type() == A.OutputType.EDGES
    assert Q.vertices().outbound().output_type() == A.OutputType.EDGES
    assert Q.vertices().outbound().inbound().output_type() == A.OutputType.VERTICES
    assert Q.vertices().count().output_type() == A.OutputType.COUNT
    assert Q.vertices().properties().output_type() == A.OutputType.VERTEX_PROPERTIES
    assert Q.edges().properties("w").output_type() == A.OutputType.EDGE_PROPERTIES


def test_count_is_terminal():
    """Piping a Count raises (tests/vertex.rs:190-208)."""
    c = Q.vertices().count()
    with pytest.raises(A.OperationOnQueryError):
        c.outbound()
    with pytest.raises(A.OperationOnQueryError):
        c.inbound()
    with pytest.raises(A.OperationOnQueryError):
        c.properties()
    with pytest.raises(A.OperationOnQueryError):
        c.with_property("x")
    with pytest.raises(A.OperationOnQueryError):
        c.with_property_equal_to("x", 1)


def test_property_output_not_pipeable():
    """PipeProperty output cannot be piped further (queries.rs:513-521)."""
    p = Q.vertices().properties()
    with pytest.raises(A.OperationOnQueryError):
        p.outbound()


def test_output_len_include():
    """Include adds a stage (queries.rs:129-147)."""
    q = Q.vertices().include().outbound().count()
    assert q.output_len() == 2
    q2 = Q.vertices().include().outbound().include().inbound()
    assert q2.output_len() == 3
    assert Q.vertices().output_len() == 1


def test_identifier_validation():
    """models/src/identifiers.rs:145-149 + :196-228."""
    with pytest.raises(InvalidIdentifierError):
        A.RangeVertex(t="")
    with pytest.raises(InvalidIdentifierError):
        A.RangeVertex(t="x" * 256)
    A.RangeVertex(t="x" * 255)  # max length ok
    with pytest.raises(InvalidIdentifierError):
        Q.vertices_with_property("")


def test_builder_shapes():
    q = Q.vertices().outbound(limit=10, t="KNOWS")
    assert isinstance(q, A.Pipe)
    assert q.limit == 10 and q.t == "KNOWS"
    assert q.direction == A.Direction.OUT
    sv = Q.specific_vertices("a", "b")
    assert sv.ids == ("a", "b")
    se = Q.specific_edges(("a", "KNOWS", "b"))
    assert se.edges == (("a", "KNOWS", "b"),)
