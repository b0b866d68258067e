"""The pipe-query algebra: a faithful Python port of the reference's
``Query`` enum (models/src/queries.rs:87-123) with the same
validation semantics, as a fluent builder that the translator compiles
to DataFrame chains.

The 15 variants (queries.rs:87-123):

  AllVertex, RangeVertex{limit,t,start_id}, SpecificVertex{ids},
  VertexWithPropertyPresence{name}, VertexWithPropertyValue{name,value},
  AllEdge, SpecificEdge{edges},
  EdgeWithPropertyPresence{name}, EdgeWithPropertyValue{name,value},
  Pipe{inner,direction,limit,t}, PipeProperty{inner,name?},
  PipeWithPropertyPresence{inner,name,present},
  PipeWithPropertyValue{inner,name,value,equal},
  Include{inner}, Count{inner}

Validation ported:
- ``output_type()`` type-checks the tree ahead of execution
  (queries.rs:152-174): pipes compose only over Vertices/Edges —
  piping a Count (or a PipeProperty output) raises
  OperationOnQueryError, matching Error::OperationOnQuery
  (guards exercised by tests/vertex.rs:190-208,
  tests/properties.rs:220-247).
- ``output_len()`` pre-sizes the output list (queries.rs:129-147):
  Include emits its inner stage's outputs *in addition to* the final
  one (include_query.rs semantics, lib/src/tests/include_query.rs:7-32).

Directions (queries.rs Direction): OUT = outbound, IN = inbound.
Semantics of a Pipe step (SURVEY.md §2.3):
  vertices --OUT--> their outbound edges (src ∈ vertex set)
  vertices --IN --> their inbound  edges (dst ∈ vertex set)
  edges    --OUT--> their outbound (src) endpoint vertices
  edges    --IN --> their inbound  (dst) endpoint vertices
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

from graphdb_spark.datamodel import validate_identifier


class OutputType(enum.Enum):
    VERTICES = "vertices"
    EDGES = "edges"
    COUNT = "count"
    VERTEX_PROPERTIES = "vertex_properties"
    EDGE_PROPERTIES = "edge_properties"


class Direction(enum.Enum):
    OUT = "outbound"
    IN = "inbound"


class OperationOnQueryError(TypeError):
    """Port of Error::OperationOnQuery — invalid composition, e.g.
    piping/deleting a Count query (queries.rs:513-521, 537-545)."""


@dataclass(frozen=True)
class Query:
    """Base class. Subclasses are immutable nodes of the query tree."""

    def output_type(self) -> OutputType:
        raise NotImplementedError

    def output_len(self) -> int:
        """Number of QueryOutputValue entries this tree emits
        (queries.rs:129-147)."""
        return 1

    # ---- fluent builder (mirrors indradb's QueryExt) ----

    def _require_pipeable(self):
        if self.output_type() not in (OutputType.VERTICES, OutputType.EDGES):
            raise OperationOnQueryError(
                f"cannot pipe a query producing {self.output_type().value}"
            )

    def outbound(self, limit: int | None = None, t: str | None = None) -> "Pipe":
        return Pipe(inner=self, direction=Direction.OUT, limit=limit, t=t)

    def inbound(self, limit: int | None = None, t: str | None = None) -> "Pipe":
        return Pipe(inner=self, direction=Direction.IN, limit=limit, t=t)

    def properties(self, name: str | None = None) -> "PipeProperty":
        return PipeProperty(inner=self, name=name)

    def with_property(self, name: str, present: bool = True) -> "PipeWithPropertyPresence":
        return PipeWithPropertyPresence(inner=self, name=name, present=present)

    def without_property(self, name: str) -> "PipeWithPropertyPresence":
        return PipeWithPropertyPresence(inner=self, name=name, present=False)

    def with_property_equal_to(self, name: str, value) -> "PipeWithPropertyValue":
        return PipeWithPropertyValue(inner=self, name=name, value=value, equal=True)

    def with_property_not_equal_to(self, name: str, value) -> "PipeWithPropertyValue":
        return PipeWithPropertyValue(inner=self, name=name, value=value, equal=False)

    def include(self) -> "Include":
        return Include(inner=self)

    def count(self) -> "Count":
        return Count(inner=self)


# ---------------------------------------------------------------- roots


@dataclass(frozen=True)
class AllVertex(Query):
    """Full vertex scan (queries.rs:252-264; exec rdb/datastore.rs:62-65)."""

    def output_type(self):
        return OutputType.VERTICES


@dataclass(frozen=True)
class RangeVertex(Query):
    """Vertex scan from a start id, optional label filter, limit
    (queries.rs:267-332). start_id is exclusive — the reference resumes
    *after* it via next_uuid (lib/src/util.rs:85-96)."""

    limit: int | None = None
    t: str | None = None
    start_id: str | None = None

    def __post_init__(self):
        if self.t is not None:
            validate_identifier(self.t)

    def output_type(self):
        return OutputType.VERTICES


@dataclass(frozen=True)
class SpecificVertex(Query):
    """Point lookups by id list (queries.rs:335-360)."""

    ids: tuple = ()

    def output_type(self):
        return OutputType.VERTICES


@dataclass(frozen=True)
class VertexWithPropertyPresence(Query):
    """Vertices having a property (queries.rs:363-379). The reference
    requires an index (NotIndexed otherwise, rdb/datastore.rs:82-90);
    we treat every property as indexed — behavioral superset, see
    GraphSession.strict_indexing for conformance mode."""

    name: str = ""

    def __post_init__(self):
        validate_identifier(self.name)

    def output_type(self):
        return OutputType.VERTICES


@dataclass(frozen=True)
class VertexWithPropertyValue(Query):
    """Vertices with property == value (queries.rs:382-404)."""

    name: str = ""
    value: object = None

    def __post_init__(self):
        validate_identifier(self.name)

    def output_type(self):
        return OutputType.VERTICES


@dataclass(frozen=True)
class AllEdge(Query):
    """Full edge scan (queries.rs:407-419)."""

    def output_type(self):
        return OutputType.EDGES


@dataclass(frozen=True)
class SpecificEdge(Query):
    """Membership check for (src, relationship, dst) triples
    (queries.rs:422-446)."""

    edges: tuple = ()  # tuple of (src, relationship, dst)

    def output_type(self):
        return OutputType.EDGES


@dataclass(frozen=True)
class EdgeWithPropertyPresence(Query):
    """(queries.rs:449-465)"""

    name: str = ""

    def __post_init__(self):
        validate_identifier(self.name)

    def output_type(self):
        return OutputType.EDGES


@dataclass(frozen=True)
class EdgeWithPropertyValue(Query):
    """(queries.rs:468-490)"""

    name: str = ""
    value: object = None

    def __post_init__(self):
        validate_identifier(self.name)

    def output_type(self):
        return OutputType.EDGES


# ---------------------------------------------------------------- pipes


@dataclass(frozen=True)
class Pipe(Query):
    """Traversal step (queries.rs:497-521 + proto PipeQuery limit/t,
    proto/graphdb.proto:140-151). Vertices→edges or edges→vertices,
    per the Direction table in the module docstring."""

    inner: Query = field(default_factory=AllVertex)
    direction: Direction = Direction.OUT
    limit: int | None = None
    t: str | None = None

    def __post_init__(self):
        self.inner._require_pipeable()  # queries.rs:513-521
        if self.t is not None:
            validate_identifier(self.t)

    def output_type(self):
        it = self.inner.output_type()
        return OutputType.EDGES if it == OutputType.VERTICES else OutputType.VERTICES

    def output_len(self):
        inner_extra = self.inner.output_len() - 1
        return inner_extra + 1


@dataclass(frozen=True)
class PipeProperty(Query):
    """Attach properties (one or all) to upstream vertices/edges
    (queries.rs:524-545; exec rdb/datastore.rs:175-194)."""

    inner: Query = field(default_factory=AllVertex)
    name: str | None = None

    def __post_init__(self):
        self.inner._require_pipeable()  # queries.rs:537-545
        if self.name is not None:
            validate_identifier(self.name)

    def output_type(self):
        it = self.inner.output_type()
        return (
            OutputType.VERTEX_PROPERTIES
            if it == OutputType.VERTICES
            else OutputType.EDGE_PROPERTIES
        )

    def output_len(self):
        return self.inner.output_len() - 1 + 1


@dataclass(frozen=True)
class PipeWithPropertyPresence(Query):
    """Keep/drop upstream rows by property presence (queries.rs:548-587)."""

    inner: Query = field(default_factory=AllVertex)
    name: str = ""
    present: bool = True

    def __post_init__(self):
        self.inner._require_pipeable()
        validate_identifier(self.name)

    def output_type(self):
        return self.inner.output_type()

    def output_len(self):
        return self.inner.output_len() - 1 + 1


@dataclass(frozen=True)
class PipeWithPropertyValue(Query):
    """Keep upstream rows where property ==/!= value (queries.rs:590-635)."""

    inner: Query = field(default_factory=AllVertex)
    name: str = ""
    value: object = None
    equal: bool = True

    def __post_init__(self):
        self.inner._require_pipeable()
        validate_identifier(self.name)

    def output_type(self):
        return self.inner.output_type()

    def output_len(self):
        return self.inner.output_len() - 1 + 1


@dataclass(frozen=True)
class Include(Query):
    """Emit the inner stage's output in addition to downstream results
    (queries.rs:638-654; semantics lib/src/tests/include_query.rs:7-32)."""

    inner: Query = field(default_factory=AllVertex)

    def output_type(self):
        return self.inner.output_type()

    def output_len(self):
        return self.inner.output_len() + 1


@dataclass(frozen=True)
class Count(Query):
    """Terminal count (queries.rs:657-675). Cannot be piped, deleted,
    or property-set (tests/vertex.rs:190-208)."""

    inner: Query = field(default_factory=AllVertex)

    def output_type(self):
        return OutputType.COUNT

    def output_len(self):
        return self.inner.output_len() - 1 + 1


# ---------------------------------------------------------------- facade


class Q:
    """Entry points, mirroring indradb's constructors."""

    @staticmethod
    def vertices() -> AllVertex:
        return AllVertex()

    @staticmethod
    def range_vertices(limit=None, t=None, start_id=None) -> RangeVertex:
        return RangeVertex(limit=limit, t=t, start_id=start_id)

    @staticmethod
    def specific_vertices(*ids) -> SpecificVertex:
        return SpecificVertex(ids=tuple(ids))

    @staticmethod
    def vertices_with_property(name) -> VertexWithPropertyPresence:
        return VertexWithPropertyPresence(name=name)

    @staticmethod
    def vertices_with_property_value(name, value) -> VertexWithPropertyValue:
        return VertexWithPropertyValue(name=name, value=value)

    @staticmethod
    def edges() -> AllEdge:
        return AllEdge()

    @staticmethod
    def specific_edges(*triples) -> SpecificEdge:
        return SpecificEdge(edges=tuple(tuple(t) for t in triples))

    @staticmethod
    def edges_with_property(name) -> EdgeWithPropertyPresence:
        return EdgeWithPropertyPresence(name=name)

    @staticmethod
    def edges_with_property_value(name, value) -> EdgeWithPropertyValue:
        return EdgeWithPropertyValue(name=name, value=value)
