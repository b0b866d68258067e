"""Typed domain-model registries mapped onto the engine's vertex/edge
schema (reference: models/src/medical/mod.rs ToVertex impls)."""

from graphdb_spark.models.medical import (  # noqa: F401
    ENTITIES,
    FK_EDGES,
    entity_schema,
    fk_edges,
    to_vertices,
)
