"""Healthcare domain models (reference models/src/medical/*.rs
ToVertex impls) — generic converter + registry + FK edges."""

import datetime as dt

import pytest

from graphdb_spark.models import medical as M


def test_registry_covers_reference_inventory():
    # 46 entity structs (47 files minus mod.rs; user.rs's NewUser
    # registered as User)
    assert len(M.ENTITIES) == 46
    assert "Patient" in M.ENTITIES and "Triage" in M.ENTITIES
    # every entity has a loadable schema
    for label in M.ENTITIES:
        ddl = M.entity_schema(label)
        assert ddl.count(",") == len(M.ENTITIES[label]) - 1


def test_patient_to_vertices_stringification(spark):
    rows = [
        (1, None, "Ada", "Lovelace",
         dt.datetime(1815, 12, 10, 0, 0, 0), "Female", None, None,
         "ada@example.org", dt.datetime(2026, 1, 1, 12, 0, 0),
         dt.datetime(2026, 1, 2, 12, 0, 0)),
    ]
    df = spark.createDataFrame(rows, M.entity_schema("Patient"))
    v = M.to_vertices(df, "Patient").collect()[0]
    assert v["id"] == "patient_1"
    assert v["label"] == "Patient"
    p = dict(v["properties"])
    # None fields skipped like the reference's `if let Some(..)`
    assert "user_id" not in p and "address" not in p and "phone" not in p
    assert p["first_name"] == "Ada"
    assert p["id"] == "1"
    # RFC3339 under UTC
    assert p["date_of_birth"] == "1815-12-10T00:00:00+00:00"
    assert p["created_at"] == "2026-01-01T12:00:00+00:00"


def test_bool_and_float_stringification(spark):
    rows = [(7, 3, 9, None, None, 5, dt.datetime(2026, 2, 1), None,
             True, dt.datetime(2026, 2, 1), dt.datetime(2026, 2, 1))]
    df = spark.createDataFrame(rows, M.entity_schema("StaffAssignment"))
    p = dict(M.to_vertices(df, "StaffAssignment").collect()[0]["properties"])
    assert p["is_active"] == "true"
    rows = [(2, 4, 70.5, None, 120, 80, None, 64,
             dt.datetime(2026, 3, 1))]
    df = spark.createDataFrame(rows, M.entity_schema("Vitals"))
    p = dict(M.to_vertices(df, "Vitals").collect()[0]["properties"])
    assert p["weight"] == "70.5"
    assert p["blood_pressure_systolic"] == "120"
    assert "temperature" not in p


def test_fk_edges_has_diagnosis_and_traversal(spark):
    """The reference's one materialized medical edge
    (graph_engine/medical.rs:55-72): patient -[HAS_DIAGNOSIS]->
    diagnosis from Diagnosis.patient_id — then a pipe traversal over
    the assembled graph."""
    from graphdb_spark.algebra import Q
    from graphdb_spark.session import GraphSession

    patients = spark.createDataFrame(
        [(1, None, "Ada", "L", dt.datetime(1815, 12, 10), "Female",
          None, None, None, dt.datetime(2026, 1, 1),
          dt.datetime(2026, 1, 1))],
        M.entity_schema("Patient"),
    )
    diagnoses = spark.createDataFrame(
        [(10, 1, 2, 100, "hypertension", "2026-01-05"),
         (11, 1, 2, 101, "arrhythmia", "2026-02-05")],
        M.entity_schema("Diagnosis"),
    )
    v = M.to_vertices(patients, "Patient").unionByName(
        M.to_vertices(diagnoses, "Diagnosis")
    )
    e = M.fk_edges(diagnoses, "Diagnosis")
    rels = {(r["src"], r["relationship"], r["dst"]) for r in e.collect()}
    assert ("patient_1", "HAS_DIAGNOSIS", "diagnosis_10") in rels
    # doctor_id/code_id FKs follow the same convention
    assert ("doctor_2", "HAS_DIAGNOSIS", "diagnosis_10") in rels
    assert ("medical_code_100", "HAS_DIAGNOSIS", "diagnosis_10") in rels

    g = GraphSession(spark, v, e.filter("src LIKE 'patient%'"))
    out = g.df(Q.specific_vertices("patient_1").outbound(
        t="HAS_DIAGNOSIS").inbound())
    got = {r["id"] for r in out.collect()}
    assert got == {"diagnosis_10", "diagnosis_11"}


def test_fk_edge_registry_shape():
    assert M.FK_EDGES["Diagnosis"] == [
        ("patient_id", "HAS_DIAGNOSIS", "Patient"),
        ("doctor_id", "HAS_DIAGNOSIS", "Doctor"),
        ("code_id", "HAS_DIAGNOSIS", "MedicalCode"),
    ]
    with pytest.raises(ValueError):
        M.fk_edges(None, "Address")
