"""Healthcare domain models: the reference's 40+ ``ToVertex``
converters (models/src/medical/*.rs, e.g. patient.rs:19-45) as ONE
data-parallel converter plus a declarative schema registry.

The reference hand-writes a Rust impl per entity; each does the same
three things (models/src/medical/patient.rs:19-45,
lib/src/graph_engine/medical.rs:18-40):

1. label = the entity name,
2. every field stringified (ints/floats via to_string, bools
   true/false, DateTime via to_rfc3339),
3. Option::None fields SKIPPED (no property entry).

Spark-first, that is a single ``to_vertices(df, label)`` projection
over a typed DataFrame — per-entity behavior is DATA (the ``ENTITIES``
registry below), not code. The registry's field lists mirror the
reference structs 1:1 so a user can load any entity table (CSV/JDBC/
parquet) with ``entity_schema``, convert, and query it with the pipe
algebra or Cypher.

Edges: the reference materializes patient -[HAS_DIAGNOSIS]-> diagnosis
from the diagnosis row's patient_id FK
(lib/src/graph_engine/medical.rs:55-72; the other entities are an
explicit TODO there, extend_medical_graph). ``FK_EDGES`` applies that
same convention — FK column ``<target>_id`` on entity E yields
(target)-[HAS_<E>]->(E) — to every registered entity, and
``fk_edges`` builds the edge DataFrame in one select (no per-row
logic, no shuffle: edges inherit the entity table's partitioning).

Timestamps render at seconds precision ("%Y-%m-%dT%H:%M:%S+00:00",
UTC session timezone): chrono's to_rfc3339 prints fractional seconds
only when non-zero; sub-second inputs here truncate (documented
deviation — property values are display strings, not sort keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# label -> ordered (field, kind, optional); kind in
# {int, float, bool, str, ts}. Mirrors the pub struct fields of
# models/src/medical/<file>.rs (mod.rs lists the modules).
ENTITIES: dict[str, list[tuple[str, str, bool]]] = {
    "Address": [("id", "str", False), ("address_line1", "str", False), ("address_line2", "str", True), ("city", "str", False), ("state_province", "str", False), ("postal_code", "str", False), ("country", "str", False)],
    "BillingAddress": [("id", "int", False), ("patient_id", "int", True), ("address", "str", True), ("city", "str", True), ("state", "str", True), ("postal_code", "str", True), ("country", "str", True)],
    "Claim": [("id", "int", False), ("patient_id", "int", False), ("insurance_id", "int", False), ("date_of_service", "ts", False), ("amount_billed", "float", False), ("amount_covered", "float", False), ("status", "str", False)],
    "ClinicalNote": [("id", "int", False), ("patient_id", "int", False), ("doctor_id", "int", False), ("note_text", "str", False), ("created_at", "ts", False), ("updated_at", "ts", False)],
    "Department": [("id", "int", False), ("hospital_id", "int", False), ("name", "str", False), ("department_type", "str", False), ("head_of_department_user_id", "int", True), ("phone", "str", True), ("description", "str", True), ("created_at", "ts", False), ("updated_at", "ts", False)],
    "Diagnosis": [("id", "int", False), ("patient_id", "int", False), ("doctor_id", "int", False), ("code_id", "int", False), ("description", "str", False), ("date", "str", False)],
    "Disposition": [("id", "int", False), ("encounter_id", "int", False), ("patient_id", "int", False), ("disposition_type", "str", False), ("admitting_service", "str", True), ("admitting_doctor_id", "int", True), ("transfer_facility_id", "int", True), ("discharge_instructions", "str", True), ("disposed_at", "ts", False)],
    "Doctor": [("id", "int", False), ("first_name", "str", False), ("last_name", "str", False), ("phone", "str", False), ("email", "str", False), ("specialization", "str", False), ("license_number", "str", False)],
    "Dosage": [("id", "int", False), ("medication_id", "int", False), ("dosage_amount", "str", False), ("dosage_frequency", "str", False), ("created_at", "ts", False), ("updated_at", "ts", True)],
    "EdEvent": [("id", "int", False), ("encounter_id", "int", False), ("event_type", "str", False), ("event_description", "str", True), ("associated_entity_id", "int", True), ("occurred_at", "ts", False), ("recorded_by_user_id", "int", False)],
    "EdProcedure": [("id", "int", False), ("encounter_id", "int", False), ("patient_id", "int", False), ("procedure_code_id", "int", False), ("procedure_name", "str", False), ("performed_by_doctor_id", "int", False), ("assist_nurse_id", "int", True), ("start_time", "ts", False), ("end_time", "ts", True), ("outcome", "str", True), ("notes", "str", True)],
    "Encounter": [("id", "int", False), ("patient_id", "int", False), ("doctor_id", "int", False), ("encounter_type", "str", False), ("date", "ts", False), ("notes", "str", True)],
    "Event": [("id", "int", False), ("patient_id", "int", False), ("event_type", "str", False), ("event_date", "ts", False), ("description", "str", False)],
    "FacilityUnit": [("id", "int", False), ("department_id", "int", False), ("name", "str", False), ("unit_type", "str", False), ("total_beds", "int", True), ("current_occupancy", "int", True), ("phone", "str", True), ("created_at", "ts", False), ("updated_at", "ts", False)],
    "FHIRMessage": [("id", "int", False), ("message_type", "str", False), ("message_content", "str", False), ("received_date", "ts", False), ("sent_date", "ts", True), ("status", "str", False)],
    "HL7Message": [("id", "int", False), ("message_type", "str", False), ("message_content", "str", False), ("received_date", "ts", False), ("sent_date", "ts", True), ("status", "str", False)],
    "Hospital": [("id", "int", False), ("name", "str", False), ("address_id", "int", False), ("phone", "str", True), ("website", "str", True), ("admin_contact_user_id", "int", True), ("created_at", "ts", False), ("updated_at", "ts", False)],
    "Immunization": [("id", "int", False), ("patient_id", "int", False), ("vaccine_name", "str", False), ("administration_date", "ts", False), ("administered_by", "int", True), ("notes", "str", True)],
    "Insurance": [("id", "int", False), ("name", "str", False), ("contact_info", "str", False), ("coverage_details", "str", True), ("claims_integration_status", "str", False)],
    "Login": [("id", "int", False), ("username", "str", False), ("password", "str", False), ("login_time", "ts", False)],
    "MasterPatientIndex": [("id", "int", False), ("patient_id", "int", True), ("first_name", "str", True), ("last_name", "str", True), ("date_of_birth", "ts", True), ("gender", "str", True), ("address", "str", True), ("contact_number", "str", True), ("email", "str", True), ("social_security_number", "str", True), ("match_score", "float", True), ("match_date", "ts", True), ("created_at", "ts", False), ("updated_at", "ts", False)],
    "MedicalCode": [("id", "int", False), ("code", "str", False), ("description", "str", False), ("code_type", "str", False), ("created_at", "ts", False), ("updated_at", "ts", False)],
    "MedicalInteraction": [("id", "int", False), ("primary_medication_id", "int", False), ("secondary_medication_id", "int", False)],
    "MedicalInteractionPrimary": [("id", "int", False), ("medication_id", "int", False), ("interaction_name", "str", False), ("interaction_class", "str", False), ("description", "str", True)],
    "MedicalInteractionSecondary": [("id", "int", False), ("primary_medication_id", "int", False), ("secondary_medication_id", "int", False), ("severity", "str", False), ("description", "str", True)],
    "MedicalRecord": [("id", "int", False), ("patient_id", "int", False), ("doctor_id", "int", False), ("record_type", "str", True), ("record_data", "str", True), ("created_at", "ts", False), ("updated_at", "ts", False)],
    "Medication": [("id", "int", False), ("name", "str", False), ("brand_name", "str", True), ("generic_name", "str", True), ("medication_class", "str", False)],
    "Nurse": [("id", "int", False), ("user_id", "int", False), ("license_number", "str", False), ("specialty", "str", True), ("years_of_experience", "int", False), ("created_at", "ts", False), ("updated_at", "ts", False)],
    "Observation": [("id", "int", False), ("encounter_id", "int", False), ("patient_id", "int", False), ("observation_type", "str", False), ("value", "str", False), ("unit", "str", True), ("observed_at", "ts", False), ("observed_by_user_id", "int", False)],
    "Partner": [("id", "int", False), ("partner_type", "str", False), ("name", "str", False), ("contact_person_user_id", "int", True), ("phone", "str", True), ("email", "str", True), ("address", "str", True), ("created_at", "ts", False), ("updated_at", "ts", False)],
    "Patient": [("id", "int", False), ("user_id", "int", True), ("first_name", "str", False), ("last_name", "str", False), ("date_of_birth", "ts", False), ("gender", "str", False), ("address", "str", True), ("phone", "str", True), ("email", "str", True), ("created_at", "ts", False), ("updated_at", "ts", False)],
    "PatientJourney": [("id", "int", False), ("patient_id", "int", False), ("encounter_id", "int", False), ("diagnosis_id", "int", False), ("prescription_id", "int", True), ("vitals_id", "int", True), ("timestamp", "ts", False)],
    "Pharmacy": [("id", "int", False), ("name", "str", False), ("address", "str", True), ("contact_number", "str", True), ("email", "str", True), ("pharmacy_type", "str", True)],
    "PharmacyIntegration": [("id", "int", False), ("pharmacy_id", "int", False), ("prescription_id", "int", False), ("status", "str", False), ("fulfillment_date", "ts", True)],
    "Prescription": [("id", "int", False), ("patient_id", "int", False), ("doctor_id", "int", False), ("medication_name", "str", False), ("dose", "str", False), ("frequency", "str", False), ("start_date", "ts", False), ("end_date", "ts", True)],
    "Refill": [("id", "int", False), ("prescription_id", "int", False), ("date_requested", "ts", False), ("date_fulfilled", "ts", True), ("status", "str", False)],
    "Registration": [("id", "int", False), ("first", "str", False), ("last", "str", False), ("username", "str", False), ("email", "str", False), ("password", "str", False), ("phone", "str", False), ("role_id", "int", False), ("created_at", "ts", False)],
    "Role": [("id", "int", False), ("name", "str", False), ("permissions", "str", False), ("created_at", "ts", False)],
    "SideEffect": [("id", "int", False), ("medication_id", "int", False), ("description", "str", False), ("severity", "str", False), ("onset", "str", True), ("duration", "str", True), ("created_at", "ts", False), ("updated_at", "ts", False)],
    "SocialDeterminant": [("id", "int", False), ("patient_id", "int", False), ("factor_type", "str", False), ("details", "str", True), ("recorded_by", "int", True), ("recorded_at", "ts", False)],
    "StaffAssignment": [("id", "int", False), ("user_id", "int", False), ("hospital_id", "int", False), ("department_id", "int", True), ("facility_unit_id", "int", True), ("assigned_role_id", "int", False), ("start_date", "ts", False), ("end_date", "ts", True), ("is_active", "bool", False), ("created_at", "ts", False), ("updated_at", "ts", False)],
    "StateProvince": [("id", "int", False), ("name", "str", False), ("code", "str", False), ("country", "str", True)],
    "Triage": [("id", "int", False), ("encounter_id", "int", False), ("patient_id", "int", False), ("triage_nurse_id", "int", False), ("triage_level", "str", False), ("chief_complaint", "str", False), ("presenting_symptoms", "str", True), ("pain_score", "int", True), ("triage_notes", "str", True), ("assessed_at", "ts", False)],
    "User": [("first", "str", False), ("last", "str", False), ("username", "str", False), ("email", "str", False), ("password", "str", False), ("phone", "str", True), ("role_id", "int", False)],
    "Vitals": [("id", "int", False), ("patient_id", "int", False), ("weight", "float", True), ("height", "float", True), ("blood_pressure_systolic", "int", True), ("blood_pressure_diastolic", "int", True), ("temperature", "float", True), ("heart_rate", "int", True), ("created_at", "ts", False)],
    "X12EDIMessage": [("id", "int", False), ("transaction_set_id", "str", False), ("transaction_set_control_number", "str", False), ("interchange_control_number", "str", False), ("sender_id", "str", False), ("receiver_id", "str", False), ("message_content", "str", False), ("received_date", "ts", False), ("sent_date", "ts", True), ("status", "str", False)],
}

_DDL = {"int": "int", "float": "double", "bool": "boolean",
        "str": "string", "ts": "timestamp"}

# label of the entity a `<name>_id` FK column points at, where the
# target is itself a registered entity (naming follows the reference's
# snake_case field -> entity convention)
_FK_TARGETS = {
    "patient": "Patient", "doctor": "Doctor", "nurse": "Nurse",
    "encounter": "Encounter", "diagnosis": "Diagnosis",
    "prescription": "Prescription", "medication": "Medication",
    "insurance": "Insurance", "hospital": "Hospital",
    "department": "Department", "facility_unit": "FacilityUnit",
    "pharmacy": "Pharmacy", "vitals": "Vitals", "role": "Role",
    "address": "Address", "code": "MedicalCode",
    "procedure_code": "MedicalCode", "admitting_doctor": "Doctor",
    "performed_by_doctor": "Doctor", "assist_nurse": "Nurse",
    "triage_nurse": "Nurse", "primary_medication": "Medication",
    "secondary_medication": "Medication",
}


def _derive_fk_edges() -> dict[str, list[tuple[str, str, str]]]:
    out: dict[str, list[tuple[str, str, str]]] = {}
    for label, fields in ENTITIES.items():
        rels = []
        for name, kind, _opt in fields:
            if name == "id" or not name.endswith("_id") or kind != "int":
                continue
            target = _FK_TARGETS.get(name[:-3])
            if target is None:
                continue
            rels.append((name, f"HAS_{_snake(label).upper()}", target))
        if rels:
            out[label] = rels
    return out


def _snake(label: str) -> str:
    import re

    return re.sub(r"(?<!^)(?=[A-Z])", "_", label).lower()


#: entity label -> [(fk_column, relationship, target_label)] following
#: the reference's HAS_DIAGNOSIS convention
#: (lib/src/graph_engine/medical.rs:55-62); only that one edge type is
#: materialized in the reference, the rest are its declared TODO
#: (extend_medical_graph) filled in by the same rule.
FK_EDGES = _derive_fk_edges()


def entity_schema(label: str) -> str:
    """Spark DDL schema for loading a typed entity table."""
    return ", ".join(
        f"{name} {_DDL[kind]}" for name, kind, _ in ENTITIES[label]
    )


def _stringify(col, kind: str):
    if kind == "bool":
        return F.when(col, F.lit("true")).otherwise(F.lit("false"))
    if kind == "ts":
        # chrono to_rfc3339 under UTC (seconds precision, see module doc)
        return F.concat(
            F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss"), F.lit("+00:00")
        )
    return col.cast("string")


def to_vertices(df: DataFrame, label: str,
                id_col: str = "id") -> DataFrame:
    """The generic ToVertex: typed entity rows -> engine vertex schema
    (id, label, properties). Null (Option::None) fields are omitted
    from the map, matching the reference's ``if let Some(..)`` skips.
    One narrow projection — no shuffle, no Python row path."""
    fields = ENTITIES[label]
    entries = F.array(*[
        F.struct(
            F.lit(name).alias("key"),
            _stringify(F.col(name), kind).alias("value"),
        )
        for name, kind, _opt in fields
    ])
    prefix = _snake(label) + "_"
    return df.select(
        F.concat(F.lit(prefix), F.col(id_col).cast("string")).alias("id"),
        F.lit(label).alias("label"),
        F.map_from_entries(
            F.filter(entries, lambda s: s["value"].isNotNull())
        ).alias("properties"),
    )


def fk_edges(df: DataFrame, label: str) -> DataFrame:
    """Edges implied by the entity's FK columns, reference convention
    (target)-[HAS_<ENTITY>]->(entity): e.g. Diagnosis.patient_id =>
    (patient_N)-[HAS_DIAGNOSIS]->(diagnosis_M). Null FKs drop out.
    Union of per-FK projections over the same scan — columnar reads
    prune to exactly (id, fk) per branch."""
    rels = FK_EDGES.get(label, [])
    if not rels:
        raise ValueError(f"entity {label!r} declares no FK edges")
    prefix = _snake(label) + "_"
    parts = []
    for fk_col, rel, target in rels:
        tprefix = _snake(target) + "_"
        parts.append(
            df.filter(F.col(fk_col).isNotNull()).select(
                F.concat(F.lit(tprefix), F.col(fk_col).cast("string")
                         ).alias("src"),
                F.lit(rel).alias("relationship"),
                F.concat(F.lit(prefix), F.col("id").cast("string")
                         ).alias("dst"),
                F.create_map().cast("map<string,string>").alias("properties"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
