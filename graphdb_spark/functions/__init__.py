"""Scalar-function + plugin registry.

Two reference surfaces:

1. The gRPC plugin host ``ExecutePlugin(name, arg) -> Json`` backed by
   dynamically loaded libraries (proto/graphdb.proto:374,
   proto/src/server.rs:118-123). Spark-first equivalent: a name →
   Python-callable registry operating on DataFrames/JSON args — no
   dynamic loading, no FFI.
2. The declared healthcare codecs (FHIR/HL7 parsing, README.md:71) —
   implemented as from_json over typed schemas.

Also exposes ``register_sql_functions`` which publishes the engine's
portable helpers (h64, fingerprint-style normalization) as Spark SQL
functions so ``spark.sql`` users get them too.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F

_PLUGINS: dict[str, Callable] = {}


class PluginNotFoundError(KeyError):
    pass


def register_plugin(name: str, fn: Callable) -> None:
    """Register a plugin: fn(spark, arg) -> result (JSON-able or DF)."""
    _PLUGINS[name] = fn


def execute_plugin(spark, name: str, arg=None):
    """ExecutePlugin equivalent (proto/src/server.rs:118-123)."""
    if name not in _PLUGINS:
        raise PluginNotFoundError(name)
    return _PLUGINS[name](spark, arg)


def list_plugins() -> list[str]:
    return sorted(_PLUGINS)


# ---------------------------------------------------------------- codecs

# FHIR Patient resource subset (declared plugin surface, README.md:365-372)
FHIR_PATIENT_SCHEMA = (
    "resourceType string, id string, "
    "name array<struct<family:string, given:array<string>>>, "
    "gender string, birthDate string"
)


def parse_fhir_patients(df: DataFrame, json_col: str = "json") -> DataFrame:
    """FHIR Patient JSON → typed columns (the FHIR codec plugin as
    from_json — schema-on-read instead of a dynamic library)."""
    parsed = df.select(
        F.from_json(F.col(json_col), FHIR_PATIENT_SCHEMA).alias("r")
    ).filter(F.col("r.resourceType") == "Patient")
    return parsed.select(
        F.col("r.id").alias("patient_id"),
        # F.get: NULL (not an ANSI error) when the name array is empty
        F.get(F.col("r.name"), 0)["family"].alias("family_name"),
        F.concat_ws(" ", F.get(F.col("r.name"), 0)["given"]).alias("given_names"),
        F.col("r.gender").alias("gender"),
        F.to_date("r.birthDate").alias("birth_date"),
    )


def parse_hl7_segments(df: DataFrame, msg_col: str = "message") -> DataFrame:
    """HL7v2 pipe-delimited message → exploded (segment, fields) rows.
    Pure split/explode — whole-stage codegen, no UDF."""
    segs = df.select(
        "*", F.explode(F.split(F.col(msg_col), "\r?\n")).alias("segment_raw")
    ).filter(F.length("segment_raw") > 0)
    return segs.select(
        "*",
        F.split(F.col("segment_raw"), r"\|").getItem(0).alias("segment_type"),
        F.split(F.col("segment_raw"), r"\|").alias("fields"),
    ).drop(msg_col)


# ---------------------------------------------------------------- SQL UDF-free helpers


def register_sql_functions(spark) -> None:
    """Publish engine helpers as SQL temp views/expressions. All are
    expression-based (no Python UDF): exposed via SQL macros using
    spark.sql to create SQL functions (Spark 3.4+ SQL UDF syntax)."""
    # SQL scalar functions (CREATE FUNCTION ... RETURN expr)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION gs_h64(s STRING) RETURNS BIGINT "
        "RETURN CAST(conv(substr(md5(s), 1, 8), 16, 10) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION gs_norm_text(s STRING) RETURNS STRING "
        r"RETURN regexp_replace(regexp_replace(lower(trim(s)), '[^\\p{L}\\p{N}\\s]', ''), "
        r"'\\s+', ' ')"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION gs_fingerprint(s STRING) RETURNS BIGINT "
        "RETURN gs_h64(gs_norm_text(s))"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION gs_token_count(s STRING) RETURNS BIGINT "
        r"RETURN size(split(trim(s), '\\s+'))"
    )
