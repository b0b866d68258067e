"""Generic ingest readers + snapshot export/import.

Reference ingest surface: CSV/FHIR/HL7/Postgres declared at
README.md:140 (planned /api/v1/ingest, README.md:290); snapshots are
JSON files vertices.json/edges.json (lib/src/durability/snapshot.rs:33-62,
load :91-115). Spark-first: csv/json/jdbc readers project into the
vertex schema; snapshots are json/parquet writes (Delta time travel
subsumes the binary meta file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _to_vertex_shape(df: DataFrame, id_col: str, label: str,
                     prop_cols: list[str] | None = None) -> DataFrame:
    """Project an arbitrary table into (id, label, properties) —
    the ToVertex trait (models/src/to_vertex.rs:5-7): every property
    stringified (medical/patient.rs:19-45)."""
    prop_cols = prop_cols if prop_cols is not None else [
        c for c in df.columns if c != id_col
    ]
    kv = []
    for c in prop_cols:
        kv.extend([F.lit(c), F.col(c).cast("string")])
    return df.select(
        F.col(id_col).cast("string").alias("id"),
        F.lit(label).alias("label"),
        F.create_map(*kv).alias("properties") if kv else
        F.create_map().cast("map<string,string>").alias("properties"),
    )


def read_csv_vertices(spark: SparkSession, path: str, id_col: str,
                      label: str, **options) -> DataFrame:
    opts = {"header": "true", "inferSchema": "true", **options}
    return _to_vertex_shape(spark.read.options(**opts).csv(path), id_col, label)


def read_json_vertices(spark: SparkSession, path: str, id_col: str,
                       label: str, **options) -> DataFrame:
    return _to_vertex_shape(spark.read.options(**options).json(path), id_col, label)


def read_jdbc(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """Postgres/MySQL ingestion (replaces postgres_storage.rs /
    mysql_storage.rs round-trips) — requires a JDBC driver jar on the
    classpath; surface kept thin deliberately."""
    return spark.read.format("jdbc").option("url", url).option(
        "dbtable", table
    ).options(**options).load()


def snapshot_export(vertices: DataFrame, edges: DataFrame, path: str,
                    fmt: str = "parquet"):
    """snapshot.rs:33-62 equivalent; fmt='json' matches the reference's
    vertices.json/edges.json layout."""
    vertices.write.mode("overwrite").format(fmt).save(f"{path}/vertices")
    edges.write.mode("overwrite").format(fmt).save(f"{path}/edges")


def snapshot_import(spark: SparkSession, path: str, fmt: str = "parquet"):
    """snapshot.rs:91-115 equivalent."""
    v = spark.read.format(fmt).load(f"{path}/vertices")
    e = spark.read.format(fmt).load(f"{path}/edges")
    return v, e
