"""Sources & sinks.

The reference's storage zoo (sled/RocksDB/TiKV/Redis/Postgres/MySQL,
SURVEY.md §2.1 sinks row, ~9k LoC) collapses to Spark data sources;
its declared ingest formats (CSV/FHIR/HL7/Postgres, README.md:140) map
to spark.read.csv/json/jdbc + from_json.
"""

from graphdb_spark.sources.tpch import load_tables, tpch_graph
from graphdb_spark.sources.readers import (
    read_csv_vertices,
    read_json_vertices,
    read_jdbc,
    snapshot_export,
    snapshot_import,
)

__all__ = [
    "load_tables",
    "tpch_graph",
    "read_csv_vertices",
    "read_json_vertices",
    "read_jdbc",
    "snapshot_export",
    "snapshot_import",
]
