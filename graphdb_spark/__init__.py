"""graphdb_spark — a PySpark-native property-graph + analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of dmitryro/graphdb (an IndraDB-derived property-graph
database, see /root/reference), re-expressed Spark-first:

- the graph lives in two DataFrames (``vertices``, ``edges``) backed by
  Parquet/Delta-style columnar storage instead of KV engines;
- the IndraDB pipe-query algebra (reference ``models/src/queries.rs``)
  is a Python builder compiled to DataFrame joins/filters by a
  translator, so Catalyst/AQE provide optimization the reference lacks;
- the Cypher subset (reference ``lib/src/query_parser/cypher_parser.rs``
  plus the declared surface of ``queries_examples.txt``) parses to a
  logical plan lowered onto the same translator;
- mutations (CRUD, cascades, bulk insert) are expressed as DataFrame
  transformations over session-held state;
- temporal replay / time-travel (reference ``lib/src/graph_evolution/``)
  is a change-log DataFrame + window dedup;
- beyond reference parity: large-scale training-data pipeline operators
  (dedup: exact/MinHash-LSH/SimHash/n-gram-Jaccard/embedding-cosine;
  ANN similarity search; text quality/lang-id/tokenize/fingerprint;
  multimodal binary-column plumbing) built on the same DataFrames.

Designed for 100 TB scale: every operator is declarative DataFrame API
(predicate pushdown + column pruning reach the scans), joins broadcast
small sides, aggregations are partial-agg friendly, and the only
driver-side loops are bounded iterative graph traversals with
checkpointed lineage.
"""

from graphdb_spark.session import GraphSession
from graphdb_spark.algebra import Q
from graphdb_spark.datamodel import VERTEX_SCHEMA, EDGE_SCHEMA

__version__ = "0.1.0"

__all__ = ["GraphSession", "Q", "VERTEX_SCHEMA", "EDGE_SCHEMA", "__version__"]
