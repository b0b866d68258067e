"""Cypher subset front-end: parser + DataFrame executor.

Reference: lib/src/query_parser/cypher_parser.rs (nom-based, 11
statement variants) extended to the declared corpus of
lib/src/storage_engine/queries_examples.txt per SURVEY.md §7.2 M4.
"""

from graphdb_spark.cypher.parser import is_cypher, parse_cypher
from graphdb_spark.cypher.executor import execute_cypher

__all__ = ["is_cypher", "parse_cypher", "execute_cypher"]
