"""Cypher workload: queries executed through the full Cypher parse →
plan → DataFrame pipeline on the F6 graph, oracle-checked against
plain SQL in DuckDB.

This is the strongest correctness evidence for the Cypher front-end:
the same semantics must fall out of (tokenizer → AST → binding-table
joins → implicit grouping) on Spark and hand-written SQL on DuckDB.
"""

from __future__ import annotations

from graphdb_spark.workloads.graph import graph_session


def cypher_where_topk(spark, sf_dir):
    """WHERE + numeric property compare + ORDER BY/LIMIT
    (queries_examples.txt:84-87 shape)."""
    g = graph_session(spark, sf_dir)
    return g.cypher(
        "MATCH (c:customer) WHERE c.acctbal > 9000 "
        "RETURN c.name AS name, toFloat(c.acctbal) AS acctbal "
        "ORDER BY acctbal DESC, name LIMIT 15"
    )


CYPHER_WHERE_TOPK_SQL = """
SELECT c_name AS name, c_acctbal AS acctbal FROM customer
WHERE c_acctbal > 9000 ORDER BY acctbal DESC, name LIMIT 15
"""


def cypher_grouped_count(spark, sf_dir):
    """Implicit grouping: RETURN mixes keys and aggregates
    (queries_examples.txt:120-123)."""
    g = graph_session(spark, sf_dir)
    return g.cypher(
        "MATCH (c:customer)-[r:PLACED]->() "
        "RETURN c.name AS name, count(r) AS orders "
        "ORDER BY orders DESC, name LIMIT 10"
    )


CYPHER_GROUPED_COUNT_SQL = """
SELECT c_name AS name, CAST(COUNT(*) AS BIGINT) AS orders
FROM customer JOIN orders ON o_custkey = c_custkey
GROUP BY c_name ORDER BY orders DESC, name LIMIT 10
"""


def cypher_one_hop_agg(spark, sf_dir):
    """Pattern + property-map filter + traversal + aggregate."""
    g = graph_session(spark, sf_dir)
    return g.cypher(
        "MATCH (c:customer {mktsegment: 'BUILDING'})-[:PLACED]->(o) "
        "RETURN o.orderstatus AS status, count(o) AS n ORDER BY status"
    )


CYPHER_ONE_HOP_AGG_SQL = """
SELECT o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS n
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' GROUP BY 1 ORDER BY status
"""


def cypher_optional_match(spark, sf_dir):
    """OPTIONAL MATCH = left join; count(o) is 0 for customers with
    no orders (count skips nulls)."""
    g = graph_session(spark, sf_dir)
    return g.cypher(
        "MATCH (c:customer) OPTIONAL MATCH (c)-[:PLACED]->(o) "
        "RETURN c.name AS name, count(o) AS orders ORDER BY name"
    )


CYPHER_OPTIONAL_SQL = """
SELECT c_name AS name, CAST(COUNT(o_orderkey) AS BIGINT) AS orders
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_name ORDER BY name
"""


def cypher_string_predicates(spark, sf_dir):
    """CONTAINS / STARTS WITH / regex =~ (queries_examples.txt:106,
    180-183)."""
    g = graph_session(spark, sf_dir)
    return g.cypher(
        "MATCH (p:part) WHERE toLower(p.type) CONTAINS 'brass' "
        "AND p.brand =~ 'Brand#[13].*' "
        "RETURN p.brand AS brand, count(p) AS n ORDER BY brand"
    )


CYPHER_STRING_SQL = """
SELECT p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS n
FROM part
WHERE CONTAINS(LOWER(p_type), 'brass') AND regexp_matches(p_brand, '^(?:Brand#[13].*)$')
GROUP BY 1 ORDER BY brand
"""


def cypher_two_hop_distinct(spark, sf_dir):
    """Two-hop chain + DISTINCT projection."""
    g = graph_session(spark, sf_dir)
    return g.cypher(
        "MATCH (c:customer {mktsegment: 'MACHINERY'})-[:PLACED]->(o)"
        "-[:CONTAINS]->(p) "
        "RETURN DISTINCT p.brand AS brand ORDER BY brand"
    )


CYPHER_TWO_HOP_SQL = """
SELECT DISTINCT p_brand AS brand
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) li
  ON li.l_orderkey = o_orderkey
JOIN part ON p_partkey = li.l_partkey
WHERE c_mktsegment = 'MACHINERY'
ORDER BY brand
"""


def cypher_with_having(spark, sf_dir):
    """WITH aggregation chaining + HAVING-like WHERE
    (grouped WITH → filter → RETURN)."""
    g = graph_session(spark, sf_dir)
    return g.cypher(
        "MATCH (c:customer)-[r:PLACED]->() "
        "WITH c, count(r) AS deg WHERE deg >= 15 "
        "RETURN c.name AS name, deg ORDER BY deg DESC, name"
    )


CYPHER_WITH_HAVING_SQL = """
SELECT c_name AS name, CAST(COUNT(*) AS BIGINT) AS deg
FROM customer JOIN orders ON o_custkey = c_custkey
GROUP BY c_name HAVING COUNT(*) >= 15
ORDER BY deg DESC, name
"""


def cypher_varlen_paths(spark, sf_dir):
    """Reified variable-length paths: MATCH p = (...)-[*1..2]->(x)
    RETURN length(p) — one row per concrete relationship-path
    (relationship-isomorphic), so the counts are true path
    multiplicities (1 hop: PLACED edges; 2 hops: PLACED·CONTAINS)."""
    g = graph_session(spark, sf_dir)
    return g.cypher(
        "MATCH p = (c:customer {mktsegment: 'BUILDING'})-[*1..2]->(x) "
        "RETURN length(p) AS hops, count(*) AS n ORDER BY hops"
    )


CYPHER_VARLEN_SQL = """
WITH b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
     h1 AS (SELECT COUNT(*) AS n FROM orders JOIN b ON o_custkey = b.c_custkey),
     h2 AS (SELECT COUNT(*) AS n
            FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) li
            JOIN orders ON o_orderkey = li.l_orderkey
            JOIN b ON o_custkey = b.c_custkey)
SELECT 1 AS hops, n FROM h1 UNION ALL SELECT 2, n FROM h2 ORDER BY hops
"""


def cypher_pattern_predicate(spark, sf_dir):
    """WHERE NOT (c)-[:PLACED]->() — existential pattern predicate
    lowered to an anti-join (customers with no orders, per segment)."""
    g = graph_session(spark, sf_dir)
    return g.cypher(
        "MATCH (c:customer) WHERE NOT (c)-[:PLACED]->() "
        "RETURN c.mktsegment AS segment, count(c) AS n ORDER BY segment"
    )


CYPHER_PATTERN_PRED_SQL = """
SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY 1 ORDER BY segment
"""


def cypher_case_banding(spark, sf_dir):
    """CASE expression as an implicit grouping key (order price
    bands)."""
    g = graph_session(spark, sf_dir)
    return g.cypher(
        "MATCH (o:order) RETURN "
        "CASE WHEN o.totalprice > 200000 THEN 'high' "
        "WHEN o.totalprice > 100000 THEN 'mid' ELSE 'low' END AS band, "
        "count(o) AS n ORDER BY band"
    )


CYPHER_CASE_SQL = """
SELECT CASE WHEN o_totalprice > 200000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS band,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY 1 ORDER BY band
"""


def cypher_union(spark, sf_dir):
    """UNION across two MATCH arms (distinct by name)."""
    g = graph_session(spark, sf_dir)
    return g.cypher(
        "MATCH (c:customer) WHERE c.acctbal > 9900 RETURN c.name AS name "
        "UNION MATCH (c:customer) WHERE c.acctbal < -900 "
        "RETURN c.name AS name"
    ).orderBy("name")


CYPHER_UNION_SQL = """
SELECT c_name AS name FROM customer WHERE c_acctbal > 9900
UNION
SELECT c_name FROM customer WHERE c_acctbal < -900
ORDER BY name
"""


def cypher_undirected(spark, sf_dir):
    """Bidirectional pattern (corpus #8 shape): ``-[:PLACED]-`` with no
    arrow matches the edge in either direction; for an order vertex the
    undirected PLACED neighborhood is exactly its one placing customer
    (in-edge) — a wrong direction-union doubles or zeroes the count."""
    g = graph_session(spark, sf_dir)
    return g.cypher(
        "MATCH (o:order)-[:PLACED]-(c:customer) "
        "WHERE c.mktsegment = 'MACHINERY' AND o.orderstatus = 'F' "
        "RETURN c.mktsegment AS segment, count(o) AS n"
    )


CYPHER_UNDIRECTED_SQL = """
SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'MACHINERY' AND o_orderstatus = 'F'
GROUP BY c_mktsegment
"""


QUERIES = {
    "cypher_case_banding": (cypher_case_banding, CYPHER_CASE_SQL),
    "cypher_undirected": (cypher_undirected, CYPHER_UNDIRECTED_SQL),
    "cypher_union": (cypher_union, CYPHER_UNION_SQL),
    "cypher_varlen_paths": (cypher_varlen_paths, CYPHER_VARLEN_SQL),
    "cypher_pattern_predicate": (cypher_pattern_predicate,
                                 CYPHER_PATTERN_PRED_SQL),
    "cypher_with_having": (cypher_with_having, CYPHER_WITH_HAVING_SQL),
    "cypher_where_topk": (cypher_where_topk, CYPHER_WHERE_TOPK_SQL),
    "cypher_grouped_count": (cypher_grouped_count, CYPHER_GROUPED_COUNT_SQL),
    "cypher_one_hop_agg": (cypher_one_hop_agg, CYPHER_ONE_HOP_AGG_SQL),
    "cypher_optional_match": (cypher_optional_match, CYPHER_OPTIONAL_SQL),
    "cypher_string_predicates": (cypher_string_predicates, CYPHER_STRING_SQL),
    "cypher_two_hop_distinct": (cypher_two_hop_distinct, CYPHER_TWO_HOP_SQL),
}
