"""The reference's full declared query corpus
(lib/src/storage_engine/queries_examples.txt:1-190) executed end-to-end
in order against one GraphSession — the corpus the reference documents
but never implements beyond single-node MATCH.

Numbered comments follow the corpus numbering of the main 28-scenario
sequence (the file's third block). Two corpus statements are adapted:
 #13 RETURN path on a var-length match → RETURN x (path reification of
     arbitrary var-length matches is unsupported),
 #23 references r without binding it (a bug in the corpus itself) →
     binds r.
"""

import pytest


def rows(df):
    return [tuple(r) for r in df.collect()]


@pytest.fixture(scope="module")
def g(spark):
    from graphdb_spark.session import GraphSession

    return GraphSession(spark)


def test_corpus_full_sequence(g):
    # -- 1. create people
    g.cypher("CREATE (:Person {id: \"alice\", name: \"Alice\", age: 30, active: true, score: 95.5})")
    g.cypher("CREATE (:Person {id: \"bob\", name: \"Bob\", age: 35, active: true, score: 87.2})")
    g.cypher("CREATE (:Person {id: \"charlie\", name: \"Charlie\", age: 28, active: false})")
    out = g.cypher('CREATE (:Person {id: "diana", name: "Diana", age: 32}) '
                   'RETURN "Diana created" AS result')
    assert rows(out) == [("Diana created",)]

    # -- 2. create relationships (MATCH ... CREATE with bound vars)
    g.cypher('MATCH (a:Person {id: "alice"}), (b:Person {id: "bob"}) '
             "CREATE (a)-[:KNOWS {since: 2018, strength: 0.9}]->(b)")
    g.cypher('MATCH (a:Person {id: "alice"}), (c:Person {id: "charlie"}) '
             "CREATE (a)-[:KNOWS {since: 2020, strength: 0.6}]->(c)")
    g.cypher('MATCH (b:Person {id: "bob"}), (d:Person {id: "diana"}) '
             'CREATE (b)-[:WORKS_WITH {project: "GraphDB"}]->(d)')
    assert g.edge_count() == 3

    # -- 3. lookup by id property
    out = g.cypher('MATCH (p:Person {id: "alice"}) RETURN p')
    assert rows(out)[0][0]["properties"]["name"] == "Alice"

    # -- 4. all vertices
    assert g.cypher("MATCH (n) RETURN n").count() == 4

    # -- 5. all edges
    assert g.cypher("MATCH ()-[r]->() RETURN r").count() == 3

    # -- 6. friends of Alice
    out = g.cypher(
        'MATCH (alice:Person {id: "alice"})-[:KNOWS]->(friend) '
        "RETURN friend.name AS friend_name, friend.age, friend.active "
        "ORDER BY friend_name"
    )
    assert rows(out) == [("Bob", "35", "true"), ("Charlie", "28", "false")]

    # -- 7. with relationship properties, ordered
    out = g.cypher(
        'MATCH (alice:Person {id: "alice"})-[r:KNOWS]->(friend) '
        "RETURN friend.name, r.since, r.strength ORDER BY r.strength DESC"
    )
    assert rows(out) == [("Bob", "2018", "0.9"), ("Charlie", "2020", "0.6")]

    # -- 8. bidirectional (no such pair -> empty)
    out = g.cypher(
        'MATCH (a:Person {id: "alice"})-[:KNOWS]->(b:Person {id: "bob"}), '
        "(b)-[:KNOWS]->(a) RETURN a.name, b.name"
    )
    assert out.count() == 0

    # -- 9. numeric WHERE
    out = g.cypher(
        "MATCH (p:Person) WHERE p.age > 30 RETURN p.id, p.name, p.age "
        "ORDER BY p.name"
    )
    assert [r[1] for r in rows(out)] == ["Bob", "Diana"]

    # -- 10. multi-condition
    out = g.cypher(
        "MATCH (p:Person) WHERE p.age >= 30 AND p.active = true "
        "RETURN p.name, p.age ORDER BY p.name"
    )
    assert [r[0] for r in rows(out)] == ["Alice", "Bob"]

    # -- 11. toLower + CONTAINS
    out = g.cypher(
        'MATCH (p:Person) WHERE toLower(p.name) CONTAINS "ali" RETURN p'
    )
    assert rows(out)[0][0]["id"] == "alice"

    # -- 12. shortestPath with separate endpoint MATCH + list comprehensions
    out = g.cypher(
        'MATCH (alice:Person {id: "alice"}), (diana:Person {id: "diana"}) '
        "MATCH path = shortestPath((alice)-[*..5]-(diana)) "
        "RETURN [n IN nodes(path) | n.name] AS path_nodes, "
        "[r IN relationships(path) | r] AS edge_types"
    )
    got = rows(out)[0]
    assert got[0] == ["Alice", "Bob", "Diana"]
    assert got[1] == ["KNOWS", "WORKS_WITH"]

    # -- 13. var-length up to 3 (adapted: RETURN endpoint, not path)
    out = g.cypher(
        'MATCH (a:Person {id: "alice"})-[*1..3]-(x) RETURN DISTINCT x.name '
        "LIMIT 20"
    )
    assert {r[0] for r in rows(out)} == {"Bob", "Charlie", "Diana"}

    # -- 14. grouped count per person
    out = g.cypher(
        "MATCH (p:Person)-[r]->() RETURN p.name AS person, "
        "count(r) AS outgoing_count ORDER BY outgoing_count DESC"
    )
    assert rows(out) == [("Alice", 2), ("Bob", 1)]

    # -- 15. avg of active users
    out = g.cypher(
        "MATCH (p:Person) WHERE p.active = true "
        "RETURN avg(p.age) AS avg_active_age"
    )
    assert rows(out) == [(32.5,)]

    # -- 16. SET with expression + RETURN sees the update
    out = g.cypher(
        'MATCH (p:Person {id: "alice"}) '
        "SET p.age = 31, p.last_seen = timestamp() RETURN p"
    )
    props = rows(out)[0][0]["properties"]
    assert props["age"] == "31" and "last_seen" in props

    # -- 17. add a label
    out = g.cypher('MATCH (p:Person {id: "alice"}) SET p:Employee RETURN labels(p)')
    assert rows(out)[0][0] == ["Person", "Employee"]

    # -- 18. REMOVE + RETURN sees it
    out = g.cypher('MATCH (p:Person {id: "bob"}) REMOVE p.score RETURN p')
    assert "score" not in rows(out)[0][0]["properties"]

    # -- 19. update edge property with expression
    out = g.cypher(
        'MATCH (:Person&Employee {id: "alice"})-[r:KNOWS]->(:Person {id: "bob"}) '
        "SET r.strength = 0.95, r.last_met = date() RETURN r"
    )
    eprops = rows(out)[0][0]["properties"]
    assert eprops["strength"] == "0.95" and "last_met" in eprops

    # -- 20. delete one edge
    g.cypher(
        'MATCH (:Person:Employee {id: "alice"})-[r:KNOWS]->(:Person {id: "charlie"}) '
        "DELETE r"
    )
    assert g.edge_count() == 2

    # -- 21. DETACH DELETE a vertex
    g.cypher('MATCH (c:Person {id: "charlie"}) DETACH DELETE c')
    assert g.vertex_count() == 3

    # -- 22. OPTIONAL MATCH returns null safely
    out = g.cypher(
        'MATCH (p:Person {id: "diana"}) OPTIONAL MATCH (p)-[r:KNOWS]->(friend) '
        "RETURN p.name, friend.name AS knows_someone"
    )
    assert rows(out) == [("Diana", None)]

    # -- 23. multi-type (corpus bug fixed: r bound)
    out = g.cypher(
        'MATCH (a:Person:Employee {id: "alice"})-[r:KNOWS|WORKS_WITH]->(b) '
        "RETURN a.name, type(r), b.name"
    )
    assert rows(out) == [("Alice", "KNOWS", "Bob")]

    # -- 24. collect
    out = g.cypher(
        "MATCH (p:Person) RETURN collect(p.name) AS all_names, "
        "collect(p.age) AS all_ages"
    )
    names, ages = rows(out)[0]
    # multi-label semantics (ADVICE r1 fix): alice is Person:Employee,
    # and :Person matches label MEMBERSHIP, so she still matches here
    assert sorted(names) == ["Alice", "Bob", "Diana"]
    assert sorted(ages) == ["31", "32", "35"]

    # -- 25. UNWIND batch create with per-row property interpolation
    out = g.cypher(
        'UNWIND [{id: "u100", name: "User100", age: 25}, '
        '{id: "u101", name: "User101", age: 29}, '
        '{id: "u102", name: "User102", age: 33}] AS user '
        "CREATE (:Person {id: user.id, name: user.name, age: user.age})"
    )
    assert out["created_vertices"] == 3
    check = g.cypher(
        'MATCH (p:Person) WHERE p.id STARTS WITH "u10" '
        "RETURN p.name, p.age ORDER BY p.name"
    )
    assert rows(check) == [
        ("User100", "25"), ("User101", "29"), ("User102", "33"),
    ]

    # -- 26. case-insensitive regex (full-match semantics)
    out = g.cypher('MATCH (p) WHERE p.name =~ "(?i)alice" RETURN p.name')
    assert rows(out) == [("Alice",)]

    # -- 27. exists()
    out = g.cypher(
        'MATCH (p {id: "alice"}) RETURN exists(p.last_seen) AS has_last_seen'
    )
    assert rows(out) == [(True,)]

    # -- 28. clear everything
    out = g.cypher("MATCH (n) DETACH DELETE n")
    assert g.vertex_count() == 0 and g.edge_count() == 0
