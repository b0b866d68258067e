"""REST facade: same routes/envelope as the reference's rest_api
(rest_api/src/lib.rs:498-508), but /api/v1/query actually executes
(the reference's handler is a mock returning results: [] —
lib.rs:266-290)."""

from __future__ import annotations

import json
import urllib.request

import pytest

from graphdb_spark.rest import QueryServer


@pytest.fixture(scope="module")
def server(graph):
    srv = QueryServer(graph).start()
    yield srv
    srv.stop()


def _get(url):
    try:
        with urllib.request.urlopen(url, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(url, payload):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health_and_version(server):
    code, body = _get(server.url + "/api/v1/health")
    assert (code, body["status"]) == (200, "healthy")
    code, body = _get(server.url + "/api/v1/version")
    assert code == 200 and body["version"]


def test_query_sql(server):
    code, body = _post(server.url + "/api/v1/query", {
        "query": "SELECT label, count(*) AS n FROM vertices "
                 "GROUP BY label ORDER BY label",
    })
    assert code == 200 and body["status"] == "success"
    assert body["query_type"] == "SQL"
    assert body["columns"] == ["label", "n"]
    assert [r[0] for r in body["results"]] == ["customer", "order", "part"]


def test_query_cypher(server):
    code, body = _post(server.url + "/api/v1/query", {
        "query": "MATCH (c:customer) RETURN count(c) AS n",
    })
    assert code == 200 and body["query_type"] == "Cypher"
    assert body["results"][0][0] > 0


def test_query_limit_bounds_collect(server):
    code, body = _post(server.url + "/api/v1/query", {
        "query": "MATCH (c:customer) RETURN c.name AS name",
        "limit": 5,
    })
    assert code == 200 and len(body["results"]) == 5


def test_invalid_query_is_400_not_500(server):
    code, body = _post(server.url + "/api/v1/query", {
        "query": "SELECT definitely_not_a_column FROM vertices",
    })
    assert code == 400 and body["status"] == "error"


def test_missing_query_field_is_400(server):
    code, body = _post(server.url + "/api/v1/query", {"persist": True})
    assert code == 400


def test_unknown_route_404(server):
    code, _ = _get(server.url + "/api/v1/nope")
    assert code == 404
