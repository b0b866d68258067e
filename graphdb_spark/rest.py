"""REST facade: the reference's declared HTTP entry point, made real.

The reference exposes ``POST /api/v1/query`` plus health/version
endpoints (rest_api/src/lib.rs:498-508) but its query handler is a
mock — it detects the language and returns ``"results": []``
(rest_api/src/lib.rs:266-290). This facade keeps the same routes,
request shape (``{"query": ..., "persist": ...}``) and response
envelope (``status`` / ``query_type`` / ``results``), and actually
executes: Cypher through the Cypher pipeline, SQL through spark.sql
over the registered views — via :meth:`GraphSession.execute`
(language detection parity with query_parser.rs:33-51).

Stdlib-only (http.server): the container has no web framework, and a
driver-embedded facade needs nothing more. The server answers from the
Spark *driver* — the query itself still executes distributed; only the
final ``limit``-bounded collect crosses to HTTP. Row limits are
enforced with ``df.limit(n)`` BEFORE collecting, never an unbounded
pull.

Daemon management routes (daemon/start|stop|list, shutdown) are
intentionally absent: they manage the reference's multi-process
architecture (ZMQ daemon pools), which Spark's driver/executor model
replaces — SURVEY §2.9.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from graphdb_spark import __version__ as _pkg_version

DEFAULT_ROW_LIMIT = 1000


def _detect_language(q: str) -> str:
    """Mirror the reference's QueryType naming (query_parser.rs:11-16)
    for the response envelope."""
    from graphdb_spark.cypher.parser import is_cypher

    s = q.strip()
    if not s:
        return "Unknown"
    if s.startswith("{") or s.split(None, 1)[0].upper() in (
        "QUERY", "MUTATION", "SUBSCRIPTION",
    ):
        return "GraphQL"
    if is_cypher(s):
        return "Cypher"
    return "SQL"


def _df_payload(df, limit: int):
    rows = df.limit(limit).collect()
    cols = df.columns
    return cols, [
        [None if v is None else (v if isinstance(v, (int, float, bool, str))
                                 else str(v)) for v in row]
        for row in (tuple(r) for r in rows)
    ]


class _Handler(BaseHTTPRequestHandler):
    server_version = "graphdb-spark-rest"

    # quiet by default; the server object carries the session
    def log_message(self, *_args):  # noqa: D102
        pass

    def _json(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (stdlib naming)
        if self.path == "/api/v1/health":
            # rest_api/src/lib.rs:227-229 shape
            self._json(200, {"status": "healthy"})
        elif self.path == "/api/v1/version":
            self._json(200, {"version": _pkg_version})
        else:
            self._json(404, {"status": "error", "message": "not found"})

    def do_POST(self):  # noqa: N802
        if self.path != "/api/v1/query":
            self._json(404, {"status": "error", "message": "not found"})
            return
        try:
            n = int(self.headers.get("Content-Length", "0"))
            payload = json.loads(self.rfile.read(n) or b"{}")
            query = payload["query"]
        except (KeyError, ValueError, json.JSONDecodeError) as exc:
            self._json(400, {"status": "error",
                             "message": f"invalid request: {exc}"})
            return
        limit = int(payload.get("limit", DEFAULT_ROW_LIMIT))
        lang = _detect_language(query)
        try:
            df = self.server.graph.execute(query)
            if df is None:  # mutation statements return no rows
                cols, rows = [], []
            else:
                cols, rows = _df_payload(df, limit)
        except Exception as exc:  # noqa: BLE001 — surface as HTTP 400
            self._json(400, {
                "status": "error",
                "query_type": lang,
                "message": f"{type(exc).__name__}: {exc}",
            })
            return
        self._json(200, {
            "status": "success",
            "query_type": lang,
            "columns": cols,
            "results": rows,
        })


class QueryServer:
    """Embedded HTTP facade over one :class:`GraphSession`.

    >>> srv = QueryServer(g).start()     # port 0 -> OS-assigned
    >>> srv.url
    'http://127.0.0.1:54321'
    >>> srv.stop()
    """

    def __init__(self, graph, host: str = "127.0.0.1", port: int = 0):
        self._httpd = ThreadingHTTPServer((host, port), _Handler)
        self._httpd.graph = graph
        self._thread: threading.Thread | None = None

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "QueryServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)
