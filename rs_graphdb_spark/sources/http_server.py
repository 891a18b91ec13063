"""Minimal HTTP serving layer over the engine — reference parity for the
axum server (`/root/reference/src/server.rs:80-121` routes: `/query`,
`/cypher`, `/search`).

Stdlib `ThreadingHTTPServer` only (no web framework in this environment);
the engine-owned logic lives in `sources/json_api.py` and `cypher/` — this
module is ~transport. Responses are JSON rows with a row cap (the
reference caps via pagination; a serving layer must never `collect()` an
unbounded result).

Thread-safety: Spark DataFrame actions are thread-safe on one
SparkSession; the reference serializes through a global mutex
(`src/service.rs:23-34`) — not needed here.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame

from rs_graphdb_spark.cypher import execute_cypher
from rs_graphdb_spark.graph import PropertyGraph
from rs_graphdb_spark.sources.json_api import json_query, substring_search

MAX_ROWS = 1000


def _rows(df: DataFrame, limit: int = MAX_ROWS) -> list[dict]:
    return [r.asDict(recursive=True) for r in df.limit(limit).collect()]


class GraphHTTPServer:
    """Serve a PropertyGraph over HTTP. Routes (all POST, JSON bodies):

    - ``/query``  — `{label, property?, value?, out_rel?, in_rel?, limit?}`
      (`src/server.rs:167-205`)
    - ``/cypher`` — `{query: "MATCH ..."}` (`src/server.rs:592-672`);
      DML statements apply to the served graph in place
    - ``/search`` — `{q: "...", labels?: [...]}` (`src/server.rs:803-852`)
    """

    def __init__(self, graph: PropertyGraph, host: str = "127.0.0.1", port: int = 0):
        self.graph = graph
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                pass

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    if self.path == "/query":
                        out = {"rows": _rows(json_query(outer.graph, body))}
                    elif self.path == "/cypher":
                        res = execute_cypher(outer.graph, body["query"])
                        if isinstance(res, PropertyGraph):
                            outer.graph = res  # DML: swap the served graph
                            out = {"ok": True}
                        else:
                            out = {"rows": _rows(res)}
                    elif self.path == "/search":
                        out = {"rows": _rows(substring_search(
                            outer.graph, body["q"], body.get("labels")))}
                    else:
                        self.send_error(404)
                        return
                    payload = json.dumps(out, default=str).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)
                except Exception as exc:  # noqa: BLE001 — serving layer
                    payload = json.dumps({"error": str(exc)[:500]}).encode()
                    self.send_response(400)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> "GraphHTTPServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
