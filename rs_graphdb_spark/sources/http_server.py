"""HTTP serving layer over the engine — route parity with the reference's
axum server (`/root/reference/src/server.rs:83-111`):

POST `/query` `/cypher` `/search` `/nodes` `/rels` `/batch/nodes`
`/batch/rels` `/cache/clear` `/cache/cleanup`; GET `/` `/ui` `/nodes`
`/nodes/<id>` `/nodes/<id>/neighbors` `/rels` `/rels/<id>` `/stats`
`/labels` `/rel-types` `/cache/stats` `/sysinfo` `/queries` `/dbs`;
PUT `/nodes/<id>` `/rels/<id>`; DELETE `/nodes/<id>` `/rels/<id>`;
plus the three protobuf-over-HTTP RPCs under `/grpc/<Method>`
(`sources/protowire.py`).

Stdlib `ThreadingHTTPServer` only (no web framework in this environment);
engine logic lives in `sources/json_api.py`, `cypher/`, `operators/dml.py`
— this module is ~transport. Responses are JSON rows with a row cap (the
reference caps via pagination; a serving layer must never `collect()` an
unbounded result).

Write semantics: the graph is immutable DataFrames, so every write swaps
the served `PropertyGraph` for a rewritten one (exactly how Cypher DML
executes). Single-row POSTs exist for API parity; the scale path is the
`/batch/*` endpoints (one union per request, not per row), mirroring the
reference's `batch_create_nodes` (`src/graph/db.rs:170-203`).

Thread-safety: Spark DataFrame actions are thread-safe on one
SparkSession; graph swaps happen under a lock (the reference serializes
through a global mutex, `src/service.rs:23-34`).
"""

from __future__ import annotations

import json
import re
import threading
from dataclasses import replace as dc_replace
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rs_graphdb_spark.cypher import execute_cypher
from rs_graphdb_spark.graph import EdgeSet, PropertyGraph
from rs_graphdb_spark.session import local_df
from rs_graphdb_spark.sources.json_api import json_query, substring_search

MAX_ROWS = 1000

_NODE_ID = re.compile(r"^/nodes/(-?\d+)$")
_NODE_NEIGHBORS = re.compile(r"^/nodes/(-?\d+)/neighbors$")
_REL_ID = re.compile(r"^/rels/(-?\d+)$")


def _rows(df: DataFrame, limit: int = MAX_ROWS) -> list[dict]:
    return [r.asDict(recursive=True) for r in df.limit(limit).collect()]


def _catalog_counts(g: PropertyGraph) -> tuple[dict[str, int], dict[str, int]]:
    """Per-label and per-rel-type row counts in ONE Spark job: union every
    table's key-literal projection, one groupBy. The previous form ran
    one ``count()`` job per catalog entry — catalog-bounded but a job
    per label on the serving path."""
    frames = [
        df.select(F.lit(f"n\x1f{lb}").alias("k")) for lb, df in g.nodes.items()
    ] + [
        es.df.select(F.lit(f"r\x1f{rt}").alias("k"))
        for rt, es in g.edges.items()
    ]
    nodes = {lb: 0 for lb in g.nodes}
    rels = {rt: 0 for rt in g.edges}
    if frames:
        u = frames[0]
        for f in frames[1:]:
            u = u.unionByName(f)
        for r in u.groupBy("k").count().collect():
            kind, name = r["k"].split("\x1f", 1)
            (nodes if kind == "n" else rels)[name] = r["count"]
    return dict(sorted(nodes.items())), dict(sorted(rels.items()))


class GraphHTTPServer:
    """Serve a PropertyGraph over HTTP with the reference's REST surface."""

    def __init__(self, graph: PropertyGraph, host: str = "127.0.0.1", port: int = 0):
        self.graph = graph
        # Re-entrant: _route holds it across every mutating request's whole
        # read-compute-swap (the reference's global mutex, src/server.rs),
        # and the per-helper blocks re-acquire it.
        self._lock = threading.RLock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                pass

            def _reply(self, out: dict, code: int = 200) -> None:
                payload = json.dumps(out, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length", 0))
                return json.loads(self.rfile.read(n) or b"{}")

            def _dispatch(self, method: str) -> None:
                try:
                    if method == "GET" and self.path == "/ui":
                        # single-file UI (the reference serves its Vue
                        # bundle here, `src/server.rs:85`; ours is a
                        # vanilla-JS console over the SAME data routes —
                        # stats header, Cypher console, graph view, node
                        # details, export; see sources/ui.py)
                        from rs_graphdb_spark.sources.ui import UI_HTML

                        html = UI_HTML.encode()
                        self.send_response(200)
                        self.send_header("Content-Type", "text/html")
                        self.send_header("Content-Length", str(len(html)))
                        self.end_headers()
                        self.wfile.write(html)
                        return
                    if self.path.startswith("/grpc/"):
                        n = int(self.headers.get("Content-Length", 0))
                        blob = outer._route_grpc(
                            method, self.path, self.rfile.read(n)
                        )
                        if blob is None:
                            self.send_error(404)
                            return
                        self.send_response(200)
                        self.send_header("Content-Type", "application/x-protobuf")
                        self.send_header("Content-Length", str(len(blob)))
                        self.end_headers()
                        self.wfile.write(blob)
                        return
                    out = outer._route(method, self.path, self._body)
                    if out is None:
                        self.send_error(404)
                    else:
                        self._reply(out)
                except KeyError as exc:
                    self._reply({"error": f"not found: {exc}"}, 404)
                except Exception as exc:  # noqa: BLE001 — serving layer
                    self._reply({"error": str(exc)[:500]}, 400)

            def do_GET(self):
                self._dispatch("GET")

            def do_POST(self):
                self._dispatch("POST")

            def do_PUT(self):
                self._dispatch("PUT")

            def do_DELETE(self):
                self._dispatch("DELETE")

        import time as _time

        self._born = _time.monotonic()
        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    # -- routing ----------------------------------------------------------

    def _route(self, method: str, path: str, body_fn) -> dict | None:
        if method != "GET":
            # Serialize the entire read-compute-swap for mutating methods:
            # a writer that reads self.graph, derives a new graph, and swaps
            # it must not interleave with another writer's swap (lost
            # update). GETs read an immutable snapshot lock-free.
            with self._lock:
                return self._route_locked(method, path, body_fn)
        return self._route_locked(method, path, body_fn)

    def _route_grpc(self, method: str, path: str, body: bytes) -> bytes | None:
        """The reference's three gRPC RPCs (`proto/graphdb.proto:59-64`,
        `src/grpc/mod.rs:1-50`) served as protobuf-over-HTTP unary calls
        (the grpc-web/Connect shape): ``POST /grpc/<Method>`` with
        ``application/x-protobuf`` request/response bodies, encoded by the
        dependency-free codec in `sources/protowire.py`. Same engine calls
        as the JSON routes — this closes the transport-parity gap without
        a second server."""
        from rs_graphdb_spark.sources import protowire as pw

        if method != "POST":
            return None
        if path == "/grpc/CreateNode":
            req = pw.decode_create_node_request(body)
            label = (req["labels"] or ["Node"])[0]
            props = dict(req["properties"])
            with self._lock:
                g = self.graph
                if "id" in props:
                    nid = int(props["id"])
                else:  # dense next-id like the reference's counter
                    nid = (
                        (g.nodes[label].agg(F.max("id")).first()[0] or 0) + 1
                        if label in g.nodes else 1
                    )
                self._create_nodes(
                    [{"labels": [label], "properties": {**props, "id": nid}}]
                )
            return pw.encode_node(nid, [label], props)
        if path == "/grpc/CreateRelationship":
            req = pw.decode_create_rel_request(body)
            with self._lock:
                g = self.graph
                if req["rel_type"] in g.edges:
                    eid = (
                        g.edges[req["rel_type"]].df.agg(F.max("edge_id"))
                        .first()[0] or 0
                    ) + 1
                else:
                    eid = 1
                self._create_rels([{
                    "rel_type": req["rel_type"], "edge_id": eid,
                    "src": req["start"], "dst": req["end"],
                }])
            return pw.encode_relationship(
                eid, req["start"], req["end"], req["rel_type"],
                req["properties"],
            )
        if path == "/grpc/ExecuteCypher":
            query = pw.decode_cypher_request(body)
            with self._lock:
                res = execute_cypher(self.graph, query)
                if isinstance(res, PropertyGraph):
                    self.graph = res
                    return pw.encode_cypher_response([])
            rows = []
            for r in res.limit(MAX_ROWS).collect():
                d = r.asDict(recursive=True)
                rows.append({
                    k: (v if isinstance(v, (bool, int, float, str)) else str(v))
                    for k, v in d.items()
                })
            return pw.encode_cypher_response(rows)
        return None

    def _route_locked(self, method: str, path: str, body_fn) -> dict | None:
        g = self.graph
        if method == "GET":
            if path == "/":
                return {"name": "rs-graphdb-spark", "status": "ok"}
            if path == "/nodes":
                return {"rows": _rows(g.all_nodes())}
            if path == "/labels":
                return {"labels": sorted(g.nodes)}
            if path == "/rel-types":
                return {"rel_types": sorted(g.edges)}
            if path == "/stats":
                nodes, rels = _catalog_counts(g)
                return {"nodes": nodes, "rels": rels}
            if path == "/cache/stats":
                return {"stats": self._cache().stats()}
            if path == "/sysinfo":
                # reference `/sysinfo` (`src/server.rs:99`,
                # `tests/server_api_test.rs:402-426`): runtime + store
                # shape. kernel_version maps to the Spark version; uptime
                # since server construction.
                spark = next(iter(g.nodes.values())).sparkSession
                nodes, rels = _catalog_counts(g)
                node_count = sum(nodes.values())
                rel_count = sum(rels.values())
                up = int(__import__("time").monotonic() - self._born)
                return {
                    "kernel_version": f"spark-{spark.version}",
                    "store_size": node_count + rel_count,
                    "node_id_count": node_count,
                    "rel_id_count": rel_count,
                    "uptime": f"{up // 3600}h{(up % 3600) // 60}m",
                    "databases": [{
                        "name": "default",
                        "node_count": node_count,
                        "rel_count": rel_count,
                    }],
                }
            if path == "/queries":
                # reference returns [] (no query tracking,
                # `tests/server_api_test.rs:429-437`); Spark actually HAS
                # live job tracking — report the active jobs
                spark = next(iter(g.nodes.values())).sparkSession
                tracker = spark.sparkContext.statusTracker()
                return {"queries": [
                    {"job_id": int(jid), "status": "RUNNING"}
                    for jid in tracker.getActiveJobsIds()
                ]}
            if path == "/dbs":
                return {"databases": [{
                    "name": "default",
                    "node_count": sum(df.count() for df in g.nodes.values()),
                    "rel_count": sum(es.df.count() for es in g.edges.values()),
                }]}
            if m := _NODE_ID.match(path):
                return {"rows": self._node_rows(int(m.group(1)))}
            if m := _NODE_NEIGHBORS.match(path):
                return {"rows": _rows(self._neighbors(int(m.group(1))))}
            if path == "/rels":
                # ONE unioned limited query = one Spark job for the route
                # (was a collect per rel-type, r2 verdict anti-pattern #2);
                # per-type limits before the union preserve the fair
                # per-type quota
                per_cap = MAX_ROWS // max(len(g.edges), 1)
                parts = [
                    es.df.select(
                        "edge_id", "src", "dst", F.lit(rt).alias("rel_type")
                    ).limit(per_cap)
                    for rt, es in sorted(g.edges.items())
                ]
                if not parts:
                    return {"rows": []}
                unioned = parts[0]
                for p in parts[1:]:
                    unioned = unioned.unionByName(p)
                return {"rows": [r.asDict() for r in unioned.collect()]}
            if m := _REL_ID.match(path):
                return {"rows": self._rel_rows(int(m.group(1)))}
            return None

        body = body_fn()
        if method == "POST":
            if path == "/query":
                return {"rows": _rows(json_query(g, body))}
            if path == "/cypher":
                res = execute_cypher(g, body["query"])
                if isinstance(res, PropertyGraph):
                    with self._lock:
                        self.graph = res  # DML: swap the served graph
                    return {"ok": True}
                return {"rows": _rows(res)}
            if path == "/search":
                return {"rows": _rows(substring_search(g, body["q"], body.get("labels")))}
            if path == "/nodes":
                return self._create_nodes([body])
            if path == "/batch/nodes":
                return self._create_nodes(body["nodes"])
            if path == "/rels":
                return self._create_rels([body])
            if path == "/batch/rels":
                return self._create_rels(body["rels"])
            if path == "/cache/clear":
                self._cache().clear()
                return {"ok": True}
            if path == "/cache/cleanup":
                return {"ok": True, "evicted": self._cache().cleanup()}
            return None
        if method == "PUT":
            if m := _NODE_ID.match(path):
                return self._update_node(int(m.group(1)), body.get("properties", body))
            if m := _REL_ID.match(path):
                return self._update_rel(int(m.group(1)), body.get("properties", body))
            return None
        if method == "DELETE":
            if m := _NODE_ID.match(path):
                return self._delete_node(int(m.group(1)))
            if m := _REL_ID.match(path):
                return self._delete_rel(int(m.group(1)))
            return None
        return None

    # -- node / rel helpers ------------------------------------------------

    def _cache(self):
        from rs_graphdb_spark.plans.cache import QueryCache

        if not hasattr(self, "_query_cache"):
            self._query_cache = QueryCache()
        return self._query_cache

    def _find_label(self, node_id: int) -> str:
        for lb, df in self.graph.nodes.items():
            if not df.filter(F.col("id") == node_id).isEmpty():
                return lb
        raise KeyError(f"node {node_id}")

    def _node_rows(self, node_id: int) -> list[dict]:
        lb = self._find_label(node_id)
        return _rows(self.graph.nodes[lb].filter(F.col("id") == node_id))

    def _neighbors(self, node_id: int) -> DataFrame:
        """Out- and in-neighbor ids over every rel type
        (`get_node_neighbors`, `src/server.rs`)."""
        g = self.graph
        parts = []
        for rt, es in g.edges.items():
            parts.append(
                es.df.filter(F.col("src") == node_id).select(
                    F.col("dst").alias("id"), F.lit(rt).alias("rel_type"),
                    F.lit("out").alias("direction"),
                )
            )
            parts.append(
                es.df.filter(F.col("dst") == node_id).select(
                    F.col("src").alias("id"), F.lit(rt).alias("rel_type"),
                    F.lit("in").alias("direction"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.orderBy("rel_type", "direction", "id")

    def _create_nodes(self, items: list[dict]) -> dict:
        spark = next(iter(self.graph.nodes.values())).sparkSession
        by_label: dict[str, list[dict]] = {}
        for it in items:
            label = (it.get("labels") or ["Node"])[0]
            props = dict(it.get("properties", {}))
            if "id" not in props:
                raise ValueError("node creation requires properties.id")
            by_label.setdefault(label, []).append(props)
        with self._lock:
            nodes = dict(self.graph.nodes)
            created = 0
            for label, rows in by_label.items():
                import pandas as pd

                new = spark.createDataFrame(pd.DataFrame(rows))
                new = new.select(F.col("id").cast("long"), *
                                 [c for c in new.columns if c != "id"])
                if label in nodes:
                    nodes[label] = nodes[label].unionByName(
                        new, allowMissingColumns=True
                    )
                else:
                    nodes[label] = new
                created += len(rows)
            # client-supplied node ids are not validated unique →
            # edge_integrity's unique-id premise no longer holds
            # (r10 ADVICE #1); the flag only gates the hop-join elision
            self.graph = dc_replace(self.graph, nodes=nodes,
                                    edge_integrity=False)
        return {"ok": True, "created": created}

    def _create_rels(self, items: list[dict]) -> dict:
        spark = next(iter(self.graph.nodes.values())).sparkSession
        by_type: dict[str, list[tuple]] = {}
        for it in items:
            by_type.setdefault(it["rel_type"], []).append(
                (int(it["edge_id"]), int(it["src"]), int(it["dst"]))
            )
        with self._lock:
            edges = dict(self.graph.edges)
            created = 0
            for rt, rows in by_type.items():
                new = local_df(spark, rows, "edge_id long, src long, dst long")
                if rt in edges:
                    edges[rt] = dc_replace(
                        edges[rt],
                        df=edges[rt].df.unionByName(new, allowMissingColumns=True),
                    )
                else:
                    edges[rt] = EdgeSet(df=new, src_label="Node", dst_label="Node")
                created += len(rows)
            # client-supplied (src, dst) endpoints are not validated to
            # exist → a dangling endpoint breaks the 1:1 premise of the
            # hop-join elision; clear the flag (r10 ADVICE #1)
            self.graph = dc_replace(self.graph, edges=edges,
                                    edge_integrity=False)
        return {"ok": True, "created": created}

    def _update_node(self, node_id: int, props: dict) -> dict:
        lb = self._find_label(node_id)
        with self._lock:
            nodes = dict(self.graph.nodes)
            df = nodes[lb]
            for k, v in props.items():
                if k == "id":
                    continue
                if k not in df.columns:
                    df = df.withColumn(k, F.lit(None).cast("string"))
                df = df.withColumn(
                    k, F.when(F.col("id") == node_id, F.lit(v)).otherwise(F.col(k))
                )
            nodes[lb] = df
            self.graph = dc_replace(self.graph, nodes=nodes)
        return {"ok": True}

    def _delete_node(self, node_id: int) -> dict:
        from rs_graphdb_spark.operators.dml import delete_nodes

        lb = self._find_label(node_id)
        with self._lock:
            self.graph = delete_nodes(self.graph, lb, F.col("id") == node_id)
        return {"ok": True}

    def _find_rel_type(self, edge_id: int) -> str:
        for rt, es in self.graph.edges.items():
            if not es.df.filter(F.col("edge_id") == edge_id).isEmpty():
                return rt
        raise KeyError(f"rel {edge_id}")

    def _rel_rows(self, edge_id: int) -> list[dict]:
        rt = self._find_rel_type(edge_id)
        rows = _rows(self.graph.edges[rt].df.filter(F.col("edge_id") == edge_id))
        return [{**r, "rel_type": rt} for r in rows]

    def _update_rel(self, edge_id: int, props: dict) -> dict:
        rt = self._find_rel_type(edge_id)
        with self._lock:
            edges = dict(self.graph.edges)
            df = edges[rt].df
            for k, v in props.items():
                if k in ("edge_id", "src", "dst"):
                    continue
                if k not in df.columns:
                    df = df.withColumn(k, F.lit(None).cast("string"))
                df = df.withColumn(
                    k,
                    F.when(F.col("edge_id") == edge_id, F.lit(v)).otherwise(F.col(k)),
                )
            edges[rt] = dc_replace(edges[rt], df=df)
            self.graph = dc_replace(self.graph, edges=edges)
        return {"ok": True}

    def _delete_rel(self, edge_id: int) -> dict:
        rt = self._find_rel_type(edge_id)
        with self._lock:
            edges = dict(self.graph.edges)
            edges[rt] = dc_replace(
                edges[rt], df=edges[rt].df.filter(F.col("edge_id") != edge_id)
            )
            self.graph = dc_replace(self.graph, edges=edges)
        return {"ok": True}

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "GraphHTTPServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
