"""Serve the TPC-H-derived property graph over HTTP and exercise the
REST surface in-process (the analog of the reference's
`examples/demo_server.rs` + `tests/server_api_test.rs` curl flows).

Run: python examples/demo_server.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import urllib.request

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from rs_graphdb_spark.loaders import load_tpch_graph
from rs_graphdb_spark.session import get_spark
from rs_graphdb_spark.sources.http_server import GraphHTTPServer


def call(port: int, method: str, path: str, body: dict | None = None) -> dict:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"},
        method=method,
    )
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("demo-server")
    server = GraphHTTPServer(load_tpch_graph(spark, sf_dir)).start()
    print(f"serving on http://127.0.0.1:{server.port}")
    try:
        print("labels:", call(server.port, "GET", "/labels")["labels"])
        print("stats:", call(server.port, "GET", "/stats"))
        rows = call(server.port, "POST", "/query", {
            "label": "Customer", "property": "c_mktsegment",
            "value": "MACHINERY", "out_rel": "PLACED", "limit": 3,
        })["rows"]
        print("query /query ->", len(rows), "rows")
        rows = call(server.port, "POST", "/cypher", {
            "query": "MATCH (c:Customer) WHERE c.c_acctbal > 9000 "
                     "RETURN c.c_name AS name LIMIT 3",
        })["rows"]
        print("query /cypher ->", rows)
        call(server.port, "POST", "/nodes", {
            "labels": ["Demo"], "properties": {"id": 1, "name": "demo"}})
        print("created node:", call(server.port, "GET", "/nodes/1")["rows"])
        print("sysinfo:", call(server.port, "GET", "/sysinfo")["uptime"],
              call(server.port, "GET", "/dbs")["databases"][0]["name"])
        # the reference's gRPC surface as protobuf-over-HTTP
        import urllib.request

        from rs_graphdb_spark.sources import protowire as pw

        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/grpc/ExecuteCypher",
            data=pw.encode_cypher_request(
                "MATCH (n:Nation) RETURN n.n_name AS name LIMIT 2"),
            headers={"Content-Type": "application/x-protobuf"},
        )
        with urllib.request.urlopen(req) as resp:
            print("grpc ExecuteCypher ->",
                  pw.decode_cypher_response(resp.read()))
    finally:
        server.stop()
        spark.stop()


if __name__ == "__main__":
    main()
