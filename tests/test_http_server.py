"""HTTP serving layer: in-process round-trips against the reference's
route contract (`tests/server_api_test.rs` analog)."""

import json
import urllib.error
import urllib.request

import pytest

from rs_graphdb_spark.loaders import load_tpch_graph
from rs_graphdb_spark.sources.http_server import GraphHTTPServer

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def server(spark):
    g = load_tpch_graph(spark, SF)
    s = GraphHTTPServer(g).start()
    yield s
    s.stop()


def _post(server, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        return resp.status, json.loads(resp.read())


def test_query_route(server):
    status, out = _post(server, "/query", {
        "label": "Nation", "property": "n_nationkey", "value": 3,
    })
    assert status == 200
    assert len(out["rows"]) == 1 and out["rows"][0]["n_nationkey"] == 3


def test_cypher_route_read(server):
    status, out = _post(server, "/cypher", {
        "query": "MATCH (n:Nation) WHERE n.n_regionkey = 1 "
                 "RETURN n.n_name AS name ORDER BY name",
    })
    assert status == 200 and len(out["rows"]) > 0
    names = [r["name"] for r in out["rows"]]
    assert names == sorted(names)


def test_cypher_route_dml_mutates_served_graph(server):
    status, out = _post(server, "/cypher", {
        "query": "CREATE (n:Nation {n_name: 'SERVERLAND', n_regionkey: 0})",
    })
    assert status == 200 and out == {"ok": True}
    _, out2 = _post(server, "/query", {
        "label": "Nation", "property": "n_name", "value": "SERVERLAND",
    })
    assert len(out2["rows"]) == 1


def test_search_route(server):
    status, out = _post(server, "/search", {
        "q": "machinery", "labels": ["Customer"],
    })
    assert status == 200 and len(out["rows"]) > 0
    assert all(r["label"] == "Customer" for r in out["rows"])


def test_bad_request_is_400_not_crash(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/query", {"property": "x"})  # missing label
    assert e.value.code == 400
    # server still alive
    status, _ = _post(server, "/query", {"label": "Region"})
    assert status == 200


def test_unknown_route_404(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/nope", {})
    assert e.value.code == 404


def _call(server, method, path, body=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}",
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"},
        method=method,
    )
    with urllib.request.urlopen(req) as resp:
        return resp.status, json.loads(resp.read())


def test_rest_metadata_routes(server):
    st, root = _call(server, "GET", "/")
    assert st == 200 and root["status"] == "ok"
    st, labels = _call(server, "GET", "/labels")
    assert "Customer" in labels["labels"]
    st, rts = _call(server, "GET", "/rel-types")
    assert "PLACED" in rts["rel_types"]
    st, stats = _call(server, "GET", "/stats")
    assert stats["nodes"]["Region"] == 5 and stats["rels"]["IN_REGION"] == 25


def test_rest_node_crud_roundtrip(server):
    # create
    st, out = _call(server, "POST", "/nodes", {
        "labels": ["Widget"], "properties": {"id": 900001, "name": "w1"},
    })
    assert st == 200 and out["created"] == 1
    st, got = _call(server, "GET", "/nodes/900001")
    assert got["rows"][0]["name"] == "w1"
    # update merges props
    st, _ = _call(server, "PUT", "/nodes/900001", {"properties": {"name": "w2"}})
    st, got = _call(server, "GET", "/nodes/900001")
    assert got["rows"][0]["name"] == "w2"
    # delete
    st, _ = _call(server, "DELETE", "/nodes/900001")
    try:
        _call(server, "GET", "/nodes/900001")
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_rest_rel_crud_and_neighbors(server):
    st, out = _call(server, "POST", "/batch/nodes", {"nodes": [
        {"labels": ["Widget"], "properties": {"id": 900010, "name": "a"}},
        {"labels": ["Widget"], "properties": {"id": 900011, "name": "b"}},
    ]})
    assert out["created"] == 2
    st, out = _call(server, "POST", "/rels", {
        "rel_type": "LINKS", "edge_id": 990001, "src": 900010, "dst": 900011,
    })
    assert out["created"] == 1
    st, got = _call(server, "GET", "/rels/990001")
    assert got["rows"][0]["dst"] == 900011 and got["rows"][0]["rel_type"] == "LINKS"
    st, nb = _call(server, "GET", "/nodes/900010/neighbors")
    assert {"id": 900011, "rel_type": "LINKS", "direction": "out"} in nb["rows"]
    st, _ = _call(server, "DELETE", "/rels/990001")
    try:
        _call(server, "GET", "/rels/990001")
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_rest_cache_routes(server):
    st, out = _call(server, "GET", "/cache/stats")
    assert st == 200 and "stats" in out
    st, out = _call(server, "POST", "/cache/clear", {})
    assert out["ok"] is True


def _post_pb(server, path, blob):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}",
        data=blob,
        headers={"Content-Type": "application/x-protobuf"},
    )
    with urllib.request.urlopen(req) as resp:
        return resp.status, resp.read()


def test_protowire_roundtrips():
    """Codec self-consistency for every graphdb.proto message shape,
    including negative ints, bools, doubles, and multi-entry maps."""
    from rs_graphdb_spark.sources import protowire as pw

    props = {"name": "Alice", "age": 30, "score": -2.5, "neg": -7, "ok": True}
    assert pw.decode_node(pw.encode_node(5, ["Person", "User"], props)) == {
        "id": 5, "labels": ["Person", "User"], "properties": props
    }
    rel = pw.decode_relationship(
        pw.encode_relationship(9, 1, 2, "KNOWS", {"since": 2024}))
    assert rel == {"id": 9, "start": 1, "end": 2, "rel_type": "KNOWS",
                   "properties": {"since": 2024}}
    assert pw.decode_create_node_request(
        pw.encode_create_node_request(["N"], props)
    ) == {"labels": ["N"], "properties": props}
    assert pw.decode_create_rel_request(
        pw.encode_create_rel_request(3, 4, "LINK", {})
    ) == {"start": 3, "end": 4, "rel_type": "LINK", "properties": {}}
    assert pw.decode_cypher_request(pw.encode_cypher_request("MATCH (n)")) == "MATCH (n)"
    rows = [{"a": 1, "b": "x"}, {"a": -2, "b": "y"}]
    assert pw.decode_cypher_response(pw.encode_cypher_response(rows)) == rows


def test_grpc_execute_cypher_route(server):
    """protobuf-over-HTTP ExecuteCypher: same rows as the JSON route."""
    from rs_graphdb_spark.sources import protowire as pw

    q = ("MATCH (n:Nation) WHERE n.n_regionkey = 1 "
         "RETURN n.n_name AS name ORDER BY name")
    status, blob = _post_pb(server, "/grpc/ExecuteCypher",
                            pw.encode_cypher_request(q))
    assert status == 200
    rows = pw.decode_cypher_response(blob)
    _, js = _post(server, "/cypher", {"query": q})
    assert [r["name"] for r in rows] == [r["name"] for r in js["rows"]]


def test_grpc_create_node_and_relationship(server):
    """CreateNode / CreateRelationship RPCs mutate the served graph and
    echo the created entities (graphdb.proto:59-64 semantics)."""
    from rs_graphdb_spark.sources import protowire as pw

    status, blob = _post_pb(
        server, "/grpc/CreateNode",
        pw.encode_create_node_request(
            ["Nation"], {"n_name": "PROTOLAND", "n_regionkey": 2}),
    )
    assert status == 200
    node = pw.decode_node(blob)
    assert node["labels"] == ["Nation"]
    assert node["properties"]["n_name"] == "PROTOLAND"
    nid = node["id"]
    _, out = _post(server, "/query", {
        "label": "Nation", "property": "n_name", "value": "PROTOLAND"})
    assert len(out["rows"]) == 1

    status, blob = _post_pb(
        server, "/grpc/CreateRelationship",
        pw.encode_create_rel_request(nid, nid, "SELF", {}),
    )
    assert status == 200
    rel = pw.decode_relationship(blob)
    assert rel["start"] == nid and rel["end"] == nid and rel["rel_type"] == "SELF"


def _get(server, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{server.port}{path}") as r:
        ct = r.headers.get("Content-Type", "")
        raw = r.read()
        return r.status, ct, raw


def test_sysinfo_queries_dbs_routes(server):
    """Reference routes /sysinfo /queries /dbs (server.rs:99-101)."""
    status, _, raw = _get(server, "/sysinfo")
    info = json.loads(raw)
    assert status == 200
    assert info["kernel_version"].startswith("spark-")
    assert info["node_id_count"] > 0 and info["store_size"] >= info["node_id_count"]
    assert "h" in info["uptime"] or "m" in info["uptime"]
    assert info["databases"][0]["name"] == "default"

    status, _, raw = _get(server, "/queries")
    assert status == 200 and isinstance(json.loads(raw)["queries"], list)

    status, _, raw = _get(server, "/dbs")
    dbs = json.loads(raw)["databases"]
    assert status == 200 and dbs[0]["name"] == "default" and dbs[0]["node_count"] > 0


def test_ui_route_serves_html(server):
    status, ct, raw = _get(server, "/ui")
    assert status == 200 and "text/html" in ct and b"<html>" in raw
    # the UI is a real console over the reference-parity data routes:
    # it must reference each endpoint it consumes
    for route in (b"/stats", b"/cypher", b"/nodes", b"/rels"):
        assert route in raw
    # and carry the console + graph view + details panels
    for marker in (b"Cypher console", b"Graph view", b"Node details"):
        assert marker in raw


def test_ui_behavior_parity_surface(server):
    """r7: the single-file UI carries the Vue app's behavioral surface
    (web-ui/src/stores + components), not just the console: history and
    favorites stores on the SAME localStorage keys, the :commands over
    /sysinfo //queries //dbs, force layout + expand-neighbors, and
    JSON+CSV export."""
    _status, _ct, raw = _get(server, "/ui")
    # stores (queryHistory.ts / favorites.ts key + cap parity)
    for marker in (b"graphdb_query_history", b"graphdb_favorites",
                   b"MAX_HISTORY = 100", b"Query history", b"Favorites"):
        assert marker in raw
    # commands store (commands.ts) over the parity routes
    for marker in (b":sysinfo", b":queries", b":dbs", b"/sysinfo"):
        assert marker in raw
    # GraphView behaviors: force iteration, physics toggle, dblclick
    # expand, drag-to-pin, per-label colors, arrowheads
    for marker in (b"forceTick", b"physics", b"expandNeighbors",
                   b"labelColor", b"marker-end"):
        assert marker in raw
    # ExportDialog parity: both formats
    for marker in (b"exportRows('json')", b"exportRows('csv')"):
        assert marker in raw


def test_cache_cleanup_route(server):
    status, out = _post(server, "/cache/cleanup", {})
    assert status == 200 and out["ok"] is True and out["evicted"] >= 0


def test_invalid_json_body_is_client_error(server):
    """Malformed JSON must 4xx, never crash the server (reference
    test_invalid_json, server_api_test.rs:553-573)."""
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/nodes",
        data=b"{invalid json}",
        headers={"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(req)
        raise AssertionError("expected a client error")
    except urllib.error.HTTPError as e:
        assert 400 <= e.code < 500
    # the server survives and still answers
    status, _, _ = _get(server, "/labels")
    assert status == 200


def test_get_nonexistent_node_and_rel(server):
    """Unknown ids 404 cleanly, never crash (reference
    test_get_nonexistent_node/rel, server_api_test.rs:515-551)."""
    for path in ("/nodes/999999999999", "/rels/999999999999"):
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}{path}")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    status, _, _ = _get(server, "/labels")  # server survives
    assert status == 200
