"""Variable-length traversal semantics (reference `src/query.rs:171-354`,
`src/algorithms/shortest_path.rs`) on the NEXT_ORDER chain forest."""

from __future__ import annotations

from pyspark.sql import functions as F

from rs_graphdb_spark.graph import label_base
from rs_graphdb_spark.operators.traversal import (
    bfs_distances,
    expand,
    has_path,
    shortest_path_length,
)


def _chain(graph, spark, custkey: int) -> list[int]:
    """Orders of one customer in NEXT_ORDER chain order (by date, key)."""
    rows = (
        graph.nodes["Order"]
        .filter(F.col("o_custkey") == custkey)
        .orderBy("o_orderdate", "o_orderkey")
        .select("id")
        .collect()
    )
    return [r["id"] for r in rows]


def test_expand_exact_levels(graph, spark):
    chain = _chain(graph, spark, 7)
    assert len(chain) >= 4
    start = spark.createDataFrame([(chain[0],)], "id long")
    ids, label = expand(graph, start, "NEXT_ORDER", 1, 2, "out")
    got = sorted(r["id"] for r in ids.collect())
    assert got == sorted(chain[1:3])
    assert label == "Order"


def test_expand_min0_includes_start(graph, spark):
    chain = _chain(graph, spark, 7)
    start = spark.createDataFrame([(chain[0],)], "id long")
    ids, _ = expand(graph, start, "NEXT_ORDER", 0, 1, "out")
    assert sorted(r["id"] for r in ids.collect()) == sorted(chain[:2])


def test_expand_unbounded_reaches_whole_chain(graph, spark):
    chain = _chain(graph, spark, 7)
    start = spark.createDataFrame([(chain[0],)], "id long")
    ids, _ = expand(graph, start, "NEXT_ORDER", 1, None, "out")
    assert sorted(r["id"] for r in ids.collect()) == sorted(chain[1:])


def test_bfs_distances_and_shortest_path(graph, spark):
    chain = _chain(graph, spark, 7)
    start = spark.createDataFrame([(chain[0],)], "id long")
    dists = {
        r["id"]: r["dist"]
        for r in bfs_distances(graph, start, "NEXT_ORDER").collect()
    }
    for i, node in enumerate(chain):
        assert dists[node] == i
    assert (
        shortest_path_length(graph, chain[0], chain[-1], "NEXT_ORDER")
        == len(chain) - 1
    )


def test_has_path_directionality(graph, spark):
    chain = _chain(graph, spark, 7)
    assert has_path(graph, chain[0], chain[-1], "NEXT_ORDER")
    assert not has_path(graph, chain[-1], chain[0], "NEXT_ORDER")
    assert has_path(graph, chain[-1], chain[0], "NEXT_ORDER", direction="in")


def test_undirected_expand(graph, spark):
    chain = _chain(graph, spark, 7)
    mid = chain[1]
    start = spark.createDataFrame([(mid,)], "id long")
    ids, _ = expand(graph, start, "NEXT_ORDER", 1, 1, "both")
    assert sorted(r["id"] for r in ids.collect()) == sorted([chain[0], chain[2]])


def test_shortest_path_with_rels_picks_lex_min(spark):
    from rs_graphdb_spark.operators.traversal import shortest_path_with_rels

    # diamond with two equal-length paths 1->2->4 and 1->3->4:
    # lexicographic min on node arrays picks [1, 2, 4]
    edges = spark.createDataFrame(
        [(10, 1, 2), (11, 1, 3), (12, 2, 4), (13, 3, 4), (14, 4, 5)],
        "edge_id long, src long, dst long",
    )
    r = shortest_path_with_rels(edges, 1, 4).collect()
    assert len(r) == 1
    assert r[0].path == [1, 2, 4] and r[0].rels == [10, 12] and r[0].hops == 2
    # longer direct route never beats min-hop
    r5 = shortest_path_with_rels(edges, 1, 5).collect()[0]
    assert r5.path == [1, 2, 4, 5] and r5.hops == 3
    # unreachable -> empty
    assert shortest_path_with_rels(edges, 5, 1, max_depth=4).count() == 0
    # trivial start == end
    r0 = shortest_path_with_rels(edges, 3, 3).collect()[0]
    assert r0.path == [3] and r0.rels == [] and r0.hops == 0


def test_max_core_number(spark):
    from rs_graphdb_spark.algorithms.graph_algos import max_core_number

    # K4 (4-clique, undirected pairs): max core = 3; with a pendant
    # vertex attached the answer must not change
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    edges = spark.createDataFrame(k4 + [(3, 9), (9, 3)], "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in [0, 1, 2, 3, 9]], "id long")
    assert max_core_number(nodes, edges) == 3


def test_random_walks_deterministic_and_edge_respecting(spark):
    from rs_graphdb_spark.operators.traversal import random_walks

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )  # node 4 is a sink
    starts = spark.createDataFrame([(1,), (4,)], "id long")
    w1 = random_walks(edges, starts, walk_length=6, walks_per_node=3)
    w2 = random_walks(edges, starts, walk_length=6, walks_per_node=3)
    rows = {(r["start"], r["walk"], r["step"]): r["node"] for r in w1.collect()}
    assert rows == {(r["start"], r["walk"], r["step"]): r["node"] for r in w2.collect()}
    # every consecutive step follows a real edge
    edge_set = {(1, 2), (1, 3), (2, 3), (3, 1), (3, 4)}
    for (s, w, st), node in rows.items():
        if st == 0:
            assert node == s
        else:
            prev = rows[(s, w, st - 1)]
            assert (prev, node) in edge_set
    # walks from the sink emit only step 0; walks reaching 4 stop there
    assert all(st == 0 for (s, w, st) in rows if s == 4)
    for (s, w, st), node in rows.items():
        if node == 4:
            assert (s, w, st + 1) not in rows


def test_sample_neighbors_caps_and_determinism(spark):
    from rs_graphdb_spark.operators.traversal import sample_neighbors

    # hub node 0 with 20 out-neighbors; each neighbor points to 2 more
    edges = [(0, i) for i in range(1, 21)]
    edges += [(i, 100 + i) for i in range(1, 21)]
    edges += [(i, 200 + i) for i in range(1, 21)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "id long")
    s1 = sample_neighbors(e, seeds, [5, 2])
    s2 = sample_neighbors(e, seeds, [5, 2])
    rows1 = {(r["hop"], r["src"], r["dst"]) for r in s1.collect()}
    rows2 = {(r["hop"], r["src"], r["dst"]) for r in s2.collect()}
    assert rows1 == rows2  # deterministic
    hop1 = [r for r in rows1 if r[0] == 1]
    assert len(hop1) == 5  # hub capped at fanout, not 20
    # hop-2 edges originate only from sampled hop-1 targets, each capped at 2
    hop1_targets = {d for (_, _, d) in hop1}
    for (h, s, d) in rows1:
        if h == 2:
            assert s in hop1_targets
    from collections import Counter
    per_src = Counter(s for (h, s, _) in rows1 if h == 2)
    assert all(c <= 2 for c in per_src.values())
    # every sampled edge is a real edge
    assert all((s, d) in set(edges) for (_, s, d) in rows1)


def test_node2vec_walks_match_python_replica(spark):
    """Exact replay: a driver-side Python replica of the md5-seeded
    weighted choice must reproduce every Spark walk step; and extreme p/q
    must steer behavior (tiny p forces backtracking on a 2-cycle)."""
    import hashlib

    from rs_graphdb_spark.operators.traversal import node2vec_walks

    edge_list = [(1, 2), (2, 1), (2, 3), (3, 1), (3, 4), (4, 2)]
    e = spark.createDataFrame(edge_list, "src long, dst long")
    starts = spark.createDataFrame([(1,), (3,)], "id long")

    def md5_long(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def replica(p, q, walk_length, seed="n2v"):
        M = 1 << 31
        adj = {}
        und = set()
        for a, b in edge_list:
            adj.setdefault(a, []).append(b)
            und.add((a, b)); und.add((b, a))
        rows = {}
        for start in (1, 3):
            prev, node = None, start
            rows[(start, 0, 0)] = node
            for step in range(1, walk_length + 1):
                nbrs = sorted(adj.get(node, []))
                if not nbrs:
                    break
                ws = []
                for d in nbrs:
                    if prev is not None and d == prev:
                        ws.append(1.0 / p)
                    elif prev is not None and (d, prev) in und:
                        ws.append(1.0)
                    else:
                        ws.append(1.0 / q)
                tot = sum(ws)
                u = (md5_long(f"{seed}_{start}_0_{step}_{node}") % M) / M
                cum = 0.0
                for d, w in zip(nbrs, ws):
                    cum += w
                    if cum > u * tot:
                        choice = d
                        break
                prev, node = node, choice
                rows[(start, 0, step)] = node
        return rows

    for p, q in [(1.0, 1.0), (0.001, 1.0), (1.0, 0.01), (4.0, 0.25)]:
        got = {
            (r["start"], r["walk"], r["step"]): r["node"]
            for r in node2vec_walks(e, starts, walk_length=8, p=p, q=q).collect()
        }
        assert got == replica(p, q, 8), f"p={p} q={q}"
