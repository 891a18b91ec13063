"""The reference's SCC and all-shortest-paths scenarios, ported 1:1.

Sources: `/root/reference/tests/algorithms_advanced_test.rs` (SCC over
cycles/DAGs/mixed graphs, SCC group shapes) and
`/root/reference/tests/all_shortest_paths_test.rs` (path counting over
diamonds, direct-vs-indirect, unreachable targets).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rs_graphdb_spark.algorithms.graph_algos import strongly_connected_components
from rs_graphdb_spark.graph import EdgeSet, PropertyGraph
from rs_graphdb_spark.operators.traversal import shortest_path_counts
from rs_graphdb_spark.session import local_df


def _nodes_edges(spark, n, edges):
    nodes = local_df(spark, [(i,) for i in range(n)], "id long")
    e = local_df(spark, edges, "src long, dst long")
    return nodes, e


def _pgraph(spark, n, edges):
    return PropertyGraph(
        nodes={"User": local_df(spark, [(i,) for i in range(n)], "id long")},
        edges={"EDGE": EdgeSet(
            df=local_df(spark, [(i + 1, s, d) for i, (s, d) in enumerate(edges)],
                        "edge_id long, src long, dst long"),
            src_label="User", dst_label="User")},
    )


# ==================== SCC (algorithms_advanced_test.rs) ====================

def test_scc_simple_cycle(spark):
    nodes, e = _nodes_edges(spark, 3, [(0, 1), (1, 2), (2, 0)])
    scc = {r["id"]: r["scc"] for r in
           strongly_connected_components(nodes, e).collect()}
    assert scc[0] == scc[1] == scc[2]
    assert len(set(scc.values())) == 1


def test_scc_dag(spark):
    # DAG A→B→C, A→D→C: every node its own SCC
    nodes, e = _nodes_edges(spark, 4, [(0, 1), (1, 2), (0, 3), (3, 2)])
    scc = {r["id"]: r["scc"] for r in
           strongly_connected_components(nodes, e).collect()}
    assert len(set(scc.values())) == 4


def test_scc_multiple_components(spark):
    # cycle {0,1,2} + cycle {3,4} + isolated 5
    nodes, e = _nodes_edges(
        spark, 6, [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3)])
    scc = {r["id"]: r["scc"] for r in
           strongly_connected_components(nodes, e).collect()}
    assert scc[0] == scc[1] == scc[2]
    assert scc[3] == scc[4]
    assert len({scc[0], scc[3], scc[5]}) == 3


def test_is_strongly_connected(spark):
    nodes, e = _nodes_edges(spark, 3, [(0, 1), (1, 2), (2, 0)])
    n_scc = (strongly_connected_components(nodes, e)
             .select("scc").distinct().count())
    assert n_scc == 1  # the reference's is_strongly_connected predicate


def test_scc_groups(spark):
    # cycle {0,1,2} + isolated 3 → group sizes {3, 1}
    nodes, e = _nodes_edges(spark, 4, [(0, 1), (1, 2), (2, 0)])
    sizes = sorted(
        r["n"] for r in strongly_connected_components(nodes, e)
        .groupBy("scc").agg(F.count("*").alias("n")).collect()
    )
    assert sizes == [1, 3]


# ============ all shortest paths (all_shortest_paths_test.rs) ==============

def _counts(spark, n, edges, start):
    g = _pgraph(spark, n, edges)
    return {r["id"]: (r["dist"], r["n_paths"]) for r in
            shortest_path_counts(g, start, "EDGE").collect()}


def test_all_shortest_paths_simple(spark):
    got = _counts(spark, 3, [(0, 1), (1, 2)], 0)
    assert got[2] == (2, 1)


def test_all_shortest_paths_diamond(spark):
    # A→{B,C}→D: exactly 2 shortest paths of length 2
    got = _counts(spark, 4, [(0, 1), (0, 2), (1, 3), (2, 3)], 0)
    assert got[3] == (2, 2)


def test_all_shortest_paths_direct_and_indirect(spark):
    # direct edge wins over the 2-hop detour
    got = _counts(spark, 3, [(0, 2), (0, 1), (1, 2)], 0)
    assert got[2] == (1, 1)


def test_all_shortest_paths_same_node(spark):
    got = _counts(spark, 2, [(0, 1)], 0)
    assert got[0] == (0, 1)  # the empty path


def test_all_shortest_paths_no_path(spark):
    got = _counts(spark, 3, [(1, 2)], 0)
    assert 2 not in got and 1 not in got  # unreachable from 0


def test_all_shortest_paths_multiple_intermediate(spark):
    # A→{B,C,D}→E: 3 shortest paths
    got = _counts(spark, 5, [(0, 1), (0, 2), (0, 3),
                             (1, 4), (2, 4), (3, 4)], 0)
    assert got[4] == (2, 3)


def test_all_shortest_paths_with_longer_path(spark):
    # diamond plus a 3-hop detour: the detour must not count
    got = _counts(spark, 6, [(0, 1), (0, 2), (1, 3), (2, 3),
                             (0, 4), (4, 5), (5, 3)], 0)
    assert got[3] == (2, 2)
