"""The reference's comprehensive algorithm scenarios, ported 1:1.

Source: `/root/reference/tests/algorithms_comprehensive_test.rs` (632
lines — exact expectations on hand-built graphs: triangles, clustering
coefficients, PageRank mass conservation and dangling nodes, community
detection, centrality, and the complete/cycle/empty graph trilogy).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rs_graphdb_spark.algorithms.graph_algos import (
    clustering_coefficient,
    connected_components,
    degree_centrality,
    label_propagation,
    pagerank,
    per_node_triangles,
    triangle_count,
)
from rs_graphdb_spark.session import local_df


def _g(spark, n_nodes, edges):
    nodes = local_df(spark, [(i,) for i in range(n_nodes)], "id long")
    e = local_df(spark, [(s, d) for s, d in edges], "src long, dst long")
    return nodes, e


def test_count_triangles_simple(spark):
    nodes, e = _g(spark, 3, [(0, 1), (1, 2), (2, 0)])
    assert triangle_count(e).first()["n_triangles"] == 1


def test_count_triangles_multiple(spark):
    # two triangles sharing edge 1-2
    nodes, e = _g(spark, 4, [(0, 1), (1, 2), (2, 0), (1, 3), (3, 2)])
    assert triangle_count(e).first()["n_triangles"] == 2


def test_count_triangles_no_triangles(spark):
    nodes, e = _g(spark, 4, [(0, 1), (1, 2), (2, 3)])  # path graph
    assert triangle_count(e).first()["n_triangles"] == 0


def test_count_triangles_for_node(spark):
    nodes, e = _g(spark, 4, [(0, 1), (1, 2), (2, 0), (1, 3), (3, 2)])
    per = {r["id"]: r["n_triangles"] for r in per_node_triangles(e).collect()}
    assert per[1] == 2 and per[2] == 2  # shared edge endpoints
    assert per[0] == 1 and per[3] == 1


def test_local_clustering_coefficient(spark):
    # triangle + pendant: nodes 0,1,2 triangle; 3 hangs off 0
    nodes, e = _g(spark, 4, [(0, 1), (1, 2), (2, 0), (0, 3)])
    cc = {r["id"]: r["coefficient"] for r in
          clustering_coefficient(nodes, e).collect()}
    assert abs(cc[1] - 1.0) < 1e-9 and abs(cc[2] - 1.0) < 1e-9
    assert abs(cc[0] - (2 * 1) / (3 * 2)) < 1e-9  # deg 3, one triangle
    assert cc[3] == 0.0  # degree 1


def test_pagerank_mass_conservation_star(spark):
    # star: center 0 → leaves 1..5 (leaves are dangling)
    nodes, e = _g(spark, 6, [(0, i) for i in range(1, 6)])
    ranks = {r["id"]: r["rank"] for r in pagerank(nodes, e, 0.85, 20).collect()}
    assert set(ranks) == set(range(6))
    assert abs(sum(ranks.values()) - 1.0) < 1e-6  # normalized mass


def test_pagerank_dangling_nodes(spark):
    nodes, e = _g(spark, 3, [(0, 1)])  # 1 and 2 dangling
    ranks = {r["id"]: r["rank"] for r in pagerank(nodes, e, 0.85, 20).collect()}
    assert set(ranks) == {0, 1, 2}
    assert abs(sum(ranks.values()) - 1.0) < 1e-6
    assert ranks[1] > ranks[0]  # 1 receives 0's mass


def test_connected_components_disconnected(spark):
    nodes, e = _g(spark, 6, [(0, 1), (1, 2), (3, 4)])  # {0,1,2} {3,4} {5}
    comp = {r["id"]: r["component"] for r in
            connected_components(nodes, e).collect()}
    assert comp[0] == comp[1] == comp[2]
    assert comp[3] == comp[4]
    assert len({comp[0], comp[3], comp[5]}) == 3


def test_communities_two_cliques_weak_bridge(spark):
    # two triangles bridged by one edge (louvain ≙ LPA in the reference)
    nodes, e = _g(spark, 6, [(0, 1), (1, 2), (0, 2),
                             (3, 4), (4, 5), (3, 5), (2, 3)])
    comm = {r["id"]: r["community"] for r in
            label_propagation(nodes, e, iterations=10).collect()}
    # each clique must be internally coherent
    assert comm[0] == comm[1] == comm[2]
    assert comm[3] == comm[4] == comm[5]


def test_degree_centrality_hub(spark):
    nodes, e = _g(spark, 5, [(0, i) for i in range(1, 5)])
    deg = {r["id"]: r["centrality"] for r in
           degree_centrality(nodes, e).collect()}
    assert all(deg[0] > deg[i] for i in range(1, 5))
    assert abs(deg[0] - 1.0) < 1e-9  # hub touches every other node


def test_complete_graph(spark):
    n = 5
    edges = [(i, j) for i in range(n) for j in range(n) if i != j]
    nodes, e = _g(spark, n, edges)
    assert triangle_count(e).first()["n_triangles"] == 10  # C(5,3)
    cc = clustering_coefficient(nodes, e).collect()
    assert all(abs(r["coefficient"] - 1.0) < 1e-9 for r in cc)
    ranks = {r["id"]: r["rank"] for r in pagerank(nodes, e, 0.85, 50).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-6
    assert all(abs(v - 1.0 / n) < 0.01 for v in ranks.values())  # symmetric


def test_cycle_graph(spark):
    n = 5
    nodes, e = _g(spark, n, [(i, (i + 1) % n) for i in range(n)])
    assert triangle_count(e).first()["n_triangles"] == 0
    cc = clustering_coefficient(nodes, e).collect()
    assert all(r["coefficient"] == 0.0 for r in cc)
    comp = connected_components(nodes, e).collect()
    assert len({r["component"] for r in comp}) == 1


def test_empty_graph(spark):
    nodes = local_df(spark, [], "id long")
    e = local_df(spark, [], "src long, dst long")
    assert triangle_count(e).first()["n_triangles"] == 0
    assert connected_components(nodes, e).count() == 0
    with pytest.raises(Exception):  # 1/n init undefined on zero nodes
        pagerank(nodes, e, 0.85, 5).collect()
