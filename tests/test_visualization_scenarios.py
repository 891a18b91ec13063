"""The reference's visualization scenarios, ported 1:1.

Source: `/root/reference/tests/visualization_test.rs` (GraphView
assembly, subgraph views, circle/force/hierarchical layout positional
invariants, JSON export shape).
"""

from __future__ import annotations

import math

from rs_graphdb_spark.functions.layout import (
    circle_layout,
    force_layout,
    hierarchical_layout,
)
from rs_graphdb_spark.graph import EdgeSet, PropertyGraph
from rs_graphdb_spark.session import local_df
from rs_graphdb_spark.sources.export import graph_view


def _social(spark, n=3, chain=True) -> PropertyGraph:
    people = [(i + 1, f"P{i}", 25 + i) for i in range(n)]
    rels = [(i + 1, i + 1, i + 2) for i in range(n - 1)] if chain else []
    return PropertyGraph(
        nodes={"Person": local_df(
            spark, people, "id long, name string, age long")},
        edges={"KNOWS": EdgeSet(
            df=local_df(spark, rels, "edge_id long, src long, dst long"),
            src_label="Person", dst_label="Person")},
    )


def test_graph_view_creation(spark):
    view = graph_view(_social(spark, 3))
    assert len(view["nodes"]) == 3 and len(view["edges"]) == 2
    assert all(n["labels"] == ["Person"] for n in view["nodes"])
    names = {n["props"]["name"] for n in view["nodes"]}
    assert names == {"P0", "P1", "P2"}
    assert all(e["rel_type"] == "KNOWS" for e in view["edges"])


def test_subgraph_view(spark):
    g = _social(spark, 4)  # chain 1→2→3→4
    view = graph_view(g, node_ids=[1, 2, 3])
    assert len(view["nodes"]) == 3
    assert len(view["edges"]) == 2  # 1→2, 2→3; the 3→4 edge is cut


def test_circle_layout_positions(spark):
    pos = circle_layout(list(range(5)), radius=100.0)
    assert set(pos) == set(range(5))
    # all on the circle, evenly spaced
    for x, y in pos.values():
        assert abs(math.hypot(x, y) - 100.0) < 1e-9
    xs = sorted(pos.values())
    assert len(set(xs)) == 5


def test_force_directed_layout_separates_nodes(spark):
    edges = [(0, 1), (1, 2), (2, 0), (3, 4)]
    pos = force_layout(list(range(5)), edges, iterations=30)
    assert set(pos) == set(range(5))
    # repulsion keeps every pair apart
    ids = sorted(pos)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = math.hypot(pos[a][0] - pos[b][0], pos[a][1] - pos[b][1])
            assert d > 1.0, (a, b, d)


def test_hierarchical_layout_top_to_bottom(spark):
    pos = hierarchical_layout([0, 1, 2], [(0, 1), (1, 2)])
    # chain: y strictly increases layer by layer
    assert pos[1][1] > pos[0][1]
    assert pos[2][1] > pos[1][1]


def test_hierarchical_layout_branching(spark):
    # root 0 → {1, 2}: children share a layer, spread on x
    pos = hierarchical_layout([0, 1, 2], [(0, 1), (0, 2)])
    assert pos[1][1] == pos[2][1] > pos[0][1]
    assert pos[1][0] != pos[2][0]
