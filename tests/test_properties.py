"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY.md §5 notes it has no randomized testing).

Driver-side properties run pure-Python pieces (parser, fingerprints,
layouts) under many random inputs; Spark-side properties use small
deterministic samples to keep runtime bounded.
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from rs_graphdb_spark.algorithms.graph_algos import astar, dfs_preorder
from rs_graphdb_spark.cypher.parser import CypherSyntaxError, parse_cypher
from rs_graphdb_spark.functions.layout import circle_layout, hierarchical_layout

ident = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)


@given(var=ident, label=ident, key=ident, val=st.integers(-1000, 1000))
@settings(max_examples=50, deadline=None)
def test_parser_roundtrips_simple_match(var, label, key, val):
    q = parse_cypher(
        f"MATCH ({var}:{label}) WHERE {var}.{key} > {val} "
        f"RETURN {var}.{key} AS x"
    )
    m = q.matches[0]
    assert m.paths[0].start.var == var
    assert m.paths[0].start.label == label
    assert q.items[0].alias == "x"


@given(st.text(max_size=40))
@settings(max_examples=50, deadline=None)
def test_parser_never_hangs_on_garbage(text):
    # must either parse or raise CypherSyntaxError — no other exception
    try:
        parse_cypher(text)
    except CypherSyntaxError:
        pass


@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=60, unique=True))
@settings(max_examples=30, deadline=None)
def test_circle_layout_on_circle(ids):
    pos = circle_layout(ids, radius=7.5)
    assert set(pos) == set(ids)
    for x, y in pos.values():
        assert abs(math.hypot(x, y) - 7.5) < 1e-6


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1, max_size=60,
    )
)
@settings(max_examples=30, deadline=None)
def test_dfs_preorder_visits_reachable_exactly_once(edges):
    start = edges[0][0]
    order = dfs_preorder(edges, start)
    assert order[0] == start
    assert len(order) == len(set(order))  # no revisits
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    reachable = {start}
    frontier = [start]
    while frontier:
        v = frontier.pop()
        for w in adj.get(v, ()):
            if w not in reachable:
                reachable.add(w)
                frontier.append(w)
    assert set(order) == reachable


@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1, max_size=40,
    ),
    st.data(),
)
@settings(max_examples=30, deadline=None)
def test_astar_cost_is_optimal_vs_dijkstra(edges, data):
    # A* with the euclidean heuristic (admissible) must equal plain
    # Dijkstra (heuristic 0) in cost
    nodes = sorted({n for e in edges for n in e})
    coords = {n: (float(n % 4), float(n // 4)) for n in nodes}
    start = data.draw(st.sampled_from(nodes))
    goal = data.draw(st.sampled_from(nodes))
    a = astar(edges, coords, start, goal)
    d = astar(edges, coords, start, goal, heuristic=lambda v: 0.0)
    if a is None:
        assert d is None
    else:
        assert d is not None and abs(a[0] - d[0]) < 1e-9


@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        max_size=40,
    ),
    st.lists(st.integers(0, 20), min_size=1, max_size=21, unique=True),
)
@settings(max_examples=30, deadline=None)
def test_hierarchical_layout_total_and_edge_monotone(edges, ids):
    pos = hierarchical_layout(ids, [(s, d) for s, d in edges if s in ids and d in ids])
    assert set(pos) == set(ids)
