"""Visualization layouts — driver-side presentation math.

Reference: `Layout` trait with Circle / ForceDirected / Hierarchical
implementations (`/root/reference/src/visualization/layout.rs:13-443`).
Layouts are O(rendered-subgraph) presentation logic; they run on a
collected, size-guarded subgraph (SURVEY.md §2.14), deterministic for
testability.
"""

from __future__ import annotations

import math

MAX_LAYOUT_NODES = 5_000


def circle_layout(node_ids: list[int], radius: float = 100.0) -> dict[int, tuple[float, float]]:
    """Evenly spaced ring (`src/visualization/layout.rs:70-120`)."""
    _guard(node_ids)
    n = max(len(node_ids), 1)
    return {
        nid: (radius * math.cos(2 * math.pi * i / n),
              radius * math.sin(2 * math.pi * i / n))
        for i, nid in enumerate(sorted(node_ids))
    }


def force_layout(
    node_ids: list[int],
    edges: list[tuple[int, int]],
    iterations: int = 50,
    width: float = 200.0,
) -> dict[int, tuple[float, float]]:
    """Deterministic Fruchterman-Reingold-style force layout
    (`src/visualization/layout.rs:122-320`): seeded initial ring, spring
    attraction on edges, inverse-square repulsion, cooling schedule."""
    _guard(node_ids)
    pos = circle_layout(node_ids, radius=width / 2)
    if len(node_ids) < 2:
        return pos
    k = width / math.sqrt(len(node_ids))
    temp = width / 10
    adj = [(s, d) for s, d in edges if s in pos and d in pos]
    ids = sorted(pos)
    for _ in range(iterations):
        disp = {nid: [0.0, 0.0] for nid in ids}
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                dx = pos[a][0] - pos[b][0]
                dy = pos[a][1] - pos[b][1]
                d2 = max(dx * dx + dy * dy, 1e-6)
                f = k * k / d2
                disp[a][0] += dx * f; disp[a][1] += dy * f
                disp[b][0] -= dx * f; disp[b][1] -= dy * f
        for s, d in adj:
            dx = pos[s][0] - pos[d][0]
            dy = pos[s][1] - pos[d][1]
            dist = max(math.sqrt(dx * dx + dy * dy), 1e-6)
            f = dist / k
            disp[s][0] -= dx * f; disp[s][1] -= dy * f
            disp[d][0] += dx * f; disp[d][1] += dy * f
        for nid in ids:
            dx, dy = disp[nid]
            dist = max(math.sqrt(dx * dx + dy * dy), 1e-6)
            scale = min(dist, temp) / dist
            pos[nid] = (pos[nid][0] + dx * scale, pos[nid][1] + dy * scale)
        temp *= 0.95
    return pos


def hierarchical_layout(
    node_ids: list[int],
    edges: list[tuple[int, int]],
    layer_gap: float = 50.0,
    node_gap: float = 30.0,
) -> dict[int, tuple[float, float]]:
    """BFS-layered layout from roots (in-degree 0)
    (`src/visualization/layout.rs:322-443`)."""
    _guard(node_ids)
    targets = {d for _, d in edges}
    roots = sorted(set(node_ids) - targets) or sorted(node_ids)[:1]
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    layer = {r: 0 for r in roots}
    frontier = list(roots)
    while frontier:
        nxt = []
        for v in frontier:
            for w in sorted(adj.get(v, ())):
                if w not in layer:
                    layer[w] = layer[v] + 1
                    nxt.append(w)
        frontier = nxt
    for nid in node_ids:  # disconnected nodes go to layer 0
        layer.setdefault(nid, 0)
    by_layer: dict[int, list[int]] = {}
    for nid, ly in layer.items():
        by_layer.setdefault(ly, []).append(nid)
    pos = {}
    for ly, members in by_layer.items():
        for i, nid in enumerate(sorted(members)):
            pos[nid] = (i * node_gap - (len(members) - 1) * node_gap / 2,
                        ly * layer_gap)
    return pos


def _guard(node_ids: list[int]) -> None:
    if len(node_ids) > MAX_LAYOUT_NODES:
        raise ValueError(
            f"layout is driver-side presentation logic; got {len(node_ids)} "
            f"nodes > {MAX_LAYOUT_NODES} — filter the subgraph first"
        )
