"""Variable-length traversal as driver-side iterative DataFrame loops.

Reference: `Query::out_variable_length` (`/root/reference/src/query.rs:171-218`),
`in_variable_length` (`:228-275`), `undirected_variable_length` (`:285-354`) —
BFS expansion with a visited set, collecting nodes whose BFS depth falls in
``[min_hops, max_hops]``.

Semantics here: **BFS distance from the start SET** (min over start nodes) —
the reference shares one visited set across start nodes, so its results are
iteration-order dependent (SURVEY.md §3.4 quirk #6); set-distance is the
order-independent formalization.

Scale notes: each level is one self-join + anti-join; `localCheckpoint`
every ``CHECKPOINT_EVERY`` levels cuts lineage growth; the frontier is
deduped per level so the working set is bounded by |V|, not by path count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rs_graphdb_spark.graph import PropertyGraph

CHECKPOINT_EVERY = 5


def _edges_for(graph: PropertyGraph, rel_type: str, direction: str):
    es = graph.edges[rel_type]
    if direction == "out":
        return es.df.select("src", "dst"), es.dst_label
    if direction == "in":
        r = es.reversed()
        return r.df.select("src", "dst"), r.dst_label
    if direction == "both":
        if es.src_label != es.dst_label:
            raise ValueError("undirected traversal needs a homogeneous edge set")
        fwd = es.df.select("src", "dst")
        return fwd.unionByName(
            es.df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ), es.dst_label
    raise ValueError(f"direction must be out/in/both, got {direction!r}")


def expand(
    graph: PropertyGraph,
    frontier_ids: DataFrame,
    rel_type: str,
    min_hops: int,
    max_hops: int | None,
    direction: str = "out",
) -> tuple[DataFrame, str | None]:
    """Nodes at BFS distance in [min_hops, max_hops] from the start set.

    ``frontier_ids``: single-column ``id`` DataFrame. ``max_hops=None``
    means expand to fixpoint (reference `*n..` forms). Returns
    (ids DataFrame, reached label) — label is None only for min_hops == 0
    on a heterogeneous chain where start/target labels differ.
    """
    edges, dst_label = _edges_for(graph, rel_type, direction)
    es = graph.edges[rel_type]
    homogeneous = es.src_label == es.dst_label

    # Materialize the edge list once: derived edge sets (windows, joins)
    # must not be recomputed every BFS level. At cluster scale this is a
    # persist(MEMORY_AND_DISK); localCheckpoint also truncates lineage.
    edges = edges.localCheckpoint(eager=True)

    start = frontier_ids.select("id").dropDuplicates(["id"]).localCheckpoint(
        eager=True
    )
    visited = start
    current = start
    result: DataFrame | None = start if min_hops == 0 else None

    depth = 0
    while max_hops is None or depth < max_hops:
        depth += 1
        # Each level is checkpointed: it's read ≥3× (emptiness test, next
        # level's join, visited union) and lineage would otherwise grow
        # linearly with depth.
        nxt = (
            current.join(edges, current["id"] == edges["src"])
            .select(F.col("dst").alias("id"))
            .dropDuplicates(["id"])
            .join(visited, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        if depth % CHECKPOINT_EVERY == 0:
            visited = visited.localCheckpoint(eager=True)
        if depth >= min_hops:
            result = nxt if result is None else result.unionByName(nxt)
        current = nxt
        # heterogeneous single-rel chains exhaust after one hop
        if not homogeneous:
            break

    if result is None:
        result = start.limit(0)
    out_label = dst_label if (min_hops > 0 or homogeneous) else None
    return result.dropDuplicates(["id"]), out_label


def bfs_distances(
    graph: PropertyGraph,
    start_ids: DataFrame,
    rel_type: str,
    direction: str = "out",
    max_depth: int | None = None,
    stop_at: DataFrame | None = None,
) -> DataFrame:
    """BFS layering: (id, dist) for every reachable node.

    Reference `bfs_shortest_path` (`src/algorithms/shortest_path.rs:326-403`)
    generalized to all-targets; ``stop_at`` enables early exit once any
    target id is reached (has_path / point-to-point shortest path).
    """
    edges, _ = _edges_for(graph, rel_type, direction)
    edges = edges.localCheckpoint(eager=True)
    visited = start_ids.select("id").dropDuplicates(["id"]).withColumn(
        "dist", F.lit(0)
    ).localCheckpoint(eager=True)
    current = visited.select("id")
    depth = 0
    while max_depth is None or depth < max_depth:
        depth += 1
        nxt = (
            current.join(edges, current["id"] == edges["src"])
            .select(F.col("dst").alias("id"))
            .dropDuplicates(["id"])
            .join(visited.select("id"), "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt.withColumn("dist", F.lit(depth)))
        if depth % CHECKPOINT_EVERY == 0:
            visited = visited.localCheckpoint(eager=True)
        if stop_at is not None and not nxt.join(stop_at, "id").isEmpty():
            break
        current = nxt
    return visited


def has_path(
    graph: PropertyGraph,
    src_id: int,
    dst_id: int,
    rel_type: str,
    direction: str = "out",
    max_depth: int | None = 64,
) -> bool:
    """Reachability (`src/algorithms/shortest_path.rs:314-323`)."""
    spark = graph.edges[rel_type].df.sparkSession
    start = spark.createDataFrame([(src_id,)], "id long")
    target = spark.createDataFrame([(dst_id,)], "id long")
    reached = bfs_distances(graph, start, rel_type, direction, max_depth, target)
    return not reached.join(target, "id").isEmpty()


def shortest_path_length(
    graph: PropertyGraph,
    src_id: int,
    dst_id: int,
    rel_type: str,
    direction: str = "out",
    max_depth: int | None = 64,
) -> int | None:
    """Unweighted shortest-path length — the reference's Dijkstra has all
    edge weights fixed to 1 (`src/algorithms/shortest_path.rs:404-451`), so
    BFS depth IS its answer."""
    spark = graph.edges[rel_type].df.sparkSession
    start = spark.createDataFrame([(src_id,)], "id long")
    target = spark.createDataFrame([(dst_id,)], "id long")
    dists = bfs_distances(graph, start, rel_type, direction, max_depth, target)
    row = dists.join(target, "id").select("dist").first()
    return None if row is None else row["dist"]
