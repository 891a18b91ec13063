"""DataFrame-Pregel: the shared driver-loop harness for iterative graph
algorithms (SURVEY.md §7 phase 4).

Reference algorithms are single-process HashMap loops (e.g. PageRank
`/root/reference/src/algorithms/pagerank.rs:9-65`); the distributed
re-expression is bulk-synchronous message passing over DataFrames:

    messages  = vertices ⋈ edges → groupBy(dst).agg(agg_msg)
    vertices' = vertices ⟕ messages → update expression

Each superstep is one shuffle (the groupBy); vertex state is checkpointed
every ``CHECKPOINT_EVERY`` supersteps to truncate lineage — the standard
driver pattern Catalyst cannot express in a single plan (SURVEY.md §4.3.1).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CHECKPOINT_EVERY = 5


def pregel(
    vertices: DataFrame,
    edges: DataFrame,
    msg_expr: Column,
    agg_msg: Callable[[Column], Column],
    update: Callable[[DataFrame, DataFrame], DataFrame],
    max_iter: int,
    until_converged: Callable[[DataFrame, DataFrame], bool] | None = None,
) -> DataFrame:
    """Generic BSP loop.

    vertices: (id, <state cols>); edges: (src, dst).
    msg_expr: built from src-state columns (+ ``src``/``dst``), evaluated on
    vertices⋈edges; agg_msg: aggregator over ``msg`` per dst; update:
    (vertices, messages(id, agg)) → new vertices.
    """
    edges = edges.localCheckpoint(eager=True)
    vertices = vertices.localCheckpoint(eager=True)
    for i in range(max_iter):
        msgs = (
            vertices.join(edges, vertices["id"] == edges["src"])
            .select(F.col("dst").alias("id"), msg_expr.alias("msg"))
            .groupBy("id")
            .agg(agg_msg(F.col("msg")).alias("agg"))
        )
        new_vertices = update(vertices, msgs)
        if (i + 1) % CHECKPOINT_EVERY == 0 or until_converged is not None:
            new_vertices = new_vertices.localCheckpoint(eager=True)
        if until_converged is not None and until_converged(vertices, new_vertices):
            return new_vertices
        vertices = new_vertices
    return vertices
