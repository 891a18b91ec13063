"""Graph algorithms as iterative DataFrame programs (SURVEY.md §2.12).

Each mirrors a reference algorithm's *semantics*; the execution is
DataFrame-Pregel / canonical-edge joins, never adjacency HashMaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rs_graphdb_spark.algorithms.pregel import CHECKPOINT_EVERY


def _undirected(edges: DataFrame) -> DataFrame:
    """Symmetrize an edge list: both directions, self-loops dropped,
    deduped — the reference's undirected neighbor-set view
    (`src/algorithms/triangle.rs:46-108`)."""
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (
        fwd.unionByName(rev)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 20,
) -> DataFrame:
    """PageRank (`/root/reference/src/algorithms/pagerank.rs:9-65`):
    uniform 1/n init, pull along in-edges, rank = (1−d)/n + d·Σ rank/out_deg,
    fixed iteration count, final sum-normalization. Returns (id, rank).

    One shuffle per superstep (the groupBy(dst)); out-degrees precomputed
    once and joined broadcast-style when small.
    """
    n = nodes.count()
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    # state: (id, rank, out_deg) — carrying out_deg avoids a per-iter join
    state = (
        nodes.select("id")
        .join(out_deg, nodes["id"] == out_deg["src"], "left")
        .select("id", F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
        .withColumn("rank", F.lit(1.0 / n))
        .localCheckpoint(eager=True)
    )
    base = (1.0 - damping) / n
    for i in range(iterations):
        msgs = (
            state.join(edges, state["id"] == edges["src"])
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("out_deg")).alias("msg"),
            )
            .groupBy("id")
            .agg(F.sum("msg").alias("in_sum"))
        )
        state = (
            state.drop("rank")
            .join(msgs, "id", "left")
            .withColumn(
                "rank", F.lit(base) + F.lit(damping) * F.coalesce("in_sum", F.lit(0.0))
            )
            .drop("in_sum")
        )
        if (i + 1) % CHECKPOINT_EVERY == 0 or i == iterations - 1:
            state = state.localCheckpoint(eager=True)
    total = state.agg(F.sum("rank")).first()[0]
    return state.select("id", (F.col("rank") / F.lit(total)).alias("rank"))


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 50
) -> DataFrame:
    """Undirected connected components (`src/algorithms/community.rs:6-52`)
    via min-label propagation to fixpoint. Returns (id, component) with
    component = min node id in the component.

    Convergence test: Σ component is strictly decreasing while labels
    change — one cheap agg instead of a change-count join.
    """
    und = _undirected(edges).localCheckpoint(eager=True)
    comp = nodes.select("id").withColumn("component", F.col("id")).localCheckpoint(
        eager=True
    )
    prev_sum = comp.agg(F.sum("component")).first()[0]
    for i in range(max_iter):
        msgs = (
            comp.join(und, comp["id"] == und["src"])
            .select(F.col("dst").alias("id"), F.col("component").alias("msg"))
            .groupBy("id")
            .agg(F.min("msg").alias("nbr_min"))
        )
        comp = (
            comp.join(msgs, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = comp.agg(F.sum("component")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return comp


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count (`src/algorithms/triangle.rs:46-108`):
    canonical-edge (a<b) self-join — each triangle counted exactly once
    via a<b<c ordering. Returns a 1-row DataFrame (n_triangles)."""
    canon = (
        _undirected(edges)
        .filter(F.col("src") < F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e1 = canon.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = canon.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = canon.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .agg(F.count("*").alias("n_triangles"))
    )


def per_node_triangles(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation (`src/algorithms/triangle.rs:110-159`).
    Returns (id, n_triangles) for nodes in ≥1 triangle."""
    canon = (
        _undirected(edges)
        .filter(F.col("src") < F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e1 = canon.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = canon.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = canon.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tris = e1.join(e2, "b").join(e3, ["a", "c"])
    ids = (
        tris.select(F.col("a").alias("id"))
        .unionByName(tris.select(F.col("b").alias("id")))
        .unionByName(tris.select(F.col("c").alias("id")))
    )
    return ids.groupBy("id").agg(F.count("*").alias("n_triangles"))


def clustering_coefficient(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Local clustering coefficient 2T/(d(d−1))
    (`src/algorithms/triangle.rs:204-316`). Returns (id, coefficient)."""
    und = _undirected(edges).localCheckpoint(eager=True)
    deg = und.groupBy("src").agg(F.count("*").alias("deg")).withColumnRenamed(
        "src", "id"
    )
    tri = per_node_triangles(edges)
    return (
        nodes.select("id")
        .join(deg, "id", "left")
        .join(tri, "id", "left")
        .select(
            "id",
            F.when(
                F.coalesce("deg", F.lit(0)) >= 2,
                2.0
                * F.coalesce("n_triangles", F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1)),
            )
            .otherwise(0.0)
            .alias("coefficient"),
        )
    )


def degree_centrality(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """(in+out degree)/(n−1) (`src/algorithms/centrality.rs:6-30`)."""
    n = nodes.count()
    out_d = edges.groupBy("src").agg(F.count("*").alias("od"))
    in_d = edges.groupBy("dst").agg(F.count("*").alias("idg"))
    return (
        nodes.select("id")
        .join(out_d, nodes["id"] == out_d["src"], "left")
        .join(in_d, nodes["id"] == in_d["dst"], "left")
        .select(
            "id",
            (
                (F.coalesce("od", F.lit(0)) + F.coalesce("idg", F.lit(0)))
                / F.lit(float(n - 1))
            ).alias("centrality"),
        )
    )


def k_core(nodes: DataFrame, edges: DataFrame, k: int, max_iter: int = 100
           ) -> DataFrame:
    """k-core via iterative peeling (`src/algorithms/kcore.rs:60-156`):
    repeatedly drop nodes with undirected degree < k. Returns surviving
    (id, degree) where degree is within the core."""
    und = _undirected(edges).localCheckpoint(eager=True)
    alive = nodes.select("id").localCheckpoint(eager=True)
    for i in range(max_iter):
        live_edges = (
            und.join(alive.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(alive.withColumnRenamed("id", "dst"), "dst", "left_semi")
        )
        deg = live_edges.groupBy("src").agg(F.count("*").alias("degree"))
        survivors = (
            alive.join(deg, alive["id"] == deg["src"], "left")
            .filter(F.coalesce("degree", F.lit(0)) >= k)
            .select("id", "degree")
            .localCheckpoint(eager=True)
        )
        n_alive, n_surv = alive.count(), survivors.count()
        alive = survivors.select("id")
        if n_surv == n_alive or n_surv == 0:
            return survivors
    return survivors


def label_propagation(
    nodes: DataFrame, edges: DataFrame, iterations: int = 10
) -> DataFrame:
    """Community detection by synchronous label propagation — the
    reference's "Louvain" is exactly this greedy neighbor-majority move
    with no modularity term (`src/algorithms/louvain.rs:6-86`).
    Deterministic tie-break: (count desc, label asc). Returns
    (id, community)."""
    und = _undirected(edges).localCheckpoint(eager=True)
    labels = nodes.select("id").withColumn("community", F.col("id")).localCheckpoint(
        eager=True
    )
    for i in range(iterations):
        votes = (
            labels.join(und, labels["id"] == und["src"])
            .groupBy(F.col("dst").alias("id"), F.col("community"))
            .agg(F.count("*").alias("n"))
        )
        # majority label; tie-break = smallest label (max over (n, -label))
        best = votes.groupBy("id").agg(
            F.max(F.struct(F.col("n"), (-F.col("community")).alias("neg"))).alias("_b")
        ).select("id", (-F.col("_b.neg")).alias("new_community"))
        labels = (
            labels.join(best, "id", "left")
            .select(
                "id",
                F.coalesce("new_community", F.col("community")).alias("community"),
            )
        )
        if (i + 1) % CHECKPOINT_EVERY == 0 or i == iterations - 1:
            labels = labels.localCheckpoint(eager=True)
    return labels
