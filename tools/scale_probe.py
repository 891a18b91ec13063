"""10× scale probe for the iterative graph algorithms (PLANS.md).

Blows the sf0.1 KNOWS graph up by a factor (ids shifted per copy, plus
cross-copy stitch edges so the blow-up is ONE connected component — the
hard case for min-label propagation: label information must travel across
the whole graph, not stay inside small per-copy components), then times
PageRank / connected components / k-core at 1× and N×.

Usage: python tools/scale_probe.py [factor] [sf_dir]
Prints one markdown table row per (algorithm, scale) for PLANS.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from rs_graphdb_spark.algorithms.graph_algos import (
        connected_components,
        k_core,
        pagerank,
        strongly_connected_components,
    )
    from rs_graphdb_spark.loaders import load_tpch_graph
    from rs_graphdb_spark.session import get_spark

    spark = get_spark("scale-probe")
    g = load_tpch_graph(spark, sf_dir)
    nodes1 = g.nodes["Customer"].select("id").localCheckpoint(eager=True)
    edges1 = g.edges["KNOWS"].df.select("src", "dst").localCheckpoint(eager=True)
    n1, e1 = nodes1.count(), edges1.count()

    # N copies with shifted ids + stitch edges copy i -> copy i+1
    SHIFT = 1 << 50
    copies_n = [
        nodes1.select((F.col("id") + SHIFT * i).alias("id")) for i in range(factor)
    ]
    copies_e = [
        edges1.select(
            (F.col("src") + SHIFT * i).alias("src"),
            (F.col("dst") + SHIFT * i).alias("dst"),
        )
        for i in range(factor)
    ]
    stitch = [
        edges1.limit(1).select(
            (F.col("src") + SHIFT * i).alias("src"),
            (F.col("dst") + SHIFT * (i + 1)).alias("dst"),
        )
        for i in range(factor - 1)
    ]
    nodesN = copies_n[0]
    for c in copies_n[1:]:
        nodesN = nodesN.unionByName(c)
    edgesN = copies_e[0]
    for c in copies_e[1:] + stitch:
        edgesN = edgesN.unionByName(c)
    par = spark.sparkContext.defaultParallelism
    nodesN = nodesN.repartition(par).localCheckpoint(eager=True)
    edgesN = edgesN.repartition(par).localCheckpoint(eager=True)
    nN, eN = nodesN.count(), edgesN.count()

    def probe(tag, fn):
        t0 = time.time()
        out = fn()
        rows = out.count()
        return f"| {tag} | {rows} rows | {time.time() - t0:.1f} s |"

    # SEGMENT_RING (the cycle fixture) blown up the same way for SCC
    ring1 = g.edges["SEGMENT_RING"].df.select("src", "dst").localCheckpoint(eager=True)
    ringN = ring1
    for i in range(1, factor):
        ringN = ringN.unionByName(ring1.select(
            (F.col("src") + SHIFT * i).alias("src"),
            (F.col("dst") + SHIFT * i).alias("dst"),
        ))
    ringN = ringN.repartition(par).localCheckpoint(eager=True)

    print(f"1x: {n1} nodes / {e1} edges; {factor}x: {nN} nodes / {eN} edges")
    for scale, (nd, ed, rg) in (
        ("1x", (nodes1, edges1, ring1)), (f"{factor}x", (nodesN, edgesN, ringN))
    ):
        print(probe(f"PageRank 10 iters {scale}", lambda: pagerank(nd, ed, 0.85, 10)))
        print(probe(f"connected components {scale}", lambda: connected_components(nd, ed)))
        print(probe(f"k-core k=2 {scale}", lambda: k_core(nd, ed, k=2)))
        print(probe(f"SCC KNOWS (DAG -> all-trim) {scale}",
                    lambda: strongly_connected_components(nd, ed)))
        print(probe(f"SCC SEGMENT_RING (cycles) {scale}",
                    lambda: strongly_connected_components(nd, rg)))


if __name__ == "__main__":
    main()
