"""SemDeDup production-k probe (round 6 — r5 verdict #2).

Two questions, both at the Abbas et al. regime where k grows with the
corpus (k ≈ n/250 here):

A. Assignment wall at n = 1M vectors for k = 40 / 400 / 4000, flat
   broadcast-GEMM vs the two-level IVF-shape coarse path. Flat GEMM is
   O(n·k·dim) — fine at fixed k, quadratic when k ∝ n; the coarse path
   is O(n·√k·n_probe·dim) and should bend far more slowly.
B. Full semantic_dedup (assign="table") across three corpus decades at
   FIXED cluster size n/k = 250 — per-vector wall should stay ~flat
   (the within-cluster pair scan is bounded by cluster size; the
   assignment is the only k-growing stage).

Usage: python tools/semdedup_k_probe.py [base_n] [rungs]
Prints markdown rows for PLANS.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

DIM = 16  # keep GEMM flops proportional but the fixture cheap to build


def vec_expr(seed_col, perturb=False):
    comps = []
    for j in range(DIM):
        h = F.conv(
            F.substring(F.md5(F.concat_ws("-", seed_col.cast("string"),
                                          F.lit(str(j)))), 1, 8),
            16, 10,
        ).cast("long")
        v = (h % 2001 - 1000).cast("double") / 1000.0
        if perturb and j < 2:
            v = v + F.lit(0.05 * (j + 1))
        comps.append(v)
    return F.array(*comps)


def corpus(spark, n):
    g = (F.col("id") / 2).cast("long")
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") % 2 == 0, vec_expr(g))
        .otherwise(vec_expr(g, perturb=True)).alias("embedding"),
    ).repartition(spark.sparkContext.defaultParallelism) \
     .localCheckpoint(eager=True)


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    rungs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from rs_graphdb_spark.functions.clustering import kmeans_assign_table
    from rs_graphdb_spark.functions.similarity import semantic_dedup
    from rs_graphdb_spark.session import get_spark

    spark = get_spark("semdedup-k-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # --- A: assignment wall at fixed n, growing k -----------------------
    n_fix = base_n * 10 ** (rungs - 1)
    emb = corpus(spark, n_fix)
    for k in (40, 400, 4000):
        for coarse in (False, True):
            tag = "coarse" if coarse else "flat"
            t0 = time.time()
            kmeans_assign_table(
                emb, "vec_id", "embedding", k=k, iterations=1, coarse=coarse
            ).write.mode("overwrite").format("noop").save()
            print(f"| assign {tag} | n={n_fix:,} k={k} "
                  f"| {time.time() - t0:.2f} s |", flush=True)
    emb.unpersist()

    # --- B: full semantic_dedup at fixed n/k = 250 ----------------------
    for r in range(rungs):
        n = base_n * 10 ** r
        k = max(4, n // 250)
        emb = corpus(spark, n)
        t0 = time.time()
        semantic_dedup(
            emb, "vec_id", "embedding", k=k, iterations=2,
            threshold=0.95, assign="table",
        ).write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        print(f"| semantic_dedup table | n={n:,} k={k} | {dt:.2f} s "
              f"| {1e6 * dt / n:.1f} µs/vec |", flush=True)
        emb.unpersist()


if __name__ == "__main__":
    main()
