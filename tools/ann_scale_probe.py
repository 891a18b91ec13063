"""Three-decade scale probe for the embedding/ANN family (round 5 —
same methodology as tools/dedup_scale_probe.py): 10k / 100k / 1M
64-dim vectors with CONSTANT per-vector structure, so true result mass
is linear by construction and any superlinear wall bend is an operator
problem.

- knn corpus: deterministic pseudo-random unit-ish vectors (near-
  orthogonal in 64-dim); 100 fixed queries -> brute-force cost is
  exactly linear in corpus size, LSH probe cost ~ bucket-local.
- near-dup corpus: ids pair up (2g, 2g+1) with the odd member a tiny
  perturbation of the even one -> exactly n/2 true pairs, cross pairs
  near-orthogonal.

Usage: python tools/ann_scale_probe.py [base_n] [rungs]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

DIM = 64


def vec_expr(seed_col, perturb=False):
    """Deterministic 64-dim vector from a long column (JVM-side only)."""
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


def knn_corpus(spark, n):
    return spark.range(n).select(
        F.col("id").alias("vec_id"), vec_expr(F.col("id")).alias("embedding")
    )


def neardup_corpus(spark, n):
    g = (F.col("id") / 2).cast("long")
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") % 2 == 0, vec_expr(g))
        .otherwise(vec_expr(g, perturb=True)).alias("embedding"),
    )


def timed(fn, runs=2):
    best, out = float("inf"), None
    for _ in range(runs):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
    return best, out


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    rungs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from rs_graphdb_spark.functions.similarity import (
        embedding_near_dup_lsh,
        knn_bruteforce,
        knn_lsh,
        lsh_params_for,
    )
    from rs_graphdb_spark.session import get_spark

    spark = get_spark("ann-scale-probe")
    work = tempfile.mkdtemp(prefix="ann-scale-")
    rows = []
    queries = knn_corpus(spark, 100).localCheckpoint(eager=True)
    for r in range(rungs):
        n = base_n * 10**r
        kp, np_ = f"{work}/knn-{r}", f"{work}/nd-{r}"
        knn_corpus(spark, n).write.mode("overwrite").parquet(kp)
        neardup_corpus(spark, n).write.mode("overwrite").parquet(np_)
        corpus = spark.read.parquet(kp)
        nd = spark.read.parquet(np_)
        runs = 2 if r < rungs - 1 else 1

        w, c = timed(lambda: knn_bruteforce(
            corpus, queries, "vec_id", "embedding", k=10).count(), runs)
        rows.append((f"knn_bruteforce {n//1000}k", w, f"{c} rows"))
        print(rows[-1], flush=True)

        w, c = timed(lambda: knn_lsh(
            corpus, queries, "vec_id", "embedding", k=10,
            multi_probe=True).count(), runs)
        rows.append((f"knn_lsh(multi_probe) {n//1000}k", w, f"{c} rows"))
        print(rows[-1], flush=True)

        # size (tables, planes) to the corpus — a fixed plane count is
        # O(n²/2^p) candidates (the bend this probe originally caught)
        tables, planes = lsh_params_for(n, threshold=0.95)
        w, c = timed(lambda: embedding_near_dup_lsh(
            nd, "vec_id", "embedding", threshold=0.95,
            tables=tables, planes_per_table=planes).count(), runs)
        rows.append((f"embedding_near_dup_lsh {n//1000}k (T={tables},p={planes})",
                     w, f"{c} pairs (true {n//2})"))
        print(rows[-1], flush=True)

    print("\n| operator / rung | wall (s) | result |")
    print("|---|---|---|")
    for label, w, res in rows:
        print(f"| {label} | {w:.2f} | {res} |")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
