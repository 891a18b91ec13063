"""Embedding-DIMENSION scale probe (round 7 — r6 VERDICT item #2).

Every earlier vector probe ran at dim=16-64; production embeddings are
768-4096, where an ``array<double>`` row is 8-32 KB and the similarity
family's shuffles and per-row expression kernels are WIDTH-bound in a
way no corpus-size probe measures. This probe fixes n and grows dim
across 16 / 256 / 1024: per-vector result mass is constant, so wall time
should grow ~linearly with dim (the unavoidable dot-product term);
anything superlinear — plan-size explosion from dim-many literals,
interpreted HOF evaluation, shuffle width — bends harder and gets fixed.

Vectors are numpy-generated (seeded, deterministic), written to parquet
(float arrays), and timings read from the parquet, so generation cost is
excluded. Near-dup corpus pairs up (2g, 2g+1) exactly as the ANN probe.

Usage: python tools/dim_scale_probe.py [n] [dims...]
Defaults: n=50_000, dims 16 256 1024.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def write_corpus(spark, path: str, n: int, dim: int, neardup: bool) -> None:
    """Deterministic unit-ish vectors; when ``neardup``, odd ids are a
    small perturbation of their even partner (n/2 true pairs)."""
    import pyarrow as pa

    def gen(batches):
        for batch in batches:
            ids = batch.column(0).to_numpy()
            out = np.empty((len(ids), dim), dtype=np.float64)
            for i, vid in enumerate(ids):
                g = vid // 2 if neardup else vid
                rng = np.random.default_rng(int(g) * 1_000_003 + dim)
                v = rng.standard_normal(dim)
                if neardup and vid % 2 == 1:
                    v = v + 0.05 * rng.standard_normal(dim)
                out[i] = v
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()),
                 pa.array(list(out), type=pa.list_(pa.float64()))],
                ["vec_id", "embedding"],
            )

    (
        spark.range(n).repartition(32)
        .mapInArrow(gen, "vec_id long, embedding array<double>")
        .write.mode("overwrite").parquet(path)
    )


def timed(fn, runs=2):
    best, out = float("inf"), None
    for _ in range(runs):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
    return best, out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    dims = [int(x) for x in sys.argv[2:]] or [16, 256, 1024]

    from rs_graphdb_spark.functions.similarity import (
        embedding_near_dup_lsh,
        knn_bruteforce,
        knn_lsh,
        lsh_params_for,
        semantic_dedup,
    )
    from rs_graphdb_spark.session import get_spark

    spark = get_spark("dim-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="dim-scale-")
    rows = []

    def rec(label, dim, w, res):
        rows.append((label, dim, w, res))
        print(f"| {label} | dim={dim} | {w:.2f} s | {res} |", flush=True)

    for dim in dims:
        kp, np_, sp = f"{work}/knn-{dim}", f"{work}/nd-{dim}", f"{work}/sd-{dim}"
        write_corpus(spark, kp, n, dim, neardup=False)
        write_corpus(spark, np_, n, dim, neardup=True)
        write_corpus(spark, sp, n // 2, dim, neardup=True)
        corpus = spark.read.parquet(kp)
        nd = spark.read.parquet(np_)
        sd_in = spark.read.parquet(sp)
        queries = corpus.filter(F.col("vec_id") < 100).localCheckpoint(True)

        w, c = timed(lambda: knn_bruteforce(
            corpus, queries, "vec_id", "embedding", k=10).count())
        rec("knn_bruteforce", dim, w, f"{c} rows")

        w, c = timed(lambda: knn_lsh(
            corpus, queries, "vec_id", "embedding", k=10, dim=dim,
            multi_probe=True).count())
        rec("knn_lsh(multi_probe)", dim, w, f"{c} rows")

        tables, planes = lsh_params_for(n, threshold=0.95)
        w, c = timed(lambda: embedding_near_dup_lsh(
            nd, "vec_id", "embedding", threshold=0.95,
            tables=tables, planes_per_table=planes, dim=dim).count())
        rec(f"embedding_near_dup_lsh(T={tables},p={planes})", dim, w,
            f"{c} pairs (true {n//2})")

        k = max(4, (n // 2) // 500)
        w, c = timed(lambda: semantic_dedup(
            sd_in, "vec_id", "embedding", k=k, iterations=3,
            threshold=0.95).filter(F.col("dup_of").isNotNull()).count(),
            runs=1)
        rec(f"semantic_dedup(k={k})", dim, w, f"{c} dups")

    print(f"\nfixed n={n:,}; dims {dims}")
    print("| operator | dim | wall (s) | result |")
    print("|---|---|---|---|")
    for label, dim, w, res in rows:
        print(f"| {label} | {dim} | {w:.2f} | {res} |")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
