"""Batch-mode ANN probe (r9 VERDICT item #2): driver memory must stay
FLAT as the query count scales 10² → 10⁵ when probing a standing IVF-PQ
index with ``knn_pq_indexed(batch_mode=True)`` — the serving path
collects every query vector (and, on the arrow engine, builds an m×ks
LUT per query) driver-side, which is exactly what a corpus-sized query
batch (index-join dedup, embedding-table self-join) cannot afford.

Each scale runs in a FRESH subprocess so ``ru_maxrss`` is a per-run
peak of the PYTHON DRIVER process (the JVM is a separate child); the
collected path is probed at every scale as the growth reference (its
RSS grows with the query count; batch mode's must not). Production PQ
shape: dim 64, m=8, ks=256 (arrow ADC), 32
coarse cells over a 20k-vector corpus.

Usage: python tools/pq_batch_probe.py
Prints markdown rows for PLANS.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

BASE = "/root/repo/.tmp/pq_batch_probe"


def planted(n, dim, n_clusters, seed):
    import numpy as np

    rs = np.random.RandomState(seed)
    centers = rs.normal(0, 1, size=(n_clusters, dim))
    idx = np.arange(n) % n_clusters
    return centers[idx] + rs.normal(0, 0.08, size=(n, dim))


def child(mode: str, qpath: str, idx: str) -> None:
    import resource

    from rs_graphdb_spark.functions.similarity import knn_pq_indexed
    from rs_graphdb_spark.session import get_spark

    spark = get_spark("pq-batch-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark.read.parquet(qpath)
    t0 = time.time()
    out = knn_pq_indexed(spark, idx, qs, "vec_id", "v", k=10, n_probe=4,
                         adc_engine="arrow",
                         batch_mode=(mode == "batch"))
    n = out.count()
    wall = time.time() - t0
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    print(json.dumps({"mode": mode, "rows": n, "wall_s": round(wall, 2),
                      "driver_maxrss_mb": round(rss_mb, 1)}))


def main() -> None:
    from rs_graphdb_spark.functions.similarity import write_pq_index
    from rs_graphdb_spark.session import get_spark

    n, dim, m, ks, cells = 20_000, 64, 8, 256, 32
    os.makedirs(BASE, exist_ok=True)
    spark = get_spark("pq-batch-probe-setup")
    spark.sparkContext.setLogLevel("ERROR")
    v = planted(n, dim, n_clusters=cells, seed=11)
    corpus = spark.createDataFrame(
        [(int(i), v[i].tolist()) for i in range(n)],
        "vec_id long, v array<double>",
    ).repartition(32).localCheckpoint(eager=True)
    idx = f"{BASE}/index"
    write_pq_index(corpus, "vec_id", "v", idx, m=m, ks=ks,
                   n_clusters=cells, iters=1)
    scales = [100, 1_000, 10_000, 100_000]
    for q in scales:
        qv = planted(q, dim, n_clusters=cells, seed=29)
        qdf = spark.createDataFrame(
            [(int(1_000_000 + i), qv[i].tolist()) for i in range(q)],
            "vec_id long, v array<double>")
        qdf.repartition(8).write.mode("overwrite").parquet(
            f"{BASE}/q{q}.parquet")
    spark.stop()

    print("| mode | queries | rows | wall (s) | driver peak RSS (MB) |")
    print("|---|---|---|---|---|")
    for mode, qs in (("collected", scales), ("batch", scales)):
        for q in qs:
            r = subprocess.run(
                [sys.executable, __file__, "--child", mode,
                 f"{BASE}/q{q}.parquet", idx],
                capture_output=True, text=True, check=True)
            d = json.loads(r.stdout.strip().splitlines()[-1])
            print(f"| {mode} | {q} | {d['rows']} | {d['wall_s']} "
                  f"| {d['driver_maxrss_mb']} |")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        main()
