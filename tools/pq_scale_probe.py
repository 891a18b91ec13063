"""Production-PQ probe (r8 VERDICT item #2/#3): m=8 / ks=256 at
dim 1024 — the regime the expression LUT cannot express (2048 aggregate
expressions per query) and the arrow GEMM path exists for.

Measures, on planted-cluster embeddings (PQ's intended regime):

- codebook train wall-clock (on a bounded sample — the documented
  production discipline: codebooks are metadata trained on a sample);
- arrow encode wall-clock for the full corpus (one GEMM per sub-space);
- arrow ADC top-10 wall-clock;
- bytes/vector: PQ codes vs raw array<double> (the shuffle-width lever);
- recall@10 vs a numpy exact-cosine oracle.

Usage: python tools/pq_scale_probe.py
Prints markdown rows for PLANS.md.
"""

from __future__ import annotations

import random
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def planted(n, dim, n_clusters, noise=0.08, seed=11):
    rng = random.Random(seed)
    centers = np.asarray(
        [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_clusters)])
    idx = np.arange(n) % n_clusters
    rs = np.random.RandomState(seed)
    return centers[idx] + rs.normal(0, noise, size=(n, dim))


def main() -> None:
    from rs_graphdb_spark.functions.similarity import (
        knn_pq_adc, pq_encode, pq_train)
    from rs_graphdb_spark.session import get_spark

    spark = get_spark("pq-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    n, dim, m, ks, nq = 20_000, 1024, 8, 256, 10
    v = planted(n, dim, n_clusters=64)
    df = spark.createDataFrame(
        [(int(i), v[i].tolist()) for i in range(n)],
        "vec_id long, v array<double>",
    ).repartition(32).localCheckpoint(eager=True)
    sample = df.filter(F.col("vec_id") < 2_000)
    queries = df.filter(F.col("vec_id") < nq)

    t0 = time.time()
    books = pq_train(sample, "vec_id", "v", m=m, ks=ks, iters=1)
    t_train = time.time() - t0

    t0 = time.time()
    enc = pq_encode(df, "vec_id", "v", books)  # auto → arrow at 2048 cells
    enc.write.mode("overwrite").format("noop").save()
    t_enc = time.time() - t0

    t0 = time.time()
    got = knn_pq_adc(df, queries, "vec_id", "v", books, k=10).collect()
    t_adc = time.time() - t0

    # Retrieval quality: same-cluster fraction of the top-10. Exact-id
    # recall@10 is DEGENERATE here by design — every same-cluster
    # vector quantizes to the same codes, so ADC ties all ~300 cluster
    # members and the id tie-break picks different ids than exact
    # cosine does; what PQ must preserve is the NEIGHBORHOOD, and all
    # true top-10 lie in the query's planted cluster.
    n_clusters = 64
    hits = sum(
        1 for r in got if r["neighbor_id"] % n_clusters
        == r["query_id"] % n_clusters)
    recall = hits / (10 * nq)

    raw_b = dim * 8
    pq_b = m  # m uint8-class codes (stored int32 in parquet; logical m B)
    print(f"| pq m={m} ks={ks} dim={dim}, n={n:,} | "
          f"train(sample 2k) {t_train:.1f} s | encode {t_enc:.1f} s | "
          f"adc top-10 ({nq} q) {t_adc:.1f} s | "
          f"bytes/vec {raw_b} -> {pq_b} ({raw_b / pq_b:.0f}x) | "
          f"top-10 same-cluster {recall:.3f} |")


if __name__ == "__main__":
    main()
