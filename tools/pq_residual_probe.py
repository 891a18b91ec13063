"""Residual IVF-PQ recall probe (r9 VERDICT item #3): measure the
recall delta of residual encoding vs raw-vector PQ at the SAME byte
budget, at the production shape dim=1024 / m=8 / ks=256 over a
20k-vector planted-cluster corpus (32 coarse cells), 100 held-in
queries, recall@10 vs exact cosine (computed in numpy — the probe's
ground truth, not a Spark job).

Within-cluster variation is LOW-RANK (rank 16 per cluster) — the real
embedding-table regime (text embeddings have low intrinsic dimension),
and the one residual encoding targets: the coarse quantizer explains
the cluster mean, leaving a low-dimensional residual the codebooks can
actually capture. Full-rank isotropic noise at dim 1024 is
unquantizable at any m·ks for BOTH paths (a first probe run measured
residual 0.08 vs raw 0.15 recall there — ranking within a cluster was
noise either way); with near-zero noise every same-cluster vector
quantizes identically and recall@k is degenerate too (PLANS.md
round-9 PQ note).

Usage: python tools/pq_residual_probe.py
Prints markdown rows for PLANS.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import numpy as np

    from pyspark.sql import functions as F
    from rs_graphdb_spark.functions.similarity import (
        ivf_centroids, knn_ivf_pq, pq_train)
    from rs_graphdb_spark.session import get_spark

    n, dim, m, ks, cells, nq, k = 20_000, 1024, 8, 256, 32, 100, 10
    rank = 16
    rs = np.random.RandomState(13)
    centers = rs.normal(0, 1.0, size=(cells, dim))
    factors = rs.normal(0, 1.0, size=(cells, rank, dim))
    idx = np.arange(n) % cells
    coeff = rs.normal(0, 1.0, size=(n, rank))
    # low-rank within-cluster structure, norm ≈ 1/3 of the center norm
    V = centers[idx] + 0.09 * np.einsum(
        "nr,nrd->nd", coeff, factors[idx])

    spark = get_spark("pq-residual-probe")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.createDataFrame(
        [(int(i), V[i].tolist()) for i in range(n)],
        "vec_id long, v array<double>",
    ).repartition(32).localCheckpoint(eager=True)
    qs = corpus.filter(F.col("vec_id") < nq).localCheckpoint(eager=True)

    # exact ground truth in numpy
    norms = np.linalg.norm(V, axis=1)
    exact = {}
    for qi in range(nq):
        cos = (V @ V[qi]) / (norms * norms[qi])
        cos[qi] = -9.0
        exact[qi] = set(np.argsort(-cos)[:k].tolist())

    cents = ivf_centroids(corpus, "vec_id", "v", cells, 2)

    def run(residual: bool) -> tuple[float, float, float]:
        t0 = time.time()
        books = pq_train(corpus, "vec_id", "v", m=m, ks=ks, iters=2,
                         residual_centroids=cents if residual else None)
        t_train = time.time() - t0
        t0 = time.time()
        out = knn_ivf_pq(corpus, qs, "vec_id", "v", books, k=k,
                         n_clusters=cells, n_probe=8,
                         adc_engine="arrow", residual=residual,
                         centroids=cents).collect()
        t_knn = time.time() - t0
        got: dict = {}
        for r in out:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        rec = sum(len(got.get(q, set()) & e) for q, e in exact.items()
                  ) / (nq * k)
        return rec, t_train, t_knn

    print("| path | recall@10 vs exact | train (s) | knn (s) |")
    print("|---|---|---|---|")
    for residual in (False, True):
        rec, tt, tk = run(residual)
        name = "residual" if residual else "raw"
        print(f"| {name} | {rec:.3f} | {tt:.1f} | {tk:.1f} |")
    spark.stop()


if __name__ == "__main__":
    main()
