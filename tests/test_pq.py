"""Product quantization (IVF-PQ rung): codebooks, ADC scoring, recall."""

import math
import random

import pyspark.sql.functions as F
import pytest

from rs_graphdb_spark.functions.similarity import (
    knn_bruteforce,
    knn_pq_adc,
    pq_encode,
    pq_train,
)


def _clustered_vectors(n=240, dim=32, n_clusters=12, noise=0.05):
    """Planted-cluster fixture: PQ's intended regime (real embedding
    tables are clustered; the driver's synthetic table is near-random —
    PQ's worst case — so the recall evidence lives here)."""
    rng = random.Random(7)
    centers = [[rng.gauss(0, 1) for _ in range(dim)]
               for _ in range(n_clusters)]
    rows = []
    for i in range(n):
        c = centers[i % n_clusters]
        rows.append((i, [x + rng.gauss(0, noise) for x in c]))
    return rows


@pytest.fixture(scope="module")
def clustered(spark):
    return spark.createDataFrame(
        _clustered_vectors(), "vec_id long, v array<double>"
    ).cache()


def test_pq_train_shapes_and_determinism(clustered):
    books = pq_train(clustered, "vec_id", "v", m=4, ks=8, iters=2)
    assert len(books) == 4
    assert all(len(b) == 8 for b in books)
    assert all(len(c) == 8 for b in books for c in b)  # dim 32 / m 4
    books2 = pq_train(clustered, "vec_id", "v", m=4, ks=8, iters=2)
    assert books == books2  # no randomness — reproducible builds


def test_pq_train_rejects_indivisible_dim(clustered):
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(clustered, "vec_id", "v", m=5)


def test_pq_encode_codes_and_recon_norm(clustered):
    books = pq_train(clustered, "vec_id", "v", m=4, ks=8, iters=2)
    enc = pq_encode(clustered, "vec_id", "v", books).collect()
    for r in enc:
        assert len(r["codes"]) == 4
        assert all(0 <= c < 8 for c in r["codes"])
        # recon_n2 must equal the norm² of the actual reconstruction
        recon = [w for j, c in enumerate(r["codes"]) for w in books[j][c]]
        assert r["recon_n2"] == pytest.approx(
            sum(w * w for w in recon), rel=1e-12)


def test_adc_equals_explicit_reconstruction_cosine(spark, clustered):
    # ADC lookup-table scoring must equal cosine(q, decode(codes))
    books = pq_train(clustered, "vec_id", "v", m=4, ks=8, iters=2)
    q = clustered.filter(F.col("vec_id") < 3)
    adc = {(r["query_id"], r["neighbor_id"]): r["adc_cos"]
           for r in knn_pq_adc(
               clustered, q, "vec_id", "v", books, k=5).collect()}
    vecs = {r["vec_id"]: r["v"] for r in clustered.collect()}
    codes = {r["vec_id"]: r["codes"]
             for r in pq_encode(clustered, "vec_id", "v", books).collect()}
    for (qi, ni), got in adc.items():
        qv = vecs[qi]
        recon = [w for j, c in enumerate(codes[ni]) for w in books[j][c]]
        dot = sum(a * b for a, b in zip(qv, recon))
        want = dot / (math.sqrt(sum(a * a for a in qv))
                      * math.sqrt(sum(b * b for b in recon)))
        assert got == pytest.approx(want, abs=1e-9)


def test_pq_retrieves_true_neighborhood_on_clustered_data(clustered):
    # the intended regime: on clustered data every ADC top-10 neighbor
    # should come from the query's true cluster (vec_id % 12 by
    # construction). Within a tight cluster all pairwise cosines are
    # near-identical, so top-10 SET overlap vs exact is tie-noise —
    # neighborhood membership is the meaningful PQ recall claim; the
    # exact cross-engine hit count is separately pinned by q44:pq_recall.
    books = pq_train(clustered, "vec_id", "v", m=4, ks=16, iters=3)
    q = clustered.filter(F.col("vec_id") < 8)
    pq = knn_pq_adc(clustered, q, "vec_id", "v", books, k=10).collect()
    assert len(pq) == 80
    same = sum(1 for r in pq
               if r["neighbor_id"] % 12 == r["query_id"] % 12)
    assert same / len(pq) >= 0.9, same / len(pq)
    # and the exact search agrees on the neighborhood, so PQ ≈ exact at
    # the cluster granularity
    ex = knn_bruteforce(clustered, q, "vec_id", "v", k=10).collect()
    same_ex = sum(1 for r in ex
                  if r["neighbor_id"] % 12 == r["query_id"] % 12)
    assert same_ex == len(ex)


def test_codes_df_standing_index_path(clustered):
    # scoring a persisted codes table (no raw vectors on the corpus
    # side) must give the same answers as encode-on-the-fly
    books = pq_train(clustered, "vec_id", "v", m=4, ks=8, iters=2)
    enc = pq_encode(clustered, "vec_id", "v", books).localCheckpoint()
    q = clustered.filter(F.col("vec_id") < 3)
    direct = {(r["query_id"], r["neighbor_id"], round(r["adc_cos"], 9))
              for r in knn_pq_adc(
                  clustered, q, "vec_id", "v", books, k=5).collect()}
    standing = {(r["query_id"], r["neighbor_id"], round(r["adc_cos"], 9))
                for r in knn_pq_adc(
                    clustered, q, "vec_id", "v", books, k=5,
                    codes_df=enc).collect()}
    assert direct == standing


def test_pq_bytes_reduction(clustered):
    # the headline lever: m small codes per vector vs dim doubles
    books = pq_train(clustered, "vec_id", "v", m=4, ks=8, iters=1)
    enc = pq_encode(clustered, "vec_id", "v", books)
    assert dict(enc.dtypes)["codes"] == "array<int>"
    # 32 doubles (256 B) -> 4 codes; with ks<=256 these serialize as
    # bytes in a columnar store: 64x raw reduction before overheads
    (row,) = enc.limit(1).collect()
    assert len(row["codes"]) == 4


def test_ivf_pq_full_probe_equals_pq_adc(spark, clustered):
    # n_probe == n_clusters degenerates to exactly the flat ADC search
    from rs_graphdb_spark.functions.similarity import knn_ivf_pq
    books = pq_train(clustered, "vec_id", "v", m=4, ks=8, iters=2)
    q = clustered.filter(F.col("vec_id") < 4)
    flat = {(r["query_id"], r["neighbor_id"], r["rank"])
            for r in knn_pq_adc(
                clustered, q, "vec_id", "v", books, k=5).collect()}
    full = {(r["query_id"], r["neighbor_id"], r["rank"])
            for r in knn_ivf_pq(
                clustered, q, "vec_id", "v", books, k=5,
                n_clusters=6, n_probe=6, iters=2).collect()}
    assert full == flat


def test_ivf_pq_pruned_probe_stays_in_neighborhood(spark, clustered):
    # n_probe=1 on planted clusters: every hit still lands in the true
    # cluster (the cell prune finds the right Voronoi region)
    from rs_graphdb_spark.functions.similarity import knn_ivf_pq
    books = pq_train(clustered, "vec_id", "v", m=4, ks=16, iters=2)
    q = clustered.filter(F.col("vec_id") < 6)
    rows = knn_ivf_pq(clustered, q, "vec_id", "v", books, k=10,
                      n_clusters=12, n_probe=1, iters=3).collect()
    assert rows  # pruned probe still returns candidates
    same = sum(1 for r in rows
               if r["neighbor_id"] % 12 == r["query_id"] % 12)
    assert same / len(rows) >= 0.9
