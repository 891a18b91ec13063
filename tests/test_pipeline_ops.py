"""Training-data pipeline operators: dedup, similarity, multimodal.

Reference-style micro-fixtures (SURVEY.md §5: hand-built inputs + exact
assertions), upgraded with known-answer checks.
"""

import pyspark.sql.functions as F
import pytest

from rs_graphdb_spark.functions.dedup import (
    embedding_near_dup_pairs,
    exact_dedup_groups,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from rs_graphdb_spark.functions.multimodal import (
    documents_as_media,
    extract_features,
    frame_sample,
)
from rs_graphdb_spark.functions.similarity import knn_bruteforce, knn_ivf, knn_lsh


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base.replace("lazy dog", "sleepy dog", 1)  # one shingle region differs
    far = "completely different content about spark dataframes and shuffles"
    return spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, far)], "doc_id long, text string"
    )


def test_exact_dedup_groups(docs):
    groups = {r["keeper"]: r["n_docs"] for r in exact_dedup_groups(docs, "doc_id", "text").collect()}
    assert groups[1] == 2  # docs 1 and 2 identical
    assert groups[3] == 1 and groups[4] == 1


def test_exact_dedup_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello   world"), (3, "HELLO world?")],
        "doc_id long, text string",
    )
    assert exact_dedup_groups(df, "doc_id", "text").count() == 1


def test_minhash_pairs_find_near_dups(docs):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in
             minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5).collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert not any(4 in p for p in pairs)


def test_ngram_jaccard_exact(docs):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.3).collect()}
    assert pairs[(1, 2)] == 1.0
    assert not any(4 in p for p in pairs)


def test_simhash_near_dups(docs):
    pairs = {(r["a"], r["b"]): r["hamming"] for r in
             simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=3).collect()}
    assert pairs[(1, 2)] == 0
    assert not any(4 in p for p in pairs)


def test_embedding_near_dup_and_knn(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0]),      # orthogonal
        (4, [0.7, 0.7, 0.0]),      # diagonal
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    dups = {(r["a"], r["b"]) for r in
            embedding_near_dup_pairs(emb, "vec_id", "embedding", 0.95).collect()}
    assert dups == {(1, 2)}

    knn = knn_bruteforce(emb, emb.filter(F.col("vec_id") == 1), "vec_id", "embedding", k=2)
    got = [r["neighbor_id"] for r in knn.orderBy("rank").collect()]
    assert got == [2, 4]


def test_knn_lsh_subset_of_bruteforce(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") < 3)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in knn_bruteforce(emb, q, "vec_id", "embedding", k=40).collect()}
    # 2 planes → 4 buckets: enough collisions in a 40-vector corpus
    approx = {(r["query_id"], r["neighbor_id"])
              for r in knn_lsh(emb, q, "vec_id", "embedding", k=5, n_planes=2, dim=16).collect()}
    # every ANN hit is a true (query, corpus) pair; ANN ranks by the same cosine
    assert approx <= exact and len(approx) > 0


def test_multimodal_features_deterministic(docs):
    media = documents_as_media(docs.withColumnRenamed("doc_id", "doc_id"))
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    for mid, row in feats.items():
        b = raw[mid].encode()
        assert row["n_bytes"] == len(b)
        assert row["width"] == (len(b) % 64) + 16
        assert row["checksum"] == sum(b)


def test_frame_sample_fanout(docs):
    media = documents_as_media(docs)
    frames = frame_sample(media, every_n_bytes=100)
    raw = {r["doc_id"]: r["text"].encode() for r in docs.collect()}
    rows = frames.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["media_id"], []).append(r)
        assert r["frame_byte"] == raw[r["media_id"]][r["frame_off"]]
    for mid, lst in by_doc.items():
        assert len(lst) == (len(raw[mid]) + 99) // 100


def test_knn_ivf_full_probe_equals_bruteforce(spark):
    import random

    rng = random.Random(11)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") < 3)
    exact = {(r["query_id"], r["neighbor_id"], r["rank"])
             for r in knn_bruteforce(emb, q, "vec_id", "embedding", k=5).collect()}
    full = {(r["query_id"], r["neighbor_id"], r["rank"])
            for r in knn_ivf(emb, q, "vec_id", "embedding", k=5,
                             n_clusters=4, n_probe=4).collect()}
    assert full == exact


def test_knn_ivf_partial_probe_subset(spark):
    import random

    rng = random.Random(12)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") < 3)
    exact_pairs = {(r["query_id"], r["neighbor_id"])
                   for r in knn_bruteforce(emb, q, "vec_id", "embedding", k=60).collect()}
    approx = knn_ivf(emb, q, "vec_id", "embedding", k=5,
                     n_clusters=6, n_probe=2).collect()
    assert len(approx) > 0
    assert {(r["query_id"], r["neighbor_id"]) for r in approx} <= exact_pairs
