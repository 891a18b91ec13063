"""Distributed logistic-regression trainer — exact-integer replica tests."""

import hashlib
import math
import re

import pyspark.sql.functions as F
import pytest

from rs_graphdb_spark.functions.train import (
    score_logreg_hashed,
    train_logreg_hashed,
)

DIM = 256


def _feats(text):
    tk = re.findall(r"[a-z0-9]+", text.lower())
    grams = tk + [f"{a} {b}" for a, b in zip(tk, tk[1:])]
    return {int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % DIM
            for g in grams}


def _replica(corpus, labels, iterations=2, lr=0.5):
    """Straightforward Python twin of the quantized-GD contract."""
    feats = {i: _feats(t) for i, t in corpus.items()}
    n = len(corpus)
    c = lr * 1e6 / n
    w = {}
    for _ in range(iterations):
        grad = {}
        for i in corpus:
            zm = sum(w.get(f, 0) for f in feats[i])
            err = 1.0 / (1.0 + math.exp(-(zm / 1e6))) - labels[i]
            qc = math.floor((err * c) + 0.5)
            for f in feats[i]:
                grad[f] = grad.get(f, 0) + qc
        for f, g in grad.items():
            w[f] = w.get(f, 0) - g
    return w, {i: sum(w.get(f, 0) for f in feats[i]) for i in corpus}


@pytest.fixture(scope="module")
def corpus():
    docs = {
        1: "spark shuffle join makes big data fast",
        2: "spark partitions scan parquet files",
        3: "the cat sat on the mat all day",
        4: "dogs bark at the mail carrier daily",
        5: "spark executors cache hot partitions",
        6: "rain falls softly on quiet rooftops",
    }
    labels = {i: int("spark" in t) for i, t in docs.items()}
    return docs, labels


def test_trainer_matches_replica_exactly(spark, corpus):
    docs, labels = corpus
    df = spark.createDataFrame(
        [(i, t, labels[i]) for i, t in docs.items()],
        "doc_id long, text string, y int")
    w = train_logreg_hashed(df, "doc_id", "text", "y", dim=DIM,
                            iterations=2, lr=0.5)
    got_w = {r["feature"]: r["w_micro"] for r in w.collect()}
    exp_w, exp_z = _replica(docs, labels)
    assert got_w == {f: v for f, v in exp_w.items()}
    got_z = {r["doc_id"]: r["zm"]
             for r in score_logreg_hashed(
                 df, "doc_id", "text", w, dim=DIM).collect()}
    assert got_z == exp_z


def test_trainer_learns_the_marker(spark, corpus):
    docs, labels = corpus
    df = spark.createDataFrame(
        [(i, t, labels[i]) for i, t in docs.items()],
        "doc_id long, text string, y int")
    w = train_logreg_hashed(df, "doc_id", "text", "y", dim=DIM,
                            iterations=3, lr=0.5)
    z = {r["doc_id"]: r["zm"]
         for r in score_logreg_hashed(
             df, "doc_id", "text", w, dim=DIM).collect()}
    pos = [z[i] for i in docs if labels[i] == 1]
    neg = [z[i] for i in docs if labels[i] == 0]
    assert min(pos) > max(neg)  # separable toy corpus: margins separate


def test_weight_table_only_holds_observed_features(spark, corpus):
    docs, labels = corpus
    df = spark.createDataFrame(
        [(i, t, labels[i]) for i, t in docs.items()],
        "doc_id long, text string, y int")
    w = train_logreg_hashed(df, "doc_id", "text", "y", dim=DIM,
                            iterations=1)
    observed = set().union(*[_feats(t) for t in docs.values()])
    assert {r["feature"] for r in w.collect()} <= observed
