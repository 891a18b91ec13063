"""Scalar quantization of embedding columns — known-answer + bound tests."""

import pyspark.sql.functions as F
import pytest

from rs_graphdb_spark.functions.similarity import (
    dequantize_embeddings,
    knn_bruteforce,
    knn_bruteforce_quantized,
    quantize_embeddings,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [0.0, 0.5, 1.0]),
        (1, [-2.0, 0.0, 2.0]),
        (2, [3.0, 3.0, 3.0]),        # constant vector: span = 0
        (3, [0.1, 0.9, 0.4]),
    ]
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def test_codes_known_answers(vecs):
    got = {r["vec_id"]: (r["mn"], r["span"], r["codes"])
           for r in quantize_embeddings(vecs, "vec_id", "v").collect()}
    assert got[0] == (0.0, 1.0, [0, 128, 255])     # 0.5*255+0.5 -> 128
    assert got[1] == (-2.0, 4.0, [0, 128, 255])
    assert got[2] == (3.0, 0.0, [0, 0, 0])         # span 0 -> all zero
    assert got[3][2][0] == 0 and got[3][2][1] == 255


def test_roundtrip_error_bounded(vecs):
    q = quantize_embeddings(vecs, "vec_id", "v")
    dq = dequantize_embeddings(q, "vec_id").withColumnRenamed("v", "rv")
    j = vecs.join(dq, "vec_id").select(
        F.aggregate(
            F.zip_with("v", "rv", lambda a, b: F.abs(a - b)),
            F.lit(0.0), lambda s, x: F.greatest(s, x),
        ).alias("err"),
        F.col("vec_id"),
    )
    for r in j.collect():
        # max error is half a quantization step: span / 255 / 2
        assert r["err"] <= (4.0 / 255.0) / 2.0 + 1e-12


def test_constant_vector_dequantizes_exactly(vecs):
    q = quantize_embeddings(vecs.filter(F.col("vec_id") == 2), "vec_id", "v")
    out = dequantize_embeddings(q, "vec_id").collect()[0]["v"]
    assert out == [3.0, 3.0, 3.0]


def test_quantized_knn_matches_float_knn_at_coarse_data(spark):
    # widely separated vectors: quantization cannot reorder the top-k
    import math
    rows = [(i, [math.cos(i * 0.7), math.sin(i * 0.7), float(i % 3)])
            for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    q = df.filter(F.col("vec_id") < 2)
    exact = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in knn_bruteforce(df, q, "vec_id", "v", k=5).collect()}
    quant = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in knn_bruteforce_quantized(
                 df, q, "vec_id", "v", k=5).collect()}
    hits = sum(exact[key] == quant.get(key) for key in exact)
    assert hits >= 8  # 10 slots; int8 on dim-3 data keeps ~all of top-5
