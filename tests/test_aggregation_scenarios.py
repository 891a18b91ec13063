"""The reference's enhanced-aggregation scenarios, ported 1:1.

Source: `/root/reference/tests/aggregation_enhanced_test.rs` (522 lines —
the densest aggregate-semantics spec: STDEV, PERCENTILECONT,
PERCENTILEDISC over Number-labeled nodes, with empty/single-value/
grouped/invalid-parameter boundaries). Run through the Cypher front-end,
exactly as the reference does.
"""

from __future__ import annotations

import math

import pytest

from rs_graphdb_spark.cypher import execute_cypher
from rs_graphdb_spark.graph import PropertyGraph
from rs_graphdb_spark.session import local_df


def _numbers(spark, values, groups=None) -> PropertyGraph:
    rows = [
        (i, float(v), (groups[i] if groups else None))
        for i, v in enumerate(values)
    ]
    return PropertyGraph(
        nodes={"Number": local_df(
            spark, rows, "id long, value double, grp string")},
        edges={},
    )


def _one(spark, values, query):
    rows = execute_cypher(_numbers(spark, values), query).collect()
    return rows


def test_stdev_simple(spark):
    rows = _one(spark, [1, 2, 3, 4, 5],
                "MATCH (n:Number) RETURN STDEV(n.value) AS std")
    assert len(rows) == 1
    assert abs(rows[0]["std"] - math.sqrt(2.5)) < 0.01  # sample stdev


def test_stdev_single_value(spark):
    rows = _one(spark, [5],
                "MATCH (n:Number) RETURN STDEV(n.value) AS std")
    assert len(rows) == 1 and rows[0]["std"] is None  # sample stdev of 1 → NULL


def test_stdev_empty(spark):
    g = _numbers(spark, [])
    rows = execute_cypher(
        g, "MATCH (n:Number) RETURN STDEV(n.value) AS std").collect()
    # reference returns no row for an empty aggregate input
    assert len(rows) == 0 or rows[0]["std"] is None


def test_stdev_with_float(spark):
    rows = _one(spark, [1.5, 2.5, 3.5, 4.5],
                "MATCH (n:Number) RETURN STDEV(n.value) AS std")
    assert abs(rows[0]["std"] - 1.29099) < 0.01


def test_percentilecont_median(spark):
    rows = _one(spark, [1, 2, 3, 4, 5],
                "MATCH (n:Number) RETURN PERCENTILECONT(n.value, 0.5) AS median")
    assert abs(rows[0]["median"] - 3.0) < 0.01


def test_percentilecont_quartile(spark):
    rows = _one(spark, [1, 2, 3, 4, 5, 6, 7, 8, 9],
                "MATCH (n:Number) RETURN PERCENTILECONT(n.value, 0.25) AS q1")
    assert 2.0 < rows[0]["q1"] < 3.01


def test_percentilecont_even_count(spark):
    rows = _one(spark, [1, 2, 3, 4],
                "MATCH (n:Number) RETURN PERCENTILECONT(n.value, 0.5) AS median")
    assert abs(rows[0]["median"] - 2.5) < 0.01  # interpolated


def test_percentilecont_empty(spark):
    rows = _one(spark, [],
                "MATCH (n:Number) RETURN PERCENTILECONT(n.value, 0.5) AS m")
    assert len(rows) == 0 or rows[0]["m"] is None


def test_percentiledisc_median(spark):
    rows = _one(spark, [1, 2, 3, 4, 5],
                "MATCH (n:Number) RETURN PERCENTILEDISC(n.value, 0.5) AS median")
    assert abs(rows[0]["median"] - 3.0) < 0.01


def test_percentiledisc_even_count(spark):
    rows = _one(spark, [1, 2, 3, 4],
                "MATCH (n:Number) RETURN PERCENTILEDISC(n.value, 0.5) AS median")
    assert rows[0]["median"] in (2.0, 3.0)  # discrete: an actual value


def test_percentiledisc_quartile(spark):
    rows = _one(spark, [1, 2, 3, 4, 5, 6, 7],
                "MATCH (n:Number) RETURN PERCENTILEDISC(n.value, 0.25) AS q1, "
                "PERCENTILEDISC(n.value, 0.75) AS q3")
    assert abs(rows[0]["q1"] - 2.0) < 1.0
    assert abs(rows[0]["q3"] - 6.0) < 1.0


def test_multiple_aggregations(spark):
    rows = _one(spark, list(range(1, 11)),
                "MATCH (n:Number) RETURN AVG(n.value) AS avg, "
                "STDEV(n.value) AS std, PERCENTILECONT(n.value, 0.5) AS med, "
                "PERCENTILEDISC(n.value, 0.5) AS disc")
    r = rows[0]
    assert abs(r["avg"] - 5.5) < 0.01
    assert r["std"] > 0.0
    assert abs(r["med"] - 5.5) < 0.01
    assert r["disc"] in (5.0, 6.0)


def test_percentile_with_group_by(spark):
    values = [1, 2, 3, 4, 5, 10, 11, 12, 13, 14, 15]
    groups = ["A"] * 5 + ["B"] * 6
    g = _numbers(spark, values, groups)
    rows = execute_cypher(
        g, "MATCH (n:Number) RETURN n.grp AS grp, "
           "PERCENTILECONT(n.value, 0.5) AS median GROUP BY grp").collect()
    got = {r["grp"]: r["median"] for r in rows}
    assert len(got) == 2
    assert abs(got["A"] - 3.0) < 1.0
    assert abs(got["B"] - 12.5) < 1.0


def test_percentile_extremes(spark):
    rows = _one(spark, list(range(1, 11)),
                "MATCH (n:Number) RETURN PERCENTILECONT(n.value, 0.0) AS mn, "
                "PERCENTILECONT(n.value, 1.0) AS mx")
    assert abs(rows[0]["mn"] - 1.0) < 0.01
    assert abs(rows[0]["mx"] - 10.0) < 0.01


def test_stdev_grouped(spark):
    values = [1, 5, 9, 2, 4, 6]
    groups = ["X"] * 3 + ["Y"] * 3
    g = _numbers(spark, values, groups)
    rows = execute_cypher(
        g, "MATCH (n:Number) RETURN n.grp AS grp, STDEV(n.value) AS std "
           "GROUP BY grp").collect()
    got = {r["grp"]: r["std"] for r in rows}
    assert len(got) == 2 and all(v > 0.0 for v in got.values())


def test_percentile_invalid_parameter(spark):
    g = _numbers(spark, [1, 2, 3, 4, 5])
    with pytest.raises(Exception):  # out-of-range percentile must error
        execute_cypher(
            g, "MATCH (n:Number) RETURN PERCENTILECONT(n.value, 1.5) AS bad"
        ).collect()
