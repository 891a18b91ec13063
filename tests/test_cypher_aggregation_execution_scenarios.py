"""The reference's Cypher aggregation-EXECUTION scenarios, ported 1:1.

Source: `/root/reference/tests/cypher_aggregation_execution_test.rs` —
MIN/MAX/COUNT/COLLECT/SUM/AVG through the Cypher front-end, with GROUP
BY, WHERE, ORDER BY on the aggregate, and LIMIT. (Its sibling
cypher_aggregation_test.rs is parse-level and covered by these same
statements round-tripping through parse+execute.)
"""

from __future__ import annotations

import pytest

from rs_graphdb_spark.cypher import execute_cypher
from rs_graphdb_spark.graph import PropertyGraph
from rs_graphdb_spark.session import local_df


@pytest.fixture()
def users3(spark):
    """Alice 30 New York, Bob 25 London, Charlie 35 Paris."""
    return PropertyGraph(nodes={"User": local_df(spark, [
        (1, "Alice", 30, "New York"), (2, "Bob", 25, "London"),
        (3, "Charlie", 35, "Paris"),
    ], "id long, name string, age long, city string")}, edges={})


@pytest.fixture()
def users4(spark):
    """Two cities x two users each."""
    return PropertyGraph(nodes={"User": local_df(spark, [
        (1, "Alice", 30, "New York"), (2, "Bob", 25, "London"),
        (3, "Charlie", 35, "New York"), (4, "David", 28, "London"),
    ], "id long, name string, age long, city string")}, edges={})


def test_execute_min_aggregation(users3):
    """cypher_aggregation_execution_test.rs:19-41."""
    df = execute_cypher(users3, "MATCH (u:User) RETURN MIN(u.age) AS min_age")
    assert df.first()["min_age"] == 25


def test_execute_max_aggregation(users3):
    """:43-63."""
    df = execute_cypher(users3, "MATCH (u:User) RETURN MAX(u.age) AS max_age")
    assert df.first()["max_age"] == 35


def test_execute_count_aggregation(users3):
    """:65-85."""
    df = execute_cypher(users3, "MATCH (u:User) RETURN COUNT(*) AS count")
    assert df.first()["count"] == 3


def test_execute_group_by(users4):
    """:87-115: two city groups, counts summing to 4."""
    df = execute_cypher(
        users4,
        "MATCH (u:User) RETURN u.city AS city, COUNT(*) AS count GROUP BY u.city")
    rows = df.collect()
    assert len(rows) == 2
    assert sum(r["count"] for r in rows) == 4


def test_execute_min_max_with_group_by(users4):
    """:117-141: per-group min and max both present and correct."""
    df = execute_cypher(
        users4,
        "MATCH (u:User) RETURN u.city AS city, MIN(u.age) AS lo, "
        "MAX(u.age) AS hi GROUP BY u.city")
    by_city = {r["city"]: (r["lo"], r["hi"]) for r in df.collect()}
    assert by_city == {"New York": (30, 35), "London": (25, 28)}


def test_execute_collect_aggregation(users3):
    """:143-168: COLLECT over the full frontier gathers all names."""
    df = execute_cypher(users3, "MATCH (u:User) RETURN COLLECT(u.name) AS names")
    assert sorted(df.first()["names"]) == ["Alice", "Bob", "Charlie"]


def test_execute_collect_with_group_by(users4):
    """:170-195: non-empty per-group name lists."""
    df = execute_cypher(
        users4,
        "MATCH (u:User) RETURN u.city AS city, COLLECT(u.name) AS names "
        "GROUP BY u.city")
    by_city = {r["city"]: sorted(r["names"]) for r in df.collect()}
    assert by_city == {"New York": ["Alice", "Charlie"],
                       "London": ["Bob", "David"]}


def test_execute_aggregation_with_where(users3):
    """:197-217: WHERE filters before the aggregate (age > 25 → 2)."""
    df = execute_cypher(
        users3, "MATCH (u:User) WHERE u.age > 25 RETURN COUNT(*) AS count")
    assert df.first()["count"] == 2


def test_execute_aggregation_with_order_by(spark):
    """:219-241: ORDER BY the aggregate DESC puts the 2-user city
    first."""
    g = PropertyGraph(nodes={"User": local_df(spark, [
        (1, "A", 30, "London"), (2, "B", 25, "London"),
        (3, "C", 35, "New York"), (4, "D", 28, "Paris"),
    ], "id long, name string, age long, city string")}, edges={})
    df = execute_cypher(
        g, "MATCH (u:User) RETURN u.city AS city, COUNT(*) AS count "
           "GROUP BY u.city ORDER BY count DESC")
    rows = df.collect()
    assert len(rows) == 3
    assert rows[0]["city"] == "London" and rows[0]["count"] == 2


def test_execute_aggregation_with_limit(spark):
    """:243-261: LIMIT truncates the grouped output."""
    g = PropertyGraph(nodes={"User": local_df(spark, [
        (1, "A", 30, "London"), (2, "B", 25, "Paris"), (3, "C", 35, "NYC"),
    ], "id long, name string, age long, city string")}, edges={})
    df = execute_cypher(
        g, "MATCH (u:User) RETURN u.city AS city, COUNT(*) AS count "
           "GROUP BY u.city LIMIT 2")
    assert df.count() == 2


def test_execute_sum_aggregation(users3):
    """:263-283: 30 + 25 + 35 = 90."""
    df = execute_cypher(users3, "MATCH (u:User) RETURN SUM(u.age) AS total")
    assert df.first()["total"] == 90


def test_execute_avg_aggregation(users3):
    """:285-310: avg = 30.0."""
    df = execute_cypher(users3, "MATCH (u:User) RETURN AVG(u.age) AS avg_age")
    assert abs(df.first()["avg_age"] - 30.0) < 0.001


def test_execute_multiple_aggregations(users3):
    """:312-340: five aggregates in one RETURN."""
    df = execute_cypher(
        users3,
        "MATCH (u:User) RETURN COUNT(*) AS c, SUM(u.age) AS s, "
        "AVG(u.age) AS a, MIN(u.age) AS lo, MAX(u.age) AS hi")
    row = df.first()
    assert (row["c"], row["s"], row["lo"], row["hi"]) == (3, 90, 25, 35)
    assert abs(row["a"] - 30.0) < 0.001
