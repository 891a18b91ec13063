"""The reference's WITH-clause scenarios, ported 1:1.

Source: `/root/reference/tests/with_clause_test.rs` (259 lines): WITH
pass-through, WHERE chains, property projection with and without AS,
ordering/limits after WITH, empty results, unknown labels.
Fixture mirrors its `create_test_db()`: Alice(30,NYC), Bob(25,LA),
Charlie(35,NYC), David(28,Chicago); KNOWS Alice→{Bob,Charlie}, Bob→David.
"""

from __future__ import annotations

from rs_graphdb_spark.cypher import execute_cypher
from rs_graphdb_spark.graph import EdgeSet, PropertyGraph
from rs_graphdb_spark.session import local_df


def _g(spark) -> PropertyGraph:
    people = [(1, "Alice", 30, "NYC"), (2, "Bob", 25, "LA"),
              (3, "Charlie", 35, "NYC"), (4, "David", 28, "Chicago")]
    rels = [(1, 1, 2), (2, 1, 3), (3, 2, 4)]
    return PropertyGraph(
        nodes={"Person": local_df(
            spark, people, "id long, name string, age long, city string")},
        edges={"KNOWS": EdgeSet(
            df=local_df(spark, rels, "edge_id long, src long, dst long"),
            src_label="Person", dst_label="Person")},
    )


def test_with_basic(spark):
    df = execute_cypher(_g(spark), "MATCH (a:Person) WITH a RETURN a")
    assert df.count() == 4


def test_with_where_filter(spark):
    df = execute_cypher(
        _g(spark), "MATCH (a:Person) WITH a WHERE a.age > 30 RETURN a")
    assert df.count() == 1  # Charlie


def test_with_city_filter(spark):
    df = execute_cypher(
        _g(spark), "MATCH (a:Person) WITH a WHERE a.city = 'NYC' RETURN a")
    assert df.count() == 2  # Alice, Charlie


def test_with_multiple_filters(spark):
    df = execute_cypher(
        _g(spark),
        "MATCH (a:Person) WITH a WHERE a.age > 25 WHERE a.city = 'NYC' RETURN a")
    assert df.count() == 2  # Alice(30,NYC), Charlie(35,NYC)


def test_with_as_alias(spark):
    df = execute_cypher(
        _g(spark), "MATCH (a:Person) WITH a.name AS name RETURN name")
    assert sorted(r["name"] for r in df.collect()) == [
        "Alice", "Bob", "Charlie", "David"]


def test_return_as_alias(spark):
    df = execute_cypher(_g(spark), "MATCH (a:Person) RETURN a.name AS name")
    assert df.columns == ["name"] and df.count() == 4


def test_with_property_projection(spark):
    df = execute_cypher(
        _g(spark), "MATCH (a:Person) WITH a.name RETURN a.name")
    assert df.count() == 4


def test_with_order_by(spark):
    df = execute_cypher(
        _g(spark),
        "MATCH (a:Person) WITH a RETURN a.name AS name, a.age AS age "
        "ORDER BY age DESC")
    assert [r["name"] for r in df.collect()] == [
        "Charlie", "Alice", "David", "Bob"]


def test_with_limit(spark):
    df = execute_cypher(
        _g(spark), "MATCH (a:Person) WITH a WHERE a.age > 25 RETURN a LIMIT 2")
    assert df.count() == 2


def test_with_empty_result(spark):
    df = execute_cypher(
        _g(spark), "MATCH (a:Person) WITH a WHERE a.age > 100 RETURN a")
    assert df.count() == 0


def test_with_no_match(spark):
    # unknown label yields an EMPTY result, not an error
    df = execute_cypher(
        _g(spark), "MATCH (a:NonExistent) WITH a RETURN a")
    assert df.count() == 0
