"""The reference's FOREACH and CALL-subquery scenarios, ported 1:1.

Sources: `/root/reference/tests/foreach_test.rs` (FOREACH over literal id
lists with single/multi/string SET updates, empty lists, nonexistent ids,
invalid syntax) and `/root/reference/tests/call_subquery_test.rs`
(CALL { subquery } with filters, aggregation, relationship patterns).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rs_graphdb_spark.cypher import execute_cypher
from rs_graphdb_spark.cypher.parser import CypherSyntaxError, parse_cypher
from rs_graphdb_spark.graph import EdgeSet, PropertyGraph
from rs_graphdb_spark.session import local_df


def _people(spark) -> PropertyGraph:
    rows = [(1, "Alice", 30, "NYC"), (2, "Bob", 25, "LA"), (3, "Charlie", 35, "NYC")]
    return PropertyGraph(
        nodes={"Person": local_df(
            spark, rows, "id long, name string, age long, city string")},
        edges={"KNOWS": EdgeSet(
            df=local_df(spark, [(1, 1, 2), (2, 2, 3)],
                        "edge_id long, src long, dst long"),
            src_label="Person", dst_label="Person")},
    )


# ==================== FOREACH (foreach_test.rs) ============================

def test_foreach_basic(spark):
    g = execute_cypher(_people(spark), "FOREACH (n IN [1, 2, 3] | SET n.marked = 1)")
    assert g.nodes["Person"].filter(F.col("marked") == 1).count() == 3


def test_foreach_empty_list(spark):
    g = execute_cypher(_people(spark), "FOREACH (n IN [] | SET n.marked = 1)")
    assert "marked" not in g.nodes["Person"].columns  # no-op


def test_foreach_multiple_updates(spark):
    g = execute_cypher(
        _people(spark), "FOREACH (n IN [1, 2] | SET n.marked = 1, n.processed = 2)")
    rows = {r["id"]: r for r in g.nodes["Person"].collect()}
    assert rows[1]["marked"] == 1 and rows[1]["processed"] == 2
    assert rows[3]["marked"] is None and rows[3]["processed"] is None


def test_foreach_string_value(spark):
    g = execute_cypher(
        _people(spark), "FOREACH (n IN [1, 2, 3] | SET n.status = 'done')")
    assert g.nodes["Person"].filter(F.col("status") == "done").count() == 3


def test_foreach_nonexistent_nodes(spark):
    # missing ids are tolerated; existing ones update
    g = execute_cypher(
        _people(spark), "FOREACH (n IN [1, 999, 1000] | SET n.marked = 1)")
    assert g.nodes["Person"].filter(F.col("marked") == 1).count() == 1


def test_foreach_invalid_syntax(spark):
    with pytest.raises(CypherSyntaxError):
        parse_cypher("FOREACH (n IN [1, 2, 3] SET n.marked = 1)")  # missing |


# ==================== CALL subquery (call_subquery_test.rs) ================

def test_call_basic_subquery(spark):
    df = execute_cypher(
        _people(spark),
        "CALL { MATCH (p:Person) WHERE p.age > 28 RETURN p.name AS name } "
        "RETURN name")
    assert sorted(r["name"] for r in df.collect()) == ["Alice", "Charlie"]


def test_call_with_aggregation(spark):
    df = execute_cypher(
        _people(spark),
        "CALL { MATCH (p:Person) RETURN p.name AS name } RETURN count(*) AS n")
    assert df.first()["n"] == 3


def test_call_with_where_clause(spark):
    df = execute_cypher(
        _people(spark),
        "CALL { MATCH (p:Person) WHERE p.age >= 30 RETURN p.age AS age } "
        "RETURN age ORDER BY age")
    assert [r["age"] for r in df.collect()] == [30, 35]


def test_call_nested_relationship_query(spark):
    df = execute_cypher(
        _people(spark),
        "CALL { MATCH (a:Person)-[:KNOWS]->(b:Person) RETURN a.name AS a } "
        "RETURN a ORDER BY a")
    assert [r["a"] for r in df.collect()] == ["Alice", "Bob"]
