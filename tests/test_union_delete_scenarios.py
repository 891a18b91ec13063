"""The reference's UNION and DELETE scenario suites, ported 1:1.

Sources: `/root/reference/tests/union_test.rs` (UNION vs UNION ALL
dedup-by-node, empty sides, case-insensitive keywords, union after a
relationship hop) and `/root/reference/tests/cypher_delete_test.rs`
(DELETE single node, DELETE cascading to incident relationships, via
the CREATE path form)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rs_graphdb_spark.cypher import execute_cypher
from rs_graphdb_spark.graph import EdgeSet, PropertyGraph
from rs_graphdb_spark.session import local_df


def _users(spark) -> PropertyGraph:
    # union_test.rs fixture: Alice(30,NYC), Bob(25,LA), Charlie(35,NYC)
    people = [(1, "Alice", 30, "NYC"), (2, "Bob", 25, "LA"),
              (3, "Charlie", 35, "NYC")]
    rels = [(1, 1, 2)]  # Alice KNOWS Bob
    return PropertyGraph(
        nodes={"User": local_df(
            spark, people, "id long, name string, age long, city string")},
        edges={"KNOWS": EdgeSet(
            df=local_df(spark, rels, "edge_id long, src long, dst long"),
            src_label="User", dst_label="User")},
    )


def _run(spark, q):
    return execute_cypher(_users(spark), q)


# ==================== UNION (union_test.rs) ================================

def test_union_all_basic(spark):
    df = _run(spark, "MATCH (u:User) WHERE u.city = 'NYC' RETURN u "
                     "UNION ALL MATCH (u:User) WHERE u.age > 30 RETURN u")
    assert df.count() == 3  # NYC{Alice,Charlie} + age>30{Charlie} with dup


def test_union_basic(spark):
    df = _run(spark, "MATCH (u:User) WHERE u.city = 'NYC' RETURN u "
                     "UNION MATCH (u:User) WHERE u.age > 30 RETURN u")
    assert df.count() == 2  # Charlie deduplicated


def test_union_all_same_node(spark):
    df = _run(spark, "MATCH (u:User) WHERE u.name = 'Alice' RETURN u "
                     "UNION ALL MATCH (u:User) WHERE u.age > 25 RETURN u")
    assert df.count() == 3  # Alice + {Alice, Charlie}


def test_union_same_node(spark):
    df = _run(spark, "MATCH (u:User) WHERE u.name = 'Alice' RETURN u "
                     "UNION MATCH (u:User) WHERE u.age > 25 RETURN u")
    assert df.count() == 2  # {Alice, Charlie}


def test_union_all_empty_side(spark):
    df = _run(spark, "MATCH (u:User) WHERE u.city = 'Boston' RETURN u "
                     "UNION ALL MATCH (u:User) WHERE u.age > 25 RETURN u")
    assert df.count() == 2


def test_union_empty_side(spark):
    df = _run(spark, "MATCH (u:User) WHERE u.city = 'Boston' RETURN u "
                     "UNION MATCH (u:User) WHERE u.age > 25 RETURN u")
    assert df.count() == 2


def test_union_case_insensitive(spark):
    df = _run(spark, "match (u:User) where u.city = 'NYC' return u "
                     "union all match (u:User) where u.age > 28 return u")
    assert df.count() == 4  # {Alice, Charlie} + {Alice, Charlie}


def test_union_with_relationships(spark):
    df = _run(spark, "MATCH (u:User)-[:KNOWS]->(f:User) "
                     "WHERE u.name = 'Alice' RETURN f "
                     "UNION ALL MATCH (u:User) WHERE u.age > 30 RETURN u")
    assert df.count() == 2  # Bob (via hop) + Charlie


def test_relationship_query_only(spark):
    df = _run(spark, "MATCH (u:User)-[:KNOWS]->(f:User) "
                     "WHERE u.name = 'Alice' RETURN f.name AS name")
    assert [r["name"] for r in df.collect()] == ["Bob"]


# ==================== DELETE (cypher_delete_test.rs) =======================

def test_delete_single_node(spark):
    g = _users(spark)
    g = execute_cypher(g, "CREATE (n:User {name: 'Target', age: 1})")
    assert g.nodes["User"].filter(F.col("name") == "Target").count() == 1
    g = execute_cypher(g, "MATCH (n:User {name: 'Target'}) DELETE n")
    assert g.nodes["User"].filter(F.col("name") == "Target").count() == 0


def test_delete_node_with_relationships(spark):
    g = _users(spark)
    # the reference's CREATE path form: both nodes + the relationship
    g = execute_cypher(
        g, "CREATE (a:User {name: 'Ann', age: 9})-[:FRIEND]->"
           "(b:User {name: 'Ben', age: 8})")
    assert g.edges["FRIEND"].df.count() == 1
    assert g.nodes["User"].count() == 5
    g = execute_cypher(g, "MATCH (n:User {name: 'Ann'}) DELETE n")
    # Ann gone, her FRIEND edge cascaded, Ben survives
    assert g.nodes["User"].filter(F.col("name") == "Ann").count() == 0
    assert g.nodes["User"].filter(F.col("name") == "Ben").count() == 1
    assert g.edges["FRIEND"].df.count() == 0


def test_create_path_into_existing_rel_type(spark):
    g = _users(spark)
    before = g.edges["KNOWS"].df.count()
    g = execute_cypher(
        g, "CREATE (a:User {name: 'P', age: 2})-[:KNOWS]->"
           "(b:User {name: 'Q', age: 3})")
    assert g.edges["KNOWS"].df.count() == before + 1
    ids = {r["name"]: r["id"] for r in g.nodes["User"].collect()}
    edge = g.edges["KNOWS"].df.filter(F.col("src") == ids["P"]).first()
    assert edge["dst"] == ids["Q"]
