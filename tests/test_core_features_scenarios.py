"""The reference's core-features scenarios, ported 1:1.

Source: `/root/reference/tests/core_features_test.rs` — transaction
handle lifecycle, storage-layer update APIs, WHERE enhancements. The
reference's transactions are themselves empty (its comments:
"当前实现中事务是空的"); what its scenarios pin is handle validity, which
`operators.tx.TxManager` reproduces. Durability here is batch-job
atomicity (SURVEY.md §2.11).
"""

from __future__ import annotations

import pytest

from rs_graphdb_spark.cypher import execute_cypher
from rs_graphdb_spark.graph import EdgeSet, PropertyGraph
from rs_graphdb_spark.operators.dml import update_node_props, update_rel_props
from rs_graphdb_spark.operators.tx import TxError, TxManager
from rs_graphdb_spark.session import local_df


def _users(spark, rows, schema="id long, name string, age long, city string"):
    return PropertyGraph(nodes={"User": local_df(spark, rows, schema)}, edges={})


# ========== transaction handles (core_features_test.rs:12-87) ==============

def test_transaction_begin_commit(spark):
    tx = TxManager()
    g = _users(spark, [(1, "Alice", 30, "NYC")])
    h = tx.begin_tx()
    tx.commit_tx(h)  # empty tx commits fine
    assert g.nodes["User"].count() == 1  # node survives the commit


def test_transaction_rollback(spark):
    tx = TxManager()
    g = _users(spark, [(1, "Bob", 25, "LA")])
    h = tx.begin_tx()
    tx.rollback_tx(h)
    assert g.nodes["User"].count() == 1  # untouched — rollback = keep old ref


def test_transaction_double_commit_fails():
    tx = TxManager()
    h = tx.begin_tx()
    tx.commit_tx(h)
    with pytest.raises(TxError):
        tx.commit_tx(h)


def test_transaction_invalid_handle_fails():
    tx = TxManager()
    with pytest.raises(TxError):
        tx.commit_tx(999)
    with pytest.raises(TxError):
        tx.rollback_tx(999)


def test_transaction_handles_are_distinct():
    tx = TxManager()
    h1, h2 = tx.begin_tx(), tx.begin_tx()
    assert h1 != h2 and tx.open_count() == 2
    tx.commit_tx(h1)
    assert tx.is_open(h2) and not tx.is_open(h1)


# ========== storage update APIs (core_features_test.rs:91-170) =============

def test_update_node_props(spark):
    """Merge-not-replace: age updated, city added, name preserved."""
    g = _users(spark, [(1, "Charlie", 30, None)])
    g2, ok = update_node_props(g, "User", 1, {"age": 31, "city": "NYC"})
    assert ok
    row = g2.nodes["User"].first()
    assert row["age"] == 31 and row["city"] == "NYC" and row["name"] == "Charlie"


def test_update_node_props_nonexistent(spark):
    g = _users(spark, [(1, "Charlie", 30, None)])
    g2, ok = update_node_props(g, "User", 42, {"age": 99})
    assert not ok
    assert g2.nodes["User"].first()["age"] == 30  # untouched


def test_update_rel_props(spark):
    g = PropertyGraph(
        nodes={"User": local_df(spark, [(1, "A", 1, None), (2, "B", 2, None)],
                                "id long, name string, age long, city string")},
        edges={"KNOWS": EdgeSet(
            df=local_df(spark, [(1, 1, 2, 2020)],
                        "edge_id long, src long, dst long, since long"),
            src_label="User", dst_label="User")},
    )
    g2, ok = update_rel_props(g, "KNOWS", 1, {"since": 2024, "weight": 0.5})
    assert ok
    row = g2.edges["KNOWS"].df.first()
    assert row["since"] == 2024 and row["weight"] == 0.5
    assert (row["src"], row["dst"]) == (1, 2)  # endpoints preserved


def test_update_rel_props_nonexistent(spark):
    g = PropertyGraph(
        nodes={"User": local_df(spark, [(1, "A", 1, None)],
                                "id long, name string, age long, city string")},
        edges={"KNOWS": EdgeSet(
            df=local_df(spark, [(1, 1, 1, 2020)],
                        "edge_id long, src long, dst long, since long"),
            src_label="User", dst_label="User")},
    )
    g2, ok = update_rel_props(g, "KNOWS", 7, {"since": 1})
    assert not ok
    assert g2.edges["KNOWS"].df.first()["since"] == 2020


# ========== WHERE enhancements (core_features_test.rs:172-370) =============

@pytest.fixture()
def where_graph(spark):
    return _users(spark, [
        (1, "Alice", 20, "NYC"),
        (2, "Bob", 30, "NYC"),
        (3, "Charlie", 25, "LA"),
    ])


def test_where_and_condition(where_graph):
    df = execute_cypher(
        where_graph,
        "MATCH (n:User) WHERE n.city = 'NYC' AND n.age > 25 "
        "RETURN n.name AS name")
    assert [r["name"] for r in df.collect()] == ["Bob"]


def test_where_or_condition(where_graph):
    df = execute_cypher(
        where_graph,
        "MATCH (n:User) WHERE n.age = 20 OR n.age = 25 RETURN n.name AS name")
    assert {r["name"] for r in df.collect()} == {"Alice", "Charlie"}


def test_where_complex_and_or(where_graph):
    """core_features_test.rs:253-296: parenthesized OR under AND."""
    df = execute_cypher(
        where_graph,
        "MATCH (n:User) WHERE n.city = \"NYC\" AND (n.age = 20 OR n.age = 30) "
        "RETURN n.name AS name")
    assert {r["name"] for r in df.collect()} == {"Alice", "Bob"}


def test_where_gte_lte(spark):
    g = _users(spark, [(1, "Alice", 85, None), (2, "Bob", 90, None),
                       (3, "Charlie", 95, None)])
    df = execute_cypher(
        g, "MATCH (n:User) WHERE n.age >= 90 RETURN n.name AS name")
    assert {r["name"] for r in df.collect()} == {"Bob", "Charlie"}
    df2 = execute_cypher(
        g, "MATCH (n:User) WHERE n.age <= 90 RETURN n.name AS name")
    assert {r["name"] for r in df2.collect()} == {"Alice", "Bob"}


def test_where_ne(where_graph):
    df = execute_cypher(
        where_graph, "MATCH (n:User) WHERE n.city <> 'NYC' RETURN n.name AS name")
    assert [r["name"] for r in df.collect()] == ["Charlie"]


# ========== combined (core_features_test.rs:370-400) =======================

def test_update_with_transaction(spark):
    tx = TxManager()
    g = _users(spark, [(1, "Test", 0, None)])
    h = tx.begin_tx()
    tx.commit_tx(h)
    g2, ok = update_node_props(g, "User", 1, {"age": 1})
    assert ok and g2.nodes["User"].first()["age"] == 1


# ========== batch writes (batch_write_test.rs:12-151) ======================

def test_batch_vs_single_create_consistency(spark):
    """batch_write_test.rs:83-108: one batched create_nodes call yields
    the same ids and properties as sequential single creates."""
    from rs_graphdb_spark.operators.dml import create_nodes

    empty = lambda: PropertyGraph(nodes={"User": local_df(
        spark, [], "id long, uid long, name string")}, edges={})
    g_single = empty()
    for uid, name in [(1, "Test1"), (2, "Test2")]:
        g_single = create_nodes(
            g_single, "User",
            local_df(spark, [(uid, name)], "uid long, name string"), "uid")
    g_batch = create_nodes(
        empty(), "User",
        local_df(spark, [(1, "Test1"), (2, "Test2")], "uid long, name string"),
        "uid")
    rows_single = sorted(map(tuple, g_single.nodes["User"].collect()))
    rows_batch = sorted(map(tuple, g_batch.nodes["User"].collect()))
    assert rows_single == rows_batch and len(rows_batch) == 2


def test_batch_large_dataset(spark):
    """batch_write_test.rs:110-139: 1000 nodes in one batch, ids and
    props verifiable."""
    from rs_graphdb_spark.operators.dml import create_nodes
    from rs_graphdb_spark.graph import label_base

    g = PropertyGraph(nodes={"Node": local_df(
        spark, [], "id long, nid long, name string")}, edges={})
    rows = [(i, f"Node_{i}") for i in range(1000)]
    g = create_nodes(g, "Node",
                     local_df(spark, rows, "nid long, name string"), "nid")
    assert g.nodes["Node"].count() == 1000
    sample = {r["nid"]: (r["id"], r["name"])
              for r in g.nodes["Node"].filter("nid < 10").collect()}
    for i in range(10):
        assert sample[i] == (label_base("Node") + i, f"Node_{i}")


def test_batch_empty_dataset(spark):
    """batch_write_test.rs:141-151: empty batches are no-ops."""
    from rs_graphdb_spark.operators.dml import create_nodes

    g = PropertyGraph(nodes={"User": local_df(
        spark, [], "id long, uid long, name string")}, edges={})
    g2 = create_nodes(g, "User", local_df(spark, [], "uid long, name string"),
                      "uid")
    assert g2.nodes["User"].count() == 0


def test_adhoc_label_namespace_collision_raises():
    """Two ad-hoc labels hashing to one namespace index must fail loudly
    instead of silently interleaving node ids."""
    from rs_graphdb_spark import graph as G

    base = G.label_base("SomeAdhocLabel")
    assert base >= 64 * G.ID_STRIDE
    # same label re-registers fine
    assert G.label_base("SomeAdhocLabel") == base
    # force a synthetic collision through the registry
    idx = base // G.ID_STRIDE
    G._ADHOC_NAMESPACES[idx] = "OtherLabel"
    try:
        import pytest

        with pytest.raises(ValueError, match="namespace collision"):
            G.label_base("SomeAdhocLabel")
    finally:
        G._ADHOC_NAMESPACES[idx] = "SomeAdhocLabel"
