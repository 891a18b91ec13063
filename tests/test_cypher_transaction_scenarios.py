"""The reference's Cypher-transaction scenarios, ported 1:1.

Source: `/root/reference/tests/cypher_transaction_test.rs` — BEGIN /
COMMIT / ROLLBACK parsing (covered by the parser's TransactionStmt) and
the executor's transaction-state protocol, run here through
`CypherSession`. Our ROLLBACK additionally restores the snapshot graph
(the reference's transactions apply nothing, so it has nothing to
restore) — pinned by the last test as a documented superset.
"""

from __future__ import annotations

import pytest

from rs_graphdb_spark.cypher.compiler import CypherCompileError
from rs_graphdb_spark.cypher.parser import parse_cypher
from rs_graphdb_spark.cypher.session import (
    TX_COMMITTED,
    TX_ROLLED_BACK,
    TX_STARTED,
    CypherSession,
)
from rs_graphdb_spark.cypher import ast
from rs_graphdb_spark.graph import PropertyGraph
from rs_graphdb_spark.session import local_df


def _session(spark, rows=()):
    g = PropertyGraph(nodes={"Person": local_df(
        spark, list(rows), "id long, name string")}, edges={})
    return CypherSession(g)


# ============== parsing (cypher_transaction_test.rs:11-94) =================

def test_parse_begin_commit_rollback():
    for text, kind in [("BEGIN", "begin"), ("COMMIT", "commit"),
                       ("ROLLBACK", "rollback"),
                       ("BEGIN TRANSACTION", "begin")]:
        stmt = parse_cypher(text)
        assert isinstance(stmt, ast.TransactionStmt) and stmt.kind == kind


def test_parse_transaction_with_whitespace():
    """:77-94: surrounding whitespace and case variations parse."""
    for text in ("  BEGIN  ", "commit", "Rollback"):
        assert isinstance(parse_cypher(text.strip()), ast.TransactionStmt)


# ============== execution protocol (:96-193) ================================

def test_execute_begin_transaction(spark):
    s = _session(spark)
    assert s.active_transaction_count() == 0
    assert s.run("BEGIN") == TX_STARTED
    assert s.active_transaction_count() == 1


def test_execute_commit_transaction(spark):
    s = _session(spark)
    s.run("BEGIN")
    assert s.run("COMMIT") == TX_COMMITTED
    assert s.active_transaction_count() == 0
    assert s.completed_transaction_count() == 1


def test_execute_rollback_transaction(spark):
    s = _session(spark)
    s.run("BEGIN")
    assert s.run("ROLLBACK") == TX_ROLLED_BACK
    assert s.active_transaction_count() == 0
    assert s.completed_transaction_count() == 1


def test_commit_without_active_transaction(spark):
    s = _session(spark)
    with pytest.raises(CypherCompileError, match="No active transaction"):
        s.run("COMMIT")


def test_rollback_without_active_transaction(spark):
    s = _session(spark)
    with pytest.raises(CypherCompileError, match="No active transaction"):
        s.run("ROLLBACK")


# ============== combined (:195-260) =========================================

def test_full_transaction_lifecycle(spark):
    """BEGIN TRANSACTION → CREATE → COMMIT; the write persists."""
    s = _session(spark)
    s.run("BEGIN TRANSACTION")
    assert s.active_transaction_count() == 1
    s.run("CREATE (n:Person {name: 'Alice'})")
    s.run("COMMIT")
    assert s.active_transaction_count() == 0
    assert s.graph.nodes["Person"].count() == 1


def test_multiple_transactions(spark):
    """:217-235: nested BEGINs; COMMIT completes the most recent."""
    s = _session(spark)
    s.run("BEGIN")
    s.run("BEGIN")
    assert s.active_transaction_count() == 2
    s.run("COMMIT")
    assert s.active_transaction_count() == 1


def test_rollback_then_begin_new(spark):
    """:237-260."""
    s = _session(spark)
    s.run("BEGIN")
    s.run("ROLLBACK")
    assert s.active_transaction_count() == 0
    s.run("BEGIN")
    assert s.active_transaction_count() == 1


def test_rollback_restores_snapshot_graph(spark):
    """Superset of the reference: statements inside a rolled-back
    transaction leave no trace; committed ones persist."""
    s = _session(spark)
    s.run("BEGIN")
    s.run("CREATE (n:Person {name: 'Ghost'})")
    assert s.graph.nodes["Person"].count() == 1
    s.run("ROLLBACK")
    assert s.graph.nodes["Person"].count() == 0  # restored
    s.run("BEGIN")
    s.run("CREATE (n:Person {name: 'Alice'})")
    s.run("COMMIT")
    assert [r["name"] for r in s.graph.nodes["Person"].collect()] == ["Alice"]
