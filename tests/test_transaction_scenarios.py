"""The reference's transaction-manager scenarios, ported 1:1.

Sources: `/root/reference/tests/transaction_test.rs` (manager lifecycle,
op log, completed-retention, snapshot manager) and
`tests/transaction_advanced_test.rs:80-246` (savepoints). Locks,
deadlock detection, timeouts and isolation levels
(`transaction_advanced_test.rs:250-660`) are NOT reproduced: the Spark
engine's graphs are immutable and durability is batch-job atomicity
(SURVEY.md §2.11) — a snapshot is a retained reference and rollback is
resuming from it, which these scenarios demonstrate end-to-end.
"""

from __future__ import annotations

import pytest

from rs_graphdb_spark.graph import PropertyGraph
from rs_graphdb_spark.operators.dml import update_node_props
from rs_graphdb_spark.operators.tx import SnapshotManager, TxError, TxManager
from rs_graphdb_spark.session import local_df


# ============== manager lifecycle (transaction_test.rs:56-143) =============

def test_transaction_manager_begin():
    tm = TxManager()
    h = tm.begin_tx()
    assert tm.is_open(h) and tm.status(h) == "active"


def test_transaction_manager_multiple_transactions():
    tm = TxManager()
    hs = [tm.begin_tx() for _ in range(3)]
    assert len(set(hs)) == 3
    assert tm.active_ids() == sorted(hs)


def test_transaction_commit():
    tm = TxManager()
    h = tm.begin_tx()
    tm.commit_tx(h)
    assert tm.status(h) == "committed" and not tm.is_open(h)


def test_transaction_rollback():
    tm = TxManager()
    h = tm.begin_tx()
    tm.rollback_tx(h)
    assert tm.status(h) == "rolled_back" and not tm.is_open(h)


def test_transaction_commit_not_found():
    with pytest.raises(TxError):
        TxManager().commit_tx(42)


def test_transaction_rollback_not_found():
    with pytest.raises(TxError):
        TxManager().rollback_tx(42)


def test_transaction_double_commit():
    tm = TxManager()
    h = tm.begin_tx()
    tm.commit_tx(h)
    with pytest.raises(TxError):
        tm.commit_tx(h)


# ============== op log (transaction_test.rs:145-161,238-295) ===============

def test_transaction_record_op():
    tm = TxManager()
    h = tm.begin_tx()
    tm.record_op(h, ("create_node", 1, ["Test"], {}))
    assert tm.get_transaction(h).op_count() == 1


def test_transaction_op_shapes():
    """:238-295: the four op kinds are all recordable."""
    tm = TxManager()
    h = tm.begin_tx()
    tm.record_op(h, ("create_node", 1, ["Test"], {"name": "A"}))
    tm.record_op(h, ("delete_node", 1))
    tm.record_op(h, ("update_node", 1, {"name": "B"}))
    tm.record_op(h, ("create_rel", 1, 2, 3, "TEST_REL", {}))
    assert tm.get_transaction(h).op_count() == 4


def test_record_op_on_closed_tx_fails():
    tm = TxManager()
    h = tm.begin_tx()
    tm.commit_tx(h)
    with pytest.raises(TxError):
        tm.record_op(h, ("create_node", 1, [], {}))


def test_transaction_cleanup_completed():
    """transaction_test.rs:163-178: keep the most recent 3 of 5."""
    tm = TxManager()
    for _ in range(5):
        tm.commit_tx(tm.begin_tx())
    assert tm.completed_count() == 5
    tm.cleanup_completed(3)
    assert tm.completed_count() == 3


def test_transaction_status_and_is_completed():
    """transaction_test.rs:296-312."""
    tm = TxManager()
    h = tm.begin_tx()
    assert not tm.get_transaction(h).is_completed()
    tm.commit_tx(h)
    assert tm.get_transaction(h).is_completed()


def test_transaction_active_ids():
    """transaction_test.rs:398-412: only open handles listed."""
    tm = TxManager()
    h1, h2, h3 = tm.begin_tx(), tm.begin_tx(), tm.begin_tx()
    tm.commit_tx(h2)
    assert tm.active_ids() == sorted([h1, h3])


# ============== snapshots (transaction_test.rs:180-237,324-377) ============

def test_snapshot_manager_ids_and_count():
    sm = SnapshotManager(5)
    assert sm.create_snapshot() == 0
    assert sm.create_snapshot() == 1
    assert sm.count() == 2


def test_snapshot_manager_max_limit():
    """:223-237: only the newest two survive a cap of 2."""
    sm = SnapshotManager(2)
    sm.create_snapshot()
    sm.create_snapshot()
    sm.create_snapshot()
    assert sm.count() == 2
    assert not sm.has(0) and sm.has(1) and sm.has(2)


def test_snapshot_manager_remove_and_clear():
    """:339-377."""
    sm = SnapshotManager(5)
    sm.create_snapshot()
    sm.create_snapshot()
    assert sm.remove(0) is True
    assert sm.remove(0) is False
    assert sm.snapshot_ids() == [1]
    sm.clear()
    assert sm.count() == 0 and sm.snapshot_ids() == []


def test_snapshot_rollback_resumes_pre_tx_graph(spark):
    """The Spark-native rollback: the snapshot reference IS the
    pre-transaction state (immutable frames), so resuming from it
    undoes the in-flight rewrite."""
    g0 = PropertyGraph(nodes={"User": local_df(
        spark, [(1, "Alice", 0)], "id long, name string, counter long")},
        edges={})
    tm = TxManager()
    h = tm.begin_tx(snapshot=g0)
    g1, ok = update_node_props(g0, "User", 1, {"counter": 99})
    assert ok and g1.nodes["User"].first()["counter"] == 99
    tm.record_op(h, ("update_node", 1, {"counter": 99}))
    restored = tm.rollback_tx(h)
    assert restored is g0
    assert restored.nodes["User"].first()["counter"] == 0


# ============== savepoints (transaction_advanced_test.rs:80-246) ===========

def test_savepoint_create():
    tm = TxManager()
    h = tm.begin_tx()
    tm.record_op(h, ("create_node", 1, ["Test"], {}))
    tm.savepoint(h, "sp1")
    assert "sp1" in tm.get_transaction(h).savepoints


def test_savepoint_duplicate():
    tm = TxManager()
    h = tm.begin_tx()
    tm.savepoint(h, "sp1")
    with pytest.raises(TxError, match="already exists"):
        tm.savepoint(h, "sp1")


def test_savepoint_rollback():
    """:120-162: rollback truncates the op log to the mark."""
    tm = TxManager()
    h = tm.begin_tx()
    tm.record_op(h, ("create_node", 1, ["Test"], {}))
    tm.savepoint(h, "sp1")
    tm.record_op(h, ("create_node", 2, ["Test"], {}))
    tm.record_op(h, ("create_node", 3, ["Test"], {}))
    assert tm.get_transaction(h).op_count() == 3
    tm.rollback_to_savepoint(h, "sp1")
    assert tm.get_transaction(h).op_count() == 1


def test_savepoint_not_found():
    tm = TxManager()
    h = tm.begin_tx()
    with pytest.raises(TxError, match="not found"):
        tm.rollback_to_savepoint(h, "nonexistent")


def test_savepoint_release():
    tm = TxManager()
    h = tm.begin_tx()
    tm.savepoint(h, "sp1")
    tm.release_savepoint(h, "sp1")
    assert "sp1" not in tm.get_transaction(h).savepoints
    with pytest.raises(TxError):
        tm.release_savepoint(h, "sp1")


def test_savepoint_multiple():
    """:198-246: rolling back to sp1 discards sp2 and later ops."""
    tm = TxManager()
    h = tm.begin_tx()
    tm.record_op(h, ("create_node", 1, ["Test"], {}))
    tm.savepoint(h, "sp1")
    tm.record_op(h, ("create_node", 2, ["Test"], {}))
    tm.savepoint(h, "sp2")
    tm.record_op(h, ("create_node", 3, ["Test"], {}))
    tx = tm.get_transaction(h)
    assert tx.op_count() == 3 and len(tx.savepoints) == 2
    tm.rollback_to_savepoint(h, "sp1")
    assert tx.op_count() == 1
    assert "sp1" in tx.savepoints and "sp2" not in tx.savepoints


def test_transaction_with_config():
    """graph_transaction_test.rs:119-135: builder config (isolation
    level, snapshot flag, timeout) rides the transaction."""
    from rs_graphdb_spark.operators.tx import TransactionConfig, TxManager

    mgr = TxManager()
    cfg = (TransactionConfig()
           .with_isolation_level("serializable")
           .with_snapshot(True)
           .with_timeout(60))
    h = mgr.begin_tx_with_config(cfg)
    assert mgr.open_count() == 1
    tx = mgr.get_transaction(h)
    assert tx.config.isolation_level == "serializable"
    assert tx.config.snapshot is True and tx.config.timeout == 60
    mgr.commit_tx(h)
    assert mgr.open_count() == 0


def test_transaction_all_isolation_levels():
    """graph_transaction_test.rs:300-316: a transaction opened at each of
    the four isolation levels commits cleanly."""
    from rs_graphdb_spark.operators.tx import (
        ISOLATION_LEVELS, TransactionConfig, TxManager)

    mgr = TxManager()
    for level in ISOLATION_LEVELS:
        h = mgr.begin_tx_with_config(
            TransactionConfig().with_isolation_level(level))
        mgr.commit_tx(h)
    assert mgr.completed_count() == 4


def test_transaction_config_rejects_unknown_level():
    from rs_graphdb_spark.operators.tx import TransactionConfig

    import pytest

    with pytest.raises(ValueError):
        TransactionConfig().with_isolation_level("chaos")
