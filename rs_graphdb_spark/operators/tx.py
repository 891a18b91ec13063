"""Transaction-manager surface (`/root/reference/src/transactions/`):
handle lifecycle, operation log, snapshots, and savepoints.

What the reference actually provides — and what its scenarios pin
(`tests/transaction_test.rs`, `tests/core_features_test.rs:370-400`,
`tests/transaction_advanced_test.rs:80-246`) — is bookkeeping: begin
issues handles, commit/rollback succeed exactly once, operations are
recorded on an op log, snapshots are retained with an eviction cap, and
savepoints mark op-log positions. Its commit applies nothing (the op
log is advisory; its own comments call the tx "empty") and isolation
is lock-based machinery we deliberately do NOT reproduce: in the Spark
engine, the graph is immutable — every DML produces a NEW
PropertyGraph — so a "snapshot" is just a retained reference and
"rollback" is resuming from it. Locks, deadlock detection and isolation
levels (`transaction_advanced_test.rs:250-660`) are replaced by
batch-job atomicity of the Parquet/Delta write-back (SURVEY.md §2.11).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class TxError(RuntimeError):
    pass


#: the four accepted isolation levels (`src/transactions/transaction.rs`
#: ``IsolationLevel``; `tests/graph_transaction_test.rs:300-316` pins
#: that a transaction opened at EACH level commits cleanly). Recorded as
#: configuration metadata only — the lock machinery behind them is the
#: documented non-goal (module docstring).
ISOLATION_LEVELS = (
    "read_uncommitted",
    "read_committed",
    "repeatable_read",
    "serializable",
)


@dataclass
class TransactionConfig:
    """Builder-style transaction config
    (`src/transactions/transaction.rs` ``TransactionConfig``;
    `tests/graph_transaction_test.rs:119-135`): isolation level,
    snapshot flag, timeout seconds. ``with_*`` return self for
    chaining, like the reference's builder."""

    isolation_level: str = "read_committed"
    snapshot: bool = False
    timeout: int | None = None

    def with_isolation_level(self, level: str) -> "TransactionConfig":
        if level not in ISOLATION_LEVELS:
            raise ValueError(
                f"unknown isolation level {level!r}; one of {ISOLATION_LEVELS}"
            )
        self.isolation_level = level
        return self

    def with_snapshot(self, snapshot: bool) -> "TransactionConfig":
        self.snapshot = snapshot
        return self

    def with_timeout(self, seconds: int) -> "TransactionConfig":
        self.timeout = seconds
        return self


@dataclass
class Transaction:
    """One transaction's bookkeeping (`src/transactions/transaction.rs`)."""

    id: int
    status: str = "active"  # active | committed | rolled_back
    ops: list = field(default_factory=list)
    snapshot: object = None  # PropertyGraph reference at begin time
    savepoints: dict = field(default_factory=dict)  # name -> op index
    config: "TransactionConfig | None" = None

    def op_count(self) -> int:
        return len(self.ops)

    def is_completed(self) -> bool:
        return self.status != "active"


class TxManager:
    """Driver-side transaction registry: a few dicts, never a Spark job."""

    def __init__(self) -> None:
        self._next = 1
        self._txs: dict[int, Transaction] = {}
        self._completed: list[int] = []  # completion order, oldest first

    # -- lifecycle (`tests/transaction_test.rs:56-143`) -------------------
    def begin_tx(self, snapshot=None, config: TransactionConfig | None = None) -> int:
        """Open a transaction; optionally retain the current graph as its
        snapshot (immutable frames make this a reference, not a copy).
        ``config`` carries isolation level / snapshot flag / timeout
        (`tests/graph_transaction_test.rs:119-135` — recorded metadata;
        see module docstring for why levels are not lock-enforced)."""
        h = self._next
        self._next += 1
        self._txs[h] = Transaction(id=h, snapshot=snapshot, config=config)
        return h

    def begin_tx_with_config(self, config: TransactionConfig, snapshot=None) -> int:
        """Reference `db.begin_tx_with_config` parity."""
        return self.begin_tx(snapshot=snapshot, config=config)

    def _active(self, handle: int) -> Transaction:
        tx = self._txs.get(handle)
        if tx is None or tx.is_completed():
            raise TxError(f"unknown or closed transaction handle {handle}")
        return tx

    def commit_tx(self, handle: int) -> None:
        """Succeeds once per handle (double commit and unknown handles
        error, `tests/core_features_test.rs:59-86`)."""
        tx = self._active(handle)
        tx.status = "committed"
        self._completed.append(handle)

    def rollback_tx(self, handle: int):
        """Close the handle and return its snapshot graph (or None) —
        the caller resumes from the pre-transaction reference."""
        tx = self._active(handle)
        tx.status = "rolled_back"
        self._completed.append(handle)
        return tx.snapshot

    def is_open(self, handle: int) -> bool:
        tx = self._txs.get(handle)
        return tx is not None and not tx.is_completed()

    def open_count(self) -> int:
        return sum(1 for t in self._txs.values() if not t.is_completed())

    def active_ids(self) -> list[int]:
        """`tests/transaction_test.rs:398-412`."""
        return sorted(t.id for t in self._txs.values() if not t.is_completed())

    def status(self, handle: int) -> str | None:
        tx = self._txs.get(handle)
        return tx.status if tx else None

    def get_transaction(self, handle: int) -> Transaction | None:
        return self._txs.get(handle)

    # -- op log (`tests/transaction_test.rs:145-161,238-295`) -------------
    def record_op(self, handle: int, op) -> None:
        """Append one operation descriptor (any value; the reference uses
        an enum of CreateNode/DeleteNode/UpdateNode/CreateRel) to an OPEN
        transaction's log."""
        self._active(handle).ops.append(op)

    # -- completed-transaction retention (`:163-178`) ----------------------
    def completed_count(self) -> int:
        return len(self._completed)

    def cleanup_completed(self, keep: int) -> None:
        """Drop all but the most recent ``keep`` completed transactions."""
        drop = self._completed[:-keep] if keep > 0 else self._completed[:]
        for h in drop:
            self._txs.pop(h, None)
        self._completed = self._completed[-keep:] if keep > 0 else []

    # -- savepoints (`tests/transaction_advanced_test.rs:80-246`) ----------
    def savepoint(self, handle: int, name: str) -> None:
        """Mark the current op-log position; duplicate names error."""
        tx = self._active(handle)
        if name in tx.savepoints:
            raise TxError(f"savepoint {name!r} already exists")
        tx.savepoints[name] = len(tx.ops)

    def rollback_to_savepoint(self, handle: int, name: str) -> None:
        """Truncate the op log back to the savepoint; later savepoints
        are discarded (standard nested-savepoint semantics)."""
        tx = self._active(handle)
        if name not in tx.savepoints:
            raise TxError(f"savepoint {name!r} not found")
        pos = tx.savepoints[name]
        tx.ops = tx.ops[:pos]
        tx.savepoints = {n: p for n, p in tx.savepoints.items() if p <= pos}

    def release_savepoint(self, handle: int, name: str) -> None:
        """Forget the savepoint, keeping the ops recorded since it."""
        tx = self._active(handle)
        if name not in tx.savepoints:
            raise TxError(f"savepoint {name!r} not found")
        del tx.savepoints[name]


class SnapshotManager:
    """Retained graph snapshots with an eviction cap
    (`src/transactions/snapshot.rs`; `tests/transaction_test.rs:180-237,
    324-377`). A snapshot of an immutable PropertyGraph is a reference —
    the frames are lazy plans/checkpoints already, so retention is
    metadata, not data movement."""

    def __init__(self, max_snapshots: int) -> None:
        if max_snapshots < 1:
            raise ValueError("max_snapshots must be >= 1")
        self._max = max_snapshots
        self._next = 0
        self._snaps: dict[int, object] = {}
        self._order: list[int] = []

    def create_snapshot(self, graph=None) -> int:
        """Returns the new snapshot id (0, 1, 2, ...); the oldest is
        evicted beyond the cap."""
        sid = self._next
        self._next += 1
        self._snaps[sid] = graph
        self._order.append(sid)
        while len(self._order) > self._max:
            evict = self._order.pop(0)
            self._snaps.pop(evict, None)
        return sid

    def get(self, sid: int):
        """The snapshot's graph, or None if evicted/unknown. Use
        ``has`` to distinguish a retained None-graph snapshot."""
        return self._snaps.get(sid)

    def has(self, sid: int) -> bool:
        return sid in self._snaps

    def count(self) -> int:
        return len(self._snaps)

    def remove(self, sid: int) -> bool:
        if sid in self._snaps:
            del self._snaps[sid]
            self._order.remove(sid)
            return True
        return False

    def clear(self) -> None:
        self._snaps.clear()
        self._order.clear()

    def snapshot_ids(self) -> list[int]:
        return sorted(self._snaps)
