"""Transaction-handle lifecycle (`/root/reference/src/storage/mod.rs`
``TxHandle`` + `src/transactions/transaction.rs:321-348`).

The reference's transactions carry NO isolation either — commit and
rollback only flip a status flag on the handle (its own test comments
say "当前实现中事务是空的" / the tx is empty and committed directly,
`tests/core_features_test.rs:370-400`). What IS behavioral, and what the
scenarios pin, is the HANDLE lifecycle: begin issues a fresh handle,
commit/rollback succeed exactly once, a second commit fails, an unknown
handle fails. This registry reproduces that lifecycle; durability in the
Spark engine comes from batch-job atomicity of the Parquet/Delta
write-back (SURVEY.md §2.11), not from these handles.
"""

from __future__ import annotations


class TxError(RuntimeError):
    pass


class TxManager:
    """Driver-side handle registry: a few ints, never a Spark job."""

    def __init__(self) -> None:
        self._next = 1
        self._open: set[int] = set()

    def begin_tx(self) -> int:
        h = self._next
        self._next += 1
        self._open.add(h)
        return h

    def commit_tx(self, handle: int) -> None:
        """Succeeds once per handle (`tests/core_features_test.rs:59-72`:
        double commit fails; :75-86: invalid handle fails)."""
        if handle not in self._open:
            raise TxError(f"unknown or closed transaction handle {handle}")
        self._open.remove(handle)

    def rollback_tx(self, handle: int) -> None:
        """Same lifecycle as commit; the graph is immutable-rewrite, so a
        rollback simply discards the handle (the caller keeps using the
        pre-transaction PropertyGraph object — rollback is keeping the
        old reference)."""
        if handle not in self._open:
            raise TxError(f"unknown or closed transaction handle {handle}")
        self._open.remove(handle)

    def is_open(self, handle: int) -> bool:
        return handle in self._open

    def open_count(self) -> int:
        return len(self._open)
