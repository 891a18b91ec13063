"""Stateful Cypher session: scripted statements + transaction state.

The reference's executor holds transaction state on the database
(`db.active_transaction_count()`, scenarios
`/root/reference/tests/cypher_transaction_test.rs:96-260`): BEGIN pushes
a transaction, COMMIT/ROLLBACK complete the MOST RECENT one, and
completing without one is an error ("No active transaction").

This session reproduces that protocol and goes one step further than
the reference (whose transactions apply nothing): because every DML
here rewrites to a NEW PropertyGraph, BEGIN retains the current graph
as the transaction's snapshot and ROLLBACK actually restores it — the
in-flight statements' effects vanish. The stateless
:func:`~rs_graphdb_spark.cypher.execute_cypher` keeps its documented
no-op transaction behavior for single-statement use.
"""

from __future__ import annotations

from rs_graphdb_spark.cypher import ast
from rs_graphdb_spark.cypher.compiler import Compiler, CypherCompileError
from rs_graphdb_spark.cypher.parser import parse_cypher
from rs_graphdb_spark.graph import PropertyGraph
from rs_graphdb_spark.operators.tx import TxManager

#: status strings mirroring the reference's CypherResult transaction
#: variants (TransactionStarted / TransactionCommitted /
#: TransactionRolledBack)
TX_STARTED = "transaction_started"
TX_COMMITTED = "transaction_committed"
TX_ROLLED_BACK = "transaction_rolled_back"


class CypherSession:
    """Run statements against an evolving graph with tx tracking."""

    def __init__(self, graph: PropertyGraph) -> None:
        self.graph = graph
        self._tm = TxManager()
        self._stack: list[int] = []  # open tx handles, most recent last

    # -- protocol surface (`db.active_transaction_count` etc.) ------------
    def active_transaction_count(self) -> int:
        return len(self._stack)

    def completed_transaction_count(self) -> int:
        return self._tm.completed_count()

    # -- execution ---------------------------------------------------------
    def run(self, text: str):
        """Execute one statement. Returns a DataFrame for reads, the
        new PropertyGraph for DML, or a TX_* status string for
        transaction statements."""
        stmt = parse_cypher(text)
        if isinstance(stmt, ast.TransactionStmt):
            return self._run_tx(stmt)
        result = Compiler(self.graph).run(stmt)
        if isinstance(result, PropertyGraph):
            if self._stack:
                # record the statement on the innermost open transaction
                self._tm.record_op(self._stack[-1], text)
            self.graph = result
            return result
        return result

    def _run_tx(self, stmt: ast.TransactionStmt) -> str:
        if stmt.kind == "begin":
            h = self._tm.begin_tx(snapshot=self.graph)
            self._stack.append(h)
            return TX_STARTED
        if not self._stack:
            raise CypherCompileError(f"No active transaction to {stmt.kind}")
        h = self._stack.pop()
        if stmt.kind == "commit":
            self._tm.commit_tx(h)
            return TX_COMMITTED
        restored = self._tm.rollback_tx(h)
        if restored is not None:
            self.graph = restored
        return TX_ROLLED_BACK
