"""Cypher AST — the shape of the reference AST
(`/root/reference/src/cypher/ast.rs:4-219`) minus the fake-node
aggregation result and with optionality modeled for real execution.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# -- expressions -------------------------------------------------------------

@dataclass(frozen=True)
class Prop:
    """`var.key` (`src/cypher/ast.rs:93-98`)."""
    var: str
    key: str


@dataclass(frozen=True)
class Lit:
    value: object  # str | int | float | bool | None | list


@dataclass(frozen=True)
class Cmp:
    """Binary comparison (`src/cypher/ast.rs:77-91`); unlike the reference
    we compare all orderable types, not just Int pairs (quirk #5)."""
    op: str  # = <> > < >= <= =~ in
    left: object
    right: object


@dataclass(frozen=True)
class IsNull:
    expr: Prop
    negate: bool


@dataclass(frozen=True)
class Exists:
    expr: Prop


@dataclass(frozen=True)
class BoolOp:
    op: str  # and | or
    items: tuple


@dataclass(frozen=True)
class Not:
    item: object


# -- patterns ----------------------------------------------------------------

@dataclass(frozen=True)
class NodePattern:
    """`(var:Label {k: v})` (`src/cypher/ast.rs:39-43`)."""
    var: str
    label: str | None
    props: tuple  # ((key, literal), ...)


@dataclass(frozen=True)
class RelPattern:
    """`-[:TYPE*min..max]->` (`src/cypher/ast.rs:45-75`; var-length forms
    `src/cypher/parser.rs:151-175`)."""
    rel_type: str
    direction: str  # out | in | both
    min_hops: int = 1
    max_hops: int | None = 1  # None = unbounded


@dataclass(frozen=True)
class PatternPath:
    start: NodePattern
    hops: tuple  # ((RelPattern, NodePattern), ...)


@dataclass(frozen=True)
class MatchClause:
    """`src/cypher/ast.rs:32-36`; ``optional`` is honored here (quirk #4)."""
    paths: tuple
    optional: bool = False


# -- projection --------------------------------------------------------------

@dataclass(frozen=True)
class WithClause:
    """`WITH a, b.prop [AS alias] [WHERE ...]` — projects bindings and
    chains (`src/cypher/executor.rs:100-116`; the reference re-filters its
    single frontier, we keep the listed variables' columns). ``props``
    carries property projections ``(Prop, alias|None)`` — aliased ones
    become plain columns referencable by bare name downstream
    (`tests/with_clause_test.rs:127-183`)."""
    vars: tuple
    where: object = None
    props: tuple = ()


@dataclass(frozen=True)
class ReturnItem:
    """`src/cypher/ast.rs:117-127`; agg functions
    `src/cypher/parser.rs:362-412`."""
    expr: object  # Prop | str (bare variable) | Lit
    alias: str | None = None
    agg: str | None = None  # count|sum|avg|min|max|collect|stdev|stdevp|percentilecont|percentiledisc
    agg_param: float | None = None  # percentile q
    distinct: bool = False


@dataclass(frozen=True)
class OrderItem:
    key: str  # output-column name (alias) or var.key text
    asc: bool = True


# -- statements --------------------------------------------------------------

@dataclass(frozen=True)
class ReadQuery:
    matches: tuple = ()
    where: object = None
    items: tuple = ()
    ret_distinct: bool = False
    group_by: tuple = ()  # explicit GROUP BY props (reference extension)
    order_by: tuple = ()
    skip: int | None = None
    limit: int | None = None


@dataclass(frozen=True)
class UnionQuery:
    """`src/cypher/ast.rs:212-219`."""
    parts: tuple  # ReadQuery, ...
    all: bool = False


@dataclass(frozen=True)
class CreateStmt:
    """CREATE node chain (`src/cypher/ast.rs:130-140`)."""
    nodes: tuple  # NodePattern, ...


@dataclass(frozen=True)
class CreateRelStmt:
    """CREATE (a:L {..})-[:T]->(b:L {..}) — create both endpoint nodes
    AND the relationship (the reference's create-path form,
    `tests/cypher_delete_test.rs:41-45`)."""
    path: PatternPath


@dataclass(frozen=True)
class DeleteStmt:
    """MATCH ... DELETE var — cascades incident edges
    (`src/cypher/executor.rs:650-687`)."""
    match: MatchClause
    where: object
    var: str


@dataclass(frozen=True)
class SetStmt:
    """MATCH ... SET var.key = literal (`src/cypher/executor.rs:689-738`)."""
    match: MatchClause
    where: object
    var: str
    updates: tuple  # ((key, literal), ...)


@dataclass(frozen=True)
class ForeachStmt:
    """FOREACH (v IN [id, ...] | SET v.k = lit)
    (`src/cypher/executor.rs:1561-1623`): literal node-id list, SET each."""
    var: str
    ids: tuple
    updates: tuple  # ((key, literal), ...)


@dataclass(frozen=True)
class CallStmt:
    """CALL { subquery } RETURN ... (`src/cypher/ast.rs:199-210`,
    `src/cypher/executor.rs:1625-1650`): outer items select the inner
    result's output columns by name."""
    inner: object  # ReadQuery
    items: tuple = ()  # ReturnItem with expr = bare column-name strings
    order_by: tuple = ()
    skip: int | None = None
    limit: int | None = None
    #: `IN (v1, v2)` clause variables — recorded, executed as a no-op
    #: exactly like the reference (`tests/call_enhanced_test.rs:49-74`)
    input_vars: tuple = ()


@dataclass(frozen=True)
class MergeRelStmt:
    """MERGE (a:L {..})-[:T]->(b:L {..}) [ON CREATE SET r...] — ensure the
    edge exists between every matching endpoint pair
    (`src/cypher/executor.rs:861-1023` single-rel path). Endpoint nodes
    that match nothing are created from their pattern (reference
    `tests/merge_comprehensive_test.rs:222-237`); `Both` direction is
    rejected like reference CREATE (`src/cypher/executor.rs:610-648`).

    Chained paths `(a)-[:T1]->(b)-[:T2]->(c)` carry every hop
    (reference `tests/multi_rel_merge_exec_test.rs`): each node pattern
    is matched-or-created, then each hop edge is created iff absent.
    ``on_create_var``/``on_match_var`` record which pattern variable the
    SET clause names — a node variable updates that node table; any
    other variable targets the hop edges (single-hop form keeps its
    original edge-targeted behavior)."""
    path: PatternPath
    on_create: tuple = ()
    on_match: tuple = ()
    on_create_var: str | None = None
    on_match_var: str | None = None


@dataclass(frozen=True)
class MergeStmt:
    """MERGE (n:Label {k: v}) [ON CREATE SET ...] [ON MATCH SET ...]
    (`src/cypher/ast.rs:154-197`)."""
    node: NodePattern
    on_create: tuple = ()
    on_match: tuple = ()


@dataclass(frozen=True)
class TransactionStmt:
    """BEGIN / COMMIT / ROLLBACK — parsed for script compatibility
    (reference `src/cypher/parser.rs:962-997`). Executes as a no-op:
    batch-job atomicity replaces the reference's op-log transactions
    (SURVEY.md §2.11; even there commit/rollback only flip status,
    `src/transactions/transaction.rs:321-348`)."""

    kind: str  # "begin" | "commit" | "rollback"
