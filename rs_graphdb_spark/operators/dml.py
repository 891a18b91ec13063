"""DML as DataFrame rewrites (SURVEY.md §2.10).

The reference mutates stores in place (CREATE/DELETE/SET/MERGE,
`/root/reference/src/cypher/executor.rs:610-1211`); the Spark-native
equivalent is a *rewrite*: each operation produces new node/edge
DataFrames (write them back as Parquet/Delta for persistence — batch-job
atomicity replaces the reference's op-log transactions, SURVEY.md §2.11).
"""

from __future__ import annotations

from dataclasses import dataclass
from dataclasses import replace as dc_replace

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rs_graphdb_spark.graph import PropertyGraph, label_base


def create_nodes(
    graph: PropertyGraph, label: str, rows: DataFrame, key_col: str
) -> PropertyGraph:
    """CREATE (`src/cypher/executor.rs:610-648`): append rows to a label
    table. Ids are assigned from the natural key (arithmetic, shuffle-free);
    the reference's dense sequential counter (`src/storage/mem_store.rs:
    56-57`) is documented divergence (SURVEY.md §7 hard-point 4)."""
    with_id = rows.select(
        (F.lit(label_base(label)) + F.col(key_col).cast("long")).alias("id"), "*"
    )
    nodes = dict(graph.nodes)
    nodes[label] = graph.nodes[label].unionByName(with_id, allowMissingColumns=True)
    # edge_integrity cleared (r10 ADVICE #1): a colliding natural key
    # mints a DUPLICATE id here (no uniqueness validation — contrast
    # merge_nodes, which anti-joins against existing keys), breaking the
    # unique-id premise of the hop-join elision. The flag only gates an
    # optimization, so clearing it costs nothing but the narrow-frame
    # shortcut on post-create graphs.
    return dc_replace(graph, nodes=nodes, edge_integrity=False)


def delete_nodes(graph: PropertyGraph, label: str, cond: Column) -> PropertyGraph:
    """DELETE with cascade to incident edges
    (`src/cypher/executor.rs:650-687`; cascade `src/storage/mem_store.rs:
    123-147`): anti-join the victims out of the label table and out of
    every edge set touching that label."""
    victims = graph.nodes[label].filter(cond).select("id")
    nodes = dict(graph.nodes)
    # Survivors via left_anti on the victim set, NOT filter(~cond): a NULL
    # predicate (nullable property) must keep the row, matching the Cypher
    # executor's three-valued WHERE semantics.
    nodes[label] = graph.nodes[label].join(victims, "id", "left_anti")
    edges = {}
    for rel, es in graph.edges.items():
        df = es.df
        if es.src_label == label:
            df = df.join(victims.withColumnRenamed("id", "src"), "src", "left_anti")
        if es.dst_label == label:
            df = df.join(victims.withColumnRenamed("id", "dst"), "dst", "left_anti")
        edges[rel] = dc_replace(es, df=df)
    return dc_replace(graph, nodes=nodes, edges=edges)


def set_props(df: DataFrame, cond: Column, updates: dict[str, Column]) -> DataFrame:
    """SET under a match predicate (`src/cypher/executor.rs:689-738`):
    merge-not-replace property semantics (`src/storage/mem_store.rs:
    313-325`) → conditional column rewrite."""
    out = df
    for col_name, value in updates.items():
        base = F.col(col_name) if col_name in df.columns else F.lit(None)
        out = out.withColumn(col_name, F.when(cond, value).otherwise(base))
    return out


def merge_nodes(
    graph: PropertyGraph,
    label: str,
    key_col: str,
    incoming: DataFrame,
    on_create: dict[str, Column] | None = None,
    on_match: dict[str, Column] | None = None,
) -> PropertyGraph:
    """MERGE (`src/cypher/executor.rs:740-1211`): match by key else create,
    with ON CREATE SET / ON MATCH SET — left-anti to find the missing
    pattern instances, conditional update on the matched ones."""
    existing = graph.nodes[label]
    # MERGE key semantics: one pattern instance per key — duplicate incoming
    # keys would multiply matched rows through the flag join and mint
    # duplicate ids in the created branch.
    incoming = incoming.dropDuplicates([key_col])
    matched_keys = incoming.select(key_col).join(
        existing.select(key_col), key_col, "left_semi"
    )
    to_create = incoming.join(existing.select(key_col), key_col, "left_anti")
    if on_create:
        for c, v in on_create.items():
            to_create = to_create.withColumn(c, v)
    created = to_create.select(
        (F.lit(label_base(label)) + F.col(key_col).cast("long")).alias("id"), "*"
    )
    # ON MATCH applied via join flag (no driver-side collect)
    flag = matched_keys.withColumn("__matched", F.lit(True))
    updated = existing.join(flag, key_col, "left")
    if on_match:
        for c, v in on_match.items():
            updated = updated.withColumn(
                c, F.when(F.col("__matched"), v).otherwise(F.col(c))
            )
    updated = updated.drop("__matched")
    nodes = dict(graph.nodes)
    nodes[label] = updated.unionByName(created, allowMissingColumns=True)
    return dc_replace(graph, nodes=nodes)


def update_node_props(
    graph: PropertyGraph, label: str, node_id: int, props: dict
) -> tuple[PropertyGraph, bool]:
    """Storage-layer update API (`src/storage/mem_store.rs:313-325` via
    ``db.update_node_props``, scenarios
    `tests/core_features_test.rs:91-135`): MERGE-not-replace the given
    properties onto one node. Returns (new graph, whether the node
    existed) — the reference returns ``bool``; updating a nonexistent id
    is a no-op reporting False."""
    if label not in graph.nodes:
        return graph, False
    df = graph.nodes[label]
    cond = F.col("id") == F.lit(node_id)
    if df.filter(cond).isEmpty():
        return graph, False
    updated = set_props(df, cond, {k: F.lit(v) for k, v in props.items()})
    nodes = dict(graph.nodes)
    nodes[label] = updated
    return dc_replace(graph, nodes=nodes), True


def update_rel_props(
    graph: PropertyGraph, rel_type: str, edge_id: int, props: dict
) -> tuple[PropertyGraph, bool]:
    """Relationship twin of :func:`update_node_props`
    (`tests/core_features_test.rs:131-170`)."""
    if rel_type not in graph.edges:
        return graph, False
    es = graph.edges[rel_type]
    cond = F.col("edge_id") == F.lit(edge_id)
    if es.df.filter(cond).isEmpty():
        return graph, False
    updated = set_props(es.df, cond, {k: F.lit(v) for k, v in props.items()})
    edges = dict(graph.edges)
    edges[rel_type] = dc_replace(es, df=updated)
    return dc_replace(graph, edges=edges), True


# -- constraints (`src/constraints/mod.rs:14-52,143-213`) -------------------

def unique_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """UNIQUE(label, props) validation job: value tuples appearing >1×."""
    return (
        df.groupBy(*cols)
        .agg(F.count("*").alias("n_dup"))
        .filter(F.col("n_dup") > 1)
    )


def existence_violations(df: DataFrame, col_name: str) -> DataFrame:
    """EXISTS(label, prop) validation job: rows missing the property."""
    return df.filter(F.col(col_name).isNull())


@dataclass(frozen=True)
class Constraint:
    """One declared constraint (`src/constraints/mod.rs:14-52`)."""

    label: str
    prop: str
    kind: str  # "uniqueness" | "existence"

    @classmethod
    def uniqueness(cls, label: str, prop: str) -> "Constraint":
        return cls(label=label, prop=prop, kind="uniqueness")

    @classmethod
    def existence(cls, label: str, prop: str) -> "Constraint":
        return cls(label=label, prop=prop, kind="existence")


class ConstraintRegistry:
    """Declared-constraint catalog + validation jobs
    (`src/constraints/mod.rs:54-213`, scenarios
    `tests/constraints_test.rs`). The registry itself is driver-side
    metadata (a handful of (label, prop, kind) rows — the reference
    keeps the same in a HashMap); every validation is a Spark job over
    the label table, so it holds at any table size.

    Semantics pinned by the reference scenarios:
    - duplicate ``add_constraint`` raises ("already exists");
    - ``drop_constraint`` returns whether anything was removed;
    - NULL values never violate uniqueness (two rows missing the
      property are NOT duplicates — `tests/constraints_test.rs:341-365`,
      ANSI-unique semantics) but DO violate existence;
    - constraints only apply to their own label."""

    def __init__(self) -> None:
        self._constraints: list[Constraint] = []

    def add_constraint(self, c: Constraint) -> None:
        if c in self._constraints:
            raise ValueError(
                f"constraint {c.kind} on {c.label}.{c.prop} already exists"
            )
        self._constraints.append(c)

    def drop_constraint(self, label: str, prop: str, kind: str) -> bool:
        target = Constraint(label=label, prop=prop, kind=kind)
        if target in self._constraints:
            self._constraints.remove(target)
            return True
        return False

    def count(self) -> int:
        return len(self._constraints)

    def get_all_constraints(self) -> tuple[Constraint, ...]:
        return tuple(self._constraints)

    def get_constraints_for_label(self, label: str) -> tuple[Constraint, ...]:
        return tuple(c for c in self._constraints if c.label == label)

    def validate_node(
        self, graph: PropertyGraph, label: str, node_id: int
    ) -> str | None:
        """Validate ONE node against its label's constraints: None when
        valid, else the first violation message (the reference's
        ``ConstraintValidation::Violated { message }``,
        `src/constraints/mod.rs:143-213`). Point lookups on the id —
        cheap even on a large table (predicate-pushed scan)."""
        if label not in graph.nodes:
            return None
        df = graph.nodes[label]
        row = df.filter(F.col("id") == F.lit(node_id)).first()
        if row is None:
            return None
        for c in self.get_constraints_for_label(label):
            value = row[c.prop] if c.prop in df.columns else None
            if c.kind == "existence":
                if value is None:
                    return (
                        f"Existence constraint: node {node_id} is missing "
                        f"required property '{c.prop}'"
                    )
            elif value is not None:  # uniqueness; NULLs never collide
                n = (
                    df.filter(F.col(c.prop) == F.lit(value))
                    .limit(2)
                    .count()
                )
                if n > 1:
                    return (
                        f"Uniqueness constraint violated: duplicate value "
                        f"for '{c.prop}' on label '{c.label}'"
                    )
        return None

    def validate_all(self, graph: PropertyGraph) -> dict[Constraint, int]:
        """Set-at-a-time validation — the 100 TB shape: ONE aggregation
        job per constraint over the full label table (reusing
        :func:`unique_violations` / :func:`existence_violations`)
        instead of a per-node loop. Returns violation counts per
        constraint."""
        out: dict[Constraint, int] = {}
        for c in self._constraints:
            if c.label not in graph.nodes:
                out[c] = 0
                continue
            df = graph.nodes[c.label]
            if c.prop not in df.columns:
                out[c] = 0 if c.kind == "uniqueness" else df.count()
            elif c.kind == "uniqueness":
                out[c] = unique_violations(
                    df.filter(F.col(c.prop).isNotNull()), [c.prop]
                ).count()
            else:
                out[c] = existence_violations(df, c.prop).count()
        return out
