"""DML as DataFrame rewrites (SURVEY.md §2.10).

The reference mutates stores in place (CREATE/DELETE/SET/MERGE,
`/root/reference/src/cypher/executor.rs:610-1211`); the Spark-native
equivalent is a *rewrite*: each operation produces new node/edge
DataFrames (write them back as Parquet/Delta for persistence — batch-job
atomicity replaces the reference's op-log transactions, SURVEY.md §2.11).
"""

from __future__ import annotations

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
    return dc_replace(graph, nodes=nodes)


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
