"""Partition-scoped DML over a persisted graph (r4 VERDICT item #5).

The lineage DML in :mod:`rs_graphdb_spark.operators.dml` rewrites a whole
table's lineage; persisting that result rewrites every file. At 100 TB a
DELETE hitting 0.1% of rows must NOT rewrite every partition — this
module stores each node/edge table hash-partitioned into a fixed number
of id buckets (``pb = pmod(id, n)``, a *partition column* in the dataset
layout) and rewrites ONLY the buckets that contain victims:

- victim buckets are found with one partition-pruned/column-pruned scan
  (for edges' dst side, a dst-column scan — the dst bucket is not the
  partition key, so membership is discovered, then still only the
  affected dirs are rewritten);
- each touched bucket is rewritten through a staging dir and swapped in
  with an atomic ``os.replace`` per bucket (the same staged-swap recipe
  as ``compact_minhash_index``); untouched bucket dirs keep their files
  byte-identical — pinned by test;
- the deterministic arithmetic bucket (``pmod(id, n)``) means the node
  table and every SRC-side edge table share victim buckets with no
  extra scan at all.

Cross-bucket atomicity is per-bucket (a reader racing the swap can see
bucket A new + bucket B old); a transactional table format (Delta or
Iceberg) replaces the swap with an ACID commit at production scale —
the plan shape (scoped anti-join per victim bucket) is identical.

Reference anchor: cascade semantics `src/storage/mem_store.rs:123-147`;
the in-place mutation this replaces is
`/root/reference/src/cypher/executor.rs:650-738`.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from rs_graphdb_spark.graph import EdgeSet, PropertyGraph

#: dataset partition column (lives in directory names, never in data files)
PB = "pb"


def _bucket(col: str | Column, n: int) -> Column:
    return F.pmod(F.col(col) if isinstance(col, str) else col, F.lit(n))


def save_graph_partitioned(
    graph: PropertyGraph, path: str, id_buckets: int = 16
) -> None:
    """Persist the graph with every table hash-partitioned into
    ``id_buckets`` dirs: nodes by ``pmod(id, n)``, edges by
    ``pmod(src, n)`` (the side the cascade can prune arithmetically).
    Layout: ``path/nodes/<Label>/pb=k/``, ``path/edges/<REL>/pb=k/`` +
    ``_meta.json`` recording the bucket count."""
    meta = {"nodes": sorted(graph.nodes), "edges": {}, "id_buckets": id_buckets}
    for label, df in graph.nodes.items():
        (
            df.withColumn(PB, _bucket("id", id_buckets))
            .repartition(id_buckets, PB)
            .write.mode("overwrite")
            .partitionBy(PB)
            .parquet(f"{path}/nodes/{label}")
        )
    for rt, es in graph.edges.items():
        (
            es.df.withColumn(PB, _bucket("src", id_buckets))
            .repartition(id_buckets, PB)
            .write.mode("overwrite")
            .partitionBy(PB)
            .parquet(f"{path}/edges/{rt}")
        )
        meta["edges"][rt] = {"src_label": es.src_label, "dst_label": es.dst_label}
    spark = next(iter(graph.nodes.values())).sparkSession
    spark.createDataFrame([(json.dumps(meta),)], "meta string").coalesce(
        1
    ).write.mode("overwrite").json(f"{path}/_meta")


def load_graph_partitioned(spark: SparkSession, path: str) -> PropertyGraph:
    """Reopen a partitioned graph; the ``pb`` partition column is dropped
    so query surfaces see the exact saved schema."""
    meta = json.loads(spark.read.json(f"{path}/_meta").first()["meta"])
    # mergeSchema: a SET that adds a new column rewrites only victim
    # buckets, so bucket schemas can legitimately differ by added
    # (NULL-elsewhere) columns
    rd = spark.read.option("mergeSchema", "true")
    g = PropertyGraph()
    for label in meta["nodes"]:
        g.nodes[label] = rd.parquet(f"{path}/nodes/{label}").drop(PB)
    for rt, info in meta["edges"].items():
        g.edges[rt] = EdgeSet(
            df=rd.parquet(f"{path}/edges/{rt}").drop(PB),
            src_label=info["src_label"],
            dst_label=info["dst_label"],
        )
    return g


def _meta(spark: SparkSession, path: str) -> dict:
    return json.loads(spark.read.json(f"{path}/_meta").first()["meta"])


def _rewrite_buckets(
    spark: SparkSession,
    table_dir: str,
    buckets: list[int],
    transform,
) -> None:
    """Rewrite ONLY the named ``pb=k`` dirs of one table in ONE Spark job:
    a partition-pruned scan of exactly those buckets, ``transform``
    (DataFrame -> DataFrame, PB rides along), one ``partitionBy(PB)``
    write to a staging dir, then an atomic ``os.replace`` swap per
    touched dir (sequential per-bucket jobs would serialize work that is
    embarrassingly parallel across buckets). A bucket whose rows all
    vanish has no staged dir — its old dir is removed (the partition
    disappears from the dataset, which parquet readers treat as simply
    absent)."""
    buckets = [
        k for k in buckets if os.path.exists(f"{table_dir}/{PB}={k}")
    ]
    if not buckets:
        return
    staging = f"{table_dir}/_staging-{uuid.uuid4().hex[:8]}"
    try:
        scoped = spark.read.parquet(table_dir).filter(
            F.col(PB).isin(buckets)
        )
        out = transform(scoped)
        (
            out.repartition(len(buckets), PB)
            .write.mode("overwrite").partitionBy(PB).parquet(staging)
        )
        for k in sorted(buckets):
            src_dir = f"{table_dir}/{PB}={k}"
            stage_k = f"{staging}/{PB}={k}"
            retired = f"{table_dir}/_old-{PB}={k}"
            shutil.rmtree(retired, ignore_errors=True)
            os.replace(src_dir, retired)
            if os.path.exists(stage_k):
                os.replace(stage_k, src_dir)
            shutil.rmtree(retired, ignore_errors=True)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def _victim_buckets(victims: DataFrame, col: str, n: int) -> list[int]:
    """Distinct ``pmod(col, n)`` values of the victim set — at most ``n``
    rows ever reach the driver."""
    return [
        r[0]
        for r in victims.select(_bucket(col, n).alias(PB)).distinct().collect()
    ]


def delete_nodes_partitioned(
    spark: SparkSession, path: str, label: str, cond: Column
) -> int:
    """DELETE with edge cascade, touching only victim buckets.

    1. one partition-pruned scan finds the victims (three-valued WHERE:
       survivors are the anti-join complement, so NULL predicates keep
       rows — same semantics as :func:`operators.dml.delete_nodes`);
    2. the node table and every SRC-side edge table rewrite exactly the
       victims' ``pmod(id, n)`` buckets (shared arithmetic — no scan);
    3. DST-side edge tables are partitioned by src, so victim dst
       buckets are discovered with one column-pruned dst scan, then only
       those dirs rewrite.

    Returns the number of deleted nodes."""
    meta = _meta(spark, path)
    n = meta["id_buckets"]
    node_dir = f"{path}/nodes/{label}"
    victims = (
        spark.read.parquet(node_dir).filter(cond).select("id")
        .localCheckpoint(eager=True)
    )
    n_victims = victims.count()
    if n_victims == 0:
        return 0
    vb = _victim_buckets(victims, "id", n)
    _rewrite_buckets(
        spark, node_dir, vb,
        lambda df: df.join(victims, "id", "left_anti"),
    )
    for rt, info in meta["edges"].items():
        edge_dir = f"{path}/edges/{rt}"
        if info["src_label"] == label:
            _rewrite_buckets(
                spark, edge_dir, vb,
                lambda df: df.join(
                    victims.withColumnRenamed("id", "src"), "src", "left_anti"
                ),
            )
        if info["dst_label"] == label:
            hit = (
                spark.read.parquet(edge_dir)
                .join(victims.withColumnRenamed("id", "dst"), "dst", "left_semi")
            )
            dst_vb = [r[0] for r in hit.select(PB).distinct().collect()]
            _rewrite_buckets(
                spark, edge_dir, dst_vb,
                lambda df: df.join(
                    victims.withColumnRenamed("id", "dst"), "dst", "left_anti"
                ),
            )
    return n_victims


def set_props_partitioned(
    spark: SparkSession,
    path: str,
    label: str,
    cond: Column,
    updates: dict[str, Column],
) -> int:
    """SET under a match predicate, rewriting only buckets that contain a
    matching row (merge-not-replace semantics, same conditional-column
    rewrite as :func:`operators.dml.set_props`). Returns matched count."""
    meta = _meta(spark, path)
    n = meta["id_buckets"]
    node_dir = f"{path}/nodes/{label}"
    matched = (
        spark.read.parquet(node_dir).filter(cond).select("id")
        .localCheckpoint(eager=True)
    )
    n_matched = matched.count()
    if n_matched == 0:
        return 0

    def _apply(df: DataFrame) -> DataFrame:
        out = df
        flag = matched.withColumn("__m", F.lit(True))
        out = out.join(flag, "id", "left")
        for col_name, value in updates.items():
            base = (
                F.col(col_name) if col_name in df.columns else F.lit(None)
            )
            out = out.withColumn(
                col_name, F.when(F.col("__m"), value).otherwise(base)
            )
        return out.drop("__m")

    _rewrite_buckets(
        spark, node_dir, _victim_buckets(matched, "id", n), _apply
    )
    return n_matched
