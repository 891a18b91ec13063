"""Physical layout helpers: the Spark analog of the reference's storage
structures.

- dual adjacency lists (`/root/reference/src/storage/mem_store.rs:30-31`)
  → TWO copies of the edge table, hash-partitioned by ``src`` and by
  ``dst``: a "give me the out-edges / in-edges of node X" probe becomes a
  partition-pruned scan of one bucket instead of a full-table scan.
- property indexes (`src/index.rs`, `src/index_composite.rs`) → the same
  trick on (label, property): partitioning/bucketing by the hot column IS
  the index at 100 TB; Parquet min/max footer stats handle the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rs_graphdb_spark.graph import EdgeSet

DEFAULT_BUCKETS = 32


def write_dual_adjacency(
    es: EdgeSet, path: str, n_buckets: int = DEFAULT_BUCKETS
) -> None:
    """Persist an edge set twice: partitioned by src-bucket and by
    dst-bucket. One extra write buys partition-pruned hops in BOTH
    directions forever after — exactly what the reference's paired
    outgoing/incoming HashMaps buy in memory."""
    df = es.df
    (
        df.withColumn("bucket", F.pmod(F.hash("src"), F.lit(n_buckets)))
        .write.mode("overwrite").partitionBy("bucket").parquet(f"{path}/by_src")
    )
    (
        df.withColumn("bucket", F.pmod(F.hash("dst"), F.lit(n_buckets)))
        .write.mode("overwrite").partitionBy("bucket").parquet(f"{path}/by_dst")
    )


def _bucket_of(node_id: int, n_buckets: int, spark: SparkSession) -> int:
    # same hash Spark used at write time (Murmur3) — computed via a 1-row plan
    return spark.range(1).select(
        F.pmod(F.hash(F.lit(node_id).cast("long")), F.lit(n_buckets)).alias("b")
    ).first()["b"]


def read_out_edges(
    spark: SparkSession, path: str, node_id: int,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Out-edges of one node via partition-pruned probe: the scan touches
    1/n_buckets of the data (check .explain() for PartitionFilters)."""
    b = _bucket_of(node_id, n_buckets, spark)
    return (
        spark.read.parquet(f"{path}/by_src")
        .filter((F.col("bucket") == b) & (F.col("src") == node_id))
        .drop("bucket")
    )


def read_in_edges(
    spark: SparkSession, path: str, node_id: int,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """In-edges of one node via the dst-partitioned copy."""
    b = _bucket_of(node_id, n_buckets, spark)
    return (
        spark.read.parquet(f"{path}/by_dst")
        .filter((F.col("bucket") == b) & (F.col("dst") == node_id))
        .drop("bucket")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side's key, replicate the
    small side across all salt values, join on (key, salt).

    The standard remedy when one hot key (a viral node, a stop-word term)
    would pin an entire shuffle partition on one executor — SURVEY.md
    "optimize for scale" checklist. AQE's skew-join splitting handles most
    cases adaptively; explicit salting is for joins AQE can't split
    (e.g. when the skewed side feeds an aggregation on the same key).

    ``small`` is replicated n_salts× — keep it the dimension side.
    """
    salted_big = big.withColumn("__salt", F.pmod(F.hash(F.rand(seed=7) * 1e6), F.lit(n_salts)))
    salts = big.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
    salted_small = small.crossJoin(F.broadcast(salts))
    out = salted_big.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")


class CompositeIndexCatalog:
    """Declared composite indexes (`/root/reference/src/index_composite.rs`
    ``create_composite_index`` / ``find_by_composite_index`` /
    ``find_prefix`` / ``drop``; scenarios `tests/composite_index_test.rs`).

    The catalog itself is driver-side metadata, as in the reference. The
    PROBE is where Spark differs: an equality conjunction over the
    indexed properties is pushed into the parquet scan, and when the
    label table is written bucketed/partitioned by the leading column
    (see `sources/export.save_graph_bucketed`) the probe is
    partition-pruned — the q97 driver part asserts PartitionFilters on
    exactly this shape. Rows missing ANY indexed property are never
    matched (the reference skips them at index-build time,
    `tests/composite_index_test.rs:190-218`; SQL's NULL-never-equal gives
    the same result for free).
    """

    def __init__(self) -> None:
        self._indexes: dict[str, tuple[str, tuple[str, ...]]] = {}

    def create_composite_index(
        self, name: str, label: str, props: list[str]
    ) -> None:
        if len(props) < 2:
            raise ValueError("composite index needs at least two properties")
        self._indexes[name] = (label, tuple(props))

    def drop_composite_index(self, name: str) -> bool:
        return self._indexes.pop(name, None) is not None

    def index_for(self, label: str, props: list[str]) -> str | None:
        """Name of a declared index exactly covering (label, props)."""
        for name, (lb, ps) in self._indexes.items():
            if lb == label and ps == tuple(props):
                return name
        return None

    def index_stats(self, graph) -> tuple[int, int]:
        """(index count, total indexed entries) — the entry count is the
        rows with every indexed property present, computed set-at-a-time
        (`db.index_stats`, composite_index_test.rs:17-36)."""
        entries = 0
        for label, props in self._indexes.values():
            if label not in graph.nodes:
                continue
            df = graph.nodes[label]
            if any(p not in df.columns for p in props):
                continue
            cond = F.lit(True)
            for p in props:
                cond = cond & F.col(p).isNotNull()
            entries += df.filter(cond).count()
        return len(self._indexes), entries

    def find_by_composite_index(
        self, graph, label: str, props: list[str], values: list
    ) -> DataFrame:
        """Equality probe on every indexed property — requires the exact
        index to be declared, like the reference (which otherwise scans);
        returns the matching rows' ids."""
        if self.index_for(label, props) is None:
            raise KeyError(f"no composite index on {label}{props}")
        if len(values) != len(props):
            # zip would silently truncate, degrading a full-equality
            # probe into a prefix probe — find_prefix is the intentional
            # form for that
            raise ValueError(
                f"composite probe needs {len(props)} values, got "
                f"{len(values)} (use find_prefix for a prefix probe)"
            )
        df = graph.nodes[label]
        cond = F.lit(True)
        for p, v in zip(props, values):
            cond = cond & (
                (F.col(p) == F.lit(v)) if p in df.columns else F.lit(False)
            )
        return df.filter(cond).select("id")

    def find_prefix(
        self, graph, label: str, props: list[str], prefix_values: list
    ) -> DataFrame:
        """Leading-column prefix probe
        (`src/index_composite.rs:181-225`): equality on the first k
        indexed properties only. On a bucketed-by-leading-column layout
        this is the partition-pruned scan q97 asserts."""
        if self.index_for(label, props) is None:
            raise KeyError(f"no composite index on {label}{props}")
        if not prefix_values or len(prefix_values) > len(props):
            raise ValueError("prefix must cover 1..len(props) leading columns")
        df = graph.nodes[label]
        cond = F.lit(True)
        for p, v in zip(props[: len(prefix_values)], prefix_values):
            cond = cond & (
                (F.col(p) == F.lit(v)) if p in df.columns else F.lit(False)
            )
        return df.filter(cond).select("id")


def zorder_value(
    cols: list, mins: list[float], maxs: list[float], bits: int = 8
):
    """Morton (Z-order) key for up to a handful of numeric columns: each
    column is width-bucketed to ``2**bits`` cells over its [min, max]
    range, and the cell bits are INTERLEAVED — so rows close in EVERY
    dimension get close keys, and a range predicate on any participating
    column prunes parquet row groups after a sort by this key.

    Pure integer arithmetic (shift/AND/OR composition) — one codegen'd
    expression, no UDF; mins/maxs come from one bounded aggregate at
    write time (or table statistics at real scale).
    """
    n = len(cols)
    cells = []
    for c, lo, hi in zip(cols, mins, maxs):
        c = F.col(c) if isinstance(c, str) else c
        span = float(hi) - float(lo)
        if span <= 0:
            cells.append(F.lit(0).cast("long"))
            continue
        raw = F.floor(
            ((c.cast("double") - F.lit(float(lo))) / F.lit(span))
            * F.lit(float(1 << bits))
        ).cast("long")
        cells.append(F.least(F.lit((1 << bits) - 1), F.greatest(F.lit(0), raw)))
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for d, cell in enumerate(cells):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(cell, bit).bitwiseAND(F.lit(1)),
                    bit * n + d,
                )
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 32,
) -> None:
    """Persist ``df`` Z-ORDER clustered on ``cols``: range-partitioned +
    sorted by the Morton key, so every output file covers a compact
    hyper-rectangle and parquet min/max footer stats prune multi-column
    range queries that a single-column sort can only prune on ONE axis.
    The lakehouse OPTIMIZE ZORDER shape, as a plain write."""
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"_mn{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"_mx{i}") for i, c in enumerate(cols)],
    ).first()
    mins = [stats[f"_mn{i}"] for i in range(len(cols))]
    maxs = [stats[f"_mx{i}"] for i in range(len(cols))]
    (
        df.withColumn("_z", zorder_value(cols, mins, maxs, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
