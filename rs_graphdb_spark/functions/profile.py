"""Single-pass data profiling (the ANALYZE / input-validation step a
100 TB ingest runs before anything else).

``profile`` computes per-column stats for the requested columns in ONE
aggregation job — every statistic is an expression in a single ``agg``,
then the wide row is unpivoted driver-side via ``stack``. No per-column
scans, no driver loop over columns.

Distinct counts are exact here (count(DISTINCT) — Spark plans the
multi-distinct via one Expand, still a single scan) because the DuckDB
oracle must reproduce them bit-for-bit; at 100 TB swap in
``approx_count_distinct`` (HLL) — same plan shape, one pass, bounded
memory — which is why the column is named ``n_distinct`` and not tied to
an algorithm.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["profile", "kmv_sketch", "kmv_estimate", "kmv_merge"]

_NUMERIC = (T.LongType, T.IntegerType, T.ShortType, T.ByteType,
            T.DoubleType, T.FloatType, T.DecimalType)


def profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column stats: (col_name, n, n_null, n_distinct, min_num,
    max_num, min_str, max_str). Numeric min/max land in ``*_num``
    (DOUBLE), string min/max in ``*_str``; the other pair is NULL."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs = []
    for c in cols:
        is_num = isinstance(fields[c], _NUMERIC)
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nn"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            (F.min(c).cast("double") if is_num else F.lit(None).cast("double")
             ).alias(f"{c}__minn"),
            (F.max(c).cast("double") if is_num else F.lit(None).cast("double")
             ).alias(f"{c}__maxn"),
            (F.lit(None).cast("string") if is_num else F.min(c)
             ).alias(f"{c}__mins"),
            (F.lit(None).cast("string") if is_num else F.max(c)
             ).alias(f"{c}__maxs"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__n`, `{c}__nn`, `{c}__nd`, `{c}__minn`, `{c}__maxn`,"
        f" `{c}__mins`, `{c}__maxs`"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args})"
            " as (col_name, n, n_null, n_distinct,"
            " min_num, max_num, min_str, max_str)"
        )
    )


# -- KMV distinct-count sketch ----------------------------------------------
# The k-minimum-values sketch (Bar-Yossef et al.): hash every value into
# [0, 1), keep the k smallest hashes; with the k-th smallest at h_k the
# distinct count is ~ (k-1)/h_k. Bounded size (k rows), mergeable (union
# then re-take k smallest), single-pass. Unlike HLL registers, a KMV built
# on md5 is DETERMINISTIC — the DuckDB oracle reproduces the sketch rows
# bit-for-bit, which is the engine-wide contract for result-visible values.

_KMV_M = float(1 << 32)  # md5_long domain


def kmv_sketch(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """Build the sketch: the k smallest 32-bit md5 hashes of the column's
    distinct values, as rows (rank, h). One scan; the k-smallest is
    TakeOrdered (per-partition top-k, then merge — never a full sort)."""
    from pyspark.sql import Window

    from rs_graphdb_spark.functions.dedup import md5_long

    hashes = (
        df.select(F.col(col).cast("string").alias("v"))
        .where(F.col("v").isNotNull())
        .distinct()
        .select(md5_long(F.col("v")).alias("h"))
        .distinct()  # hash collisions collapse, exactly as in the estimator
        .orderBy("h")
        .limit(k)
    )
    w = Window.orderBy("h")
    return hashes.withColumn("rank", F.row_number().over(w)).select("rank", "h")


def kmv_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """Distinct-count estimate from a sketch: (k-1)/(h_k/M) when the
    sketch is full, else the exact count of sketch rows (fewer distinct
    values than k → the sketch IS the distinct set)."""
    agg = sketch.agg(
        F.count("*").alias("n_rows"), F.max("h").alias("h_k")
    )
    return agg.select(
        F.when(
            F.col("n_rows") >= k,
            F.round((F.lit(float(k - 1))) / (F.col("h_k") / F.lit(_KMV_M)), 4),
        ).otherwise(F.col("n_rows").cast("double")).alias("estimate"),
        "n_rows", "h_k",
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Merge two sketches: union, dedup, re-take the k smallest — the
    sketch of the UNION of the underlying sets, exactly."""
    from pyspark.sql import Window

    merged = (
        a.select("h").unionByName(b.select("h")).distinct().orderBy("h").limit(k)
    )
    w = Window.orderBy("h")
    return merged.withColumn("rank", F.row_number().over(w)).select("rank", "h")
