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

__all__ = ["profile"]

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
