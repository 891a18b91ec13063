"""Viral-key as-of probe (PLANS.md): asof_join vs asof_join_bucketed.

Rebuilds the round-3 temporal skew fixture — 5M synthetic events, 50% of
ALL rows on ONE user, 1000 cold users — and times the plain per-key
union-merge as-of against the bucketed variant in each direction. Walls
are min-of-2 over a noop sink (full compute; a ``count()`` would let
Catalyst prune the window and time only the scan).

Usage: python tools/temporal_skew_probe.py [n_rows] [bucket_width]
Prints one markdown table row per (operator, direction) for PLANS.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    bucket_width = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000

    from rs_graphdb_spark.operators.temporal import asof_join, asof_join_bucketed
    from rs_graphdb_spark.session import get_spark

    spark = get_spark("temporal-skew-probe")

    # 50% of rows on user 0, rest uniform over 1000 users; ts uniform over
    # a horizon that gives ~100 buckets at the default width
    horizon = 50_000_000
    ev = spark.range(n_rows).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.hash("id"), F.lit(1000)))
        .cast("long")
        .alias("user_id"),
        F.pmod(F.hash(F.col("id") + 7), F.lit(horizon)).cast("long").alias("ts"),
        (F.col("id") % 97).cast("double").alias("value"),
    ).localCheckpoint(eager=True)
    left = ev.filter(F.col("event_id") % 2 == 0).localCheckpoint(eager=True)
    right = ev.filter(F.col("event_id") % 2 == 1).localCheckpoint(eager=True)
    print(f"fixture: {left.count()} probe rows, {right.count()} quote rows")

    def wall(fn):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            # noop sink: full compute, zero serialization to Python
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    for direction in ("backward", "forward", "nearest"):
        plain = wall(lambda: asof_join(
            left, right, ["user_id"], "ts", "ts",
            value_cols=["event_id"], direction=direction,
        ))
        bucketed = wall(lambda: asof_join_bucketed(
            left, right, ["user_id"], "ts", "ts",
            value_cols=["event_id"], bucket_width=bucket_width,
            direction=direction,
        ))
        print(f"| asof_join {direction} | {plain:.2f} s | "
              f"asof_join_bucketed | {bucketed:.2f} s |")


if __name__ == "__main__":
    main()
