"""Skew-join probe (PLANS.md): one viral key vs AQE skew-split vs salting.

Builds a deliberately skewed fact table (half of all rows on ONE key),
disables broadcast so the join must shuffle, and times:

  1. plain sort-merge join with AQE skew-join splitting ON (the default
     engine config),
  2. the same join with AQE skew handling OFF (what a stock executor
     pinned on the hot partition looks like),
  3. `plans.physical.salted_join` (the explicit remedy for joins AQE
     cannot split, e.g. when the skewed side feeds a same-key agg).

Usage: python tools/skew_probe.py [n_rows] [n_keys]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    from rs_graphdb_spark.plans.physical import salted_join
    from rs_graphdb_spark.session import get_spark

    spark = get_spark("skew-probe")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # 50% of rows on key 0, rest uniform — the viral-node shape
    big = spark.range(n_rows).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.hash("id"), F.lit(n_keys)))
        .cast("long")
        .alias("key"),
        (F.col("id") % 97).alias("v"),
    ).localCheckpoint(eager=True)
    dim = spark.range(n_keys).select(
        F.col("id").alias("key"), (F.col("id") % 7).alias("w")
    ).localCheckpoint(eager=True)

    def run(tag, fn):
        t0 = time.time()
        n = fn().count()
        print(f"| {tag} | {n} rows | {time.time() - t0:.1f} s |")

    # join output projected+counted: isolates JOIN skew (a follow-on
    # groupBy would partial-aggregate map-side and absorb the skew anyway)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    run("SMJ, AQE skew-split ON", lambda: big.join(dim, "key")
        .select((F.col("v") + F.col("w")).alias("x")))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    run("SMJ, AQE skew-split OFF", lambda: big.join(dim, "key")
        .select((F.col("v") + F.col("w")).alias("x")))
    run("salted_join (16 salts), AQE skew OFF",
        lambda: salted_join(big, dim, "key", n_salts=16)
        .select((F.col("v") + F.col("w")).alias("x")))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")


if __name__ == "__main__":
    main()
