"""Three-decade scale probe for the temporal family (round 5).

The temporal operators have viral-key skew probes (round 3/4) and sf1
sweeps, but no three-decade measurement. This probe holds per-key
structure CONSTANT while the corpus grows — events/user fixed at ~100,
one viral user always holding 10% of all rows (so the hot key grows
linearly, the production shape) — and measures at 500k / 5M / 50M
events:

- sessionize_bucketed (the hot-key-safe form; plain sessionize is the
  round-3 probe's known hot-key victim, not re-litigated here)
- asof_join_bucketed backward (purchases ← clicks shape)
- interval_join (bucket-banded)

Usage: python tools/temporal_scale_probe.py [base_rows] [rungs]
Prints one markdown row per (operator, rung) for PLANS.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

GAP = 3_600
BUCKET = GAP * 4
DAY = 86_400


def synth_events(spark, n_rows: int):
    """10% of rows on user 0 (viral), the rest spread over n/112 cold
    users (~100 events each); the covered time range SCALES WITH n so
    per-second event density (and therefore interval_join's per-window
    pair mass) stays constant — under a FIXED range the viral user's
    density grows linearly and the true pair OUTPUT grows quadratically,
    which reads as a superlinear bend that is really the answer getting
    bigger (first version of this probe measured exactly that: 0.7 →
    4.5 → 220 s)."""
    par = spark.sparkContext.defaultParallelism
    n_cold = max(n_rows // 112, 1)
    span = 30 * DAY * max(n_rows // 500_000, 1)
    e = spark.range(n_rows).repartition(par)
    h = F.abs(F.hash(F.col("id").cast("string"))).cast("long")
    user = F.when(F.col("id") % 10 == 0, F.lit(0)).otherwise(
        1 + h % n_cold
    )
    ts = (h % span) + (F.col("id") % 97)
    return e.select(
        F.col("id").alias("event_id"),
        user.cast("long").alias("user_id"),
        ts.cast("long").alias("ts"),
        (h % 1000).cast("double").alias("value"),
    ).localCheckpoint(eager=True)


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    rungs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from rs_graphdb_spark.operators.temporal import (
        asof_join_bucketed, interval_join, sessionize_bucketed)
    from rs_graphdb_spark.session import get_spark

    spark = get_spark("temporal-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def probe(tag, n, fn):
        fn()  # warm
        t0 = time.time()
        fn()
        print(f"| {tag} | {n:,} events | {time.time() - t0:.2f} s |",
              flush=True)

    for r in range(rungs):
        n = base * 10 ** r
        ev = synth_events(spark, n)
        ev.count()
        purchases = ev.filter(F.col("event_id") % 20 == 0) \
            .localCheckpoint(eager=True)

        probe("sessionize_bucketed", n, lambda: sessionize_bucketed(
            ev, "user_id", "ts", GAP, bucket_width=BUCKET,
            order_cols=["event_id"],
        ).write.mode("overwrite").format("noop").save())

        probe("asof_join_bucketed bwd", n, lambda: asof_join_bucketed(
            purchases, ev, key_cols=["user_id"], left_ts="ts",
            right_ts="ts", value_cols=["event_id"],
            bucket_width=BUCKET,
        ).write.mode("overwrite").format("noop").save())

        probe("interval_join ±1h", n, lambda: interval_join(
            purchases, ev, key_cols=["user_id"], left_ts="ts",
            right_ts="ts", lower=GAP, upper=GAP,
            value_cols=["event_id"],
        ).write.mode("overwrite").format("noop").save())

        purchases.unpersist()
        ev.unpersist()


if __name__ == "__main__":
    main()
