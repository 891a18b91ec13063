"""Temporal operators: sessionize + asof_join micro-graph tests
(reference-style exact asserts; the reference itself has no temporal
operators — these are the §2.5-style superset surface)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(rows, "user long, ts long, eid long")


def test_sessionize_islands(spark):
    from rs_graphdb_spark.operators.temporal import sessionize

    # user 1: events at 0, 50, 200 with gap 100 -> sessions [0,50], [200]
    # user 2: single event -> one session
    df = _events(spark, [(1, 0, 1), (1, 50, 2), (1, 200, 3), (2, 10, 4)])
    out = sessionize(df, "user", "ts", gap=100, order_cols=["eid"])
    got = {(r.user, r.eid): r.session_id for r in out.collect()}
    assert got == {(1, 1): 1, (1, 2): 1, (1, 3): 2, (2, 4): 1}


def test_sessionize_gap_boundary_inclusive(spark):
    from rs_graphdb_spark.operators.temporal import sessionize

    # gap is strict ">": an exactly-gap-sized silence does NOT split
    df = _events(spark, [(1, 0, 1), (1, 100, 2), (1, 201, 3)])
    out = sessionize(df, "user", "ts", gap=100)
    got = {r.eid: r.session_id for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2}


def _asof(spark, **kw):
    from rs_graphdb_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (1, 20, 101), (2, 5, 102)], "k long, ts long, lid long"
    )
    right = spark.createDataFrame(
        [(1, 10, 200), (1, 15, 201), (2, 50, 202)], "k long, ts long, rid long"
    )
    return asof_join(
        left, right, key_cols=["k"], left_ts="ts", right_ts="ts",
        value_cols=["rid"], **kw,
    )


def test_asof_backward(spark):
    out = _asof(spark, direction="backward")
    got = {r.lid: (r.rid_right, r.ts_right) for r in out.collect()}
    # lid 100 at ts=10 matches rid 200 at ts=10 (<= inclusive);
    # lid 101 at ts=20 matches rid 201 at ts=15; lid 102 has no prior right
    assert got == {100: (200, 10), 101: (201, 15), 102: (None, None)}


def test_asof_backward_strict(spark):
    out = _asof(spark, direction="backward", strict=True)
    got = {r.lid: r.rid_right for r in out.collect()}
    assert got == {100: None, 101: 201, 102: None}


def test_asof_forward(spark):
    out = _asof(spark, direction="forward")
    got = {r.lid: r.rid_right for r in out.collect()}
    # lid 100 at ts=10 -> first right at ts>=10 is rid 200 (equal);
    # lid 101 at ts=20 -> none after; lid 102 at ts=5 -> rid 202 at ts=50
    assert got == {100: 200, 101: None, 102: 202}


def test_asof_tolerance(spark):
    out = _asof(spark, direction="backward", tolerance=3)
    got = {r.lid: r.rid_right for r in out.collect()}
    # lid 101's match at ts=15 is 5 ticks back -> outside tolerance 3
    assert got == {100: 200, 101: None, 102: None}


def test_asof_keeps_left_multiplicity_and_columns(spark):
    out = _asof(spark, direction="backward")
    assert out.count() == 3
    assert set(out.columns) == {"k", "ts", "lid", "ts_right", "rid_right"}


def test_sessionize_bucketed_equals_plain(spark):
    """Bucketed sessionize must reproduce the single-pass result exactly,
    including sessions spanning bucket boundaries and gaps exactly at the
    threshold (> gap splits, == gap does not)."""
    import random

    from rs_graphdb_spark.operators.temporal import sessionize, sessionize_bucketed

    rng = random.Random(5)
    rows = []
    eid = 0
    for user in range(8):
        t = 0
        for _ in range(60):
            # jumps chosen to straddle bucket edges (width 100) and to hit
            # the gap boundary exactly (gap 10)
            t += rng.choice([1, 3, 9, 10, 11, 40, 95, 100, 101])
            rows.append((user, t, eid))
            eid += 1
    df = spark.createDataFrame(rows, "user long, t long, eid long")
    plain = {
        (r["user"], r["eid"]): r["session_id"]
        for r in sessionize(df, "user", "t", gap=10, order_cols=["eid"]).collect()
    }
    bucketed = {
        (r["user"], r["eid"]): r["session_id"]
        for r in sessionize_bucketed(
            df, "user", "t", gap=10, bucket_width=100, order_cols=["eid"]
        ).collect()
    }
    assert bucketed == plain


def test_sessionize_bucketed_rejects_narrow_buckets(spark):
    import pytest as _pytest

    from rs_graphdb_spark.operators.temporal import sessionize_bucketed

    df = spark.createDataFrame([(1, 1, 1)], "user long, t long, eid long")
    with _pytest.raises(ValueError):
        sessionize_bucketed(df, "user", "t", gap=100, bucket_width=50)


def test_rollup_merges_to_direct_aggregation(spark):
    from rs_graphdb_spark.operators.temporal import rollup_partials, rollup_to

    import random

    rng = random.Random(9)
    rows = [(rng.randrange(0, 7200), float(rng.randrange(100)) / 4, "a" if rng.random() < 0.5 else "b")
            for _ in range(3000)]
    ev = spark.createDataFrame(rows, "t long, value double, event_type string")
    partials = rollup_partials(ev, "t", 60, key_cols=["event_type"], value_col="value")
    hourly = rollup_to(partials, 60, 3600, key_cols=["event_type"])
    got = {
        (r["bucket_start"], r["event_type"]):
            (r["p_count"], round(r["p_sum"], 6), r["p_min"], r["p_max"])
        for r in hourly.collect()
    }
    direct = {
        (r["b"] * 3600, r["event_type"]): (r["c"], round(r["s"], 6), r["mn"], r["mx"])
        for r in ev.groupBy((F.floor(F.col("t") / 3600)).alias("b"), "event_type")
        .agg(F.count("*").alias("c"), F.sum("value").alias("s"),
             F.min("value").alias("mn"), F.max("value").alias("mx")).collect()
    }
    assert got == direct
    import pytest as _p
    with _p.raises(ValueError):
        rollup_to(partials, 60, 90)


def test_asof_nearest_matches_brute_force(spark):
    """nearest-direction as-of vs a driver-side brute force over random
    data: min |gap| wins, equal gaps resolve backward, tolerance bounds
    the gap, keys never mix."""
    import random

    from rs_graphdb_spark.operators.temporal import asof_join

    rng = random.Random(31)
    left_rows = [(rng.randrange(3), rng.randrange(0, 1000), i)
                 for i in range(120)]
    right_rows = [(rng.randrange(3), rng.randrange(0, 1000), 1000 + i)
                  for i in range(80)]
    left = spark.createDataFrame(left_rows, "k long, t long, lid long")
    right = spark.createDataFrame(right_rows, "k long, t long, rid long")

    for tol in (None, 25):
        got = {
            r["lid"]: (r["t_right"], r["rid_right"])
            for r in asof_join(
                left, right, key_cols=["k"], left_ts="t", right_ts="t",
                value_cols=["rid"], direction="nearest", tolerance=tol,
            ).collect()
        }
        for k, t, lid in left_rows:
            cands = [(rt, rid) for rk, rt, rid in right_rows if rk == k]
            if tol is not None:
                cands = [c for c in cands if abs(c[0] - t) <= tol]
            if not cands:
                assert got[lid] == (None, None), lid
                continue
            best_gap = min(abs(rt - t) for rt, _ in cands)
            back = [c for c in cands if t - c[0] == best_gap]
            fwd = [c for c in cands if c[0] - t == best_gap]
            if back:  # equal gaps resolve backward; backward ties → max rid
                expect = max(back)
            else:
                expect = (min(c[0] for c in fwd),
                          min(rid for rt, rid in fwd if rt == min(c[0] for c in fwd)))
            assert got[lid] == expect, f"lid={lid} got={got[lid]} want={expect}"

    import pytest as _p
    with _p.raises(ValueError):
        asof_join(left, right, ["k"], "t", "t", ["rid"],
                  direction="nearest", strict=True)


# -- viral-key skew fixtures (r2 verdict #7) --------------------------------

def _skewed_events(spark, n_users=200, n_events=60_000, viral_share=0.4, seed=5):
    """Synthetic event log with one viral key: `user 0` owns
    ``viral_share`` of ALL events (the bot/celebrity shape that pins a
    per-key window sort at scale)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n_events):
        uid = 0 if rng.random() < viral_share else rng.randrange(1, n_users)
        ts = rng.randrange(0, 3_000_000)
        rows.append((i, uid, ts, float(i % 97)))
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    )


def test_sessionize_bucketed_equals_plain_under_skew(spark):
    """The hot-key-safe variant must be bit-identical to the plain form on
    a viral-key log (40% of 60k events on one user)."""
    ev = _skewed_events(spark).localCheckpoint(eager=True)
    from rs_graphdb_spark.operators.temporal import sessionize, sessionize_bucketed

    plain = sessionize(ev, "user_id", "ts", gap=1000, order_cols=["event_id"])
    bucketed = sessionize_bucketed(
        ev, "user_id", "ts", gap=1000, bucket_width=50_000,
        order_cols=["event_id"],
    )
    a = {(r["event_id"], r["session_id"]) for r in plain.collect()}
    b = {(r["event_id"], r["session_id"]) for r in bucketed.collect()}
    assert a == b and len(a) == 60_000


def test_asof_join_matches_pandas_under_skew(spark):
    """asof_join on the viral-key log must equal pandas merge_asof for
    every direction (the ground-truth single-node implementation)."""
    import pandas as pd

    from rs_graphdb_spark.operators.temporal import asof_join

    ev = _skewed_events(spark, n_events=20_000).localCheckpoint(eager=True)
    left = ev.filter(F.col("event_id") % 3 == 0)
    right = (
        ev.filter(F.col("event_id") % 3 != 0)
        # drop duplicate (user, ts) so the expected match is unique and
        # tie-break conventions can't differ between engines
        .withColumn("_rn", F.row_number().over(
            Window.partitionBy("user_id", "ts").orderBy("event_id")))
        .filter(F.col("_rn") == 1).drop("_rn")
        .localCheckpoint(eager=True)
    )
    lp = left.toPandas().sort_values("ts", kind="mergesort").reset_index(drop=True)
    rp = right.toPandas().sort_values("ts", kind="mergesort").reset_index(drop=True)
    for direction in ("backward", "forward", "nearest"):
        got = asof_join(
            left, right, ["user_id"], "ts", "ts",
            value_cols=["event_id"], direction=direction,
        )
        gd = {r["event_id"]: r["event_id_right"] for r in got.collect()}
        exp = pd.merge_asof(
            lp, rp, on="ts", by="user_id", direction=direction,
            suffixes=("", "_r"),
        )
        ed = {int(r.event_id): (None if pd.isna(r.event_id_r) else int(r.event_id_r))
              for r in exp.itertuples()}
        assert gd == ed, f"direction={direction}"


def test_interval_join_bucketed_equals_naive_under_skew(spark):
    """The bucket-banded interval join must return exactly the pairs of
    the naive range-predicate join on the viral-key log."""
    from rs_graphdb_spark.operators.temporal import interval_join

    ev = _skewed_events(spark, n_events=8_000).localCheckpoint(eager=True)
    left = ev.filter(F.col("event_id") % 2 == 0)
    right = ev.filter(F.col("event_id") % 2 == 1)
    lower, upper = 300, 700
    got = {
        (r["event_id"], r["event_id_right"])
        for r in interval_join(
            left, right, ["user_id"], "ts", "ts", lower, upper,
            value_cols=["event_id"],
        ).collect()
    }
    naive = (
        left.alias("l").join(
            right.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") >= F.col("l.ts") - lower)
            & (F.col("r.ts") <= F.col("l.ts") + upper),
        ).select(F.col("l.event_id").alias("a"), F.col("r.event_id").alias("b"))
    )
    want = {(r["a"], r["b"]) for r in naive.collect()}
    assert got == want and len(want) > 0


def test_asof_join_bucketed_equals_plain_under_skew(spark):
    """asof_join_bucketed must be bit-identical to asof_join on the
    viral-key log in all three directions, with and without tolerance,
    and with strict (VERDICT r3 item #2)."""
    from rs_graphdb_spark.operators.temporal import asof_join, asof_join_bucketed

    ev = _skewed_events(spark, n_events=20_000).localCheckpoint(eager=True)
    left = ev.filter(F.col("event_id") % 3 == 0)
    right = ev.filter(F.col("event_id") % 3 != 0).localCheckpoint(eager=True)

    def snap(df):
        return {
            r["event_id"]: (r["ts_right"], r["event_id_right"])
            for r in df.collect()
        }

    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 1500):
            want = snap(asof_join(
                left, right, ["user_id"], "ts", "ts",
                value_cols=["event_id"], direction=direction, tolerance=tol,
            ))
            # 100k = normal slicing; 499 = pathological (most buckets hold
            # 0-1 rows, so the cross-bucket CARRY path does all the work)
            for width in (100_000, 499):
                got = snap(asof_join_bucketed(
                    left, right, ["user_id"], "ts", "ts",
                    value_cols=["event_id"], bucket_width=width,
                    direction=direction, tolerance=tol,
                ))
                assert got == want, f"dir={direction} tol={tol} w={width}"
    # strict variant (backward/forward only)
    for direction in ("backward", "forward"):
        want = snap(asof_join(
            left, right, ["user_id"], "ts", "ts",
            value_cols=["event_id"], direction=direction, strict=True,
        ))
        got = snap(asof_join_bucketed(
            left, right, ["user_id"], "ts", "ts",
            value_cols=["event_id"], bucket_width=100_000,
            direction=direction, strict=True,
        ))
        assert got == want, f"strict direction={direction}"


def test_asof_join_bucketed_carry_across_empty_buckets(spark):
    """A left row whose bucket (and several preceding buckets) hold no
    right rows must still take the carry from the nearest earlier/later
    bucket that has one."""
    from rs_graphdb_spark.operators.temporal import asof_join_bucketed
    from rs_graphdb_spark.session import local_df

    left = local_df(spark, [(1, 1, 950), (2, 1, 50)],
                    "lid long, k long, ts long")
    right = local_df(spark, [(10, 1, 10), (11, 1, 990)],
                     "rid long, k long, rts long")
    got = {r["lid"]: r["rid_right"] for r in asof_join_bucketed(
        left, right, ["k"], "ts", "rts", value_cols=["rid"],
        bucket_width=100, direction="backward",
    ).collect()}
    assert got == {1: 10, 2: 10}
    got_f = {r["lid"]: r["rid_right"] for r in asof_join_bucketed(
        left, right, ["k"], "ts", "rts", value_cols=["rid"],
        bucket_width=100, direction="forward",
    ).collect()}
    assert got_f == {1: 11, 2: 11}
    got_n = {r["lid"]: r["rid_right"] for r in asof_join_bucketed(
        left, right, ["k"], "ts", "rts", value_cols=["rid"],
        bucket_width=100, direction="nearest",
    ).collect()}
    assert got_n == {1: 11, 2: 10}
