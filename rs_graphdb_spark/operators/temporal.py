"""Temporal operators: sessionization and as-of (point-in-time) join.

The reference has no temporal operators at all (its `events`-style
workloads would run through plain queries); these are first-class
training-pipeline/event-analytics additions (driver queries q80, q81).

Scale design
------------
Both operators cost exactly ONE hash shuffle on the entity key and then
work partition-locally inside a window sort — no driver loop, no
range-join blowup:

* ``sessionize`` is the classic gaps-and-islands rewrite: lag() to mark
  session starts, running sum to number them. All per-key, so a 100 TB
  event log distributes by ``key_col`` and each task streams its users'
  sorted events once.
* ``asof_join`` uses the union-merge formulation instead of the naive
  ``left.ts >= right.ts`` range join (which is O(|L|·|R|) per key and
  explodes on hot keys): tag both inputs, union them, and carry the most
  recent right-side values forward with ``last(..., ignorenulls=True)``
  over an ordered window. One shuffle, one sort, linear in |L|+|R|.

Hot keys (bot users) skew the window sort; ``sessionize_bucketed`` is the
implemented remedy — split by coarse time bucket (boundaries only ever
split a session, never merge), then a summary-level second pass repairs
bucket-edge sessions exactly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "sessionize", "sessionize_bucketed", "asof_join", "interval_join",
    "rollup_partials", "rollup_to",
]


def rollup_partials(
    events: DataFrame,
    ts_col: str,
    bucket_width: int,
    key_cols: Sequence[str] = (),
    value_col: str | None = None,
) -> DataFrame:
    """Hypertable-style continuous aggregate, level 0: per fine time
    bucket (and optional keys), the decomposable partials — count, sum,
    min, max. Persist this table once; every coarser-grained query is
    answered from it without touching the event log again.

    ``ts_col`` is an epoch-like numeric; ``bucket_width`` its unit."""
    aggs = [F.count("*").alias("p_count")]
    if value_col is not None:
        aggs += [
            F.sum(value_col).alias("p_sum"),
            F.min(value_col).alias("p_min"),
            F.max(value_col).alias("p_max"),
        ]
    return (
        events.withColumn("bucket", F.floor(F.col(ts_col) / F.lit(bucket_width)))
        .groupBy("bucket", *key_cols)
        .agg(*aggs)
        .withColumn("bucket_start", F.col("bucket") * bucket_width)
        .drop("bucket")
    )


def rollup_to(
    partials: DataFrame,
    fine_width: int,
    coarse_width: int,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Hypertable rollup, level 1+: merge fine partials into a coarser
    grain (``coarse_width`` must be a multiple of ``fine_width``). Count/
    sum/min/max are decomposable, so the merged result is EXACTLY the
    direct aggregation over raw events — at 100 TB this reads the (tiny)
    partials table instead of the event log, the whole point of a
    continuous aggregate."""
    if coarse_width % fine_width != 0:
        raise ValueError(
            f"coarse_width ({coarse_width}) must be a multiple of "
            f"fine_width ({fine_width})"
        )
    merged = [F.sum("p_count").alias("p_count")]
    if "p_sum" in partials.columns:
        merged += [
            F.sum("p_sum").alias("p_sum"),
            F.min("p_min").alias("p_min"),
            F.max("p_max").alias("p_max"),
        ]
    return (
        partials.withColumn(
            "bucket",
            F.floor(F.col("bucket_start") / F.lit(coarse_width)),
        )
        .groupBy("bucket", *key_cols)
        .agg(*merged)
        .withColumn("bucket_start", F.col("bucket") * coarse_width)
        .drop("bucket")
    )


def sessionize(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap: int,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Assign gap-based session ids per key (gaps-and-islands).

    ``ts_col`` must be a numeric (epoch-like) column; ``gap`` is in the
    same unit. A new session starts at the first event of a key and at
    every event strictly more than ``gap`` after its predecessor.

    Returns the input plus ``session_id`` (1-based, dense per key).
    """
    order = [F.col(ts_col).asc(), *(F.col(c).asc() for c in order_cols)]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    is_new = F.when(
        prev.isNull() | ((F.col(ts_col) - prev) > F.lit(gap)), 1
    ).otherwise(0)
    run = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_id", F.sum(is_new).over(run))


def sessionize_bucketed(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap: int,
    bucket_width: int,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Hot-key-safe sessionize: identical output to :func:`sessionize`,
    but the big window sort runs per ``(key, time-bucket)`` instead of per
    key — a bot user with 10^9 events no longer pins one task, because its
    events split across ``bucket_width``-sized slices.

    Exact edge repair: bucket boundaries can only SPLIT a session, never
    merge two (buckets are disjoint time ranges, and sessions inside a
    bucket are already separated by > gap). So a second gaps-and-islands
    pass over the per-bucket SESSION SUMMARIES (start/end per local
    session — orders of magnitude smaller than the event log) stitches
    boundary-crossing sessions back together: summary i+1 merges into i
    iff ``start_{i+1} − end_i <= gap``, exactly the predicate the
    single-pass version evaluates between those two adjacent events.

    Requires ``bucket_width > gap`` (narrower buckets would still be
    correct but make the repair pass pointless — every session would
    span buckets).
    """
    if bucket_width <= gap:
        raise ValueError(
            f"bucket_width ({bucket_width}) must exceed gap ({gap})"
        )
    bucketed = events.withColumn(
        "_bkt", F.floor(F.col(ts_col) / F.lit(bucket_width))
    )
    order = [F.col(ts_col).asc(), *(F.col(c).asc() for c in order_cols)]
    w_local = Window.partitionBy(key_col, "_bkt").orderBy(*order)
    prev = F.lag(ts_col).over(w_local)
    is_new = F.when(
        prev.isNull() | ((F.col(ts_col) - prev) > F.lit(gap)), 1
    ).otherwise(0)
    run_local = w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = bucketed.withColumn("_lsid", F.sum(is_new).over(run_local))

    summaries = local.groupBy(key_col, "_bkt", "_lsid").agg(
        F.min(ts_col).alias("_start"), F.max(ts_col).alias("_end")
    )
    w_merge = Window.partitionBy(key_col).orderBy(
        F.col("_start").asc(), F.col("_bkt").asc(), F.col("_lsid").asc()
    )
    prev_end = F.lag("_end").over(w_merge)
    starts = F.when(
        prev_end.isNull() | ((F.col("_start") - prev_end) > F.lit(gap)), 1
    ).otherwise(0)
    run_merge = w_merge.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mapping = summaries.withColumn("session_id", F.sum(starts).over(run_merge)).select(
        key_col, "_bkt", "_lsid", "session_id"
    )
    return (
        local.join(mapping, [key_col, "_bkt", "_lsid"])
        .drop("_bkt", "_lsid")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
    strict: bool = False,
    tolerance: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Point-in-time join: for each left row, attach ``value_cols`` from
    the single right row with the greatest ``right_ts`` <= ``left_ts``
    (``backward``), smallest ``right_ts`` >= ``left_ts`` (``forward``),
    or smallest absolute gap in either direction (``nearest`` — pandas
    ``merge_asof`` parity; equal gaps resolve backward) within the same
    ``key_cols`` group. Left rows with no match keep NULLs (left-outer
    semantics; filter afterwards for inner).

    ``strict=True`` excludes equal timestamps (backward/forward only).
    ``tolerance`` (same unit as the ts columns) bounds the allowed gap.
    Ties on ``right_ts`` within a key resolve to the row latest in
    ``(right_ts, *value_cols)`` order for backward, earliest for the
    forward side — pass a unique id in ``value_cols`` for determinism.

    Right-side columns come back as ``{name}{suffix}`` plus
    ``{right_ts}{suffix}``. Still one shuffle + one window sort —
    ``nearest`` adds a second frame over the same sorted partition, not a
    second exchange.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if direction == "nearest" and strict:
        raise ValueError("nearest does not support strict=True")
    return _asof_join_impl(
        left, right, key_cols, left_ts, right_ts, value_cols,
        direction, strict, tolerance, suffix,
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    bucket_width: int,
    direction: str = "backward",
    strict: bool = False,
    tolerance: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Hot-key-safe as-of join: identical output to :func:`asof_join`,
    but the union-merge window sort runs per ``(key, time-bucket)``
    instead of per key — a viral key with 10^9 rows no longer pins one
    task, because its rows split across ``bucket_width``-sized slices
    (the :func:`sessionize_bucketed` recipe applied to the as-of shape).

    Exact boundary repair: buckets partition time, so every right row in
    an earlier bucket has strictly smaller ts than every left row in a
    later bucket (and symmetrically for forward). A left row whose local
    (in-bucket) pass finds no match therefore takes the CARRY — for
    backward, the last right row over all strictly-earlier buckets; for
    forward, the first over strictly-later ones; ``nearest`` composes
    both fills and picks the smaller gap exactly like the plain
    operator. Carries are computed on per-bucket right-side SUMMARIES
    (one struct per (key, bucket) — orders of magnitude smaller than the
    row data), with the same (ts, *value_cols) tie order the plain join
    documents, so outputs are bit-identical (property-pinned in
    tests/test_temporal.py).

    Strictness needs no repair: a carry's ts differs from the left ts by
    construction, so ``strict`` only affects the in-bucket pass.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if direction == "nearest" and strict:
        raise ValueError("nearest does not support strict=True")
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")

    keys = list(key_cols)
    rts = f"{right_ts}{suffix}"
    out_vals = [f"_av{i}" for i in range(len(value_cols))]

    l_tagged = (
        left.withColumn("_t", F.col(left_ts))
        .withColumn("_side", F.lit(1))
        .withColumn("_bkt", F.floor(F.col(left_ts) / F.lit(bucket_width)))
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias(rts),
        *[F.col(c).alias(o) for c, o in zip(value_cols, out_vals)],
    ).withColumn("_bkt", F.floor(F.col("_t") / F.lit(bucket_width)))
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # per-bucket right-side summary struct, ordered (ts, *values) — the
    # documented tie order of the plain join
    summ_struct = F.struct(
        F.col(rts).alias("_ts"), *[F.col(o) for o in out_vals]
    )
    summaries = r_tagged.groupBy(*keys, "_bkt").agg(
        F.max(summ_struct).alias("_s_last"),
        F.min(summ_struct).alias("_s_first"),
    )
    # every bucket either side touches, with the carry computed over the
    # (small) summary frame — never over row data
    buckets = (
        l_tagged.select(*keys, "_bkt")
        .unionByName(summaries.select(*keys, "_bkt"))
        .dropDuplicates()
    )
    w_back = Window.partitionBy(*keys).orderBy(F.col("_bkt").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_fwd = Window.partitionBy(*keys).orderBy(F.col("_bkt").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    carries = (
        buckets.join(summaries, [*keys, "_bkt"], "left")
        .select(
            *keys, "_bkt",
            F.last("_s_last", ignorenulls=True).over(w_back).alias("_cb"),
            F.last("_s_first", ignorenulls=True).over(w_fwd).alias("_cf"),
        )
    )

    def _local_fill(w_order, fill_fn, prefix):
        return [
            fill_fn(F.col(rts), ignorenulls=True).over(w_order).alias(
                f"{prefix}_ts"
            ),
            *[
                fill_fn(F.col(o), ignorenulls=True).over(w_order).alias(
                    f"{prefix}_{o}"
                )
                for o in out_vals
            ],
        ]

    if direction == "nearest":
        # forward fill = last-non-null over DESCENDING order with an
        # expanding-preceding frame (same trick as the plain impl: a
        # (currentRow, unboundedFollowing) ignore-nulls frame is O(n²)
        # per partition in Spark's window exec)
        order_b = [F.col("_t").asc(), F.col("_side").asc(),
                   *[F.col(c).asc() for c in out_vals]]
        order_f = [F.col("_t").desc(), F.col("_side").desc(),
                   *[F.col(c).desc() for c in out_vals]]
        w_b = Window.partitionBy(*keys, "_bkt").orderBy(*order_b).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        w_f = Window.partitionBy(*keys, "_bkt").orderBy(*order_f).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        filled = unioned.select(
            "*", *_local_fill(w_b, F.last, "_b"), *_local_fill(w_f, F.last, "_f")
        )
        res = filled.filter(F.col("_side") == 1).join(
            carries, [*keys, "_bkt"], "left"
        )
        # local fill wins when present; else the cross-bucket carry
        b_ts = F.coalesce(F.col("_b_ts"), F.col("_cb._ts"))
        f_ts = F.coalesce(F.col("_f_ts"), F.col("_cf._ts"))
        b_val = {
            o: F.when(F.col("_b_ts").isNotNull(), F.col(f"_b_{o}")).otherwise(
                F.col(f"_cb.{o}")
            )
            for o in out_vals
        }
        f_val = {
            o: F.when(F.col("_f_ts").isNotNull(), F.col(f"_f_{o}")).otherwise(
                F.col(f"_cf.{o}")
            )
            for o in out_vals
        }
        b_gap = F.col("_t") - b_ts
        f_gap = f_ts - F.col("_t")
        use_f = f_ts.isNotNull() & (b_ts.isNull() | (f_gap < b_gap))
        ch_ts = F.when(use_f, f_ts).otherwise(b_ts)
        gap = F.when(use_f, f_gap).otherwise(b_gap)
        matched = ch_ts.isNotNull()
        if tolerance is not None:
            matched = matched & (gap <= F.lit(tolerance))
        return res.select(
            *left.columns,
            F.when(matched, ch_ts).alias(rts),
            *[
                F.when(
                    matched, F.when(use_f, f_val[o]).otherwise(b_val[o])
                ).alias(f"{c}{suffix}")
                for c, o in zip(value_cols, out_vals)
            ],
        )

    ts_key = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    side_key = F.col("_side").asc() if not strict else F.col("_side").desc()
    tie = [F.col(c).asc() if direction == "backward" else F.col(c).desc()
           for c in out_vals]
    w = Window.partitionBy(*keys, "_bkt").orderBy(
        ts_key, side_key, *tie
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled = unioned.select("*", *_local_fill(w, F.last, "_m"))
    carry = F.col("_cb") if direction == "backward" else F.col("_cf")
    result = filled.filter(F.col("_side") == 1).join(
        carries, [*keys, "_bkt"], "left"
    )
    eff_ts = F.coalesce(F.col("_m_ts"), carry["_ts"])
    eff_val = {
        o: F.when(F.col("_m_ts").isNotNull(), F.col(f"_m_{o}")).otherwise(
            carry[o]
        )
        for o in out_vals
    }
    matched: Column = eff_ts.isNotNull()
    if tolerance is not None:
        gap = (F.col("_t") - eff_ts) if direction == "backward" else (
            eff_ts - F.col("_t"))
        matched = matched & (gap <= F.lit(tolerance))
    return result.select(
        *left.columns,
        F.when(matched, eff_ts).alias(rts),
        *[
            F.when(matched, eff_val[o]).alias(f"{c}{suffix}")
            for c, o in zip(value_cols, out_vals)
        ],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    value_cols: Sequence[str],
    suffix: str = "_right",
) -> DataFrame:
    """Interval join: every (left, right) pair sharing ``key_cols`` with
    ``right_ts`` in ``[left_ts - lower, left_ts + upper]`` (inclusive).
    Inner-join semantics, one output row per matching pair.

    Scale shape: a naive ``ON key AND rt BETWEEN ...`` plans as a
    key-equi-join with a residual range predicate — fine per key until a
    hot key turns it into a per-key cross product. Here both sides land
    in coarse time buckets of width ``lower + upper`` (left rows into
    the <=2 buckets their window spans, right rows into exactly one), so
    the join key is ``(key, bucket)``: shuffle fan-out is bounded at 2x
    the left side, candidate pairs are bounded by bucket co-residency,
    and the exact window filter runs post-join. At 100 TB pick the unit
    so buckets hold O(minutes) of data per key.
    """
    keys = list(key_cols)
    width = max(lower + upper, 1)
    out_vals = [f"_iv{i}" for i in range(len(value_cols))]
    rts = f"{right_ts}{suffix}"

    l_b = left.withColumn(
        "_lo_b", F.floor((F.col(left_ts) - F.lit(lower)) / F.lit(width))
    ).withColumn(
        "_hi_b", F.floor((F.col(left_ts) + F.lit(upper)) / F.lit(width))
    ).withColumn(
        "_bucket", F.explode(F.array_distinct(F.array("_lo_b", "_hi_b")))
    ).drop("_lo_b", "_hi_b")
    r_b = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(rts),
        *[F.col(c).alias(o) for c, o in zip(value_cols, out_vals)],
    ).withColumn("_bucket", F.floor(F.col(rts) / F.lit(width)))

    joined = l_b.join(r_b, [*keys, "_bucket"]).filter(
        (F.col(rts) >= F.col(left_ts) - F.lit(lower))
        & (F.col(rts) <= F.col(left_ts) + F.lit(upper))
    )
    return joined.select(
        *[F.col(c) for c in left.columns],
        F.col(rts),
        *[F.col(o).alias(f"{c}{suffix}") for c, o in zip(value_cols, out_vals)],
    )


def _asof_join_impl(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    direction: str,
    strict: bool,
    tolerance: int | None,
    suffix: str,
) -> DataFrame:
    keys = list(key_cols)
    rts = f"{right_ts}{suffix}"
    out_vals = [f"_av{i}" for i in range(len(value_cols))]

    l_tagged = left.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(1))
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias(rts),
        *[F.col(c).alias(o) for c, o in zip(value_cols, out_vals)],
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    if direction == "nearest":
        # two EXPANDING-preceding fills: last-non-null in ascending order
        # (backward) and last-non-null in DESCENDING order (≡ the
        # first-non-null forward fill). Never a (currentRow,
        # unboundedFollowing) ignore-nulls frame — Spark evaluates that
        # frame by rescanning the remainder of the partition per row,
        # O(n²) on a hot key (measured: infeasible at 2.5M rows on one
        # key, where this two-sort form is a plain O(n log n) sort).
        # Equal-ts right rows sort before the left row in BOTH orders
        # (side asc ↔ side desc), so they land in the backward fill with
        # gap 0 and stay out of the forward frame — same tie semantics.
        order_b = [F.col("_t").asc(), F.col("_side").asc(),
                   *[F.col(c).asc() for c in out_vals]]
        order_f = [F.col("_t").desc(), F.col("_side").desc(),
                   *[F.col(c).desc() for c in out_vals]]
        w_b = Window.partitionBy(*keys).orderBy(*order_b).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        w_f = Window.partitionBy(*keys).orderBy(*order_f).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        filled = unioned.select(
            "*",
            F.last(F.col(rts), ignorenulls=True).over(w_b).alias("_b_ts"),
            *[F.last(F.col(o), ignorenulls=True).over(w_b).alias(f"_b_{o}")
              for o in out_vals],
            F.last(F.col(rts), ignorenulls=True).over(w_f).alias("_f_ts"),
            *[F.last(F.col(o), ignorenulls=True).over(w_f).alias(f"_f_{o}")
              for o in out_vals],
        )
        res = filled.filter(F.col("_side") == 1)
        b_gap = F.col("_t") - F.col("_b_ts")
        f_gap = F.col("_f_ts") - F.col("_t")
        use_f = F.col("_f_ts").isNotNull() & (
            F.col("_b_ts").isNull() | (f_gap < b_gap)
        )
        ch_ts = F.when(use_f, F.col("_f_ts")).otherwise(F.col("_b_ts"))
        gap = F.when(use_f, f_gap).otherwise(b_gap)
        matched = ch_ts.isNotNull()
        if tolerance is not None:
            matched = matched & (gap <= F.lit(tolerance))
        return res.select(
            *left.columns,
            F.when(matched, ch_ts).alias(rts),
            *[
                F.when(
                    matched,
                    F.when(use_f, F.col(f"_f_{o}")).otherwise(F.col(f"_b_{o}")),
                ).alias(f"{c}{suffix}")
                for c, o in zip(value_cols, out_vals)
            ],
        )

    # Order so that eligible right rows precede each left row: ascending
    # ts for backward, descending for forward. At equal ts the right row
    # is eligible iff not strict — flip the side sort to include/exclude.
    ts_key = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    side_key = F.col("_side").asc() if not strict else F.col("_side").desc()
    tie = [F.col(c).asc() if direction == "backward" else F.col(c).desc()
           for c in out_vals]
    w = Window.partitionBy(*keys).orderBy(ts_key, side_key, *tie).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    filled = unioned.select(
        "*",
        F.last(F.col(rts), ignorenulls=True).over(w).alias("_m_ts"),
        *[F.last(F.col(o), ignorenulls=True).over(w).alias(f"_m_{o}")
          for o in out_vals],
    )
    result = filled.filter(F.col("_side") == 1)

    matched: Column = F.col("_m_ts").isNotNull()
    if tolerance is not None:
        gap = (F.col("_t") - F.col("_m_ts")) if direction == "backward" else (
            F.col("_m_ts") - F.col("_t"))
        matched = matched & (gap <= F.lit(tolerance))
    keep_left = [c for c in left.columns]
    return result.select(
        *keep_left,
        F.when(matched, F.col("_m_ts")).alias(rts),
        *[
            F.when(matched, F.col(f"_m_{o}")).alias(f"{c}{suffix}")
            for c, o in zip(value_cols, out_vals)
        ],
    )
