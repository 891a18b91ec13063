"""Session-timezone independence + id-namespace overflow regressions.

The driver calls the engine with a vanilla SparkSession that makes no UTC
promise, so every epoch conversion must be timezone-FREE. Round 2 found
two real bugs here:

- ``ntz.cast("timestamp")`` → ``unix_*`` re-interprets the wall-clock in
  the session timezone (off by the tz offset under America/New_York);
- ``connected_components`` summed 64-bit labels into a BIGINT for its
  convergence test, overflowing (ANSI job abort) once id-namespace ×
  row-count exceeds 2^63.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture()
def ny_tz(spark):
    """Temporarily run under a non-UTC session timezone."""
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield
    spark.conf.set("spark.sql.session.timeZone", old)


def _min_us(spark):
    from rs_graphdb_spark.streaming.ops import event_time_us

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    return ev.select(event_time_us(ev).alias("us")).agg(F.min("us")).first()[0]


def test_event_time_us_matches_duckdb_epoch(spark):
    import duckdb

    expect = duckdb.connect().execute(
        f"SELECT min(epoch_us(ts)) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()[0]
    assert _min_us(spark) == expect


def test_event_time_us_is_session_tz_free(spark, ny_tz):
    import duckdb

    expect = duckdb.connect().execute(
        f"SELECT min(epoch_us(ts)) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()[0]
    assert _min_us(spark) == expect


def test_windowed_counts_session_tz_free(spark, ny_tz):
    from rs_graphdb_spark.streaming.ops import windowed_event_counts

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    rows = {
        (r["win_start"], r["event_type"]): r["n_events"]
        for r in windowed_event_counts(ev, streaming=False).collect()
    }
    # window starts are epoch-seconds aligned to the 5-minute grid in
    # ABSOLUTE time, whatever the session tz says
    assert rows and all(ws % 300 == 0 for ws, _ in rows)
    import duckdb

    expect = {
        (r[0], r[1]): r[2]
        for r in duckdb.connect().execute(
            "SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT), event_type,"
            f" count(*) FROM '{SF_DIR}/events.parquet' GROUP BY 1, 2"
        ).fetchall()
    }
    assert {k: v for k, v in rows.items()} == expect


def test_connected_components_huge_id_namespace(spark):
    """Sum-of-labels convergence must not overflow BIGINT: 10k nodes in a
    2^52 id namespace pushes Σid past 2^63 (ANSI mode turned that into
    ARITHMETIC_OVERFLOW before the DECIMAL(38,0) fix)."""
    from rs_graphdb_spark.algorithms.graph_algos import connected_components

    base = 1 << 52
    n = 10_000
    nodes = spark.range(n).select((F.lit(base) + F.col("id")).alias("id"))
    # disjoint pairs 2i—2i+1: converges in one round, components = even ids
    edges = spark.range(n // 2).select(
        (F.lit(base) + F.col("id") * 2).alias("src"),
        (F.lit(base) + F.col("id") * 2 + 1).alias("dst"),
    )
    comp = connected_components(nodes, edges)
    bad = comp.filter(
        F.col("component") != (F.col("id") - (F.col("id") % 2).cast("long"))
    ).count()
    assert bad == 0
