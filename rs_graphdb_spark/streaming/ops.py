"""Structured Streaming operators over the `events` fixture.

Reference mapping (SURVEY.md §2.9):

- `QueryStream` batch/backpressure machinery
  (`/root/reference/src/query_stream.rs:238-345,494-550`) → Structured
  Streaming's own micro-batching; progress comes from
  `StreamingQueryListener`, backpressure from `maxFilesPerTrigger` /
  `maxOffsetsPerTrigger` — none of it reimplemented by hand.
- `AsyncStorage` actor write path (`src/storage/async_store.rs:21-107`,
  async facade `src/graph/async_db.rs:12-70`) → `writeStream.foreachBatch`
  appending to the edge/node tables.
- beyond-reference (the reference has NO event-time processing): watermark
  + tumbling-window aggregation and an `applyInPandasWithState` custom
  stateful operator.

Every transformation here is expressed so the SAME function works on a
batch DataFrame and a streaming DataFrame — which is how the batch oracle
(`__spark_entry__.q69/q70`) checks the streaming logic's semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: raw parquet schema of the events fixture with
#: spark.sql.legacy.parquet.nanosAsLong=true (ts = int96-nanos as LONG)
EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_event_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream over an events parquet directory.

    One file = one micro-batch by default; bound per-trigger intake with
    ``maxFilesPerTrigger`` at scale (the backpressure analog of the
    reference's bounded mpsc channel)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )


def with_event_time(df: DataFrame) -> DataFrame:
    """Nanos-long ts → proper event-time timestamp column."""
    return df.withColumn(
        "event_time", F.timestamp_seconds(F.col("ts") / F.lit(1_000_000_000))
    )


def windowed_event_counts(
    df: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    streaming: bool = True,
) -> DataFrame:
    """Tumbling-window counts/sums per event type with late-data handling.

    Works identically on batch and streaming inputs (watermark is a no-op
    in batch mode) — the batch run is the oracle for the streaming run."""
    df = with_event_time(df)
    if streaming:
        df = df.withWatermark("event_time", watermark)
    return (
        df.groupBy(
            F.window("event_time", window).alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def hopping_event_counts(
    df: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    streaming: bool = True,
) -> DataFrame:
    """Hopping (sliding) window counts/sums per event type — each event
    lands in window/slide overlapping windows (`F.window` with a slide;
    the tumbling op above is the slide == window special case). Window
    starts are emitted as exact epoch-microsecond longs (slide-aligned,
    so no float exposure in the output). Batch == streaming semantics."""
    df = with_event_time(df)
    if streaming:
        df = df.withWatermark("event_time", watermark)
    return (
        df.groupBy(
            F.window("event_time", window, slide).alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "event_type", "n_events", "sum_value",
        )
    )


def session_window_stats(
    df: DataFrame,
    gap: str = "6 hours",
    watermark: str = "12 hours",
    streaming: bool = True,
) -> DataFrame:
    """Per-user session-window aggregation (``F.session_window``): events
    of a user closer than ``gap`` merge into one session. The streaming
    twin of the batch gaps-and-islands operator
    (`operators/temporal.sessionize`) — same sessions, but computed
    incrementally with state store merging instead of a window sort.

    Session bounds are reported as exact microsecond longs from the raw
    ts (min/max over the group), not from the float-derived event_time,
    so batch and streaming runs agree bit-for-bit with a SQL oracle.
    Works identically on batch and streaming inputs."""
    df = with_event_time(df).withColumn("t_us", F.expr("ts div 1000"))
    if streaming:
        df = df.withWatermark("event_time", watermark)
    return (
        df.groupBy(
            F.session_window("event_time", gap).alias("sw"),
            F.col("user_id"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("t_us").alias("start_us"),
            F.max("t_us").alias("end_us"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select("user_id", "n_events", "start_us", "end_us", "sum_value")
    )


_STATE_SCHEMA = T.StructType([
    T.StructField("total", T.DoubleType()),
    T.StructField("n", T.LongType()),
])

_RUNNING_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])


def stateful_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running totals via
    ``applyInPandasWithState`` — the Spark-native form of the reference's
    stateful stream consumers (`src/query_stream.rs:553-600`). Emits the
    updated running total for each user seen in the micro-batch."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        total, n = state.get if state.exists else (0.0, 0)
        for pdf in pdfs:
            total += float(pdf["value"].fillna(0.0).sum())
            n += int(len(pdf))
        state.update((total, n))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def append_edge_sink(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
):
    """The AsyncStorage replacement: micro-batch append into an edge/node
    parquet table via foreachBatch (exactly-once per epoch via the sink's
    transactional file commit + checkpointed offsets)."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
