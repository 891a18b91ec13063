"""Structured Streaming operators — the Spark replacement for the
reference's result-streaming and async-write machinery (SURVEY.md §2.9).
"""

from rs_graphdb_spark.streaming.ops import (
    append_edge_sink,
    read_event_stream,
    stateful_running_totals,
    windowed_event_counts,
)

__all__ = [
    "append_edge_sink",
    "read_event_stream",
    "stateful_running_totals",
    "windowed_event_counts",
]
