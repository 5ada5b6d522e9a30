"""Structured Streaming extension (SURVEY.md §2.9).

The reference has no event-stream processing — its only "stream" is pull-based
batch consumption (``df.execute_stream()``, ``src/utils/dataframe.rs:105``).
This module is the driver-mandated extension: watermarked tumbling/sliding
windows, session windows, and custom stateful operators over the ``events``
table, built on the same query core.

Local testing drives a file-source stream (the sf parquet) through a memory
sink synchronously (``processAllAvailable``); in production the same plans run
on Kafka sources with checkpointed exactly-once sinks. Aggregations use
``complete``/``update`` output so a finite replay reproduces the batch answer
(append mode would hold back unclosed windows past the watermark).

Scale notes: stateful streaming shuffles by group key once per micro-batch;
state lives in the executor state store (RocksDB in production). Watermarks
bound state size — without one, window state grows forever at 100 TB/day.
"""

from .windows import (
    read_events_stream,
    read_table_stream,
    recent_events_tws,
    run_stream_to_table,
    session_window_agg,
    sessionize_batch,
    sliding_window_agg,
    stateful_user_counts,
    stateful_user_counts_tws,
    stream_score_alerts,
    stream_stream_interval_join,
    tumbling_window_agg,
    user_type_counts_tws,
    window_argmax,
)

__all__ = [
    "read_events_stream",
    "read_table_stream",
    "run_stream_to_table",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "sessionize_batch",
    "stateful_user_counts",
    "stateful_user_counts_tws",
    "recent_events_tws",
    "user_type_counts_tws",
    "stream_score_alerts",
    "stream_stream_interval_join",
    "window_argmax",
]
