"""Structured Streaming surface (SURVEY.md §2B "Streaming").

The reference is batch-only; the harness's ``events`` table is
micro-batch-shaped (event_id, ts, …). Everything here is written as
transformations valid in BOTH batch and streaming mode — the same
function runs under ``spark.read`` for the oracle-checked batch
queries and under ``spark.readStream`` + watermark for true streams.
"""

from pyspark_mrdf_spark.streaming.windows import (
    hourly_counts,
    session_windows,
    sliding_value_avg,
    stream_events_from_json,
    run_available_now,
)
from pyspark_mrdf_spark.streaming.stateful import (
    dedup_stream,
    funnel_advance,
    funnel_stream,
    maintained_stats,
    running_user_totals,
    session_stream,
)
from pyspark_mrdf_spark.streaming.joins import purchases_with_recent_clicks
from pyspark_mrdf_spark.streaming.sinks import upsert_stream_to_parquet

__all__ = [
    "hourly_counts",
    "session_windows",
    "sliding_value_avg",
    "stream_events_from_json",
    "run_available_now",
    "running_user_totals",
    "funnel_stream",
    "funnel_advance",
    "purchases_with_recent_clicks",
    "upsert_stream_to_parquet",
    "dedup_stream",
    "maintained_stats",
    "session_stream",
]
