"""Event-time window transformations (batch- and stream-compatible).

At scale these are the canonical streaming aggregations: watermark
bounds state, window grouping shuffles once on (window, key), and AQE
(batch) / state-store partitioning (streaming) handle skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def hourly_counts(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Tumbling 1-hour window counts per event type."""
    if watermark and events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_value_avg(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Sliding 2-hour window (1-hour slide) average value per type."""
    if watermark and events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", "2 hours", "1 hour").alias("win"), "event_type")
        .agg(
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "avg_value",
            "n_events",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = None
) -> DataFrame:
    """Per-user sessions: events closer than ``gap`` merge into one
    session (Spark's native session_window; in SQL terms, the
    gaps-and-islands pattern)."""
    if watermark and events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("session_value"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


# Spark's default JSON timestampFormat truncates to milliseconds;
# event-time joins/windows need the full microsecond precision, so
# writer and reader must agree on this format.
JSON_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def stream_events_from_json(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of events (JSON lines, explicit schema —
    streaming sources never infer). ``max_files_per_trigger`` bounds
    each micro-batch's input (backpressure; also what lets tests stop
    a query mid-stream with work remaining)."""
    rs = spark.readStream.schema(EVENT_SCHEMA).option(
        "timestampFormat", JSON_TS_FORMAT
    )
    if max_files_per_trigger is not None:
        rs = rs.option("maxFilesPerTrigger", max_files_per_trigger)
    return rs.json(path)


def run_available_now(sdf: DataFrame, query_name: str) -> list:
    """Drain all available input through one micro-batch into a memory
    sink and return the rows (test/verification harness)."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError(f"{query_name}: stream did not drain in 120s")
    rows = sdf.sparkSession.sql(f"SELECT * FROM {query_name}").collect()
    q.stop()
    return rows
