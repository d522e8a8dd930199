"""Stream-stream join (Structured Streaming's hardest primitive).

``purchases_with_recent_clicks``: inner join of two event streams on
user with an event-time range bound — each purchase pairs with the
clicks from the preceding hour. In streaming mode BOTH sides carry
watermarks, and the range condition lets the state store expire rows
once the watermark passes (bounded state — without the time bound a
stream-stream join buffers forever). The same function body runs in
batch mode for the DuckDB-oracle-checked twin (q63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchases_with_recent_clicks(
    events: DataFrame, lookback: str = "1 hour", watermark: str | None = None
) -> DataFrame:
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    if watermark and events.isStreaming:
        purchases = purchases.withWatermark("ts", watermark)
        clicks = clicks.withWatermark("click_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") <= F.col("ts"))
        & (F.col("click_ts") >= F.col("ts") - F.expr(f"INTERVAL {lookback}"))
    )
    return purchases.join(clicks, cond).select(
        "event_id", "user_id", "ts", "click_ts", "click_value"
    )
