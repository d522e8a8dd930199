"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2B: "applyInPandasWithState for custom stateful
operators").

``running_user_totals``: per-user cumulative event count and value
total maintained in state across micro-batches — the building block
for online feature aggregation in a training-data pipeline. State per
key is two scalars, so the state store stays tiny regardless of
stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: cumulative (n_events, total_value) per user, emitted
    every micro-batch the user appears in."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact-once dedup on event_id: duplicates arriving
    within the watermark horizon are dropped, and state for old ids is
    expired with the watermark (unbounded-state-safe — plain
    ``dropDuplicates`` on a stream would keep every id forever).
    At-least-once sources (Kafka, retried file ingest) become
    effectively-once for downstream aggregates."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
