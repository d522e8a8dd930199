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
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
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


FUNNEL_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts_view_us", LongType()),
        StructField("ts_click_us", LongType()),
        StructField("ts_purchase_us", LongType()),
        StructField("funnel_stage", LongType()),
    ]
)
FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("v", LongType()),
        StructField("c", LongType()),
        StructField("p", LongType()),
    ]
)
_UNSET = -1


def funnel_advance(
    v: int, c: int, p: int, ts_us: list[int], event_type: list[str]
) -> tuple[int, int, int]:
    """Pure funnel state transition (view -> click -> purchase, strict
    event-time order), processing this chunk's events in ts order:

      v = first view ever seen; c = first click with ts > v;
      p = first purchase with ts > c;  _UNSET (-1) = stage not reached.

    Chunking is transparent: applying chunks of a ts-sorted event
    sequence through this function yields the same final state as one
    pass over the whole sequence (each stage only ever moves from
    _UNSET to a final value) — the property that makes the streaming
    operator agree with the batch q93 when events arrive in order.
    Late (out-of-order) events can be missed by streaming; the batch
    twin is the reconciler, the standard lambda split."""
    order = sorted(range(len(ts_us)), key=lambda i: ts_us[i])
    for i in order:
        et, ts = event_type[i], ts_us[i]
        if v == _UNSET:
            if et == "view":
                v = ts
        elif c == _UNSET:
            if et == "click" and ts > v:
                c = ts
        elif p == _UNSET:
            if et == "purchase" and ts > c:
                p = ts
    return v, c, p


def _funnel_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    v, c, p = state.get if state.exists else (_UNSET, _UNSET, _UNSET)
    # gather the WHOLE group before advancing: Spark hands the group
    # over as multiple Arrow chunks (maxRecordsPerBatch) in arbitrary
    # shuffle order, and funnel_advance's chunk-composition property
    # holds only for ts-ordered chunk boundaries — one sorted pass
    # over the concatenation is the correct in-batch order
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        allp = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        v, c, p = funnel_advance(
            v, c, p, allp["ts_us"].tolist(), allp["event_type"].tolist()
        )
    if v == _UNSET:
        # nothing reached the funnel: persisting (-1,-1,-1) would be
        # semantically identical to no state but lives forever under
        # NoTimeout — keep the store at O(funnel users), not O(keys)
        return
    state.update((v, c, p))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "ts_view_us": [v],
            "ts_click_us": [None if c == _UNSET else c],
            "ts_purchase_us": [None if p == _UNSET else p],
            "funnel_stage": [1 + (c != _UNSET) + (p != _UNSET and c != _UNSET)],
        }
    )


def funnel_stream(events: DataFrame) -> DataFrame:
    """Streaming funnel (the stateful twin of batch q93): per-user
    view -> click -> purchase progression maintained in 3 longs of
    state per user, re-emitted on every micro-batch the user appears
    in. State is O(users), never O(events); within a batch events are
    ts-sorted, so the operator matches the batch query exactly for
    in-order arrival (tested), and the batch twin reconciles late
    data."""
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _funnel_update,
        outputStructType=FUNNEL_OUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- maintained additive aggregates (streaming materialized view) ----


def maintained_stats_schemas(value_cols: list[str]):
    """(output, state) schemas for ``maintained_stats``: key string +
    one long per maintained column."""
    out = StructType(
        [StructField("key", StringType())]
        + [StructField(c, LongType()) for c in value_cols]
    )
    state = StructType([StructField(c, LongType()) for c in value_cols])
    return out, state


def maintained_stats(deltas: DataFrame, key_col: str, value_cols: list[str]) -> DataFrame:
    """Streaming materialized view of ADDITIVE aggregates: each input
    row is a signed delta (insert +, delete −, update new−old — the
    CDC classification q142 derives from snapshot fingerprints), state
    per key is the running sum of each value column, and every
    micro-batch emits the keys it touched with their post-batch
    totals.

    This is the streaming twin of q142's incremental maintenance: the
    batch path folds one delta set into the stored aggregate; this
    folds an unbounded stream of them, state bounded at O(keys ×
    len(value_cols) longs). Additivity is the whole contract — sums
    commute with micro-batch boundaries, so the final state is
    independent of how the stream was chunked (property-tested), which
    is exactly why production pipelines maintain sums/counts and
    rebuild everything else."""
    out_schema, state_schema = maintained_stats_schemas(value_cols)

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        totals = list(state.get) if state.exists else [0] * len(value_cols)
        for pdf in pdfs:
            for i, c in enumerate(value_cols):
                totals[i] += int(pdf[c].sum())
        state.update(tuple(totals))
        yield pd.DataFrame(
            {"key": [key[0]], **{c: [totals[i]] for i, c in enumerate(value_cols)}}
        )

    return (
        deltas.select(F.col(key_col).cast("string").alias("key"), *value_cols)
        .groupBy("key")
        .applyInPandasWithState(
            _update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- stateful sessionizer (event-time timeouts) ----------------------

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _session_update(gap_us: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def row(start: int, last: int, n: int) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start_us": [start],
                    "session_end_us": [last + gap_us],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            # the watermark passed last_event + gap: the open session is
            # final — emit and clear (this is the ONLY way an idle
            # user's tail session ever leaves the store)
            start, last, n = state.get
            state.remove()
            yield row(start, last, n)
            return
        ts = sorted(
            int(t) for pdf in pdfs for t in pdf["ts_us"].to_numpy()
        )
        if not ts:
            return
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts[0], ts[0] - gap_us - 1, 0  # sentinel: first event opens
        # replay in event order, splitting whenever the gap exceeds the
        # session gap — multiple sessions can open AND close inside one
        # micro-batch, and all closed ones emit now
        for t in ts:
            if n > 0 and t - last > gap_us:
                yield row(start, last, n)
                start, n = t, 0
            elif n == 0:
                start = t
            last = t
            n += 1
        state.update((start, last, n))
        # event-time timeout: fire when the watermark passes the open
        # session's close point (ms granularity — the state API's unit)
        state.setTimeoutTimestamp((last + gap_us) // 1000 + 1)

    return update


def session_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming sessionization with event-time timeouts — the custom
    twin of the built-in ``session_window`` aggregate, and the piece
    the built-in cannot give you: arbitrary per-session state/logic at
    close time. Sessions split on > ``gap_minutes`` silence; a closed
    session emits as soon as its close is DECIDABLE — mid-batch when a
    later event proves the gap, or via ``GroupStateTimeout.
    EventTimeTimeout`` when the WATERMARK passes the open session's
    close point (without the timeout, an idle user's last session
    would sit in the state store forever — timeouts are what bound
    state at 100 TB event volume).

    ``session_end_us`` = last event + gap, matching the built-in
    ``session_window`` end bound, so batch equivalence is directly
    assertable (tests/test_streaming.py)."""
    gap_us = gap_minutes * 60 * 1_000_000
    ev = events.withWatermark("ts", f"{gap_minutes} minutes").select(
        "user_id", F.unix_micros(F.col("ts")).alias("ts_us"), F.col("ts")
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _session_update(gap_us),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
