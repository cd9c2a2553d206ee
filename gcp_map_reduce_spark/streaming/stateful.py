"""Custom stateful streaming operator: per-user sessionization with an
event-time gap timeout, via ``applyInPandasWithState``.

The reference has no streaming state at all — its trigger path re-runs the
whole batch job per upload (SURVEY.md O23). This is the idiomatic custom
stateful operator the batch ``sessionize_events`` query corresponds to:
state per user is one fixed-size tuple (start, end, n, total), sessions
are emitted exactly once when the watermark passes their gap timeout, and
late rows beyond the watermark are dropped by the engine.

Scale posture: state size is O(active users), not O(events); the shuffle
keys on user_id (the group key), and timeouts are event-time driven so a
stalled partition can't grow state unboundedly — exactly the
bounded-state contract you need on an unbounded 100 TB/day stream.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)
SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
_STATE_SCHEMA = "start bigint, end bigint, n bigint, total double"

_MS = 1_000_000  # pandas datetime64[ns] -> ms divisor is 1e6


def _sessionize_fn(gap_ms: int):
    """Build the grouped-map-with-state function for a given gap."""

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, end, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="ms")],
                    "session_end": [pd.Timestamp(end, unit="ms")],
                    "n_events": [n],
                    "total_value": [total],
                }
            )
            return

        start = end = None
        n = 0
        total = 0.0
        if state.exists:
            start, end, n, total = state.get
        for pdf in pdfs:
            if pdf.empty:
                continue
            ts_ms = pdf["ts"].astype("int64") // _MS
            lo, hi = int(ts_ms.min()), int(ts_ms.max())
            start = lo if start is None else min(start, lo)
            end = hi if end is None else max(end, hi)
            n += len(pdf)
            total += float(pdf["value"].sum())
        if start is not None:
            state.update((start, end, n, total))
            state.setTimeoutTimestamp(end + gap_ms)
        yield pd.DataFrame(
            columns=[
                "user_id",
                "session_start",
                "session_end",
                "n_events",
                "total_value",
            ]
        )

    return fn


def run_stateful_sessionize(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    query_name: str = "sessions",
    max_files_per_trigger: int | None = None,
):
    """Stream events from ``events_dir``; emit one row per closed session
    (per-user, gap-separated). Returns the started StreamingQuery with an
    in-memory sink named ``query_name``.

    ``max_files_per_trigger`` splits the backlog into multiple micro-
    batches so the watermark advances between them (needed for event-time
    timeouts to fire during an availableNow drain).
    """
    num, unit = gap.split()
    gap_ms = int(num) * {"seconds": 1, "minutes": 60, "hours": 3600}[
        unit.rstrip("s") + "s"
    ] * 1000

    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    ev = reader.parquet(events_dir)
    sessions = (
        ev.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return (
        sessions.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
