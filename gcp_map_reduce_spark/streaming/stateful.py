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

import numpy as np
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
    """Build the grouped-map-with-state function for a given gap.

    The batch's events are sorted by ts and SPLIT at gaps > gap_ms —
    two events five hours apart in one micro-batch are two sessions,
    exactly as in the batch ``sessionize_events`` operator. Sessions
    closed inside the batch (a later in-batch session follows them) are
    emitted immediately; only the trailing open session stays in state.
    The stored open session is likewise closed and emitted as soon as a
    batch arrives whose earliest event is beyond its gap window, or when
    the event-time timeout fires with no successor batch.
    """

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

        # open session carried from previous batches: [start, end, n, total]
        cur = list(state.get) if state.exists else None
        closed: list[tuple[int, int, int, float]] = []

        frames = [p for p in pdfs if not p.empty]
        if frames:
            rows = pd.concat(frames) if len(frames) > 1 else frames[0]
            rows = rows.sort_values("ts")
            ts = (rows["ts"].astype("int64") // _MS).to_numpy()
            val = rows["value"].to_numpy()
            # vectorized gap split: a new session starts wherever the
            # inter-event gap exceeds gap_ms
            brk = np.empty(len(ts), dtype=bool)
            brk[0] = True
            brk[1:] = (ts[1:] - ts[:-1]) > gap_ms
            sid = np.cumsum(brk) - 1
            agg = (
                pd.DataFrame({"sid": sid, "ts": ts, "val": val})
                .groupby("sid", sort=True)
                .agg(start=("ts", "min"), end=("ts", "max"),
                     n=("ts", "size"), total=("val", "sum"))
            )
            sess = [
                [int(r.start), int(r.end), int(r.n), float(r.total)]
                for r in agg.itertuples(index=False)
            ]
            if cur is not None:
                if sess and sess[0][0] - cur[1] <= gap_ms:
                    # first in-batch session continues the stored one
                    first = sess.pop(0)
                    cur = [
                        min(cur[0], first[0]),
                        max(cur[1], first[1]),
                        cur[2] + first[2],
                        cur[3] + first[3],
                    ]
                if sess:
                    # a later in-batch session exists => the stored/merged
                    # session is definitively over
                    closed.append(tuple(cur))
                    cur = None
            if sess:
                closed.extend(tuple(s) for s in sess[:-1])
                cur = sess[-1]

        if cur is not None:
            state.update((int(cur[0]), int(cur[1]), int(cur[2]), float(cur[3])))
            state.setTimeoutTimestamp(int(cur[1]) + gap_ms)
        elif state.exists:
            state.remove()

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [
                        pd.Timestamp(s[0], unit="ms") for s in closed
                    ],
                    "session_end": [pd.Timestamp(s[1], unit="ms") for s in closed],
                    "n_events": [s[2] for s in closed],
                    "total_value": [s[3] for s in closed],
                }
            )
        else:
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
