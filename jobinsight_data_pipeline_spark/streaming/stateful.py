"""Custom stateful streaming operator (SURVEY §2.10 scale path):
gap-based sessionization over an event stream via
``applyInPandasWithState``.

The batch catalog pins the semantics (``sessionize`` gate: per-user
sessions split at >``gap`` inactivity, catalog/relational.py); this
operator produces the SAME closed sessions incrementally over an
unbounded stream:

- per-user state = the one open session (start, end, n_events) as epoch
  microseconds — O(1) state per key regardless of history length;
- a micro-batch's events extend or close the open session; closed
  sessions are emitted immediately;
- the watermark drives an event-time timeout that flushes a session
  once ``gap`` has provably elapsed (no later event can reopen it), so
  quiet users still emit without waiting for their next click.

At 100 TB posture this is the canonical shape: state is bounded by
|active users|, the shuffle is one hash partition on user_id, and
Arrow-batched pandas handles each key group — no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

# open session carried between micro-batches: epoch-µs bounds + count
_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _session_fn(gap_us: int, tz: str):
    # timestamps reach pandas as NAIVE wall times in the session tz, but
    # setTimeoutTimestamp / getCurrentWatermarkMs speak true UTC epoch —
    # localize on the way in (and back out) or timeouts skew by the tz
    # offset and never fire
    us = lambda t: int(pd.Timestamp(t).tz_localize(tz).value // 1_000)  # noqa: E731
    ts = lambda u: pd.Timestamp(u * 1_000, tz="UTC").tz_convert(tz).tz_localize(None)  # noqa: E731

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        def emit(start_us: int, end_us: int, n: int) -> dict:
            return {
                "user_id": user_id,
                "session_start": ts(start_us),
                "session_end": ts(end_us),
                "n_events": n,
            }

        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame([emit(start_us, end_us, n)])
            return

        events = pd.concat(list(pdfs)).sort_values("ts")
        start_us = end_us = None
        n = 0
        if state.exists:
            start_us, end_us, n = state.get
        closed: list[dict] = []
        for t in events["ts"]:
            t_us = us(t)
            if start_us is None:
                start_us, end_us, n = t_us, t_us, 1
            elif t_us - end_us > gap_us:
                closed.append(emit(start_us, end_us, n))
                start_us, end_us, n = t_us, t_us, 1
            else:
                end_us, n = max(end_us, t_us), n + 1
        state.update((start_us, end_us, n))
        # flush once the watermark proves the gap elapsed; the timeout
        # must sit strictly beyond the current watermark or Spark rejects it
        timeout_ms = max(
            (end_us + gap_us) // 1_000 + 1, state.getCurrentWatermarkMs() + 1
        )
        state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield pd.DataFrame(closed)

    return fn


def streaming_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Sessionize a streaming events frame (``ts``, ``user_id``, ...):
    returns the stream of CLOSED sessions (user_id, session_start,
    session_end, n_events). Sessions close either when a later event
    arrives past the gap, or when the watermark passes session_end +
    gap (event-time timeout). Use outputMode("update")."""
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone")
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes * 60 * 1_000_000, tz),
            SESSION_OUT,
            _STATE,
            "update",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
