"""Stateful streaming sessionization via applyInPandasWithState
(SURVEY.md §2.10 — second custom stateful operator).

Per-user session counting over an unbounded event stream: a new
session starts when the gap to the user's previous event exceeds
``gap_sec``.  State per user is (n_sessions, n_events, last_ts_us) —
tiny and permanent (in production, bounded with a state timeout that
closes idle users).

Determinism contract: sessionization is order-sensitive, so the
result equals the batch formulation exactly when each user's events
arrive in event-time order ACROSS micro-batches (within a batch the
operator sorts by (ts, event_id) itself).  The availableNow single
pass over a static table satisfies this trivially; the cross-batch
test feeds two time-split files and asserts state carries the session
chain over the boundary.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_GAP_SEC = 1800

STATE_SCHEMA = StructType(
    [
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
        StructField("last_ts_us", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _update_user(key, pdf_iter, state: GroupState):
    user_id = int(key[0])
    if state.exists:
        n_sessions, n_events, last_ts_us = state.get
    else:
        n_sessions, n_events, last_ts_us = 0, 0, None
    gap_us = SESSION_GAP_SEC * 1_000_000
    # one sort over the WHOLE micro-batch for this user: the iterator
    # may deliver several Arrow chunks and only the concatenation is
    # safely order-normalized
    frames = [pdf for pdf in pdf_iter]
    if frames:
        batch = pd.concat(frames).sort_values(["ts", "event_id"])
        ts_us = (
            pd.to_datetime(batch["ts"]).astype("int64") // 1000
        ).to_numpy()
        for t in ts_us:
            if last_ts_us is None or (int(t) - last_ts_us) > gap_us:
                n_sessions += 1
            last_ts_us = int(t)
            n_events += 1
    state.update((n_sessions, n_events, last_ts_us if last_ts_us is not None else 0))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_sessions": [n_sessions],
            "n_events": [n_events],
        }
    )


def user_sessionize_stream(stream_events: DataFrame) -> DataFrame:
    """streaming events (user_id, ts, event_id) -> running per-user
    (n_sessions, n_events).  Returns a streaming DataFrame for
    ``.writeStream`` in ``update`` mode."""
    return (
        stream_events.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
