"""Custom stateful streaming operator: session windows over an event
stream via ``applyInPandasWithState``.

The reference is batch-only; this is the SURVEY-prescribed pattern for
operators Spark's built-ins can't express ("applyInPandasWithState for
custom stateful operators"): per-key mutable state + event-time timeouts.
A session closes when a user is silent for ``gap_minutes`` — either
observed inside a batch, or by watermark passing the gap deadline
(EventTimeTimeout) for sessions that simply stop receiving events.

State per user: (session_start_us, last_seen_us, n_events). Output: one row
per CLOSED session. The batch twin (same semantics, lag + running sum) is
``queries.ev_sessionize`` — the streaming operator is validated against it
in tests.

Scale notes: state is 24 bytes/user in the state store, keyed by the
group-by hash partitioning; watermark bounds state growth — users silent
past the gap are closed and evicted on timeout, so state size tracks
*active* users, not all users ever seen.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint"

_US = 1_000_000


def _session_fn_factory(gap_minutes: int):
    gap_us = gap_minutes * 60 * _US

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []

        if state.hasTimedOut:
            # watermark passed the gap deadline: the open session is over
            if state.exists:
                start_us, last_us, n = state.get
                closed.append((start_us, last_us, n))
                state.remove()
        else:
            ts_us: list[int] = []
            for pdf in pdfs:
                ts_us.extend(
                    int(t.value // 1000) for t in pd.to_datetime(pdf["ts"])
                )
            ts_us.sort()
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us = last_us = -1
                n = 0
            for t in ts_us:
                if start_us < 0:
                    start_us = last_us = t
                    n = 1
                elif t - last_us > gap_us:
                    closed.append((start_us, last_us, n))
                    start_us = last_us = t
                    n = 1
                else:
                    last_us = max(last_us, t)
                    n += 1
            if start_us >= 0:
                state.update((start_us, last_us, n))
                # close the session when the watermark passes last_ts + gap
                state.setTimeoutTimestamp((last_us + gap_us) // 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """events stream → closed-session stream.

    ``events`` must be a streaming DataFrame with an event-time column.
    Watermark bounds both late data and state retention.
    """
    prepared = events.select(
        F.col(user_col).cast("bigint").alias("user_id"), F.col(ts_col).alias("ts")
    ).withWatermark("ts", watermark)
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_fn_factory(gap_minutes),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
