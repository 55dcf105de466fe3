"""Custom stateful streaming operator: gap-based sessionization with
applyInPandasWithState.

The batch twin (queryset.sessionize_events) expresses the same
semantics with lag+cumsum windows; this version maintains one open
session per user in the state store, emits a session when the
inactivity gap is exceeded within a batch, and uses an event-time
timeout to flush sessions the watermark has passed — the standard
unbounded-stream formulation where a window/lag approach is impossible.

State per user is O(1) (start, end, count, sum) and the watermark bounds
how long an idle session stays resident — the two properties that make
this run indefinitely at firehose scale.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
STATE_SCHEMA = "start bigint, end bigint, n bigint, total double"


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # Self-contained (locals + stdlib/pandas only) so cloudpickle ships
    # it by value to Python workers.
    import pandas as _pd

    gap_us = 30 * 60 * 1_000_000
    (user_id,) = key
    out = []

    def emit(start_us: int, end_us: int, n: int, total: float) -> None:
        out.append(
            dict(
                user_id=user_id,
                session_start=_pd.Timestamp(start_us, unit="us"),
                session_end=_pd.Timestamp(end_us, unit="us"),
                n_events=n,
                total_value=round(total, 2),
            )
        )

    if state.hasTimedOut:
        start, end, n, total = state.get
        state.remove()
        emit(start, end, n, total)
    else:
        rows = _pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        ts_us = (rows["ts"].astype("int64") // 1000).tolist()
        vals = rows["value"].tolist()
        # Gap-merge the stored open session and the batch events as
        # SORTED INTERVALS (each event is a width-0 interval; the stored
        # session is [start, end]). Because every internal gap of the
        # stored session is <= gap by construction, interval-merge over
        # the union reproduces exactly what the batch twin computes over
        # the underlying events: a late event within gap of the stored
        # START lowers session_start (min), one more than gap BEFORE the
        # stored start forms its own earlier session (emitted when the
        # next interval exceeds its gap) — neither is folded into the
        # stored end anymore. The one remaining divergence from batch
        # semantics is fundamental to append-mode streaming: an
        # already-EMITTED session cannot be retro-merged if an extremely
        # late (but in-watermark) event lands within gap of it; keep
        # watermark <= gap if that must never happen.
        intervals = [(t, t, 1, float(v)) for t, v in zip(ts_us, vals)]
        if state.exists:
            intervals.append(state.get)
        intervals.sort(key=lambda iv: (iv[0], iv[1]))
        merged: list[tuple[int, int, int, float]] = []
        for s, e, cnt, tot in intervals:
            if merged and s - merged[-1][1] <= gap_us:
                ms, me, mn, mt = merged[-1]
                merged[-1] = (ms, max(me, e), mn + cnt, mt + tot)
            else:
                merged.append((s, e, cnt, tot))
        for s, e, cnt, tot in merged[:-1]:
            emit(s, e, cnt, tot)
        if merged:
            start, end, n, total = merged[-1]
            state.update((start, end, n, total))
            # flush when the watermark passes the session's gap horizon
            state.setTimeoutTimestamp(end // 1000 + 30 * 60 * 1000)
    cols = ["user_id", "session_start", "session_end", "n_events", "total_value"]
    yield _pd.DataFrame(out, columns=cols)


def sessionize_stream(events_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """events (user_id, ts timestamp, value) → closed sessions."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
