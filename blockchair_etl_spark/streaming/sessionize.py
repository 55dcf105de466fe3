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
        if state.exists:
            start, end, n, total = state.get
        else:
            start = end = n = 0
            total = 0.0
        for t, v in zip(ts_us, vals):
            if n == 0:
                start, end, n, total = t, t, 1, float(v)
            elif t - end > gap_us:
                emit(start, end, n, total)
                start, end, n, total = t, t, 1, float(v)
            else:
                # max(): an out-of-order event from a later micro-batch
                # (within watermark) can carry t < the stored end; taking
                # t verbatim would REGRESS the session end and shorten
                # the flush timer, mis-stamping the session. (An event
                # earlier than the stored start is folded in the same
                # way — the batch twin, which sees fully sorted data,
                # only splits earlier if the gap exceeds the threshold,
                # which t >= watermark > end - gap rules out here.)
                end, n, total = max(end, t), n + 1, total + float(v)
        if n:
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
