"""Gap-based sessionization on the Spark 4 transformWithState API.

Third (and newest) expression of the engine's sessionization semantics,
alongside the batch lag+cumsum twin (queryset.sessionize_events) and the
applyInPandasWithState operator (streaming/sessionize.py). The
`transformWithStateInPandas` model upgrades the old one in three ways
that matter operationally:

- typed, NAMED state variables (`handle.getValueState`) instead of one
  opaque tuple — state schema is declared and evolvable;
- first-class event-time TIMERS (`registerTimer` / handleExpiredTimer)
  instead of a single per-key timeout slot — the idle-session flush is
  an explicit timer keyed to the session's gap horizon;
- the same processor object serves batch and streaming queries, and
  Spark owns the state store layout (RocksDB at scale).

Semantics are identical to the other two: sessions close when the
inactivity gap is exceeded in-batch, or when the watermark passes the
open session's gap horizon (timer). State per user is O(1); the
watermark bounds idle-state residence — the unbounded-stream contract.

Cross-validated in tests/test_clusters_sessions.py against the batch
twin (the applyInPandasWithState suite already triangulates batch /
native session_window / stateful operator; this adds the fourth
corner). NOTE: transformWithState's state-server protocol needs the
`protobuf` package, which this build sandbox does not ship — the
cross-validation test skips when `google.protobuf` is unavailable and
runs wherever the dependency exists (it is part of a standard pyspark
install's `pyspark[connect]` extras and of any Databricks/EMR image).
The applyInPandasWithState sessionizer is the always-runnable twin.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
# start/end in epoch-us; timer_ms remembers the registered flush timer
# so a session extension can delete-and-replace it
STATE_SCHEMA = "start bigint, end bigint, n bigint, total double, timer_ms bigint"


class SessionProcessor(StatefulProcessor):
    """One open session per user; emits on gap-exceeded or timer."""

    def __init__(self, gap_minutes: int = 30):
        self.gap_us = gap_minutes * 60 * 1_000_000
        self.gap_ms = gap_minutes * 60 * 1_000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.session = handle.getValueState("session", STATE_SCHEMA)

    def _emit_row(self, user_id, start_us, end_us, n, total):
        return dict(
            user_id=user_id,
            session_start=pd.Timestamp(start_us, unit="us"),
            session_end=pd.Timestamp(end_us, unit="us"),
            n_events=n,
            total_value=round(total, 2),
        )

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        batch = pd.concat(list(rows), ignore_index=True).sort_values("ts")
        ts_us = (batch["ts"].astype("int64") // 1000).tolist()
        vals = batch["value"].tolist()

        if self.session.exists():
            start0, end0, n0, total0, old_timer = self.session.get()
        else:
            start0 = end0 = n0 = 0
            total0 = 0.0
            old_timer = -1

        out = []
        # Same sorted-interval gap-merge as the applyInPandasWithState
        # twin (sessionize.py): the stored open session participates as
        # the interval [start, end] (all its internal gaps <= gap by
        # construction), so a late event within gap of the stored start
        # LOWERS session_start and one more than gap before it forms its
        # own earlier session — matching the batch twin instead of
        # folding into max(end, t).
        intervals = [(t, t, 1, float(v)) for t, v in zip(ts_us, vals)]
        if n0:
            intervals.append((start0, end0, n0, total0))
        intervals.sort(key=lambda iv: (iv[0], iv[1]))
        merged: list[tuple[int, int, int, float]] = []
        for s, e, cnt, tot in intervals:
            if merged and s - merged[-1][1] <= self.gap_us:
                ms, me, mn, mt = merged[-1]
                merged[-1] = (ms, max(me, e), mn + cnt, mt + tot)
            else:
                merged.append((s, e, cnt, tot))
        for s, e, cnt, tot in merged[:-1]:
            out.append(self._emit_row(user_id, s, e, cnt, tot))
        start = end = n = 0
        total = 0.0
        if merged:
            start, end, n, total = merged[-1]

        if n:
            timer_ms = end // 1000 + self.gap_ms
            if old_timer != timer_ms:
                if old_timer >= 0:
                    self.handle.deleteTimer(old_timer)
                self.handle.registerTimer(timer_ms)
            self.session.update((start, end, n, float(total), timer_ms))

        cols = ["user_id", "session_start", "session_end", "n_events", "total_value"]
        yield pd.DataFrame(out, columns=cols)

    def handleExpiredTimer(
        self, key, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cols = ["user_id", "session_start", "session_end", "n_events", "total_value"]
        out = []
        if self.session.exists():
            start, end, n, total, _timer = self.session.get()
            if n:
                out.append(self._emit_row(user_id, start, end, n, total))
            self.session.clear()
        yield pd.DataFrame(out, columns=cols)

    def close(self) -> None:
        pass


def sessionize_stream_tws(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """events stream (key, ts, value) → closed-session stream."""
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=SessionProcessor(gap_minutes),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
