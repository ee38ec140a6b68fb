"""Arbitrary stateful streaming via Spark 4's transformWithState API
(``transformWithStateInPandas``) — the successor to
``applyInPandasWithState`` (exercised in ``events_stream.py``): typed
per-key state handles (value/list/map), REGISTERED TIMERS, and
event-time semantics driven by the watermark.

The operator here is the canonical timer use case the old API cannot
express directly: true idle-timeout session CLOSURE. State accumulates
per-user activity; every arrival re-arms an event-time timer at
``last_ts + gap``; when the WATERMARK passes that point the timer
fires and the processor emits exactly one closed-session row and
clears the state. Emission is timer-driven (nothing emitted on
input), which is how a production sessionizer avoids emitting
still-open sessions.

Scale: state is one small row per ACTIVE key (closed keys are
cleared), timers live in the state store alongside it, and the
whole operator shuffles once on the grouping key — identical runtime
shape to the native ``session_window`` aggregate but with arbitrary
per-session payload logic.

Runtime seam: transformWithState's Python side requires
``google.protobuf`` (the state-server wire format), which is absent
from this container (installs prohibited) — the same documented seam
as the media codecs. Plan construction, schemas, and the processor
logic are real and always-tested; the end-to-end goldens gate on
``importorskip("google.protobuf")`` and execute wherever the lib
exists.

Correctness evidence: ``tests/test_streaming_state_v2.py`` drives
file-by-file micro-batches (availableNow + maxFilesPerTrigger=1) and
asserts the emitted closed sessions equal the BATCH 30-min-gap
sessionization of the same corpus (the stream≡batch house pattern).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

SESSION_GAP_MS = 30 * 60 * 1000

_STATE_SCHEMA = (
    "open_ts_ms long, last_ts_ms long, n_events long, total_value double,"
    " timer_ms long"
)
OUTPUT_SCHEMA = (
    "user_id long, session_open_ms long, session_close_ms long,"
    " n_events long, total_value double"
)


def _sessions_pdf(uid, sessions):
    """One output pandas frame for a list of (open, close, n, total)."""
    return pd.DataFrame(
        {
            "user_id": [uid] * len(sessions),
            "session_open_ms": [s[0] for s in sessions],
            "session_close_ms": [s[1] for s in sessions],
            "n_events": [s[2] for s in sessions],
            "total_value": [s[3] for s in sessions],
        }
    )


class SessionCloser(StatefulProcessor):
    """Per-user idle-timeout sessionizer: accumulate on input, emit on
    timer expiry only."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.state = handle.getValueState("sess", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues: TimerValues):
        open_ms, last_ms, n, total, timer_ms = (
            self.state.get() if self.state.exists() else (None, None, 0, 0.0, None)
        )
        pairs = []
        for pdf in rows:
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).tolist()
            vals = pdf["value"].astype("float64").tolist()
            pairs.extend(zip(ts_ms, vals))
        pairs.sort()
        # Split sessions INLINE: the eviction watermark lags one
        # micro-batch, so a post-gap arrival would otherwise be merged
        # into the open session before its timer can fire.  When an
        # in-order event lands past the idle gap, close the current
        # session here and start a new one; the registered timer is
        # then only the idle-tail closer.
        closed = []
        for t, v in pairs:
            if last_ms is not None and t > last_ms + SESSION_GAP_MS:
                closed.append((open_ms, last_ms, n, total))
                open_ms, last_ms, n, total = None, None, 0, 0.0
            # min-update: an out-of-order event inside the watermark may
            # predate the session's first-SEEN event; batch ground truth
            # is min(ts), so track it, not first-seen.
            open_ms = t if open_ms is None else min(open_ms, t)
            last_ms = t if last_ms is None else max(last_ms, t)
            n += 1
            total += v
        # re-arm: ONE live timer per key (delete the stale one — a
        # fired stale timer would close the session too early)
        if timer_ms is not None:
            self.handle.deleteTimer(timer_ms)
        new_timer = last_ms + SESSION_GAP_MS
        self.handle.registerTimer(new_timer)
        self.state.update((open_ms, last_ms, n, total, new_timer))
        if closed:
            return iter((_sessions_pdf(key[0], closed),))
        return iter(())  # nothing emitted while the session stays open

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ):
        if not self.state.exists():
            return iter(())
        open_ms, last_ms, n, total, timer_ms = self.state.get()
        if expiredTimerInfo.getExpiryTimeInMs() < last_ms + SESSION_GAP_MS:
            # stale timer that escaped deletion (e.g. replay) — the
            # session saw newer activity, keep it open
            return iter(())
        self.state.clear()
        return iter((_sessions_pdf(key[0], [(open_ms, last_ms, n, total)]),))

    def close(self) -> None:
        pass


def closed_sessions(events: DataFrame, watermark: str = "0 seconds") -> DataFrame:
    """Watermarked stream of CLOSED user sessions (30-min idle gap),
    emitted exactly when the watermark passes each session's timeout."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionCloser(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )
