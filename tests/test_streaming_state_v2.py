"""transformWithState (Spark 4 arbitrary-state API) session closure:
timer-driven emission must equal batch 30-min-gap sessionization.

Micro-batch boundaries matter for event-time timers (a timer fires
when a LATER batch's watermark passes it), so the stream is driven
file-by-file (availableNow + maxFilesPerTrigger=1) with a final
far-future sentinel file that pushes the watermark past every real
session's timeout."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from football_etl_pipeline_spark.streaming.state_v2 import (
    SESSION_GAP_MS,
    closed_sessions,
)

SENTINEL_USER = 999_999


def _ev(i, uid, minute, value=1.5):
    return {
        "event_id": i,
        "ts": f"2024-01-01T{minute // 60:02d}:{minute % 60:02d}:00",
        "user_id": uid,
        "event_type": "view",
        "value": value,
        "props": "{}",
    }


# user 1: two sessions (gap 45 min between minute 10 and minute 55);
# user 2: one session spanning both deliveries (gap 20 min < 30).
FIRST = [
    _ev(1, 1, 0),
    _ev(2, 1, 10),
    _ev(3, 2, 5),
]
SECOND = [
    _ev(4, 1, 55),
    _ev(5, 2, 25),
    _ev(6, 2, 45),
]
# far-future sentinel: watermark jumps past every timeout above
FLUSH = [_ev(7, SENTINEL_USER, 60 * 23)]


def _write(path, rows, fname):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, fname), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _batch_sessions(spark, rows):
    """Ground truth: batch gaps-and-islands sessionization."""
    df = spark.createDataFrame(
        [(r["user_id"], r["ts"], r["value"]) for r in rows],
        "user_id long, ts string, value double",
    ).select("user_id", F.to_timestamp("ts").alias("ts"), "value")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap_ms = (
        F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))
    )
    sess = df.withColumn(
        "new_s",
        F.when(gap_ms.isNull() | (gap_ms > SESSION_GAP_MS), 1).otherwise(0),
    ).withColumn(
        "sid",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    rows_out = (
        sess.groupBy("user_id", "sid")
        .agg(
            F.min(F.unix_millis("ts")).alias("session_open_ms"),
            F.max(F.unix_millis("ts")).alias("session_close_ms"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .collect()
    )
    return {
        (r.user_id, r.session_open_ms, r.session_close_ms, r.n_events,
         round(r.total_value, 6))
        for r in rows_out
    }


# transformWithState's PYTHON RUNTIME needs google.protobuf (the state
# server speaks proto); the lib is absent from this container and
# installs are prohibited — same seam policy as the media codecs: the
# end-to-end goldens gate on importorskip and run for real wherever
# protobuf exists, while the always-run test below pins that the
# operator BUILDS (schema + TransformWithState logical node) without it.



def test_closed_sessions_plan_builds_without_protobuf(spark):
    stream = (
        spark.readStream.format("rate")
        .load()
        .selectExpr(
            "value AS user_id", "timestamp AS ts", "CAST(1.5 AS DOUBLE) AS value"
        )
    )
    df = closed_sessions(stream)
    assert [f.name for f in df.schema.fields] == [
        "user_id",
        "session_open_ms",
        "session_close_ms",
        "n_events",
        "total_value",
    ]
    assert "TransformWithState" in df._jdf.queryExecution().logical().toString()


def test_timer_closed_sessions_equal_batch_sessionization(spark, tmp_path):
    pytest.importorskip("google.protobuf")
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    _write(src, FIRST, "a.jsonl")
    _write(src, SECOND, "b.jsonl")
    _write(src, FLUSH, "c.jsonl")

    stream = (
        spark.readStream.format("json")
        .schema(
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    q = (
        closed_sessions(stream)
        .writeStream.format("memory")
        .queryName("closed_sessions_v2")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.user_id, r.session_open_ms, r.session_close_ms, r.n_events,
         round(r.total_value, 6))
        for r in spark.sql("SELECT * FROM closed_sessions_v2").collect()
        if r.user_id != SENTINEL_USER
    }
    want = _batch_sessions(spark, FIRST + SECOND)
    assert got == want, (sorted(got), sorted(want))


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


class _FakeHandle:
    """Minimal StatefulProcessorHandle stand-in: one value state, a
    set of live timers — lets the processor LOGIC run without the
    protobuf state server."""

    def __init__(self):
        self.state = _FakeValueState()
        self.timers = set()

    def getValueState(self, name, schema):
        return self.state

    def registerTimer(self, ms):
        self.timers.add(ms)

    def deleteTimer(self, ms):
        self.timers.discard(ms)


class _ExpiredInfo:
    def __init__(self, ms):
        self._ms = ms

    def getExpiryTimeInMs(self):
        return self._ms


def _drive_processor(batches):
    """Drive SessionCloser directly: each batch is a list of (ts_ms,
    value); after all batches, fire every timer <= +inf watermark in
    order.  Returns emitted (open, close, n, total) tuples."""
    import pandas as pd

    from football_etl_pipeline_spark.streaming.state_v2 import SessionCloser

    proc = SessionCloser()
    handle = _FakeHandle()
    proc.init(handle)
    out = []

    def _collect(it):
        for pdf in it:
            for _, r in pdf.iterrows():
                out.append(
                    (
                        int(r["session_open_ms"]),
                        int(r["session_close_ms"]),
                        int(r["n_events"]),
                        round(float(r["total_value"]), 6),
                    )
                )

    for batch in batches:
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime([t for t, _ in batch], unit="ms"),
                "value": [v for _, v in batch],
            }
        )
        _collect(proc.handleInputRows((1,), iter([pdf]), None))
    for t in sorted(handle.timers):
        _collect(proc.handleExpiredTimer((1,), None, _ExpiredInfo(t)))
    return out


def test_processor_splits_post_gap_event_inline():
    """User 1's scenario from ADVICE: minute-0/10 events then a
    minute-55 arrival while the watermark still lags — the processor
    must emit the first session inline and open a second, matching
    batch sessionization (two sessions), not one merged span."""
    m = 60_000
    got = _drive_processor([[(0, 1.5), (10 * m, 1.5)], [(55 * m, 1.5)]])
    assert got == [(0, 10 * m, 2, 3.0), (55 * m, 55 * m, 1, 1.5)], got


def test_processor_min_updates_open_on_out_of_order_event():
    """An out-of-order event inside the watermark that PREDATES the
    session's first-seen event must pull session_open_ms back to the
    true min(ts)."""
    m = 60_000
    got = _drive_processor([[(10 * m, 1.0)], [(5 * m, 2.0)]])
    assert got == [(5 * m, 10 * m, 2, 3.0)], got


def test_processor_intra_batch_split_and_idle_tail():
    """Three sessions inside ONE batch: two closed inline, the tail by
    timer; sorted-order processing makes the splits deterministic."""
    m = 60_000
    got = _drive_processor(
        [[(0, 1.0), (40 * m, 1.0), (45 * m, 1.0), (90 * m, 1.0)]]
    )
    assert got == [
        (0, 0, 1, 1.0),
        (40 * m, 45 * m, 2, 2.0),
        (90 * m, 90 * m, 1, 1.0),
    ], got


def test_session_spanning_batches_stays_open_until_gap(spark, tmp_path):
    """User 2's activity straddles two deliveries with a 20-min gap:
    the timer re-arms and the session must close ONCE, spanning both
    batches — emitting per-batch partial sessions is the failure mode
    this API exists to avoid."""
    pytest.importorskip("google.protobuf")
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    _write(src, FIRST, "a.jsonl")
    _write(src, SECOND, "b.jsonl")
    _write(src, FLUSH, "c.jsonl")
    stream = (
        spark.readStream.format("json")
        .schema(
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    q = (
        closed_sessions(stream)
        .writeStream.format("memory")
        .queryName("closed_sessions_v2b")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    u2 = [
        r
        for r in spark.sql("SELECT * FROM closed_sessions_v2b").collect()
        if r.user_id == 2
    ]
    assert len(u2) == 1, u2
    assert u2[0].n_events == 3
