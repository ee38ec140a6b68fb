"""Structured Streaming tests: stream/batch equivalence on the same
files, dead-letter routing, session windows, and watermark late-data
discard across micro-batches."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from football_etl_pipeline_spark.streaming.events_stream import (
    EVENTS_SCHEMA,
    read_events_stream,
    sessionized,
    split_valid,
    start_to_memory,
    windowed_counts,
    write_dead_letter,
)


def _write_events(path: str, rows: list[dict], fname: str = "part0.json") -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, fname), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _ev(i, ts, user=1, etype="click", value=1.0):
    return {
        "event_id": i,
        "ts": ts,
        "user_id": user,
        "event_type": etype,
        "value": value,
        "props": "{}",
    }


ROWS = [
    _ev(0, "2024-01-01T00:00:30", user=1, etype="view", value=2.0),
    _ev(1, "2024-01-01T00:01:10", user=1, etype="click", value=3.0),
    _ev(2, "2024-01-01T00:06:00", user=2, etype="click", value=5.0),
    _ev(3, "2024-01-01T00:07:45", user=2, etype="purchase", value=7.0),
    _ev(4, "2024-01-01T01:00:00", user=1, etype="view", value=1.0),
]


def test_stream_batch_equivalence(spark, tmp_path):
    """availableNow stream result == batch result over the same files,
    restricted to windows the final watermark has CLOSED — append mode
    never emits still-open windows; that is the contract, not a bug."""
    import datetime

    src = str(tmp_path / "src")
    _write_events(src, ROWS)

    stream = read_events_stream(spark, src)
    assert stream.isStreaming
    q = start_to_memory(
        windowed_counts(stream), "wc_stream", str(tmp_path / "ck"), "append"
    )
    q.awaitTermination(120)
    got = {
        (r.window_start.isoformat(), r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM wc_stream").collect()
    }

    batch = spark.read.schema(EVENTS_SCHEMA).json(src)
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    final_watermark = max_ts - datetime.timedelta(minutes=10)
    closed = windowed_counts(batch).filter(F.col("window_end") <= final_watermark)
    want = {
        (r.window_start.isoformat(), r.event_type): (r.n_events, r.total_value)
        for r in closed.collect()
    }
    assert got == want
    assert len(want) == 4  # every window except the open 01:00 one


def test_dead_letter_routing(spark, tmp_path):
    """Invalid rows (null required field / unknown type) land in the
    dead-letter sink with a reason; valid rows don't."""
    src = str(tmp_path / "src")
    bad = [
        {**_ev(10, "2024-01-01T00:00:00"), "user_id": None},
        {**_ev(11, "2024-01-01T00:00:01"), "event_type": "mystery"},
    ]
    _write_events(src, ROWS + bad)

    valid, dead = split_valid(read_events_stream(spark, src))
    dl_path = str(tmp_path / "dead")
    q1 = start_to_memory(valid, "valid_stream", str(tmp_path / "ck"), "append")
    q2 = write_dead_letter(dead, dl_path, str(tmp_path / "ck"))
    q1.awaitTermination(120)
    q2.awaitTermination(120)

    n_valid = spark.sql("SELECT count(*) c FROM valid_stream").collect()[0].c
    assert n_valid == len(ROWS)
    dl = spark.read.json(dl_path)
    errs = {r.event_id: r._error for r in dl.collect()}
    assert errs[10] == "missing user_id"
    assert errs[11] == "unknown event_type: mystery"


def test_sessionization(spark, tmp_path):
    """Session windows merge events within the 30-min gap and split
    across it. User 1's 01:00 session is still OPEN when the stream
    drains (watermark stops at 00:50), so append mode withholds it —
    only the closed sessions are emitted."""
    src = str(tmp_path / "src")
    _write_events(src, ROWS)
    q = start_to_memory(
        sessionized(read_events_stream(spark, src)),
        "sess_stream",
        str(tmp_path / "ck"),
        "append",
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM sess_stream ORDER BY user_id, session_start"
    ).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r.n_events)
    assert by_user == {1: [2], 2: [2]}


def test_stateful_user_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-user accumulators across
    micro-batches: after feeding two batches, the LAST emission per
    user equals the all-data batch aggregate."""
    from football_etl_pipeline_spark.streaming.events_stream import (
        stateful_user_totals,
    )

    src = str(tmp_path / "src")
    _write_events(src, ROWS[:3], "b1.json")
    q = (
        stateful_user_totals(read_events_stream(spark, src))
        .writeStream.format("memory")
        .queryName("state_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck" / "state"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write_events(src, ROWS[3:], "b2.json")
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM state_stream").collect()
    finally:
        q.stop()
    # last emission per user wins (update mode appends each revision
    # to the memory sink; take the max n_events per user)
    latest = {}
    for r in rows:
        if r.user_id not in latest or r.n_events > latest[r.user_id].n_events:
            latest[r.user_id] = r
    want = {
        r.user_id: (r.n, r.t)
        for r in spark.read.schema(EVENTS_SCHEMA)
        .json(src)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    got = {u: (r.n_events, r.total_value) for u, r in latest.items()}
    assert got == want


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Stream-stream attribution join (views→purchase within 30 min)
    emits exactly the batch join's matches once the stream drains."""
    from football_etl_pipeline_spark.streaming.events_stream import (
        view_to_purchase_join,
    )

    rows = [
        _ev(0, "2024-01-01T00:00:00", user=1, etype="view"),
        _ev(1, "2024-01-01T00:10:00", user=1, etype="view"),
        _ev(2, "2024-01-01T00:20:00", user=1, etype="purchase", value=9.0),
        _ev(3, "2024-01-01T02:00:00", user=1, etype="purchase", value=5.0),  # no view in window
        _ev(4, "2024-01-01T00:15:00", user=2, etype="view"),  # other user
        _ev(5, "2024-01-01T03:00:00", user=3, etype="view"),  # advances watermark
    ]
    src = str(tmp_path / "src")
    _write_events(src, rows)
    q = start_to_memory(
        view_to_purchase_join(read_events_stream(spark, src)),
        "ss_join",
        str(tmp_path / "ck"),
        "append",
    )
    q.awaitTermination(120)
    got = sorted(
        (r.purchase_id, r.view_id)
        for r in spark.sql("SELECT * FROM ss_join").collect()
    )
    batch = spark.read.schema(EVENTS_SCHEMA).json(src)
    want = sorted(
        (r.purchase_id, r.view_id)
        for r in view_to_purchase_join(batch).collect()
    )
    assert got == want
    assert got == [(2, 0), (2, 1)]  # both views attribute; 02:00 purchase has none


def test_foreach_batch_sink(spark, tmp_path):
    """foreachBatch lands every micro-batch through the batch writer,
    partitioned by batch_id; the union of batches equals the input."""
    from football_etl_pipeline_spark.streaming.events_stream import (
        write_foreach_batch,
    )

    src = str(tmp_path / "src")
    _write_events(src, ROWS)
    out = str(tmp_path / "out")
    q = write_foreach_batch(
        read_events_stream(spark, src), out, str(tmp_path / "ck")
    )
    q.awaitTermination(120)
    back = spark.read.parquet(out)
    assert back.count() == len(ROWS)
    assert "batch_id" in back.columns  # partition-discovered column
    assert sorted(r.event_id for r in back.collect()) == [0, 1, 2, 3, 4]


def test_watermark_discards_late_data(spark, tmp_path):
    """A row arriving after the watermark passed its window is
    dropped: feed a first batch that advances event time to 01:00
    (watermark 10 min ⇒ 00:50), then a straggler at 00:02 — its
    00:00-00:05 window is already finalized without it."""
    src = str(tmp_path / "src")
    _write_events(src, ROWS, "batch1.json")

    stream = read_events_stream(spark, src)
    q = (
        windowed_counts(stream)
        .writeStream.format("memory")
        .queryName("late_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck" / "late"))
        .start()
    )
    try:
        q.processAllAvailable()  # watermark now 01:00 − 10min = 00:50
        _write_events(
            src,
            [_ev(99, "2024-01-01T00:02:00", user=3, etype="view", value=100.0)],
            "batch2_late.json",
        )
        q.processAllAvailable()
        # one more batch so append-mode emits every closed window
        _write_events(
            src,
            [_ev(100, "2024-01-01T02:00:00", user=3, etype="view", value=1.0)],
            "batch3.json",
        )
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM late_stream").collect()
    finally:
        q.stop()
    first_window_views = [
        r.n_events
        for r in rows
        if r.window_start.isoformat() == "2024-01-01T00:00:00"
        and r.event_type == "view"
    ]
    # the straggler (value=100, 00:02) must NOT appear: count stays 1
    assert first_window_views == [1]
    assert all(r.total_value < 100.0 for r in rows)


def test_sliding_window_stream_batch_equivalence(spark, tmp_path):
    """Sliding windows (10 min span / 5 min slide): every event counted
    in exactly two windows; availableNow stream == batch restricted to
    watermark-closed windows."""
    import datetime

    from football_etl_pipeline_spark.streaming.events_stream import (
        sliding_counts,
    )

    src = str(tmp_path / "src")
    _write_events(src, ROWS)

    stream = read_events_stream(spark, src)
    q = start_to_memory(
        sliding_counts(stream), "slide_stream", str(tmp_path / "ck_slide"), "append"
    )
    q.awaitTermination(120)
    got = {
        (r.window_start.isoformat(), r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM slide_stream").collect()
    }

    batch = spark.read.schema(EVENTS_SCHEMA).json(src)
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    final_watermark = max_ts - datetime.timedelta(minutes=10)
    closed = sliding_counts(batch).filter(F.col("window_end") <= final_watermark)
    want = {
        (r.window_start.isoformat(), r.event_type): r.n_events
        for r in closed.collect()
    }
    assert got == want
    # each of the 4 early events lands in two overlapping windows;
    # dedupe by window_start proves the overlap actually happened
    assert sum(want.values()) == 8


def test_streaming_dedup_across_batches(spark, tmp_path):
    """dropDuplicatesWithinWatermark: the same event_id delivered in
    two different files (micro-batches) is emitted exactly once."""
    from football_etl_pipeline_spark.streaming.events_stream import (
        deduped_stream,
    )

    src = str(tmp_path / "src")
    _write_events(src, ROWS, fname="part0.json")
    # redeliver two of the same events + one genuinely new one
    _write_events(
        src,
        [
            _ev(1, "2024-01-01T00:01:10", user=1, etype="click", value=3.0),
            _ev(2, "2024-01-01T00:06:00", user=2, etype="click", value=5.0),
            _ev(9, "2024-01-01T00:09:00", user=3, etype="view", value=4.0),
        ],
        fname="part1.json",
    )

    stream = read_events_stream(spark, src)
    q = start_to_memory(
        deduped_stream(stream), "dedup_stream", str(tmp_path / "ck_dd"), "append"
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM dedup_stream").collect()
    ids = sorted(r.event_id for r in rows)
    assert ids == [0, 1, 2, 3, 4, 9]  # 5 originals + the new id 9, no dupes


def test_stream_stream_left_outer_emits_nulls_after_watermark(spark, tmp_path):
    """LEFT OUTER stream-stream join: unmatched views emit with NULL
    purchase once the purchase watermark passes view_ts + 30 min;
    views still inside the join horizon at end-of-stream are WITHHELD
    (not emitted with premature nulls, not dropped)."""
    from football_etl_pipeline_spark.streaming.events_stream import (
        view_to_purchase_join_outer,
    )

    first = [
        _ev(0, "2024-01-01T00:00:00", user=1, etype="view"),
        _ev(1, "2024-01-01T00:20:00", user=1, etype="purchase", value=9.0),
        _ev(2, "2024-01-01T00:05:00", user=2, etype="view"),   # never converts
        _ev(3, "2024-01-01T00:15:00", user=4, etype="view"),   # never converts
    ]
    # sentinels delivered in a SECOND batch: the GLOBAL watermark is
    # min(view-side, purchase-side), so BOTH sides need a late event
    # (a view-only sentinel leaves the purchase watermark at 00:10 and
    # no null ever finalizes — the multi-watermark policy gotcha this
    # test documents). user 8/9 have no counterpart, so neither
    # sentinel matches anything.
    second = [
        _ev(4, "2024-01-01T05:00:00", user=9, etype="view"),
        _ev(6, "2024-01-01T05:00:00", user=8, etype="purchase", value=1.0),
    ]
    src = str(tmp_path / "src")
    _write_events(src, first)
    q = start_to_memory(
        view_to_purchase_join_outer(read_events_stream(spark, src)),
        "ss_outer",
        str(tmp_path / "ck"),
        "append",
        available_now=False,
    )
    try:
        q.processAllAvailable()
        _write_events(src, second, "b2.json")
        q.processAllAvailable()
        # outer rows emit in the batch AFTER the watermark advances —
        # a third delivery triggers that batch deterministically
        _write_events(
            src,
            [
                _ev(5, "2024-01-01T05:01:00", user=9, etype="view"),
                _ev(7, "2024-01-01T05:01:00", user=8, etype="purchase", value=1.0),
            ],
            "b3.json",
        )
        q.processAllAvailable()
        got = sorted(
            (r.view_id, r.purchase_id)
            for r in spark.sql("SELECT * FROM ss_outer").collect()
        )
    finally:
        q.stop()
    # view 0 matched; views 2 and 3 emit null rows; the sentinel views
    # 4/5 are withheld — their no-match verdicts are not final yet
    assert got == [(0, 1), (2, None), (3, None)], got


def test_session_window_boundary_semantics(spark):
    """Pin the convention events_session_window_native's oracle
    encodes: Spark's session_window MERGES an event arriving at
    exactly prev_event + gap (touching half-open windows), and splits
    strictly after. Driven over adversarial gap sequences (0, ±1s
    around the timeout, exact timeout) against a Python reference of
    the merge-on-touch rule."""
    import datetime as dt

    from pyspark.sql import functions as F2

    GAP = 1800
    cases = [
        [0, 1800, 1800, 1800],          # chain of exact-timeout touches
        [0, 1799, 1801, 1800, 3600],    # just-under, just-over, exact
        [0, 0, 0],                      # simultaneous events
        [0, 1801, 1801],                # all splits
        [0, 1, 2, 5400, 5401],          # cluster, jump, cluster
    ]
    base = dt.datetime(2024, 1, 1)
    for offsets in cases:
        ts = [base + dt.timedelta(seconds=o) for o in offsets]
        df = spark.createDataFrame([(1, t) for t in ts], ["user_id", "ts"])
        got = sorted(
            (r["w"]["start"], r["w"]["end"], r["n"])
            for r in df.groupBy(
                "user_id",
                F2.session_window("ts", f"{GAP} seconds").alias("w"),
            )
            .agg(F2.count(F2.lit(1)).alias("n"))
            .collect()
        )
        # python reference: merge while delta <= GAP
        want, cur = [], None
        for t in sorted(ts):
            if cur is None or (t - cur[1]).total_seconds() > GAP:
                if cur:
                    want.append(cur)
                cur = [t, t, 1]
            else:
                cur[1], cur[2] = t, cur[2] + 1
        want.append(cur)
        want = sorted(
            (s, e + dt.timedelta(seconds=GAP), n) for s, e, n in want
        )
        assert got == want, (offsets, got, want)


def test_state_partitions_restores_on_exception(spark):
    """The streaming-query state-sizing context manager must restore
    the session shuffle-partition default even when the stream fails —
    a leaked 8-partition conf would silently shrink every later batch
    query's parallelism."""
    from football_etl_pipeline_spark.operators.streaming_query import (
        _state_partitions,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        with _state_partitions(spark, 8):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "8"
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


class _FakeQuery:
    """Duck-typed StreamingQuery for the awaitTermination contract."""

    def __init__(self, finished: bool, active: bool):
        self._finished = finished
        self._active = active
        self.stopped = False

    def awaitTermination(self, timeout):
        return self._finished

    @property
    def isActive(self):
        return self._active

    def stop(self):
        self.stopped = True


def test_await_or_raise_timeout_path():
    """Every memory-sink gate query routes through _await_or_raise;
    a stream still active after the timeout must be STOPPED and the
    read refused (TimeoutError), never silently read as a partial
    snapshot — the round-13 hardening of the round-11 sprt lesson."""
    from football_etl_pipeline_spark.operators.streaming_query import (
        _await_or_raise,
    )

    hung = _FakeQuery(finished=False, active=True)
    with pytest.raises(TimeoutError, match="partial sink snapshot"):
        _await_or_raise(hung, "unit_label", timeout_sec=1)
    assert hung.stopped

    # normal completion: no raise, no stop
    done = _FakeQuery(finished=True, active=False)
    _await_or_raise(done, "unit_label", timeout_sec=1)
    assert not done.stopped

    # finished=False but already inactive (terminated between the
    # timeout and the isActive check): treated as completed
    raced = _FakeQuery(finished=False, active=False)
    _await_or_raise(raced, "unit_label", timeout_sec=1)
    assert not raced.stopped


def test_all_streaming_gate_rows_use_checked_await():
    """Grep-level pin: no streaming gate row may call awaitTermination
    directly — the checked helper is the only allowed form."""
    import football_etl_pipeline_spark.operators.streaming_query as sq
    import inspect

    src = inspect.getsource(sq)
    # the only direct awaitTermination call is inside the helper
    direct = [
        ln
        for ln in src.splitlines()
        if "awaitTermination(" in ln and "_await_or_raise" not in ln
        and "timeout_sec" not in ln
    ]
    assert direct == [], direct
