"""Streaming sketch-table maintenance: the standing HLL sketch table,
unioned batch by batch, must estimate the same distinct-user counts as
a batch recomputation over everything that arrived (within the sketch
contract), survive restarts, and — unlike the count/sum merge — be
algebraically idempotent in the sketch column under batch replay."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from football_etl_pipeline_spark.streaming.events_stream import read_events_stream
from football_etl_pipeline_spark.streaming.sketch_maintenance import (
    maintain_user_distinct_sketches,
    merge_batch_sketches,
    read_standing_estimates,
)


def _write_events(path: str, rows: list[dict], fname: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, fname), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _ev(i, uid, etype):
    return {
        "event_id": i,
        "ts": "2024-01-01T00:00:30",
        "user_id": uid,
        "event_type": etype,
        "value": 1.0,
        "props": "{}",
    }


FIRST = [_ev(i, 100 + i % 7, "view") for i in range(10)] + [
    _ev(20 + i, 200 + i, "click") for i in range(5)
]
SECOND = [_ev(40 + i, 100 + i, "view") for i in range(12)] + [
    _ev(60 + i, 200 + i, "click") for i in range(3)
]


def _exact(spark, src):
    return {
        r["event_type"]: r["n"]
        for r in spark.read.json(src)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }


def _estimates(spark, state):
    return {
        r["event_type"]: (r["n_events"], r["est_users"])
        for r in read_standing_estimates(spark, state).collect()
    }


def test_standing_sketches_track_arrivals_across_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _write_events(src, FIRST, "a.jsonl")
    q = maintain_user_distinct_sketches(
        spark, read_events_stream(spark, src), state, ckpt
    )
    q.awaitTermination(120)
    est = _estimates(spark, state)
    exact = _exact(spark, src)
    assert set(est) == set(exact)
    for t, n_exact in exact.items():
        n_events, e = est[t]
        assert abs(e - n_exact) <= max(1, 0.1 * n_exact), (t, e, n_exact)
    # restart with a second delivery: only the new file is processed,
    # the standing sketches keep the first delivery's registers
    _write_events(src, SECOND, "b.jsonl")
    q2 = maintain_user_distinct_sketches(
        spark, read_events_stream(spark, src), state, ckpt
    )
    q2.awaitTermination(120)
    est = _estimates(spark, state)
    exact = _exact(spark, src)
    n_rows = sum(1 for _ in open(os.path.join(src, "a.jsonl"))) + sum(
        1 for _ in open(os.path.join(src, "b.jsonl"))
    )
    assert sum(n for n, _ in est.values()) == n_rows
    for t, n_exact in exact.items():
        _, e = est[t]
        assert abs(e - n_exact) <= max(1, 0.1 * n_exact), (t, e, n_exact)


def test_sketch_column_is_replay_idempotent(spark, tmp_path):
    """Replaying the SAME batch with a fresh batch_id (so the gate does
    not suppress it) must leave the distinct estimates unchanged — HLL
    union is register-wise max. The n_events rider DOES double-count in
    this scenario, which is exactly why it keeps the batch-id gate in
    real operation."""
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    _write_events(src, FIRST, "a.jsonl")
    batch = spark.read.json(src)
    merge_batch_sketches(spark, batch, state, batch_id=0)
    before = {t: e for t, (_, e) in _estimates(spark, state).items()}
    merge_batch_sketches(spark, batch, state, batch_id=1)  # replay, new id
    after = {t: e for t, (_, e) in _estimates(spark, state).items()}
    assert before == after


def test_gated_replay_is_a_noop_entirely(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    _write_events(src, FIRST, "a.jsonl")
    batch = spark.read.json(src)
    merge_batch_sketches(spark, batch, state, batch_id=0)
    before = _estimates(spark, state)
    merge_batch_sketches(spark, batch, state, batch_id=0)  # same id: gated
    assert _estimates(spark, state) == before


def test_interrupted_swap_is_recovered_for_sketches(spark, tmp_path):
    """Crash window between rename(state, '._old') and rename(tmp,
    state): the standing sketch table exists only at '._old' when the
    replayed batch arrives. The merge must restore it and fold the
    replayed batch exactly once — the resulting estimates must equal
    an uninterrupted twin run, and no '._old' may remain. Same replay
    proof as the count/sum face (test_streaming_agg_maintenance)."""
    src = str(tmp_path / "src")
    _write_events(src, FIRST, "a.jsonl")
    _write_events(src, SECOND, "b.jsonl")
    b0 = spark.read.json(os.path.join(src, "a.jsonl"))
    b1 = spark.read.json(os.path.join(src, "b.jsonl"))

    crashed = str(tmp_path / "state_crashed")
    merge_batch_sketches(spark, b0, crashed, batch_id=0)
    # simulate the crash: batch 1's swap moved the table aside, the
    # new table never landed, and the checkpoint never committed —
    # foreachBatch re-delivers batch_id=1 on restart
    os.rename(crashed, crashed + "._old")
    merge_batch_sketches(spark, b1, crashed, batch_id=1)

    clean = str(tmp_path / "state_clean")
    merge_batch_sketches(spark, b0, clean, batch_id=0)
    merge_batch_sketches(spark, b1, clean, batch_id=1)

    assert _estimates(spark, crashed) == _estimates(spark, clean)
    assert not os.path.exists(crashed + "._old")
    # a later replay of the recovered batch is still gated
    before = _estimates(spark, crashed)
    merge_batch_sketches(spark, b1, crashed, batch_id=1)
    assert _estimates(spark, crashed) == before
