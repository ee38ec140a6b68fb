"""Streaming quantile-histogram maintenance: the standing fixed-grid
histogram, SUM-merged batch by batch behind the batch-id gate, must
answer the same grid-resolution percentiles as a batch recomputation
over everything that arrived, survive restarts, and refuse gated
replays (counts double-count without the gate — unlike the HLL
registers, the gate here is load-bearing, not a rider)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from football_etl_pipeline_spark.streaming.events_stream import (
    read_events_stream,
)
from football_etl_pipeline_spark.streaming.quantile_maintenance import (
    VALUE_BUCKETS_PER_UNIT,
    bucket_col,
    maintain_value_histograms,
    merge_batch_histogram,
    quantiles_from_histogram,
    read_standing_quantiles,
)


def _write_events(path: str, rows: list[dict], fname: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, fname), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _ev(i, etype, value):
    return {
        "event_id": i,
        "ts": "2024-01-01T00:00:30",
        "user_id": 100 + i,
        "event_type": etype,
        "value": value,
        "props": "{}",
    }


FIRST = [_ev(i, "view", 1.0 + i * 0.5) for i in range(20)] + [
    _ev(40 + i, "click", 10.0 + i) for i in range(5)
]
SECOND = [_ev(80 + i, "view", 50.0 + i * 2.0) for i in range(10)]


def _batch_quantiles(spark, src):
    hist = (
        spark.read.json(src)
        .select("event_type", bucket_col())
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return {
        r["event_type"]: (r["n_rows"], r["p50_upper"], r["p99_upper"])
        for r in quantiles_from_histogram(hist).collect()
    }


def _standing(spark, state):
    return {
        r["event_type"]: (r["n_rows"], r["p50_upper"], r["p99_upper"])
        for r in read_standing_quantiles(spark, state).collect()
    }


def test_standing_histogram_matches_batch_across_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _write_events(src, FIRST, "a.jsonl")
    q = maintain_value_histograms(
        spark, read_events_stream(spark, src), state, ckpt
    )
    q.awaitTermination(120)
    assert _standing(spark, state) == _batch_quantiles(spark, src)
    # restart: only the new file is processed, merged into standing
    _write_events(src, SECOND, "b.jsonl")
    q2 = maintain_value_histograms(
        spark, read_events_stream(spark, src), state, ckpt
    )
    q2.awaitTermination(120)
    assert _standing(spark, state) == _batch_quantiles(spark, src)


def test_gated_replay_is_a_noop(spark, tmp_path):
    """A rebuilt checkpoint redelivers batch ids from 0; the standing
    marker must swallow them — otherwise every count doubles."""
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    _write_events(src, FIRST, "a.jsonl")
    batch = spark.read.json(src)
    merge_batch_histogram(spark, batch, state, batch_id=0)
    before = _standing(spark, state)
    merge_batch_histogram(spark, batch, state, batch_id=0)  # replay
    assert _standing(spark, state) == before
    # and an UNGATED replay demonstrates why the gate is load-bearing
    merge_batch_histogram(spark, batch, state, batch_id=1)
    n_after = sum(n for n, _, _ in _standing(spark, state).values())
    n_before = sum(n for n, _, _ in before.values())
    assert n_after == 2 * n_before


def test_grid_resolution_contract():
    """The reported value is the landing bucket's UPPER edge: a value
    of exactly 1.0 lands in bucket 4 (floor(1.0*4)), upper edge
    1.25 — deterministic, engine-exact."""
    assert VALUE_BUCKETS_PER_UNIT == 4
