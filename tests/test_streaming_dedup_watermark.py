"""Bounded-state streaming dedup (dropDuplicatesWithinWatermark):
stream output ≡ batch dropDuplicates when duplicates arrive within
the watermark window, duplicates are dropped ACROSS micro-batches,
and a checkpointed restart does not re-emit."""

from __future__ import annotations

import json
import os

from football_etl_pipeline_spark.streaming.stream_dedup import (
    run_dedup_to_parquet,
)

ROWS_A = [
    {"event_id": 1, "ts": "2025-01-01T10:00:00", "user_id": 10,
     "event_type": "view", "value": 1.0, "props": "{}"},
    {"event_id": 2, "ts": "2025-01-01T10:00:30", "user_id": 11,
     "event_type": "click", "value": 2.0, "props": "{}"},
]
# file B re-delivers event 2 (same key, within the 10-min watermark of
# its first copy) and adds event 3
ROWS_B = [
    {"event_id": 2, "ts": "2025-01-01T10:00:30", "user_id": 11,
     "event_type": "click", "value": 2.0, "props": "{}"},
    {"event_id": 3, "ts": "2025-01-01T10:02:00", "user_id": 12,
     "event_type": "purchase", "value": 3.0, "props": "{}"},
]


def _write(src, rows, fname):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, fname), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_cross_batch_dedup_matches_batch(spark, tmp_path):
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    _write(src, ROWS_A, "a.jsonl")
    _write(src, ROWS_B, "b.jsonl")
    q = run_dedup_to_parquet(spark, src, out, ck)
    q.awaitTermination(300)
    got = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]  # the re-delivered event 2 appears ONCE
    # stream ≡ batch on the same files
    from football_etl_pipeline_spark.streaming.events_stream import (
        EVENTS_SCHEMA,
    )

    batch = (
        spark.read.format("json")
        .schema(EVENTS_SCHEMA)
        .load(src)
        .dropDuplicates(["event_id"])
    )
    assert sorted(r.event_id for r in batch.collect()) == got


def test_checkpointed_restart_does_not_reemit(spark, tmp_path):
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    _write(src, ROWS_A, "a.jsonl")
    run_dedup_to_parquet(spark, src, out, ck).awaitTermination(300)
    _write(src, ROWS_B, "b.jsonl")  # arrives later; same checkpoint
    run_dedup_to_parquet(spark, src, out, ck).awaitTermination(300)
    got = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]
