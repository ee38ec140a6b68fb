"""Streaming aggregate-table maintenance: the standing parquet
aggregate, folded batch by batch, must equal a batch re-aggregation
over everything that arrived — exactly (decimal sums), across
multiple stream restarts and an incremental second delivery."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from football_etl_pipeline_spark.streaming.agg_maintenance import (
    maintain_event_type_totals,
    merge_batch_into_standing,
    read_standing,
)
from football_etl_pipeline_spark.streaming.events_stream import read_events_stream


def _write_events(path: str, rows: list[dict], fname: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, fname), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _ev(i, ts, etype, value):
    return {
        "event_id": i,
        "ts": ts,
        "user_id": 1,
        "event_type": etype,
        "value": value,
        "props": "{}",
    }


FIRST = [
    _ev(0, "2024-01-01T00:00:30", "view", 2.25),
    _ev(1, "2024-01-01T00:01:10", "click", 3.5),
    _ev(2, "2024-01-01T00:06:00", "click", 5.125),
    _ev(3, "2024-01-01T00:07:45", "purchase", 7.0),
]
SECOND = [
    _ev(4, "2024-01-01T01:00:00", "view", 1.75),
    _ev(5, "2024-01-01T01:02:00", "signup", 0.5),
    _ev(6, "2024-01-01T01:03:00", "click", 9.625),
]


def _expected(spark, src):
    return {
        r["event_type"]: (r["n"], r["value_sum"])
        for r in spark.read.json(src)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("value_sum"),
        )
        .collect()
    }


def test_standing_agg_tracks_arrivals_across_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "standing.parquet")
    ck = str(tmp_path / "ck")

    _write_events(src, FIRST, "b0.json")
    q = maintain_event_type_totals(spark, read_events_stream(spark, src), state, ck)
    q.awaitTermination(300)
    got = {
        r["event_type"]: (r["n"], r["value_sum"])
        for r in read_standing(spark, state).collect()
    }
    assert got == _expected(spark, src)

    # second delivery, RESTARTED stream (new query, same checkpoint):
    # only the new file is processed, the standing table keeps history
    _write_events(src, SECOND, "b1.json")
    q = maintain_event_type_totals(spark, read_events_stream(spark, src), state, ck)
    q.awaitTermination(300)
    got = {
        r["event_type"]: (r["n"], r["value_sum"])
        for r in read_standing(spark, state).collect()
    }
    assert got == _expected(spark, src)
    assert got["click"][0] == 3  # both deliveries folded exactly once


def _standing_dict(spark, state):
    return {
        r["event_type"]: (r["n"], r["value_sum"])
        for r in read_standing(spark, state).collect()
    }


def test_replayed_batch_is_not_double_folded(spark, tmp_path):
    """foreachBatch is at-least-once: a crash after the merge but
    before the checkpoint commit re-delivers the SAME batch_id on
    restart. The merge must be a no-op on the replay."""
    state = str(tmp_path / "standing.parquet")
    batch = spark.createDataFrame(
        [("click", 3.5), ("view", 2.25)], "event_type string, value double"
    )
    merge_batch_into_standing(spark, batch, state, batch_id=0)
    before = _standing_dict(spark, state)
    # simulated replay of the committed batch
    merge_batch_into_standing(spark, batch, state, batch_id=0)
    assert _standing_dict(spark, state) == before
    # a genuinely new batch still folds
    merge_batch_into_standing(spark, batch, state, batch_id=1)
    assert _standing_dict(spark, state)["click"][0] == 2


def test_interrupted_swap_is_recovered(spark, tmp_path):
    """A crash between rename(state, old) and rename(tmp, state)
    leaves the standing table only at '._old'; the next merge must
    restore it, not cold-start and drop history."""
    state = str(tmp_path / "standing.parquet")
    b0 = spark.createDataFrame([("click", 3.5)], "event_type string, value double")
    merge_batch_into_standing(spark, b0, state, batch_id=0)
    # simulate the crash window: state moved aside, new state never landed
    os.rename(state, state + "._old")
    b1 = spark.createDataFrame([("click", 1.0)], "event_type string, value double")
    merge_batch_into_standing(spark, b1, state, batch_id=1)
    got = _standing_dict(spark, state)
    assert got["click"] == (2, 4.5)  # history survived the interrupted swap
    assert not os.path.exists(state + "._old")


def test_standing_agg_survives_noop_restart(spark, tmp_path):
    """Restarting with no new files must not double-fold anything."""
    src = str(tmp_path / "src")
    state = str(tmp_path / "standing.parquet")
    ck = str(tmp_path / "ck")

    _write_events(src, FIRST, "b0.json")
    for _ in range(2):
        q = maintain_event_type_totals(
            spark, read_events_stream(spark, src), state, ck
        )
        q.awaitTermination(300)
    got = {
        r["event_type"]: (r["n"], r["value_sum"])
        for r in read_standing(spark, state).collect()
    }
    assert got == _expected(spark, src)
