"""Streaming maintenance of a standing DISTINCT-COUNT sketch table:
per micro-batch, build day-grain HLL sketches of distinct users per
event type and union them into a standing parquet sketch table — the
streaming face of ``operators/events.events_sketch_rollup_merge`` and
the pattern that keeps "distinct users ever" queryable at 100 TB
without ever rescanning history (exact distincts cannot be maintained
incrementally without keeping the full key set; sketches compose).

The replay-safety story here is BETTER than the count/sum merge in
``agg_maintenance``: HLL union is register-wise max, so unioning the
same batch's sketch twice is algebraically a no-op — the sketch
column is exactly-once BY CONSTRUCTION under foreachBatch's
at-least-once delivery. The ``n_events`` rider column is NOT
idempotent (it double-counts on replay), so the standing table keeps
the house batch-id gate for it; a sketch-only table could drop the
gate entirely.

Scale: per batch this reads the standing table (|event_type| rows),
sketch-aggregates ONLY the batch, and writes |event_type| rows back
— identical cost profile to ``agg_maintenance``, with the sketch
BLOB (~2.5 KiB at lgK=12) as the only payload growth.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .agg_maintenance import (
    _gate_replay,
    _recover_interrupted_swap,
    _swap_write,
)

HLL_LG_K = 12


def merge_batch_sketches(
    spark: SparkSession,
    batch_df: DataFrame,
    state_path: str,
    batch_id: int | None = None,
) -> None:
    """Union one micro-batch's per-type HLL user sketches into the
    standing (event_type, sk, n_events) parquet table."""
    if _gate_replay(state_path, batch_id):
        return
    batch_sk = batch_df.groupBy("event_type").agg(
        F.expr(f"hll_sketch_agg(user_id, {HLL_LG_K})").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    if os.path.exists(state_path):
        standing = spark.read.parquet(state_path).select(
            "event_type", "sk", "n_events"
        )
        # Union-all then hll_union_agg: groups present on only one
        # side pass their sketch through unchanged; no null-handling
        # full-outer join needed — the union IS the merge.
        merged = (
            standing.unionByName(batch_sk)
            .groupBy("event_type")
            .agg(
                F.expr("hll_union_agg(sk, false)").alias("sk"),
                F.sum("n_events").cast("long").alias("n_events"),
            )
        )
    else:
        merged = batch_sk
    _swap_write(merged, state_path, batch_id)


def maintain_user_distinct_sketches(
    spark: SparkSession,
    events_stream: DataFrame,
    state_path: str,
    checkpoint_dir: str,
):
    """Start the sketch-maintenance stream; availableNow drains the
    backlog then stops."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_sketches(spark, batch_df, state_path, batch_id=batch_id)

    return (
        events_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_standing_estimates(spark: SparkSession, state_path: str) -> DataFrame:
    """(event_type, n_events, est_users) from the standing sketches —
    the query side: estimate without touching raw history."""
    _recover_interrupted_swap(state_path)
    return spark.read.parquet(state_path).select(
        "event_type",
        "n_events",
        F.expr("hll_sketch_estimate(sk)").alias("est_users"),
    )
