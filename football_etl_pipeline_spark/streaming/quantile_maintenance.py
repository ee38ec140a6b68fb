"""Streaming maintenance of a standing QUANTILE sketch table: per
micro-batch, histogram the batch's ``value`` column on a fixed
integer-bucket grid and merge the per-(event_type, bucket) counts into
a standing parquet table — the percentile sibling of
``sketch_maintenance.py``'s HLL table and the streaming face of
``operators/events.events_quantile_sketch_rollup``. p50/p99 SLA reads
then come off the standing histogram without ever rescanning the fact
table: the rollup property exact percentiles lack (order statistics
don't compose; fixed-grid histograms compose by plain SUM).

Fidelity contract: quantiles are exact AT GRID RESOLUTION — the
reported value is the upper edge of the bucket where the target rank
lands (bucket width 1/{VALUE_BUCKETS_PER_UNIT} value units). That
makes every read deterministic and engine-exact (integer counts,
integer rank arithmetic), unlike a sampling sketch whose estimates
are implementation-specific — the same design choice the repo's
other cross-engine numerics make.

Replay safety: histogram counts compose by SUM, which — like the
``n_events`` rider in the HLL table and unlike HLL's register-max —
DOUBLE-COUNTS on redelivery. The standing table therefore keeps the
house batch-id gate (``agg_maintenance`` marker protocol): a rebuilt
checkpoint replays batch ids from 0 and every gated merge is a no-op.

Scale: per batch this reads the standing table (≤ |event_type| ×
|buckets| rows, bounded by the grid — ~2.5k rows here), aggregates
ONLY the batch, and writes the merged histogram back. The quantile
read is a window cumsum over the standing rows — never the raw
events.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .agg_maintenance import (
    _gate_replay,
    _recover_interrupted_swap,
    _swap_write,
)

# Fixed grid: bucket = floor(value * 4) (quarter-unit buckets). The
# ×4 scaling is a power of two, so it is EXACT on doubles and the
# bucket id is bit-identical in every engine reading the same column.
VALUE_BUCKETS_PER_UNIT = 4

# The SLA percentiles the standing table answers.
QUANTILE_PCTS = (50, 95, 99)


def bucket_col(value_col: str = "value"):
    return (
        F.floor(F.col(value_col) * VALUE_BUCKETS_PER_UNIT)
        .cast("bigint")
        .alias("bucket")
    )


def merge_batch_histogram(
    spark: SparkSession,
    batch_df: DataFrame,
    state_path: str,
    batch_id: int | None = None,
) -> None:
    """SUM one micro-batch's (event_type, bucket) counts into the
    standing histogram table, gated on batch id (counts are NOT
    replay-idempotent — the gate is load-bearing here, not a rider)."""
    if _gate_replay(state_path, batch_id):
        return
    batch_h = batch_df.select("event_type", bucket_col()).groupBy(
        "event_type", "bucket"
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    if os.path.exists(state_path):
        standing = spark.read.parquet(state_path).select(
            "event_type", "bucket", "cnt"
        )
        merged = (
            standing.unionByName(batch_h)
            .groupBy("event_type", "bucket")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
    else:
        merged = batch_h
    _swap_write(merged, state_path, batch_id)


def maintain_value_histograms(
    spark: SparkSession,
    events_stream: DataFrame,
    state_path: str,
    checkpoint_dir: str,
):
    """Start the histogram-maintenance stream; availableNow drains
    the backlog then stops."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_histogram(spark, batch_df, state_path, batch_id=batch_id)

    return (
        events_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def quantiles_from_histogram(hist: DataFrame) -> DataFrame:
    """(event_type, n_rows, p50_upper, p95_upper, p99_upper) from an
    (event_type, bucket, cnt) histogram frame: window cumsum in
    bucket order, target rank ceil(n·q/100) in pure integer math,
    reported value = the landing bucket's upper edge. Shared by the
    batch rollup query and the standing-table read."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = Window.partitionBy("event_type")
    c = hist.select(
        "event_type",
        "bucket",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(n).alias("n"),
    )
    aggs = [F.max("n").cast("bigint").alias("n_rows")]
    for q in QUANTILE_PCTS:
        # cum >= ceil(n*q/100) on integers ⟺ 100*cum >= n*q
        aggs.append(
            (
                (
                    F.min(
                        F.when(
                            F.col("cum") * 100 >= F.col("n") * q,
                            F.col("bucket"),
                        )
                    )
                    + 1
                ).cast("double")
                / VALUE_BUCKETS_PER_UNIT
            ).alias(f"p{q}_upper")
        )
    return c.groupBy("event_type").agg(*aggs)


def read_standing_quantiles(
    spark: SparkSession, state_path: str
) -> DataFrame:
    """The query side: SLA percentiles off the standing histogram —
    no raw-event scan."""
    _recover_interrupted_swap(state_path)
    return quantiles_from_histogram(spark.read.parquet(state_path))
