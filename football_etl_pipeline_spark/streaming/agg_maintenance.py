"""Streaming aggregate-table maintenance: keep a standing parquet
aggregate current under arriving micro-batches by merging each batch's
PARTIAL aggregates into the stored table — the streaming face of
``operators/maintenance.incremental_agg_merge`` and the scalable
alternative to re-aggregating history every batch.

Why foreachBatch and not native update-mode streaming aggregation:
update mode cannot write parquet (no per-key upsert in the file sink),
and the standing table here is an ordinary warehouse table other jobs
read. The merge is associative (counts + exact DECIMAL sums), so
  standing ⊎ agg(batch) == agg(history ∪ batch)
holds exactly — asserted by ``tests/test_streaming_agg_maintenance.py``
against a batch recomputation over everything that arrived.

Scale: per batch this reads only the standing aggregate (group-key
cardinality rows, NOT history), aggregates only the batch, and writes
group-key-cardinality rows back. History is never rescanned. The
read-modify-write of the tiny aggregate table is single-writer by
construction (one streaming query owns the path; the checkpoint
serializes batches)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_batch_into_standing(
    spark: SparkSession, batch_df: DataFrame, state_path: str
) -> None:
    """Merge one micro-batch's partial aggregates into the standing
    (event_type, n, value_sum_dec) parquet table."""
    batch_agg = batch_df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_b"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_b"),
    )
    zero = F.lit(0).cast("decimal(18,6)")
    if os.path.exists(state_path):
        standing = spark.read.parquet(state_path)
        merged = (
            standing.join(batch_agg, "event_type", "full")
            .select(
                "event_type",
                (
                    F.coalesce(F.col("n"), F.lit(0))
                    + F.coalesce(F.col("n_b"), F.lit(0))
                ).alias("n"),
                (
                    F.coalesce(F.col("value_sum_dec"), zero)
                    + F.coalesce(F.col("sum_b"), zero)
                ).alias("value_sum_dec"),
            )
        )
    else:
        merged = batch_agg.select(
            "event_type",
            F.col("n_b").alias("n"),
            F.col("sum_b").alias("value_sum_dec"),
        )
    # Tiny table (|group keys| rows): collect-then-rewrite would also
    # work, but staying in DataFrames keeps the merge plan identical at
    # any key cardinality. Write to a sibling temp dir then atomically
    # swap, so a concurrent reader never sees a half-written table and
    # a crash mid-write leaves the old standing table intact.
    tmp = state_path + "._staging"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    old = state_path + "._old"
    if os.path.exists(state_path):
        os.rename(state_path, old)
    os.rename(tmp, state_path)
    if os.path.exists(old):
        import shutil

        shutil.rmtree(old)


def maintain_event_type_totals(
    spark: SparkSession,
    events_stream: DataFrame,
    state_path: str,
    checkpoint_dir: str,
):
    """Start the maintenance stream: every micro-batch folds into the
    standing per-event-type (count, exact decimal sum) parquet table.
    availableNow drains the backlog then stops."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into_standing(spark, batch_df, state_path)

    return (
        events_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_standing(spark: SparkSession, state_path: str) -> DataFrame:
    """The standing aggregate with the decimal column surfaced as
    double (the scalar-only output rule)."""
    return spark.read.parquet(state_path).select(
        "event_type",
        "n",
        F.col("value_sum_dec").cast("double").alias("value_sum"),
    )
