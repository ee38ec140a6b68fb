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
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Marker file stored INSIDE the standing-table directory (Spark/parquet
# readers skip files starting with '_'), so it swaps atomically WITH the
# data it describes — a sidecar file next to the directory could not.
_BATCH_MARKER = "_LAST_BATCH_ID"


def _recover_interrupted_swap(state_path: str) -> None:
    """Heal the two crash windows of the rename-swap in
    ``merge_batch_into_standing``: (a) crash between
    ``rename(state, old)`` and ``rename(tmp, state)`` leaves the
    standing table absent but intact at ``._old`` — restore it rather
    than silently cold-starting and dropping all history; (b) crash
    after the new state landed but before cleanup leaves a stale
    ``._old`` — delete it."""
    old = state_path + "._old"
    if os.path.exists(old):
        if not os.path.exists(state_path):
            os.rename(old, state_path)
        else:
            shutil.rmtree(old)


def _read_last_batch_id(state_path: str) -> int | None:
    marker = os.path.join(state_path, _BATCH_MARKER)
    if os.path.exists(marker):
        with open(marker) as f:
            return int(f.read().strip())
    return None


def _gate_replay(state_path: str, batch_id: int | None) -> bool:
    """Shared entry guard for every gated standing-table merge: heal
    interrupted swaps, then return True iff this batch id was already
    applied (the replay no-op)."""
    _recover_interrupted_swap(state_path)
    if batch_id is not None:
        last = _read_last_batch_id(state_path)
        if last is not None and batch_id <= last:
            return True
    return False


def _swap_write(
    merged: DataFrame, state_path: str, batch_id: int | None
) -> None:
    """Shared exit of every gated standing-table merge: stage the new
    table, record the batch-id marker INSIDE it, and atomically
    rename-swap so a concurrent reader never sees a half-written
    table and a crash mid-write leaves the old one intact. The crash
    windows of the swap are exactly what ``_recover_interrupted_swap``
    heals — keeping both halves in ONE module is what lets a future
    fix reach every sketch family at once (round-14 review find)."""
    tmp = state_path + "._staging"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    if batch_id is not None:
        with open(os.path.join(tmp, _BATCH_MARKER), "w") as f:
            f.write(str(batch_id))
    old = state_path + "._old"
    if os.path.exists(state_path):
        os.rename(state_path, old)
    os.rename(tmp, state_path)
    if os.path.exists(old):
        shutil.rmtree(old)


def merge_batch_into_standing(
    spark: SparkSession,
    batch_df: DataFrame,
    state_path: str,
    batch_id: int | None = None,
) -> None:
    """Merge one micro-batch's partial aggregates into the standing
    (event_type, n, value_sum_dec) parquet table.

    Replay-safe when ``batch_id`` is supplied: foreachBatch is
    at-least-once (a crash after the merge but before the checkpoint
    commit re-delivers the same batch on restart), and this merge is
    NOT naturally idempotent — double-folding a batch double-counts it.
    The last-applied batch id is persisted inside the standing table's
    directory and replays with ``batch_id <= last`` are no-ops, the
    same exactly-once recipe as ``football_stream``'s batch_id-keyed
    overwrite, adapted to a read-modify-write merge."""
    if _gate_replay(state_path, batch_id):
        return
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
    # any key cardinality.
    _swap_write(merged, state_path, batch_id)


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
        merge_batch_into_standing(spark, batch_df, state_path, batch_id=batch_id)

    return (
        events_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_standing(spark: SparkSession, state_path: str) -> DataFrame:
    """The standing aggregate with the decimal column surfaced as
    double (the scalar-only output rule)."""
    _recover_interrupted_swap(state_path)
    return spark.read.parquet(state_path).select(
        "event_type",
        "n",
        F.col("value_sum_dec").cast("double").alias("value_sum"),
    )
