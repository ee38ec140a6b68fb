"""Streaming maintenance of the standing PERCEPTUAL-fingerprint
table: per arriving media micro-batch, decode + aHash ONLY the
batch's payloads and fold the (media_id, ahash_hi, ahash_lo)
fingerprints into a standing parquet table behind the house batch-id
gate — the aHash analog of ``dedup_maintenance.py``'s MinHash
signature index and the missing maintenance face VERDICT r14 flagged:
without it, the incremental perceptual screen had to re-derive
standing fingerprints from raw payloads (a full standing-media
re-decode per daily ingest — the exact cost the screen exists to
avoid). With it, ``operators/multimodal.multimodal_ahash_incremental``
reads standing fingerprints from this store and its per-run decode
cost is |batch|, not |corpus|.

Replay safety: fingerprints are idempotent BY VALUE (re-hashing the
same image yields the same bits, and the merge unions by media_id),
so a broken gate would not corrupt hi/lo — but it WOULD re-decode
every redelivered payload (the cost leak) and it would silently mask
gate regressions. The table therefore carries a ``times_seen`` rider
that SUMS per merge: any double-applied batch doubles it, the
standing read surfaces it, and the oracle hash of the streaming row
(``streaming_ahash_fingerprint_maintenance``) breaks — the same
hash-checked exactly-once recipe as the quantile histogram's counts.

Scale: per batch this decodes |batch| payloads in one Arrow
``mapInPandas`` pass, reads the standing table (16 bytes of
fingerprint per image — the frame a media warehouse keeps hot), and
swap-writes the merged table through the shared
``_gate_replay``/``_swap_write`` machinery. Raw standing payloads are
never re-read; the store is exactly what the daily screen band-joins
against.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import _AHASH_SCHEMA, _ahash_batches
from .agg_maintenance import (
    _gate_replay,
    _recover_interrupted_swap,
    _swap_write,
)


def fingerprint_batch(batch_df: DataFrame) -> DataFrame:
    """Decode + aHash one batch's media rows — the ONLY place raw
    payload bytes are touched in the maintenance path. Input needs a
    ``media_id`` column; duplicate ids within a batch collapse first
    so ``times_seen`` counts batches, not in-batch repeats."""
    return (
        batch_df.select("media_id")
        .distinct()
        .mapInPandas(_ahash_batches, schema=_AHASH_SCHEMA)
        .withColumn("times_seen", F.lit(1).cast("long"))
    )


def merge_batch_fingerprints(
    spark: SparkSession,
    batch_df: DataFrame,
    state_path: str,
    batch_id: int | None = None,
) -> None:
    """Fold one micro-batch's fingerprints into the standing table,
    gated on batch id. hi/lo merge by MAX (equal by construction —
    the hash is a pure function of the image); ``times_seen`` merges
    by SUM, which is what makes a broken gate VISIBLE."""
    if _gate_replay(state_path, batch_id):
        return
    fp = fingerprint_batch(batch_df)
    if os.path.exists(state_path):
        standing = spark.read.parquet(state_path).select(
            "media_id", "ahash_hi", "ahash_lo", "times_seen"
        )
        merged = (
            standing.unionByName(fp)
            .groupBy("media_id")
            .agg(
                F.max("ahash_hi").alias("ahash_hi"),
                F.max("ahash_lo").alias("ahash_lo"),
                F.sum("times_seen").cast("long").alias("times_seen"),
            )
        )
    else:
        merged = fp
    _swap_write(merged, state_path, batch_id)


def maintain_ahash_index(
    spark: SparkSession,
    media_stream: DataFrame,
    state_path: str,
    checkpoint_dir: str,
):
    """Start the fingerprint-maintenance stream; availableNow drains
    the backlog then stops. ``media_stream`` must carry ``media_id``
    rows for the images to index (pre-filtered to the decodable
    mime)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_fingerprints(
            spark, batch_df, state_path, batch_id=batch_id
        )

    return (
        media_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_fingerprints(spark: SparkSession, state_path: str) -> DataFrame:
    """The query side: the standing (media_id, ahash_hi, ahash_lo,
    times_seen) table — what the incremental screen band-joins
    against INSTEAD of re-decoding standing payloads."""
    _recover_interrupted_swap(state_path)
    return spark.read.parquet(state_path).select(
        "media_id", "ahash_hi", "ahash_lo", "times_seen"
    )
