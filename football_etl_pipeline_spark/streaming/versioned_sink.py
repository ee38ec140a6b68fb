"""Exactly-once streaming sink into the manifest-versioned table
format: each micro-batch commits one table VERSION whose manifest
records the batch id — replay-idempotent without any rename-swap.

Why this beats the ``._old`` swap the three maintenance faces use
(``agg_maintenance.py`` etc.): a manifest commit is a single O_EXCL
file create, so there is NO window where the table is absent or
half-swapped — a crashed commit leaves only unreferenced staged
parquet (vacuumable), and the batch-id guard lives IN the manifest,
atomically with the data it describes. Re-delivered batches (restart
from checkpoint, or a rebuilt checkpoint replaying from scratch) are
skipped when a committed manifest already records an equal-or-newer
batch id.

Scale: an append commit stages only the batch's rows and re-lists the
previous manifest by reference — history is never rewritten, and every
previously committed version stays time-travel-readable while
downstream jobs re-process increments by diffing versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..sources.versioned_table import (
    VersionConflict,
    commit_version,
    last_committed_meta_at,
    versions,
)

_BATCH_KEY = "batch_id"


def commit_batch(
    batch_df: DataFrame, batch_id: int, root: str, max_races: int = 8
) -> bool:
    """Commit one micro-batch as a new table version; returns False
    (and commits nothing) if an equal-or-newer batch id is already in
    a committed manifest — the exactly-once replay guard.

    The guard and the commit are ATOMIC with respect to each other:
    ``versions()`` is read ONCE per attempt, the batch watermark is
    derived from that same snapshot (``last_committed_meta_at``), and
    the snapshot's head is passed as ``expected_base`` so a writer
    that lost the race gets ``VersionConflict`` from the manifest's
    O_EXCL create instead of silently appending after the winner. On
    conflict the loop re-snapshots and re-checks the guard — if the
    winner was a zombie driver committing THIS batch, the re-check
    sees the new watermark and skips (this is the failover race
    Delta's txn-version check closes; a check-then-commit without the
    shared snapshot let both drivers read last=N and both append)."""
    for _ in range(max_races):
        vs = versions(root)
        base = vs[-1] if vs else 0
        last = last_committed_meta_at(root, _BATCH_KEY, vs)
        if last is not None and batch_id <= last:
            return False
        try:
            commit_version(
                batch_df,
                root,
                mode="append",
                expected_base=base,
                meta={_BATCH_KEY: batch_id},
            )
            return True
        except VersionConflict:
            continue  # another writer won; re-check the guard
    raise VersionConflict(
        f"batch {batch_id}: lost {max_races} consecutive commit races"
    )


def append_stream_versioned(
    events: DataFrame, root: str, checkpoint: str
) -> StreamingQuery:
    """Drive a stream into the versioned table, one version per
    non-empty micro-batch."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        commit_batch(batch_df, batch_id, root)

    return (
        events.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
