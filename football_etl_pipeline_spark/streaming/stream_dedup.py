"""Streaming deduplication with BOUNDED state:
``dropDuplicatesWithinWatermark`` over the events stream — the
streaming face of the batch exact-dedup ladder (``operators/dedup``).

Why the WithinWatermark variant and not plain ``dropDuplicates``:
plain streaming dropDuplicates keeps EVERY key seen since the query
started — state grows with the corpus and a forever-running ingest
eventually OOMs or spills unboundedly. WithinWatermark keeps a key
only until the event-time high-water mark passes its timestamp +
delay, so state is bounded by (arrival rate × watermark window) —
the same bounded-state contract as the windowed aggregations
(``events_stream.py``). The trade is explicit and documented: a
duplicate arriving LATER than the watermark delay after its first
copy is not detected. That is the right trade for at-least-once
upstream delivery (Kafka/file re-delivery), where duplicates cluster
within seconds of each other, and it mirrors what the exactly-once
versioned sink (``versioned_sink.py``) guards at batch granularity —
this guards at ROW granularity.

Stream ≡ batch: on any finite input where all duplicates fall within
the watermark delay, the output multiset equals batch
``dropDuplicates(keys)`` — pinned by
``tests/test_streaming_dedup_watermark.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from .events_stream import WATERMARK, read_events_stream

DEDUP_KEYS = ("event_id",)


def deduped_events_stream(
    events: DataFrame,
    keys: tuple[str, ...] = DEDUP_KEYS,
    watermark: str = WATERMARK,
) -> DataFrame:
    """Watermarked row-level dedup: first copy of each key wins and is
    emitted immediately (append-mode compatible); re-deliveries within
    the watermark window are dropped; state for a key expires once the
    watermark passes it."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def run_dedup_to_parquet(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint: str,
) -> StreamingQuery:
    """Drive the deduped stream into a parquet sink (availableNow —
    drains the current backlog and stops, the house test trigger)."""
    deduped = deduped_events_stream(read_events_stream(spark, source_dir))
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
