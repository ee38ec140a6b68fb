"""Structured Streaming variant of the ingest→validate→aggregate
pipeline over the ``events`` shape (event_id, ts, user_id, event_type,
value, props).

The reference is batch-only (``streaming=False`` pinned at
``/root/reference/dataflow-flex/main.py:42``); this is the streaming
capability the engine adds (SURVEY.md §7 Stage 4): a file-source
stream with schema-on-read validation, a dead-letter side channel
(streaming analog of the reference's TaggedOutput,
``transforms.py:180-184``), and watermarked event-time windows so
late data is bounded, not unbounded state.

Design notes:
- Every transformation here is written against a plain DataFrame and
  works IDENTICALLY on a batch frame — that's Spark's unification
  contract, and the tests exploit it (batch result == availableNow
  stream result on the same files).
- Watermark = 10 minutes: state for a window is dropped once the
  event-time high-water mark passes window_end + 10 min; rows later
  than that are discarded (counted nowhere) — the bounded-state knob
  that makes this run forever on a cluster.
- Dead-letter is a second streaming query over the same source (two
  cheap file scans), because a single-pass streaming multi-output
  does not exist in Spark — same divergence-from-Beam note as the
  batch pipeline (plans/pipeline.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

VALID_EVENT_TYPES = ("view", "click", "purchase", "error", "signup")
WATERMARK = "10 minutes"
WINDOW = "5 minutes"
SESSION_GAP = "30 minutes"


def read_events_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream over a landing directory of JSON events —
    the streaming twin of the batch ingest landing zone
    (plans/ingest.py). maxFilesPerTrigger bounds per-batch work so one
    giant backlog can't blow a micro-batch."""
    return (
        spark.readStream.format("json")
        .schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .load(source_dir)
    )


def split_valid(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Validation split: (valid, dead_letter). A record dead-letters
    when required fields are null or event_type is unknown — the
    streaming analog of the batch enforcement error column
    (plans/enforce.py); the reason travels with the record."""
    err = (
        F.when(F.col("event_id").isNull(), F.lit("missing event_id"))
        .when(F.col("ts").isNull(), F.lit("missing ts"))
        .when(F.col("user_id").isNull(), F.lit("missing user_id"))
        .when(
            ~F.col("event_type").isin(*VALID_EVENT_TYPES),
            F.concat(F.lit("unknown event_type: "), F.coalesce("event_type", F.lit("NULL"))),
        )
    )
    tagged = events.withColumn("_error", err)
    valid = tagged.filter(F.col("_error").isNull()).drop("_error")
    dead = tagged.filter(F.col("_error").isNotNull())
    return valid, dead


def windowed_counts(events: DataFrame) -> DataFrame:
    """Tumbling event-time window per event_type with a 10-minute
    watermark. On a stream this is incremental state (partial aggs
    merged per micro-batch, state evicted past the watermark); on a
    batch frame the same code is an ordinary hash aggregate."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """Sliding event-time window (10-minute span, 5-minute slide):
    each event lands in TWO overlapping windows. Spark expands the
    row per overlapping window BEFORE the aggregate (no special
    state shape vs tumbling — just ×(span/slide) state rows), and
    the watermark still bounds it."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def sessionized(events: DataFrame) -> DataFrame:
    """Session windows (30-min inactivity gap) per user — Spark's
    built-in session_window keeps one open-interval state per key,
    merged on overlap; the watermark closes sessions for good."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "first_ts",
            "last_ts",
        )
    )


def start_to_memory(
    df: DataFrame,
    name: str,
    checkpoint_dir: str,
    output_mode: str = "append",
    available_now: bool = True,
):
    """Drive a streaming frame into an in-memory table (tests/dev).
    availableNow=True processes the current backlog then stops —
    batch-equivalent semantics; False leaves a continuous query the
    caller feeds with processAllAvailable()."""
    writer = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", os.path.join(checkpoint_dir, name))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: a
    per-user running (n_events, total_value) accumulator that
    SURVIVES across micro-batches — the arbitrary-state escape hatch
    when built-in windows can't express the semantics (e.g. lifetime
    counters, custom session logic, fraud scores).

    Contract at scale: state lives in the state store partitioned by
    the group key (one shuffle per batch), so per-key state must stay
    small and bounded — here two numbers. Each batch emits the
    updated totals for the users seen in that batch (update
    semantics)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def deduped_stream(events: DataFrame) -> DataFrame:
    """Streaming exact-dedup on ``event_id`` with watermark-bounded
    state (``dropDuplicatesWithinWatermark``): re-delivered events —
    at-least-once sources redeliver across micro-batches — are
    emitted once; dedup state for an id is dropped once the watermark
    passes it, so state is bounded by the lateness budget instead of
    growing forever (the difference between a demo and a pipeline
    that runs for months)."""
    return events.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def view_to_purchase_join(events: DataFrame) -> DataFrame:
    """Stream-stream inner join: each purchase matched to the same
    user's views in the preceding 30 minutes (attribution window).

    Both sides carry watermarks and the join condition bounds event
    time on BOTH ends — that's what lets Spark expire join state: a
    view older than (purchase watermark − 30 min) can never match
    again and is dropped from the state store. Without the time bound
    the state grows forever; with it, steady-state memory is
    ~30 minutes of views per partition. Works identically on batch
    frames (minus the state mechanics)."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("view_ts", WATERMARK)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("amount"),
        )
        .withWatermark("purchase_ts", WATERMARK)
    )
    return views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
    ).select("p_user", "purchase_id", "view_id", "view_ts", "purchase_ts", "amount")


def view_to_purchase_join_outer(events: DataFrame) -> DataFrame:
    """LEFT OUTER stream-stream attribution: every view emits — with
    its purchase when one lands in the 30-minute window, with NULLs
    otherwise. The subtle semantic this pins: the null row for an
    unmatched view CANNOT emit until the purchase-side watermark
    passes view_ts + 30 min (only then is "no match" final), so
    outer results trail the watermark by the window width — views
    near the head of the stream are WITHHELD, not lost, until later
    events advance the watermark. State cost is identical to the
    inner join (the time bound expires both sides); only emission
    timing differs. The classic use: conversion-rate tables where
    unconverted impressions must appear as facts, not be dropped."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("view_ts", WATERMARK)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("amount"),
        )
        .withWatermark("purchase_ts", WATERMARK)
    )
    return views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            F.col("view_ts")
            >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")
        ),
        "leftOuter",
    ).select(
        "v_user", "view_id", "view_ts", "purchase_id", "purchase_ts", "amount"
    )


def write_foreach_batch(
    df: DataFrame, path: str, checkpoint_dir: str, fmt: str = "parquet"
):
    """foreachBatch sink: hands every micro-batch to the BATCH writer,
    which is how streams reach sinks with no streaming connector
    (JDBC, multi-table fan-out, merge/upsert …).

    Idempotency contract: Spark replays a failed batch with the SAME
    batch_id, so the writer keys the output on it (one directory per
    batch, overwritten on replay) — exactly-once via deterministic
    overwrite, the same truncate-idempotency idea as the reference's
    WRITE_TRUNCATE (/root/reference/dataflow-flex/pipeline.py:53) but
    scoped per batch instead of per table."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").format(fmt).save(
            os.path.join(path, f"batch_id={batch_id}")
        )

    return (
        df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "feb"))
        .trigger(availableNow=True)
        .start()
    )


def write_dead_letter(dead: DataFrame, path: str, checkpoint_dir: str):
    """Dead-letter sink: append-mode JSON files, one directory the
    operators can replay later — the reference's dead_letter/
    WriteToText (pipeline.py:58-63) with streaming checkpoints."""
    return (
        dead.writeStream.format("json")
        .option("path", path)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "dead_letter"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def enrich_with_customer(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static LEFT join: each arriving event picks up the
    customer dimension row for its user (market segment here) — the
    canonical streaming-enrichment pattern the reference's batch-only
    teams⋈standings join (``transforms.py:32``) becomes on a stream.

    Stream-static joins are STATELESS: the static side is re-planned
    each micro-batch (so a dimension refresh is picked up on the next
    batch) and nothing is held in state store — no watermark needed on
    the join itself. No broadcast hint: per the house policy only
    fixed-cardinality frames get hints, and customer grows with scale;
    Spark's size estimate broadcasts it per-batch while it fits and
    falls back to a shuffled join when it doesn't. LEFT join keeps
    events from unknown users (segment NULL → 'unknown' downstream),
    matching the dead-letter philosophy: enrichment failure is data,
    not an error."""
    dim = customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return events.join(dim, "user_id", "left")


def enriched_segment_counts(
    events: DataFrame, customer: DataFrame
) -> DataFrame:
    """Enrichment feeding a watermarked tumbling aggregate: per
    (5-minute window, market segment) event counts and decimal-exact
    value totals — the join column becomes a grouping key, proving the
    stream-static join composes with stateful aggregation (the join
    adds no state; only the window aggregate holds any)."""
    enriched = enrich_with_customer(events, customer)
    return (
        enriched.withWatermark("ts", WATERMARK)
        .groupBy(
            F.window("ts", WINDOW).alias("w"),
            F.coalesce(F.col("segment"), F.lit("unknown")).alias("segment"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "segment",
            "n_events",
            "total_value",
        )
    )
