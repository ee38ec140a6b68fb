"""Standing aHash-fingerprint store maintenance (VERDICT r14's weak
grade): each arriving media batch decodes ONLY its own payloads; the
store must equal the one-shot batch derivation bit-for-bit, refuse
gated replays, and surface any double-applied batch through the
``times_seen`` rider (fingerprint VALUES are idempotent, so without
the rider a broken gate would be invisible — and expensive)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from football_etl_pipeline_spark.operators.multimodal import (
    ahash_64,
    decode_png_pixels,
    make_png_pattern,
)
from football_etl_pipeline_spark.streaming.ahash_maintenance import (
    maintain_ahash_index,
    merge_batch_fingerprints,
    read_fingerprints,
)

IDS_DAY1 = [0, 5, 10, 15, 20, 25]
IDS_DAY2 = [30, 35, 40, 45]


def _ids_df(spark, ids):
    return spark.createDataFrame(
        [(int(i),) for i in ids], "media_id long"
    )


def _store(spark, state):
    return {
        r["media_id"]: (r["ahash_hi"], r["ahash_lo"], r["times_seen"])
        for r in read_fingerprints(spark, state).collect()
    }


def _truth(ids):
    return {
        i: ahash_64(decode_png_pixels(make_png_pattern(i))) for i in ids
    }


def test_store_matches_batch_derivation(spark, tmp_path):
    state = str(tmp_path / "fp")
    merge_batch_fingerprints(spark, _ids_df(spark, IDS_DAY1), state, 0)
    merge_batch_fingerprints(spark, _ids_df(spark, IDS_DAY2), state, 1)
    got = _store(spark, state)
    want = _truth(IDS_DAY1 + IDS_DAY2)
    assert set(got) == set(want)
    for mid, (hi, lo, seen) in got.items():
        assert (hi, lo) == want[mid], mid
        assert seen == 1, mid


def test_gated_replay_noop_and_rider_visibility(spark, tmp_path):
    state = str(tmp_path / "fp")
    merge_batch_fingerprints(spark, _ids_df(spark, IDS_DAY1), state, 0)
    before = _store(spark, state)
    # rebuilt-checkpoint replay: batch id 0 again → must no-op
    merge_batch_fingerprints(spark, _ids_df(spark, IDS_DAY1), state, 0)
    assert _store(spark, state) == before
    # a broken gate (same rows, advanced id) leaves hi/lo intact —
    # value idempotence — but DOUBLES times_seen: the rider is what
    # makes the regression hash-visible downstream
    merge_batch_fingerprints(spark, _ids_df(spark, IDS_DAY1), state, 1)
    after = _store(spark, state)
    for mid, (hi, lo, seen) in after.items():
        assert (hi, lo) == before[mid][:2]
        assert seen == 2


def test_stream_maintains_store_and_replay_gates(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "fp")
    os.makedirs(src, exist_ok=True)
    _ids_df(spark, IDS_DAY1).coalesce(1).write.mode("append").parquet(src)
    _ids_df(spark, IDS_DAY2).coalesce(1).write.mode("append").parquet(src)

    def stream():
        return (
            spark.readStream.format("parquet")
            .schema("media_id long")
            .option("maxFilesPerTrigger", 1)
            .load(src)
        )

    q = maintain_ahash_index(
        spark, stream(), state, str(tmp_path / "ck_a")
    )
    assert q.awaitTermination(120)
    got = _store(spark, state)
    want = _truth(IDS_DAY1 + IDS_DAY2)
    assert {m: (h, l) for m, (h, l, _) in got.items()} == want
    assert all(seen == 1 for _, _, seen in got.values())
    # fresh checkpoint replays the whole backlog from batch id 0; the
    # gate must swallow every redelivery (times_seen stays 1)
    q2 = maintain_ahash_index(
        spark, stream(), state, str(tmp_path / "ck_b")
    )
    assert q2.awaitTermination(120)
    assert _store(spark, state) == got
