"""Versioned-table streaming sink: one version per micro-batch,
replay-idempotent via the in-manifest batch-id guard, crash orphans
invisible — the stream≡batch house pattern plus the format's own
guarantees."""

from __future__ import annotations

import json
import os

from football_etl_pipeline_spark.sources.versioned_table import (
    read_version,
    vacuum,
    versions,
)
from football_etl_pipeline_spark.streaming.versioned_sink import (
    append_stream_versioned,
    commit_batch,
)

SCHEMA = "event_id long, user_id long, value double"
FIRST = [{"event_id": 1, "user_id": 10, "value": 1.0},
         {"event_id": 2, "user_id": 11, "value": 2.0}]
SECOND = [{"event_id": 3, "user_id": 10, "value": 3.0}]


def _write(src, rows, fname):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, fname), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _drain(spark, src, root, ck):
    stream = (
        spark.readStream.format("json")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    q = append_stream_versioned(stream, root, ck)
    q.awaitTermination(300)


def test_one_version_per_batch_and_content(spark, tmp_path):
    src, root, ck = (str(tmp_path / d) for d in ("src", "tbl", "ck"))
    _write(src, FIRST, "a.jsonl")
    _write(src, SECOND, "b.jsonl")
    _drain(spark, src, root, ck)
    assert len(versions(root)) == 2  # one commit per micro-batch
    got = {r.event_id for r in read_version(spark, root).collect()}
    assert got == {1, 2, 3}
    # time travel: the first version holds exactly the first batch's file
    v1 = {r.event_id for r in read_version(spark, root, 1).collect()}
    assert v1 in ({1, 2}, {3})  # file order is listing-dependent


def test_replay_with_rebuilt_checkpoint_is_idempotent(spark, tmp_path):
    """Losing the checkpoint replays every file as batches 0..n again;
    the in-manifest batch-id guard must skip them all — the table
    neither duplicates rows nor grows versions."""
    src, root, ck = (str(tmp_path / d) for d in ("src", "tbl", "ck"))
    _write(src, FIRST, "a.jsonl")
    _write(src, SECOND, "b.jsonl")
    _drain(spark, src, root, ck)
    before = versions(root)
    _drain(spark, src, root, str(tmp_path / "ck2"))  # rebuilt checkpoint
    assert versions(root) == before
    got = sorted(r.event_id for r in read_version(spark, root).collect())
    assert got == [1, 2, 3]


def test_direct_replay_guard(spark, tmp_path):
    root = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, 10, 1.0)], SCHEMA)
    assert commit_batch(df, 0, root) is True
    assert commit_batch(df, 0, root) is False  # same batch re-delivered
    assert commit_batch(df, 1, root) is True
    assert len(versions(root)) == 2


def test_crash_orphans_stay_invisible_and_vacuum(spark, tmp_path):
    """A crash between staging and manifest-create leaves orphan
    parquet that no reader sees; a later vacuum reaps it while the
    committed versions read back unchanged."""
    src, root, ck = (str(tmp_path / d) for d in ("src", "tbl", "ck"))
    _write(src, FIRST, "a.jsonl")
    _drain(spark, src, root, ck)
    orphan = os.path.join(root, "data", "deadcrash0000")
    spark.createDataFrame([(99, 99, 9.9)], SCHEMA).write.parquet(orphan)
    assert {r.event_id for r in read_version(spark, root).collect()} == {1, 2}
    deleted = vacuum(root, keep=len(versions(root)))
    assert any("deadcrash0000" in d for d in deleted)
    assert {r.event_id for r in read_version(spark, root).collect()} == {1, 2}


def test_zombie_driver_race_commits_exactly_once(spark, tmp_path, monkeypatch):
    """The Delta-style failover race: a zombie driver and a restarted
    query both snapshot last=none for batch 0; the restarted driver
    commits first; the zombie's commit_version must then FAIL with
    VersionConflict (expected_base from the shared snapshot), and the
    re-checked guard must skip — one committed version, no dup rows."""
    import football_etl_pipeline_spark.streaming.versioned_sink as vsink
    from football_etl_pipeline_spark.sources import versioned_table as vt

    root = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, 10, 1.0)], SCHEMA)
    real_commit = vt.commit_version
    state = {"injected": False}

    def racing_commit(bdf, r, **kw):
        if not state["injected"]:
            state["injected"] = True
            # the competing driver commits the SAME batch between the
            # zombie's snapshot and its commit attempt
            real_commit(df, r, mode="append", meta={"batch_id": 0})
        return real_commit(bdf, r, **kw)

    monkeypatch.setattr(vsink, "commit_version", racing_commit)
    assert vsink.commit_batch(df, 0, root) is False  # zombie skips
    assert len(vt.versions(root)) == 1  # exactly one commit
    assert [r.event_id for r in vt.read_version(spark, root).collect()] == [1]


def test_replay_guard_survives_vacuum_after_nonbatch_commits(spark, tmp_path):
    """vacuum + non-batch commits filling the keep window must not
    resurrect old batches on a checkpoint-rebuild replay."""
    from football_etl_pipeline_spark.sources import versioned_table as vt

    root = str(tmp_path / "tbl")
    df0 = spark.createDataFrame([(1, 10, 1.0)], SCHEMA)
    df1 = spark.createDataFrame([(2, 11, 2.0)], SCHEMA)
    assert commit_batch(df0, 0, root) is True
    assert commit_batch(df1, 1, root) is True
    vt.commit_version(df0, root, mode="append")  # compaction-ish commit
    vt.commit_version(df1, root, mode="append")
    vt.vacuum(root, keep=2)  # batch manifests are gone
    assert commit_batch(df0, 0, root) is False
    assert commit_batch(df1, 1, root) is False
    assert commit_batch(df1, 2, root) is True


def test_concurrent_writers_stress_exactly_once(spark, tmp_path):
    """True-concurrency race: many threads replay an overlapping batch
    range against one table simultaneously (every batch is attempted
    by several threads — the multi-zombie worst case). The O_EXCL
    manifest commit must serialize them so each batch lands EXACTLY
    once, in order, with no duplicate rows and no lost batch."""
    from concurrent.futures import ThreadPoolExecutor

    from football_etl_pipeline_spark.sources import versioned_table as vt

    root = str(tmp_path / "tbl")
    n_batches, n_threads = 10, 8
    frames = {
        b: spark.createDataFrame([(b, b, float(b))], SCHEMA)
        for b in range(n_batches)
    }

    def replay(_):
        done = []
        for b in range(n_batches):
            if commit_batch(frames[b], b, root, max_races=64):
                done.append(b)
        return done

    with ThreadPoolExecutor(max_workers=n_threads) as ex:
        wins = list(ex.map(replay, range(n_threads)))
    committed = sorted(b for w in wins for b in w)
    assert committed == list(range(n_batches))  # each won exactly once
    assert len(vt.versions(root)) == n_batches
    rows = sorted(
        r.event_id for r in vt.read_version(spark, root).collect()
    )
    assert rows == list(range(n_batches))  # no dup, no loss
    assert vt.last_committed_meta(root, "batch_id") == n_batches - 1


def test_widened_batch_evolves_schema_and_null_fills(spark, tmp_path):
    """A micro-batch that carries a NEW column (an upstream producer
    shipped a new field) evolves the committed schema through the
    foreachBatch sink: earlier versions' files are carried by
    reference and NULL-fill the evolved column on the current read,
    while time travel to the pre-evolution version still sees the
    narrow schema — the r13 versioned_table evolution surfacing
    through the streaming ingest path."""
    root = str(tmp_path / "t")
    narrow = spark.createDataFrame(
        [(1, 10, 1.0)], "event_id long, user_id long, value double"
    )
    wide = spark.createDataFrame(
        [(2, 11, 2.0, "mobile")],
        "event_id long, user_id long, value double, channel string",
    )
    assert commit_batch(narrow, 0, root)
    assert commit_batch(wide, 1, root)
    cur = read_version(spark, root)
    assert cur.columns == ["event_id", "user_id", "value", "channel"]
    rows = {r.event_id: r.channel for r in cur.collect()}
    assert rows == {1: None, 2: "mobile"}
    old = read_version(spark, root, 1)
    assert old.columns == ["event_id", "user_id", "value"]
    # replay of the widened batch is still guard-skipped
    assert not commit_batch(wide, 1, root)
    assert versions(root) == [1, 2]
