"""Streaming dedup-index maintenance: arriving documents are checked
against the standing MinHash signature index and folded in; the union
of per-batch candidate pairs must equal the batch ladder run once over
the whole corpus (same signatures, same banding, same estimated
Jaccard — exact rational arithmetic on both paths), across a stream
restart between deliveries. Replay of a committed batch must be a
no-op for both the index and the matches table."""

from __future__ import annotations

import json
import os

from football_etl_pipeline_spark.streaming.dedup_maintenance import (
    candidate_pairs,
    check_and_index_batch,
    maintain_dedup_index,
    minhash_signatures,
    read_index,
    read_matches,
)

DOCS_SCHEMA = "doc_id long, source string, text string"

_BASE = (
    "the quick brown fox jumps over the lazy dog near the river bank at dawn"
)
_VARIANT = (
    "the quick brown fox jumps over the lazy cat near the river bank at dawn"
)

FIRST = [
    {"doc_id": 0, "source": "src0", "text": _BASE},
    {"doc_id": 1, "source": "src0", "text": _BASE},  # exact dup of 0 (intra-batch)
    {"doc_id": 2, "source": "src1", "text": "completely different words about football standings and league tables"},
    {"doc_id": 3, "source": "src1", "text": "another unrelated document mentioning parquet files and shuffle partitions"},
]
SECOND = [
    {"doc_id": 6, "source": "src2", "text": _BASE},      # dup of 0/1 (cross-batch)
    {"doc_id": 7, "source": "src2", "text": _VARIANT},   # near-dup (one word off)
    {"doc_id": 8, "source": "src2", "text": "fresh content with no overlap to anything else in this tiny corpus"},
]


def _write_docs(path: str, rows, fname: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, fname), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _read_docs_stream(spark, src):
    return spark.readStream.format("json").schema(DOCS_SCHEMA).load(src)


def _pairs_set(df):
    return {
        (r["a_id"], r["b_id"], round(r["est_jaccard"], 9)) for r in df.collect()
    }


def _drain(spark, src, index, matches, ck):
    q = maintain_dedup_index(
        spark, _read_docs_stream(spark, src), index, matches, ck
    )
    q.awaitTermination(300)


def test_streaming_union_equals_batch_ladder(spark, tmp_path):
    src = str(tmp_path / "src")
    index = str(tmp_path / "index.parquet")
    matches = str(tmp_path / "matches.parquet")
    ck = str(tmp_path / "ck")

    _write_docs(src, FIRST, "b0.json")
    _drain(spark, src, index, matches, ck)
    _write_docs(src, SECOND, "b1.json")
    _drain(spark, src, index, matches, ck)  # restarted stream, same checkpoint

    got = _pairs_set(read_matches(spark, matches))
    # at minimum, the guaranteed collisions (identical texts, all bands
    # match) were flagged — including the CROSS-BATCH one against the
    # standing index
    assert (0, 1, 1.0) in got
    assert (0, 6, 1.0) in got and (1, 6, 1.0) in got

    full = spark.createDataFrame(
        [tuple(r.values()) for r in FIRST + SECOND], DOCS_SCHEMA
    )
    want = _pairs_set(candidate_pairs(minhash_signatures(full), None))
    assert got == want

    # index holds one signature row per doc
    assert read_index(spark, index).count() == len(FIRST + SECOND)


def test_replayed_batch_is_noop_for_index_and_matches(spark, tmp_path):
    index = str(tmp_path / "index.parquet")
    matches = str(tmp_path / "matches.parquet")
    b0 = spark.createDataFrame([tuple(r.values()) for r in FIRST], DOCS_SCHEMA)
    b1 = spark.createDataFrame([tuple(r.values()) for r in SECOND], DOCS_SCHEMA)

    check_and_index_batch(spark, b0, index, matches, batch_id=0)
    n_index = read_index(spark, index).count()
    pairs = _pairs_set(read_matches(spark, matches))
    # at-least-once replay of the committed batch
    check_and_index_batch(spark, b0, index, matches, batch_id=0)
    assert read_index(spark, index).count() == n_index
    assert _pairs_set(read_matches(spark, matches)) == pairs

    # a genuinely new batch still folds and flags against the standing index
    check_and_index_batch(spark, b1, index, matches, batch_id=1)
    assert read_index(spark, index).count() == n_index + len(SECOND)
    assert (0, 6, 1.0) in _pairs_set(read_matches(spark, matches))


def _index_rows(spark, index):
    df = read_index(spark, index)
    return sorted(tuple(r) for r in df.collect())


def test_interrupted_swap_is_recovered_for_index(spark, tmp_path):
    """Crash window between rename(index, '._old') and rename(tmp,
    index): the MinHash signature index exists only at '._old' when
    batch 1 is re-delivered. check_and_index_batch must restore the
    standing index (batch 0's signatures survive), fold the replayed
    batch exactly once, and leave index + matches identical to an
    uninterrupted twin run with no '._old' residue — completing the
    three-face replay proof (counts/sums, sketches, dedup index)."""
    crashed_ix = str(tmp_path / "ix_crashed")
    crashed_m = str(tmp_path / "m_crashed")
    b0 = spark.createDataFrame([tuple(d.values()) for d in FIRST], DOCS_SCHEMA)
    b1 = spark.createDataFrame([tuple(d.values()) for d in SECOND], DOCS_SCHEMA)
    check_and_index_batch(spark, b0, crashed_ix, crashed_m, batch_id=0)
    os.rename(crashed_ix, crashed_ix + "._old")
    check_and_index_batch(spark, b1, crashed_ix, crashed_m, batch_id=1)

    clean_ix = str(tmp_path / "ix_clean")
    clean_m = str(tmp_path / "m_clean")
    check_and_index_batch(spark, b0, clean_ix, clean_m, batch_id=0)
    check_and_index_batch(spark, b1, clean_ix, clean_m, batch_id=1)

    assert _index_rows(spark, crashed_ix) == _index_rows(spark, clean_ix)
    assert _pairs_set(read_matches(spark, crashed_m)) == _pairs_set(
        read_matches(spark, clean_m)
    )
    assert not os.path.exists(crashed_ix + "._old")
    # gated replay after recovery stays a no-op
    before = _index_rows(spark, crashed_ix)
    check_and_index_batch(spark, b1, crashed_ix, crashed_m, batch_id=1)
    assert _index_rows(spark, crashed_ix) == before
