"""Streaming maintenance of a near-dup index: the streaming face of
the LLM-dedup family. Arriving documents are MinHash-signed, checked
for near-duplicates against the STANDING signature index (plus within
their own batch), and folded into the index — so the corpus is never
re-signed and a day's ingest only pays for the day's documents.

Marries ``streaming/agg_maintenance`` (atomic-swap standing store,
batch-id replay guard) with the batch MinHash ladder
(``operators/dedup.dedup_minhash_lsh``): same 16-permutation
signatures, same 4×4 banding, so a streaming run over N batches
reports exactly the candidate pairs a batch run over the union corpus
reports — asserted by ``tests/test_streaming_dedup_maintenance.py``.

What the index stores — signatures only, NOT shingle sets: per doc one
row of 16 minhashes (~128 bytes). Candidate pairs therefore carry the
SIGNATURE-estimated Jaccard (matching-minhash fraction, k=16 — exact
rational arithmetic, so batch and streaming agree bit-for-bit); the
exact-Jaccard verify rung stays a batch job over flagged pairs, which
is the standard split (the stream flags, curation verifies).

Scale: per batch this signs only the batch, joins batch bands against
standing bands (batch side broadcast — it is the small side by
construction), and appends ≤ batch² + batch·collisions candidate
rows. The standing index grows one row per novel doc; the rewrite of
the index per batch is the local-parquet stand-in for a MERGE into a
real table format, same as ``agg_maintenance``.

Exactly-once: candidate pairs land in a ``batch_id=N`` partition
(replay overwrites the same partition — idempotent), and the index
swap carries the agg_maintenance batch marker, so an at-least-once
foreachBatch replay cannot double-fold either artifact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_BANDS,
    MINHASH_P,
    _band_key,
    _hashed_shingles,
)
from .agg_maintenance import _BATCH_MARKER, _read_last_batch_id, _recover_interrupted_swap

MINHASH_K = len(MINHASH_A)


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, m0..m15): the batch-ladder signature computation
    (shingle → 60-bit hash → 16 permuted mins) applied to whatever
    frame arrives — one groupBy, partial-agg'd."""
    hashed = _hashed_shingles(docs).select(
        "doc_id", (F.col("sh60") % MINHASH_P).alias("h")
    )
    return hashed.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"m{i}")
            for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
        ]
    )


def _bands(sig: DataFrame) -> DataFrame:
    """(doc_id, band_id, bkey) — LSH band keys, array-unnest, no
    shuffle."""
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.expr(_band_key(b, "spark")).alias("bkey"),
                    )
                    for b in range(MINHASH_BANDS)
                ]
            )
        ).alias("bd"),
    ).select("doc_id", "bd.band_id", "bd.bkey")


def _est_jaccard(a: str, b: str):
    """Signature-estimated Jaccard: fraction of agreeing minhashes —
    n/16 is exact binary arithmetic, identical in any engine."""
    n_match = sum(
        (F.col(f"{a}.m{i}") == F.col(f"{b}.m{i}")).cast("int")
        for i in range(MINHASH_K)
    )
    return n_match / F.lit(float(MINHASH_K))


def candidate_pairs(sig_new: DataFrame, sig_standing: DataFrame | None) -> DataFrame:
    """Near-dup candidates involving at least one NEW document:
    new×new plus new×standing band collisions, canonicalized to
    a_id < b_id, with the signature-estimated Jaccard attached.

    The new side is broadcast into the standing join — the batch is
    small by construction (maxFilesPerTrigger bounds it); the standing
    band frame streams partition-local past it."""
    nb = _bands(sig_new)
    intra = (
        nb.alias("x")
        .join(
            nb.alias("y"),
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.bkey") == F.col("y.bkey"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("a_id"), F.col("y.doc_id").alias("b_id"))
    )
    pairs = intra
    if sig_standing is not None:
        sb = _bands(sig_standing)
        cross = (
            sb.join(
                F.broadcast(nb.alias("n")),
                (sb.band_id == F.col("n.band_id")) & (sb.bkey == F.col("n.bkey")),
            )
            .filter(sb.doc_id != F.col("n.doc_id"))
            .select(
                F.least(sb.doc_id, F.col("n.doc_id")).alias("a_id"),
                F.greatest(sb.doc_id, F.col("n.doc_id")).alias("b_id"),
            )
        )
        pairs = pairs.unionByName(cross)
    pairs = pairs.distinct()
    allsig = (
        sig_new if sig_standing is None
        else sig_standing.unionByName(sig_new).dropDuplicates(["doc_id"])
    )
    return (
        pairs.join(allsig.alias("sa"), F.col("sa.doc_id") == F.col("a_id"))
        .join(allsig.alias("sb"), F.col("sb.doc_id") == F.col("b_id"))
        .select("a_id", "b_id", _est_jaccard("sa", "sb").alias("est_jaccard"))
    )


def read_index(spark: SparkSession, index_path: str) -> DataFrame | None:
    _recover_interrupted_swap(index_path)
    if not os.path.exists(index_path):
        return None
    return spark.read.parquet(index_path)


def check_and_index_batch(
    spark: SparkSession,
    batch_docs: DataFrame,
    index_path: str,
    matches_path: str,
    batch_id: int | None = None,
) -> None:
    """One micro-batch: flag near-dup candidates of the batch against
    the standing index (and within the batch), write them under a
    batch_id partition, fold the batch's signatures into the index."""
    _recover_interrupted_swap(index_path)
    if batch_id is not None:
        last = _read_last_batch_id(index_path)
        if last is not None and batch_id <= last:
            return
    sig_batch = minhash_signatures(batch_docs)
    sig_batch.persist()  # feeds pairs, the cross-join, and the index fold
    standing = read_index(spark, index_path)
    # novel docs only: a re-delivered doc_id must not pair with itself
    sig_new = (
        sig_batch
        if standing is None
        else sig_batch.join(standing.select("doc_id"), "doc_id", "anti")
    )
    matches = candidate_pairs(sig_new, standing)
    # batch_id lives in the partition DIRECTORY only (Hive-style);
    # replay overwrites the same partition — idempotent by path.
    (
        matches.coalesce(1)
        .write.mode("overwrite")
        .parquet(
            os.path.join(
                matches_path,
                f"batch_id={batch_id if batch_id is not None else -1}",
            )
        )
    )
    merged = sig_new if standing is None else standing.unionByName(sig_new)
    tmp = index_path + "._staging"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    if batch_id is not None:
        with open(os.path.join(tmp, _BATCH_MARKER), "w") as f:
            f.write(str(batch_id))
    old = index_path + "._old"
    if os.path.exists(index_path):
        os.rename(index_path, old)
    os.rename(tmp, index_path)
    if os.path.exists(old):
        import shutil

        shutil.rmtree(old)
    sig_batch.unpersist()


def maintain_dedup_index(
    spark: SparkSession,
    docs_stream: DataFrame,
    index_path: str,
    matches_path: str,
    checkpoint_dir: str,
):
    """Start the maintenance stream: every arriving micro-batch of
    documents is near-dup-checked against the corpus signature index
    and folded into it. availableNow drains the backlog then stops."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        check_and_index_batch(
            spark, batch_df, index_path, matches_path, batch_id=batch_id
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_matches(spark: SparkSession, matches_path: str) -> DataFrame:
    """All flagged candidate pairs across batches."""
    return spark.read.parquet(matches_path).select("a_id", "b_id", "est_jaccard")
