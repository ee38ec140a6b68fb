"""The design claim behind text_train_val_test_split: membership is a
pure content-hash projection, so the assignment is invariant to
partitioning (and hence to cluster size / execution order)."""

from __future__ import annotations

import pyspark.sql.functions as F

from football_etl_pipeline_spark.operators.textops import (
    SPLIT_BUCKETS,
    _split_case,
    hash60_spark,
)
from football_etl_pipeline_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.01"


def _assignment(docs):
    bucket = (F.expr(hash60_spark("text")) % 100).alias("bucket")
    return {
        (r.doc_id, r.split)
        for r in docs.select(
            "doc_id", F.expr(_split_case(f"({hash60_spark('text')} % 100)")).alias("split")
        ).collect()
    }


def test_split_invariant_under_partitioning(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = _assignment(docs.repartition(1))
    b = _assignment(docs.repartition(32, "source"))
    assert a == b
    assert len(a) == docs.count()


def test_split_fractions_sane(spark):
    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    counts = dict(
        (r.split, r.c)
        for r in docs.select(
            F.expr(_split_case(f"({hash60_spark('text')} % 100)")).alias("split")
        )
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    assert set(counts) == {name for name, _, _ in SPLIT_BUCKETS}
    # hash-uniformity: train should land near 90% (loose floor/ceiling)
    assert 0.8 <= counts["train"] / n <= 0.97
