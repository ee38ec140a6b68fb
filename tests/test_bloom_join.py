"""DataFrame-level bloom-filter join pruning (`join_bloom_prefilter`).

The sibling test_runtime_bloom_filter.py checks Spark's OPTIMIZER-
injected runtime bloom; this one checks the repo's explicit build/
probe composition — the form a pipeline uses when it wants the filter
visible in the plan (e.g. to reuse one build across several probes).

The load-bearing property is the one the oracle can't see: the probe
stage must never drop a TRUE match (false negatives impossible),
while actually pruning (otherwise it's dead weight). Correctness of
the finished query is the oracle row's job.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from football_etl_pipeline_spark.operators.joins import (
    bloom_build,
    bloom_probe,
)
from football_etl_pipeline_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def test_bloom_probe_superset_of_true_matches_and_prunes(spark):
    cust = load_table(spark, SF, "customer")
    orders = load_table(spark, SF, "orders")
    keys = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        "c_custkey"
    )

    bloom = bloom_build(keys, "c_custkey")
    assert bloom.count() <= 2 * keys.count()  # ≤ one word per probe

    probed = bloom_probe(orders, "o_custkey", bloom)
    true_matches = orders.join(
        keys, orders.o_custkey == keys.c_custkey, "left_semi"
    )

    n_orders = orders.count()
    n_probed = probed.count()
    n_true = true_matches.count()

    # No false negatives: every true match survives the probe.
    missing = true_matches.join(
        probed.select("o_orderkey"), "o_orderkey", "left_anti"
    ).count()
    assert missing == 0

    # Superset, and the filter genuinely prunes at this selectivity
    # (1-of-5 segments; a 128Ki-bit filter over ~30 keys has a
    # negligible false-positive rate, so survivors ≈ true matches).
    assert n_true <= n_probed < n_orders
    assert n_probed <= n_true + max(10, n_orders // 20)


def test_bloom_probe_rejects_disjoint_keys(spark):
    # Keys disjoint from the fact's: everything must be pruned.
    keys = spark.range(1_000_000, 1_000_050).select(
        F.col("id").alias("c_custkey")
    )
    orders = load_table(spark, SF, "orders")
    bloom = bloom_build(keys, "c_custkey")
    survivors = bloom_probe(orders, "o_custkey", bloom)
    # A few false positives are possible in principle; with 50 keys in
    # 128Ki bits the expected count is ~0 — allow a tiny slack.
    assert survivors.count() <= 5
