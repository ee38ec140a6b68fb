"""Runtime bloom-filter row filtering — the engine's semi-join
pushdown path for selective dim⋈fact joins at scale.

Spark 4.1 ships this DEFAULT-ON (``spark.sql.optimizer.runtime
.bloomFilter.enabled = true``) but gates injection on the application
side scanning ≥ 10GB (``applicationSideScanSizeThreshold``) — exactly
right for the 100 TB target: on the cluster a selective part-filter
join builds a bloom filter from the filtered dim keys and drops
non-matching fact rows AT THE SCAN, before the shuffle; on sf0.01
testdata it stays out of every plan (which is why no plan-shape test
ever sees it). These tests lower the thresholds to machine-check that
the path actually engages in this build — the difference between
"config exists" and "filter injected" — so a Spark upgrade or session
-config change that silently loses the at-scale pushdown fails here.

(No session.py change is needed or wanted: the defaults already do
the right thing in both regimes.)
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"

_TUNE = {
    # Let any scan qualify as the application side (default 10GB).
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # Let the tiny filtered dim qualify as the creation side.
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    # Force a non-broadcast join: runtime filters only buy anything
    # when the fact side would otherwise shuffle in full (a broadcast
    # join already prunes probe-side rows in the hash lookup).
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def _tuned(spark):
    old = {}
    for k, v in _TUNE.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bloom_filter_is_default_on_with_scale_gates(spark):
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    # The 10GB gate is the reason local plans never carry the filter;
    # if a future session config lowers it globally, every plan-shape
    # assertion in test_plan_shapes.py would silently change — pin it.
    # (The live conf renders the default in bytes.)
    assert spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    ) in ("10GB", "10g", "10737418240b")


def test_bloom_filter_injects_on_selective_dim_join(spark):
    """With the size gates lowered, a selective part-filter join must
    plan: bloom_filter_agg over the FILTERED dim keys (a one-row
    ObjectHashAggregate subquery) feeding a might_contain() predicate
    on the fact scan's Filter — pre-shuffle row pruning. And the
    result must be identical with the filter on and off."""
    li = spark.read.parquet(SF + "/lineitem.parquet")
    p = spark.read.parquet(SF + "/part.parquet").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    j = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_size")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    baseline = {(r.p_size, r.n) for r in j.collect()}
    with _tuned(spark):
        j2 = (
            li.join(p, F.col("p_partkey") == F.col("l_partkey"))
            .groupBy("p_size")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        got = {(r.p_size, r.n) for r in j2.collect()}
        plan = j2._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan
    assert "bloom_filter_agg" in plan
    # The might_contain predicate must sit on the lineitem (fact)
    # side: it shares a Filter with the l_partkey null check.
    assert any(
        "might_contain" in line and "l_partkey" in line
        for line in plan.splitlines()
    )
    assert got == baseline and len(got) == 1
