"""Connector tests: format round-trips, corrupt-record capture,
partitioned writes with pruning, dynamic partition overwrite, and
bucketed tables joining without a shuffle."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from football_etl_pipeline_spark.sources.connectors import (
    CORRUPT_COL,
    read_with_dead_letter,
    write,
    write_bucketed_table,
)
from football_etl_pipeline_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"

SCHEMA = StructType(
    [
        StructField("n_nationkey", LongType()),
        StructField("n_name", StringType()),
        StructField("n_regionkey", LongType()),
    ]
)


def _nation(spark):
    return load_table(spark, SF_DIR, "nation").select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("long").alias("n_regionkey"),
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_round_trip(spark, tmp_path, fmt):
    src = _nation(spark)
    path = str(tmp_path / f"rt.{fmt}")
    opts = {"header": "true"} if fmt == "csv" else {}
    write(src, path, fmt=fmt, **opts)
    good, corrupt = read_with_dead_letter(spark, path, fmt, SCHEMA, **opts)
    assert sorted(good.collect()) == sorted(src.collect())
    assert corrupt.count() == 0


@pytest.mark.parametrize("fmt", ["json", "csv"])
def test_corrupt_record_capture(spark, tmp_path, fmt):
    path = str(tmp_path / f"bad.{fmt}")
    os.makedirs(path, exist_ok=True)
    if fmt == "json":
        lines = [
            '{"n_nationkey": 1, "n_name": "A", "n_regionkey": 1}',
            "{this is not json",
        ]
    else:
        lines = ["1,A,1", "not,enough"]  # csv row with missing field parses null-padded
        lines.append('2,"unterminated')  # genuinely malformed quote
    with open(os.path.join(path, "data." + fmt), "w") as f:
        f.write("\n".join(lines))
    good, corrupt = read_with_dead_letter(spark, path, fmt, SCHEMA)
    assert good.count() >= 1
    bad_rows = corrupt.collect()
    assert len(bad_rows) >= 1
    assert all(r[CORRUPT_COL] is not None for r in bad_rows)


def test_partitioned_write_prunes(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    write(orders, path, partition_by=["o_year"])
    back = spark.read.parquet(path)
    one_year = back.filter(F.col("o_year") == 1996)
    plan = one_year._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the scan must carry a PartitionFilters entry
    assert "PartitionFilters: [" in plan and "o_year" in plan
    want = orders.filter(F.col("o_year") == 1996).count()
    assert one_year.count() == want


def test_dynamic_partition_overwrite(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "dyn")
    write(orders, path, partition_by=["o_year"])
    total_before = spark.read.parquet(path).count()

    # rewrite ONLY 1996 with a tweaked frame: other partitions survive
    tweaked = (
        orders.filter(F.col("o_year") == 1996)
        .withColumn("o_orderpriority", F.lit("RERUN"))
    )
    write(
        tweaked,
        path,
        partition_by=["o_year"],
        dynamic_overwrite=True,
    )
    back = spark.read.parquet(path)
    assert back.count() == total_before
    assert (
        back.filter(F.col("o_year") == 1996)
        .filter(F.col("o_orderpriority") != "RERUN")
        .count()
        == 0
    )
    assert back.filter(F.col("o_year") != 1996).filter(
        F.col("o_orderpriority") == "RERUN"
    ).count() == 0


def test_bucketed_join_no_shuffle(spark, tmp_path):
    # warehouse dir is a static conf — bucketed tables land in the
    # session default (./spark-warehouse, gitignored) and are dropped.
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed_table(li, "li_b", ["l_orderkey"], 8)
    write_bucketed_table(orders, "ord_b", ["o_orderkey"], 8)
    joined = spark.table("li_b").join(
        spark.table("ord_b"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    # force SMJ path: disable broadcast to prove bucketing removes the
    # exchange (broadcast would hide it)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        n = joined.count()
        assert n == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_point_lookup_prunes_buckets(spark, tmp_path):
    """Bucket PRUNING — the read-side dividend of bucketBy beyond the
    shuffle-free join: an equality filter on the bucket column must
    scan ONE bucket of N (SelectedBucketsCount: 1 out of 8), the
    point-lookup pattern that makes a keyed fact probe O(1/N) of the
    table at 100 TB."""
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed_table(
        orders, "ord_prune_b", ["o_orderkey"], 8,
        path=str(tmp_path / "ord_prune_b"),
    )
    # autoBucketedScan turns the bucketed layout OFF when no operator
    # needs the clustering — but bucket PRUNING is itself the benefit
    # here, so pin the scan on for the probe (a production point-read
    # path sets the same conf).
    conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(conf)
    spark.conf.set(conf, "false")
    try:
        key = orders.limit(1).collect()[0]["o_orderkey"]
        probe = spark.table("ord_prune_b").filter(
            F.col("o_orderkey") == int(key)
        )
        probe.collect()
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
        assert probe.count() == 1
    finally:
        spark.conf.set(conf, old)
        spark.sql("DROP TABLE IF EXISTS ord_prune_b")
