"""Set operations and multi-dimensional grouping (rollup/cube/
grouping sets/pivot).

All-new surface relative to the reference (SURVEY.md §2c) — the
reference never unions or subtotals anything. Set ops are expressed
with DataFrame union/intersect/exceptAll so Catalyst plans them as
hash aggregates/joins; rollup/cube use the native Expand operator
(one scan, no N-pass union of subtotal queries — the shape that
matters at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum
from ..sources.testdata import load_table
from .registry import query


@query(
    "setop_priority_overlap",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def setop_priority_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): customers who placed both
    urgent and low-priority orders."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return urgent.intersect(low)


@query(
    "setop_except_all",
    oracle="""
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference — multiplicity preserved)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    r = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    return a.exceptAll(r)


@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): nations present on either side of the market."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).distinct()


@query(
    "setop_union_all_counts",
    oracle="""
    SELECT side, COUNT(*) AS n FROM (
      SELECT 'customer' AS side FROM customer
      UNION ALL
      SELECT 'supplier' AS side FROM supplier
    ) GROUP BY side
    """,
)
def setop_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL via unionByName — schema aligned by column name, the
    safe union at scale (positional unions silently misalign)."""
    c = load_table(spark, sf_dir, "customer").select(F.lit("customer").alias("side"))
    s = load_table(spark, sf_dir, "supplier").select(F.lit("supplier").alias("side"))
    return c.unionByName(s).groupBy("side").agg(F.count(F.lit(1)).alias("n"))


@query(
    "rollup_revenue",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      COUNT(*) AS n,
      CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
      CAST(GROUPING(l_linestatus) AS INT) AS g_status
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: (flag,status) → (flag) → () subtotals in ONE scan via
    the Expand operator; GROUPING() distinguishes subtotal NULLs from
    data NULLs."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
    )


@query(
    "cube_order_matrix",
    oracle="""
    SELECT
      o_orderstatus,
      o_orderpriority,
      COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping combinations in one Expand pass."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("o_totalprice")).alias("total"),
    )


@query(
    "grouping_sets_custom",
    oracle="""
    SELECT
      c_mktsegment,
      c_nationkey,
      COUNT(*) AS n
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    """,
)
def grouping_sets_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — two independent groupings, one scan."""
    cust = load_table(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )


@query(
    "pivot_events_by_type",
    oracle="""
    SELECT
      user_id,
      COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS view,
      COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS click,
      COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup,
      COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS error
    FROM events
    GROUP BY user_id
    """,
)
def pivot_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (never let pivot infer values
    at scale — that's an extra distinct pass over the data)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["view", "click", "signup", "purchase", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["view", "click", "signup", "purchase", "error"])
    )


@query(
    "unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, metric, CAST(val AS DOUBLE) AS val
    FROM (
      SELECT p_partkey,
             CAST(p_size AS DOUBLE) AS size,
             CAST(p_retailprice AS DOUBLE) AS retailprice
      FROM part
    ) UNPIVOT (val FOR metric IN (size, retailprice))
    """,
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt via the native unpivot operator (stack-equivalent)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size"),
            F.col("p_retailprice").cast("double").alias("retailprice"),
        )
        .unpivot("p_partkey", ["size", "retailprice"], "metric", "val")
    )
