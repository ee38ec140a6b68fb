"""Subquery-pattern operators: EXISTS / scalar-subquery / IN-subquery
shapes from the TPC-H suite, expressed the way Catalyst wants them
(semi joins and window/aggregate joins rather than correlated
per-row subqueries).

The reference has no subqueries (its only lookup is the broadcast
probe ``/root/reference/dataflow-flex/.../transforms.py:35-46``);
this widens the relational surface per SURVEY.md §2c.

Scale notes: every correlated predicate here is decorrelated by
construction — EXISTS becomes LEFT SEMI (one shuffle, no row
explosion), the per-group scalar subquery becomes an aggregate join
(broadcast when the group table is small), and IN-subquery becomes a
semi join on the aggregated key set. These are exactly the rewrites
Catalyst's decorrelation would do; writing them explicitly keeps the
plans stable across versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum
from ..sources.testdata import load_table
from .registry import query


@query(
    "q4_order_priority",
    oracle="""
    SELECT
      o.o_orderpriority,
      COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_returnflag = 'R'
      )
    GROUP BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS(correlated) → LEFT SEMI join. (The
    testdata's lineitem has no commit/receipt dates, so the EXISTS
    predicate is "order has a returned line" — same decorrelation.)

    Plan: the lineitem side is pre-filtered and the semi join
    deduplicates matches without materializing them — one shuffle on
    orderkey, then a tiny hash aggregate on priority."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    late = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey, 0.2 * AVG(l_quantity) AS threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
        AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN part_avg a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND p.p_type = 'MEDIUM'
      AND l.l_quantity < a.threshold
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: per-part scalar subquery (0.2×avg quantity) →
    aggregate-then-join decorrelation.

    Plan: one pass computes per-part averages (partial+final agg on
    partkey), joined back to the filtered fact; the selective part
    filter broadcasts. AVG stays double on both sides — fold order
    inside one partkey group is row order, identical in both engines
    only after the exact-decimal SUM; here AVG(l_quantity) divides an
    exact integer sum, so it's deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "MEDIUM")
    )
    # integer-valued doubles: sum exactly via decimal, divide once
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double")
                / F.count("l_quantity")
            )
        ).alias("threshold")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(part_avg, li.l_partkey == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (dsum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly")
        )
    )


@query(
    "q18_large_volume_customer",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    SELECT
      c.c_name,
      c.c_custkey,
      o.o_orderkey,
      o.o_orderdate,
      CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
      CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
    LIMIT 100
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: IN (aggregated subquery) → semi join on the HAVING
    result.

    Plan: the big-order key set is an aggregate (one shuffle on
    orderkey), semi-joined into lineitem BEFORE the wide join with
    orders/customer — the selective filter runs first, so the 3-way
    join only sees qualifying orders. Top-100 via TakeOrdered."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    li_big = li.join(big.withColumnRenamed("l_orderkey", "b_orderkey"),
                     li.l_orderkey == F.col("b_orderkey"), "left_semi")
    return (
        li_big.join(orders, li_big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@query(
    "correlated_max_per_group",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name,
           CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_acctbal = (
      SELECT MAX(s2.s_acctbal) FROM supplier s2
      WHERE s2.s_nationkey = s.s_nationkey
    )
    ORDER BY n.n_name, s.s_suppkey
    """,
)
def correlated_max_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MAX subquery (top supplier per
    nation) → window-max + equality filter, the decorrelation that
    avoids a second scan of supplier entirely.

    Plan: one scan, one shuffle on nationkey for the window, filter,
    broadcast nation for the name. Equality on the max is exact (the
    compared doubles are the same stored values)."""
    from pyspark.sql import Window

    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey")
    return (
        supp.withColumn("_mx", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("_mx"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
        )
        .orderBy("n_name", "s_suppkey")
    )


@query(
    "scalar_subquery_above_avg",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    WHERE o_totalprice > (
      SELECT 1.5 * (CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(o_totalprice))
      FROM orders
    )
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 50
    """,
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (global threshold) → cross join
    with a 1-row aggregate, which Spark executes as a broadcast
    nested loop: the scalar is computed once and streamed into the
    filter — no driver round-trip, no collect()."""
    orders = load_table(spark, sf_dir, "orders")
    thr = orders.agg(
        (
            1.5
            * (
                F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double")
                / F.count("o_totalprice")
            )
        ).alias("thr")
    )
    return (
        orders.join(F.broadcast(thr))
        .filter(F.col("o_totalprice") > F.col("thr"))
        .select("o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(50)
    )


@query(
    "subquery_not_in_null_semantics",
    oracle="""
    WITH excl AS (
      -- deliberately nullable key set: negative-balance customers
      -- surface as NULL, poisoning NOT IN per SQL 3-valued logic
      SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END AS k
      FROM customer
      WHERE c_mktsegment = 'BUILDING'
    )
    SELECT 'not_in' AS variant, COUNT(*) AS n_orders
    FROM orders
    WHERE o_custkey NOT IN (SELECT k FROM excl)
    UNION ALL
    SELECT 'not_exists' AS variant, COUNT(*) AS n_orders
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM excl WHERE excl.k = o.o_custkey)
    """,
)
def subquery_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN vs NOT EXISTS under NULLs — SQL's classic 3-valued-logic
    trap, pinned as a query: one NULL in the subquery's key set makes
    every ``NOT IN`` predicate UNKNOWN (count 0), while ``NOT EXISTS``
    ignores the NULL and counts normally. Both engines must agree on
    BOTH branches.

    Plan: Spark plans NOT IN as a null-aware anti join (a broadcast
    of the key set with an extra null check) and NOT EXISTS as a
    plain left-anti — the two counts come from one orders scan each,
    union'd."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH excl AS (
          SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END AS k
          FROM customer
          WHERE c_mktsegment = 'BUILDING'
        )
        SELECT 'not_in' AS variant, COUNT(*) AS n_orders
        FROM orders
        WHERE o_custkey NOT IN (SELECT k FROM excl)
        UNION ALL
        SELECT 'not_exists' AS variant, COUNT(*) AS n_orders
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM excl WHERE excl.k = o.o_custkey)
        """
    )


_LATERAL_SQL = """
SELECT c.c_custkey, o.o_orderkey,
       CAST(o.o_totalprice AS DOUBLE) AS recent_price
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_orderdate DESC, o_orderkey ASC
  LIMIT 3
) o
WHERE c.c_mktsegment = 'MACHINERY'
"""


@query("lateral_topk_recent_orders", oracle=_LATERAL_SQL)
def lateral_topk_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT —
    the SQL-surface face of "top-k rows per outer row", written as
    the IDENTICAL query text in both dialects (the whole point: a
    user's lateral query ports verbatim).

    Plan: Catalyst DECORRELATES the lateral into a row_number window
    PARTITIONED BY o_custkey + filter rn<=3 + broadcast join with the
    filtered customers — no per-customer re-execution and no
    single-partition window, so the shape survives 100×. The ordering
    key (o_orderdate DESC, o_orderkey ASC) is a unique total order
    per customer, so both engines select an identical row set."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_SQL)
