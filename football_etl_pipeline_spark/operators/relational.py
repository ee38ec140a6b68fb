"""Core relational operators: scan → filter/project → hash aggregate.

Reference parity: the reference's only aggregation is a GroupByKey
(``/root/reference/dataflow-flex/football_pipeline/pipeline.py:39``)
and its filters are probe-miss drops and guards
(``transforms.py:26-27,44-46``). Here those generalize to the full
scan/filter/aggregate surface, expressed declaratively so Catalyst
pushes filters and projections into the parquet scan and runs the
aggregates as partial (map-side) + final hash aggregation — the plan
shape that scales to 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import davg, dsum
from ..sources.testdata import load_table
from .registry import query


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: full-scan hash aggregate — 2 group cols, 8 aggregates.

    Plan: parquet scan with ReadSchema pruned to 7 columns and the
    shipdate predicate pushed down → partial HashAggregate →
    single shuffle on (returnflag, linestatus) → final HashAggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "scan_filter_project",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS DOUBLE) AS net_price,
      l_returnflag
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
      AND l_discount > 0.05
      AND l_returnflag IN ('A', 'R')
    """,
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate pushdown showcase: BETWEEN + range + IN filters, pruned
    projection, derived column. All three predicates reach the parquet
    scan (PushedFilters) — the scan reads 6 of 16 columns."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_shipdate").between(
                F.lit("1995-01-01").cast("timestamp"),
                F.lit("1996-12-31").cast("timestamp"),
            )
            & (F.col("l_discount") > 0.05)
            & F.col("l_returnflag").isin("A", "R")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,6)")
            .cast("double")
            .alias("net_price"),
            "l_returnflag",
        )
    )


@query(
    "agg_stats_by_segment",
    oracle="""
    SELECT
      c_mktsegment,
      COUNT(*) AS n_customers,
      COUNT(DISTINCT c_nationkey) AS n_nations,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_balance,
      CAST(MIN(c_acctbal) AS DOUBLE) AS min_balance,
      CAST(MAX(c_acctbal) AS DOUBLE) AS max_balance
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_stats_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate with COUNT DISTINCT (expand + two-phase agg)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        dsum(F.col("c_acctbal")).alias("total_balance"),
        F.min("c_acctbal").alias("min_balance"),
        F.max("c_acctbal").alias("max_balance"),
    )


@query(
    "distinct_values",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority
    FROM orders
    """,
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = groupBy-no-agg; Catalyst plans it as a hash aggregate."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority"
    ).distinct()


@query(
    "orderby_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def orderby_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K: Spark plans TakeOrderedAndProject — each partition
    keeps its local top 25, only 25xP rows move — no full sort at scale."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@query(
    "agg_exact_percentiles",
    oracle="""
    SELECT
      l_returnflag,
      quantile_cont(l_quantity, 0.25) AS p25,
      quantile_cont(l_quantity, 0.5)  AS p50,
      quantile_cont(l_quantity, 0.75) AS p75,
      COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (type-7 linear interpolation) per group —
    Spark's ``percentile`` and DuckDB's ``quantile_cont`` share the
    interpolation formula, verified bit-identical on this data.

    Scale note: exact percentiles sort each group's values — fine for
    bounded groups; for heavy-hitter keys switch to
    ``approx_percentile`` (t-digest, mergeable, no sort) and accept
    the error bound. Both belong in the library; this is the exact
    anchor the approximate one is measured against."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25D)").alias("p25"),
        F.expr("percentile(l_quantity, 0.5D)").alias("p50"),
        F.expr("percentile(l_quantity, 0.75D)").alias("p75"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT
      CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE)
        AS revenue,
      COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + global aggregate — the pushdown litmus
    test. All four predicates reach the parquet scan (PushedFilters);
    the aggregate is a map-side partial + one single-row merge, i.e.
    the whole query moves ~P rows across the wire."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q14_promo_revenue_share",
    oracle="""
    SELECT
      CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO'
                 THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END
               AS DECIMAL(18,6))) AS DOUBLE)
      / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
               AS DECIMAL(18,6))) AS DOUBLE) * 100.0 AS promo_share_pct,
      COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional aggregate ratio (promo revenue share).
    part is AQE-sized (broadcast while it fits — it scales with SF,
    so no hardcoded hint); the month filter prunes the
    fact scan; both sums are exact-decimal so the final double
    division is deterministic across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                dsum(F.when(F.col("p_type") == "PROMO", net).otherwise(0.0))
                / dsum(net)
                * 100.0
            ).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---- PIVOT (wide conditional aggregation) -------------------------------

_PIVOT_PRIORITIES = (
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
)
_PIVOT_ALIASES = ("urgent", "high", "medium", "not_specified", "low")


def _pivot_oracle() -> str:
    cols = ",\n      ".join(
        f"CAST(SUM(CAST(CASE WHEN o_orderpriority = '{p}'"
        f" THEN o_totalprice ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)"
        f" AS {a}_revenue"
        for p, a in zip(_PIVOT_PRIORITIES, _PIVOT_ALIASES)
    )
    return f"""
    SELECT o_orderstatus,
      {cols}
    FROM orders
    GROUP BY o_orderstatus
    """


@query("orders_pivot_revenue_matrix", oracle=_pivot_oracle())
def orders_pivot_revenue_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT — the wide reporting shape (`GROUP BY status PIVOT
    priority`): revenue per order status × priority as a status-rows
    × priority-columns matrix, via DataFrame ``groupBy().pivot()``
    with the value list given EXPLICITLY. Two things make this the
    100-TB shape (both plan-pinned): (1) declared values mean NO
    values-discovery job — an implicit pivot first runs a
    distinct-values collect, a hidden driver-roundtrip scan of the
    whole table; (2) Spark compiles the pivot as aggregate-THEN-pivot:
    a map-side-partial (status, priority) aggregate reduces the corpus
    to the ≤15-cell key space before the ``pivotfirst`` widening
    aggregate — two exchanges, both over model-sized frames, no
    Expand. Money sums ride the DECIMAL(18,6) house pattern per cell;
    a missing (status, priority) cell is an honest 0 (coalesced here,
    CASE-ELSE-0 in the oracle)."""
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", list(_PIVOT_PRIORITIES))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
        )
    )
    renamed = wide.select(
        "o_orderstatus",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0.0)).alias(f"{a}_revenue")
            for p, a in zip(_PIVOT_PRIORITIES, _PIVOT_ALIASES)
        ],
    )
    return renamed
