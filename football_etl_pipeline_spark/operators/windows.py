"""Window-function operators: ranking, analytic (lag/lead), and frame
aggregations.

Reference parity: the reference stores a precomputed ``rank`` column
(``/root/reference/unified_schemas/v1.json:12``) — its upstream API
computed the ranking. Here ranking is a first-class operator
(the flagship ``entry()`` recomputes standings rank the same way).

Determinism rule: every ORDER BY inside a window carries a unique
tiebreaker column so row_number/lag/frames are well-defined in both
engines. Frame sums go through DECIMAL (see functions/numeric.py).

Scale: a window = one shuffle on partitionBy + an in-partition sort.
All partitions here are natural keys (custkey, user_id, priority)
with bounded cardinality skew; none is a single global partition —
the one global ranking below is over a pre-aggregated (tiny) frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .registry import query


@query(
    "window_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, rn
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via row_number — the scalable idiom (no global
    sort; AQE prunes with the rank filter pushed into the sort)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "rn",
        )
    )


@query(
    "window_rank_family",
    oracle="""
    SELECT
      c_custkey,
      c_mktsegment,
      RANK()         OVER w AS rnk,
      DENSE_RANK()   OVER w AS drnk,
      NTILE(4)       OVER w AS quartile,
      CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pct_rank,
      CAST(CUME_DIST()    OVER w AS DOUBLE) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking family over one window definition."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).cast("double").alias("pct_rank"),
        F.cume_dist().over(w).cast("double").alias("cume"),
    )


@query(
    "window_running_total",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      o_orderdate,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS running_spend,
      ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        AS order_seq
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame: per-customer running spend over order history."""
    orders = load_table(spark, sf_dir, "orders")
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
        F.row_number().over(wo).alias("order_seq"),
    )


@query(
    "window_lag_lead_delta",
    oracle="""
    SELECT
      user_id,
      event_id,
      ts,
      CAST(value - LAG(value) OVER w AS DOUBLE) AS delta_prev,
      LEAD(event_type) OVER w AS next_type,
      CAST(date_diff('second', LAG(ts) OVER w, ts) AS BIGINT) AS gap_sec
    FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value, event_type FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: per-user value delta, next event type, and
    inter-event gap in seconds (the sessionization building block)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        (F.col("value") - F.lag("value").over(w)).cast("double").alias("delta_prev"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)))
        .cast("bigint")
        .alias("gap_sec"),
    )


@query(
    "window_moving_avg",
    oracle="""
    SELECT
      l_suppkey,
      l_orderkey,
      l_linenumber,
      l_shipdate,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
             OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
      / COUNT(*) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        AS qty_ma7
    FROM lineitem
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding frame (7-row moving average) per supplier, computed as
    exact decimal sum / count so the sliding-window accumulation order
    can't drift.

    The sort carries l_quantity as the FINAL tiebreak because the
    testdata's (l_orderkey, l_linenumber) is NOT unique — at sf0.1,
    rows exist that share (suppkey, shipdate, orderkey, linenumber)
    with different quantities, and a ROWS frame over an ambiguous
    order put engine-dependent quantities in the 7-row window
    (measured: two tied rows differing by 3 units → a 3/7 drift in
    qty_ma7). With quantity in the key, the quantity SEQUENCE is
    total even where row identity isn't, so the frame sums — and the
    output multiset — are engine-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"
    ).rowsBetween(-6, Window.currentRow)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        (
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("qty_ma7"),
    )


@query(
    "window_first_last_nth",
    oracle="""
    SELECT DISTINCT
      o_custkey,
      FIRST_VALUE(o_orderkey) OVER w AS first_order,
      LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        AS last_order,
      NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value over full-partition frames, collapsed to
    one row per customer."""
    orders = load_table(spark, sf_dir, "orders")
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        orders.select(
            "o_custkey",
            F.first("o_orderkey").over(wo).alias("first_order"),
            F.last("o_orderkey").over(wfull).alias("last_order"),
            F.nth_value("o_orderkey", 2).over(wfull).alias("second_order"),
        )
        .distinct()
    )


@query(
    "window_range_frame_30d",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      o_orderdate,
      COUNT(*) OVER w AS n_orders_30d,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
        AS spend_30d
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey
      ORDER BY o_orderdate
      RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
    )
    """,
)
def window_range_frame_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) window frame: each order sees the count and
    exact-decimal spend of the SAME customer's orders in the trailing
    30 days — a frame defined by time distance, not row count (same-
    date ties are all in-frame, which ROWS frames can't express).

    Plan: one shuffle on o_custkey, sort by date, then a sliding
    range-frame scan; Spark expresses the time interval as an epoch-
    seconds rangeBetween over the cast ordering column."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        # NTZ has no direct long cast; NTZ → TIMESTAMP is exact under
        # the session's UTC timezone, then → epoch seconds.
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30 * 86400, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("spend_30d"),
    )
