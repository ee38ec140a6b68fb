"""Skew-mitigation operators: salted shuffle aggregation and salted
join — the manual fallbacks for hot keys when AQE's skew-join split
(enabled in ``session.py``) can't help, e.g. a skewed AGGREGATE key
or a build side too big to split.

Both operators produce results IDENTICAL to their unsalted forms
(the DuckDB oracles are the plain formulations — that's the point:
salting is a physical rewrite, not a semantic one).

Scale pattern:
- salted aggregation: append salt = pmod(hash(entire row tuple), S)
  to the group key, pre-aggregate (S-way fan-out of each hot key),
  strip the salt, final-aggregate. Two small shuffles instead of one
  with a straggler task. Works for any algebraic aggregate.
- salted join: explode the BROADCAST-able side S× (one copy per salt
  value), salt the big side's key randomly-but-deterministically, and
  equi-join on (key, salt) — every hot key's rows spread across S
  tasks. Salt derived from a row attribute (not rand()) so the plan
  stays deterministic and retry-safe — nondeterministic salts break
  task retry idempotency, a real cluster failure mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum
from ..sources.testdata import load_table
from .registry import query

N_SALTS = 8


@query(
    "skew_salted_agg",
    oracle="""
    SELECT
      o_orderpriority,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation on a low-cardinality (⇒ skewed by
    construction) key: 5 priorities over all orders means 5 hot
    reduce tasks in the naive plan. Salting fans each key into
    N_SALTS partial groups (first shuffle ~uniform), then merges the
    partials (second shuffle is 5×N_SALTS tiny rows).

    Oracle = the plain GROUP BY: salting must be invisible in the
    result. Partial counts/sums are algebraic, so the merge is
    sum-of-partials; the DECIMAL sums keep the merge exact."""
    orders = load_table(spark, sf_dir, "orders")
    salted = orders.withColumn(
        "_salt", F.pmod(F.hash("o_orderkey"), F.lit(N_SALTS))
    )
    partial = salted.groupBy("o_orderpriority", "_salt").agg(
        F.count(F.lit(1)).alias("pc"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("ps"),
    )
    return partial.groupBy("o_orderpriority").agg(
        F.sum("pc").alias("n_orders"),
        F.sum("ps").cast("decimal(18,6)").cast("double").alias("total_price"),
    )


@query(
    "skew_salted_join",
    oracle="""
    SELECT
      n.n_name,
      COUNT(*) AS n_customers,
      CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_balance
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join: customers (big, skewed toward a few nations)
    joined to nation (tiny) WITHOUT relying on broadcast — the manual
    plan you need when the small side is 100s of MB (too big to
    broadcast, too hot to shuffle plain).

    The small side is exploded N_SALTS× via a literal salt array; the
    big side computes a deterministic salt from its own key, so each
    (nationkey, salt) bucket holds ~1/N_SALTS of a hot nation's rows.
    Broadcast is disabled FOR THIS JOIN via a merge hint to force the
    shuffle path the rewrite exists for. Oracle = the plain join."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    salts = F.array(*[F.lit(i) for i in range(N_SALTS)])
    nation_exp = nation.withColumn("_salt", F.explode(salts))
    cust_s = cust.withColumn(
        "_salt", F.pmod(F.hash("c_custkey"), F.lit(N_SALTS))
    )
    joined = cust_s.hint("merge").join(
        nation_exp,
        (cust_s.c_nationkey == nation_exp.n_nationkey)
        & (cust_s._salt == nation_exp._salt),
    )
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum(F.col("c_acctbal")).alias("total_balance"),
    )
