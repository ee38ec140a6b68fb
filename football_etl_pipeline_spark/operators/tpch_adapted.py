"""TPC-H Q2/Q9/Q11/Q16/Q20 shape adaptations for the partsupp-less
testdata (Q2 closes the 22/22 sweep).

``tpch_more.py`` scoped these four out because the slimmed schema has
no ``partsupp`` table. Their QUERY SHAPES are still the point — a
profit expression over a 5-way join (Q9), a group aggregate gated by a
scalar-subquery fraction of the global total (Q11), a distinct-pair
rollup with a blacklist anti-join (Q16), and a correlated-aggregate
dominance test (Q20) — so each is re-expressed over the tables that
exist (plus Q2's correlated-MIN minimum-cost-supplier shape), with
the stand-ins documented per query:

- supply cost        → ``0.6 * p_retailprice`` (fixed margin proxy)
- part-supplier pairs→ ``SELECT DISTINCT l_partkey, l_suppkey``
- supplier complaints→ ``s_acctbal < 0``
- available quantity → quantity actually shipped in the window

Broadcast policy matches ``tpch_more.py``: explicit hints only for
fixed-cardinality frames (nation, 1-row scalars, the ≤ handful-row
blacklist); part/supplier/customer are AQE-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dsum
from ..sources.testdata import load_table
from .registry import query

# Q9's supply-cost proxy: cost-of-goods at a fixed 60% of list price.
COST_RATIO = 0.6
# Q11's importance gate: parts holding more than this share of total
# shipped inventory value. Scale-free (a share, not an absolute), so
# the query returns a stable head at every sf.
Q11_FRACTION = 0.001


@query(
    "q9_profit_by_nation_year",
    oracle=f"""
    SELECT
      n.n_name AS nation,
      year(o.o_orderdate) AS o_year,
      CAST(SUM(CAST(
        l.l_extendedprice * (1 - l.l_discount)
          - {COST_RATIO} * p.p_retailprice * l.l_quantity
        AS DECIMAL(18,6))) AS DOUBLE) AS profit,
      COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    """,
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit) with supply cost proxied as
    ``0.6 * p_retailprice`` (no partsupp in this schema).

    Plan: the ``%red%`` part filter prunes the part side BEFORE its
    join (Catalyst pushes the Like into the scan), lineitem⋈orders
    shuffles on orderkey, nation broadcasts; the per-(nation, year)
    final aggregate is 25×7 groups — partial-agg does almost all the
    work map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(COST_RATIO) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(profit).alias("profit"), F.count(F.lit(1)).alias("n_lines"))
    )


# Q11's filtered base: inventory value shipped by NATION_3 suppliers,
# valued at list price. Shared between the per-part aggregate and the
# scalar total so both sides gate on identical rows.
_Q11_BASE = """
      SELECT l.l_partkey AS p_key,
             CAST(l.l_quantity * p.p_retailprice AS DECIMAL(18,6)) AS val
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
"""


@query(
    "q11_important_parts",
    oracle=f"""
    WITH base AS ({_Q11_BASE})
    SELECT
      p_key,
      CAST(SUM(val) AS DOUBLE) AS part_value
    FROM base
    GROUP BY p_key
    HAVING CAST(SUM(val) AS DOUBLE) >
      {Q11_FRACTION} * (SELECT CAST(SUM(val) AS DOUBLE) FROM base)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock) re-based on shipped inventory value
    (``l_quantity * p_retailprice`` for one nation's suppliers) since
    there is no partsupp availqty.

    Plan: the filtered base is built once; the per-part aggregate and
    the 1-row global total are two aggregations of the same subtree
    (Spark reuses the exchange), and the total rides a broadcast
    cross-join into the HAVING filter — no second pass over lineitem.
    Decimal sums on both sides make the share gate engine-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    base = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            F.col("l_partkey").alias("p_key"),
            (F.col("l_quantity") * F.col("p_retailprice"))
            .cast("decimal(18,6)")
            .alias("val"),
        )
    )
    grouped = base.groupBy("p_key").agg(
        F.sum("val").cast("double").alias("part_value")
    )
    total = base.agg(F.sum("val").cast("double").alias("total_value"))
    return (
        grouped.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.lit(Q11_FRACTION) * F.col("total_value"))
        .select("p_key", "part_value")
    )


@query(
    "q16_supplier_count_by_part_attrs",
    oracle="""
    SELECT
      p.p_brand,
      p.p_type,
      p.p_size,
      COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#2'
      AND p.p_type NOT LIKE 'ECONOMY%'
      AND p.p_size IN (1, 5, 11, 28, 37)
      AND ps.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_count_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship) with part-supplier
    pairs derived from lineitem (no partsupp) and the
    complaint-supplier blacklist proxied as ``s_acctbal < 0``.

    Plan: the pair-distinct is the only fact shuffle (partial
    distinct map-side first); the part attribute filters push into the
    part scan; the blacklist is a handful of rows — broadcast
    LEFT ANTI (NOT IN is safe here: s_suppkey is non-null by
    construction, so 3VL null semantics don't bite); count-distinct
    re-shuffles only the filtered survivor pairs."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & (~F.col("p_type").like("ECONOMY%"))
        & (F.col("p_size").isin(1, 5, 11, 28, 37))
    )
    blacklist = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        pairs.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(blacklist),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_dominant_part_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT
        l.l_partkey,
        l.l_suppkey,
        CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS qty_ps
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'small%'
        AND l.l_shipdate >= TIMESTAMP '1995-01-01'
        AND l.l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l.l_partkey, l.l_suppkey
    ), with_total AS (
      SELECT
        l_partkey,
        l_suppkey,
        qty_ps,
        SUM(qty_ps) OVER (PARTITION BY l_partkey) AS qty_part
      FROM shipped
    )
    SELECT
      s.s_name,
      COUNT(*) AS n_dominated
    FROM with_total w
    JOIN supplier s ON s.s_suppkey = w.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE 2 * w.qty_ps > w.qty_part
      AND n.n_name IN ('NATION_5', 'NATION_6', 'NATION_7')
    GROUP BY s.s_name
    """,
)
def q20_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion) with availqty proxied by
    shipped quantity: suppliers in three nations who shipped MORE THAN
    HALF of a small-part's 1995-96 volume — the same correlated
    per-part aggregate threshold shape, minus partsupp.

    Plan: one (part, supplier) aggregate over the date+name-pruned
    fact scan, then the per-part total as a window over that ALREADY
    AGGREGATED frame (one extra exchange on l_partkey over ~|parts|
    rows — never a second fact pass, the 100 TB-safe formulation of
    the correlated subquery). Dominance compares ``2*qty_ps >
    qty_part`` in decimal — exact, no division. Supplier and nation
    close it out as broadcast-sized joins."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    shipped = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("decimal(28,6)")
            .alias("qty_ps")
        )
    )
    with_total = shipped.withColumn(
        "qty_part", F.sum("qty_ps").over(Window.partitionBy("l_partkey"))
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_5", "NATION_6", "NATION_7")
    )
    return (
        with_total.filter(2 * F.col("qty_ps") > F.col("qty_part"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_dominated"))
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supplycost
      FROM lineitem GROUP BY 1, 2
    ),
    eu AS (
      SELECT ps.l_partkey AS partkey, ps.l_suppkey AS suppkey,
             ps.supplycost
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
                   AND r.r_name = 'EUROPE'
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
           e.supplycost
    FROM eu e
    JOIN part p ON p.p_partkey = e.partkey
              AND p.p_size IN (5, 15, 25, 35, 45)
              AND p.p_type = 'STANDARD'
    JOIN supplier s ON s.s_suppkey = e.suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE e.supplycost = (
      SELECT MIN(e2.supplycost) FROM eu e2 WHERE e2.partkey = e.partkey
    )
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), the last of the five
    partsupp queries, closing the 22/22 sweep. Supply cost is proxied
    by the cheapest line price each supplier ever shipped a part at
    (``MIN(l_extendedprice)`` per (partkey, suppkey) — an exact MIN,
    no float summation, so the cross-engine equality gate is safe).

    The reference has no query surface at all (its one join is the
    ~20-row teams⋈standings broadcast,
    ``dataflow-flex/football_pipeline/transforms.py:32``); this is the
    classic correlated-MIN shape a general engine must run.

    Plan (the 100 TB formulation): the derived supply relation is ONE
    aggregate over the fact scan; the region gate rides
    supplier⋈nation⋈broadcast(region) over the *aggregated* frame
    (|parts|·|supps-per-part| rows, never a second fact pass). The
    part-attr filter prunes partkeys BEFORE the per-part MIN window —
    legal because the Q2 correlation is on partkey alone, so dropping
    whole partkeys never changes a surviving part's minimum, and it
    shrinks the window exchange from every part to the ~0.3% that
    pass the size/type gate. The correlated subquery itself is the
    window ``MIN() OVER (PARTITION BY partkey)`` + equality filter —
    one exchange on a pre-shrunk frame, ties kept (Q2 keeps ties).
    Final ORDER BY ... LIMIT 100 is a TakeOrdered, no global sort.
    The ordering key (acctbal DESC, n_name, s_name, p_partkey) is a
    total order because s_name is unique per supplier, so the LIMIT
    boundary is deterministic for the oracle hash."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(5, 15, 25, 35, 45)
        & (F.col("p_type") == "STANDARD")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")

    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("supplycost")
    )
    eu = (
        ps.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
    )
    best = eu.withColumn(
        "min_cost", F.min("supplycost").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("supplycost") == F.col("min_cost"))
    return (
        best.select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            "supplycost",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )
