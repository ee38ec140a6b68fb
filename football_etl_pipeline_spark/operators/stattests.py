"""Distribution-comparison and concentration statistics computed
in-engine: two-sample Kolmogorov–Smirnov, tie-corrected Mann–Whitney
U, a Benford first-digit screen, the Gini coefficient, CUSUM
changepoint detection, and a deterministic half-sample bootstrap CI.

These are the readouts a data-curation pipeline runs on its OWN
tables — "did source A's length distribution drift from source B's",
"is revenue concentration pathological", "when did the daily series
shift" — so they belong in the engine next to the profiling and
drift operators (``profiling.py``, ``textops.text_source_drift_tvd``)
rather than in client-side notebooks.

Exactness contract (the registry's rule 2): every statistic is
derived from exact integer counts / DECIMAL sums, then pushed through
ONE fixed IEEE expression chain written identically in both dialects
(+, −, ×, ÷, sqrt are correctly rounded, so identical inputs give
identical bits), and finally pinned to DECIMAL(18,6). No engine-side
float aggregation ever feeds a statistic.

Scale contract: NO global single-partition window over a
corpus-sized frame. Running totals over value-grouped frames go
through the range-exchange + partition-offset pattern
(``_range_prefix`` below, same design as the rank machinery in
``tpch_more.py:588-640``): one range exchange, per-partition window,
P-row driver collect (P fixed by config, corpus-independent).

Registered AFTER the driver's frozen first-50 CORRECTNESS window —
this module is imported at the END of ``operators.__init__._load_all``
(see tests/test_testdata_schema.py::test_driver_window_is_pinned).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .registry import persist_tracked, query

PREFIX_PARTS = 32  # width of the range exchange behind running sums


def _d6(c):
    return c.cast("decimal(18,6)").cast("double")


def _range_prefix(
    df: DataFrame,
    order_cols: list[str],
    weight_cols: list[str],
    group_cols: list[str] | None = None,
    persist_input: bool = False,
) -> DataFrame:
    """Inclusive running totals of ``weight_cols`` in ``order_cols``
    order WITHOUT a single-partition window: range-partition on the
    (unique) sort key, take per-partition window cumsums, then add
    each partition's start offset. Offsets come from a bounded collect
    of per-partition totals (P = PREFIX_PARTS rows, ×G with grouping —
    P fixed by config, G small by contract — the same
    bounded-driver-traffic budget as the NTILE machinery in
    ``tpch_more._ntile4_distributed``). Adds ``cum_<w>`` per weight.

    With ``group_cols`` the running total restarts per group (the
    range exchange keys on group THEN order, and each group's offsets
    prefix-sum only that group's partition totals) — grouped running
    totals with NO per-group single-partition window, for grouped
    medians/ECDFs where one group may carry millions of rows. G must
    be small (the offset lookup compiles to a per-group literal-array
    CASE); corpus-scale group counts should groupBy first.

    The caller guarantees (group_cols +) ``order_cols`` is a unique
    total order (the frames here are one-row-per-distinct-value), so
    the running total is well defined and engine-independent."""
    gcols = list(group_cols or [])
    # r15: optionally persist the INPUT before the range repartition —
    # repartitionByRange first runs a boundary-sampling pass over its
    # child, so an un-cached input executes its whole upstream twice
    # (sample + shuffle write). For an expensive upstream (a fact-table
    # aggregate) the cut wins (weighted_median A/B: 3.4→2.5s); for the
    # cheap per-value count frames most callers pass, the cache
    # materialization costs more than the saved recompute (ks-drift
    # A/B: 0.95→1.15s), so it is opt-in.
    if persist_input:
        df = persist_tracked(df)
    part = persist_tracked(
        df.repartitionByRange(PREFIX_PARTS, *gcols, *order_cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    rows = (
        part.groupBy("_pid", *gcols)
        .agg(*[F.sum(w).alias(f"_t_{w}") for w in weight_cols])
        .collect()
    )
    # totals[group_key][pid] -> [per-weight totals]
    totals: dict[tuple, dict[int, list]] = {}
    for r in rows:
        gk = tuple(r[g] for g in gcols)
        totals.setdefault(gk, {})[r["_pid"]] = [
            r[f"_t_{w}"] for w in weight_cols
        ]
    offs: dict[tuple, dict[str, list[int]]] = {}
    for gk, by_pid in totals.items():
        o: dict[str, list[int]] = {w: [] for w in weight_cols}
        acc = [0] * len(weight_cols)
        for p in range(PREFIX_PARTS):
            for i, w in enumerate(weight_cols):
                o[w].append(acc[i])
            if p in by_pid:
                acc = [a + (t or 0) for a, t in zip(acc, by_pid[p])]
        offs[gk] = o
    wloc = (
        Window.partitionBy("_pid", *gcols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def _offset(w: str):
        if not gcols:
            arr = offs.get((), {w: [0] * PREFIX_PARTS})[w]
            return F.array(*[F.lit(v) for v in arr])[F.col("_pid")]
        expr = F.lit(0)
        for gk, o in offs.items():
            cond = F.lit(True)
            for g, v in zip(gcols, gk):
                cond = cond & (F.col(g) == F.lit(v))
            expr = F.when(
                cond, F.array(*[F.lit(v) for v in o[w]])[F.col("_pid")]
            ).otherwise(expr)
        return expr

    out = part
    for w in weight_cols:
        out = out.withColumn(f"cum_{w}", _offset(w) + F.sum(w).over(wloc))
    return out.drop("_pid")


# ---- two-sample Kolmogorov–Smirnov drift test -------------------------

KS_SRC_A, KS_SRC_B = "src0", "src1"


@query(
    "stats_ks_source_drift",
    oracle=f"""
    WITH byv AS (
      SELECT n_chars,
             COUNT(*) FILTER (WHERE source = '{KS_SRC_A}')::BIGINT AS ca,
             COUNT(*) FILTER (WHERE source = '{KS_SRC_B}')::BIGINT AS cb
      FROM documents
      WHERE source IN ('{KS_SRC_A}', '{KS_SRC_B}')
      GROUP BY n_chars
    ),
    cum AS (
      SELECT n_chars,
             SUM(ca) OVER (ORDER BY n_chars) AS cum_ca,
             SUM(cb) OVER (ORDER BY n_chars) AS cum_cb,
             (SELECT SUM(ca) FROM byv) AS n_a,
             (SELECT SUM(cb) FROM byv) AS n_b
      FROM byv
    ),
    scored AS (
      SELECT n_chars, n_a, n_b,
             abs(CAST(cum_ca AS DOUBLE) / n_a
                 - CAST(cum_cb AS DOUBLE) / n_b) AS d
      FROM cum
    )
    SELECT n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
           CAST(CAST(d AS DECIMAL(18,6)) AS DOUBLE) AS ks_d,
           n_chars AS ks_at_chars
    FROM scored
    ORDER BY d DESC, n_chars ASC
    LIMIT 1
    """,
)
def stats_ks_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between two
    document sources' length distributions: D = max over observed
    values of |ECDF_a − ECDF_b|, reported with the value where the
    gap peaks (min such value on ties). The distribution-free drift
    test that complements the binned TVD screen
    (``textops.text_source_drift_tvd``) — KS needs no bin choice and
    is sensitive to location shifts TVD's coarse bins can hide.

    Exactness: ECDFs are ratios of exact integer counts; D is a max
    over identically computed doubles — bit-identical cross-engine,
    pinned DECIMAL(18,6).

    Plan: one scan → one groupBy(n_chars) shuffle, then the running
    counts go through the range-exchange prefix pattern
    (``_range_prefix``) — no single-partition window even though the
    distinct-value frame is small today; the argmax is a 1-row
    TakeOrdered."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin(KS_SRC_A, KS_SRC_B)
    )
    byv = d.groupBy("n_chars").agg(
        F.sum(F.when(F.col("source") == KS_SRC_A, 1).otherwise(0)).alias(
            "ca"
        ),
        F.sum(F.when(F.col("source") == KS_SRC_B, 1).otherwise(0)).alias(
            "cb"
        ),
    )
    cum = _range_prefix(byv, ["n_chars"], ["ca", "cb"])
    tot = cum.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    scored = cum.crossJoin(F.broadcast(tot)).withColumn(
        "d",
        F.abs(
            F.col("cum_ca").cast("double") / F.col("n_a")
            - F.col("cum_cb").cast("double") / F.col("n_b")
        ),
    )
    return (
        scored.orderBy(F.col("d").desc(), F.col("n_chars").asc())
        .limit(1)
        .select(
            "n_a",
            "n_b",
            _d6(F.col("d")).alias("ks_d"),
            F.col("n_chars").alias("ks_at_chars"),
        )
    )


# ---- tie-corrected Mann–Whitney U -------------------------------------


@query(
    "stats_mannwhitney_value",
    oracle="""
    WITH p AS (
      SELECT value,
             CASE WHEN isodow(CAST(ts AS TIMESTAMP)) <= 5
                  THEN 1 ELSE 0 END AS is_wd
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    byv AS (
      SELECT value,
             SUM(is_wd)::BIGINT AS na,
             SUM(1 - is_wd)::BIGINT AS nb
      FROM p GROUP BY value
    ),
    cum AS (
      SELECT value, na, nb,
             SUM(na + nb) OVER (ORDER BY value) AS cum_t
      FROM byv
    ),
    terms AS (
      SELECT na, nb,
             -- 2*avg_rank of this tie group, kept integral:
             -- ranks cum_before+1 .. cum_before+t average to
             -- cum_before + (t+1)/2, so twice that is
             -- 2*(cum_t - t) + t + 1
             na * (2 * (cum_t - (na + nb)) + (na + nb) + 1) AS r2a_term,
             (na + nb) AS t
      FROM cum
    ),
    mo AS (
      SELECT SUM(na)::BIGINT AS n_a,
             SUM(nb)::BIGINT AS n_b,
             SUM(r2a_term)::BIGINT AS r2a,
             SUM(t * t * t - t)::BIGINT AS tie3
      FROM terms
    )
    SELECT n_a AS n_weekday, n_b AS n_weekend,
           CAST((r2a - n_a * (n_a + 1)) AS DOUBLE) / 2 AS u_stat,
           CAST(CAST(
             (CAST((r2a - n_a * (n_a + 1)) AS DOUBLE) / 2
              - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2)
             / sqrt(
                 CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12
                 * (CAST(n_a + n_b + 1 AS DOUBLE)
                    - CAST(tie3 AS DOUBLE)
                      / (CAST(n_a + n_b AS DOUBLE)
                         * CAST(n_a + n_b - 1 AS DOUBLE))))
             AS DECIMAL(18,6)) AS DOUBLE) AS z
    FROM mo
    """,
)
def stats_mannwhitney_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Mann–Whitney U (rank-sum) test: do weekday and
    weekend purchases draw from the same value distribution? The
    non-parametric sibling of the Welch readout in
    ``events_ab_test_lift`` — rank-based, so a heavy revenue tail
    can't dominate the verdict.

    Exactness: the whole rank machinery stays INTEGRAL — ties get
    average ranks, and 2×avg_rank = 2·cum_before + t + 1 is an exact
    BIGINT, so the rank sum 2·R_a is summed as exact integers
    (order-insensitive) and halved once in IEEE. The tie-correction
    Σ(t³−t) is integral too. One fixed double chain → DECIMAL(18,6).

    Plan: one scan → groupBy(value) shuffle, running totals via the
    range-exchange prefix (distinct purchase values grow with the
    corpus — a global window here would be the scale bug), then a
    single-row moment aggregate."""
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    byv = (
        ev.withColumn(
            "is_wd", (F.weekday("ts") <= 4).cast("bigint")
        )
        .groupBy("value")
        .agg(
            F.sum("is_wd").alias("na"),
            F.sum(F.lit(1) - F.col("is_wd")).alias("nb"),
        )
    )
    cum = _range_prefix(
        byv.withColumn("t", F.col("na") + F.col("nb")), ["value"], ["t"]
    )
    terms = cum.select(
        "na",
        "nb",
        "t",
        (
            F.col("na")
            * (2 * (F.col("cum_t") - F.col("t")) + F.col("t") + 1)
        ).alias("r2a_term"),
    )
    mo = terms.agg(
        F.sum("na").alias("n_a"),
        F.sum("nb").alias("n_b"),
        F.sum("r2a_term").alias("r2a"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).alias("tie3"),
    )
    na_d = F.col("n_a").cast("double")
    nb_d = F.col("n_b").cast("double")
    n = F.col("n_a") + F.col("n_b")
    u = (F.col("r2a") - F.col("n_a") * (F.col("n_a") + 1)).cast(
        "double"
    ) / 2
    mu = na_d * nb_d / 2
    sigma = F.sqrt(
        na_d
        * nb_d
        / 12
        * (
            (n + 1).cast("double")
            - F.col("tie3").cast("double")
            / (n.cast("double") * (n - 1).cast("double"))
        )
    )
    return mo.select(
        F.col("n_a").alias("n_weekday"),
        F.col("n_b").alias("n_weekend"),
        u.alias("u_stat"),
        _d6((u - mu) / sigma).alias("z"),
    )


# ---- Benford first-digit screen ---------------------------------------

# One literal per digit, interpolated into BOTH dialects so the IEEE
# bits are identical by construction. Each arm casts the literal to
# DOUBLE explicitly: BOTH engines parse a bare decimal literal as
# DECIMAL (DuckDB at (18,17), Spark likewise), and DuckDB's
# decimal→decimal downscale TRUNCATES while Spark's rounds HALF_UP —
# the same dialect trap as the 1.0D-suffix rule, pinned here by the
# benford_share column.
_BENFORD_P = {d: repr(math.log10(1.0 + 1.0 / d)) for d in range(1, 10)}


def _benford_case(col: str) -> str:
    arms = " ".join(
        f"WHEN '{d}' THEN CAST({p} AS DOUBLE)"
        for d, p in _BENFORD_P.items()
    )
    return f"CASE {col} {arms} END"


@query(
    "orders_benford_screen",
    oracle=f"""
    WITH digits AS (
      SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                    AS VARCHAR), 1, 1) AS digit
      FROM orders
    ),
    counts AS (
      SELECT digit, COUNT(*)::BIGINT AS n_obs FROM digits GROUP BY digit
    ),
    tot AS (SELECT SUM(n_obs)::BIGINT AS n FROM counts)
    SELECT digit, n_obs,
           CAST(CAST(CAST(n_obs AS DOUBLE) / n AS DECIMAL(18,6))
                AS DOUBLE) AS obs_share,
           CAST(CAST({_benford_case('digit')} AS DECIMAL(18,6))
                AS DOUBLE) AS benford_share,
           CAST(CAST(
             (CAST(n_obs AS DOUBLE) - n * {_benford_case('digit')})
             * (CAST(n_obs AS DOUBLE) - n * {_benford_case('digit')})
             / (n * {_benford_case('digit')})
             AS DECIMAL(18,6)) AS DOUBLE) AS chi2_term
    FROM counts, tot
    ORDER BY digit
    """,
)
def orders_benford_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order totals: observed
    leading-digit shares vs log10(1+1/d), with per-digit chi-square
    contributions — the classic synthetic-/fabricated-data smell test
    a curation pipeline runs on numeric columns it ingests.

    Exactness: the digit comes from FLOOR → BIGINT → string (NOT a
    double→int cast, which truncates in Spark but rounds in DuckDB,
    and NOT log10 of the value, whose libm isn't cross-engine
    bit-stable); the Benford shares are shared decimal literals
    interpolated into both dialects, so every double is identical by
    construction.

    Plan: projection-pruned scan → 9-group partial agg; the total
    rides a 9-row broadcast. Nothing here grows with the corpus
    except the one scan."""
    o = load_table(spark, sf_dir, "orders").select(
        F.substring(
            F.expr("CAST(FLOOR(o_totalprice) AS BIGINT)").cast("string"),
            1,
            1,
        ).alias("digit")
    )
    counts = o.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    tot = counts.agg(F.sum("n_obs").alias("n"))
    p = F.expr(_benford_case("digit"))
    n_obs_d = F.col("n_obs").cast("double")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_obs",
            _d6(n_obs_d / F.col("n")).alias("obs_share"),
            _d6(p).alias("benford_share"),
            _d6(
                (n_obs_d - F.col("n") * p)
                * (n_obs_d - F.col("n") * p)
                / (F.col("n") * p)
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


# ---- Gini concentration coefficient -----------------------------------


@query(
    "customer_revenue_gini",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT rev,
             ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS rn
      FROM rev
    ),
    mo AS (
      SELECT COUNT(*)::BIGINT AS n,
             SUM(rev) AS t,
             SUM(CAST(rn * rev AS DECIMAL(38,6))) AS s
      FROM ranked
    )
    SELECT n AS n_customers,
           CAST(t AS DOUBLE) AS total_rev,
           CAST(CAST(
             2 * CAST(s AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE))
             - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE)
             AS DECIMAL(18,6)) AS DOUBLE) AS gini
    FROM mo
    """,
)
def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue concentration via the
    rank formula G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over ascending
    revenue — the one-number skew readout behind "do 1% of customers
    carry the book" (and, run on documents-per-domain, the curation
    question "is the corpus one crawl source in a trenchcoat").

    Exactness: per-customer revenue is an exact DECIMAL(18,2) sum;
    ranks are integers with a unique (rev, custkey) total order;
    Σ i·xᵢ accumulates in DECIMAL(38,6) — everything exact until one
    fixed double chain, pinned DECIMAL(18,6).

    Plan: groupBy(custkey) shuffle, then the global rank uses the
    range-exchange + partition-offset pattern (row_number within each
    range partition + collected P-row prefix offsets — same design as
    ``tpch_more._ntile4_distributed``), NOT a single-partition
    window; the moments are one partial agg."""
    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
    )
    part = persist_tracked(
        rev.repartitionByRange(
            PREFIX_PARTS, "rev", "o_custkey"
        ).withColumn("_pid", F.spark_partition_id())
    )
    cnt = {
        r["_pid"]: r["n"]
        for r in part.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offs, acc = [], 0
    for p in range(PREFIX_PARTS):
        offs.append(acc)
        acc += cnt.get(p, 0)
    wloc = Window.partitionBy("_pid").orderBy("rev", "o_custkey")
    rn = (
        F.array(*[F.lit(o) for o in offs])[F.col("_pid")]
        + F.row_number().over(wloc)
    )
    mo = part.withColumn("rn", rn).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").alias("t"),
        F.sum((F.col("rn") * F.col("rev")).cast("decimal(38,6)")).alias(
            "s"
        ),
    )
    n_d = F.col("n").cast("double")
    return mo.select(
        F.col("n").alias("n_customers"),
        F.col("t").cast("double").alias("total_rev"),
        _d6(
            2 * F.col("s").cast("double")
            / (n_d * F.col("t").cast("double"))
            - (F.col("n") + 1).cast("double") / n_d
        ).alias("gini"),
    )


# ---- CUSUM changepoint over the daily revenue series ------------------


@query(
    "events_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
               AS day,
             SUM(CAST(value AS DECIMAL(18,6))) AS rev
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
      GROUP BY 1
    ),
    cum AS (
      SELECT day,
             ROW_NUMBER() OVER (ORDER BY day) AS t,
             SUM(rev) OVER (ORDER BY day) AS cum_rev,
             (SELECT CAST(SUM(rev) AS DOUBLE) FROM daily) AS total,
             (SELECT COUNT(*)::BIGINT FROM daily) AS n_days
      FROM daily
    ),
    scored AS (
      SELECT day, n_days,
             abs(CAST(cum_rev AS DOUBLE) - t * (total / n_days)) AS s
      FROM cum
    )
    SELECT day AS changepoint_day,
           CAST(CAST(s AS DECIMAL(18,6)) AS DOUBLE) AS cusum_peak,
           n_days
    FROM scored
    ORDER BY s DESC, day ASC
    LIMIT 1
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the daily purchase-revenue
    series: sₜ = (cumulative revenue through day t) − t·mean, and the
    day where |sₜ| peaks is the maximum-likelihood single shift point
    for a mean change — the monitoring query behind "when did the
    metric move", complementing the pointwise MAD/z-score anomaly
    screens (``events_anomaly_mad``/``_zscore``).

    Exactness: daily revenue and its running total are exact DECIMAL
    sums; the mean and sₜ are one fixed double chain; argmax ties
    break to the earliest day.

    Plan: one scan → per-day partial agg; every window after that
    runs over the ~#days frame — tiny BY CONSTRUCTION (30 days here,
    a few thousand at any horizon), the documented exception to the
    no-global-window rule (precedent: ``events.py`` daily series)."""
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .groupBy(
            F.date_trunc("DAY", "ts").cast("date").alias("day")
        )
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("rev"))
    )
    wall = Window.orderBy("day")
    cum = daily.select(
        "day",
        F.row_number().over(wall).alias("t"),
        F.sum("rev")
        .over(wall.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_rev"),
    ).crossJoin(
        F.broadcast(
            daily.agg(
                F.sum("rev").cast("double").alias("total"),
                F.count(F.lit(1)).alias("n_days"),
            )
        )
    )
    scored = cum.withColumn(
        "s",
        F.abs(
            F.col("cum_rev").cast("double")
            - F.col("t") * (F.col("total") / F.col("n_days"))
        ),
    )
    return (
        scored.orderBy(F.col("s").desc(), F.col("day").asc())
        .limit(1)
        .select(
            F.col("day").alias("changepoint_day"),
            _d6(F.col("s")).alias("cusum_peak"),
            "n_days",
        )
    )


# ---- deterministic half-sample bootstrap CI ---------------------------

BOOT_REPS = 32


def _boot_oracle() -> str:
    from .textops import hash60_duck

    h = hash60_duck(
        "CAST(user_id AS VARCHAR) || '|' || CAST(b AS VARCHAR)"
    )
    return f"""
    WITH per_user AS (
      SELECT user_id, SUM(CAST(value AS DECIMAL(18,6))) AS rev
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
      GROUP BY user_id
    ),
    reps AS (
      SELECT u.user_id, u.rev, b.b
      FROM per_user u, (SELECT unnest(range({BOOT_REPS})) AS b) b
      WHERE {h} % 2 = 0
    ),
    rep_means AS (
      SELECT b,
             CAST(CAST(CAST(SUM(rev) AS DOUBLE) / COUNT(*)
                  AS DECIMAL(18,6)) AS DOUBLE) AS mb
      FROM reps GROUP BY b
    ),
    mo AS (
      SELECT COUNT(*)::BIGINT AS n_reps,
             CAST(SUM(CAST(mb AS DECIMAL(18,6))) AS DOUBLE) AS sm,
             CAST(SUM(CAST(mb * mb AS DECIMAL(38,6))) AS DOUBLE) AS sxx
      FROM rep_means
    )
    SELECT n_reps,
           CAST(CAST(sm / n_reps AS DECIMAL(18,6)) AS DOUBLE) AS mean_rev,
           CAST(CAST(
             sqrt((sxx - n_reps * ((sm / n_reps) * (sm / n_reps)))
                  / (n_reps - 1) / 2)
             AS DECIMAL(18,6)) AS DOUBLE) AS se_est,
           CAST(CAST(
             sm / n_reps
             - 1.96 * sqrt((sxx - n_reps * ((sm / n_reps) * (sm / n_reps)))
                           / (n_reps - 1) / 2)
             AS DECIMAL(18,6)) AS DOUBLE) AS ci_lo,
           CAST(CAST(
             sm / n_reps
             + 1.96 * sqrt((sxx - n_reps * ((sm / n_reps) * (sm / n_reps)))
                           / (n_reps - 1) / 2)
             AS DECIMAL(18,6)) AS DOUBLE) AS ci_hi
    FROM mo
    """


@query("stats_bootstrap_ci_mean", oracle=_boot_oracle())
def stats_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confidence interval for mean per-user purchase revenue via a
    DETERMINISTIC half-sample bootstrap: replicate b keeps user u iff
    a 60-bit content hash of (u, b) is even — the house reproducible-
    assignment pattern (``events_ab_test_lift``), so re-running the
    analysis resamples nobody. Each replicate mean uses ~n/2 users,
    so Var(replicate mean) ≈ 2·Var(full mean) and the full-sample SE
    is sd_replicates/√2 — that √2 is in the fixed expression chain.

    Exactness: per-user and per-replicate sums are DECIMAL-exact;
    replicate means are pinned DECIMAL(18,6) BEFORE the cross-replicate
    moments (again decimal), so the 32-row variance is
    order-insensitive; one double chain to the CI.

    Plan: one scan → per-user agg, a ×32 replicate explode that
    FILTERS before shuffling (each replicate keeps half its rows),
    one groupBy(b) into 32 groups, then a 32-row moment agg. At 100 TB
    the explode is the cost dial — B is config, and the replicate
    filter keeps the shuffled volume at B/2 × the per-user frame, not
    B×."""
    from .textops import hash60_spark

    h = hash60_spark(
        "CONCAT(CAST(user_id AS STRING), '|', CAST(b AS STRING))"
    )
    per_user = (
        load_table(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .groupBy("user_id")
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("rev"))
    )
    reps = (
        per_user.withColumn(
            "b", F.explode(F.sequence(F.lit(0), F.lit(BOOT_REPS - 1)))
        )
        .filter(F.expr(f"{h} % 2 = 0"))
    )
    rep_means = reps.groupBy("b").agg(
        _d6(
            F.sum("rev").cast("double") / F.count(F.lit(1))
        ).alias("mb")
    )
    mo = rep_means.agg(
        F.count(F.lit(1)).alias("n_reps"),
        F.sum(F.col("mb").cast("decimal(18,6)"))
        .cast("double")
        .alias("sm"),
        F.sum((F.col("mb") * F.col("mb")).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxx"),
    )
    m = F.col("sm") / F.col("n_reps")
    se = F.sqrt(
        (F.col("sxx") - F.col("n_reps") * (m * m))
        / (F.col("n_reps") - 1)
        / 2
    )
    return mo.select(
        "n_reps",
        _d6(m).alias("mean_rev"),
        _d6(se).alias("se_est"),
        _d6(m - 1.96 * se).alias("ci_lo"),
        _d6(m + 1.96 * se).alias("ci_hi"),
    )


# ---- grouped weighted median ------------------------------------------


@query(
    "lineitem_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag AS returnflag, l_extendedprice AS p,
             SUM(CAST(l_quantity AS BIGINT))::BIGINT AS wt
      FROM lineitem GROUP BY 1, 2
    ),
    c AS (
      SELECT returnflag, p, wt,
             SUM(wt) OVER (PARTITION BY returnflag ORDER BY p) AS cw,
             SUM(wt) OVER (PARTITION BY returnflag) AS tw
      FROM w
    )
    SELECT returnflag,
           MIN(p) AS weighted_median_price,
           MIN(tw)::BIGINT AS total_qty
    FROM c
    WHERE 2 * cw >= tw
    GROUP BY returnflag
    ORDER BY returnflag
    """,
)
def lineitem_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median line price per return flag: the
    smallest price whose inclusive cumulative weight reaches half the
    group's total — the exact order statistic (no approx-percentile
    sketch), grouped.

    Exactness: weights are integral (l_quantity carries integer
    values; the BIGINT cast is exact on both engines for integral
    doubles), the half-total test is written integrally (2·cw ≥ tw),
    and the median is a MIN over raw parquet doubles — nothing is
    computed in float at all.

    Plan: groupBy(flag, price) first (shrinks to distinct prices with
    partial aggregation before the shuffle), then the grouped running
    weight uses ``_range_prefix`` with group_cols — a per-group
    range-exchange prefix, NOT a ``PARTITION BY returnflag`` window:
    with 3 flags over corpus-scale lineitem, a per-flag window
    partition would funnel a third of the table through one task
    (exactly the ``lineitem_abc_classification`` scale bug round 7
    flagged and round 8 fixed)."""
    w = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_extendedprice").alias("p"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("wt"))
    )
    cum = _range_prefix(
        w, ["p"], ["wt"], group_cols=["returnflag"], persist_input=True
    )
    tot = w.groupBy("returnflag").agg(F.sum("wt").alias("tw"))
    return (
        cum.join(F.broadcast(tot), "returnflag")
        .filter(2 * F.col("cum_wt") >= F.col("tw"))
        .groupBy("returnflag")
        .agg(
            F.min("p").alias("weighted_median_price"),
            F.min("tw").alias("total_qty"),
        )
        .orderBy("returnflag")
    )


# ---- recursive-CTE EWMA over the daily series --------------------------

EWMA_ALPHA = "CAST(0.3 AS DOUBLE)"  # shared literal, both dialects



def _daily_rev_seq_sql(table: str) -> str:
    """The corpus-side half shared by the three revenue recursions
    (EWMA / Holt / Holt-Winters): daily purchase revenue with a
    sequence number — split out so the Spark side can localCheckpoint
    its ~#days-row result once. A recursive CTE re-plans every frame
    its step references, so an inline daily aggregate re-runs the
    corpus scan PER STEP (measured 4x wall on Croston at sf0.1); the
    checkpointed leaf makes each step a join against ≤#days
    materialized rows. The oracle keeps the aggregate inline — same
    text, same math."""
    return f"""
    SELECT day, rev, ROW_NUMBER() OVER (ORDER BY day) AS t
    FROM (
      SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
               AS day,
             SUM(CAST(value AS DECIMAL(18,6))) AS rev
      FROM {table}
      WHERE event_type = 'purchase' AND value IS NOT NULL
      GROUP BY 1
    ) daily
    """


def _ewma_sql(
    table: str = "events",
    limit_clause: str = "",
    seq_select: str | None = None,
) -> str:
    """The IDENTICAL recursive query text for both dialects (up to
    the source-view name, parameterized like the other dual-dialect
    builders so the Spark side can use an op-scoped view) — the
    point of the operator: Spark 4's WITH RECURSIVE runs a user's
    DuckDB/Postgres recursion verbatim. s₁ = x₁;
    sₜ = α·xₜ + (1−α)·sₜ₋₁ — a linear recurrence no plain window
    function expresses exactly."""
    a = EWMA_ALPHA
    seq = seq_select or _daily_rev_seq_sql(table)
    return f"""
    WITH RECURSIVE seq AS (
      {seq}
    ),
    ew AS (
      SELECT t, day, rev, CAST(rev AS DOUBLE) AS s
      FROM seq WHERE t = 1
      UNION ALL
      SELECT d.t, d.day, d.rev,
             {a} * CAST(d.rev AS DOUBLE) + (CAST(1 AS DOUBLE) - {a}) * e.s
      FROM seq d JOIN ew e ON d.t = e.t + 1
    )
    SELECT day,
           CAST(rev AS DOUBLE) AS daily_rev,
           CAST(CAST(s AS DECIMAL(18,6)) AS DOUBLE) AS ewma_rev
    FROM ew
    ORDER BY day
    {limit_clause}
    """


@query("events_ewma_recursive", oracle=_ewma_sql())
def events_ewma_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily purchase revenue
    via a RECURSIVE CTE — the sequential recurrence sₜ = α·xₜ +
    (1−α)·sₜ₋₁ that windowed SQL cannot express exactly (the closed
    form Σα(1−α)ᵏxₜ₋ₖ underflows/explodes as a window sum), run as
    the IDENTICAL query text on Spark 4 and DuckDB.

    Exactness: daily revenue is DECIMAL-exact; the recurrence applies
    the same multiply-add chain in the same t-order on both engines
    (recursion forces sequential evaluation), so every sₜ is
    bit-identical; α is a shared literal cast to DOUBLE (bare decimal
    literals parse as DECIMAL and downscale differently — the
    Benford lesson).

    Scale honesty: recursion depth = series length, and each step is
    a join against the ~#days frame — tiny BY CONSTRUCTION here
    (30 days; a few thousand at any horizon — within Spark's
    cteRecursionLevelLimit=100 only for short series, so raise the
    limit or fall back to the segmented-scan/applyInPandas form for
    multi-year series). The corpus-sized work is the one scan into
    the daily aggregate; the recursion runs on the aggregate."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "ewma_events"
    )
    seq = spark.sql(_daily_rev_seq_sql("ewma_events")).localCheckpoint()
    seq.createOrReplaceTempView("ewma_seq")
    return spark.sql(
        _ewma_sql(seq_select="SELECT day, rev, t FROM ewma_seq")
    )


# ---- Kaplan–Meier churn survival curve ---------------------------------

KM_SILENCE_DAYS = 7  # churn = silent for this long before the horizon


@query(
    "users_kaplan_meier",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST(min(CAST(ts AS TIMESTAMP)) AS DATE) AS f,
             max(CAST(ts AS TIMESTAMP)) AS l
      FROM events GROUP BY user_id
    ),
    horizon AS (SELECT max(l) AS end_ts FROM u),
    obs AS (
      SELECT datediff('day', f, CAST(l AS DATE)) AS dur,
             CASE WHEN l < end_ts - INTERVAL {KM_SILENCE_DAYS} DAY
                  THEN 1 ELSE 0 END AS churned
      FROM u, horizon
    ),
    byd AS (
      SELECT dur, SUM(churned)::BIGINT AS d, COUNT(*)::BIGINT AS n
      FROM obs GROUP BY dur
    ),
    cum AS (
      SELECT dur, d, n,
             SUM(n) OVER (ORDER BY dur) AS cumn,
             (SELECT SUM(n) FROM byd) AS t
      FROM byd
    ),
    r AS (
      SELECT dur, d, t - (cumn - n) AS at_risk FROM cum
      WHERE d > 0 AND t - (cumn - n) > d
    ),
    terms AS (
      SELECT dur, d, at_risk,
             CAST(ln(CAST(at_risk - d AS DOUBLE) / at_risk)
                  AS DECIMAL(18,9)) AS lt
      FROM r
    ),
    km AS (
      SELECT dur, d, at_risk,
             SUM(lt) OVER (ORDER BY dur) AS cl
      FROM terms
    )
    SELECT dur AS duration_days, at_risk::BIGINT AS n_at_risk,
           d AS n_churned,
           CAST(CAST(exp(CAST(cl AS DOUBLE)) AS DECIMAL(18,6))
                AS DOUBLE) AS survival
    FROM km ORDER BY duration_days
    """,
)
def users_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for user lifetime: duration = days
    between a user's first and last event; a user CHURNS if silent for
    ≥ KM_SILENCE_DAYS before the data horizon, else is right-censored
    (still active when observation ended) — the estimator that makes
    retention analysis honest about censoring, where the naive
    ``events_daily_retention`` readout treats still-active users as
    lost. S(t) = Π over event-times ≤ t of (1 − dᵢ/nᵢ).

    Exactness: risk sets and death counts are exact integers; each
    factor enters as ln((nᵢ−dᵢ)/nᵢ) — ln of a correctly-rounded ratio
    of exact ints, pinned DECIMAL(18,9) per term (the ln-of-int
    precedent from ``text_token_entropy``), summed exactly, exp'd
    once. Degenerate rows where the whole risk set dies (S → 0, ln
    −∞: DuckDB yields -inf where Spark yields NULL) are excluded by
    the same at_risk > d guard in both dialects.

    Plan: one scan → per-user agg; everything after runs over the
    ~#distinct-durations frame — tiny BY CONSTRUCTION (≤ horizon
    days; the CUSUM-series exception), so the global windows here are
    not a scale hazard. The horizon is a 1-row broadcast."""
    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min("ts").cast("date").alias("f"),
            F.max("ts").alias("l"),
        )
    )
    horizon = u.agg(F.max("l").alias("end_ts"))
    obs = u.crossJoin(F.broadcast(horizon)).select(
        F.datediff(F.col("l").cast("date"), F.col("f")).alias("dur"),
        F.when(
            F.col("l")
            < F.col("end_ts") - F.expr(f"INTERVAL {KM_SILENCE_DAYS} DAY"),
            1,
        )
        .otherwise(0)
        .alias("churned"),
    )
    byd = obs.groupBy("dur").agg(
        F.sum("churned").alias("d"), F.count(F.lit(1)).alias("n")
    )
    wall = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = byd.withColumn("cumn", F.sum("n").over(wall)).crossJoin(
        F.broadcast(byd.agg(F.sum("n").alias("t")))
    )
    r = cum.select(
        "dur",
        "d",
        (F.col("t") - (F.col("cumn") - F.col("n"))).alias("at_risk"),
    ).filter((F.col("d") > 0) & (F.col("at_risk") > F.col("d")))
    terms = r.withColumn(
        "lt",
        F.log(
            (F.col("at_risk") - F.col("d")).cast("double")
            / F.col("at_risk")
        ).cast("decimal(18,9)"),
    )
    km = terms.withColumn(
        "cl",
        F.sum("lt").over(
            Window.orderBy("dur").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    return km.select(
        F.col("dur").alias("duration_days"),
        F.col("at_risk").alias("n_at_risk"),
        F.col("d").alias("n_churned"),
        _d6(F.exp(F.col("cl").cast("double"))).alias("survival"),
    ).orderBy("duration_days")


# ---- trimmed and winsorized means --------------------------------------

TRIM_PCT_TENTHS = 1  # drop/clamp floor(n/10) values from each tail


@query(
    "stats_trimmed_mean",
    oracle="""
    WITH p AS (
      SELECT event_id, value FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    ranked AS (
      SELECT value,
             ROW_NUMBER() OVER (ORDER BY value, event_id) AS rn,
             (SELECT COUNT(*)::BIGINT FROM p) AS n
      FROM p
    ),
    kk AS (SELECT n AS nn, n // 10 AS k FROM ranked LIMIT 1),
    mo AS (
      SELECT MIN(nn) AS n, MIN(k) AS k,
             SUM(CASE WHEN rn > k AND rn <= nn - k
                      THEN CAST(value AS DECIMAL(18,6)) END) AS tsum,
             MIN(CASE WHEN rn = k + 1 THEN value END) AS v_lo,
             MIN(CASE WHEN rn = nn - k THEN value END) AS v_hi
      FROM ranked, kk
    )
    SELECT n AS n_values, k AS k_trimmed,
           CAST(CAST(CAST(tsum AS DOUBLE) / (n - 2 * k)
                AS DECIMAL(18,6)) AS DOUBLE) AS trimmed_mean,
           CAST(CAST(
             (CAST(tsum AS DOUBLE) + k * v_lo + k * v_hi) / n
             AS DECIMAL(18,6)) AS DOUBLE) AS winsorized_mean
    FROM mo
    """,
)
def stats_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% two-sided trimmed AND winsorized means of purchase values —
    the robust-location pair (drop the tails / clamp the tails to the
    cut points) that complements the median/MAD fences
    (``events_anomaly_mad``) when the readout must stay a mean.

    Exactness: the rank order (value, event_id) is unique; the kept
    mass sums in DECIMAL; k = n//10 is exact integer division; the
    cut-point values v_lo/v_hi are raw parquet doubles picked by
    rank-equality MIN; one fixed double chain to both means.

    Plan: the global rank over raw purchases uses the range-exchange
    + partition-offset pattern (plan-tested: no single-partition
    window); n and k fall out of the same bounded offsets collect, so
    they inject as literals — the moment aggregate is then ONE pass
    with conditional sums, no self-join against quantile scalars."""
    p = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select("event_id", "value")
    part = persist_tracked(
        p.repartitionByRange(PREFIX_PARTS, "value", "event_id").withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    cnt = {
        r["_pid"]: r["n"]
        for r in part.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offs, acc = [], 0
    for q in range(PREFIX_PARTS):
        offs.append(acc)
        acc += cnt.get(q, 0)
    n, k = acc, acc // 10
    wloc = Window.partitionBy("_pid").orderBy("value", "event_id")
    rn = (
        F.array(*[F.lit(o) for o in offs])[F.col("_pid")]
        + F.row_number().over(wloc)
    )
    mo = part.withColumn("rn", rn).agg(
        F.sum(
            F.when(
                (F.col("rn") > k) & (F.col("rn") <= n - k),
                F.col("value").cast("decimal(18,6)"),
            )
        ).alias("tsum"),
        F.min(F.when(F.col("rn") == k + 1, F.col("value"))).alias("v_lo"),
        F.min(F.when(F.col("rn") == n - k, F.col("value"))).alias("v_hi"),
    )
    tsum_d = F.col("tsum").cast("double")
    return mo.select(
        F.lit(n).alias("n_values"),
        F.lit(k).alias("k_trimmed"),
        _d6(tsum_d / F.lit(n - 2 * k)).alias("trimmed_mean"),
        _d6(
            (tsum_d + F.lit(k) * F.col("v_lo") + F.lit(k) * F.col("v_hi"))
            / F.lit(n)
        ).alias("winsorized_mean"),
    )


# ---- Theil–Sen robust trend over the daily series ----------------------


@query(
    "stats_theil_sen_trend",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
               AS day,
             SUM(CAST(value AS DECIMAL(18,6))) AS rev
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
      GROUP BY 1
    ),
    seq AS (
      SELECT ROW_NUMBER() OVER (ORDER BY day) AS t,
             CAST(rev AS DOUBLE) AS y
      FROM daily
    ),
    slopes AS (
      SELECT (b.y - a.y) / (b.t - a.t) AS s
      FROM seq a JOIN seq b ON b.t > a.t
    ),
    ranked AS (
      SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS rn,
             (SELECT COUNT(*)::BIGINT FROM slopes) AS np
      FROM slopes
    ),
    med AS (
      SELECT MIN(np) AS n_pairs,
             MIN(CASE WHEN rn = (np + 1) // 2 THEN s END) AS m1,
             MIN(CASE WHEN rn = (np + 2) // 2 THEN s END) AS m2
      FROM ranked
    )
    SELECT (SELECT COUNT(*)::BIGINT FROM daily) AS n_days,
           n_pairs,
           CAST(CAST((m1 + m2) / 2 AS DECIMAL(18,6)) AS DOUBLE)
             AS slope_per_day
    FROM med
    """,
)
def stats_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of daily purchase revenue: the median of
    all pairwise slopes — 29.3% breakdown point where the OLS twin
    (``lineitem_ols_price_quantity``) folds to a single outlier day.
    The monitoring sibling of the CUSUM changepoint: CUSUM asks WHEN
    the series shifted, this asks how fast it drifts.

    Exactness: day indexes are integers and daily revenue is
    DECIMAL-exact, so every pairwise slope is one identical IEEE
    division; the median is an exact order statistic (lower/upper
    middle averaged — two identical doubles both sides), pinned
    DECIMAL(18,6).

    Plan: corpus-sized work is the one scan into the daily aggregate;
    the O(d²) pair join and its rank run over the ~#days frame —
    tiny BY CONSTRUCTION (30 days → 435 pairs; even a 3-year horizon
    is ~600k pairs in one task) — the documented small-series
    exception, same as CUSUM/EWMA."""
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .groupBy(F.date_trunc("DAY", "ts").cast("date").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("rev"))
    )
    seq = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("t"),
        F.col("rev").cast("double").alias("y"),
    )
    a = seq.select(F.col("t").alias("ta"), F.col("y").alias("ya"))
    b = seq.select(F.col("t").alias("tb"), F.col("y").alias("yb"))
    slopes = (
        a.join(b, F.col("tb") > F.col("ta"))
        .select(
            ((F.col("yb") - F.col("ya")) / (F.col("tb") - F.col("ta"))).alias(
                "s"
            )
        )
    )
    ranked = slopes.select(
        "s", F.row_number().over(Window.orderBy("s")).alias("rn")
    ).crossJoin(F.broadcast(slopes.agg(F.count(F.lit(1)).alias("np"))))
    med = ranked.agg(
        F.min("np").alias("n_pairs"),
        F.min(
            F.when(F.col("rn") == F.floor((F.col("np") + 1) / 2), F.col("s"))
        ).alias("m1"),
        F.min(
            F.when(F.col("rn") == F.floor((F.col("np") + 2) / 2), F.col("s"))
        ).alias("m2"),
    )
    return med.crossJoin(
        F.broadcast(daily.agg(F.count(F.lit(1)).alias("n_days")))
    ).select(
        "n_days",
        "n_pairs",
        _d6((F.col("m1") + F.col("m2")) / 2).alias("slope_per_day"),
    )


# ---- 2D Pareto skyline --------------------------------------------------

SKYLINE_SEGMENT = "AUTOMOBILE"


@query(
    "customer_pareto_skyline",
    oracle=f"""
    WITH pts AS (
      SELECT o.o_custkey,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev,
             max(CAST(o.o_orderdate AS DATE)) AS d
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_mktsegment = '{SKYLINE_SEGMENT}'
      GROUP BY 1
    )
    SELECT p.o_custkey AS c_custkey,
           CAST(p.rev AS DOUBLE) AS revenue,
           p.d AS last_order_date
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.rev >= p.rev AND q.d >= p.d
        AND (q.rev > p.rev OR q.d > p.d)
    )
    ORDER BY revenue DESC, c_custkey
    """,
)
def customer_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2D Pareto skyline (maximal-vector / dominance query): customers
    in one segment not dominated on (total revenue, order recency) —
    q dominates p iff q is ≥ on both axes and > on at least one. The
    classic multi-objective shortlist operator ("highest-value AND
    freshest") relational engines ship as SKYLINE OF; Spark has no
    native form.

    Exactness: revenue is an exact DECIMAL sum and recency a DATE —
    dominance is pure integer/decimal comparison, no float anywhere;
    equal points do not dominate each other (both survive), matching
    the oracle's NOT EXISTS literally.

    Plan — the scale story is why this ISN'T the oracle's O(n²)
    NOT EXISTS: for 2D max-max dominance, p is dominated iff
    (a) some strictly-higher-revenue point has recency ≥ p's, or
    (b) a same-revenue point has recency > p's. (a) is an EXCLUSIVE
    running max of recency over revenue descending — computed with
    the range-exchange pattern (per-partition exclusive window max +
    suffix-max partition offsets from a P-row collect); (b) is the
    per-revenue max from the same distinct-revenue aggregate. One
    groupBy, one range exchange, zero self-joins — O(n log n) against
    the oracle's quadratic."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == SKYLINE_SEGMENT
    )
    pts = (
        o.join(F.broadcast(c.select("c_custkey")),
               o["o_custkey"] == c["c_custkey"])
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
            F.max(F.col("o_orderdate").cast("date")).alias("d"),
        )
    )
    byrev = pts.groupBy("rev").agg(F.max("d").alias("ymax"))
    part = persist_tracked(
        byrev.repartitionByRange(PREFIX_PARTS, "rev").withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    pmax = {
        r["_pid"]: r["m"]
        for r in part.groupBy("_pid").agg(F.max("ymax").alias("m")).collect()
    }
    # suffix max: best recency among partitions holding HIGHER revenue
    suffix, best = [], None
    for p in range(PREFIX_PARTS - 1, -1, -1):
        suffix.append(best)
        if p in pmax and (best is None or pmax[p] > best):
            best = pmax[p]
    suffix.reverse()  # suffix[p] = max ymax over pids > p (None at top)
    sentinel = "0001-01-01"
    off = F.array(
        *[
            F.lit(str(s) if s is not None else sentinel).cast("date")
            for s in suffix
        ]
    )[F.col("_pid")]
    wdesc = (
        Window.partitionBy("_pid")
        .orderBy(F.col("rev").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    best_above = F.greatest(
        F.coalesce(F.max("ymax").over(wdesc), F.lit(sentinel).cast("date")),
        off,
    )
    dom = part.select(
        "rev", "ymax", best_above.alias("best_above")
    )
    sky = (
        pts.join(dom, "rev")
        .filter(
            ~(
                (F.col("best_above") >= F.col("d"))
                | (F.col("ymax") > F.col("d"))
            )
        )
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("rev").cast("double").alias("revenue"),
            F.col("d").alias("last_order_date"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
    )
    return sky


# ---- classifier evaluation: exact AUC + calibration table --------------
#
# Detector under evaluation: the en-marker-ratio score behind
# text_language_id, judged against the labeled lang column — the
# engine-side eval half of a train/score/eval curation loop (features:
# events_training_features_pit; scoring: text_quality_logreg_score;
# eval: here).


def _en_score_spark() -> str:
    from .textops import TOKENS_SPARK, _marker_count

    return (
        f"CASE WHEN size({TOKENS_SPARK}) > 0 THEN "
        f"CAST({_marker_count(TOKENS_SPARK, 'en', 'spark')} AS DOUBLE)"
        f" / size({TOKENS_SPARK}) ELSE CAST(0 AS DOUBLE) END"
    )


def _en_score_duck() -> str:
    from .textops import TOKENS_DUCK, _marker_count

    return (
        f"CASE WHEN len({TOKENS_DUCK}) > 0 THEN "
        f"CAST({_marker_count(TOKENS_DUCK, 'en', 'duck')} AS DOUBLE)"
        f" / len({TOKENS_DUCK}) ELSE CAST(0 AS DOUBLE) END"
    )


def _auc_oracle() -> str:
    return f"""
    WITH scored AS (
      SELECT {_en_score_duck()} AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    byv AS (
      SELECT s, SUM(y)::BIGINT AS na, SUM(1 - y)::BIGINT AS nb
      FROM scored GROUP BY s
    ),
    cum AS (
      SELECT s, na, nb, SUM(na + nb) OVER (ORDER BY s) AS cum_t
      FROM byv
    ),
    mo AS (
      SELECT SUM(na)::BIGINT AS n_pos, SUM(nb)::BIGINT AS n_neg,
             SUM(na * (2 * (cum_t - (na + nb)) + (na + nb) + 1))::BIGINT
               AS r2a
      FROM cum
    )
    SELECT n_pos, n_neg,
           CAST(CAST(
             (CAST((r2a - n_pos * (n_pos + 1)) AS DOUBLE) / 2)
             / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
             AS DECIMAL(18,6)) AS DOUBLE) AS auc
    FROM mo
    """


@query("eval_auc_language_detector", oracle=_auc_oracle())
def eval_auc_language_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of the en-marker-ratio detector against the
    labeled ``lang`` column — AUC computed as the tie-corrected
    rank-sum statistic (AUC = U/(n₊·n₋), the Mann–Whitney identity),
    NOT a thresholded-curve trapezoid: exact, one pass, no threshold
    grid. The model-evaluation face of the curation loop; on this
    word-salad corpus the discrimination is near chance, which is
    exactly what the metric should report.

    Exactness: the score is an exact rational (marker count / token
    count, one IEEE division), tie groups get integral 2×avg-ranks
    (the ``stats_mannwhitney_value`` machinery), so AUC is a ratio of
    exact integers halved once.

    Plan: tokenize scan → groupBy(score) shuffle → range-exchange
    prefix for the rank sums → single-row moment."""
    d = load_table(spark, sf_dir, "documents").selectExpr(
        f"{_en_score_spark()} AS s",
        "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y",
    )
    byv = d.groupBy("s").agg(
        F.sum("y").alias("na"),
        F.sum(F.lit(1) - F.col("y")).alias("nb"),
    )
    cum = _range_prefix(
        byv.withColumn("t", F.col("na") + F.col("nb")), ["s"], ["t"]
    )
    mo = cum.agg(
        F.sum("na").alias("n_pos"),
        F.sum("nb").alias("n_neg"),
        F.sum(
            F.col("na")
            * (2 * (F.col("cum_t") - F.col("t")) + F.col("t") + 1)
        ).alias("r2a"),
    )
    u = (
        F.col("r2a") - F.col("n_pos") * (F.col("n_pos") + 1)
    ).cast("double") / 2
    return mo.select(
        "n_pos",
        "n_neg",
        _d6(
            u / (F.col("n_pos").cast("double") * F.col("n_neg").cast("double"))
        ).alias("auc"),
    )


def _calib_oracle() -> str:
    return f"""
    WITH scored AS (
      SELECT doc_id, {_en_score_duck()} AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    ranked AS (
      SELECT s, y,
             ROW_NUMBER() OVER (ORDER BY s, doc_id) AS rn,
             (SELECT COUNT(*)::BIGINT FROM scored) AS n
      FROM scored
    ),
    binned AS (
      SELECT CAST(floor(((rn - 1) * 10) / n) AS BIGINT) + 1 AS bin,
             s, y
      FROM ranked
    )
    SELECT bin,
           COUNT(*)::BIGINT AS n_docs,
           CAST(CAST(CAST(SUM(y) AS DOUBLE) / COUNT(*)
                AS DECIMAL(18,6)) AS DOUBLE) AS pos_rate,
           CAST(CAST(CAST(SUM(CAST(s AS DECIMAL(18,9))) AS DOUBLE)
                / COUNT(*) AS DECIMAL(18,6)) AS DOUBLE) AS mean_score
    FROM binned
    GROUP BY bin ORDER BY bin
    """


@query("eval_calibration_bins", oracle=_calib_oracle())
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table for the same detector: rank-decile score bins
    vs empirical positive rate — the calibration readout (does score
    0.8 mean 80%?) that AUC alone can't answer. Equal-count bins via
    the positional rule bin = ⌊(rank−1)·10/n⌋+1 over a unique
    (score, doc_id) order.

    Exactness: ranks ride the range-exchange offset pattern; the bin
    formula's float division is exact-by-gap (the quotient is a
    rational with denominator n — at least 1/n from any non-exact
    integer, far beyond one ulp); per-bin positive rates are exact
    count ratios and mean scores sum DECIMAL(18,9)-pinned values.

    Plan: tokenize scan → range exchange for ranks → 10-group agg."""
    d = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        f"{_en_score_spark()} AS s",
        "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y",
    )
    part = persist_tracked(
        d.repartitionByRange(PREFIX_PARTS, "s", "doc_id").withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    cnt = {
        r["_pid"]: r["n"]
        for r in part.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offs, acc = [], 0
    for q in range(PREFIX_PARTS):
        offs.append(acc)
        acc += cnt.get(q, 0)
    n = acc
    rn = (
        F.array(*[F.lit(o) for o in offs])[F.col("_pid")]
        + F.row_number().over(
            Window.partitionBy("_pid").orderBy("s", "doc_id")
        )
    )
    binned = part.withColumn(
        "bin",
        (F.floor(((rn - 1) * 10) / F.lit(n)) + 1).cast("bigint"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            _d6(
                F.sum("y").cast("double") / F.count(F.lit(1))
            ).alias("pos_rate"),
            _d6(
                F.sum(F.col("s").cast("decimal(18,9)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_score"),
        )
        .orderBy("bin")
    )


def _brier_sql(table: str, score: str, bigint: str) -> str:
    """Shared Murphy-decomposition text. ``score`` is the dialect's
    en-marker-ratio expression; bins are fixed-width deciles of the
    score (LEAST(floor(s·10), 9)) so bin membership is pure integer
    arithmetic over identical doubles."""
    return f"""
    WITH scored AS (
      SELECT {score} AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM {table}
    ),
    base AS (
      SELECT CAST(COUNT(*) AS {bigint}) AS n,
             CAST(SUM(y) AS {bigint}) AS pos,
             SUM(CAST((s - y) * (s - y) AS DECIMAL(18,12))) AS bs_sum
      FROM scored
    ),
    bins AS (
      SELECT LEAST(CAST(FLOOR(s * 10) AS INT), 9) AS bin,
             CAST(COUNT(*) AS {bigint}) AS nk,
             CAST(SUM(y) AS {bigint}) AS posk,
             SUM(CAST(s AS DECIMAL(18,9))) AS ssum
      FROM scored GROUP BY 1
    ),
    terms AS (
      SELECT b.bin, b.nk,
             CAST(b.posk AS DOUBLE) / b.nk AS ybar_k,
             CAST(CAST(CAST(b.ssum AS DOUBLE) / b.nk AS DECIMAL(18,9))
                  AS DOUBLE) AS pbar_k,
             CAST(base.pos AS DOUBLE) / base.n AS ybar
      FROM bins b CROSS JOIN base
    ),
    decomp AS (
      SELECT SUM(CAST(nk * (pbar_k - ybar_k) * (pbar_k - ybar_k)
                      AS DECIMAL(28,9))) AS rel_sum,
             SUM(CAST(nk * (ybar_k - ybar) * (ybar_k - ybar)
                      AS DECIMAL(28,9))) AS res_sum
      FROM terms
    )
    SELECT base.n AS n_docs,
           CAST(CAST(CAST(base.pos AS DOUBLE) / base.n
                AS DECIMAL(18,9)) AS DOUBLE) AS base_rate,
           CAST(CAST(CAST(base.bs_sum AS DOUBLE) / base.n
                AS DECIMAL(18,9)) AS DOUBLE) AS brier_score,
           CAST(CAST(CAST(decomp.rel_sum AS DOUBLE) / base.n
                AS DECIMAL(18,9)) AS DOUBLE) AS reliability,
           CAST(CAST(CAST(decomp.res_sum AS DOUBLE) / base.n
                AS DECIMAL(18,9)) AS DOUBLE) AS resolution,
           CAST(CAST(
             (CAST(base.pos AS DOUBLE) / base.n)
             * (1 - CAST(base.pos AS DOUBLE) / base.n)
             AS DECIMAL(18,9)) AS DOUBLE) AS uncertainty,
           CAST(CAST(
             CAST(base.bs_sum AS DOUBLE) / base.n
             - ((CAST(base.pos AS DOUBLE) / base.n)
                * (1 - CAST(base.pos AS DOUBLE) / base.n)
                - CAST(decomp.res_sum AS DOUBLE) / base.n
                + CAST(decomp.rel_sum AS DOUBLE) / base.n)
             AS DECIMAL(18,9)) AS DOUBLE) AS decomposition_gap
    FROM base CROSS JOIN decomp
    """


def _brier_oracle() -> str:
    return _brier_sql("documents", _en_score_duck(), "BIGINT")


@query("eval_brier_decomposition", oracle=_brier_oracle())
def eval_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the detector's Brier score — the third
    face of the evaluation triad: AUC ranks
    (``eval_auc_language_detector``), the reliability TABLE shows the
    curve (``eval_calibration_bins``), and this reduces calibration to
    three decision-grade numbers: BS = uncertainty − resolution +
    reliability. Reliability (weighted squared gap between bin mean
    score and bin positive rate — want 0) says how much re-calibration
    would recover; resolution (weighted squared gap between bin rates
    and the base rate — want big) says whether the score separates at
    all; uncertainty ȳ(1−ȳ) is the irreducible floor no model can
    beat. ``decomposition_gap`` reports the within-bin variance the
    10-bin coarsening leaves unattributed (exactly 0 only when every
    forecast in a bin is identical) — publishing the residual instead
    of pretending the binned identity is exact.

    Exactness: per-row (s−y)² is one IEEE chain over the exact
    rational score, pinned DECIMAL(18,12) before the order-sensitive
    corpus sum; per-bin mean scores ride the calibration op's
    DECIMAL(18,9) pin; the ten per-bin quadratic terms and all
    outputs pin at scale NINE (DECIMAL(28,9)/(18,9)) — at scale 12
    the two engines' bin-term chains landed 2 ulp apart at sf0.001
    (hash-mismatch); 9 decimals rounds the last-ulp divergence away
    with 1000× headroom while keeping far more precision than the
    statistic carries.

    Plan: tokenize scan → one corpus moment aggregate + one 10-group
    hash aggregate (both map-side partial at 100 TB) → broadcast
    scalar joins → 1-row finish. No window, no rank exchange — the
    fixed-width bins make this strictly cheaper than the rank-decile
    calibration table."""
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("brier_documents")
    return spark.sql(
        _brier_sql("brier_documents", _en_score_spark(), "BIGINT")
    )


# ---- Population Stability Index ----------------------------------------

PSI_BINS = 10
PSI_SRC = "src0"


@query(
    "stats_psi_drift",
    oracle=f"""
    WITH rng AS (
      SELECT min(n_chars) AS mn, max(n_chars) - min(n_chars) + 1 AS span
      FROM documents
    ),
    binned AS (
      SELECT ((n_chars - mn) * {PSI_BINS}) // span AS bin,
             CASE WHEN source = '{PSI_SRC}' THEN 1 ELSE 0 END AS is_a
      FROM documents, rng
    ),
    byb AS (
      SELECT bin,
             SUM(is_a)::BIGINT AS ca,
             SUM(1 - is_a)::BIGINT AS cb
      FROM binned GROUP BY bin
    ),
    tot AS (SELECT SUM(ca)::BIGINT AS na, SUM(cb)::BIGINT AS nb FROM byb),
    terms AS (
      SELECT bin, ca, cb,
             CAST(ca + 1 AS DOUBLE) / (na + {PSI_BINS}) AS p,
             CAST(cb + 1 AS DOUBLE) / (nb + {PSI_BINS}) AS q
      FROM byb, tot
    )
    SELECT bin, ca AS n_src, cb AS n_rest,
           CAST(CAST(p AS DECIMAL(18,6)) AS DOUBLE) AS p_src,
           CAST(CAST(q AS DECIMAL(18,6)) AS DOUBLE) AS p_rest,
           CAST(CAST((p - q) * ln(p / q) AS DECIMAL(18,6)) AS DOUBLE)
             AS psi_term
    FROM terms
    ORDER BY bin
    """,
)
def stats_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between one source and the rest of
    the corpus over document length, per equal-width bin — the
    industry-standard model-monitoring drift score, completing the
    drift triptych: TVD (coarse binned mass), KS (distribution-free
    max gap), PSI (per-bin log-ratio attribution — WHICH bins moved).

    Exactness: binning is fully integral (bin = (x−mn)·B // span, an
    exact integer floor-division); add-one smoothing keeps every
    share a positive exact rational so ln never sees 0; each term is
    one identical double chain (the ln-of-exact-ratio precedent),
    pinned DECIMAL(18,6).

    Plan: a 2-row min/max broadcast, one binning scan → B-group agg;
    everything after runs on B rows."""
    rng = load_table(spark, sf_dir, "documents").agg(
        F.min("n_chars").alias("mn"),
        (F.max("n_chars") - F.min("n_chars") + 1).alias("span"),
    )
    binned = (
        load_table(spark, sf_dir, "documents")
        .crossJoin(F.broadcast(rng))
        .select(
            F.floor(
                ((F.col("n_chars") - F.col("mn")) * PSI_BINS)
                / F.col("span")
            ).alias("bin"),
            F.when(F.col("source") == PSI_SRC, 1).otherwise(0).alias(
                "is_a"
            ),
        )
    )
    byb = binned.groupBy("bin").agg(
        F.sum("is_a").alias("ca"),
        F.sum(F.lit(1) - F.col("is_a")).alias("cb"),
    )
    tot = byb.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    t = byb.crossJoin(F.broadcast(tot))
    p = (F.col("ca") + 1).cast("double") / (F.col("na") + PSI_BINS)
    q = (F.col("cb") + 1).cast("double") / (F.col("nb") + PSI_BINS)
    return t.select(
        "bin",
        F.col("ca").alias("n_src"),
        F.col("cb").alias("n_rest"),
        _d6(p).alias("p_src"),
        _d6(q).alias("p_rest"),
        _d6((p - q) * F.log(p / q)).alias("psi_term"),
    ).orderBy("bin")


# ---- leave-one-out target encoding --------------------------------------

TENC_SMOOTH = 20  # pseudo-count mass pulled toward the global prior


@query(
    "features_target_encoding",
    oracle=f"""
    WITH lab AS (
      SELECT o_orderpriority AS category,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    bycat AS (
      SELECT category, SUM(y)::BIGINT AS sy, COUNT(*)::BIGINT AS n
      FROM lab GROUP BY category
    ),
    tot AS (
      SELECT SUM(sy)::BIGINT AS ty, SUM(n)::BIGINT AS tn FROM bycat
    )
    SELECT category, n, sy AS n_pos,
           CAST(CAST(CAST(sy AS DOUBLE) / n AS DECIMAL(18,6))
                AS DOUBLE) AS raw_rate,
           CAST(CAST(
             (sy - 1 + {TENC_SMOOTH} * (CAST(ty AS DOUBLE) / tn))
             / (n - 1 + {TENC_SMOOTH})
             AS DECIMAL(18,6)) AS DOUBLE) AS enc_if_pos,
           CAST(CAST(
             (sy + {TENC_SMOOTH} * (CAST(ty AS DOUBLE) / tn))
             / (n - 1 + {TENC_SMOOTH})
             AS DECIMAL(18,6)) AS DOUBLE) AS enc_if_neg
    FROM bycat, tot
    ORDER BY category
    """,
)
def features_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding with prior smoothing — the
    categorical-feature workhorse of tabular training pipelines,
    computed the leakage-safe way: a row's own label is subtracted
    from its category's sum before the rate is formed (the
    ``events_training_features_pit`` discipline applied to
    aggregates), with TENC_SMOOTH pseudo-observations of the global
    prior so rare categories shrink toward it. Encoding
    o_orderpriority against the fulfilled-order label here.

    A LOO encoding takes exactly two values per category (the row was
    a positive / was a negative), so the lossless, scale-free output
    is the per-category table of both values — joining it back to
    rows is one broadcast map-side join, no per-row recompute.

    Exactness: sums/counts integral, the prior one IEEE division,
    each encoding one fixed chain, pinned DECIMAL(18,6).

    Plan: one scan → |categories|-group partial agg; the prior is a
    1-row broadcast."""
    lab = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("category"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    bycat = lab.groupBy("category").agg(
        F.sum("y").alias("sy"), F.count(F.lit(1)).alias("n")
    )
    tot = bycat.agg(F.sum("sy").alias("ty"), F.sum("n").alias("tn"))
    t = bycat.crossJoin(F.broadcast(tot))
    prior = F.col("ty").cast("double") / F.col("tn")
    den = F.col("n") - 1 + TENC_SMOOTH
    return t.select(
        "category",
        "n",
        F.col("sy").alias("n_pos"),
        _d6(F.col("sy").cast("double") / F.col("n")).alias("raw_rate"),
        _d6((F.col("sy") - 1 + TENC_SMOOTH * prior) / den).alias(
            "enc_if_pos"
        ),
        _d6((F.col("sy") + TENC_SMOOTH * prior) / den).alias("enc_if_neg"),
    ).orderBy("category")


# ---- split-conformal forecast intervals ---------------------------------

CONF_EVAL_DAYS = 7  # evaluate the last week; calibrate on prior lag-7 days


@query(
    "events_conformal_forecast",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
               AS day,
             SUM(CAST(value AS DECIMAL(18,6))) AS rev
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
      GROUP BY 1
    ),
    seq AS (
      SELECT day, rev, ROW_NUMBER() OVER (ORDER BY day) AS t,
             (SELECT COUNT(*)::BIGINT FROM daily) AS tmax
      FROM daily
    ),
    paired AS (
      SELECT a.day, a.t, a.tmax, a.rev AS actual, p.rev AS pred
      FROM seq a JOIN seq p ON p.t = a.t - 7
    ),
    cal AS (
      SELECT abs(actual - pred) AS absr FROM paired
      WHERE t <= tmax - {CONF_EVAL_DAYS}
    ),
    ranked AS (
      SELECT absr, ROW_NUMBER() OVER (ORDER BY absr) AS rn,
             (SELECT COUNT(*)::BIGINT FROM cal) AS nc
      FROM cal
    ),
    q AS (
      SELECT MIN(CASE WHEN rn = LEAST((9 * (nc + 1) + 9) // 10, nc)
                      THEN absr END) AS qhat
      FROM ranked
    )
    SELECT day,
           CAST(actual AS DOUBLE) AS actual,
           CAST(pred AS DOUBLE) AS forecast,
           CAST(pred - qhat AS DOUBLE) AS lo,
           CAST(pred + qhat AS DOUBLE) AS hi,
           CASE WHEN actual >= pred - qhat AND actual <= pred + qhat
                THEN 1 ELSE 0 END AS covered
    FROM paired, q
    WHERE t > tmax - {CONF_EVAL_DAYS}
    ORDER BY day
    """,
)
def events_conformal_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals around the seasonal-naive
    forecast: calibrate the 90% quantile of |lag-7 residuals| on days
    BEFORE the evaluation week (no leakage — the
    ``events_training_features_pit`` discipline), then band the last
    week's forecasts with ±q̂ and report coverage — distribution-free
    uncertainty for the ``events_forecast_backtest`` baseline.

    Exactness: everything is DECIMAL until the output cast — daily
    revenue, residuals, the conformal quantile (an exact order
    statistic picked by the INTEGRAL rank ⌈0.9·(n+1)⌉ = (9(n+1)+9)//10;
    a float 0.9·(n+1) misrounds when n+1 is a multiple of 10), and
    the interval arithmetic. No float op exists in this query at all.

    Plan: one scan → per-day agg; the lag join, calibration ranks,
    and banding all run over the ~#days frame (tiny BY CONSTRUCTION —
    the CUSUM-series exception)."""
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .groupBy(F.date_trunc("DAY", "ts").cast("date").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("rev"))
    )
    seq = daily.select(
        "day", "rev", F.row_number().over(Window.orderBy("day")).alias("t")
    ).crossJoin(
        F.broadcast(daily.agg(F.count(F.lit(1)).alias("tmax")))
    )
    a = seq.select("day", "t", "tmax", F.col("rev").alias("actual"))
    p = seq.select(F.col("t").alias("tp"), F.col("rev").alias("pred"))
    paired = a.join(p, F.col("tp") == F.col("t") - 7).drop("tp")
    cal = paired.filter(
        F.col("t") <= F.col("tmax") - CONF_EVAL_DAYS
    ).select(F.abs(F.col("actual") - F.col("pred")).alias("absr"))
    ranked = cal.select(
        "absr", F.row_number().over(Window.orderBy("absr")).alias("rn")
    ).crossJoin(F.broadcast(cal.agg(F.count(F.lit(1)).alias("nc"))))
    qhat = ranked.select(
        F.min(
            F.when(
                F.col("rn")
                == F.least(
                    F.floor((9 * (F.col("nc") + 1) + 9) / 10),
                    F.col("nc"),
                ),
                F.col("absr"),
            )
        ).alias("qhat")
    )
    ev = paired.filter(F.col("t") > F.col("tmax") - CONF_EVAL_DAYS)
    out = ev.crossJoin(F.broadcast(qhat))
    lo = F.col("pred") - F.col("qhat")
    hi = F.col("pred") + F.col("qhat")
    return out.select(
        "day",
        F.col("actual").cast("double").alias("actual"),
        F.col("pred").cast("double").alias("forecast"),
        lo.cast("double").alias("lo"),
        hi.cast("double").alias("hi"),
        F.when(
            (F.col("actual") >= lo) & (F.col("actual") <= hi), 1
        )
        .otherwise(0)
        .alias("covered"),
    ).orderBy("day")


# ---- one-way ANOVA -----------------------------------------------------

# Order-priority groups are FIXED literals, so the 5 groups' exact
# moments can be pivoted into ONE row by conditional aggregation and
# every cross-group reduction written as a fixed left-to-right IEEE
# expression — no float aggregation whose order the engine chooses.
_ANOVA_GROUPS = (
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
)


def _group_moment_cols(
    dialect: str, val_expr: str, grp_col: str
) -> str:
    """Per-group exact moments as conditional aggregates: n_i BIGINT,
    s_i an exact DECIMAL(18,6) sum, q_i the Σx² sum with the per-row
    square taken in DOUBLE and pinned to DECIMAL(38,6) before the sum
    (the ``events_ab_test_lift`` sxx pattern: the square of an exact
    decimal is one correctly-rounded IEEE op — identical bits on both
    engines — and the SUM over the pins is order-insensitive; squaring
    in DECIMAL overflows DuckDB's product width instead). Shared by
    the one-way ANOVA and the Brown–Forsythe variance test."""
    cols = []
    for i, g in enumerate(_ANOVA_GROUPS):
        x = f"CAST({val_expr} AS DECIMAL(18,6))"
        x2 = (
            f"CAST(CAST({x} AS DOUBLE) * CAST({x} AS DOUBLE)"
            " AS DECIMAL(38,6))"
        )
        w = f"{grp_col} = '{g}'"
        if dialect == "spark":
            cols += [
                f"SUM(CASE WHEN {w} THEN 1 ELSE 0 END) AS n{i}",
                f"SUM(CASE WHEN {w} THEN {x} END) AS s{i}",
                f"SUM(CASE WHEN {w} THEN {x2} END) AS q{i}",
            ]
        else:
            cols += [
                f"COUNT(*) FILTER (WHERE {w})::BIGINT AS n{i}",
                f"SUM({x}) FILTER (WHERE {w}) AS s{i}",
                f"SUM({x2}) FILTER (WHERE {w}) AS q{i}",
            ]
    return ",\n             ".join(cols)


def _anova_moment_cols(dialect: str) -> str:
    return _group_moment_cols(dialect, "o_totalprice", "o_orderpriority")


def _anova_final_select() -> str:
    """The fixed-order IEEE chain from the one-row moment frame —
    written once, used verbatim by both dialects."""
    k = len(_ANOVA_GROUPS)
    nn = " + ".join(f"n{i}" for i in range(k))
    within = " + ".join(
        f"(CAST(q{i} AS DOUBLE)"
        f" - CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE) / n{i})"
        for i in range(k)
    )
    between_grp = " + ".join(
        f"CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE) / n{i}"
        for i in range(k)
    )
    stot = " + ".join(f"CAST(s{i} AS DOUBLE)" for i in range(k))
    return f"""
      SELECT
        CAST(({nn}) AS BIGINT) AS n_rows,
        {k} AS k_groups,
        CAST(CAST(
          ((({between_grp}) - ({stot}) * ({stot}) / ({nn})) / {k - 1})
          / ((({within})) / (({nn}) - {k}))
          AS DECIMAL(18,6)) AS DOUBLE) AS f_stat,
        CAST(CAST(
          (({between_grp}) - ({stot}) * ({stot}) / ({nn}))
          / ((({between_grp}) - ({stot}) * ({stot}) / ({nn})) + ({within}))
          AS DECIMAL(18,6)) AS DOUBLE) AS eta_sq
      FROM mo"""


@query(
    "stats_anova_priority_price",
    oracle=f"""
    WITH mo AS (
      SELECT {_anova_moment_cols('duck')}
      FROM orders
    )
    {_anova_final_select()}
    """,
)
def stats_anova_priority_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One-way ANOVA: does order priority explain order value? F
    statistic and effect size (η²) across the five priority groups —
    the k-group generalization of the A/B readout's two-arm Welch z
    (``events_ab_test_lift``), run the way a curation pipeline asks
    "does this categorical feature matter" before training on it.

    Exactness: per-group sufficient statistics (n, Σx, Σx²) are exact
    BIGINT/DECIMAL conditional aggregates folded in ONE scan; the five
    groups pivot into a single row, so every cross-group reduction is
    a FIXED left-to-right IEEE expression — no engine-ordered float
    sum anywhere (the determinism rule events_ab_test_lift
    established, extended to k arms).

    Scale: one partial+final hash aggregate, 15 columns of moments;
    the finishing arithmetic is a 1-row projection."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("anova_orders")
    return spark.sql(
        f"""
        WITH mo AS (
          SELECT {_anova_moment_cols('spark')}
          FROM anova_orders
        )
        {_anova_final_select()}
        """
    )


# ---- Brown–Forsythe variance homogeneity test ---------------------------

# The ANOVA companion: ANOVA's F assumes equal group variances; the
# Brown–Forsythe statistic IS a one-way ANOVA computed on the absolute
# deviations from each group's MEDIAN (the robust Levene variant), so
# it reuses the exact moment machinery verbatim on a derived frame.


def _bf_dev_cte(dialect: str) -> str:
    """The |x − med_g| frame: group medians via the shared type-7
    interpolation (Spark ``percentile`` ≡ DuckDB ``quantile_cont``,
    the ``agg_exact_percentiles`` anchor), deviations taken in DOUBLE
    (one correctly-rounded subtract of bit-identical inputs)."""
    med_fn = (
        "percentile(o_totalprice, 0.5D)"
        if dialect == "spark"
        else "quantile_cont(o_totalprice, 0.5)"
    )
    return f"""med AS (
      SELECT o_orderpriority, {med_fn} AS med
      FROM src GROUP BY o_orderpriority
    ), z AS (
      SELECT o.o_orderpriority,
             abs(CAST(o.o_totalprice AS DOUBLE) - CAST(m.med AS DOUBLE))
               AS zdev
      FROM src o JOIN med m ON m.o_orderpriority = o.o_orderpriority
    )"""


@query(
    "stats_brown_forsythe_variance",
    oracle=f"""
    WITH src AS (SELECT o_orderpriority, o_totalprice FROM orders),
    {_bf_dev_cte('duck')},
    mo AS (
      SELECT {_group_moment_cols('duck', 'zdev', 'o_orderpriority')}
      FROM z
    )
    {_anova_final_select()}
    """,
)
def stats_brown_forsythe_variance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Brown–Forsythe homogeneity-of-variance test across the five
    order-priority groups — the assumption check that decides whether
    ``stats_anova_priority_price``'s F is trustworthy (ANOVA assumes
    equal variances; BF detects when they aren't, robustly, by running
    the SAME one-way F on |x − median_g|).

    Exactness: group medians are the shared type-7 interpolation both
    engines agree on bit-for-bit; each deviation is one
    correctly-rounded IEEE subtract of bit-identical doubles, then
    pinned DECIMAL(18,6) by the shared moment builder; the cross-group
    reduction is the same fixed-order chain as the ANOVA (shared
    ``_anova_final_select``, so the two tests cannot drift).

    Plan: one grouped median pass (bounded groups), a broadcast join
    of 5 medians back onto the scan, then the single-row conditional
    moment aggregate — two passes over orders, no wide shuffle."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    orders.createOrReplaceTempView("bf_orders")
    return spark.sql(
        f"""
        WITH src AS (SELECT * FROM bf_orders),
        {_bf_dev_cte('spark')},
        mo AS (
          SELECT {_group_moment_cols('spark', 'zdev', 'o_orderpriority')}
          FROM z
        )
        {_anova_final_select()}
        """
    )


# ---- Spearman rank correlation ------------------------------------------

# One fixed IEEE chain shared verbatim by both dialects: exact moment
# sums in, correlation out, pinned DECIMAL(18,6). `n/sx/...` are the
# column names both sides expose from their moment row.
_PEARSON_CHAIN = """CAST(CAST(
      (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      AS DECIMAL(18,6)) AS DOUBLE)"""


@query(
    "stats_spearman_price_quantity",
    oracle=f"""
    WITH li AS (
      SELECT l_quantity, l_extendedprice FROM lineitem
    ), qm AS (
      SELECT l_quantity, COUNT(*)::BIGINT AS c FROM li GROUP BY 1
    ), qc AS (
      SELECT l_quantity, c, SUM(c) OVER (ORDER BY l_quantity) AS cum
      FROM qm
    ), qr AS (
      SELECT l_quantity, 2 * (cum - c) + c + 1 AS rx2 FROM qc
    ), pm AS (
      SELECT l_extendedprice, COUNT(*)::BIGINT AS c FROM li GROUP BY 1
    ), pc AS (
      SELECT l_extendedprice, c,
             SUM(c) OVER (ORDER BY l_extendedprice) AS cum
      FROM pm
    ), pr AS (
      SELECT l_extendedprice, 2 * (cum - c) + c + 1 AS ry2 FROM pc
    ), j AS (
      SELECT rx2, ry2
      FROM li JOIN qr USING (l_quantity) JOIN pr USING (l_extendedprice)
    ), mo AS (
      SELECT COUNT(*)::BIGINT AS n,
             SUM(CAST(rx2 AS DECIMAL(38,0))) AS sx,
             SUM(CAST(ry2 AS DECIMAL(38,0))) AS sy,
             SUM(CAST(rx2 AS DECIMAL(38,0)) * rx2) AS sxx,
             SUM(CAST(ry2 AS DECIMAL(38,0)) * ry2) AS syy,
             SUM(CAST(rx2 AS DECIMAL(38,0)) * ry2) AS sxy
      FROM j
    )
    SELECT n AS n_rows, {_PEARSON_CHAIN} AS spearman_rho FROM mo
    """,
)
def stats_spearman_price_quantity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spearman rank correlation between line quantity and extended
    price — the monotone-association readout that survives the heavy
    price tail where Pearson (``lineitem_correlation_matrix``) is
    leverage-dominated. Ranks are tie-averaged (fractional ranks), the
    standard Spearman-with-ties estimator: rho = Pearson on the rank
    pairs.

    Exactness: ranks stay INTEGRAL via the 2×avg_rank identity from
    ``stats_mannwhitney_value`` (2·r = 2·cum_before + t + 1; the 2×
    scale cancels in the correlation), all six moment sums are exact
    DECIMAL(38,0) reductions (order-insensitive), and the correlation
    is ONE fixed IEEE chain pinned DECIMAL(18,6) — the
    ``graph_degree_assortativity`` discipline applied to ranks.

    Plan: two rank maps — quantity (≤50 distinct values BY
    CONSTRUCTION of the TPC-H domain: plain tiny-frame window) and
    price (corpus-scale distinct: range-exchange prefix, NO
    single-partition window) — joined back to the row frame (the
    quantity map broadcasts; the price map joins on its own
    group key, one shuffle), then a single-row moment aggregate.
    At 100 TB the per-term BIGINT products (≤ (2n)²) are why the
    sums run in DECIMAL(38,0), not BIGINT."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice"
    )
    qm = li.groupBy("l_quantity").agg(F.count(F.lit(1)).alias("c"))
    wq = Window.orderBy("l_quantity").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    qr = qm.withColumn("cum", F.sum("c").over(wq)).select(
        "l_quantity",
        (2 * (F.col("cum") - F.col("c")) + F.col("c") + 1).alias("rx2"),
    )
    pm = li.groupBy("l_extendedprice").agg(F.count(F.lit(1)).alias("c"))
    pc = _range_prefix(pm, ["l_extendedprice"], ["c"])
    pr = pc.select(
        "l_extendedprice",
        (2 * (F.col("cum_c") - F.col("c")) + F.col("c") + 1).alias("ry2"),
    )
    j = li.join(F.broadcast(qr), "l_quantity").join(pr, "l_extendedprice")
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    mo = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d38("rx2")).alias("sx"),
        F.sum(d38("ry2")).alias("sy"),
        F.sum(d38("rx2") * F.col("rx2")).alias("sxx"),
        F.sum(d38("ry2") * F.col("ry2")).alias("syy"),
        F.sum(d38("rx2") * F.col("ry2")).alias("sxy"),
    )
    return mo.select(
        F.col("n").alias("n_rows"),
        F.expr(_PEARSON_CHAIN).alias("spearman_rho"),
    )


# ---- Kendall tau-b trend test on the daily revenue series ---------------


@query(
    "stats_kendall_tau_daily",
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ), p AS (
      SELECT a.rev AS ra, b.rev AS rb FROM d a JOIN d b ON a.day < b.day
    ), mo AS (
      SELECT COUNT(*)::BIGINT AS n0,
             SUM(CASE WHEN rb > ra THEN 1
                      WHEN rb < ra THEN -1 ELSE 0 END)::BIGINT AS s,
             SUM(CASE WHEN rb = ra THEN 1 ELSE 0 END)::BIGINT AS t1
      FROM p
    ), nn AS (SELECT COUNT(*)::BIGINT AS n FROM d)
    SELECT n AS n_days,
           s AS nc_minus_nd,
           t1 AS n_tied_pairs,
           CAST(CAST(
             CAST(s AS DOUBLE)
             / (sqrt(CAST(n0 AS DOUBLE))
                * sqrt(CAST(n0 - t1 AS DOUBLE)))
             AS DECIMAL(18,6)) AS DOUBLE) AS kendall_tau_b
    FROM mo, nn
    """,
)
def stats_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b monotone-trend test on the daily order-revenue
    series — the rank cousin of ``stats_theil_sen_trend`` (same
    concordant/discordant machinery; Theil–Sen gives the slope, tau
    gives the strength and a distribution-free significance handle).
    Days are unique, so the tie correction reduces to the revenue-tie
    term: tau_b = S / (√n0 · √(n0 − t_rev)).

    Exactness: daily revenue is a DECIMAL(18,2)-exact sum, so every
    pairwise comparison is exact; S and the tie count are exact
    integers; ONE fixed IEEE chain pinned DECIMAL(18,6).

    Plan & scale: the quadratic pair join runs over the DAILY
    AGGREGATE — series length grows with the time horizon, not the
    corpus (the ``events_cusum_changepoint`` exception), so the
    broadcast nested-loop pair join is bounded (~2.4k days → ~3M
    comparisons) no matter the row count. The corpus-sized work is
    the one scan into the daily aggregate."""
    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
    )
    a = d.select(F.col("day").alias("da"), F.col("rev").alias("ra"))
    b = d.select(F.col("day").alias("db"), F.col("rev").alias("rb"))
    p = a.join(b, F.col("da") < F.col("db"))
    mo = p.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(
            F.when(F.col("rb") > F.col("ra"), 1)
            .when(F.col("rb") < F.col("ra"), -1)
            .otherwise(0)
        ).alias("s"),
        F.sum(
            F.when(F.col("rb") == F.col("ra"), 1).otherwise(0)
        ).alias("t1"),
    )
    nn = d.agg(F.count(F.lit(1)).alias("n"))
    return mo.crossJoin(F.broadcast(nn)).select(
        F.col("n").alias("n_days"),
        F.col("s").alias("nc_minus_nd"),
        F.col("t1").alias("n_tied_pairs"),
        F.expr(
            "CAST(CAST("
            " CAST(s AS DOUBLE)"
            " / (sqrt(CAST(n0 AS DOUBLE))"
            "    * sqrt(CAST(n0 - t1 AS DOUBLE)))"
            " AS DECIMAL(18,6)) AS DOUBLE)"
        ).alias("kendall_tau_b"),
    )


# ---- two-group log-rank survival test -----------------------------------


@query(
    "stats_logrank_weekday_cohort",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             min(CAST(ts AS TIMESTAMP)) AS f_ts,
             CAST(min(CAST(ts AS TIMESTAMP)) AS DATE) AS f,
             max(CAST(ts AS TIMESTAMP)) AS l
      FROM events GROUP BY user_id
    ),
    horizon AS (SELECT max(l) AS end_ts FROM u),
    obs AS (
      SELECT datediff('day', f, CAST(l AS DATE)) AS dur,
             CASE WHEN l < end_ts - INTERVAL {KM_SILENCE_DAYS} DAY
                  THEN 1 ELSE 0 END AS churned,
             CASE WHEN isodow(f_ts) <= 5 THEN 1 ELSE 0 END AS grp
      FROM u, horizon
    ),
    byd AS (
      SELECT dur,
             SUM(churned * grp)::BIGINT AS d1,
             SUM(churned * (1 - grp))::BIGINT AS d0,
             SUM(grp)::BIGINT AS n1,
             SUM(1 - grp)::BIGINT AS n0
      FROM obs GROUP BY dur
    ),
    tot AS (
      SELECT SUM(n1)::BIGINT AS t1, SUM(n0)::BIGINT AS t0 FROM byd
    ),
    cum AS (
      SELECT dur, d1, d0, n1, n0,
             SUM(n1) OVER (ORDER BY dur) AS c1,
             SUM(n0) OVER (ORDER BY dur) AS c0
      FROM byd
    ),
    r AS (
      SELECT dur, d1, d0, d1 + d0 AS d,
             t1 - (c1 - n1) AS ar1,
             (t1 - (c1 - n1)) + (t0 - (c0 - n0)) AS ar
      FROM cum, tot
      WHERE d1 + d0 > 0 AND (t1 - (c1 - n1)) + (t0 - (c0 - n0))
            > d1 + d0
    ),
    terms AS (
      SELECT d1,
             CAST(CAST(d AS DOUBLE) * ar1 / ar
                  AS DECIMAL(18,9)) AS e1,
             CAST(CAST(d AS DOUBLE) * (CAST(ar1 AS DOUBLE) / ar)
                  * (CAST(1 AS DOUBLE) - CAST(ar1 AS DOUBLE) / ar)
                  * (CAST(ar - d AS DOUBLE) / CAST(ar - 1 AS DOUBLE))
                  AS DECIMAL(18,9)) AS v
      FROM r
    ),
    mo AS (
      SELECT SUM(d1)::BIGINT AS o1, SUM(e1) AS e, SUM(v) AS vv
      FROM terms
    )
    SELECT tot.t1 AS n_weekday_users,
           tot.t0 AS n_weekend_users,
           mo.o1 AS observed_weekday_churn,
           CAST(CAST(mo.e AS DECIMAL(18,6)) AS DOUBLE)
             AS expected_weekday_churn,
           CAST(CAST(
             (CAST(mo.o1 AS DOUBLE) - CAST(mo.e AS DOUBLE))
             / sqrt(CAST(mo.vv AS DOUBLE))
             AS DECIMAL(18,6)) AS DOUBLE) AS logrank_z
    FROM mo, tot
    """,
)
def stats_logrank_weekday_cohort(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-group log-rank test: do users acquired on a WEEKDAY churn
    at the same hazard as users acquired on a WEEKEND? The hypothesis
    test that pairs with ``users_kaplan_meier`` — KM draws each
    group's survival curve; log-rank says whether the curves differ
    beyond chance, honoring right-censoring (a still-active user
    contributes to the risk set but never to the death count, exactly
    the censoring rule the KM operator established).

    Semantics shared with ``users_kaplan_meier`` verbatim: duration =
    days from first to last event, churn = silent ≥ KM_SILENCE_DAYS
    before the horizon. At each event time with d > 0 deaths: the
    weekday group's expected deaths under the pooled hazard are
    d·n₁/n, the hypergeometric variance d·(n₁/n)(1−n₁/n)(n−d)/(n−1),
    and z = (O₁−E₁)/√ΣV.

    Exactness: death counts and risk sets are exact integers
    (grouped cumsum complements — no float ECDF); each E/V term is
    ONE fixed IEEE chain over exact ints pinned DECIMAL(18,9) (the KM
    ln-term precedent), summed exactly; the final z is one more fixed
    chain pinned DECIMAL(18,6). Rows where the whole risk set dies
    are excluded by the same ar > d guard in both dialects (they
    contribute zero variance and undefined (n−1) terms).

    Plan: one scan → per-user agg; everything downstream runs over
    the ~#distinct-durations frame — tiny BY CONSTRUCTION (≤ horizon
    days), so the global cumsum windows are not a scale hazard. The
    horizon and the group totals are 1-row broadcasts."""
    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("f_ts"),
            F.min("ts").cast("date").alias("f"),
            F.max("ts").alias("l"),
        )
    )
    horizon = u.agg(F.max("l").alias("end_ts"))
    obs = u.crossJoin(F.broadcast(horizon)).select(
        F.datediff(F.col("l").cast("date"), F.col("f")).alias("dur"),
        F.when(
            F.col("l")
            < F.col("end_ts") - F.expr(f"INTERVAL {KM_SILENCE_DAYS} DAY"),
            1,
        )
        .otherwise(0)
        .alias("churned"),
        F.when(F.weekday("f_ts") <= 4, 1).otherwise(0).alias("grp"),
    )
    byd = obs.groupBy("dur").agg(
        F.sum(F.col("churned") * F.col("grp")).alias("d1"),
        F.sum(F.col("churned") * (1 - F.col("grp"))).alias("d0"),
        F.sum("grp").alias("n1"),
        F.sum(1 - F.col("grp")).alias("n0"),
    )
    tot = byd.agg(
        F.sum("n1").alias("t1"), F.sum("n0").alias("t0")
    )
    wall = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        byd.withColumn("c1", F.sum("n1").over(wall))
        .withColumn("c0", F.sum("n0").over(wall))
        .crossJoin(F.broadcast(tot))
    )
    r = cum.select(
        "d1",
        (F.col("d1") + F.col("d0")).alias("d"),
        (F.col("t1") - (F.col("c1") - F.col("n1"))).alias("ar1"),
        (
            (F.col("t1") - (F.col("c1") - F.col("n1")))
            + (F.col("t0") - (F.col("c0") - F.col("n0")))
        ).alias("ar"),
    ).filter((F.col("d") > 0) & (F.col("ar") > F.col("d")))
    terms = r.select(
        "d1",
        F.expr(
            "CAST(CAST(d AS DOUBLE) * ar1 / ar AS DECIMAL(18,9))"
        ).alias("e1"),
        F.expr(
            "CAST(CAST(d AS DOUBLE) * (CAST(ar1 AS DOUBLE) / ar)"
            " * (CAST(1 AS DOUBLE) - CAST(ar1 AS DOUBLE) / ar)"
            " * (CAST(ar - d AS DOUBLE) / CAST(ar - 1 AS DOUBLE))"
            " AS DECIMAL(18,9))"
        ).alias("v"),
    )
    mo = terms.agg(
        F.sum("d1").alias("o1"),
        F.sum("e1").alias("e"),
        F.sum("v").alias("vv"),
    )
    return mo.crossJoin(F.broadcast(tot)).select(
        F.col("t1").alias("n_weekday_users"),
        F.col("t0").alias("n_weekend_users"),
        F.col("o1").alias("observed_weekday_churn"),
        _d6(F.col("e")).alias("expected_weekday_churn"),
        F.expr(
            "CAST(CAST("
            " (CAST(o1 AS DOUBLE) - CAST(e AS DOUBLE))"
            " / sqrt(CAST(vv AS DOUBLE))"
            " AS DECIMAL(18,6)) AS DOUBLE)"
        ).alias("logrank_z"),
    )


# ---- bias-corrected Cramér's V ------------------------------------------


def _cramers_sql(table: str, bigint: str) -> str:
    """Shared dialect-neutral text for the chi²→V chain; only the
    source table name and the BIGINT cast spelling differ. The chi²
    terms reuse ``orders_chi2_priority_status``'s DECIMAL(18,6) pin,
    so the two readouts cannot drift."""
    return f"""
    WITH obs AS (
      SELECT o_orderpriority AS pri, o_orderstatus AS st,
             COUNT(*) AS o
      FROM {table} GROUP BY 1, 2
    ),
    rt AS (SELECT pri, SUM(o) AS r FROM obs GROUP BY pri),
    ct AS (SELECT st, SUM(o) AS c FROM obs GROUP BY st),
    n AS (SELECT SUM(o) AS n FROM obs),
    dims AS (
      SELECT CAST(COUNT(DISTINCT pri) AS {bigint}) AS r_dim,
             CAST(COUNT(DISTINCT st) AS {bigint}) AS c_dim
      FROM obs
    ),
    -- FULL r x c grid: a sparse contingency's ZERO cells still
    -- contribute e_ij to chi-square (observed-cells-only summation
    -- understates chi2 -- caught by test_stats_property2, invisible
    -- to the dual-engine gate because both dialects shared the slip).
    grid AS (
      SELECT rt.pri, ct.st, rt.r, ct.c,
             COALESCE(obs.o, 0) AS o
      FROM rt CROSS JOIN ct
      LEFT JOIN obs ON obs.pri = rt.pri AND obs.st = ct.st
    ),
    terms AS (
      SELECT CAST(
        (grid.o - (grid.r * grid.c * 1.0 / n.n))
        * (grid.o - (grid.r * grid.c * 1.0 / n.n))
        / (grid.r * grid.c * 1.0 / n.n) AS DECIMAL(18,6)) AS term
      FROM grid CROSS JOIN n
    ),
    chi AS (SELECT SUM(term) AS chi2 FROM terms)
    SELECT CAST(n.n AS {bigint}) AS n,
           dims.r_dim AS n_rows_dim,
           dims.c_dim AS n_cols_dim,
           CAST(chi.chi2 AS DOUBLE) AS chi2,
           CAST(CAST(sqrt(
             CAST(chi.chi2 AS DOUBLE) / n.n
             / (CASE WHEN dims.r_dim < dims.c_dim
                     THEN dims.r_dim ELSE dims.c_dim END - 1)
           ) AS DECIMAL(18,6)) AS DOUBLE) AS cramers_v,
           CAST(CAST(sqrt(
             (CASE WHEN CAST(chi.chi2 AS DOUBLE) / n.n
                        - CAST((dims.r_dim - 1) * (dims.c_dim - 1)
                               AS DOUBLE) / (n.n - 1) > CAST(0 AS DOUBLE)
                   THEN CAST(chi.chi2 AS DOUBLE) / n.n
                        - CAST((dims.r_dim - 1) * (dims.c_dim - 1)
                               AS DOUBLE) / (n.n - 1)
                   ELSE CAST(0 AS DOUBLE) END)
             / (CASE WHEN
                  CAST(dims.r_dim AS DOUBLE)
                    - CAST((dims.r_dim - 1) * (dims.r_dim - 1)
                           AS DOUBLE) / (n.n - 1)
                  < CAST(dims.c_dim AS DOUBLE)
                    - CAST((dims.c_dim - 1) * (dims.c_dim - 1)
                           AS DOUBLE) / (n.n - 1)
                THEN CAST(dims.r_dim AS DOUBLE)
                     - CAST((dims.r_dim - 1) * (dims.r_dim - 1)
                            AS DOUBLE) / (n.n - 1)
                ELSE CAST(dims.c_dim AS DOUBLE)
                     - CAST((dims.c_dim - 1) * (dims.c_dim - 1)
                            AS DOUBLE) / (n.n - 1) END - 1)
           ) AS DECIMAL(18,6)) AS DOUBLE) AS cramers_v_corrected
    FROM chi CROSS JOIN n CROSS JOIN dims
    """


@query(
    "orders_cramers_v",
    oracle=_cramers_sql("orders", "BIGINT"),
)
def orders_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bias-corrected Cramér's V between order priority and status —
    the EFFECT SIZE companion to ``orders_chi2_priority_status``: chi²
    says "dependent beyond chance" on any big table (everything is
    significant at n=millions); V says "how strongly", on a 0–1 scale
    comparable across tables, and the Bergsma-corrected variant
    removes the small-sample inflation (V̄ = √(φ̃²/min(r̃,c̃)−1) with
    φ̃² = max(0, φ² − (r−1)(c−1)/(n−1)) — public correction from
    Bergsma 2013). This is the feature-screening number a curation
    pipeline actually thresholds on.

    Exactness: identical chi² DECIMAL(18,6) terms as the chi²
    operator (shared text), then ONE fixed dialect-neutral IEEE
    chain (CASE-based max/min — GREATEST/LEAST argument typing
    differs across engines) pinned DECIMAL(18,6).

    Plan: one contingency aggregate over a 15-cell key, broadcast
    row/col margins, 1-row finish."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("cramers_orders")
    return spark.sql(_cramers_sql("cramers_orders", "BIGINT"))


# ---- two-sample Poisson rate test ---------------------------------------


def _poisson_sql(table: str, isodow_wd: str, bigint: str) -> str:
    return f"""
    WITH days AS (
      SELECT CAST(ts AS DATE) AS day,
             MAX(CASE WHEN {isodow_wd} THEN 1 ELSE 0 END) AS is_wd
      FROM {table} GROUP BY 1
    ),
    expo AS (
      SELECT CAST(SUM(is_wd) AS {bigint}) AS t1,
             CAST(SUM(1 - is_wd) AS {bigint}) AS t2
      FROM days
    ),
    err AS (
      SELECT CAST(SUM(CASE WHEN {isodow_wd} THEN 1 ELSE 0 END)
                  AS {bigint}) AS x1,
             CAST(SUM(CASE WHEN {isodow_wd} THEN 0 ELSE 1 END)
                  AS {bigint}) AS x2
      FROM {table} WHERE event_type = 'error'
    )
    SELECT x1 AS n_weekday_errors, x2 AS n_weekend_errors,
           t1 AS n_weekday_days, t2 AS n_weekend_days,
           CAST(CAST(
             (CAST(x1 AS DOUBLE) / t1) / (CAST(x2 AS DOUBLE) / t2)
             AS DECIMAL(18,6)) AS DOUBLE) AS rate_ratio,
           CAST(CAST(
             (CAST(x1 AS DOUBLE)
                - (x1 + x2) * (CAST(t1 AS DOUBLE) / (t1 + t2)))
             / sqrt((x1 + x2) * (CAST(t1 AS DOUBLE) / (t1 + t2))
                    * (CAST(1 AS DOUBLE)
                       - CAST(t1 AS DOUBLE) / (t1 + t2)))
             AS DECIMAL(18,6)) AS DOUBLE) AS poisson_z
    FROM err CROSS JOIN expo
    """


@query(
    "events_poisson_rate_test",
    oracle=_poisson_sql(
        "events", "isodow(CAST(ts AS TIMESTAMP)) <= 5", "BIGINT"
    ),
)
def events_poisson_rate_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-sample Poisson rate test: is the ERROR-event rate per
    observed day different on weekdays vs weekends? The COUNT-rate
    sibling of ``events_error_rate_wilson`` (a proportion of events)
    and ``events_ab_test_lift`` (a mean of values): here the unit of
    exposure is TIME, so the right model is Poisson counts over t₁ vs
    t₂ observed days, and the classic conditional test applies —
    given the total X₁+X₂, the weekday count is Binomial(n, t₁/(t₁+t₂)),
    z = (X₁ − n·p₀)/√(n·p₀(1−p₀)) (the binomial test for comparing
    two Poisson rates, Przyborowski & Wilenski 1940 — public).

    Exactness: exposures and counts are exact integers (calendar
    days observed, via one distinct-day aggregate); the z and the
    rate ratio are each ONE fixed IEEE chain pinned DECIMAL(18,6).

    Plan: two scans of the events table (one day-distinct aggregate,
    one filtered count), each a partial+final hash agg; 1-row cross
    joins to finish. Nothing scales past the day count."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("poisson_events")
    return spark.sql(
        _poisson_sql("poisson_events", "weekday(ts) <= 4", "BIGINT")
    )


# ---- Wald–Wolfowitz runs test on the daily revenue series ---------------


def _runs_sql(table: str, median_fn: str, bigint: str) -> str:
    return f"""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DOUBLE) AS rev
      FROM {table} GROUP BY 1
    ),
    med AS (SELECT {median_fn} AS m FROM d),
    s AS (
      SELECT day, CASE WHEN rev > m THEN 1 ELSE 0 END AS above
      FROM d CROSS JOIN med
      WHERE rev <> m
    ),
    runs AS (
      SELECT above,
             CASE WHEN LAG(above) OVER (ORDER BY day) IS NULL
                    OR LAG(above) OVER (ORDER BY day) <> above
                  THEN 1 ELSE 0 END AS new_run
      FROM s
    ),
    mo AS (
      SELECT CAST(SUM(above) AS {bigint}) AS n1,
             CAST(SUM(1 - above) AS {bigint}) AS n2,
             CAST(SUM(new_run) AS {bigint}) AS r
      FROM runs
    )
    SELECT n1 AS n_above, n2 AS n_below, r AS n_runs,
           CAST(CAST(
             (CAST(r AS DOUBLE)
                - (CAST(1 AS DOUBLE)
                   + CAST(2 AS DOUBLE) * n1 * n2 / (n1 + n2)))
             / sqrt(
                 (CAST(2 AS DOUBLE) * n1 * n2
                    * (CAST(2 AS DOUBLE) * n1 * n2 - n1 - n2))
                 / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                    * (n1 + n2 - 1)))
             AS DECIMAL(18,6)) AS DOUBLE) AS runs_z
    FROM mo
    """


@query(
    "stats_runs_test_daily",
    oracle=_runs_sql("orders", "quantile_cont(rev, 0.5)", "BIGINT"),
)
def stats_runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the daily order-revenue series:
    are above-median and below-median days RANDOMLY interleaved, or
    does revenue streak (regimes/momentum)? Complements the trend
    tests (``stats_theil_sen_trend``, ``stats_kendall_tau_daily``) —
    a series can be trendless yet strongly streaky, and streakiness
    is what breaks iid assumptions in bootstrap CIs.

    Median-split with exact-tie exclusion (days exactly at the
    median drop, the standard convention, applied identically in
    both dialects: daily revenue is a DECIMAL-exact sum cast once to
    DOUBLE, the median is the shared type-7 interpolation, and both
    the > and <> comparisons see bit-identical doubles). Run count
    via LAG over the day order; z from the exact n₁/n₂/R integers
    through ONE fixed chain pinned DECIMAL(18,6).

    Plan: one scan → daily aggregate; the LAG window is global but
    over the ~#days frame — tiny BY CONSTRUCTION (the
    ``events_cusum_changepoint`` exception)."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("runs_orders")
    return spark.sql(
        _runs_sql("runs_orders", "percentile(rev, 0.5D)", "BIGINT")
    )


# ---- weight-of-evidence / information value -------------------------------


def _woe_sql(table: str, bigint: str) -> str:
    """Shared dialect-neutral WOE/IV text: binary target = order
    status 'F' (fulfilled), feature = order priority. Half-count
    (+0.5) smoothing keeps zero cells finite, applied identically."""
    return f"""
    WITH cells AS (
      SELECT o_orderpriority AS category,
             CAST(SUM(CASE WHEN o_orderstatus = 'F'
                           THEN 1 ELSE 0 END) AS {bigint}) AS n_pos,
             CAST(SUM(CASE WHEN o_orderstatus = 'F'
                           THEN 0 ELSE 1 END) AS {bigint}) AS n_neg
      FROM {table} GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n_pos) AS {bigint}) AS tp,
             CAST(SUM(n_neg) AS {bigint}) AS tn
      FROM cells
    ),
    terms AS (
      SELECT category, n_pos, n_neg,
             CAST(ln(
               ((CAST(n_pos AS DOUBLE) + CAST(0.5 AS DOUBLE)) / tp)
               / ((CAST(n_neg AS DOUBLE) + CAST(0.5 AS DOUBLE)) / tn)
             ) AS DECIMAL(18,9)) AS woe,
             CAST(
               (CAST(n_pos AS DOUBLE) / tp - CAST(n_neg AS DOUBLE) / tn)
               * CAST(CAST(ln(
                   ((CAST(n_pos AS DOUBLE) + CAST(0.5 AS DOUBLE)) / tp)
                   / ((CAST(n_neg AS DOUBLE) + CAST(0.5 AS DOUBLE)) / tn)
                 ) AS DECIMAL(18,9)) AS DOUBLE)
             AS DECIMAL(18,9)) AS iv_term
      FROM cells CROSS JOIN tot
    ),
    iv AS (SELECT SUM(iv_term) AS ivs FROM terms)
    SELECT t.category,
           t.n_pos AS n_fulfilled,
           t.n_neg AS n_open,
           CAST(t.woe AS DOUBLE) AS woe,
           CAST(t.iv_term AS DOUBLE) AS iv_term,
           CAST(CAST(iv.ivs AS DECIMAL(18,9)) AS DOUBLE) AS iv_total
    FROM terms t CROSS JOIN iv
    """


@query(
    "features_woe_iv",
    oracle=_woe_sql("orders", "BIGINT"),
)
def features_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of evidence + information value of order priority
    against the fulfilled/open outcome — the credit-scoring feature
    screen (Siddiqi's classic banding readout, public method) that
    complements ``features_target_encoding`` (which ENCODES the
    category) and ``orders_mutual_information`` (which scores
    dependence symmetrically): WOE signs each category's pull,
    IV = Σ(p_pos−p_neg)·WOE ranks the whole feature on the
    standard <0.02 useless / >0.5 suspicious scale.

    Exactness: cell counts exact; each WOE is ln of ONE fixed IEEE
    chain over exact ints (+0.5 half-count smoothing spelled
    CAST-identically in both dialects), pinned DECIMAL(18,9); IV
    terms multiply pinned values in a fixed chain, and the total is
    an exact DECIMAL sum exposed at its native 9-decimal scale (a
    6-decimal re-rounding would sit on a HALF_UP/HALF_EVEN
    tie-breaking boundary between engines — measured, not
    hypothetical).

    Plan: one 5-cell conditional aggregate, 1-row totals broadcast,
    projection — nothing scales past the category count."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("woe_orders")
    return spark.sql(_woe_sql("woe_orders", "BIGINT"))


# ---- XmR (individuals / moving-range) control chart ----------------------


def _xmr_sql(table: str, bigint: str) -> str:
    """Shared dialect-neutral XmR text. The 2.66 constant is d2-scaled
    (3/1.128), the standard individuals-chart factor; spelled as one
    CAST literal so both engines see identical bits."""
    return f"""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM {table} GROUP BY 1
    ),
    mr AS (
      SELECT day, rev,
             abs(rev - LAG(rev) OVER (ORDER BY day)) AS mrange
      FROM d
    ),
    mo AS (
      SELECT CAST(COUNT(*) AS {bigint}) AS n_days,
             CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS mean_rev,
             CAST(SUM(mrange) AS DOUBLE) / (COUNT(*) - 1) AS mean_mr
      FROM mr
    ),
    lim AS (
      SELECT n_days, mean_rev, mean_mr,
             mean_rev + CAST(2.66 AS DOUBLE) * mean_mr AS ucl,
             mean_rev - CAST(2.66 AS DOUBLE) * mean_mr AS lcl
      FROM mo
    ),
    fl AS (
      SELECT CAST(SUM(CASE WHEN CAST(rev AS DOUBLE) > ucl
                           THEN 1 ELSE 0 END) AS {bigint}) AS n_above,
             CAST(SUM(CASE WHEN CAST(rev AS DOUBLE) < lcl
                           THEN 1 ELSE 0 END) AS {bigint}) AS n_below
      FROM mr CROSS JOIN lim
    )
    SELECT lim.n_days,
           CAST(CAST(lim.mean_rev AS DECIMAL(18,6)) AS DOUBLE)
             AS mean_rev,
           CAST(CAST(lim.mean_mr AS DECIMAL(18,6)) AS DOUBLE)
             AS mean_moving_range,
           CAST(CAST(lim.ucl AS DECIMAL(18,6)) AS DOUBLE) AS ucl,
           CAST(CAST(lim.lcl AS DECIMAL(18,6)) AS DOUBLE) AS lcl,
           fl.n_above AS n_above_ucl,
           fl.n_below AS n_below_lcl
    FROM lim CROSS JOIN fl
    """


@query(
    "stats_xmr_control_chart",
    oracle=_xmr_sql("orders", "BIGINT"),
)
def stats_xmr_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XmR (individuals & moving-range) control chart over daily
    order revenue — Shewhart's process-behavior limits, mean ±
    2.66·mean(MR): the ops-review screen that separates routine
    variation from special-cause days. Complements the detectors the
    repo already has: CUSUM finds a persistent SHIFT, MAD flags
    outliers against a static distribution, XmR gives running
    CONTROL LIMITS calibrated by short-term (day-to-day) variation —
    the classic trio.

    Exactness: daily revenue and moving ranges are DECIMAL(18,2)
    exact (abs-difference of exact decimals); the means are exact
    sums divided once; limits are one fixed IEEE chain, and every
    day's over/under comparison sees bit-identical doubles in both
    engines, so the flag counts are exact integers. Reported values
    are pinned DECIMAL(18,6) at the end only.

    Plan: one scan → daily aggregate; LAG and the limit comparison
    run over the ~#days frame — tiny BY CONSTRUCTION."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("xmr_orders")
    return spark.sql(_xmr_sql("xmr_orders", "BIGINT"))


# ---- A/B effect sizes + minimum detectable effect -------------------------


def _effect_sql(h_expr: str, bigint: str) -> str:
    """Shared effect-size text; only the 60-bit hash spelling and the
    BIGINT cast differ by dialect. z-constants are fixed literals:
    1.959964 (alpha=.05 two-sided) and 0.841621 (80% power)."""
    return f"""
    WITH per_user AS (
      SELECT user_id, SUM(CAST(value AS DECIMAL(18,6))) AS rev
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
      GROUP BY user_id
    ),
    armed AS (
      SELECT rev, {h_expr} % 2 AS arm FROM per_user
    ),
    mo AS (
      SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS {bigint})
               AS n0,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS {bigint})
               AS n1,
             SUM(CASE WHEN arm = 0 THEN rev ELSE CAST(0 AS DECIMAL(18,6))
                 END) AS s0,
             SUM(CASE WHEN arm = 1 THEN rev ELSE CAST(0 AS DECIMAL(18,6))
                 END) AS s1,
             SUM(CASE WHEN arm = 0
                 THEN CAST(rev AS DECIMAL(38,6)) * rev
                 ELSE CAST(0 AS DECIMAL(38,6)) END) AS q0,
             SUM(CASE WHEN arm = 1
                 THEN CAST(rev AS DECIMAL(38,6)) * rev
                 ELSE CAST(0 AS DECIMAL(38,6)) END) AS q1
      FROM armed
    ),
    d AS (
      SELECT n0, n1,
             CAST(s0 AS DOUBLE) / n0 AS m0,
             CAST(s1 AS DOUBLE) / n1 AS m1,
             sqrt(((CAST(q0 AS DOUBLE)
                     - (CAST(s0 AS DOUBLE) / n0) * CAST(s0 AS DOUBLE))
                   + (CAST(q1 AS DOUBLE)
                     - (CAST(s1 AS DOUBLE) / n1) * CAST(s1 AS DOUBLE)))
                  / (n0 + n1 - 2)) AS sp
      FROM mo
    )
    SELECT n0 AS n_arm_a, n1 AS n_arm_b,
           CAST(CAST(m0 AS DECIMAL(18,6)) AS DOUBLE) AS mean_a,
           CAST(CAST(m1 AS DECIMAL(18,6)) AS DOUBLE) AS mean_b,
           CAST(CAST((m1 - m0) / sp AS DECIMAL(18,6)) AS DOUBLE)
             AS cohens_d,
           CAST(CAST(
             (CAST(1 AS DOUBLE)
              - CAST(3 AS DOUBLE) / (4 * (n0 + n1 - 2) - 1))
             * ((m1 - m0) / sp)
             AS DECIMAL(18,6)) AS DOUBLE) AS hedges_g,
           CAST(CAST(
             (CAST(1.959964 AS DOUBLE) + CAST(0.841621 AS DOUBLE))
             * sp * sqrt(CAST(1 AS DOUBLE) / n0 + CAST(1 AS DOUBLE) / n1)
             AS DECIMAL(18,6)) AS DOUBLE) AS mde_80_power
    FROM d
    """


def _ab_effect_oracle() -> str:
    from .textops import hash60_duck

    return _effect_sql(
        hash60_duck("CAST(user_id AS VARCHAR)"), "BIGINT"
    )


@query("events_ab_effect_sizes", oracle=_ab_effect_oracle())
def events_ab_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect sizes for the hash-bucketed A/B experiment
    — the DECISION-layer companion to ``events_ab_test_lift``'s Welch
    z: Cohen's d (pooled-SD standardized lift), Hedges' g (the
    small-sample bias correction J = 1 − 3/(4·df − 1)), and the
    minimum detectable effect at alpha=.05 / 80% power for the
    CURRENT arm sizes ((z_α + z_β)·s_p·√(1/n₀+1/n₁)) — the number
    that says whether the experiment was even capable of seeing the
    lift it reports. Same deterministic 60-bit arm assignment as the
    lift readout, so the two rows describe the same experiment.

    Exactness: per-user revenues are exact decimal sums; arm moments
    are conditional DECIMAL aggregates in ONE pass (n, Σx as
    DECIMAL(18,6), Σx² as DECIMAL(38,6) — the r8 overflow-pin
    precedent); every statistic is one fixed IEEE chain over those
    exact moments, pinned DECIMAL(18,6). z-constants are shared
    literals, not an erf approximation (Spark has no erf; a CDF
    would diverge cross-engine).

    Plan: one scan → per-user agg → single-row conditional moment
    aggregate; the finishing arithmetic is a 1-row projection."""
    from .textops import hash60_spark

    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("effect_events")
    return spark.sql(
        _effect_sql(
            hash60_spark("CAST(user_id AS STRING)"), "BIGINT"
        ).replace("FROM events", "FROM effect_events")
    )


# ---- delta-method ratio-metric A/B readout ---------------------------------


def _delta_sql(h_expr: str, bigint: str) -> str:
    """Shared delta-method text. Per-user numerator x = exact decimal
    purchase revenue, denominator y = event count; one conditional
    moment pass per arm carries n, Σx, Σy, Σx², Σy², Σxy exactly."""
    return f"""
    WITH per_user AS (
      SELECT user_id,
             SUM(CASE WHEN event_type = 'purchase' AND value IS NOT NULL
                 THEN CAST(value AS DECIMAL(18,6))
                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS x,
             CAST(COUNT(*) AS {bigint}) AS y
      FROM events
      GROUP BY user_id
    ),
    armed AS (
      SELECT x, y, {h_expr} % 2 AS arm FROM per_user
    ),
    mo AS (
      SELECT arm,
             CAST(COUNT(*) AS {bigint}) AS n,
             SUM(x) AS sx,
             CAST(SUM(y) AS {bigint}) AS sy,
             SUM(CAST(x AS DECIMAL(38,6)) * x) AS qx,
             CAST(SUM(y * y) AS {bigint}) AS qy,
             SUM(CAST(x AS DECIMAL(38,6)) * y) AS qxy
      FROM armed
      GROUP BY arm
    ),
    d AS (
      SELECT arm, n,
             CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) AS r,
             ((CAST(qx AS DOUBLE)
                - (CAST(sx AS DOUBLE) / n) * CAST(sx AS DOUBLE))
              - 2 * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
                  * (CAST(qxy AS DOUBLE)
                     - (CAST(sx AS DOUBLE) / n) * CAST(sy AS DOUBLE))
              + (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
                * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
                * (CAST(qy AS DOUBLE)
                   - (CAST(sy AS DOUBLE) / n) * CAST(sy AS DOUBLE)))
             / (n - 1)
             / (n * (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
               AS se2
      FROM mo
    )
    SELECT a0.n AS n_arm_a, a1.n AS n_arm_b,
           CAST(CAST(a0.r AS DECIMAL(18,9)) AS DOUBLE) AS ratio_a,
           CAST(CAST(a1.r AS DECIMAL(18,9)) AS DOUBLE) AS ratio_b,
           CAST(CAST(a1.r - a0.r AS DECIMAL(18,9)) AS DOUBLE) AS diff,
           CAST(CAST(sqrt(a0.se2 + a1.se2) AS DECIMAL(18,9)) AS DOUBLE)
             AS se_delta,
           CAST(CAST((a1.r - a0.r) / sqrt(a0.se2 + a1.se2)
                AS DECIMAL(18,6)) AS DOUBLE) AS z_score,
           CAST(CAST((a1.r - a0.r)
                - 1.959964 * sqrt(a0.se2 + a1.se2)
                AS DECIMAL(18,9)) AS DOUBLE) AS ci_lo,
           CAST(CAST((a1.r - a0.r)
                + 1.959964 * sqrt(a0.se2 + a1.se2)
                AS DECIMAL(18,9)) AS DOUBLE) AS ci_hi
    FROM d a0 JOIN d a1 ON a0.arm = 0 AND a1.arm = 1
    """


def _delta_oracle() -> str:
    from .textops import hash60_duck

    return _delta_sql(hash60_duck("CAST(user_id AS VARCHAR)"), "BIGINT")


@query("events_ab_delta_method", oracle=_delta_oracle())
def events_ab_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method inference for the RATIO metric revenue-per-event —
    the A/B readout ``events_ab_test_lift``'s per-user mean cannot
    give: when the metric is ΣX/ΣY over users (revenue per exposure,
    clicks per view), the naive binomial/t variance is wrong because
    numerator and denominator are correlated within user and the
    randomization unit is the user, not the event. The fix is the
    standard first-order Taylor (delta-method) variance
    Var(X̄/Ȳ) ≈ (s²_x − 2R·s_xy + R²·s²_y)/(n·ȳ²) (Deng et al.'s
    practitioner formulation — public method), giving per-arm ratios,
    the diff, its delta SE, the z-score, and the 95% CI. Same 60-bit
    deterministic arm hash as the rest of the A/B family, so all
    four readouts describe one experiment.

    Exactness: per-user revenue is an exact DECIMAL(18,6) sum; the
    six arm moments are exact decimal/integer conditional aggregates
    in ONE pass (Σx² and Σxy ride DECIMAL(38,6), the r8 overflow
    precedent; Σy² stays integral); every statistic is one fixed IEEE
    chain over those exact moments, written once in the shared text —
    pinned DECIMAL(18,9) (ratios are small; 18,6 would eat the CI).

    Plan: one scan → per-user agg → 2-group moment aggregate →
    broadcast self-join of two 1-row arms → 1-row projection."""
    from .textops import hash60_spark

    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("delta_events")
    return spark.sql(
        _delta_sql(
            hash60_spark("CAST(user_id AS STRING)"), "BIGINT"
        ).replace("FROM events", "FROM delta_events")
    )


# ---- sequential probability ratio monitor ----------------------------------

SPRT_P0 = "0.25"  # design null conversion rate
SPRT_P1 = "0.30"  # design alternative (the MDE the test is powered for)


def _sprt_sql(
    h_expr: str, bigint: str, per_user_select: str | None = None
) -> str:
    """Shared Wald-SPRT text: day-0 conversion per user, treatment
    arm only, cumulative log-likelihood ratio by first-seen day with
    ln(19)/−ln(19) boundaries (alpha = beta = 0.05).
    ``per_user_select`` lets the streaming face substitute its
    stateful aggregate's sink table for the inline per-user frame —
    the decision layer is the same text either way."""
    lr1 = f"ln(CAST({SPRT_P1} AS DOUBLE) / CAST({SPRT_P0} AS DOUBLE))"
    lr0 = (
        f"ln((1 - CAST({SPRT_P1} AS DOUBLE))"
        f" / (1 - CAST({SPRT_P0} AS DOUBLE)))"
    )
    per_user = per_user_select or """
      SELECT user_id,
             MIN(CAST(ts AS DATE)) AS d0,
             MIN(CASE WHEN event_type = 'purchase'
                 THEN CAST(ts AS DATE) END) AS dp
      FROM events
      GROUP BY user_id
    """
    return f"""
    WITH per_user AS (
      {per_user}
    ),
    armed AS (
      SELECT d0,
             CASE WHEN dp = d0 THEN 1 ELSE 0 END AS conv
      FROM per_user
      WHERE {h_expr} % 2 = 1
    ),
    daily AS (
      SELECT d0, CAST(COUNT(*) AS {bigint}) AS n,
             CAST(SUM(conv) AS {bigint}) AS c
      FROM armed GROUP BY d0
    ),
    cum AS (
      SELECT d0,
             CAST(SUM(n) OVER (ORDER BY d0) AS {bigint}) AS n_cum,
             CAST(SUM(c) OVER (ORDER BY d0) AS {bigint}) AS conv_cum
      FROM daily
    )
    SELECT CAST(d0 AS DATE) AS look_day, n_cum, conv_cum,
           CAST(CAST(
             conv_cum * {lr1} + (n_cum - conv_cum) * {lr0}
             AS DECIMAL(18,9)) AS DOUBLE) AS llr,
           CASE
             WHEN conv_cum * {lr1} + (n_cum - conv_cum) * {lr0}
                  >= ln(CAST(19 AS DOUBLE)) THEN 'accept_h1'
             WHEN conv_cum * {lr1} + (n_cum - conv_cum) * {lr0}
                  <= -ln(CAST(19 AS DOUBLE)) THEN 'accept_h0'
             ELSE 'continue'
           END AS decision
    FROM cum
    ORDER BY look_day
    """


def _sprt_oracle() -> str:
    from .textops import hash60_duck

    return _sprt_sql(hash60_duck("CAST(user_id AS VARCHAR)"), "BIGINT")


@query("events_ab_sequential_sprt", oracle=_sprt_oracle())
def events_ab_sequential_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald sequential probability ratio monitor over the treatment
    arm — the always-valid companion to the fixed-horizon A/B family:
    ``events_ab_test_lift`` is only valid read ONCE at the planned n,
    but dashboards are watched daily, and repeated peeking at a fixed
    z inflates false positives severalfold. Wald's SPRT (public
    method) is the classic sequential answer: against pinned design
    hypotheses p₀ = 0.25 vs p₁ = 0.30, the cumulative log-likelihood
    ratio C·ln(p₁/p₀) + (N−C)·ln((1−p₁)/(1−p₀)) may be compared to
    ln((1−β)/α) = ln 19 and ln(β/(1−α)) = −ln 19 after EVERY day with
    overall error rates still ≤ (α, β) = (.05, .05). One row per
    daily look: cumulative exposure, conversions, LLR, and the
    decision (accept_h1 / accept_h0 / continue). Conversion is
    day-0 purchase (decided by the end of the user's first-seen day),
    so no look ever reads data from after itself — the peeking-safe
    definition.

    Exactness: pure integer counting through ``cum`` (calendar-day
    cumulative window over a ≤#days frame — bounded by construction,
    the daily-series house convention); the LLR is integers times two
    ln literals, ONE IEEE chain written once in the shared text,
    pinned DECIMAL(18,9) (the ln-pin rule); boundary compares run on
    the identical raw chain in both engines, safely far from ties.

    Plan: one scan → per-user agg → per-day agg (≤31 rows) → window
    over the bounded day frame → projection. The per-user aggregate
    dominates; everything after is calendar-sized."""
    from .textops import hash60_spark

    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("sprt_events")
    return spark.sql(
        _sprt_sql(
            hash60_spark("CAST(user_id AS STRING)"), "BIGINT"
        ).replace("FROM events", "FROM sprt_events")
    )


# ---- stratified lift meta-analysis ------------------------------------------


def _meta_sql(h_expr: str, bigint: str, pct: str) -> str:
    """Shared fixed-effect meta-analysis text: strata = exact
    activity TERCILES of per-user event count (boundaries from the
    shared exact-percentile convention — Spark percentile ≡ DuckDB
    quantile_cont — pinned DECIMAL(18,6), membership a <=-CASE
    against the pinned doubles, the segment-migration precedent; the
    tercile rule stays meaningful at ANY scale factor where fixed
    count boundaries would collapse); per-stratum lift delta_k =
    p1 − p0 on day-0 conversion with binomial variance;
    inverse-variance pooling; Cochran's Q and I² for heterogeneity.
    Degenerate strata (an arm empty or a rate at 0/1 → zero
    variance) are excluded — stated convention."""
    return f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(COUNT(*) AS {bigint}) AS n_ev,
             CASE WHEN MIN(CASE WHEN event_type = 'purchase'
                           THEN CAST(ts AS DATE) END)
                       = MIN(CAST(ts AS DATE))
                  THEN 1 ELSE 0 END AS conv
      FROM events
      GROUP BY user_id
    ),
    bounds AS (
      SELECT CAST(CAST({pct}(n_ev, CAST(1 AS DOUBLE) / 3)
                  AS DECIMAL(18,6)) AS DOUBLE) AS t1,
             CAST(CAST({pct}(n_ev, CAST(2 AS DOUBLE) / 3)
                  AS DECIMAL(18,6)) AS DOUBLE) AS t2
      FROM per_user
    ),
    u AS (
      SELECT CASE WHEN p.n_ev <= b.t1 THEN 'low'
                  WHEN p.n_ev <= b.t2 THEN 'mid'
                  ELSE 'high' END AS wk,
             p.conv,
             {h_expr} % 2 AS arm
      FROM per_user p CROSS JOIN bounds b
    ),
    cells AS (
      SELECT wk,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS {bigint})
               AS n0,
             CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END)
                  AS {bigint}) AS c0,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS {bigint})
               AS n1,
             CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END)
                  AS {bigint}) AS c1
      FROM u GROUP BY wk
    ),
    strata AS (
      SELECT wk, n0, c0, n1, c1,
             CAST(CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0
                  AS DECIMAL(18,12)) AS delta_k,
             CAST(1 / ((CAST(c0 AS DOUBLE) / n0)
                       * (1 - CAST(c0 AS DOUBLE) / n0) / n0
                     + (CAST(c1 AS DOUBLE) / n1)
                       * (1 - CAST(c1 AS DOUBLE) / n1) / n1)
                  AS DECIMAL(28,12)) AS w_k
      FROM cells
      WHERE c0 > 0 AND c0 < n0 AND c1 > 0 AND c1 < n1
    ),
    terms AS (
      SELECT wk, n0 + n1 AS n_k, delta_k, w_k,
             CAST(CAST(w_k AS DOUBLE) * CAST(delta_k AS DOUBLE)
                  AS DECIMAL(28,12)) AS wd
      FROM strata
    ),
    s AS (
      SELECT CAST(COUNT(*) AS {bigint}) AS k,
             CAST(SUM(n_k) AS {bigint}) AS n_users,
             SUM(w_k) AS sw,
             SUM(wd) AS swd
      FROM terms
    ),
    q AS (
      SELECT SUM(CAST(
               CAST(t.w_k AS DOUBLE)
               * (CAST(t.delta_k AS DOUBLE)
                  - CAST(s.swd AS DOUBLE) / CAST(s.sw AS DOUBLE))
               * (CAST(t.delta_k AS DOUBLE)
                  - CAST(s.swd AS DOUBLE) / CAST(s.sw AS DOUBLE))
               AS DECIMAL(28,12))) AS q_stat
      FROM terms t CROSS JOIN s
    )
    SELECT s.k AS k_strata, s.n_users,
           CAST(CAST(CAST(s.swd AS DOUBLE) / CAST(s.sw AS DOUBLE)
                AS DECIMAL(18,12)) AS DOUBLE) AS pooled_lift,
           CAST(CAST(sqrt(1 / CAST(s.sw AS DOUBLE)) AS DECIMAL(18,12))
                AS DOUBLE) AS pooled_se,
           CAST(CAST(
             (CAST(s.swd AS DOUBLE) / CAST(s.sw AS DOUBLE))
             / sqrt(1 / CAST(s.sw AS DOUBLE))
             AS DECIMAL(18,6)) AS DOUBLE) AS pooled_z,
           CAST(CAST(q.q_stat AS DECIMAL(18,6)) AS DOUBLE)
             AS q_heterogeneity,
           s.k - 1 AS df,
           CAST(CAST(
             CASE WHEN CAST(q.q_stat AS DOUBLE) > 0
                  THEN GREATEST(CAST(0 AS DOUBLE),
                       (CAST(q.q_stat AS DOUBLE) - (s.k - 1))
                       / CAST(q.q_stat AS DOUBLE))
                  ELSE CAST(0 AS DOUBLE) END
             AS DECIMAL(18,6)) AS DOUBLE) AS i_squared
    FROM s CROSS JOIN q
    """


def _meta_oracle() -> str:
    from .textops import hash60_duck

    return _meta_sql(
        hash60_duck("CAST(user_id AS VARCHAR)"), "BIGINT", "quantile_cont"
    )


@query("events_ab_stratified_metaanalysis", oracle=_meta_oracle())
def events_ab_stratified_metaanalysis(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fixed-effect meta-analysis of the A/B lift across user
    strata — the readout that catches what ONE pooled number hides:
    per-stratum (exact activity terciles of per-user event count)
    day-0 conversion lifts are pooled by inverse-variance weights
    (the classic fixed-effect estimator), and Cochran's Q / I²
    quantify whether the strata AGREE — I² near 0 says the pooled
    lift is one story; I² high says the effect differs by engagement
    level (the classic heavy-user/light-user split) and the pooled
    number is an average over genuinely different effects. Completes
    the A/B family: lift (size), effect sizes (standardization),
    delta method (ratio metrics), SPRT (peeking), CUPED (variance
    reduction) — this one is HETEROGENEITY. Same 60-bit arm hash and
    day-0 conversion as its siblings, so all readouts describe one
    experiment.

    Exactness: per-stratum cells are exact integers; delta_k and its
    inverse-variance weight are single IEEE chains over identical
    doubles, pinned DECIMAL(18,12)/(28,12) BEFORE every cross-strata
    sum (decimal addition is order-insensitive); the pooled estimate
    re-enters Q as the same written-once chain; degenerate strata
    excluded by exact integer predicates. Outputs pinned.

    Plan: one scan → per-user aggregate; the tercile boundaries are
    one exact-percentile aggregate over that frame broadcast back
    (1-row cross join); then a 3-row stratum aggregate — everything
    after (weights, pooling, Q) runs on ≤3 rows with 1-row broadcast
    glue. No window."""
    from .textops import hash60_spark

    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("meta_events")
    return spark.sql(
        _meta_sql(
            hash60_spark("CAST(user_id AS STRING)"), "BIGINT", "percentile"
        ).replace("FROM events", "FROM meta_events")
    )


# ---- deterministic permutation test ---------------------------------------

PERM_REPS = 32


def _perm_sql(h_obs: str, h_perm: str, bigint: str, b_src: str) -> str:
    """Shared permutation-test text. ``h_obs`` hashes the user alone
    (the real A/B assignment), ``h_perm`` hashes (user, b) — each
    replicate relabels every user independently; ``b_src`` is the
    dialect's 0..B-1 generator."""
    diff = """ABS(
        CAST(CAST(CAST(s1 AS DOUBLE) / n1 AS DECIMAL(18,6)) AS DOUBLE)
        - CAST(CAST(CAST(s0 AS DOUBLE) / n0 AS DECIMAL(18,6)) AS DOUBLE)
      )"""
    return f"""
    WITH per_user AS (
      SELECT user_id, SUM(CAST(value AS DECIMAL(18,6))) AS rev
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
      GROUP BY user_id
    ),
    obs_mo AS (
      SELECT SUM(CASE WHEN {h_obs} % 2 = 0 THEN 1 ELSE 0 END) AS n0,
             SUM(CASE WHEN {h_obs} % 2 = 1 THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN {h_obs} % 2 = 0 THEN rev
                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS s0,
             SUM(CASE WHEN {h_obs} % 2 = 1 THEN rev
                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS s1
      FROM per_user
    ),
    obs AS (SELECT {diff} AS d_obs FROM obs_mo),
    reps AS (
      SELECT u.user_id, u.rev, b.b, {h_perm} % 2 AS arm
      FROM per_user u, ({b_src}) b
    ),
    rep_mo AS (
      SELECT b,
             SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
             SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN arm = 0 THEN rev
                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS s0,
             SUM(CASE WHEN arm = 1 THEN rev
                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS s1
      FROM reps GROUP BY b
    ),
    rep_d AS (
      SELECT b, {diff} AS d_b FROM rep_mo WHERE n0 > 0 AND n1 > 0
    )
    SELECT (SELECT CAST(COUNT(*) AS {bigint}) FROM rep_d) AS n_perms,
           CAST(CAST((SELECT d_obs FROM obs) AS DECIMAL(18,6))
                AS DOUBLE) AS observed_abs_diff,
           CAST((SELECT CAST(SUM(CASE WHEN d_b >= d_obs THEN 1 ELSE 0 END)
                 AS {bigint})
            FROM rep_d CROSS JOIN obs) AS {bigint}) AS n_as_extreme,
           CAST(CAST(
             (CAST(1 AS DOUBLE)
              + (SELECT SUM(CASE WHEN d_b >= d_obs THEN 1 ELSE 0 END)
                 FROM rep_d CROSS JOIN obs))
             / (CAST(1 AS DOUBLE) + (SELECT COUNT(*) FROM rep_d))
             AS DECIMAL(18,6)) AS DOUBLE) AS p_value
    """


def _perm_oracle() -> str:
    from .textops import hash60_duck

    return _perm_sql(
        hash60_duck("CAST(user_id AS VARCHAR)"),
        hash60_duck(
            "CAST(u.user_id AS VARCHAR) || '|' || CAST(b.b AS VARCHAR)"
        ),
        "BIGINT",
        f"SELECT unnest(range({PERM_REPS})) AS b",
    )


@query("stats_permutation_test", oracle=_perm_oracle())
def stats_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic permutation test for the A/B lift: is the
    observed |arm-mean difference| explainable by labeling alone?
    Each of the {PERM_REPS} replicates relabels EVERY user by a
    60-bit hash of (user, replicate) — the distribution-free
    significance check that needs no normality assumption, completing
    the experimentation kit (Welch z asserts asymptotics,
    ``events_ab_effect_sizes`` sizes the effect, this tests it
    exactly; p uses the add-one convention (1+k)/(1+B) so a zero
    count never claims p=0). Reproducible by construction: the same
    permutations on every run and engine — the
    ``stats_bootstrap_ci_mean`` hash-keyed-resampling pattern with
    relabeling instead of subsampling.

    Exactness: per-user revenues and per-replicate conditional sums
    are DECIMAL-exact; each mean is pinned DECIMAL(18,6) BEFORE the
    difference, so every d_b ≥ d_obs comparison sees bit-identical
    doubles in both engines — the count of as-extreme replicates is
    an exact integer.

    Plan: one scan → per-user agg → a ×{PERM_REPS} replicate explode
    of the per-user frame (|users|·B rows, partial-aggregated to B
    moment rows before anything wide) → 1-row finish. At 100 TB the
    explode rides the already-reduced per-user frame, never raw
    events."""
    from .textops import hash60_spark

    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("perm_events")
    return spark.sql(
        _perm_sql(
            hash60_spark("CAST(user_id AS STRING)"),
            hash60_spark(
                "CAST(u.user_id AS STRING) || '|' || CAST(b.b AS STRING)"
            ),
            "BIGINT",
            f"SELECT explode(sequence(0, {PERM_REPS - 1})) AS b",
        ).replace("FROM events", "FROM perm_events")
    )


# ---- day-of-week-adjusted anomaly screen -----------------------------------


def _dow_anom_sql(
    table: str, median_fn: str, med_res_fn: str, dow_fn: str, bigint: str
) -> str:
    """Shared seasonal-residual anomaly text: residual = daily rev −
    same-weekday median; fences = residual median ± 3·(1.4826·MAD)."""
    return f"""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             {dow_fn} AS dow,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DOUBLE) AS rev
      FROM {table} GROUP BY 1, 2
    ),
    seas AS (
      SELECT dow, {median_fn} AS dow_med FROM d GROUP BY dow
    ),
    res AS (
      SELECT d.day, d.rev, d.rev - s.dow_med AS r
      FROM d JOIN seas s ON s.dow = d.dow
    ),
    center AS (SELECT {med_res_fn.replace('XCOL', 'r')} AS med_r FROM res),
    absdev AS (
      SELECT res.day, res.rev, res.r,
             ABS(res.r - center.med_r) AS ad
      FROM res CROSS JOIN center
    ),
    mad AS (SELECT {med_res_fn.replace('XCOL', 'ad')} AS mad_r FROM absdev),
    fl AS (
      SELECT a.day, a.rev, a.r
      FROM absdev a CROSS JOIN center CROSS JOIN mad
      WHERE ABS(a.r - center.med_r)
            > CAST(3 AS DOUBLE) * (CAST(1.4826 AS DOUBLE) * mad.mad_r)
    )
    SELECT (SELECT CAST(COUNT(*) AS {bigint}) FROM res) AS n_days,
           (SELECT CAST(COUNT(*) AS {bigint}) FROM fl) AS n_anomalies,
           CAST(CAST((SELECT med_r FROM center) AS DECIMAL(18,6))
                AS DOUBLE) AS residual_median,
           CAST(CAST((SELECT mad_r FROM mad) AS DECIMAL(18,6))
                AS DOUBLE) AS residual_mad
    """


@query(
    "orders_dow_adjusted_anomalies",
    oracle=_dow_anom_sql(
        "orders",
        "quantile_cont(rev, 0.5)",
        "quantile_cont(XCOL, 0.5)",
        "isodow(CAST(o_orderdate AS DATE))",
        "BIGINT",
    ),
)
def orders_dow_adjusted_anomalies(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SEASONALLY-ADJUSTED anomaly screen on daily revenue: subtract
    each weekday's median (the day-of-week seasonal component — a
    Monday is only anomalous relative to Mondays), then apply robust
    MAD fences to the residuals. The missing middle between
    ``events_anomaly_mad`` (no seasonality — weekends flag as
    anomalies forever) and ``orders_seasonal_index`` (monthly shape,
    no anomaly verdict): the STL-lite screen an ops review actually
    runs on business metrics.

    Exactness: daily revenue is DECIMAL-exact cast once; weekday
    medians, the residual median, and the MAD are all the shared
    type-7 interpolation over bit-identical doubles; the fence
    comparison is a fixed chain with shared CAST literals (3,
    1.4826), so the flag count is an exact integer in both dialects.

    Plan: one scan → daily aggregate; everything downstream runs on
    the ~#days frame (tiny by construction) — two grouped medians and
    two global medians over ≤ n_days rows."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("dowanom_orders")
    return spark.sql(
        _dow_anom_sql(
            "dowanom_orders",
            "percentile(rev, 0.5D)",
            "percentile(XCOL, 0.5D)",
            "weekday(o_orderdate) + 1",
            "BIGINT",
        )
    )


# ---- exact average precision (PR-AUC companion) ----------------------------


def _ap_oracle() -> str:
    return f"""
    WITH scored AS (
      SELECT doc_id, {_en_score_duck()} AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    ranked AS (
      SELECT y,
             SUM(1) OVER (ORDER BY s DESC, doc_id) AS k,
             SUM(y) OVER (ORDER BY s DESC, doc_id) AS cum_y
      FROM scored
    ),
    terms AS (
      SELECT CAST(CAST(cum_y AS DOUBLE) / k AS DECIMAL(18,9)) AS p_at_k
      FROM ranked WHERE y = 1
    ),
    tot AS (SELECT SUM(y)::BIGINT AS r, COUNT(*)::BIGINT AS n FROM scored)
    SELECT tot.n AS n_docs,
           tot.r AS n_relevant,
           CAST(CAST(
             CAST(SUM(t.p_at_k) AS DOUBLE) / tot.r
             AS DECIMAL(18,9)) AS DOUBLE) AS average_precision
    FROM terms t CROSS JOIN tot
    GROUP BY tot.n, tot.r
    """


@query("eval_average_precision", oracle=_ap_oracle())
def eval_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AVERAGE PRECISION (the area under the precision-recall
    curve by the step-function convention) of the en-marker detector —
    the eval that matters when positives are rare and ROC-AUC
    (``eval_auc_language_detector``) flatters: AP weights each
    relevant doc by the precision AT ITS OWN RANK, so early false
    positives cost visibly. Deterministic total order (score DESC,
    doc_id) makes every rank — and therefore AP itself — exact and
    engine-agreed, the same tie policy as the calibration bins.

    Exactness: ranks and cumulative-relevant counts are exact
    integers from the range-exchange prefix; each P@k term is one
    exact-int division pinned DECIMAL(18,9); their sum is exact; one
    final division by R, pinned.

    Plan: tokenize scan → range-exchange prefix over the (−score,
    doc_id) order carrying (1, y) weights — per-doc rank WITHOUT a
    single-partition window — then a 1-row reduce. The corpus-scale
    frame passes through exactly one range exchange."""
    d = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        f"-({_en_score_spark()}) AS neg_s",
        "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y",
    ).withColumn("one", F.lit(1))
    cum = _range_prefix(d, ["neg_s", "doc_id"], ["one", "y"])
    terms = cum.filter(F.col("y") == 1).select(
        F.expr(
            "CAST(CAST(cum_y AS DOUBLE) / cum_one AS DECIMAL(18,9))"
        ).alias("p_at_k")
    )
    tot = d.agg(
        F.sum("y").alias("r"), F.count(F.lit(1)).alias("n")
    )
    return (
        terms.agg(F.sum("p_at_k").alias("sp"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n").alias("n_docs"),
            F.col("r").alias("n_relevant"),
            F.expr(
                "CAST(CAST(CAST(sp AS DOUBLE) / r AS DECIMAL(18,9))"
                " AS DOUBLE)"
            ).alias("average_precision"),
        )
    )


# ---- Kruskal–Wallis k-group rank test --------------------------------------


def _kw_sql(table: str, bigint: str) -> str:
    """Shared Kruskal–Wallis text. The rank machinery is the
    ``stats_mannwhitney_value`` integral-tie trick generalized to k
    groups: per distinct value, 2×avg_rank = 2·cum_before + t + 1
    exactly, so each group's doubled rank sum 2R_g is an exact
    BIGINT; (2R_g)² is squared in DOUBLE (correctly rounded on
    identical inputs), each group's term pinned DECIMAL(18,9) before
    the k-row sum so the 5-term addition is order-insensitive."""
    return f"""
    WITH byv AS (
      SELECT o_totalprice AS v, o_orderpriority AS grp,
             CAST(COUNT(*) AS {bigint}) AS n_gv
      FROM {table} GROUP BY 1, 2
    ),
    byval AS (
      SELECT v, CAST(SUM(n_gv) AS {bigint}) AS t FROM byv GROUP BY 1
    ),
    cum AS (
      SELECT v, t, SUM(t) OVER (ORDER BY v) AS cum_t FROM byval
    ),
    terms AS (
      SELECT byv.grp,
             byv.n_gv,
             byv.n_gv * (2 * (cum.cum_t - cum.t) + cum.t + 1)
               AS r2_term
      FROM byv JOIN cum ON byv.v = cum.v
    ),
    g AS (
      SELECT grp,
             CAST(SUM(n_gv) AS {bigint}) AS n_g,
             CAST(SUM(r2_term) AS {bigint}) AS r2_g
      FROM terms GROUP BY grp
    ),
    gterm AS (
      SELECT grp, n_g,
             CAST(CAST(r2_g AS DOUBLE) * CAST(r2_g AS DOUBLE)
                  / (4 * CAST(n_g AS DOUBLE)) AS DECIMAL(38,9))
               AS sq_over_n
      FROM g
    ),
    ties AS (
      SELECT CAST(SUM(t) AS {bigint}) AS n,
             CAST(SUM(t * t * t - t) AS {bigint}) AS tie3
      FROM byval
    ),
    mo AS (
      SELECT CAST(COUNT(*) AS {bigint}) AS k,
             CAST(SUM(sq_over_n) AS DOUBLE) AS s
      FROM gterm
    )
    SELECT ties.n AS n_total, mo.k AS n_groups,
           mo.k - 1 AS df,
           CAST(CAST(
             (CAST(12 AS DOUBLE) * mo.s
                / (CAST(ties.n AS DOUBLE) * (ties.n + 1))
              - CAST(3 AS DOUBLE) * (ties.n + 1))
             / (CAST(1 AS DOUBLE)
                - CAST(ties.tie3 AS DOUBLE)
                  / (CAST(ties.n AS DOUBLE) * CAST(ties.n AS DOUBLE)
                     * CAST(ties.n AS DOUBLE) - ties.n))
             AS DECIMAL(18,6)) AS DOUBLE) AS h_stat
    FROM mo CROSS JOIN ties
    """


@query(
    "stats_kruskal_wallis_priority",
    oracle=_kw_sql("orders", "BIGINT"),
)
def stats_kruskal_wallis_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tie-corrected Kruskal–Wallis H: do the five order priorities
    draw total price from the same distribution? The k-group
    rank-based sibling of ``stats_anova_priority_price`` (which
    compares MEANS and is tail-sensitive) and the generalization of
    ``stats_mannwhitney_value`` from 2 to k groups — the standard
    screen before trusting a parametric ANOVA on skewed money.
    H = 12/(N(N+1)) · Σ R_g²/n_g − 3(N+1), divided by the tie
    correction 1 − Σ(t³−t)/(N³−N); H ~ χ²(k−1) under the null.

    Exactness: doubled rank sums 2R_g stay exact BIGINTs via the
    2·cum_before + t + 1 identity; each (2R_g)²/(4n_g) is one double
    product pinned DECIMAL(38,9) so the k-term sum is
    order-insensitive; N³−N is computed in DOUBLE (N³ would overflow
    BIGINT already at TPC-H sf10's 1.5e7 orders: N³ ≈ 3.4e21 >
    BIGINT's 9.2e18).

    Plan: one scan → (value, grp) hash agg; running rank totals via
    the range-exchange prefix (distinct prices are corpus-scale — a
    global window here would be the scale bug); a value-keyed join
    back; k-row and 1-row finishes."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("v"),
        F.col("o_orderpriority").alias("grp"),
    )
    byv = o.groupBy("v", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gv")
    )
    byval = byv.groupBy("v").agg(
        F.sum("n_gv").cast("bigint").alias("t")
    )
    cum = _range_prefix(byval, ["v"], ["t"])
    terms = byv.join(cum.select("v", "t", "cum_t"), "v").select(
        "grp",
        "n_gv",
        (
            F.col("n_gv")
            * (2 * (F.col("cum_t") - F.col("t")) + F.col("t") + 1)
        ).alias("r2_term"),
    )
    g = terms.groupBy("grp").agg(
        F.sum("n_gv").cast("bigint").alias("n_g"),
        F.sum("r2_term").cast("bigint").alias("r2_g"),
    )
    gterm = g.select(
        "grp",
        "n_g",
        F.expr(
            "CAST(CAST(r2_g AS DOUBLE) * CAST(r2_g AS DOUBLE)"
            " / (4 * CAST(n_g AS DOUBLE)) AS DECIMAL(38,9))"
        ).alias("sq_over_n"),
    )
    ties = byval.agg(
        F.sum("t").cast("bigint").alias("n"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie3"),
    )
    mo = gterm.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("sq_over_n").cast("double").alias("s"),
    )
    return mo.crossJoin(F.broadcast(ties)).selectExpr(
        "n AS n_total",
        "k AS n_groups",
        "k - 1 AS df",
        """CAST(CAST(
             (CAST(12 AS DOUBLE) * s
                / (CAST(n AS DOUBLE) * (n + 1))
              - CAST(3 AS DOUBLE) * (n + 1))
             / (CAST(1 AS DOUBLE)
                - CAST(tie3 AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                     * CAST(n AS DOUBLE) - n))
             AS DECIMAL(18,6)) AS DOUBLE) AS h_stat""",
    )


# ---- Jarque–Bera normality test --------------------------------------------


def _jb_sql(table: str, bigint: str) -> str:
    """Shared Jarque–Bera text: raw power sums are exact DECIMALs
    (each row's v², v³, v⁴ is a correctly-rounded double product
    pinned to a fixed scale before summing, so the sums are
    order-insensitive); the central-moment / skewness / kurtosis
    algebra is ONE fixed IEEE chain written identically in both
    dialects, each output pinned DECIMAL(18,6)."""
    return f"""
    WITH x AS (
      SELECT CAST(value AS DOUBLE) AS v
      FROM {table}
      WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    s AS (
      SELECT CAST(COUNT(*) AS {bigint}) AS n,
             CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(v * v AS DECIMAL(38,6))) AS DOUBLE) AS s2,
             CAST(SUM(CAST(v * v * v AS DECIMAL(38,6))) AS DOUBLE)
               AS s3,
             CAST(SUM(CAST(v * v * v * v AS DECIMAL(38,6)))
                  AS DOUBLE) AS s4
      FROM x
    ),
    m AS (
      SELECT n,
             s2 / n - (s1 / n) * (s1 / n) AS m2,
             s3 / n
               - CAST(3 AS DOUBLE) * (s1 / n) * (s2 / n)
               + CAST(2 AS DOUBLE) * (s1 / n) * (s1 / n) * (s1 / n)
               AS m3,
             s4 / n
               - CAST(4 AS DOUBLE) * (s1 / n) * (s3 / n)
               + CAST(6 AS DOUBLE) * (s1 / n) * (s1 / n) * (s2 / n)
               - CAST(3 AS DOUBLE) * (s1 / n) * (s1 / n)
                 * (s1 / n) * (s1 / n)
               AS m4
      FROM s
    ),
    gg AS (
      SELECT n,
             CAST(CAST(m3 / (sqrt(m2) * m2) AS DECIMAL(18,9))
                  AS DOUBLE) AS g1,
             CAST(CAST(m4 / (m2 * m2) - 3 AS DECIMAL(18,9))
                  AS DOUBLE) AS g2
      FROM m
    )
    SELECT n AS n_values,
           CAST(CAST(g1 AS DECIMAL(18,6)) AS DOUBLE) AS skewness,
           CAST(CAST(g2 AS DECIMAL(18,6)) AS DOUBLE)
             AS excess_kurtosis,
           CAST(CAST(
             CAST(n AS DOUBLE) / 6
               * (g1 * g1 + g2 * g2 / 4)
             AS DECIMAL(18,6)) AS DOUBLE) AS jb_stat
    FROM gg
    """


@query(
    "stats_jarque_bera_value",
    oracle=_jb_sql("events", "BIGINT"),
)
def stats_jarque_bera_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Jarque–Bera normality test on purchase values: JB =
    n/6·(g₁² + g₂²/4) with g₁ the moment skewness and g₂ the excess
    kurtosis — JB ~ χ²(2) under normality (Jarque & Bera 1980, the
    standard regression-residual normality screen). The
    moments-based gate that tells you whether the Welch/z machinery
    elsewhere (``events_ab_test_lift``) leans on a normality
    assumption the data visibly violates — purchase values are
    price-like and right-skewed, exactly what this flags.

    Exactness: four raw power sums as exact DECIMAL aggregates (each
    row's power is one correctly-rounded double product pinned to a
    fixed scale BEFORE summing — the ``events_ab_test_lift``
    DECIMAL(38,6) overflow pin, extended to cubes and fourth
    powers); the central-moment algebra is one fixed IEEE chain on
    those identical doubles; g₁ and g₂ are pinned DECIMAL(18,9)
    before they feed JB so the squaring sees identical inputs.

    Plan: ONE scan → a single partial+final hash aggregate carrying
    the four power sums — no shuffle wider than one row, no second
    pass (the textbook mean-then-deviations formulation would scan
    twice). Scale-free finish."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("jb_events")
    return spark.sql(_jb_sql("jb_events", "BIGINT"))


# ---- Benjamini–Hochberg FDR screen ------------------------------------------


def _norm_p_two_sided(z_col: str) -> str:
    """Two-sided normal p-value 2·(1−Φ(|z|)) = 1 − erf(|z|/√2) as a
    fixed SQL chain, identical in both dialects. erf uses the
    Abramowitz–Stegun 7.1.26 polynomial (|error| < 1.5e-7, far below
    the DECIMAL(18,9) pin): t = 1/(1+0.3275911·x),
    erf(x) ≈ 1 − poly(t)·e^{−x²}. exp is the one libm call — its
    output is pinned DECIMAL(18,12) before the polynomial multiply so
    a final-ulp exp disagreement is rounded away (the ln-pin rule,
    applied to exp)."""
    x = f"(abs({z_col}) / sqrt(CAST(2 AS DOUBLE)))"
    t = f"(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + CAST(0.3275911 AS DOUBLE) * {x}))"
    poly = (
        f"((((( CAST(1.061405429 AS DOUBLE) * {t}"
        f" + CAST(-1.453152027 AS DOUBLE)) * {t}"
        f" + CAST(1.421413741 AS DOUBLE)) * {t}"
        f" + CAST(-0.284496736 AS DOUBLE)) * {t}"
        f" + CAST(0.254829592 AS DOUBLE)) * {t})"
    )
    e = f"CAST(CAST(exp(-({x} * {x})) AS DECIMAL(18,12)) AS DOUBLE)"
    return f"CAST(CAST({poly} * {e} AS DECIMAL(18,9)) AS DOUBLE)"


def _bhfdr_sql(table: str, isodow_wd: str, bigint: str) -> str:
    return f"""
    WITH days AS (
      SELECT CAST(ts AS DATE) AS day,
             MAX(CASE WHEN {isodow_wd} THEN 1 ELSE 0 END) AS is_wd
      FROM {table} GROUP BY 1
    ),
    expo AS (
      SELECT CAST(SUM(is_wd) AS {bigint}) AS t1,
             CAST(SUM(1 - is_wd) AS {bigint}) AS t2
      FROM days
    ),
    cnt AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN {isodow_wd} THEN 1 ELSE 0 END)
                  AS {bigint}) AS x1,
             CAST(SUM(CASE WHEN {isodow_wd} THEN 0 ELSE 1 END)
                  AS {bigint}) AS x2
      FROM {table} GROUP BY 1
    ),
    zs AS (
      SELECT event_type, x1, x2,
             CAST(CAST(
               (CAST(x1 AS DOUBLE)
                  - (x1 + x2) * (CAST(t1 AS DOUBLE) / (t1 + t2)))
               / sqrt((x1 + x2) * (CAST(t1 AS DOUBLE) / (t1 + t2))
                      * (CAST(1 AS DOUBLE)
                         - CAST(t1 AS DOUBLE) / (t1 + t2)))
               AS DECIMAL(18,6)) AS DOUBLE) AS z
      FROM cnt CROSS JOIN expo
    ),
    ps AS (
      SELECT event_type, x1, x2, z,
             {_norm_p_two_sided('z')} AS p_value,
             CAST(COUNT(*) OVER () AS {bigint}) AS m
      FROM zs
    ),
    ranked AS (
      SELECT event_type, x1, x2, z, p_value, m,
             CAST(ROW_NUMBER() OVER (ORDER BY p_value, event_type)
                  AS {bigint}) AS i
      FROM ps
    ),
    stepped AS (
      SELECT event_type, x1, x2, z, p_value, i, m,
             MIN(p_value * m / i) OVER (
               ORDER BY i DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS q_raw
      FROM ranked
    )
    SELECT event_type,
           x1 AS n_weekday, x2 AS n_weekend, z AS z_stat,
           p_value,
           CAST(CAST(
             CASE WHEN q_raw > 1 THEN CAST(1 AS DOUBLE) ELSE q_raw END
             AS DECIMAL(18,9)) AS DOUBLE) AS q_value,
           CAST(CASE WHEN q_raw <= CAST(0.05 AS DOUBLE)
                THEN 1 ELSE 0 END AS INT) AS reject_05
    FROM stepped
    """


@query(
    "stats_bh_fdr_event_rates",
    oracle=_bhfdr_sql(
        "events", "isodow(CAST(ts AS TIMESTAMP)) <= 5", "BIGINT"
    ),
)
def stats_bh_fdr_event_rates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Benjamini–Hochberg FDR correction across a FAMILY of tests —
    one weekday-vs-weekend Poisson rate z-test per event type
    (the ``events_poisson_rate_test`` machinery, fanned out), then
    the BH step-up: rank p-values ascending, qᵢ = min_{j≥i} pⱼ·m/j
    capped at 1 (Benjamini & Hochberg 1995). The multiple-testing
    face the per-test operators lack: run 5 screens at α=.05 and
    ~1-in-4 null families produce a false alarm; BH controls the
    expected false-discovery RATE instead, which is what a
    curation pipeline monitoring dozens of segment drifts needs.

    Exactness: counts and exposures are exact integers; each z is
    one pinned chain; the normal p-value goes through the shared
    erf polynomial (A&S 7.1.26, error ≪ the pin) with the exp
    output pinned DECIMAL(18,12) — the ln-pin house rule applied to
    exp; the BH step-up is pure arithmetic + running min on pinned
    doubles, identical both sides.

    Plan: one scan for the day-exposure aggregate, one for per-type
    counts (partial+final hash aggs); everything after is over m =
    |event types| rows, so the global windows run on a frame tiny by
    construction (documented single-partition exception)."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("bhfdr_events")
    return spark.sql(
        _bhfdr_sql("bhfdr_events", "weekday(ts) <= 4", "BIGINT")
    )


# ---- Pettitt rank-based changepoint ----------------------------------------


def _pettitt_sql(table: str, bigint: str) -> str:
    """Shared Pettitt text over the daily order-count series. The
    U_t statistic stays INTEGRAL end to end: with average ranks,
    Σⱼ sgn(xⱼ − xₜ) = n + 1 − 2rₜ and 2rₜ = 2·cum_before + t + 1 is
    an exact BIGINT (the Mann–Whitney identity), so
    U_t = Σ_{s≤t} (n + 1 − 2r_s) is a running BIGINT sum; only the
    closing p-value approximation touches IEEE, with the exp output
    pinned DECIMAL(18,12) (the ln-pin rule applied to exp)."""
    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(COUNT(*) AS {bigint}) AS x
      FROM {table} GROUP BY 1
    ),
    byval AS (
      SELECT x, CAST(COUNT(*) AS {bigint}) AS t
      FROM daily GROUP BY 1
    ),
    cum AS (
      SELECT x, t, SUM(t) OVER (ORDER BY x) AS cum_t FROM byval
    ),
    tot AS (SELECT CAST(SUM(t) AS {bigint}) AS n FROM byval),
    scored AS (
      SELECT d.day,
             tot.n,
             tot.n + 1 - (2 * (cum.cum_t - cum.t) + cum.t + 1)
               AS v_t
      FROM daily d JOIN cum ON d.x = cum.x CROSS JOIN tot
    ),
    u AS (
      SELECT day, n,
             CAST(SUM(v_t) OVER (
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS {bigint}) AS u_t
      FROM scored
    ),
    best AS (
      SELECT day, n, u_t,
             CASE WHEN u_t < 0 THEN -u_t ELSE u_t END AS k
      FROM u
      ORDER BY CASE WHEN u_t < 0 THEN -u_t ELSE u_t END DESC, day ASC
      LIMIT 1
    )
    SELECT n AS n_days,
           k AS k_stat,
           day AS change_day,
           CAST(CAST(
             CASE WHEN
               CAST(2 AS DOUBLE)
                 * CAST(CAST(exp(
                     CAST(-6 AS DOUBLE) * CAST(k AS DOUBLE)
                       * CAST(k AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                          * CAST(n AS DOUBLE)
                          + CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                   ) AS DECIMAL(18,12)) AS DOUBLE) > 1
             THEN CAST(1 AS DOUBLE)
             ELSE CAST(2 AS DOUBLE)
                 * CAST(CAST(exp(
                     CAST(-6 AS DOUBLE) * CAST(k AS DOUBLE)
                       * CAST(k AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                          * CAST(n AS DOUBLE)
                          + CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                   ) AS DECIMAL(18,12)) AS DOUBLE)
             END
             AS DECIMAL(18,9)) AS DOUBLE) AS p_approx
    FROM best
    """


@query(
    "stats_pettitt_changepoint",
    oracle=_pettitt_sql("orders", "BIGINT"),
)
def stats_pettitt_changepoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pettitt rank-based changepoint test on the daily order-count
    series: Uₜ = Σ_{i≤t}Σ_{j>t} sgn(xⱼ−xᵢ), K = max|Uₜ|, with the
    classic p ≈ 2·exp(−6K²/(n³+n²)) (Pettitt 1979). The RANK-based
    sibling of ``events_cusum_changepoint`` — CUSUM finds mean shifts
    but a single outlier day can drag it; Pettitt is the
    Mann–Whitney statistic swept over every split point, so it is
    distribution-free and outlier-robust, and it comes with a
    significance readout the CUSUM screen lacks.

    Exactness: the naive double sum is O(days²); the identity
    Uₜ − Uₜ₋₁ = Σⱼ sgn(xⱼ−xₜ) = n+1−2rₜ (tie-averaged ranks, the
    ``stats_mannwhitney_value`` integral machinery) makes Uₜ a
    running BIGINT sum — zero float arithmetic until the final
    pinned exp.

    Plan: the corpus collapses to ~#days rows in one scan+agg;
    ranks and the running Uₜ run global windows over that
    tiny-by-construction daily frame (documented single-partition
    exception, same budget as the CUSUM/runs-test siblings); a
    TopK-1 finish."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("pettitt_orders")
    return spark.sql(_pettitt_sql("pettitt_orders", "BIGINT"))


# ---- Ljung–Box portmanteau test --------------------------------------------

LJUNG_BOX_MAX_LAG = 7


def _ljungbox_sql(table: str, bigint: str, lags_src: str) -> str:
    """Shared Ljung–Box text: per-lag autocorrelations are the
    calendar-aligned lag-Pearson of ``orders_daily_autocorrelation``
    (exact BIGINT moments, one pinned chain per lag — the documented
    convention; textbook LB uses the full-series mean, this uses the
    pairwise one, identically in both engines); each lag's Q term
    rₖ²/(n−k) is pinned DECIMAL(18,12) so the 7-term sum is
    order-insensitive."""
    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(COUNT(*) AS {bigint}) AS n
      FROM {table} GROUP BY 1
    ),
    nn AS (SELECT CAST(COUNT(*) AS {bigint}) AS nd FROM daily),
    lags AS ({lags_src}),
    pairs AS (
      SELECT l.lag, a.n AS x, b.n AS y
      FROM lags l
      JOIN daily a ON TRUE
      JOIN daily b ON b.day = a.day + l.lag * INTERVAL 1 DAY
    ),
    s AS (
      SELECT lag,
             CAST(COUNT(*) AS {bigint}) AS np,
             CAST(SUM(x) AS {bigint}) AS sx,
             CAST(SUM(y) AS {bigint}) AS sy,
             CAST(SUM(x*y) AS {bigint}) AS sxy,
             CAST(SUM(x*x) AS {bigint}) AS sxx,
             CAST(SUM(y*y) AS {bigint}) AS syy
      FROM pairs GROUP BY lag
    ),
    r AS (
      SELECT lag,
             CAST(CAST(
               CAST(np*sxy - sx*sy AS DOUBLE)
               / sqrt(CAST(np*sxx - sx*sx AS DOUBLE)
                      * CAST(np*syy - sy*sy AS DOUBLE))
               AS DECIMAL(18,9)) AS DOUBLE) AS acf
      FROM s
    ),
    terms AS (
      SELECT lag,
             CAST(acf * acf / (nn.nd - lag) AS DECIMAL(18,12))
               AS q_term
      FROM r CROSS JOIN nn
    )
    SELECT nn.nd AS n_days,
           CAST({LJUNG_BOX_MAX_LAG} AS {bigint}) AS max_lag,
           CAST({LJUNG_BOX_MAX_LAG} AS {bigint}) AS df,
           CAST(CAST(
             CAST(nn.nd AS DOUBLE) * (nn.nd + 2)
               * CAST(SUM(q_term) AS DOUBLE)
             AS DECIMAL(18,6)) AS DOUBLE) AS q_stat
    FROM terms CROSS JOIN nn
    GROUP BY nn.nd
    """


@query(
    "stats_ljung_box_daily",
    oracle=_ljungbox_sql(
        "orders",
        "BIGINT",
        f"SELECT unnest(range(1, {LJUNG_BOX_MAX_LAG + 1}))::BIGINT AS lag",
    ),
)
def stats_ljung_box_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ljung–Box portmanteau test on the daily order-count series:
    Q = n(n+2)·Σₖ rₖ²/(n−k) over lags 1..7, Q ~ χ²(7) under "no
    autocorrelation at any lag" (Ljung & Box 1978). The ONE-NUMBER
    verdict on top of ``orders_daily_autocorrelation``'s per-lag
    table — the gate a forecasting pipeline checks before treating
    residuals as white noise, and the whiteness test for the
    seasonal-naive backtest residuals family.

    Exactness: per-lag autocorrelations from exact BIGINT moment
    sums (the ACF convention: calendar-aligned lag-Pearson, stated
    in the shared text), pinned DECIMAL(18,9); each Q term pinned
    DECIMAL(18,12) before the 7-row sum so the sum is
    order-insensitive; one closing chain pinned DECIMAL(18,6).

    Plan: one scan collapses the corpus to ~#days rows; the lag
    expansion (≤7·days rows), per-lag aggregate, and 7-row finish
    are all corpus-independent."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("ljungbox_orders")
    return spark.sql(
        _ljungbox_sql(
            "ljungbox_orders",
            "BIGINT",
            "SELECT CAST(id AS BIGINT) AS lag FROM"
            f" range(1, {LJUNG_BOX_MAX_LAG + 1})",
        )
    )


# ---- Theil inequality decomposition ----------------------------------------


def _theil_sql(orders: str, customer: str, bigint: str) -> str:
    """Shared Theil-T text. Per-customer revenues are exact DECIMAL
    sums; μ, μ_g are single divisions of exact aggregates (identical
    doubles both sides); every ln output is pinned DECIMAL(18,9) and
    every per-row/per-group term pinned DECIMAL(18,12) BEFORE its
    sum, so the corpus-sized and group-sized summations are
    order-insensitive."""
    return f"""
    WITH cx AS (
      SELECT o.o_custkey AS custkey, c.c_nationkey AS nation,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6)))
                  AS DOUBLE) AS x
      FROM {orders} o JOIN {customer} c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS {bigint}) AS n,
             CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx
      FROM cx
    ),
    grp AS (
      SELECT nation,
             CAST(COUNT(*) AS {bigint}) AS n_g,
             CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx_g
      FROM cx GROUP BY 1
    ),
    rowterms AS (
      SELECT cx.nation,
             CAST((cx.x / (tot.sx / tot.n))
               * CAST(CAST(ln(cx.x / (tot.sx / tot.n))
                      AS DECIMAL(18,9)) AS DOUBLE)
               AS DECIMAL(18,12)) AS t_term,
             CAST((cx.x / (grp.sx_g / grp.n_g))
               * CAST(CAST(ln(cx.x / (grp.sx_g / grp.n_g))
                      AS DECIMAL(18,9)) AS DOUBLE)
               AS DECIMAL(18,12)) AS w_term
      FROM cx
      JOIN grp ON grp.nation = cx.nation
      CROSS JOIN tot
    ),
    within_g AS (
      SELECT r.nation,
             CAST((CAST(g.sx_g AS DOUBLE) / t.sx)
               * (CAST(SUM(r.w_term) AS DOUBLE) / g.n_g)
               AS DECIMAL(18,12)) AS w_g
      FROM rowterms r
      JOIN grp g ON g.nation = r.nation
      CROSS JOIN tot t
      GROUP BY r.nation, g.sx_g, g.n_g, t.sx
    ),
    between_g AS (
      SELECT g.nation,
             CAST((CAST(g.sx_g AS DOUBLE) / t.sx)
               * CAST(CAST(ln(
                   (g.sx_g / g.n_g) / (t.sx / t.n)
                 ) AS DECIMAL(18,9)) AS DOUBLE)
               AS DECIMAL(18,12)) AS b_g
      FROM grp g CROSS JOIN tot t
    ),
    agg AS (
      SELECT
        (SELECT CAST(CAST(CAST(SUM(t_term) AS DOUBLE) / tot.n
                AS DECIMAL(18,9)) AS DOUBLE)
           FROM rowterms CROSS JOIN tot GROUP BY tot.n) AS theil_total,
        (SELECT CAST(CAST(CAST(SUM(w_g) AS DOUBLE)
                AS DECIMAL(18,9)) AS DOUBLE) FROM within_g)
          AS theil_within,
        (SELECT CAST(CAST(CAST(SUM(b_g) AS DOUBLE)
                AS DECIMAL(18,9)) AS DOUBLE) FROM between_g)
          AS theil_between
    )
    SELECT tot.n AS n_customers,
           (SELECT CAST(COUNT(*) AS {bigint}) FROM grp) AS n_groups,
           agg.theil_total, agg.theil_within, agg.theil_between,
           CAST(CAST(agg.theil_within + agg.theil_between
                AS DECIMAL(18,9)) AS DOUBLE) AS theil_recomposed
    FROM agg CROSS JOIN tot
    """


@query(
    "customer_theil_inequality",
    oracle=_theil_sql("orders", "customer", "BIGINT"),
)
def customer_theil_inequality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Theil-T inequality of per-customer revenue, DECOMPOSED within
    vs between nations: T = (1/n)Σ(xᵢ/μ)ln(xᵢ/μ), and exactly
    T = Σ_g s_g·T_g + Σ_g s_g·ln(μ_g/μ) with s_g the group revenue
    share (Theil 1967). The decomposability is the whole point and
    what ``customer_revenue_gini`` (not decomposable) and
    ``customer_nation_herfindahl`` (share concentration, not
    inequality) cannot answer: is revenue inequality a WITHIN-market
    phenomenon or a between-market one? ``theil_recomposed`` returns
    within+between so the identity is visible in the output (it
    matches ``theil_total`` to the pin).

    Exactness: per-customer revenues are exact DECIMAL sums; every
    ln rides the ln-of-exact-ratio pin (DECIMAL(18,9)); per-row and
    per-group terms are pinned DECIMAL(18,12) before their sums so
    corpus-order never matters.

    Plan: orders collapse to per-customer rows in one shuffle; the
    customer join brings the nation key (both sides custkey-keyed,
    one exchange each); the 25-row group frame broadcasts back onto
    the per-customer frame for the within terms; finishes are
    group-sized. No window anywhere."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    o.createOrReplaceTempView("theil_orders")
    c.createOrReplaceTempView("theil_customer")
    return spark.sql(
        _theil_sql("theil_orders", "theil_customer", "BIGINT")
    )


# ---- robust seasonal decomposition (median-based STL-lite) ------------------


def _rstl_sql(
    table: str, bigint: str, offsets_src: str, median: str, dow: str
) -> str:
    """Shared robust-decomposition text: trend = centered 7-day
    MEDIAN of the daily revenue (exact-percentile convention shared
    by Spark percentile / DuckDB quantile_cont, the
    ``agg_exact_percentiles`` anchor), seasonal = per-day-of-week
    median of the detrended series, remainder = the rest. Each
    component is pinned DECIMAL(18,6) the moment it is born so the
    downstream subtractions see identical doubles."""
    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                  AS DOUBLE) AS revenue
      FROM {table} GROUP BY 1
    ),
    offsets AS ({offsets_src}),
    neigh AS (
      SELECT a.day, b.revenue AS nb_rev
      FROM daily a
      JOIN offsets o ON TRUE
      JOIN daily b ON b.day = a.day + o.off * INTERVAL 1 DAY
    ),
    trend AS (
      SELECT day,
             CAST(COUNT(*) AS {bigint}) AS n_window,
             CAST(CAST({median.format(x="nb_rev")} AS DECIMAL(18,6))
                  AS DOUBLE) AS trend
      FROM neigh GROUP BY day
    ),
    detr AS (
      SELECT d.day, d.revenue, t.trend, t.n_window,
             CAST(CAST(d.revenue - t.trend AS DECIMAL(18,6))
                  AS DOUBLE) AS detrended
      FROM daily d JOIN trend t ON t.day = d.day
    ),
    seas AS (
      SELECT {dow} AS dow,
             CAST(CAST({median.format(x="detrended")}
                  AS DECIMAL(18,6)) AS DOUBLE) AS seasonal
      FROM detr GROUP BY 1
    )
    SELECT detr.day, detr.n_window, detr.revenue, detr.trend,
           seas.seasonal,
           CAST(CAST(detr.detrended - seas.seasonal AS DECIMAL(18,6))
                AS DOUBLE) AS remainder
    FROM detr JOIN seas ON seas.dow = {dow}
    """


@query(
    "orders_robust_stl_decompose",
    oracle=_rstl_sql(
        "orders",
        "BIGINT",
        "SELECT unnest(range(-3, 4))::BIGINT AS off",
        "quantile_cont({x}, 0.5)",
        "isodow(detr.day)",
    ),
)
def orders_robust_stl_decompose(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Robust seasonal decomposition of the daily revenue series —
    the median-based STL-lite: trend = centered 7-day rolling MEDIAN
    (edge days use their available window; ``n_window`` reports it),
    seasonal = per-day-of-week median of the detrended series,
    remainder = what's left. Medians, not means, so one
    flash-sale day bends neither the trend nor its weekday's
    seasonal (the robust counterpart of ``orders_seasonal_index``'s
    mean-ratio months, and the decomposition behind
    ``orders_dow_adjusted_anomalies``'s residual screen — here the
    components themselves are the output, per day).

    Exactness: daily revenues are exact DECIMAL sums; both medians
    ride the shared exact-percentile convention (Spark percentile ≡
    DuckDB quantile_cont, type-7 interpolation — the
    ``agg_exact_percentiles`` anchor); every component is pinned
    DECIMAL(18,6) before the next subtraction.

    Plan: the corpus collapses to ~#days rows in one scan+agg
    (persisted — the window join reads it twice); the ±3-offset
    expansion is 7 calendar equi-joins on that tiny frame (the ACF
    pattern — no range join, no window), the seasonal frame is 7
    rows broadcast back. Output ~#days rows, corpus-independent."""
    o = load_table(spark, sf_dir, "orders")
    daily = persist_tracked(
        o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))"
                " AS DOUBLE)"
            ).alias("revenue")
        )
    )
    daily.createOrReplaceTempView("rstl_daily")
    return spark.sql(
        f"""
    WITH offsets AS (SELECT CAST(id AS BIGINT) AS off FROM range(-3, 4)),
    neigh AS (
      SELECT a.day, b.revenue AS nb_rev
      FROM rstl_daily a
      JOIN offsets o ON TRUE
      JOIN rstl_daily b ON b.day = a.day + o.off * INTERVAL 1 DAY
    ),
    trend AS (
      SELECT day,
             CAST(COUNT(*) AS BIGINT) AS n_window,
             CAST(CAST(percentile(nb_rev, 0.5D) AS DECIMAL(18,6))
                  AS DOUBLE) AS trend
      FROM neigh GROUP BY day
    ),
    detr AS (
      SELECT d.day, d.revenue, t.trend, t.n_window,
             CAST(CAST(d.revenue - t.trend AS DECIMAL(18,6))
                  AS DOUBLE) AS detrended
      FROM rstl_daily d JOIN trend t ON t.day = d.day
    ),
    seas AS (
      SELECT weekday(detr.day) + 1 AS dow,
             CAST(CAST(percentile(detrended, 0.5D)
                  AS DECIMAL(18,6)) AS DOUBLE) AS seasonal
      FROM detr GROUP BY 1
    )
    SELECT detr.day, detr.n_window, detr.revenue, detr.trend,
           seas.seasonal,
           CAST(CAST(detr.detrended - seas.seasonal AS DECIMAL(18,6))
                AS DOUBLE) AS remainder
    FROM detr JOIN seas ON seas.dow = weekday(detr.day) + 1
    """
    )


# ---- Friedman blocked rank test ---------------------------------------------


def _friedman_sql(table: str, bigint: str, dow: str) -> str:
    """Shared Friedman text: blocks = complete ISO weeks (all 7 days
    traded) of the daily revenue series, treatments = the 7 weekdays.
    Within-block doubled ranks come from the 7×7 in-block sign
    comparison (2rᵢ = Σⱼ[xⱼ<xᵢ]·2 + Σⱼ[xⱼ=xᵢ] + 1, exact BIGINTs,
    tie-averaged by construction); the tie-general statistic
    Q = (k−1)·Σⱼ(2Rⱼ − n(k+1))² / (Σ(2r)² − nk(k+1)²) stays INTEGRAL
    until one final double division."""
    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(date_trunc('week', CAST(o_orderdate AS DATE))
                  AS DATE) AS wk,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                  AS DOUBLE) AS revenue
      FROM {table} GROUP BY 1, 2
    ),
    complete AS (
      SELECT wk FROM daily GROUP BY wk
      HAVING CAST(COUNT(*) AS {bigint}) = 7
    ),
    blocked AS (
      SELECT d.wk, {dow} AS dow, d.revenue
      FROM daily d JOIN complete c ON c.wk = d.wk
    ),
    ranked AS (
      SELECT a.wk, a.dow,
             CAST(SUM(CASE WHEN b.revenue < a.revenue THEN 2
                           WHEN b.revenue = a.revenue THEN 1
                           ELSE 0 END) + 1 AS {bigint}) AS r2
      FROM blocked a JOIN blocked b ON b.wk = a.wk
      GROUP BY a.wk, a.dow
    ),
    colsums AS (
      SELECT dow, CAST(SUM(r2) AS {bigint}) AS r2_j
      FROM ranked GROUP BY dow
    ),
    nb AS (
      SELECT CAST(COUNT(*) AS {bigint}) AS n FROM complete
    ),
    num AS (
      SELECT CAST(SUM((r2_j - nb.n * 8) * (r2_j - nb.n * 8))
                  AS {bigint}) AS s_num
      FROM colsums CROSS JOIN nb GROUP BY nb.n
    ),
    den AS (
      SELECT CAST(SUM(r2 * r2) AS {bigint}) AS sum_r2sq FROM ranked
    )
    SELECT nb.n AS n_weeks,
           CAST(7 AS {bigint}) AS k_treatments,
           CAST(6 AS {bigint}) AS df,
           CAST(CAST(
             CAST(6 AS DOUBLE) * num.s_num
             / (den.sum_r2sq - nb.n * 7 * 64)
             AS DECIMAL(18,6)) AS DOUBLE) AS q_stat
    FROM num CROSS JOIN den CROSS JOIN nb
    """


@query(
    "stats_friedman_dow_revenue",
    oracle=_friedman_sql("orders", "BIGINT", "isodow(d.day)"),
)
def stats_friedman_dow_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Friedman blocked rank test: does revenue depend on the DAY OF
    WEEK, treating each complete ISO week as a block? (Friedman 1937
    — the repeated-measures sibling of ``stats_kruskal_wallis``:
    KW pools all days, so a year-over-year level trend masquerades
    as a weekday effect; Friedman ranks WITHIN each week, so only
    the within-week shape counts.) Q ~ χ²(6) under "no weekday
    effect"; the tie-corrected general form is used (with no ties it
    reduces to the textbook 12n/(k(k+1))·Σ(R̄ⱼ−(k+1)/2)²).

    Exactness: ranks never leave the integers — the in-block 7×7
    sign comparison gives doubled tie-averaged ranks directly (no
    window, no sort), column sums and both quadratic forms are exact
    BIGINTs, one final double division pinned DECIMAL(18,6). With
    k=7: n(k+1) = 8n, nk(k+1)² = 448n.

    Plan: the corpus collapses to ~#days rows in one scan+agg; the
    block completeness filter, in-block 7×7 comparison (49 rows per
    week), and 7-row column sums all run on the tiny daily frame —
    corpus-independent beyond the first aggregate."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("friedman_orders")
    return spark.sql(
        _friedman_sql("friedman_orders", "BIGINT", "weekday(d.day) + 1")
    )


# ---- Cochran's Q binary repeated-measures test -------------------------------


def _cochranq_sql(table: str, bigint: str, dow: str) -> str:
    """Shared Cochran-Q text: blocks = complete ISO weeks, treatments
    = the 7 weekdays, binary response = "day's revenue above its own
    week's mean" via the division-free exact compare 7·rev > Σweek.
    Q = (k−1)(k·ΣNⱼ² − N²) / (k·ΣRᵢ − ΣRᵢ²) stays INTEGRAL until one
    final double division."""
    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(date_trunc('week', CAST(o_orderdate AS DATE))
                  AS DATE) AS wk,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
      FROM {table} GROUP BY 1, 2
    ),
    complete AS (
      SELECT wk FROM daily GROUP BY wk
      HAVING CAST(COUNT(*) AS {bigint}) = 7
    ),
    blocked AS (
      SELECT d.wk, {dow} AS dow, d.rev
      FROM daily d JOIN complete c ON c.wk = d.wk
    ),
    wktot AS (
      SELECT wk, SUM(rev) AS tot FROM blocked GROUP BY wk
    ),
    x AS (
      SELECT b.wk, b.dow,
             CASE WHEN b.rev * 7 > w.tot THEN 1 ELSE 0 END AS x
      FROM blocked b JOIN wktot w ON w.wk = b.wk
    ),
    cols AS (
      SELECT dow, CAST(SUM(x) AS {bigint}) AS n_j FROM x GROUP BY dow
    ),
    rows_ AS (
      SELECT wk, CAST(SUM(x) AS {bigint}) AS r_i FROM x GROUP BY wk
    ),
    colagg AS (
      SELECT CAST(SUM(n_j) AS {bigint}) AS n,
             CAST(SUM(n_j * n_j) AS {bigint}) AS sum_nj2
      FROM cols
    ),
    rowagg AS (
      SELECT CAST(SUM(r_i) AS {bigint}) AS sum_ri,
             CAST(SUM(r_i * r_i) AS {bigint}) AS sum_ri2,
             CAST(COUNT(*) AS {bigint}) AS n_weeks
      FROM rows_
    ),
    mo AS (
      SELECT * FROM colagg CROSS JOIN rowagg
    )
    SELECT n_weeks,
           CAST(7 AS {bigint}) AS k_treatments,
           CAST(6 AS {bigint}) AS df,
           n AS n_above,
           CAST(CAST(
             CAST(6 AS DOUBLE) * (7 * sum_nj2 - n * n)
             / (7 * sum_ri - sum_ri2)
             AS DECIMAL(18,6)) AS DOUBLE) AS q_stat
    FROM mo
    """


@query(
    "stats_cochran_q_dow",
    oracle=_cochranq_sql("orders", "BIGINT", "isodow(d.day)"),
)
def stats_cochran_q_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test: do ABOVE-AVERAGE revenue days concentrate on
    particular weekdays, week after week? (Cochran 1950 — the binary
    specialization of Friedman: ``stats_friedman_dow_revenue`` ranks
    the 7 days within each week; Q asks the coarser, more robust
    question on the 0/1 indicator "day beat its own week's mean",
    immune to any monotone distortion of the revenue scale.) Blocks =
    complete ISO weeks, treatments = weekdays, Q ~ χ²(6) under "no
    weekday preference". The indicator is week-relative, so level
    trends across weeks cannot masquerade as a weekday effect — the
    same blocking logic as Friedman, one rung down the measurement
    ladder.

    Exactness: INTEGER end-to-end — daily revenues stay exact
    DECIMAL(18,6) and the above-mean indicator is the division-free
    compare 7·rev > Σweek (exact decimal arithmetic, no rounding
    anywhere); column/row totals and both quadratic forms are exact
    BIGINTs via the algebraic identity Q = (k−1)(kΣNⱼ²−N²)/(kΣRᵢ−ΣRᵢ²);
    one final double division pinned DECIMAL(18,6).

    Plan: two chains (weekday column totals / week row totals), each
    collapsing the corpus to ~#days rows in its one scan+agg, joined
    by a 1-row broadcast nested loop — 2 scans total (pinned);
    completeness filter, week-total join, and the 7-row/#week-row
    frames are calendar-sized, corpus-independent beyond the first
    aggregate (the Friedman precedent)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("cochranq_orders")
    return spark.sql(
        _cochranq_sql("cochranq_orders", "BIGINT", "weekday(d.day) + 1")
    )


# ---- Page's trend test for ordered alternatives ------------------------------


def _page_sql(table: str, bigint: str, dow: str) -> str:
    """Shared Page-L text: the Friedman blocks/ranks verbatim (7×7
    in-block sign comparison → doubled tie-averaged ranks), finished
    with the ORDERED statistic L = Σ j·Rⱼ instead of the omnibus
    quadratic. Doubled-rank units: L₂ = 2L, E[L₂] = n·k(k+1)²/2,
    Var[L₂] = n·k²(k+1)²(k−1)/36 (tie-naive variance — the standard
    Page formulation; stated convention)."""
    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(date_trunc('week', CAST(o_orderdate AS DATE))
                  AS DATE) AS wk,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                  AS DOUBLE) AS revenue
      FROM {table} GROUP BY 1, 2
    ),
    complete AS (
      SELECT wk FROM daily GROUP BY wk
      HAVING CAST(COUNT(*) AS {bigint}) = 7
    ),
    blocked AS (
      SELECT d.wk, {dow} AS dow, d.revenue
      FROM daily d JOIN complete c ON c.wk = d.wk
    ),
    ranked AS (
      SELECT a.wk, a.dow,
             CAST(SUM(CASE WHEN b.revenue < a.revenue THEN 2
                           WHEN b.revenue = a.revenue THEN 1
                           ELSE 0 END) + 1 AS {bigint}) AS r2
      FROM blocked a JOIN blocked b ON b.wk = a.wk
      GROUP BY a.wk, a.dow
    ),
    colsums AS (
      SELECT dow, CAST(SUM(r2) AS {bigint}) AS r2_j
      FROM ranked GROUP BY dow
    ),
    nb AS (SELECT CAST(COUNT(*) AS {bigint}) AS n FROM complete),
    l AS (
      SELECT CAST(SUM(dow * r2_j) AS {bigint}) AS l2 FROM colsums
    )
    SELECT nb.n AS n_weeks,
           CAST(7 AS {bigint}) AS k_treatments,
           l.l2 AS l_doubled,
           CAST(224 AS {bigint}) * nb.n AS e_l_doubled,
           CAST(CAST(
             (l.l2 - CAST(224 AS DOUBLE) * nb.n)
             / sqrt(CAST(nb.n AS DOUBLE) * 49 * 64 * 6 / 36)
             AS DECIMAL(18,6)) AS DOUBLE) AS z_score
    FROM l CROSS JOIN nb
    """


@query(
    "stats_page_trend_dow",
    oracle=_page_sql("orders", "BIGINT", "isodow(d.day)"),
)
def stats_page_trend_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L test: does revenue rise MONOTONICALLY through the week
    (Mon→Sun), judged within each complete ISO week? (Page 1963 —
    the ordered-alternative member of the blocked-rank family:
    ``stats_friedman_dow_revenue``'s omnibus Q fires on ANY weekday
    pattern; Page's L = Σ j·Rⱼ weights the rank sums by the
    HYPOTHESIZED order, so it concentrates all its power on a trend
    and beats Friedman exactly when the alternative is ordered — the
    textbook pairing, one rung apart.) Same blocks, same exact
    doubled-rank machinery, different final contrast; z is signed, so
    its sign reads as the trend's direction.

    Exactness: ranks never leave the integers (the Friedman 7×7
    in-block comparison verbatim); L₂ = Σ dow·(2Rⱼ) is an exact
    BIGINT; one final double chain (centering by E[L₂] = 224n,
    scaling by the tie-naive √Var[L₂] — stated convention) pinned
    DECIMAL(18,6).

    Plan: the Friedman physical budget verbatim — one scan collapses
    the corpus to ~#days rows; the completeness filter, in-block 7×7
    comparison, and 7-row column sums all run on calendar-sized
    frames; 1-row broadcast finish."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("page_orders")
    return spark.sql(
        _page_sql("page_orders", "BIGINT", "weekday(d.day) + 1")
    )


# ---- Cochran–Mantel–Haenszel stratified 2x2 test ----------------------------


def _cmh_sql(table: str, bigint: str, isodow_wd: str, month: str) -> str:
    """Shared CMH text over month-stratified 2×2 tables
    (weekday × error). Per-stratum cells are exact BIGINTs; each
    stratum's E, V, and the Mantel–Haenszel R/S odds terms are ONE
    double chain pinned DECIMAL(18,9) before the 12-row sums, so the
    stratum summation is order-insensitive. No continuity
    correction (stated convention, identical both sides)."""
    return f"""
    WITH cells AS (
      SELECT {month} AS stratum,
             CAST(SUM(CASE WHEN {isodow_wd} AND event_type = 'error'
                      THEN 1 ELSE 0 END) AS {bigint}) AS a,
             CAST(SUM(CASE WHEN {isodow_wd} AND event_type <> 'error'
                      THEN 1 ELSE 0 END) AS {bigint}) AS b,
             CAST(SUM(CASE WHEN NOT {isodow_wd} AND event_type = 'error'
                      THEN 1 ELSE 0 END) AS {bigint}) AS c,
             CAST(SUM(CASE WHEN NOT {isodow_wd} AND event_type <> 'error'
                      THEN 1 ELSE 0 END) AS {bigint}) AS d
      FROM {table} GROUP BY 1
    ),
    terms AS (
      SELECT stratum, a, b, c, d,
             a + b + c + d AS nk,
             CAST(CAST((a + b) AS DOUBLE) * (a + c) / (a + b + c + d)
                  AS DECIMAL(18,9)) AS e_k,
             CAST(
               CAST((a + b) AS DOUBLE) * (c + d) * (a + c) * (b + d)
               / (CAST((a + b + c + d) AS DOUBLE)
                  * (a + b + c + d) * (a + b + c + d - 1))
               AS DECIMAL(18,9)) AS v_k,
             CAST(CAST(a AS DOUBLE) * d / (a + b + c + d)
                  AS DECIMAL(18,9)) AS r_k,
             CAST(CAST(b AS DOUBLE) * c / (a + b + c + d)
                  AS DECIMAL(18,9)) AS s_k
      FROM cells
      WHERE a + b + c + d > 1
    ),
    mo AS (
      SELECT CAST(COUNT(*) AS {bigint}) AS k_strata,
             CAST(SUM(nk) AS {bigint}) AS n_events,
             CAST(SUM(a) AS {bigint}) AS sum_a,
             CAST(SUM(e_k) AS DOUBLE) AS sum_e,
             CAST(SUM(v_k) AS DOUBLE) AS sum_v,
             CAST(SUM(r_k) AS DOUBLE) AS sum_r,
             CAST(SUM(s_k) AS DOUBLE) AS sum_s
      FROM terms
    )
    SELECT k_strata, n_events, sum_a,
           CAST(CAST(sum_e AS DECIMAL(18,6)) AS DOUBLE) AS sum_e,
           CAST(CAST(
             (sum_a - sum_e) * (sum_a - sum_e) / sum_v
             AS DECIMAL(18,6)) AS DOUBLE) AS cmh_chi2,
           CAST(CAST(sum_r / sum_s AS DECIMAL(18,6)) AS DOUBLE)
             AS mh_odds_ratio
    FROM mo
    """


@query(
    "stats_cmh_error_weekday",
    oracle=_cmh_sql(
        "events",
        "BIGINT",
        "isodow(CAST(ts AS TIMESTAMP)) <= 5",
        "CAST(month(CAST(ts AS TIMESTAMP)) AS BIGINT)",
    ),
)
def stats_cmh_error_weekday(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cochran–Mantel–Haenszel test of the weekday ↔ error-rate
    association STRATIFIED BY MONTH, plus the Mantel–Haenszel common
    odds ratio (Mantel & Haenszel 1959). The confounder-aware
    sibling of ``events_poisson_rate_test``/``orders_chi2``: a raw
    pooled 2×2 can manufacture an association out of seasonality
    alone (Simpson's paradox — months with more traffic AND more
    weekend share); CMH tests the association WITHIN each month and
    pools the evidence, so a verdict here survives the monthly mix.

    Exactness: per-stratum cells are exact integer counts from one
    scan; E_k, V_k, R_k, S_k are each one double chain pinned
    DECIMAL(18,9) before the 12-row sums; χ² and the MH odds ratio
    are single closing chains pinned DECIMAL(18,6). Degenerate
    strata (nk ≤ 1) are excluded by rule in both dialects.

    Plan: ONE scan → a 12-group hash aggregate carrying four
    conditional counts; everything after runs on 12 rows."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("cmh_events")
    return spark.sql(
        _cmh_sql(
            "cmh_events",
            "BIGINT",
            "weekday(ts) <= 4",
            "CAST(month(ts) AS BIGINT)",
        )
    )


# ---- Dunn post-hoc pairwise comparisons (after Kruskal–Wallis) --------------


def _dunn_sql(table: str, bigint: str) -> str:
    """Shared Dunn text: pooled tie-averaged ranks via the integral
    2R machinery (the ``stats_kruskal_wallis_priority`` CTEs), then
    for each group pair z = (R̄ᵢ − R̄ⱼ)/√((N(N+1)/12 − T)(1/nᵢ+1/nⱼ))
    with T = Σ(t³−t)/(12(N−1)); two-sided p through the shared
    pinned-erf normal CDF; Benjamini–Hochberg step-up across the
    C(k,2) pairs (the ``stats_bh_fdr_event_rates`` machinery)."""
    p_expr = _norm_p_two_sided("z")
    return f"""
    WITH byv AS (
      SELECT o_totalprice AS v, o_orderpriority AS grp,
             CAST(COUNT(*) AS {bigint}) AS n_gv
      FROM {table} GROUP BY 1, 2
    ),
    byval AS (
      SELECT v, CAST(SUM(n_gv) AS {bigint}) AS t FROM byv GROUP BY 1
    ),
    cum AS (
      SELECT v, t, SUM(t) OVER (ORDER BY v) AS cum_t FROM byval
    ),
    g AS (
      SELECT byv.grp,
             CAST(SUM(byv.n_gv) AS {bigint}) AS n_g,
             CAST(SUM(byv.n_gv
                  * (2 * (cum.cum_t - cum.t) + cum.t + 1))
                  AS {bigint}) AS r2_g
      FROM byv JOIN cum ON byv.v = cum.v
      GROUP BY byv.grp
    ),
    ties AS (
      SELECT CAST(SUM(t) AS {bigint}) AS n,
             CAST(SUM(t * t * t - t) AS {bigint}) AS tie3
      FROM byval
    ),
    zs AS (
      SELECT a.grp AS grp_a, b.grp AS grp_b,
             a.n_g AS n_a, b.n_g AS n_b,
             CAST(CAST(
               (CAST(a.r2_g AS DOUBLE) / (2 * CAST(a.n_g AS DOUBLE))
                - CAST(b.r2_g AS DOUBLE) / (2 * CAST(b.n_g AS DOUBLE)))
               / sqrt(
                   (CAST(ties.n AS DOUBLE) * (ties.n + 1) / 12
                    - CAST(ties.tie3 AS DOUBLE) / (12 * (ties.n - 1)))
                   * (CAST(1 AS DOUBLE) / a.n_g
                      + CAST(1 AS DOUBLE) / b.n_g))
               AS DECIMAL(18,6)) AS DOUBLE) AS z
      FROM g a JOIN g b ON a.grp < b.grp CROSS JOIN ties
    ),
    ps AS (
      SELECT grp_a, grp_b, n_a, n_b, z,
             {p_expr} AS p_value,
             CAST(COUNT(*) OVER () AS {bigint}) AS m
      FROM zs
    ),
    ranked AS (
      SELECT grp_a, grp_b, n_a, n_b, z, p_value, m,
             CAST(ROW_NUMBER() OVER (
               ORDER BY p_value, grp_a, grp_b) AS {bigint}) AS i
      FROM ps
    ),
    stepped AS (
      SELECT grp_a, grp_b, n_a, n_b, z, p_value, i, m,
             MIN(p_value * m / i) OVER (
               ORDER BY i DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS q_raw
      FROM ranked
    )
    SELECT grp_a, grp_b, n_a, n_b, z, p_value,
           CAST(CAST(
             CASE WHEN q_raw > 1 THEN CAST(1 AS DOUBLE) ELSE q_raw END
             AS DECIMAL(18,9)) AS DOUBLE) AS q_value,
           CAST(CASE WHEN q_raw <= CAST(0.05 AS DOUBLE)
                THEN 1 ELSE 0 END AS INT) AS reject_05
    FROM stepped
    """


@query(
    "stats_dunn_posthoc_priority",
    oracle=_dunn_sql("orders", "BIGINT"),
)
def stats_dunn_posthoc_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dunn's post-hoc pairwise comparisons after the Kruskal–Wallis
    omnibus (Dunn 1964): KW says "SOME priority differs in total
    price"; this says WHICH pairs, using the same pooled tie-averaged
    ranks (so the two can never disagree about the ranking) with
    z = (R̄ᵢ−R̄ⱼ)/√((N(N+1)/12 − T)(1/nᵢ+1/nⱼ)), corrected across
    all C(5,2)=10 pairs by Benjamini–Hochberg — the multiple-testing
    discipline ``stats_bh_fdr_event_rates`` established, now applied
    to post-hoc pairs (Dunn's classic Bonferroni is strictly more
    conservative; BH is the stated house convention).

    Exactness: doubled rank sums stay exact BIGINTs (the KW
    machinery, verbatim CTEs); each z is one pinned chain; p-values
    ride the shared pinned-erf CDF; the BH step-up is arithmetic on
    pinned doubles over 10 rows.

    Plan: identical scan profile to KW — one (value, grp) aggregate,
    the range-exchange rank prefix on the Spark side, a value-keyed
    join back, then everything runs on k=5 / 10-pair frames (the BH
    windows sit above the 10-row frame — documented tiny-frame
    exception)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("v"),
        F.col("o_orderpriority").alias("grp"),
    )
    byv = o.groupBy("v", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gv")
    )
    byval = byv.groupBy("v").agg(
        F.sum("n_gv").cast("bigint").alias("t")
    )
    cum = _range_prefix(byval, ["v"], ["t"])
    g = (
        byv.join(cum.select("v", "t", "cum_t"), "v")
        .groupBy("grp")
        .agg(
            F.sum("n_gv").cast("bigint").alias("n_g"),
            F.sum(
                F.col("n_gv")
                * (2 * (F.col("cum_t") - F.col("t")) + F.col("t") + 1)
            )
            .cast("bigint")
            .alias("r2_g"),
        )
    )
    ties = byval.agg(
        F.sum("t").cast("bigint").alias("n"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie3"),
    )
    g.crossJoin(F.broadcast(ties)).createOrReplaceTempView(
        "dunn_g_ties"
    )
    p_expr = _norm_p_two_sided("z")
    return spark.sql(
        f"""
    WITH zs AS (
      SELECT a.grp AS grp_a, b.grp AS grp_b,
             a.n_g AS n_a, b.n_g AS n_b,
             CAST(CAST(
               (CAST(a.r2_g AS DOUBLE) / (2 * CAST(a.n_g AS DOUBLE))
                - CAST(b.r2_g AS DOUBLE) / (2 * CAST(b.n_g AS DOUBLE)))
               / sqrt(
                   (CAST(a.n AS DOUBLE) * (a.n + 1) / 12
                    - CAST(a.tie3 AS DOUBLE) / (12 * (a.n - 1)))
                   * (CAST(1 AS DOUBLE) / a.n_g
                      + CAST(1 AS DOUBLE) / b.n_g))
               AS DECIMAL(18,6)) AS DOUBLE) AS z
      FROM dunn_g_ties a JOIN dunn_g_ties b ON a.grp < b.grp
    ),
    ps AS (
      SELECT grp_a, grp_b, n_a, n_b, z,
             {p_expr} AS p_value,
             CAST(COUNT(*) OVER () AS BIGINT) AS m
      FROM zs
    ),
    ranked AS (
      SELECT grp_a, grp_b, n_a, n_b, z, p_value, m,
             CAST(ROW_NUMBER() OVER (
               ORDER BY p_value, grp_a, grp_b) AS BIGINT) AS i
      FROM ps
    ),
    stepped AS (
      SELECT grp_a, grp_b, n_a, n_b, z, p_value, i, m,
             MIN(p_value * m / i) OVER (
               ORDER BY i DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS q_raw
      FROM ranked
    )
    SELECT grp_a, grp_b, n_a, n_b, z, p_value,
           CAST(CAST(
             CASE WHEN q_raw > 1 THEN CAST(1 AS DOUBLE) ELSE q_raw END
             AS DECIMAL(18,9)) AS DOUBLE) AS q_value,
           CAST(CASE WHEN q_raw <= CAST(0.05 AS DOUBLE)
                THEN 1 ELSE 0 END AS INT) AS reject_05
    FROM stepped
    """
    )


# ---- Nelson–Aalen cumulative hazard -----------------------------------


def _nelson_aalen_sql(table: str, bigint: str, dd: str) -> str:
    """Shared Nelson–Aalen text over time-to-first-purchase
    observations: duration = days from a user's first event to their
    first purchase (the "death"); users who never purchase are
    right-censored at their last observed event. H(t) = Σ dᵢ/nᵢ over
    death times ≤ t, each increment an exact-int ratio pinned
    DECIMAL(18,9), summed exactly; the Breslow survivor exp(−H) is
    pinned at the end. ``dd`` is the dialect's datediff(a → b)
    spelled dd(a, b)."""
    dur_death = dd.format(a="f", b="fp")
    dur_cens = dd.format(a="f", b="l")
    return f"""
    WITH u AS (
      SELECT user_id,
             CAST(min(CAST(ts AS TIMESTAMP)) AS DATE) AS f,
             CAST(max(CAST(ts AS TIMESTAMP)) AS DATE) AS l,
             CAST(min(CASE WHEN event_type = 'purchase'
                      THEN CAST(ts AS TIMESTAMP) END) AS DATE) AS fp
      FROM {table} GROUP BY user_id
    ),
    obs AS (
      SELECT CASE WHEN fp IS NOT NULL THEN {dur_death}
                  ELSE {dur_cens} END AS dur,
             CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS converted
      FROM u
    ),
    byd AS (
      SELECT dur, CAST(SUM(converted) AS {bigint}) AS d,
             CAST(COUNT(*) AS {bigint}) AS n
      FROM obs GROUP BY dur
    ),
    tot AS (SELECT CAST(SUM(n) AS {bigint}) AS t FROM byd),
    r AS (
      SELECT dur, d,
             tot.t - (SUM(n) OVER (ORDER BY dur) - n) AS at_risk
      FROM byd CROSS JOIN tot
    ),
    terms AS (
      SELECT dur, d, at_risk,
             CAST(CAST(d AS DOUBLE) / at_risk AS DECIMAL(18,9))
               AS inc,
             CAST(CAST(d AS DOUBLE) / (CAST(at_risk AS DOUBLE)
                  * at_risk) AS DECIMAL(18,12)) AS vinc
      FROM r WHERE d > 0
    ),
    na AS (
      SELECT dur, d, at_risk,
             SUM(inc) OVER (ORDER BY dur) AS h,
             SUM(vinc) OVER (ORDER BY dur) AS vh
      FROM terms
    )
    SELECT dur AS duration_days,
           CAST(at_risk AS {bigint}) AS n_at_risk,
           d AS n_converted,
           CAST(CAST(CAST(h AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE)
             AS cum_hazard,
           CAST(CAST(CAST(vh AS DOUBLE) AS DECIMAL(18,9)) AS DOUBLE)
             AS hazard_variance,
           CAST(CAST(exp(-CAST(h AS DOUBLE)) AS DECIMAL(18,6))
                AS DOUBLE) AS breslow_survival
    FROM na
    """


@query(
    "users_nelson_aalen",
    oracle=_nelson_aalen_sql(
        "events", "BIGINT", "datediff('day', {a}, {b})"
    ),
)
def users_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator for TIME TO FIRST
    PURCHASE: duration = days from a user's first event to their
    first purchase, right-censored at the last observed event for
    users who never convert — H(t) = Σ dᵢ/nᵢ with its standard
    variance Σ dᵢ/nᵢ² and the Breslow survivor exp(−H(t)) (Nelson
    1972, Aalen 1978). The censoring-honest survival face of
    ``events_conversion_attribution``'s touch accounting:
    ``users_kaplan_meier`` watches LIFETIME (churn), this watches
    CONVERSION LATENCY — and the hazard's shape (front-loaded vs
    flat increments) is the readout: do users convert in the first
    session or on a constant trickle? H is the additive object —
    its increments decompose per-day where KM's product doesn't.

    Exactness: durations and risk sets are exact integers from one
    per-user aggregate (first event, last event, first purchase in
    a single conditional-min pass); each hazard increment is an
    exact-int ratio pinned DECIMAL(18,9) (variance at 18,12);
    running sums over pinned decimals are exact; exp pinned once.
    NA is finite even where the whole risk set dies (unlike KM's
    ln-zero rows), so every death time is emitted.

    Plan: one scan → per-user conditional aggregate; all else runs
    on the ~#distinct-durations frame, tiny by construction (the
    KM/CUSUM exception)."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("na_events")
    return spark.sql(
        _nelson_aalen_sql(
            "na_events", "BIGINT", "datediff({b}, {a})"
        )
    )


# ---- composed daily-series diagnostics report --------------------------------

_SERIES_DIAG_PARTS = [
    # (diagnostic, statistic, source query, column expression)
    ("ljung_box", "q_stat", "stats_ljung_box_daily", "q_stat"),
    ("pettitt", "k_stat", "stats_pettitt_changepoint", "k_stat"),
    ("pettitt", "p_approx", "stats_pettitt_changepoint", "p_approx"),
    ("friedman_dow", "q_stat", "stats_friedman_dow_revenue", "q_stat"),
    ("runs", "z", "stats_runs_test_daily", "runs_z"),
    ("kendall_trend", "tau_b", "stats_kendall_tau_daily",
     "kendall_tau_b"),
]


def _series_diag_oracle() -> str:
    from .registry import ORACLES

    parts = [
        f"""SELECT '{diag}' AS diagnostic, '{stat}' AS statistic,
            CAST({col} AS DOUBLE) AS value
            FROM ({ORACLES[src]})"""
        for diag, stat, src, col in _SERIES_DIAG_PARTS
    ]
    return "\nUNION ALL\n".join(parts)


@query("orders_series_diagnostics", oracle=_series_diag_oracle())
def orders_series_diagnostics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The one-call health report for the daily order series — five
    verified diagnostics, each answering a different failure mode,
    unioned to one tall (diagnostic, statistic, value) frame:
    Ljung–Box (is there ANY autocorrelation structure), Pettitt (did
    the level SHIFT, and how confidently), Friedman (is there a
    day-of-week effect net of weekly level), runs test (are
    up/down streaks non-random), Kendall tau (is there a monotone
    trend). The time-series twin of ``text_curation_report`` /
    ``text_dataset_datasheet``: compositions OF verified rungs are
    themselves queries, so the monitoring dashboard is one engine
    call, not five.

    Exactness: each cell is produced by the component query's own
    registered chain — this op adds only constant labels and a
    UNION ALL, so it can never disagree with the standalone
    diagnostics (the oracle composes the same registered texts).

    Plan: the component plans run as written (each collapses the
    corpus to the daily frame in one scan+agg; Spark does not fuse
    the scans across UNION ALL branches, so the report costs the sum
    of its parts — acceptable for a daily monitoring call, and the
    parts are each scan-bound)."""
    from .registry import QUERIES

    parts = []
    for diag, stat, src, col in _SERIES_DIAG_PARTS:
        parts.append(
            QUERIES[src](spark, sf_dir).selectExpr(
                f"'{diag}' AS diagnostic",
                f"'{stat}' AS statistic",
                f"CAST({col} AS DOUBLE) AS value",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---- seasonal/trend strength summary ------------------------------------------


@query(
    "orders_seasonal_strength",
    oracle=None,  # registered below from the STL oracle text
)
def orders_seasonal_strength(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hyndman's seasonal/trend STRENGTH measures on the robust
    decomposition: F_seasonal = max(0, 1 − Var(R)/Var(S+R)) and
    F_trend = max(0, 1 − Var(R)/Var(T+R)) (Wang, Smith & Hyndman
    2006) — the one-row verdict on ``orders_robust_stl_decompose``'s
    per-day components: near 1 = that component dominates, near 0 =
    it's noise. The quantitative answer to "is the weekday cycle
    worth modeling" that the decomposition table only shows
    qualitatively.

    Exactness: the components are already pinned DECIMAL(18,6)
    doubles, so casting them back to DECIMAL(18,6) is exact; both
    variance NUMERATORS ride the exact n·Σx²−(Σx)² integer-decimal
    form (squares pinned DECIMAL(38,9) per row before summing); each
    F is one fixed chain pinned DECIMAL(18,6).

    Plan: the STL plan (one scan to the daily frame, calendar
    equi-joins) plus a single 1-row variance aggregate on its
    output."""
    stl = orders_robust_stl_decompose(spark, sf_dir)
    stl.createOrReplaceTempView("seasonal_strength_stl")
    return spark.sql(_seasonal_strength_finish("seasonal_strength_stl"))


def _seasonal_strength_finish(src: str) -> str:
    def var_terms(expr: str, tag: str) -> str:
        return (
            f"SUM(CAST({expr} AS DECIMAL(18,6))) AS s_{tag},"
            f" SUM(CAST(CAST({expr} AS DOUBLE) * CAST({expr} AS DOUBLE)"
            f" AS DECIMAL(38,9))) AS ss_{tag}"
        )

    def var_of(tag: str) -> str:
        return (
            f"(CAST(n * ss_{tag} - s_{tag} * s_{tag} AS DOUBLE)"
            f" / (CAST(n AS DOUBLE) * n))"
        )

    return f"""
    WITH mo AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             {var_terms("remainder", "r")},
             {var_terms("seasonal + remainder", "sr")},
             {var_terms("trend + remainder", "tr")}
      FROM {src}
    )
    SELECT n AS n_days,
           CAST(CAST(
             CASE WHEN 1 - {var_of("r")} / {var_of("sr")} < 0
                  THEN CAST(0 AS DOUBLE)
                  ELSE 1 - {var_of("r")} / {var_of("sr")} END
             AS DECIMAL(18,6)) AS DOUBLE) AS seasonal_strength,
           CAST(CAST(
             CASE WHEN 1 - {var_of("r")} / {var_of("tr")} < 0
                  THEN CAST(0 AS DOUBLE)
                  ELSE 1 - {var_of("r")} / {var_of("tr")} END
             AS DECIMAL(18,6)) AS DOUBLE) AS trend_strength
    FROM mo
    """


def _register_seasonal_strength_oracle() -> None:
    from .registry import ORACLES

    ORACLES["orders_seasonal_strength"] = _seasonal_strength_finish(
        f"({ORACLES['orders_robust_stl_decompose']})"
    )


_register_seasonal_strength_oracle()


# ---- Holt linear (double-exponential) smoothing ------------------------------

HOLT_ALPHA = "CAST(0.5 AS DOUBLE)"
HOLT_BETA = "CAST(0.3 AS DOUBLE)"


def _holt_sql(
    table: str = "events",
    limit_clause: str = "",
    seq_select: str | None = None,
) -> str:
    """IDENTICAL recursive text for both dialects, up to the
    parameterized source-view name (the
    ``events_ewma_recursive`` contract, extended to a TWO-variable
    linear recurrence): level lₜ = α·xₜ + (1−α)(lₜ₋₁+bₜ₋₁), trend
    bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁, initialized l₁ = x₁, b₁ = 0 (stated
    convention — the x₂−x₁ init needs lookahead the recursion's base
    case doesn't have; with β < 1 the influence of b₁ decays
    geometrically). Recursion forces the same sequential multiply-add
    chain in the same order on both engines, so every (lₜ, bₜ) is
    bit-identical; only the outputs are pinned."""
    a, b = HOLT_ALPHA, HOLT_BETA
    seq = seq_select or _daily_rev_seq_sql(table)
    return f"""
    WITH RECURSIVE seq AS (
      {seq}
    ),
    holt AS (
      SELECT t, day, rev,
             CAST(rev AS DOUBLE) AS l,
             CAST(0 AS DOUBLE) AS b
      FROM seq WHERE t = 1
      UNION ALL
      SELECT d.t, d.day, d.rev,
             {a} * CAST(d.rev AS DOUBLE)
               + (CAST(1 AS DOUBLE) - {a}) * (h.l + h.b),
             {b} * (({a} * CAST(d.rev AS DOUBLE)
                     + (CAST(1 AS DOUBLE) - {a}) * (h.l + h.b)) - h.l)
               + (CAST(1 AS DOUBLE) - {b}) * h.b
      FROM seq d JOIN holt h ON d.t = h.t + 1
    )
    SELECT day,
           CAST(rev AS DOUBLE) AS daily_rev,
           CAST(CAST(l AS DECIMAL(18,6)) AS DOUBLE) AS holt_level,
           CAST(CAST(b AS DECIMAL(18,6)) AS DOUBLE) AS holt_trend,
           CAST(CAST(l + b AS DECIMAL(18,6)) AS DOUBLE)
             AS forecast_next
    FROM holt
    ORDER BY day
    {limit_clause}
    """


@query("events_holt_linear_recursive", oracle=_holt_sql())
def events_holt_linear_recursive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Holt's linear (double-exponential) smoothing of daily purchase
    revenue via a RECURSIVE CTE — the two-variable coupled recurrence
    (level + trend) that neither window functions nor the
    single-state EWMA can express: the trend term lets the one-step
    forecast lₜ + bₜ FOLLOW a drifting series where EWMA lags it by
    design (Holt 1957; the second rung of the
    seasonal-naive → EWMA → Holt forecasting ladder, between
    ``events_forecast_backtest``'s baseline and anything model-side).
    Runs as the IDENTICAL query text on Spark 4 and DuckDB — the
    engine-surface point: a user's Postgres/DuckDB recursion ports
    verbatim.

    Exactness: daily revenues are DECIMAL-exact; the recursion
    applies the same multiply-add chain in the same t-order on both
    engines (recursion forces sequential evaluation), so every
    (lₜ, bₜ) pair is bit-identical before the output pins; α, β are
    shared CAST literals; b₁ = 0 is the stated init convention.

    Scale honesty: recursion depth = series length over the ~#days
    frame (the EWMA caveat verbatim — raise
    cteRecursionLevelLimit or segment for multi-year series); the
    corpus-sized work is the one scan into the daily aggregate."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "holt_events"
    )
    seq = spark.sql(_daily_rev_seq_sql("holt_events")).localCheckpoint()
    seq.createOrReplaceTempView("holt_seq")
    return spark.sql(
        _holt_sql(seq_select="SELECT day, rev, t FROM holt_seq")
    )


HW_ALPHA = "CAST(0.30 AS DOUBLE)"  # level gain
HW_BETA = "CAST(0.10 AS DOUBLE)"  # trend gain
HW_GAMMA = "CAST(0.20 AS DOUBLE)"  # seasonal gain


def _hw_sql(
    table: str = "events", seq_select: str | None = None
) -> str:
    """IDENTICAL recursive text for both dialects: additive
    Holt-Winters with weekly period m=7. The seasonal state is a
    7-slot ring carried as columns s1..s7 — each step consumes s1
    (the component for the current day), shifts the ring left, and
    appends the updated component, so slot 1 is ALWAYS "this day's
    season" and no modular indexing is needed. Init at t=7 (one full
    season): level = first-week mean, trend = 0, ring = week-1
    deviations from that mean (stated convention)."""
    a, b, g = HW_ALPHA, HW_BETA, HW_GAMMA
    x = "CAST(d.rev AS DOUBLE)"
    lvl = f"{a} * ({x} - h.s1) + (1 - {a}) * (h.l + h.b)"
    seq = seq_select or _daily_rev_seq_sql(table)
    return f"""
    WITH RECURSIVE seq AS (
      {seq}
    ),
    wk1 AS (
      SELECT CAST(SUM(rev) AS DOUBLE) / 7 AS m,
             MAX(CASE WHEN t = 1 THEN CAST(rev AS DOUBLE) END) AS x1,
             MAX(CASE WHEN t = 2 THEN CAST(rev AS DOUBLE) END) AS x2,
             MAX(CASE WHEN t = 3 THEN CAST(rev AS DOUBLE) END) AS x3,
             MAX(CASE WHEN t = 4 THEN CAST(rev AS DOUBLE) END) AS x4,
             MAX(CASE WHEN t = 5 THEN CAST(rev AS DOUBLE) END) AS x5,
             MAX(CASE WHEN t = 6 THEN CAST(rev AS DOUBLE) END) AS x6,
             MAX(CASE WHEN t = 7 THEN CAST(rev AS DOUBLE) END) AS x7
      FROM seq WHERE t <= 7
    ),
    hw AS (
      SELECT s.t, s.day, s.rev,
             w.m AS l, CAST(0 AS DOUBLE) AS b,
             w.x1 - w.m AS s1, w.x2 - w.m AS s2, w.x3 - w.m AS s3,
             w.x4 - w.m AS s4, w.x5 - w.m AS s5, w.x6 - w.m AS s6,
             w.x7 - w.m AS s7,
             CAST(NULL AS DOUBLE) AS fitted
      FROM seq s CROSS JOIN wk1 w WHERE s.t = 7
      UNION ALL
      SELECT d.t, d.day, d.rev,
             {lvl},
             {b} * (({lvl}) - h.l) + (1 - {b}) * h.b,
             h.s2, h.s3, h.s4, h.s5, h.s6, h.s7,
             {g} * ({x} - ({lvl})) + (1 - {g}) * h.s1,
             h.l + h.b + h.s1
      FROM seq d JOIN hw h ON d.t = h.t + 1
    )
    SELECT day,
           CAST(rev AS DOUBLE) AS daily_rev,
           CAST(CAST(l AS DECIMAL(18,6)) AS DOUBLE) AS hw_level,
           CAST(CAST(b AS DECIMAL(18,6)) AS DOUBLE) AS hw_trend,
           CAST(CAST(s7 AS DECIMAL(18,6)) AS DOUBLE) AS hw_seasonal,
           CAST(CAST(fitted AS DECIMAL(18,6)) AS DOUBLE)
             AS one_step_forecast,
           CAST(CAST(l + b + s1 AS DECIMAL(18,6)) AS DOUBLE)
             AS forecast_next
    FROM hw
    ORDER BY day
    """


@query("events_holt_winters_additive", oracle=_hw_sql())
def events_holt_winters_additive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing, weekly
    period m=7) of daily purchase revenue — the top rung of the
    forecasting ladder: EWMA tracks level, Holt adds drift, and this
    adds the SEASONAL component both of them smear into lag (Winters
    1960). The three coupled recurrences (lₜ = α(xₜ−sₜ₋₇) +
    (1−α)(lₜ₋₁+bₜ₋₁); bₜ = β(lₜ−lₜ₋₁)+(1−β)bₜ₋₁; sₜ =
    γ(xₜ−lₜ)+(1−γ)sₜ₋₇) run as ONE recursive CTE whose state carries
    the 7-slot seasonal ring as columns s1..s7 — each step consumes
    slot 1, shifts left, appends the update, so "this day's season"
    is always slot 1 and the recursion needs no modular indexing.
    Emits level/trend/seasonal plus the honest ONE-STEP forecast
    (what t−1 predicted for t — NULL on the init row by
    construction) and next-day forecast. Identical query text on
    Spark 4 and DuckDB, the ``events_holt_linear_recursive``
    engine-surface contract extended to 9 state columns.

    Exactness: daily revenues are DECIMAL-exact; init is one
    7-value pivot + mean (single IEEE chain); the recursion forces
    the same multiply-add chain in the same t-order on both engines,
    so all nine state columns stay bit-identical; outputs pinned
    DECIMAL(18,6). Init convention stated: l₇ = week-1 mean, b₇ = 0,
    ring = week-1 deviations.

    Scale honesty: recursion depth = series length over the ~#days
    frame (the Holt caveat verbatim — segment multi-year series or
    raise cteRecursionLevelLimit); the corpus-sized work is the one
    scan into the daily aggregate; the 7-row pivot and every step run
    on single-row frames."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "hw_events"
    )
    seq = spark.sql(_daily_rev_seq_sql("hw_events")).localCheckpoint()
    seq.createOrReplaceTempView("hw_seq")
    return spark.sql(
        _hw_sql(seq_select="SELECT day, rev, t FROM hw_seq")
    )


CROSTON_ALPHA = "CAST(0.2 AS DOUBLE)"  # smoothing gain for both EWMAs
CROSTON_LAST_N = 32  # demand events kept (recursion-depth + wall bound)


def _croston_seq_sql(table: str, ddiff: str) -> str:
    """The corpus-side half: top part, last-N nonzero-demand days,
    intervals via lag — everything BEFORE the recursion, split out so
    the Spark side can materialize its ≤{N}-row result once: a
    recursive CTE re-evaluates every frame the step references, so an
    inline seq re-plans the lineitem aggregate PER STEP — at test SF
    the fixed per-step UnionLoop overhead hides that cost, but at
    100 TB the re-derived aggregate would dominate; the persisted
    split makes each step read the ≤{N}-row cache (pinned). The
    oracle keeps it inline — same text, same math."""
    return f"""
    WITH top1 AS (
      SELECT l_partkey FROM {table}
      GROUP BY 1 ORDER BY COUNT(*) DESC, l_partkey ASC LIMIT 1
    ),
    demand AS (
      SELECT CAST(l.l_shipdate AS DATE) AS day,
             SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS d
      FROM {table} l JOIN top1 ON top1.l_partkey = l.l_partkey
      GROUP BY 1
    ),
    lastn AS (
      SELECT day, d,
             ROW_NUMBER() OVER (ORDER BY day DESC) AS rdesc
      FROM demand
    )
    SELECT day, d,
           ROW_NUMBER() OVER (ORDER BY day ASC) AS t,
           COALESCE({ddiff}, 1) AS q
    FROM (SELECT day, d,
                 LAG(day) OVER (ORDER BY day ASC) AS prev_day
          FROM lastn WHERE rdesc <= {CROSTON_LAST_N}) g
    """


def _croston_sql(seq_select: str, bigint: str) -> str:
    """Shared Croston text: two coupled EWMAs over the prepared
    (day, demand, t, interval) sequence as one recursive CTE. Init:
    z₁ = d₁, p₁ = 1 (stated convention — the first interval is
    undefined)."""
    a = CROSTON_ALPHA
    return f"""
    WITH RECURSIVE seq AS (
      {seq_select}
    ),
    cro AS (
      SELECT t, day, d, q,
             CAST(d AS DOUBLE) AS z,
             CAST(1 AS DOUBLE) AS p
      FROM seq WHERE t = 1
      UNION ALL
      SELECT s.t, s.day, s.d, s.q,
             {a} * CAST(s.d AS DOUBLE) + (1 - {a}) * c.z,
             {a} * CAST(s.q AS DOUBLE) + (1 - {a}) * c.p
      FROM seq s JOIN cro c ON s.t = c.t + 1
    )
    SELECT t AS seq, day,
           CAST(d AS DOUBLE) AS demand,
           CAST(q AS {bigint}) AS interval_days,
           CAST(CAST(z AS DECIMAL(18,6)) AS DOUBLE) AS croston_z,
           CAST(CAST(p AS DECIMAL(18,6)) AS DOUBLE) AS croston_p,
           CAST(CAST(z / p AS DECIMAL(18,6)) AS DOUBLE)
             AS forecast_rate,
           CAST(CAST((1 - {a} / 2) * (z / p) AS DECIMAL(18,6))
                AS DOUBLE) AS sba_rate
    FROM cro
    ORDER BY seq
    """


@query(
    "lineitem_croston_intermittent",
    oracle=_croston_sql(
        _croston_seq_sql("lineitem", "date_diff('day', prev_day, day)"),
        "BIGINT",
    ),
)
def lineitem_croston_intermittent(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Croston's method for INTERMITTENT demand — the forecasting rung
    the EWMA/Holt/Holt-Winters ladder cannot reach: a single part's
    daily demand is mostly zeros, and smoothing the raw series drives
    any EWMA toward zero between demands (Croston 1972, the standard
    supply-chain answer). Croston smooths TWO series instead — the
    nonzero demand SIZES zₜ and the inter-demand INTERVALS pₜ — and
    forecasts the demand RATE z/p, plus the Syntetos–Boylan (SBA)
    (1−α/2) bias correction the later literature showed Croston's
    raw ratio needs. Runs on the highest-volume part (deterministic
    tie-break), its last {CROSTON_LAST_N} demand days; two coupled
    EWMAs as ONE recursive CTE, identical text both engines up to the
    day-difference spelling.

    Exactness: daily demand is an exact decimal sum; intervals are
    exact day arithmetic from a lag window over the ≤{CROSTON_LAST_N}-
    row frame; the recursion forces the same multiply-add chain in
    the same t-order on both engines (the Holt contract), so (zₜ, pₜ)
    are bit-identical before the output pins. Init z₁ = d₁, p₁ = 1 —
    stated convention.

    Scale honesty: the corpus-sized work is one scan into the
    (part, day) aggregate + the top-part aggregate; everything
    after — lag, re-sequence, recursion — runs on a ≤{CROSTON_LAST_N}-
    row frame, and the LAST-N cap is what bounds recursion depth
    below Spark's cteRecursionLevelLimit at ANY scale factor (the
    series gets longer with SF; the cap, not luck, holds the depth).
    A fleet-wide Croston (every part) would lift the same recurrence
    into one applyInPandas pass partitioned by part — noted, not
    needed for the single-SKU readout."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("croston_lineitem")
    seq = spark.sql(
        _croston_seq_sql("croston_lineitem", "datediff(day, prev_day)")
    ).localCheckpoint()  # recursion re-plans referenced views per
    # step; the lineage cut makes seq a materialized ≤N-row leaf
    seq.createOrReplaceTempView("croston_seq")
    return spark.sql(
        _croston_sql("SELECT day, d, t, q FROM croston_seq", "BIGINT")
    )


# ---- Rayleigh circular-uniformity test --------------------------------------


def _rayleigh_sql(table: str, bigint: str, hour: str) -> str:
    """Shared Rayleigh text over the hour-of-day circle: per-hour
    counts are exact; each hour's cos/sin factor is a libm call on
    the same correctly-rounded angle (2π·h/24 — pi() is the same
    double in both engines) pinned DECIMAL(18,12) BEFORE the count
    multiplies it (the ln-pin rule for cos/sin); per-hour terms are
    pinned DECIMAL(28,6) so the 24-term sums are order-insensitive;
    atan2 (libm) is pinned DECIMAL(18,9) before the hour rescale."""
    ang = "(CAST(2 AS DOUBLE) * pi() * h / 24)"
    cospin = f"CAST(CAST(cos({ang}) AS DECIMAL(18,12)) AS DOUBLE)"
    sinpin = f"CAST(CAST(sin({ang}) AS DECIMAL(18,12)) AS DOUBLE)"
    return f"""
    WITH hourly AS (
      SELECT {hour} AS h, CAST(COUNT(*) AS {bigint}) AS n_h
      FROM {table} GROUP BY 1
    ),
    terms AS (
      SELECT n_h,
             CAST(n_h * {cospin} AS DECIMAL(28,6)) AS c_term,
             CAST(n_h * {sinpin} AS DECIMAL(28,6)) AS s_term
      FROM (SELECT CAST(h AS DOUBLE) AS h, n_h FROM hourly)
    ),
    mo AS (
      SELECT CAST(SUM(n_h) AS {bigint}) AS n,
             CAST(SUM(c_term) AS DOUBLE) AS c,
             CAST(SUM(s_term) AS DOUBLE) AS s
      FROM terms
    ),
    r AS (
      SELECT n, c, s,
             sqrt(c * c + s * s) / n AS rbar
      FROM mo
    )
    SELECT n AS n_events,
           CAST(CAST(rbar AS DECIMAL(18,9)) AS DOUBLE)
             AS resultant_length,
           CAST(CAST(n * rbar * rbar AS DECIMAL(18,6)) AS DOUBLE)
             AS rayleigh_z,
           CAST(CAST(
             CASE WHEN CAST(CAST(atan2(s, c) AS DECIMAL(18,9))
                       AS DOUBLE) < 0
                  THEN (CAST(CAST(atan2(s, c) AS DECIMAL(18,9))
                        AS DOUBLE) + 2 * pi()) * 24 / (2 * pi())
                  ELSE CAST(CAST(atan2(s, c) AS DECIMAL(18,9))
                       AS DOUBLE) * 24 / (2 * pi()) END
             AS DECIMAL(18,6)) AS DOUBLE) AS mean_hour
    FROM r
    """


@query(
    "events_rayleigh_hour_uniformity",
    oracle=_rayleigh_sql(
        "events",
        "BIGINT",
        "CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT)",
    ),
)
def events_rayleigh_hour_uniformity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rayleigh test of hour-of-day uniformity — CIRCULAR statistics,
    the family every linear test here gets wrong on a clock: hours
    23 and 0 are neighbors, so a chi-square against uniform (which
    ``orders_chi2`` machinery could do) detects ANY lumpiness but
    can't say "traffic concentrates AROUND 14:00", and a linear mean
    of hours is meaningless across midnight. The mean resultant
    length R̄ = |Σe^{iθ}|/n measures concentration (0 = uniform,
    1 = a single spike), z = nR̄² is Rayleigh's statistic (1919),
    and atan2 of the resultant gives the MEAN HOUR the right way.
    The diurnal-shape complement of ``events_by_hour``'s raw
    histogram and the circadian face of the bot-screen family
    (scripted traffic is either too flat or too spiked).

    Exactness: per-hour counts are exact; cos/sin/atan2 are the only
    libm calls — each pinned (DECIMAL(18,12) factors before the
    count products, DECIMAL(18,9) on atan2) so a final-ulp libm
    disagreement is rounded away; per-hour terms pinned
    DECIMAL(28,6) (12 integer digits of count headroom beyond any
    corpus) before the 24-term sums.

    Plan: ONE scan → a 24-group hash aggregate; everything after is
    a 24-row projection and a 1-row finish."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("rayleigh_events")
    return spark.sql(
        _rayleigh_sql(
            "rayleigh_events", "BIGINT", "CAST(hour(ts) AS BIGINT)"
        )
    )


# ---- Bradley–Terry preference-pair ratings (RLHF-data QA) --------------
#
# Hunter (2004), "MM algorithms for generalized Bradley-Terry models":
# pairwise preference outcomes → item strengths via the
# minorize-maximize update  p_i ← W_i / Σ_{j≠i} n_ij / (p_i + p_j),
# renormalized to mean 1 each round. The RLHF-data QA operator: given
# a table of A/B preference judgments, which sources actually win?

BT_ITERS = 5       # fixed unroll keeps the oracle SQL-expressible
BT_STRIDE = 7      # doc d vs doc d+7: 7 ⊥ 20 sources → the comparison
                   # graph is a connected circulant over ALL sources


def _bt_base_parts(table: str, w_tbl: str = "w") -> list[str]:
    """The data-sized half, shared verbatim by both engines:
    stride-paired comparisons (winner by n_chars, tie → the
    lower-doc_id side) reduced to the ≤|sources|² aggregate frames
    the MM loop runs on — directed win counts ``w``, symmetric
    comparison counts ``n``, compared-item list ``items``, and total
    wins ``tw`` (LEFT JOIN: a compared item CAN have zero wins).
    ``w_tbl`` names where downstream CTEs read the win counts from —
    the inline ``w`` CTE by default, or a checkpointed view when the
    caller materializes ``w`` first (eval_win_rate_matrix); same
    parameterization discipline as ``_bt_iter_parts``."""
    return [
        f"""comps AS (
      SELECT a.source AS sa, b.source AS sb,
             CASE WHEN a.n_chars >= b.n_chars THEN 1 ELSE 0 END AS a_wins
      FROM {table} a JOIN {table} b ON b.doc_id = a.doc_id + {BT_STRIDE}
    )""",
        """w AS (
      SELECT CASE WHEN a_wins = 1 THEN sa ELSE sb END AS i,
             CASE WHEN a_wins = 1 THEN sb ELSE sa END AS j,
             CAST(COUNT(*) AS BIGINT) AS w_ij
      FROM comps GROUP BY 1, 2
    )""",
        f"""n AS (
      SELECT i, j, CAST(SUM(cnt) AS BIGINT) AS n_ij FROM (
        SELECT i, j, w_ij AS cnt FROM {w_tbl}
        UNION ALL
        SELECT j AS i, i AS j, w_ij AS cnt FROM {w_tbl}
      ) both_dirs GROUP BY 1, 2
    )""",
        """items AS (SELECT DISTINCT i FROM n)""",
        f"""tw AS (
      SELECT items.i, CAST(COALESCE(SUM(w.w_ij), 0) AS BIGINT) AS wins_i
      FROM items LEFT JOIN {w_tbl} w ON w.i = items.i GROUP BY items.i
    )""",
    ]


def _bt_iter_parts(n_tbl: str, tw_tbl: str, items_tbl: str) -> list[str]:
    """The MM unroll, shared verbatim by both engines, parameterized
    only on WHERE the three aggregate frames live (inline CTEs for the
    oracle, persisted op-scoped views for Spark — see the operator
    docstring for why). Determinism discipline: every cross-item sum
    pins its terms DECIMAL(28,12) BEFORE SUM (order-insensitive
    decimal addition), every per-item rating pins DECIMAL(18,12) per
    round — the text_logreg_train_gd rule. The mean-1 renormalization
    rides window aggregates over the ≤|items|-row frame (bounded-frame
    exemption: |items| = |sources|, never data-sized)."""
    parts = [
        f"p0 AS (SELECT i, CAST(1.0 AS DOUBLE) AS p FROM {items_tbl})"
    ]
    for t in range(1, BT_ITERS + 1):
        parts.append(f"""d{t} AS (
      SELECT n.i,
             SUM(CAST(n.n_ij / (pi.p + pj.p) AS DECIMAL(28,12))) AS den
      FROM {n_tbl} n
      JOIN p{t - 1} pi ON pi.i = n.i
      JOIN p{t - 1} pj ON pj.i = n.j
      GROUP BY n.i
    )""")
        parts.append(f"""praw{t} AS (
      SELECT d.i,
             CAST(CAST(tw.wins_i / CAST(d.den AS DOUBLE)
                  AS DECIMAL(18,12)) AS DOUBLE) AS p
      FROM d{t} d JOIN {tw_tbl} tw ON tw.i = d.i
    )""")
        parts.append(f"""p{t} AS (
      SELECT i,
             CAST(CAST((p * (COUNT(*) OVER ()))
                       / CAST(SUM(CAST(p AS DECIMAL(28,12))) OVER ()
                              AS DOUBLE)
                  AS DECIMAL(18,12)) AS DOUBLE) AS p
      FROM praw{t}
    )""")
    return parts


def _bt_final_select(n_tbl: str, tw_tbl: str) -> str:
    return f"""
    SELECT pf.i AS source,
           CAST(CAST(pf.p AS DECIMAL(18,6)) AS DOUBLE) AS rating,
           tw.wins_i AS wins,
           nt.n_i AS n_comparisons
    FROM p{BT_ITERS} pf
    JOIN {tw_tbl} tw ON tw.i = pf.i
    JOIN (SELECT i, CAST(SUM(n_ij) AS BIGINT) AS n_i
          FROM {n_tbl} n GROUP BY i) nt
      ON nt.i = pf.i
    ORDER BY source
    """


def _bt_sql(table: str) -> str:
    """The whole model as ONE text (the oracle's form): base + unroll
    + final. tests/test_bt_property.py runs THIS text on synthetic
    frames against a direct Python reference."""
    joined = ",\n    ".join(
        _bt_base_parts(table) + _bt_iter_parts("n", "tw", "items")
    )
    return f"WITH {joined}\n{_bt_final_select('n', 'tw')}"


@query("eval_bradley_terry_ratings", oracle=_bt_sql("documents"))
def eval_bradley_terry_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley–Terry item strengths from pairwise preferences — the
    preference-data QA rung an RLHF pipeline runs before training a
    reward model: do the aggregated A/B judgments produce a coherent
    strength ordering, and which sources dominate? Comparisons pair
    doc d against doc d+7 (stride coprime to the source count, so the
    comparison graph is one connected circulant — the condition
    Hunter's MM convergence needs); the longer document wins, tie →
    the lower-doc_id side. 5 MM rounds p_i ← W_i / Σ_j n_ij/(p_i+p_j),
    mean-1 renormalized, all fixed-point pinned so the trajectory is
    bit-identical in both engines (the oracle replays training, not
    just the final state — the embedding_kmeans_train discipline).

    Spark-side shape: the data-sized half (stride self-join → win
    counts) runs ONCE and the ≤|sources|²-row ``n``/``tw``/``items``
    aggregates are persisted behind op-scoped views; only then does
    the MM unroll run over them. Inlining everything as one CTE text
    (the oracle's form) is correct but exponential in Spark — CTEs
    are inlined per reference, and each round references the previous
    twice, so the base self-join would re-execute ~4^ITERS times
    (measured: 287s at sf0.01 inline vs ~5s materialized; DuckDB
    auto-materializes CTEs so the oracle text doesn't care).

    Scale: the ONLY data-sized stages are the stride equi-self-join
    and the (winner, loser) count aggregate; each MM round is two
    broadcast-sized hash joins and one ≤|sources|²-row decimal
    aggregate, the normalizer a window over |sources| rows. Zero
    driver-side math. tests/test_bt_property.py checks the full
    trajectory against a direct Python implementation."""
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("bt_documents")
    base = ",\n    ".join(_bt_base_parts("bt_documents"))
    for frame in ("n", "tw", "items"):
        # localCheckpoint (the graph.py lineage-cut pattern): these
        # are ≤|sources|²-row frames every MM round re-references —
        # without the cut, each round's view plan EMBEDS the whole
        # upstream tree and Catalyst analysis compounds per round
        # (measured 1.0s → 7.4s by round 5; flat ~0.2s with the cut).
        # coalesce(1) keeps each round's stages single-task.
        cp = (
            spark.sql(f"WITH {base}\nSELECT * FROM {frame}")
            .coalesce(1)
            .localCheckpoint()
        )
        cp.createOrReplaceTempView(f"bt_{frame}")
    # materialize each MM round: one round's text at a time, the
    # previous round behind a checkpointed view — linear in BT_ITERS
    # where the single-text unroll is exponential (see docstring)
    iter_parts = _bt_iter_parts("bt_n", "bt_tw", "bt_items")
    p0 = spark.sql(f"WITH {iter_parts[0]} SELECT * FROM p0").localCheckpoint()
    p0.createOrReplaceTempView("bt_p0")
    for t in range(1, BT_ITERS + 1):
        # this round's three CTEs, with p{t-1} read from its view
        round_sql = ",\n    ".join(iter_parts[3 * t - 2 : 3 * t + 1])
        round_sql = round_sql.replace(f"p{t - 1} p", f"bt_p{t - 1} p")
        pt = (
            spark.sql(f"WITH {round_sql}\nSELECT * FROM p{t}")
            .coalesce(1)
            .localCheckpoint()
        )
        pt.createOrReplaceTempView(f"bt_p{t}")
    final = _bt_final_select("bt_n", "bt_tw").replace(
        f"FROM p{BT_ITERS} pf", f"FROM bt_p{BT_ITERS} pf"
    )
    return spark.sql(final)


# ---- Fleiss' kappa inter-annotator agreement (RLHF-data QA) -------------
#
# Fleiss (1971): chance-corrected agreement for R raters assigning N
# subjects to K categories — the companion QA metric to
# eval_bradley_terry_ratings: BT asks "are the judgments coherent
# across items", kappa asks "do the annotators even agree". The
# annotation table is synthesized deterministically (hash-seeded
# noise over a length-bucket base label), so the statistic's whole
# pipeline — per-doc category counts, P_i, marginal p_j, P_e, kappa —
# is oracle-replayed.

FLEISS_R = 3          # annotators
FLEISS_K = 3          # categories (length buckets)
FLEISS_NOISE_MOD = 5  # annotator flips to a hash category 1/5 of the time


def _fleiss_sql(table: str, h60) -> str:
    base = (
        "CASE WHEN d.n_chars < 200 THEN 0"
        " WHEN d.n_chars < 350 THEN 1 ELSE 2 END"
    )
    nkey = h60(
        "'fk' || CAST(r.r AS STRING) || '|' || CAST(d.doc_id AS STRING)"
    )
    vkey = h60(
        "'fv' || CAST(r.r AS STRING) || '|' || CAST(d.doc_id AS STRING)"
    )
    rs = ", ".join(f"({i})" for i in range(FLEISS_R))
    return f"""
    WITH labels AS (
      SELECT d.doc_id,
             CASE WHEN {nkey} % {FLEISS_NOISE_MOD} = 0
                  THEN {vkey} % {FLEISS_K}
                  ELSE {base} END AS cat
      FROM {table} d CROSS JOIN (VALUES {rs}) AS r(r)
    ),
    cell AS (
      SELECT doc_id, cat, CAST(COUNT(*) AS BIGINT) AS nij
      FROM labels GROUP BY 1, 2
    ),
    per_doc AS (
      SELECT doc_id, CAST(SUM(nij * nij) AS BIGINT) AS s
      FROM cell GROUP BY 1
    ),
    pbar AS (
      SELECT SUM(CAST((CAST(s AS DOUBLE) - {FLEISS_R})
                      / ({FLEISS_R} * ({FLEISS_R} - 1))
                 AS DECIMAL(28,12))) AS pbar_sum,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM per_doc
    ),
    pj AS (
      SELECT cat, CAST(SUM(nij) AS BIGINT) AS tot FROM cell GROUP BY 1
    ),
    pe AS (
      SELECT SUM(CAST(
               (CAST(tot AS DOUBLE) / (pb.n * {FLEISS_R}))
               * (CAST(tot AS DOUBLE) / (pb.n * {FLEISS_R}))
             AS DECIMAL(28,12))) AS pe_sum
      FROM pj CROSS JOIN pbar pb
    )
    SELECT pb.n AS n_docs,
           CAST({FLEISS_R} AS BIGINT) AS n_annotators,
           CAST(CAST(CAST(pb.pbar_sum AS DOUBLE) / pb.n
                AS DECIMAL(18,6)) AS DOUBLE) AS p_bar,
           CAST(CAST(CAST(pe.pe_sum AS DOUBLE)
                AS DECIMAL(18,6)) AS DOUBLE) AS p_e,
           CASE WHEN CAST(pe.pe_sum AS DOUBLE) = 1 THEN NULL
                ELSE CAST(CAST(
                  (CAST(pb.pbar_sum AS DOUBLE) / pb.n
                    - CAST(pe.pe_sum AS DOUBLE))
                  / (1 - CAST(pe.pe_sum AS DOUBLE))
                AS DECIMAL(18,6)) AS DOUBLE)
           END AS kappa
    FROM pbar pb CROSS JOIN pe
    """


def _h60_duck_st(expr: str) -> str:
    return f"try_cast('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def _h60_spark_st(expr: str) -> str:
    return f"cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)"


@query(
    "eval_fleiss_kappa",
    oracle=_fleiss_sql("documents", _h60_duck_st),
)
def eval_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa over a deterministic 3-annotator labeling of the
    corpus (length-bucket base label, each annotator hash-flipping to
    a hash category 20% of the time — the reproducible-assignment
    discipline of events_ab_test_lift). Output is one row:
    (n_docs, n_annotators, p_bar, p_e, kappa).

    Exactness: category counts are integers; P_i and p_j² are each
    ONE IEEE chain over exact integers pinned DECIMAL(28,12) BEFORE
    the cross-doc/category sums (order-insensitive), and the final
    kappa is one chain over two exact aggregates — bit-stable across
    engines.

    Scale: one hash-label projection (md5 inside codegen, no UDF) ×
    R=3 broadcast annotator rows, two hash aggregates (doc-category
    cells, then per-doc), and ≤K+1-row finishing joins. No window,
    no driver math."""
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("fleiss_documents")
    return spark.sql(_fleiss_sql("fleiss_documents", _h60_spark_st))


# ---- pairwise win-rate matrix with Wilson bounds ------------------------

WR_Z = "1.96"  # 95% Wilson interval


def _winrate_final(n_tbl: str, w_tbl: str) -> str:
    """The matrix finish over the (already aggregated) directed-win
    and symmetric-count frames — shared verbatim by both engines.
    Each row's Wilson lower bound is ONE IEEE chain over exact
    integers, pinned DECIMAL(18,6) (the ln-pin rule's sqrt cousin)."""
    p = "(CAST(pr.wins_i AS DOUBLE) / pr.n_ij)"
    z2n = f"({WR_Z} * {WR_Z} / pr.n_ij)"
    return f"""
    SELECT pr.i, pr.j,
           pr.n_ij AS n_comparisons,
           pr.wins_i,
           CAST(CAST({p} AS DECIMAL(18,6)) AS DOUBLE) AS win_rate,
           CAST(CAST(
             ({p} + {z2n} / 2
               - {WR_Z} * sqrt(({p} * (1 - {p}) + {z2n} / 4) / pr.n_ij))
             / (1 + {z2n})
           AS DECIMAL(18,6)) AS DOUBLE) AS wilson_lo
    FROM (
      SELECT n.i, n.j, n.n_ij,
             CAST(COALESCE(w.w_ij, 0) AS BIGINT) AS wins_i
      FROM {n_tbl} n LEFT JOIN {w_tbl} w ON w.i = n.i AND w.j = n.j
    ) pr
    ORDER BY pr.i, pr.j
    """


def _winrate_oracle() -> str:
    base = ",\n    ".join(_bt_base_parts("documents"))
    return f"WITH {base}\n{_winrate_final('n', 'w')}"


@query("eval_win_rate_matrix", oracle=_winrate_oracle())
def eval_win_rate_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw pairwise preference matrix the Bradley–Terry MM
    consumes, reported directly: for every directed source pair
    (i, j) with ≥1 comparison, the comparison count, i's wins, the
    win rate, and its 95% Wilson lower bound — the
    sample-size-honest readout an RLHF data review reads next to the
    fitted strengths (a 3/3 sweep and a 300/300 sweep have the same
    win rate but very different Wilson floors). Same stride-pairing
    comparison derivation as ``eval_bradley_terry_ratings``
    (``_bt_base_parts``), so the two operators certify each other.

    Scale: the data-sized half is the one stride equi-self-join +
    the (winner, loser) aggregate, materialized ONCE behind a
    localCheckpointed view on the Spark side (the CTE text references
    it three times; DuckDB materializes CTEs itself); the matrix
    finish is ≤|sources|²-row joins and per-row scalar chains."""
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("wr_documents")
    base = ",\n    ".join(_bt_base_parts("wr_documents")[:2])  # comps, w
    w = (
        spark.sql(f"WITH {base}\nSELECT * FROM w")
        .coalesce(1)
        .localCheckpoint()
    )
    w.createOrReplaceTempView("wr_w")
    # the n CTE reads the win counts from the checkpointed view —
    # parameterized, not string-rewritten (so future edits to the CTE
    # text can't be silently mis-rewired)
    n_sql = _bt_base_parts("wr_documents", w_tbl="wr_w")[2]
    n_body = n_sql.split(" AS (", 1)[1].rsplit(")", 1)[0]
    spark.sql(n_body).coalesce(1).localCheckpoint().createOrReplaceTempView(
        "wr_n"
    )
    return spark.sql(_winrate_final("wr_n", "wr_w"))
