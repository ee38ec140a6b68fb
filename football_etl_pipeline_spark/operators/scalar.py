"""Scalar function batteries: string, date/time, math, conditional,
array, and JSON functions — the expression surface (SURVEY.md §2c
"Scalar fns") beyond the reference's concat/regex/arithmetic/casts
(``transforms.py:49``, ``helpers.py:20,66-70``, ``main.py:15-22``).

All expressions are built-in ``pyspark.sql.functions`` — JVM-side,
inside whole-stage codegen. No Python UDFs anywhere in this module.

Oracle-parity notes baked into the choices below:
- ROUND on arbitrary doubles is avoided (engine tie-rounding differs);
  ceil/floor/abs/mod/sqrt are exact or correctly-rounded IEEE in both.
- extract-style functions are cast to explicit widths (Spark year() is
  INT, DuckDB's is BIGINT).
- weekday uses locale-stable full names (date_format 'EEEE' vs
  strftime '%A').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .registry import query


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT
      c_custkey,
      UPPER(c_name) AS up,
      LOWER(c_mktsegment) AS lo,
      CAST(LENGTH(c_name) AS INT) AS name_len,
      SUBSTR(c_name, 1, 8) AS prefix,
      c_name || '/' || c_mktsegment AS joined,
      LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
      REPLACE(c_name, 'Customer', 'Cust') AS replaced,
      REVERSE(c_mktsegment) AS rev,
      CAST(STRPOS(c_name, '#') AS INT) AS hash_pos,
      TRIM('  ' || c_mktsegment || ' ') AS trimmed,
      regexp_extract(c_name, '([0-9]+)', 1) AS digits,
      CASE WHEN c_name LIKE 'Customer%' THEN 1 ELSE 0 END AS is_cust,
      split_part(c_name, '#', 2) AS after_hash
    FROM customer
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.length("c_name").cast("int").alias("name_len"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("joined"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("replaced"),
        F.reverse("c_mktsegment").alias("rev"),
        F.instr("c_name", "#").cast("int").alias("hash_pos"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias("trimmed"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.when(F.col("c_name").like("Customer%"), 1).otherwise(0).alias("is_cust"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("after_hash"),
    )


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT
      o_orderkey,
      CAST(year(o_orderdate) AS INT) AS yr,
      CAST(month(o_orderdate) AS INT) AS mo,
      CAST(day(o_orderdate) AS INT) AS dom,
      CAST(quarter(o_orderdate) AS INT) AS qtr,
      date_trunc('month', o_orderdate) AS month_start,
      CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
      CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_epoch_start,
      strftime(o_orderdate, '%A') AS weekday_name,
      strftime(o_orderdate, '%Y-%m') AS ym,
      CAST(last_day(o_orderdate) AS DATE) AS eom,
      CAST(epoch(o_orderdate) AS BIGINT) AS unix_sec
    FROM orders
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("dom"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        # DuckDB's date_trunc returns DATE for day-or-coarser parts;
        # Spark returns TIMESTAMP — align on DATE.
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(F.col("o_orderdate"), 30).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("int")
        .alias("days_since_epoch_start"),
        F.date_format("o_orderdate", "EEEE").alias("weekday_name"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.last_day("o_orderdate").alias("eom"),
        F.unix_timestamp("o_orderdate").cast("bigint").alias("unix_sec"),
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      CAST(abs(l_extendedprice - 50000) AS DOUBLE) AS dist_from_mid,
      CAST(ceil(l_quantity / 10.0) AS BIGINT) AS qty_decile,
      CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_kbucket,
      CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
      CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
      CAST(greatest(l_quantity, l_discount * 100) AS DOUBLE) AS big,
      CAST(least(l_tax, l_discount) AS DOUBLE) AS small,
      CAST(sqrt(l_quantity) AS DOUBLE) AS qty_sqrt,
      CAST(l_quantity * l_quantity AS DOUBLE) AS qty_sq
    FROM lineitem
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000).cast("double").alias("dist_from_mid"),
        F.ceil(F.col("l_quantity") / 10.0).cast("bigint").alias("qty_decile"),
        F.floor(F.col("l_extendedprice") / 1000.0).cast("bigint").alias("price_kbucket"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100)
        .cast("double")
        .alias("big"),
        F.least(F.col("l_tax"), F.col("l_discount")).cast("double").alias("small"),
        F.sqrt(F.col("l_quantity")).cast("double").alias("qty_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).cast("double").alias("qty_sq"),
    )


@query(
    "scalar_conditional",
    oracle="""
    SELECT
      o_orderkey,
      CASE
        WHEN o_totalprice >= 300000 THEN 'large'
        WHEN o_totalprice >= 100000 THEN 'medium'
        ELSE 'small'
      END AS size_class,
      COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_decoded,
      CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END AS is_hot,
      IF(o_orderdate < TIMESTAMP '1998-01-01', 'old', 'recent') AS era
    FROM orders
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_decoded"
        ),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("is_hot"),
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), "old"
        )
        .otherwise("recent")
        .alias("era"),
    )


@query(
    "scalar_array_funcs",
    oracle="""
    SELECT
      doc_id,
      CAST(len(words) AS INT) AS n_words,
      CAST(len(list_sort(list_distinct(words))) AS INT) AS n_unique,
      array_to_string(list_sort(list_distinct(words))[1:3], '|') AS first3_sorted,
      CAST(list_contains(words, 'data') AS BOOLEAN) AS has_data,
      array_to_string(list_sort(list_distinct(words))[1:3], '-') AS joined3
    FROM (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    )
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface over tokenized text: split/size/distinct/sort/
    slice/contains/join. (array_distinct output order is engine-
    specific, so distinct is always followed by sort. Array values are
    serialized with array_join in the FINAL projection — the driver's
    pandas canonicalizer cannot hash list cells, and the repo-wide
    output rule is scalar-only final schemas.)"""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    uniq_sorted = F.array_sort(F.array_distinct(words))
    return docs.select(
        "doc_id",
        F.size(words).cast("int").alias("n_words"),
        F.size(uniq_sorted).cast("int").alias("n_unique"),
        F.array_join(F.slice(uniq_sorted, 1, 3), "|").alias("first3_sorted"),
        F.array_contains(words, "data").alias("has_data"),
        F.array_join(F.slice(uniq_sorted, 1, 3), "-").alias("joined3"),
    )


@query(
    "scalar_json_funcs",
    oracle="""
    SELECT
      event_id,
      json_extract_string(props, '$.k') AS k_str,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
      CAST(json_extract_string(props, '$.missing') IS NULL AS BOOLEAN) AS missing_is_null
    FROM events
    """,
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from a string column (events.props)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
    )


@query(
    "posexplode_name_words",
    oracle="""
    SELECT p_partkey, i - 1 AS pos, words[i] AS word
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part),
    LATERAL (SELECT unnest(range(1, len(words)+1)) AS i)
    """,
)
def posexplode_name_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral 1→N expansion with ordinality: ``posexplode`` over the
    split part name (the LATERAL VIEW / UNNEST WITH ORDINALITY shape).
    Generator runs inside the projection — no shuffle; output row
    count is data-dependent, which is exactly what downstream
    repartitioning exists for at scale."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.posexplode(F.split("p_name", " ")).alias("pos", "word"),
    )


@query(
    "scalar_map_funcs",
    oracle="""
    WITH m AS (
      SELECT
        p_partkey,
        MAP {'brand': p_brand, 'type': p_type} AS attrs,
        MAP {'size': CAST(p_size AS VARCHAR)} AS extra
      FROM part
    )
    SELECT
      p_partkey,
      attrs['brand'][1] AS brand_val,
      array_to_string(map_keys(attrs), '|') AS attr_keys,
      array_to_string(map_values(attrs), '|') AS attr_vals,
      CAST(cardinality(map_concat(attrs, extra)) AS INT) AS n_merged
    FROM m
    """,
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType battery: build → element_at → keys/values → concat →
    cardinality. Maps stay JVM-side expressions (no UDF); key order is
    insertion order in BOTH engines, so the keys/values serialize to
    identical joined strings (final schema stays scalar-only for the
    driver's canonicalizer).

    (DuckDB v1.0 map subscript returns a LIST — the oracle indexes
    ``[1]`` to get the scalar Spark's ``element_at`` returns.)"""
    part = load_table(spark, sf_dir, "part")
    attrs = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    extra = F.create_map(F.lit("size"), F.col("p_size").cast("string"))
    return part.select(
        "p_partkey",
        F.element_at(attrs, "brand").alias("brand_val"),
        F.array_join(F.map_keys(attrs), "|").alias("attr_keys"),
        F.array_join(F.map_values(attrs), "|").alias("attr_vals"),
        F.size(F.map_concat(attrs, extra)).alias("n_merged"),
    )


@query(
    "scalar_regex_funcs",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, substr(text, 1, 200) AS s FROM documents
    )
    SELECT
      doc_id,
      regexp_matches(s, '[0-9]') AS has_digit,
      CAST(len(regexp_extract_all(s, '[aeiou]+')) AS INT) AS n_vowel_runs,
      CAST(len(regexp_extract_all(s, '[a-z]+')) AS INT) AS n_words,
      regexp_extract(s, '([a-z]{7,})', 1) AS first_long_word,
      regexp_replace(s, '[aeiou]', '*', 'g') AS devoweled
    FROM t
    """,
)
def scalar_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function family: rlike, extract-all counting, first-match
    extraction, and global replacement — restricted to vanilla
    character-class/quantifier patterns, the subset where Java's regex
    (Spark) and RE2 (DuckDB) agree match-for-match (the same contract
    ``text_bpe_token_count`` relies on; lookarounds/backrefs would
    not port). Evaluated over a 200-char prefix: a pure codegen
    projection, zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.substring("text", 1, 200).alias("s"))
    return t.select(
        "doc_id",
        F.col("s").rlike("[0-9]").alias("has_digit"),
        F.size(F.expr("regexp_extract_all(s, '[aeiou]+', 0)"))
        .cast("int")
        .alias("n_vowel_runs"),
        F.size(F.expr("regexp_extract_all(s, '[a-z]+', 0)"))
        .cast("int")
        .alias("n_words"),
        F.regexp_extract("s", "([a-z]{7,})", 1).alias("first_long_word"),
        F.regexp_replace("s", "[aeiou]", "*").alias("devoweled"),
    )



# ---- bitwise function family --------------------------------------------


@query(
    "scalar_bitwise_funcs",
    oracle="""
    WITH m AS (
      SELECT o_orderstatus,
             o_orderkey,
             ((o_orderkey & 255) << 8) | (o_custkey & 255) AS mask,
             xor(o_orderkey & 65535, o_custkey & 65535) AS xr
      FROM orders
    )
    SELECT o_orderstatus,
           COUNT(*)::BIGINT AS n,
           bit_and(o_orderkey)::BIGINT AS key_and,
           bit_or(o_orderkey)::BIGINT AS key_or,
           bit_xor(o_orderkey)::BIGINT AS key_xor,
           bit_xor(mask)::BIGINT AS mask_xor,
           SUM(bit_count(CAST(o_orderkey AS BIGINT)))::BIGINT
             AS total_popcount,
           SUM(bit_count(CAST(xr AS BIGINT)))::BIGINT
             AS total_xor_popcount
    FROM m GROUP BY o_orderstatus
    """,
)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function family — row-level AND/OR/XOR/shift masking,
    popcount, and the BIT_AND/BIT_OR/BIT_XOR aggregates — grouped by
    order status. The surface a bitmap/fingerprint workload leans on
    (``dedup_simhash``'s Hamming machinery uses popcount-over-XOR;
    this query pins the primitive family itself cross-engine,
    including the aggregate forms the simhash path doesn't touch).

    Everything is exact integer arithmetic on BIGINT — bit-identical
    across engines by definition; XOR-aggregates are order-insensitive
    (commutative group), AND/OR idempotent, so no determinism pinning
    is needed anywhere.

    Plan: a pure codegen mask projection into one partial+final hash
    aggregate on a 3-value key — one scan, one tiny shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.select(
        "o_orderstatus",
        "o_orderkey",
        F.expr(
            "shiftleft(o_orderkey & 255, 8) | (o_custkey & 255)"
        ).alias("mask"),
        F.expr("(o_orderkey & 65535) ^ (o_custkey & 65535)").alias("xr"),
    )
    return m.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_and("o_orderkey").alias("key_and"),
        F.bit_or("o_orderkey").alias("key_or"),
        F.bit_xor("o_orderkey").alias("key_xor"),
        F.bit_xor("mask").alias("mask_xor"),
        F.sum(F.bit_count("o_orderkey")).alias("total_popcount"),
        F.sum(F.bit_count("xr")).alias("total_xor_popcount"),
    )


# ---- URL function family --------------------------------------------------


@query(
    "scalar_url_funcs",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang
               || '&rev=2' AS url
      FROM documents
    )
    SELECT doc_id,
           url,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '^([a-z]+):', 1) AS protocol,
           regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param,
           regexp_extract(url, '[?&]rev=([^&#]*)', 1) AS rev_param
    FROM t
    """,
)
def scalar_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing family — host/path/protocol extraction and query-
    parameter lookup via Spark's native ``parse_url`` (the JVM-side
    java.net parser web-crawl curation pipelines lean on for
    domain-level filtering and dedup keys). URLs are synthesized
    deterministically from document attributes (the testdata carries
    no URL column), which also pins the generation expression
    cross-engine.

    The oracle can't call parse_url (no DuckDB analog), so it
    re-derives each component with anchored regexes — equivalence
    holds on this URL shape because the synthesized URLs are
    RFC-plain (no userinfo/port/fragment corner cases where
    java.net and a regex would diverge).

    Plan: pure codegen projection — one scan, zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"),
            F.lit("?lang="),
            F.col("lang"),
            F.lit("&rev=2"),
        ).alias("url"),
    )
    return t.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias(
            "lang_param"
        ),
        F.parse_url("url", F.lit("QUERY"), F.lit("rev")).alias(
            "rev_param"
        ),
    )


@query(
    "scalar_datetime_advanced",
    oracle="""
    SELECT
      o_orderkey,
      CAST(week(o_orderdate) AS INT) AS wk_iso,
      CAST(isoyear(o_orderdate) AS INT) AS iso_yr,
      CAST(dayofyear(o_orderdate) AS INT) AS doy,
      make_date(CAST(year(o_orderdate) AS INT),
                CAST(month(o_orderdate) AS INT), 1) AS first_of_month,
      CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus_2_months,
      CAST(o_orderdate + CAST(
        CASE WHEN (8 - isodow(o_orderdate)) % 7 = 0 THEN 7
             ELSE (8 - isodow(o_orderdate)) % 7 END
        AS BIGINT) * INTERVAL 1 DAY AS DATE) AS next_monday,
      CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
      CAST(epoch_ms(o_orderdate) AS BIGINT) AS epoch_ms
    FROM orders
    """,
)
def scalar_datetime_advanced(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The calendar-arithmetic face of the datetime surface
    (``scalar_date_funcs`` covers extraction): ISO week and ISO
    year (the pair that disagrees with the calendar year at year
    boundaries — the classic week-53 bug), day-of-year, month
    anchoring via make_date, month addition with end-of-month
    clamping (both engines clamp Jan 31 + 1 month to Feb's last
    day), strictly-after next-Monday computed as EXPLICIT isodow
    arithmetic (DuckDB has no next_day(); the same CASE text runs on
    both sides, so the convention is pinned rather than
    engine-defined), ISO week start via date_trunc, and epoch
    milliseconds. Pure projection — one scan, codegen'd
    expressions, no shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.weekofyear("o_orderdate").cast("int").alias("wk_iso"),
        F.expr("extract(YEAROFWEEK FROM o_orderdate)")
        .cast("int")
        .alias("iso_yr"),
        F.dayofyear("o_orderdate").cast("int").alias("doy"),
        F.expr(
            "make_date(CAST(year(o_orderdate) AS INT),"
            " CAST(month(o_orderdate) AS INT), 1)"
        ).alias("first_of_month"),
        F.add_months(F.col("o_orderdate"), 2).alias("plus_2_months"),
        F.expr(
            "CAST(date_add(CAST(o_orderdate AS DATE), CAST("
            " CASE WHEN (8 - (weekday(o_orderdate) + 1)) % 7 = 0"
            " THEN 7 ELSE (8 - (weekday(o_orderdate) + 1)) % 7 END"
            " AS INT)) AS DATE)"
        ).alias("next_monday"),
        F.date_trunc("week", "o_orderdate").cast("date").alias(
            "week_start"
        ),
        F.unix_millis(F.col("o_orderdate").cast("timestamp"))
        .cast("bigint")
        .alias("epoch_ms"),
    )
