"""Record-linkage operators: blocked fuzzy matching with exact
edit-distance verification.

Registered AFTER the driver's frozen first-50 CORRECTNESS window
(tests/test_testdata_schema.py::test_driver_window_is_pinned) — this
family lives in its own late-imported module for that reason; do not
fold it back into joins.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .registry import query


# ---- blocked fuzzy match (record linkage) ----------------------------

FUZZY_MAX_LEV = 3     # verify: edit distance bound for a link
FUZZY_DF_CAP = 4096   # blocking guard: drop tokens hotter than this


@query(
    "part_name_fuzzy_pairs",
    oracle=f"""
    WITH ents AS (SELECT DISTINCT p_name FROM part),
    toks AS (
      SELECT p_name, unnest(string_split(p_name, ' ')) AS tok FROM ents
    ),
    keep AS (
      SELECT tok FROM toks GROUP BY tok HAVING COUNT(*) <= {FUZZY_DF_CAP}
    ),
    tf AS (SELECT t.p_name, t.tok FROM toks t JOIN keep k ON k.tok = t.tok),
    cand AS (
      SELECT DISTINCT a.p_name AS a_name, b.p_name AS b_name
      FROM tf a JOIN tf b ON a.tok = b.tok AND a.p_name < b.p_name
    )
    SELECT a_name, b_name,
           CAST(levenshtein(a_name, b_name) AS INT) AS lev
    FROM cand
    WHERE levenshtein(a_name, b_name) <= {FUZZY_MAX_LEV}
    """,
)
def part_name_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage via blocked fuzzy matching: candidate pairs from
    a shared-token BLOCK join, verified by exact Levenshtein distance
    (≤ {FUZZY_MAX_LEV}) — the blocking+verify shape every
    entity-resolution system uses, because edit distance over the full
    cross product is O(n²·len²) and the block join prunes it to
    near-linear.

    Scale design: (1) linkage runs over the DISTINCT-entity frame, so
    cost scales with entity diversity, not row count; (2) blocking
    tokens hotter than FUZZY_DF_CAP are dropped before the self-join
    (the stop-token guard — the same DF_CAP idea as the shingle rungs
    in dedup.py), bounding any block's pair fan-out at CAP²; (3) the
    pair set is DISTINCT-ed before the O(len²) Levenshtein verify so
    a pair sharing k tokens is verified once, not k times. Both
    engines implement classic unit-cost edit distance, so the verify
    agrees exactly."""
    ents = load_table(spark, sf_dir, "part").select("p_name").distinct()
    toks = ents.select(
        "p_name", F.explode(F.split("p_name", " ")).alias("tok")
    )
    keep = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= FUZZY_DF_CAP
    )
    tf = toks.join(keep.select("tok"), "tok")
    cand = (
        tf.alias("a")
        .join(
            tf.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_name").alias("a_name"),
            F.col("b.p_name").alias("b_name"),
        )
        .distinct()
    )
    lev = F.levenshtein("a_name", "b_name")
    return cand.filter(lev <= FUZZY_MAX_LEV).select(
        "a_name", "b_name", lev.cast("int").alias("lev")
    )
