"""Regression pin for the ADVICE-r8 overflow finding: the per-user
rev-squared moment in events_ab_test_lift must be pinned at
DECIMAL(38,6) (32 integer digits), not DECIMAL(18,6) (12) — a user
with arm revenue above ~1e6 squares past 1e12 and the narrow pin made
Spark (ANSI off) silently NULL the term while DuckDB errored, so the
cross-engine stats diverged exactly on the large data the gate never
sees."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


def test_rev_squared_moment_survives_large_revenue(spark):
    # revenue 5e7 -> square 2.5e15: 16 integer digits, > the 12 a
    # DECIMAL(18,6) holds, < the 32 a DECIMAL(38,6) holds
    big = 5.0e7
    df = spark.createDataFrame([(big,), (2.0,)], "rev double")
    xd = F.col("rev").cast("double")
    out = df.agg(
        F.sum((xd * xd).cast("decimal(38,6)")).alias("sxx")
    ).collect()[0]
    assert out.sxx is not None
    spark_sxx = float(out.sxx)
    duck_sxx = duckdb.sql(
        f"SELECT CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) "
        f"FROM (VALUES (CAST({big} AS DOUBLE)), (CAST(2.0 AS DOUBLE))) t(x)"
    ).fetchone()[0]
    assert spark_sxx == duck_sxx


def test_narrow_pin_would_have_failed(spark):
    """The failure mode the fix removes: the same moment at the old
    DECIMAL(18,6) pin overflows — ArithmeticException under ANSI
    (Spark 4 default, this session), silent NULL under non-ANSI;
    either way the readout breaks on revenue above ~1e6."""
    import pytest
    from pyspark.errors import ArithmeticException

    df = spark.createDataFrame([(5.0e7,)], "rev double")
    xd = F.col("rev").cast("double")
    with pytest.raises(ArithmeticException):
        df.agg(
            F.sum((xd * xd).cast("decimal(18,6)")).alias("sxx")
        ).collect()
