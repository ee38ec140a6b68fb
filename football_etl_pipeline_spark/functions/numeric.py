"""Deterministic numeric aggregation helpers.

Floating-point SUM/AVG results depend on accumulation order, which
differs between Spark (partial aggregation across partitions) and the
DuckDB oracle — and between two runs of the SAME Spark job at different
parallelism. Routing sums through DECIMAL makes them exact and
order-insensitive, so the result is reproducible at any partition
count (local[32] today, 1000 executors tomorrow) AND hash-identical to
the oracle.

SCALE RULE: the cast scale must be >= the exact decimal scale of the
expression, so the double→decimal cast is EXACT (the nearest grid
point to the double IS the true value) and involves no rounding at
all. Rounding a near-tie value (e.g. a 6-dp product cast at scale 4
when digits 5-6 are "50") diverges between Spark — which rounds the
SHORTEST decimal string of the double, HALF_UP — and DuckDB — which
rounds the BINARY double. Prices/discounts/taxes here are 2-dp, so a
triple product has <= 6 decimals: scale 6 is exact for every money
expression in the library. Expressions that are NOT finite-decimal
(division, sqrt, ln) must never be decimal-cast pre-aggregation;
do scalar division only AFTER the aggregate.

Cost note: decimal aggregation is marginally slower than double
aggregation but stays inside whole-stage codegen (no UDF); it's the
right trade for a correctness-gated pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Matches the SQL used by oracles: CAST(SUM(CAST(x AS DECIMAL(18,S))) AS DOUBLE)
DEC_SCALE = 6


def dmul(*cols: Column) -> Column:
    """Product in double (IEEE — bit-identical in both engines)."""
    out = cols[0]
    for c in cols[1:]:
        out = out * c
    return out


def dsum(col: Column, scale: int = DEC_SCALE) -> Column:
    """Order-insensitive SUM of a double expression, returned as double."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column, scale: int = DEC_SCALE) -> Column:
    """Order-insensitive AVG: exact decimal sum / count, in double."""
    return (
        F.sum(col.cast(f"decimal(18,{scale})")).cast("double")
        / F.count(col)
    )
