"""Central registry mapping operator names to Spark callables and
DuckDB oracle SQL.

The driver harness (``/root/repo/__spark_entry__.py``) runs each
``QUERIES[name](spark, sf_dir)`` AND the matching ``ORACLES[name]``
via DuckDB on the same parquet, then compares row-count + schema +
order-insensitive value-hash. Two rules every operator follows:

1. **Column names match** — every computed column is aliased
   identically in the Spark code and the SQL.
2. **Values are bit-deterministic** — double aggregation order differs
   between engines, so money-style sums go through DECIMAL(18,N)
   (exact, order-insensitive) and are cast back to DOUBLE; scores from
   float math are rounded to a fixed scale in BOTH engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query operator and (optionally) its oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
