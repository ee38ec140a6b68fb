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

# ---- persisted-frame lifecycle ---------------------------------------
#
# Several operators persist() an intermediate frame that multiple plan
# subtrees read (shingle sets, simhash values, IVF affinities). The
# persist must outlive the operator function — the caller triggers the
# action later — so a try/finally inside the operator would defeat it.
# Instead every such persist is *tracked*, and harnesses (bench,
# verify, the driver adapter) call release_persists() once the
# previous query's action has run. Without this, a long session
# accumulates cached frames and later queries pay the memory/GC bill
# (measured 2.4× inflation on BENCH_r02 tail queries).
#
# NOT thread-safe by design: the tracker is a plain module-level list,
# matching the single-threaded harness contract (bench/verify/driver
# run queries sequentially). Concurrent query runners would need one
# tracker per runner or a lock around persist/release.

_LIVE_PERSISTS: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """``df.persist()`` registered for later bulk release."""
    df.persist()
    _LIVE_PERSISTS.append(df)
    return df


def release_persists() -> int:
    """Unpersist every tracked frame; returns how many were released.

    Safe to call at any point where no returned-but-unexecuted plan
    still needs the cache (i.e. after the previous query's action)."""
    n = len(_LIVE_PERSISTS)
    for df in _LIVE_PERSISTS:
        df.unpersist()
    _LIVE_PERSISTS.clear()
    return n


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
