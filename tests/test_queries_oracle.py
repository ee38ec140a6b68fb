"""Every registered query with an oracle must hash-match DuckDB at
sf0.001 (the driver re-checks at sf0.01 — same semantics, more rows).
Queries without an oracle just need to run and return a DataFrame."""

from __future__ import annotations

import pytest

from football_etl_pipeline_spark.operators import ORACLES, QUERIES

from .oracle_util import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        assert_matches_oracle(sdf, duck, ORACLES[name], name)
    else:
        # rows-only check (non-SQL-expressible op)
        assert sdf.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_registry_consistency():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) > 0
