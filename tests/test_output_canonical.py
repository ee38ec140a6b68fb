"""Registry-wide output-canonicalization gate.

The driver's correctness harness canonicalizes both the Spark and the
DuckDB result through a pandas frame (sort + value-hash). Two output
shapes break that canonicalizer even when the values are exact:

- ``DecimalType`` final columns: Spark returns ``decimal.Decimal``
  cells while DuckDB's pandas client returns ``float64`` — the value
  hashes diverge although a strict cell compare matches.
- ``ArrayType`` / ``MapType`` final columns: pandas cannot hash list
  cells (``TypeError: unhashable type: 'list'``).

Repo rule (README "Determinism"): decimal math stays *internal* (it is
what makes double sums order-insensitive) but every query's FINAL
schema is scalar, non-decimal. This test asserts the rule for every
registered query so a driver-list expansion can never re-introduce the
round-1 red rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from football_etl_pipeline_spark.operators import QUERIES as ALL_QUERIES


def _bad_fields(schema: T.StructType) -> list[str]:
    bad = []
    for f in schema.fields:
        dt = f.dataType
        if isinstance(dt, (T.DecimalType, T.ArrayType, T.MapType, T.StructType)):
            bad.append(f"{f.name}: {dt.simpleString()}")
    return bad


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_final_schema_is_scalar_non_decimal(name, spark, sf_dir):
    df = ALL_QUERIES[name](spark, sf_dir)
    bad = _bad_fields(df.schema)
    assert not bad, (
        f"query {name!r} has non-canonical final columns {bad}; "
        "cast DECIMAL results to DOUBLE and serialize arrays/maps "
        "(array_join/to_json) in the final projection of BOTH dialects"
    )
