"""Vectorized schema enforcement (reference T11).

Replicates ``helpers.enforceSchemaGenerator`` (/root/reference/
dataflow-flex/football_pipeline/utils/helpers.py:51-101) as ONE
whole-stage-codegen'd projection instead of a per-record Python loop:

1. required-presence check (REQUIRED + null → error)
2. cast to the target type (STRING/INTEGER/TIMESTAMP), cast failure →
   error with the offending value in the message
3. projection to exactly the schema's fields (fields not in the
   schema are dropped — enforcement IS a projection)

The per-record "first error wins" of the reference's raise-on-first
becomes an ``_error`` column: a COALESCE over the per-field error
expressions in schema order — same precedence, no Python in the loop.
Rows are NOT split here; the pipeline aggregates errors to group
level first (one bad record dead-letters its whole season-league
group, transforms.py:180-184 parity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .unified_schema import ParsedSchema

ERROR_COL = "_error"

_CAST_TARGET = {
    "STRING": "string",
    "INTEGER": "long",
    # The reference passes timestamps through as ISO-8601 strings for
    # BigQuery to parse (helpers.py:69); we land a real TimestampType.
    "TIMESTAMP": "timestamp",
}


def _cast(col: Column, ftype: str) -> Column:
    out = col.try_cast(_CAST_TARGET[ftype])
    if ftype == "TIMESTAMP":
        # Spark happily parses strings like '-1000' into year -1000,
        # which Arrow/Python datetime cannot represent. Anything outside
        # datetime's year range [1, 9999] is a cast failure, not a value.
        out = F.when(F.year(out).between(1, 9999), out)
    return out


def _field_error(col: Column, ftype: str, fname: str, mode: str) -> Column:
    missing = F.when(
        col.isNull() & F.lit(mode == "REQUIRED"),
        F.lit(f"Missing required field: '{fname}' in record."),
    )
    cast_fail = F.when(
        col.isNotNull() & _cast(col, ftype).isNull(),
        F.concat(
            F.lit(f"Type validation failed for field '{fname}'. Could not cast value '"),
            col.cast("string"),
            F.lit(f"' to target type '{ftype}'."),
        ),
    )
    return F.coalesce(missing, cast_fail)


def enforce_schema(df: DataFrame, schema: ParsedSchema, keep: list[str] | None = None) -> DataFrame:
    """Returns df projected to the schema's fields (cast), plus an
    ``_error`` column (null = record valid) and any ``keep`` passthrough
    columns (group_pk etc.). Fields absent from the input entirely are
    treated as null (reference: `field_name not in record`)."""
    keep = keep or []
    present = set(df.columns)
    errors: list[Column] = []
    out: list[Column] = []
    for f in schema.fields:
        col = F.col(f.name) if f.name in present else F.lit(None)
        errors.append(_field_error(col, f.type, f.name, f.mode))
        out.append(_cast(col, f.type).alias(f.name))
    # Record-level errors carried in from the transform (e.g. the
    # int() guard) take precedence — they fired first in the reference.
    pre = [F.col("_err")] if "_err" in present else []
    return df.select(
        *[F.col(k) for k in keep],
        F.coalesce(*pre, *errors).alias(ERROR_COL) if (pre or errors) else F.lit(None).alias(ERROR_COL),
        *out,
    )
