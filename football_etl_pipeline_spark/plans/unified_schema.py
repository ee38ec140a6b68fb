"""Unified-schema registry: versioned, externally declarable, runtime
enforced.

Replaces the reference's THREE schema consumers (``helpers.parseSchema``
/root/reference/dataflow-flex/football_pipeline/utils/helpers.py:30-49,
``helpers.bqSchemaFromJson`` helpers.py:104-118, and the dead duplicate
``utils/gcp.py:27-55``) with ONE parser and ONE explicit mode-default
policy.

Mode-default decision (SURVEY.md §1 "load-bearing quirk"): the
reference's validators disagreed — ``parseSchema`` defaulted a field
with no ``mode`` to REQUIRED (helpers.py:43) while the table builders
defaulted NULLABLE (helpers.py:112). We default **NULLABLE** (a record
missing an undeclared-mode field loads as NULL instead of being
dead-lettered) and keep REQUIRED only where declared — here, only
``pk``. The golden tests pin this choice.

Type system kept deliberately tiny, mirroring the reference's cast map
(helpers.py:66-70): STRING / INTEGER / TIMESTAMP. Any other declared
type is a registry error (helpers.py:89-90 parity).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import types as T

# The v1 unified schema, semantically identical to
# /root/reference/unified_schemas/v1.json:1-26 (field order preserved —
# it is the output column order). Only `pk` declares REQUIRED; the
# trailing string/timestamp fields declare NULLABLE explicitly; all
# others fall to the NULLABLE default per the policy above.
UNIFIED_SCHEMA_V1: dict = {
    "version": 1,
    "fields": [
        {"name": "pk", "type": "STRING", "mode": "REQUIRED"},
        {"name": "team_id", "type": "STRING"},
        {"name": "team_name", "type": "STRING"},
        {"name": "team_country", "type": "STRING"},
        {"name": "league_id", "type": "STRING"},
        {"name": "league_name", "type": "STRING"},
        {"name": "season", "type": "INTEGER"},
        {"name": "rank", "type": "INTEGER"},
        {"name": "points", "type": "INTEGER"},
        {"name": "games_played", "type": "INTEGER"},
        {"name": "wins", "type": "INTEGER"},
        {"name": "draws", "type": "INTEGER"},
        {"name": "losses", "type": "INTEGER"},
        {"name": "goals_for", "type": "INTEGER"},
        {"name": "goals_against", "type": "INTEGER"},
        {"name": "goal_difference", "type": "INTEGER"},
        {"name": "form", "type": "STRING", "mode": "NULLABLE"},
        {"name": "venue_name", "type": "STRING", "mode": "NULLABLE"},
        {"name": "venue_city", "type": "STRING", "mode": "NULLABLE"},
        # Named update_timestamp in code, update_datetime in the
        # reference docs (SCHEMA.md:46) — code name wins. The reference
        # never populates it (no default handling in helpers.py:72-101);
        # our writer stamps it honestly at load time (see pipeline.py).
        {"name": "update_timestamp", "type": "TIMESTAMP", "mode": "NULLABLE"},
        {"name": "schema_version", "type": "STRING"},
    ],
}

DEFAULT_MODE = "NULLABLE"

_SPARK_TYPES: dict[str, T.DataType] = {
    "STRING": T.StringType(),
    "INTEGER": T.LongType(),
    "TIMESTAMP": T.TimestampType(),
}


@dataclass(frozen=True)
class SchemaField:
    name: str
    type: str  # STRING | INTEGER | TIMESTAMP
    mode: str  # REQUIRED | NULLABLE


@dataclass(frozen=True)
class ParsedSchema:
    version: str
    fields: tuple[SchemaField, ...]

    @property
    def required(self) -> tuple[str, ...]:
        return tuple(f.name for f in self.fields if f.mode == "REQUIRED")

    @property
    def names(self) -> tuple[str, ...]:
        return tuple(f.name for f in self.fields)

    def to_struct_type(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(
                    f.name, _SPARK_TYPES[f.type], nullable=(f.mode != "REQUIRED")
                )
                for f in self.fields
            ]
        )


def parse_schema(schema_data: dict) -> ParsedSchema:
    """JSON schema dict → ParsedSchema. Raises on structural problems
    and on unsupported types (fail at registry time, not mid-job —
    unlike the reference, which surfaced bad types per record at
    helpers.py:89-90)."""
    if "version" not in schema_data:
        raise KeyError("Schema structure is invalid: missing 'version'")
    fields = []
    for field in schema_data.get("fields", []):
        if "name" not in field or "type" not in field:
            raise KeyError(
                f"Schema structure is invalid: field missing name/type: {field!r}"
            )
        ftype = field["type"]
        if ftype not in _SPARK_TYPES:
            raise TypeError(f"Unsupported schema type '{ftype}' for field '{field['name']}'")
        fields.append(
            SchemaField(
                name=field["name"],
                type=ftype,
                mode=field.get("mode", DEFAULT_MODE),
            )
        )
    return ParsedSchema(version=str(schema_data["version"]), fields=tuple(fields))


def load_schema_file(path: str) -> ParsedSchema:
    with open(path) as f:
        return parse_schema(json.load(f))
