"""Composed ETL plans: the reference-parity football pipeline
(ingest → normalize → join → validate → load, with dead-lettering).
"""

from .unified_schema import UNIFIED_SCHEMA_V1, ParsedSchema, parse_schema
from .pipeline import TransformResult, run_transform

__all__ = [
    "UNIFIED_SCHEMA_V1",
    "ParsedSchema",
    "parse_schema",
    "TransformResult",
    "run_transform",
]
