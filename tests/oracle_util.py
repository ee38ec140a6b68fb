"""Shared Spark-vs-DuckDB comparison used across test modules.

Mirrors the driver's t2 gate: row count, column-name set, and an
order-insensitive exact value comparison (cells normalized to strings,
floats via repr so bit-level drift fails loudly here before it fails
in the driver)."""

from __future__ import annotations

import datetime
import math


def normalize_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(normalize_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted("|".join(normalize_cell(r[i]) for i in order) for r in rows)


def assert_matches_oracle(sdf, duck, sql: str, name: str = "?"):
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.execute(sql)
    ocols = [d[0] for d in rel.description]
    orows = rel.fetchall()
    assert sorted(scols) == sorted(ocols), (
        f"{name}: schema mismatch spark={sorted(scols)} oracle={sorted(ocols)}"
    )
    assert len(srows) == len(orows), (
        f"{name}: rowcount spark={len(srows)} oracle={len(orows)}"
    )
    sm, om = multiset(srows, scols), multiset(orows, ocols)
    diffs = [(a, b) for a, b in zip(sm, om) if a != b][:3]
    assert sm == om, f"{name}: value mismatch, first diffs: {diffs}"
