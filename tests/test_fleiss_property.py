"""Property test for ``eval_fleiss_kappa``.

The statistic is ONE shared SQL text run by both engines, so the
dual-engine gate can't catch a slip both dialects share. This suite
runs the shared text on synthetic document frames in DuckDB against a
direct Python implementation of Fleiss (1971) — same deterministic
hash-annotator construction (md5-seeded noise over the length-bucket
base label), same add-nothing arithmetic.

Pinned: n_docs exactly; p_bar / p_e / kappa within 1e-6 (the only
allowed drift is DECIMAL pinning vs raw float).
"""

from __future__ import annotations

import hashlib
import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from football_etl_pipeline_spark.operators.stattests import (
    FLEISS_K,
    FLEISS_NOISE_MOD,
    FLEISS_R,
    _fleiss_sql,
    _h60_duck_st,
)


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def fleiss_reference(rows):
    """rows = [(doc_id, n_chars)] — mirrors the SQL construction."""
    if not rows:
        return None
    cells: dict = {}
    for doc_id, n_chars in rows:
        base = 0 if n_chars < 200 else (1 if n_chars < 350 else 2)
        for r in range(FLEISS_R):
            if h60(f"fk{r}|{doc_id}") % FLEISS_NOISE_MOD == 0:
                cat = h60(f"fv{r}|{doc_id}") % FLEISS_K
            else:
                cat = base
            cells[(doc_id, cat)] = cells.get((doc_id, cat), 0) + 1
    n_docs = len(rows)
    per_doc: dict = {}
    for (doc_id, _c), nij in cells.items():
        per_doc[doc_id] = per_doc.get(doc_id, 0) + nij * nij
    p_bar = sum(
        (s - FLEISS_R) / (FLEISS_R * (FLEISS_R - 1))
        for s in per_doc.values()
    ) / n_docs
    totals: dict = {}
    for (_d, cat), nij in cells.items():
        totals[cat] = totals.get(cat, 0) + nij
    p_e = sum(
        (t / (n_docs * FLEISS_R)) ** 2 for t in totals.values()
    )
    # p_e == 1 (corpus-wide unanimity on one category) leaves kappa
    # undefined — the operator emits NULL there
    kappa = None if p_e == 1 else (p_bar - p_e) / (1 - p_e)
    return n_docs, p_bar, p_e, kappa


def run_fleiss(rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, n_chars BIGINT)"
    )
    if rows:
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    out = con.execute(_fleiss_sql("documents", _h60_duck_st)).fetchall()
    con.close()
    return out


@settings(max_examples=30, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.integers(min_value=0, max_value=600),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_fleiss_matches_reference(rows):
    expect = fleiss_reference(rows)
    got = run_fleiss(rows)
    assert len(got) == 1
    n_docs, n_ann, p_bar, p_e, kappa = got[0]
    assert n_docs == expect[0]
    assert n_ann == FLEISS_R
    assert math.isclose(p_bar, expect[1], rel_tol=0, abs_tol=2e-6)
    assert math.isclose(p_e, expect[2], rel_tol=0, abs_tol=2e-6)
    # kappa's denominator (1 - p_e) can be small when agreement is
    # near-chance-free; allow the pinned-input propagation
    if expect[3] is None:
        assert kappa is None
    else:
        assert math.isclose(kappa, expect[3], rel_tol=1e-4, abs_tol=1e-4)
