"""Property tests for the string-built statistics chains added in
round 9: the ANOVA / Brown–Forsythe final F chain, the Cohen's-kappa
chain, and the embedding-drift SMD expression are all SQL TEXT — a
transposed moment or an off-by-one marginal would produce plausible
numbers that BOTH engines agree on, so the oracle gate alone could
never catch it (the ``test_ols2_property`` rationale). Each chain is
evaluated in DuckDB on arbitrary synthetic moments and compared to an
independent numpy/pure-Python computation from the raw data."""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from football_etl_pipeline_spark.operators.profiling import (
    _SMD_EXPR,
    NANO,
)
from football_etl_pipeline_spark.operators.stattests import (
    _ANOVA_GROUPS,
    _anova_final_select,
)
from football_etl_pipeline_spark.operators.textops import (
    _kappa_final_select,
)

# groups of 2..20 values each, values in cents-like range
group = st.lists(
    st.integers(min_value=0, max_value=100_000), min_size=2, max_size=20
)


@given(st.lists(group, min_size=5, max_size=5))
@settings(max_examples=60, deadline=None)
def test_anova_chain_matches_numpy(groups):
    arrs = [np.array(g, dtype=float) for g in groups]
    allv = np.concatenate(arrs)
    k, n = len(arrs), len(allv)
    ssw = sum(((a - a.mean()) ** 2).sum() for a in arrs)
    ssb = sum(len(a) * (a.mean() - allv.mean()) ** 2 for a in arrs)
    if ssw < 1e-9 or ssb < 1e-12:
        return  # degenerate: operator divides by SSW; eta by SSB+SSW
    want_f = (ssb / (k - 1)) / (ssw / (n - k))
    want_eta = ssb / (ssb + ssw)
    cols = []
    for i, a in enumerate(arrs):
        cols.append(f"CAST({len(a)} AS BIGINT) AS n{i}")
        cols.append(f"CAST({int(a.sum())} AS DECIMAL(18,6)) AS s{i}")
        cols.append(f"CAST({int((a ** 2).sum())} AS DECIMAL(38,6)) AS q{i}")
    row = duckdb.sql(
        f"WITH mo AS (SELECT {', '.join(cols)}) {_anova_final_select()}"
    ).fetchone()
    n_rows, k_groups, f_stat, eta = row
    assert n_rows == n and k_groups == len(_ANOVA_GROUPS)
    assert abs(f_stat - want_f) <= max(1e-5, 1e-5 * abs(want_f))
    assert abs(eta - want_eta) <= 1e-5


counts = st.integers(min_value=0, max_value=10_000)


@given(counts, counts, counts, counts)
@settings(max_examples=100, deadline=None)
def test_kappa_chain_matches_direct_formula(n11, n10, n01, n00):
    n = n11 + n10 + n01 + n00
    if n == 0:
        return
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)
    if abs(1.0 - pe) < 1e-9:
        return  # kappa undefined at pe == 1
    want = (po - pe) / (1 - pe)
    row = duckdb.sql(
        f"""WITH ct AS (SELECT {n}::BIGINT AS n, {n11}::BIGINT AS n11,
              {n10}::BIGINT AS n10, {n01}::BIGINT AS n01,
              {n00}::BIGINT AS n00)
        {_kappa_final_select()}"""
    ).fetchone()
    kappa = row[-1]
    assert abs(kappa - want) <= 1e-5


vals = st.lists(
    st.integers(min_value=-(10**9), max_value=10**9),
    min_size=2,
    max_size=30,
)


@given(vals, vals)
@settings(max_examples=60, deadline=None)
def test_smd_expr_matches_numpy(a, b):
    """_SMD_EXPR consumes nano-unit BIGINT moments; numpy computes the
    same Cohen's-d-style SMD from the raw (nano-scaled) values. The
    operator's variance is the POPULATION variance (n·Σx² − (Σx)²)/n²."""
    xa = np.array(a, dtype=float) / NANO
    xb = np.array(b, dtype=float) / NANO
    va, vb = xa.var(), xb.var()  # population variance, matching the chain
    if (va + vb) / 2.0 < 1e-18:
        return
    want = abs(xa.mean() - xb.mean()) / np.sqrt((va + vb) / 2.0)
    cols = (
        f"SELECT {len(a)}::BIGINT AS na,"
        f" {int(sum(a))}::DECIMAL(38,0) AS sa,"
        f" {int(sum(v * v for v in a))}::DECIMAL(38,0) AS qa,"
        f" {len(b)}::BIGINT AS nb,"
        f" {int(sum(b))}::DECIMAL(38,0) AS sb,"
        f" {int(sum(v * v for v in b))}::DECIMAL(38,0) AS qb"
    )
    got = duckdb.sql(f"WITH mo AS ({cols}) SELECT {_SMD_EXPR} FROM mo").fetchone()[0]
    assert abs(got - want) <= max(1e-6, 1e-6 * abs(want))
