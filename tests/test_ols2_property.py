"""Property tests for the two-factor OLS Cramer machinery: the
`_det3` cofactor expansion and the `_ols2_dets` column substitution
are string-built SQL — a silent transposition would still produce
plausible-looking coefficients on real data, so both engines would
agree on the same WRONG fit and the oracle gate could never catch
it. These tests pin the algebra itself against numpy on arbitrary
integer matrices."""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from football_etl_pipeline_spark.operators.tpch_more import (
    _det3,
    _ols2_dets,
)

ints = st.integers(min_value=-10_000, max_value=10_000)


@given(st.lists(ints, min_size=9, max_size=9))
@settings(max_examples=200, deadline=None)
def test_det3_matches_numpy(vals):
    m = [[str(vals[3 * i + j]) for j in range(3)] for i in range(3)]
    sql = _det3(m, lambda c: f"({c})::HUGEINT")
    got = duckdb.sql(f"SELECT {sql}").fetchone()[0]
    want = round(np.linalg.det(np.array(vals, dtype=float).reshape(3, 3)))
    assert int(got) == int(want)


@given(
    st.lists(ints, min_size=6, max_size=6),
    st.lists(ints, min_size=3, max_size=3),
)
@settings(max_examples=100, deadline=None)
def test_ols2_dets_solve_the_normal_equations(mom, rhs):
    """det_j / det must equal the Cramer solution of A·b = r for the
    symmetric moment matrix A built exactly as the operator builds it."""
    n, sx1, sx2, sx11, sx22, sx12 = [abs(v) + 1 for v in mom]
    sy, sx1y, sx2y = rhs
    A = np.array(
        [[n, sx1, sx2], [sx1, sx11, sx12], [sx2, sx12, sx22]], dtype=float
    )
    r = np.array([sy, sx1y, sx2y], dtype=float)
    if abs(np.linalg.det(A)) < 1e-9:
        return  # singular moment matrix — operator divides by det, N/A
    cols = {
        "n": n, "sx1": sx1, "sx2": sx2, "sx11": sx11, "sx22": sx22,
        "sx12": sx12, "sy": sy, "sx1y": sx1y, "sx2y": sx2y,
    }
    sel = ", ".join(f"({v})::HUGEINT AS {k}" for k, v in cols.items())
    dets = _ols2_dets(lambda c: f"{c}::HUGEINT")
    row = duckdb.sql(
        f"WITH s AS (SELECT {sel}) SELECT {', '.join(dets)} FROM s"
    ).fetchone()
    det, d0, d1, d2 = (float(x) for x in row)
    want = np.linalg.solve(A, r)
    got = np.array([d0 / det, d1 / det, d2 / det])
    assert np.allclose(got, want, rtol=1e-9, atol=1e-9)
