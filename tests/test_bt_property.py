"""Property test for ``eval_bradley_terry_ratings``.

The MM recursion is ONE shared SQL text run by both engines, so the
dual-engine gate can never catch a slip both dialects share (the
zero-cell chi-squared lesson). This suite runs the shared text on
synthetic document frames in DuckDB and compares the FULL trajectory
output against a direct Python float implementation of Hunter's MM
update — comparisons derived the same stride way, winner by n_chars
with the lower-doc_id tie-break, mean-1 renormalization per round.

Invariants pinned:
- per-source rating matches the reference within 1e-6 relative (the
  only allowed drift is DECIMAL pinning vs raw float);
- wins / n_comparisons match exact integer counts;
- output rows = exactly the sources that appear in ≥1 comparison;
- ratings of compared sources are mean-1 (the renormalization).
"""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from football_etl_pipeline_spark.operators.stattests import (
    BT_ITERS,
    BT_STRIDE,
    _bt_sql,
)


def bt_reference(rows, iters=BT_ITERS, stride=BT_STRIDE):
    """Direct float implementation: rows = [(doc_id, source, n_chars)]."""
    by_id = {d: (s, c) for d, s, c in rows}
    comps = []
    for d, (sa, ca) in by_id.items():
        if d + stride in by_id:
            sb, cb = by_id[d + stride]
            comps.append((sa, sb) if ca >= cb else (sb, sa))
    if not comps:
        return {}, {}, {}
    w: dict = defaultdict(int)
    for wi, lo in comps:
        w[(wi, lo)] += 1
    n: dict = defaultdict(int)
    for (i, j), c in w.items():
        n[(i, j)] += c
        n[(j, i)] += c
    items = sorted({i for ij in n for i in ij})
    wins = {
        i: sum(c for (a, _b), c in w.items() if a == i) for i in items
    }
    p = {i: 1.0 for i in items}
    for _ in range(iters):
        praw = {}
        for i in items:
            den = sum(
                n[(i, j)] / (p[i] + p[j])
                for j in items
                if (i, j) in n
            )
            praw[i] = wins[i] / den
        s = sum(praw.values())
        k = len(items)
        p = {i: praw[i] * k / s for i in items}
    ncomp = {
        i: sum(n[(i, j)] for j in items if (i, j) in n) for i in items
    }
    return p, wins, ncomp


def run_bt(rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, source VARCHAR, n_chars BIGINT)"
    )
    if rows:
        con.executemany("INSERT INTO docs VALUES (?, ?, ?)", rows)
    sql = _bt_sql("docs").replace("comps_items", "docs")
    out = con.execute(sql).fetchall()
    con.close()
    return out


@settings(max_examples=40, deadline=None)
@given(
    n_docs=st.integers(min_value=0, max_value=60),
    n_sources=st.integers(min_value=2, max_value=6),
    chars=st.data(),
)
def test_bt_matches_reference_trajectory(n_docs, n_sources, chars):
    rows = [
        (
            d,
            f"s{d % n_sources}",
            chars.draw(st.integers(min_value=0, max_value=40)),
        )
        for d in range(n_docs)
    ]
    expect_p, expect_w, expect_n = bt_reference(rows)
    got = run_bt(rows)
    assert {r[0] for r in got} == set(expect_p)
    for source, rating, wins, ncomp in got:
        assert wins == expect_w[source], (source, wins, expect_w)
        assert ncomp == expect_n[source], (source, ncomp, expect_n)
        assert math.isclose(
            float(rating), expect_p[source], rel_tol=1e-6, abs_tol=1e-6
        ), (source, rating, expect_p[source])
    if got:
        mean = sum(float(r[1]) for r in got) / len(got)
        assert math.isclose(mean, 1.0, rel_tol=1e-5)
