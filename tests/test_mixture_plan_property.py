"""Property test for the ``text_mixture_plan`` apportionment finish.

The quota machinery (`_mixture_finish`) is ONE shared SQL text run by
both engines, so the dual-engine gate can never catch a slip both
dialects share (the zero-cell chi-squared lesson). This suite runs the
finish on synthetic kept-frames in DuckDB and compares against a
direct Python reference implementation of Neyman-x-DSIR weighting and
largest-remainder (Hamilton) apportionment.

Invariants pinned:
- quotas sum EXACTLY to MIXTURE_TOKEN_BUDGET whenever any weight is
  positive, and to 0 when every weight is 0 (the tw=0 guard);
- alloc = min(quota, supply); shortfall = quota - alloc;
- per-source quota matches the reference apportionment exactly
  (including the rem DESC, source ASC tie-break);
- sources with n_keep < 2 carry weight 0 but keep their row.
"""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from football_etl_pipeline_spark.operators.textops import (
    MIXTURE_TOKEN_BUDGET,
    _mixture_finish,
)


def run_finish(kept_rows, sources):
    """Run the shared finish text on DuckDB over a synthetic kept
    frame (doc_id, source, n_tokens, logw as DECIMAL(38,9))."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE kept (doc_id BIGINT, source VARCHAR,"
        " n_tokens BIGINT, logw DECIMAL(38,9))"
    )
    if kept_rows:
        con.executemany(
            "INSERT INTO kept VALUES (?, ?, ?, ?)", kept_rows
        )
    con.execute("CREATE TABLE srcs (source VARCHAR)")
    con.executemany("INSERT INTO srcs VALUES (?)", [(s,) for s in sources])
    sql = "WITH _noop AS (SELECT 1)" + _mixture_finish(
        "kept", "srcs", "BIGINT", "//"
    )
    rel = con.execute(sql)
    cols = [d[0] for d in rel.description]
    out = [dict(zip(cols, r)) for r in rel.fetchall()]
    con.close()
    return out


def reference_plan(kept_rows, sources):
    """Direct Python implementation of the documented semantics."""
    by_src: dict[str, list[tuple[int, float]]] = {}
    for _, src, n_tok, logw in kept_rows:
        by_src.setdefault(src, []).append((n_tok, float(logw)))
    stats = {}
    for src, docs in by_src.items():
        n = len(docs)
        supply = sum(t for t, _ in docs)
        sxx = sum(t * t for t, _ in docs)
        mass = sum(w for _, w in docs)
        if n > 1:
            var = (float(n) * float(sxx) - float(supply) * float(supply)) / (
                float(n) * (n - 1.0)
            )
            sd_micro = int(round(math.sqrt(var) * 1_000_000))
        else:
            sd_micro = 0
        # the DECIMAL(18,3) pin: round-half-up at 3 decimals
        wt = sd_micro / 1_000_000.0 * mass
        wt_milli = int(
            math.floor(wt * 1000 + 0.5) if wt >= 0 else -math.floor(-wt * 1000 + 0.5)
        )
        stats[src] = (n, supply, sd_micro, mass, wt_milli)
    tw = sum(s[4] for s in stats.values())
    B = MIXTURE_TOKEN_BUDGET
    quota = {}
    if tw > 0:
        base = {s: (B * v[4]) // tw for s, v in stats.items()}
        rem = {s: (B * v[4]) % tw for s, v in stats.items()}
        leftover = B - sum(base.values())
        order = sorted(stats, key=lambda s: (-rem[s], s))
        for i, s in enumerate(order):
            quota[s] = base[s] + (1 if i < leftover else 0)
    else:
        quota = {s: 0 for s in stats}
    out = {}
    for src in sources:
        n, supply, _, _, _ = stats.get(src, (0, 0, 0, 0.0, 0))
        q = quota.get(src, 0)
        out[src] = {
            "n_keep": n,
            "supply_tokens": supply,
            "quota_tokens": q,
            "alloc_tokens": min(q, supply),
            "shortfall_tokens": q - min(q, supply),
        }
    return out


kept_strategy = st.lists(
    st.tuples(
        st.integers(0, 10_000),  # doc_id (unused by the finish)
        st.sampled_from(["a", "b", "c", "d", "e"]),
        st.integers(1, 5_000),  # n_tokens
        # positive decimal log-weights at 9dp, like the DSIR frame
        st.decimals(
            min_value="0.000000001",
            max_value="99.999999999",
            places=9,
        ),
    ),
    min_size=0,
    max_size=60,
)


@settings(max_examples=60, deadline=None)
@given(kept=kept_strategy)
def test_finish_matches_reference(kept):
    sources = ["a", "b", "c", "d", "e", "never_kept"]
    got = {r["source"]: r for r in run_finish(kept, sources)}
    want = reference_plan(kept, sources)
    assert set(got) == set(sources)
    for src in sources:
        g, w = got[src], want[src]
        for k in (
            "n_keep",
            "supply_tokens",
            "quota_tokens",
            "alloc_tokens",
            "shortfall_tokens",
        ):
            assert g[k] == w[k], (src, k, g, w)


@settings(max_examples=30, deadline=None)
@given(kept=kept_strategy)
def test_quota_sums_to_budget_or_zero(kept):
    rows = run_finish(kept, ["a", "b", "c", "d", "e"])
    total = sum(r["quota_tokens"] for r in rows)
    any_weight = any(r["weight"] > 0 for r in rows)
    assert total == (MIXTURE_TOKEN_BUDGET if any_weight else 0)
    for r in rows:
        assert r["alloc_tokens"] == min(r["quota_tokens"], r["supply_tokens"])
        assert r["shortfall_tokens"] == r["quota_tokens"] - r["alloc_tokens"]
        if r["n_keep"] < 2:
            assert r["weight"] == 0.0
