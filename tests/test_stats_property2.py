"""Property tests for the continuation-session statistics chains:
Spearman, Kendall tau-b, log-rank, runs test, Poisson rate, XmR,
Cramér's V, WOE/IV, and the Markov entropy rate. Same rationale as
``test_stats_property``: these are SQL TEXT chains — a transposed
moment or a shifted rank produces plausible numbers BOTH engines
agree on, so the DuckDB-vs-Spark gate alone cannot catch it. Each
oracle text runs in DuckDB over a SYNTHETIC table and is compared to
an independent numpy/pandas/pure-Python computation from the raw
rows (pandas supplies reference implementations of average ranks and
tau-b; everything else is computed directly from definitions)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from football_etl_pipeline_spark.operators.registry import ORACLES
from football_etl_pipeline_spark.operators.stattests import (
    _cramers_sql,
    _poisson_sql,
    _runs_sql,
    _woe_sql,
    _xmr_sql,
)

REL_TOL = 1e-5


def _run(sql: str, **frames) -> tuple:
    con = duckdb.connect()
    for name, df in frames.items():
        con.register(name, df)
    return con.execute(sql).fetchone()


def _close(got, want):
    assert got is not None
    assert abs(got - want) <= max(REL_TOL, REL_TOL * abs(want)), (
        got,
        want,
    )


# ---- Spearman ------------------------------------------------------------

pairs = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=1, max_value=12),
    ),
    min_size=5,
    max_size=60,
)


@given(pairs)
@settings(max_examples=40, deadline=None)
def test_spearman_oracle_matches_pandas(rows):
    df = pd.DataFrame(rows, columns=["l_quantity", "l_extendedprice"])
    rx = df["l_quantity"].rank(method="average")
    ry = df["l_extendedprice"].rank(method="average")
    if rx.std() == 0 or ry.std() == 0:
        return  # rho undefined (zero rank variance)
    want = float(np.corrcoef(rx, ry)[0, 1])
    got = _run(
        ORACLES["stats_spearman_price_quantity"], lineitem=df
    )
    assert got[0] == len(df)
    _close(got[1], round(want, 6))


# ---- Kendall tau-b --------------------------------------------------------

revs = st.lists(
    st.integers(min_value=1, max_value=50), min_size=4, max_size=50
)


@given(revs)
@settings(max_examples=40, deadline=None)
def test_kendall_oracle_matches_pandas(rev):
    n = len(rev)
    days = pd.date_range("2020-01-01", periods=n, freq="D")
    orders = pd.DataFrame(
        {"o_orderdate": days, "o_totalprice": [float(r) for r in rev]}
    )
    if len(set(rev)) == 1:
        return  # tau undefined: every pair tied
    sgn = 0
    tied = 0
    for i in range(n):
        for j in range(i + 1, n):
            if rev[j] > rev[i]:
                sgn += 1
            elif rev[j] < rev[i]:
                sgn -= 1
            else:
                tied += 1
    n0 = n * (n - 1) // 2
    want = sgn / (math.sqrt(n0) * math.sqrt(n0 - tied))
    got = _run(ORACLES["stats_kendall_tau_daily"], orders=orders)
    assert got[0] == n
    _close(got[3], round(want, 6))


# ---- runs test -------------------------------------------------------------


@given(revs)
@settings(max_examples=40, deadline=None)
def test_runs_oracle_matches_direct(rev):
    n = len(rev)
    days = pd.date_range("2020-01-01", periods=n, freq="D")
    orders = pd.DataFrame(
        {"o_orderdate": days, "o_totalprice": [float(r) for r in rev]}
    )
    med = float(np.quantile(np.array(rev, dtype=float), 0.5))
    signs = [1 if r > med else 0 for r in rev if r != med]
    n1, n2 = sum(signs), len(signs) - sum(signs)
    if n1 == 0 or n2 == 0:
        return  # z undefined
    runs = 1 + sum(
        1 for a, b in zip(signs, signs[1:]) if a != b
    )
    nn = n1 + n2
    mu = 1 + 2 * n1 * n2 / nn
    var = (2 * n1 * n2 * (2 * n1 * n2 - nn)) / (nn * nn * (nn - 1))
    if var <= 0:
        return
    want = (runs - mu) / math.sqrt(var)
    got = _run(
        _runs_sql("orders", "quantile_cont(rev, 0.5)", "BIGINT"),
        orders=orders,
    )
    assert (got[0], got[1], got[2]) == (n1, n2, runs)
    _close(got[3], round(want, 6))


# ---- Poisson rate test -----------------------------------------------------

daily_errs = st.lists(
    st.tuples(st.booleans(), st.integers(min_value=0, max_value=9)),
    min_size=4,
    max_size=40,
)


@given(daily_errs)
@settings(max_examples=40, deadline=None)
def test_poisson_oracle_matches_direct(spec):
    # spec: per-day (has_weekday_flag_ignored, n_errors); day parity of
    # the calendar decides weekday/weekend via real dates.
    rows = []
    days = pd.date_range("2021-03-01", periods=len(spec), freq="D")
    for d, (_, ne) in zip(days, spec):
        rows.append((d, "view"))  # every day observed
        rows.extend((d, "error") for _ in range(ne))
    ev = pd.DataFrame(rows, columns=["ts", "event_type"])
    wd = [d.isoweekday() <= 5 for d in days]
    t1, t2 = sum(wd), len(wd) - sum(wd)
    x1 = sum(ne for (d, (_, ne)) in zip(days, spec) if d.isoweekday() <= 5)
    x2 = sum(ne for (d, (_, ne)) in zip(days, spec) if d.isoweekday() > 5)
    if t1 == 0 or t2 == 0 or (x1 + x2) == 0:
        return
    p0 = t1 / (t1 + t2)
    ntot = x1 + x2
    want_z = (x1 - ntot * p0) / math.sqrt(ntot * p0 * (1 - p0))
    got = _run(
        _poisson_sql(
            "events", "isodow(CAST(ts AS TIMESTAMP)) <= 5", "BIGINT"
        ),
        events=ev,
    )
    assert (got[0], got[1], got[2], got[3]) == (x1, x2, t1, t2)
    _close(got[5], round(want_z, 6))


# ---- XmR chart --------------------------------------------------------------


@given(revs)
@settings(max_examples=40, deadline=None)
def test_xmr_oracle_matches_direct(rev):
    if len(rev) < 2:
        return
    n = len(rev)
    days = pd.date_range("2020-01-01", periods=n, freq="D")
    orders = pd.DataFrame(
        {"o_orderdate": days, "o_totalprice": [float(r) for r in rev]}
    )
    arr = np.array(rev, dtype=float)
    mean_rev = arr.mean()
    mrs = np.abs(np.diff(arr))
    mean_mr = mrs.sum() / (n - 1)
    ucl = mean_rev + 2.66 * mean_mr
    lcl = mean_rev - 2.66 * mean_mr
    got = _run(_xmr_sql("orders", "BIGINT"), orders=orders)
    assert got[0] == n
    _close(got[1], round(mean_rev, 6))
    _close(got[2], round(mean_mr, 6))
    assert got[5] == int((arr > ucl).sum())
    assert got[6] == int((arr < lcl).sum())


# ---- Cramér's V -------------------------------------------------------------

cells = st.lists(
    st.tuples(
        st.sampled_from(["p1", "p2", "p3"]),
        st.sampled_from(["F", "O"]),
    ),
    min_size=8,
    max_size=200,
)


@given(cells)
@settings(max_examples=40, deadline=None)
def test_cramers_oracle_matches_direct(rows):
    df = pd.DataFrame(
        rows, columns=["o_orderpriority", "o_orderstatus"]
    )
    ct = pd.crosstab(df["o_orderpriority"], df["o_orderstatus"])
    r, c = ct.shape
    if r < 2 or c < 2:
        return
    n = ct.values.sum()
    exp = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / n
    chi2 = float((((ct.values - exp) ** 2) / exp).sum())
    v = math.sqrt(chi2 / n / (min(r, c) - 1))
    phi2c = max(0.0, chi2 / n - (r - 1) * (c - 1) / (n - 1))
    rc = r - (r - 1) ** 2 / (n - 1)
    cc = c - (c - 1) ** 2 / (n - 1)
    if min(rc, cc) - 1 <= 0:
        return
    vc = math.sqrt(phi2c / (min(rc, cc) - 1))
    got = _run(_cramers_sql("orders", "BIGINT"), orders=df)
    assert got[0] == n and (got[1], got[2]) == (r, c)
    # chi2 through the DECIMAL(18,6)-pinned per-cell terms: compare
    # loosely (each of up to r*c terms rounds at 1e-6).
    assert abs(got[3] - chi2) <= 1e-4 * max(1.0, chi2)
    # Compare squared Vs: sqrt amplifies the DECIMAL(18,6) per-term
    # rounding unboundedly near the max(0, .) clip (a 1e-7 phi2
    # difference is a 3e-4 V difference), so the linear-domain
    # tolerance belongs on V^2.
    assert abs(got[4] ** 2 - v ** 2) <= 1e-6
    assert abs(got[5] ** 2 - vc ** 2) <= 1e-6


# ---- WOE / IV ---------------------------------------------------------------


@given(cells)
@settings(max_examples=40, deadline=None)
def test_woe_oracle_matches_direct(rows):
    df = pd.DataFrame(
        rows, columns=["o_orderpriority", "o_orderstatus"]
    )
    g = df.groupby("o_orderpriority")["o_orderstatus"].agg(
        pos=lambda s: int((s == "F").sum()),
        neg=lambda s: int((s != "F").sum()),
    )
    tp, tn = int(g["pos"].sum()), int(g["neg"].sum())
    if tp == 0 or tn == 0:
        return  # distribution degenerate: WOE denominators vanish
    want = {}
    iv = 0.0
    for cat, row in g.iterrows():
        woe = math.log(
            ((row["pos"] + 0.5) / tp) / ((row["neg"] + 0.5) / tn)
        )
        woe = round(woe, 9)
        term = (row["pos"] / tp - row["neg"] / tn) * woe
        want[cat] = (row["pos"], row["neg"], woe, term)
        iv += round(term, 9)
    con = duckdb.connect()
    con.register("orders", df)
    out = con.execute(_woe_sql("orders", "BIGINT")).fetchall()
    assert len(out) == len(want)
    for cat, npos, nneg, woe, term, iv_total in out:
        wp, wn, wwoe, wterm = want[cat]
        assert (npos, nneg) == (wp, wn)
        _close(woe, wwoe)
        assert abs(term - wterm) <= 1e-6
        assert abs(iv_total - iv) <= 1e-6


# ---- Markov entropy rate ----------------------------------------------------

chains = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c"]), min_size=2, max_size=15
    ),
    min_size=1,
    max_size=8,
)


@given(chains)
@settings(max_examples=40, deadline=None)
def test_entropy_rate_oracle_matches_direct(users):
    rows = []
    eid = 0
    for uid, seq in enumerate(users):
        t0 = pd.Timestamp("2022-01-01")
        for i, etype in enumerate(seq):
            rows.append((eid, t0 + pd.Timedelta(minutes=i), uid, etype))
            eid += 1
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type"]
    )
    from collections import Counter

    trans = Counter()
    for seq in users:
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    grand = sum(trans.values())
    if grand == 0:
        return
    rowtot = Counter()
    for (a, _), c in trans.items():
        rowtot[a] += c
    h = -sum(
        round((c / grand) * round(math.log(c / rowtot[a]), 9), 9)
        for (a, _), c in trans.items()
    )
    got = _run(ORACLES["events_markov_entropy_rate"], events=ev)
    assert got[0] == grand and got[1] == len(trans)
    _close(got[2], round(h, 9))


# ---- log-rank ---------------------------------------------------------------

users_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),  # duration days
        st.booleans(),  # acquired on weekday (we pick the date)
        st.integers(min_value=0, max_value=30),  # start-day offset
    ),
    min_size=4,
    max_size=40,
)


@given(users_strategy)
@settings(max_examples=30, deadline=None)
def test_logrank_oracle_matches_direct(spec):
    # Build one first event + one last event per user. Weekday flag
    # selects a Monday or Saturday anchor so grp is controlled.
    rows = []
    eid = 0
    for uid, (dur, wd, off) in enumerate(spec):
        anchor = pd.Timestamp("2022-01-03" if wd else "2022-01-01")
        f = anchor + pd.Timedelta(days=7 * (off % 3))
        last = f + pd.Timedelta(days=dur)
        rows.append((eid, f, uid, "view"))
        eid += 1
        rows.append((eid, last, uid, "view"))
        eid += 1
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type"]
    )
    # independent direct computation from definitions
    horizon = max(r[1] for r in rows)
    obs = []
    for uid, (dur, wd, off) in enumerate(spec):
        anchor = pd.Timestamp("2022-01-03" if wd else "2022-01-01")
        f = anchor + pd.Timedelta(days=7 * (off % 3))
        last = f + pd.Timedelta(days=dur)
        churned = 1 if last < horizon - pd.Timedelta(days=7) else 0
        grp = 1 if f.isoweekday() <= 5 else 0
        obs.append((dur, churned, grp))
    t1 = sum(g for (_, _, g) in obs)
    t0 = len(obs) - t1
    o1 = 0.0
    e1 = 0.0
    vv = 0.0
    for t in sorted({d for (d, ch, _) in obs if ch}):
        d1 = sum(1 for (d, ch, g) in obs if d == t and ch and g)
        d0 = sum(1 for (d, ch, g) in obs if d == t and ch and not g)
        d = d1 + d0
        ar1 = sum(1 for (dd, _, g) in obs if dd >= t and g)
        ar = sum(1 for (dd, _, _) in obs if dd >= t)
        if d == 0 or ar <= d:
            continue
        o1 += d1
        e1 += round(d * ar1 / ar, 9)
        vv += round(
            d * (ar1 / ar) * (1 - ar1 / ar) * ((ar - d) / (ar - 1)), 9
        )
    if vv <= 0 or t1 == 0 or t0 == 0:
        return
    want_z = (o1 - e1) / math.sqrt(vv)
    got = _run(ORACLES["stats_logrank_weekday_cohort"], events=ev)
    assert (got[0], got[1]) == (t1, t0)
    assert got[2] == int(o1)
    _close(got[4], round(want_z, 6))


# ---- average precision ------------------------------------------------------

docs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),  # marker-word count
        st.integers(min_value=1, max_value=6),  # filler-word count
        st.booleans(),  # lang == 'en'
    ),
    min_size=3,
    max_size=40,
)


@given(docs_strategy)
@settings(max_examples=30, deadline=None)
def test_average_precision_oracle_matches_direct(spec):
    rows = []
    scores = []
    for doc_id, (nm, nf, is_en) in enumerate(spec):
        text = " ".join(["the"] * nm + ["zzz"] * nf)
        rows.append((doc_id, text, "en" if is_en else "de"))
        scores.append((nm / (nm + nf), doc_id, 1 if is_en else 0))
    docs = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    r = sum(y for (_, _, y) in scores)
    if r == 0:
        return  # AP undefined with zero relevant docs
    ranked = sorted(scores, key=lambda t: (-t[0], t[1]))
    cum = 0
    terms = []
    for k, (_, _, y) in enumerate(ranked, start=1):
        cum += y
        if y:
            terms.append(round(cum / k, 9))
    want = sum(terms) / r
    got = _run(ORACLES["eval_average_precision"], documents=docs)
    assert (got[0], got[1]) == (len(spec), r)
    _close(got[2], round(want, 9))


# ---- Laspeyres price index --------------------------------------------------

baskets = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # part
        st.integers(min_value=0, max_value=2),  # year offset
        st.integers(min_value=1, max_value=9),  # quantity
        st.integers(min_value=1, max_value=500),  # unit cents
    ),
    min_size=4,
    max_size=60,
)


@given(baskets)
@settings(max_examples=30, deadline=None)
def test_laspeyres_oracle_matches_direct(spec):
    rows = []
    for part, yoff, q, cents in spec:
        rows.append(
            (
                part,
                pd.Timestamp(f"{1995 + yoff}-06-15"),
                float(q),
                float(q) * cents / 100.0,
            )
        )
    li = pd.DataFrame(
        rows,
        columns=["l_partkey", "l_shipdate", "l_quantity", "l_extendedprice"],
    )
    # direct computation mirroring the declared roundings
    from collections import defaultdict

    acc = defaultdict(list)
    qty = defaultdict(float)
    for part, yoff, q, cents in spec:
        yr = 1995 + yoff
        up = round((float(q) * cents / 100.0) / q, 6)
        acc[(part, yr)].append(up)
        qty[(part, yr)] += q
    p = {k: round(sum(v) / len(v), 6) for k, v in acc.items()}
    base_yr = min(yr for (_, yr) in p)
    base = {
        part: (p[(part, yr)], qty[(part, yr)])
        for (part, yr) in p
        if yr == base_yr
    }
    want = {}
    for (part, yr) in p:
        if part not in base:
            continue
        num, den = want.get(yr, (0.0, 0.0))
        want[yr] = (
            num + p[(part, yr)] * base[part][1],
            den + base[part][0] * base[part][1],
        )
    con = duckdb.connect()
    con.register("lineitem", li)
    out = con.execute(
        ORACLES["lineitem_laspeyres_price_index"]
    ).fetchall()
    assert len(out) == len(want)
    for yr, n_parts, idx in out:
        num, den = want[yr]
        assert n_parts == sum(
            1 for (pt, y) in p if y == yr and pt in base
        )
        _close(idx, round(num / den * 100, 6))
