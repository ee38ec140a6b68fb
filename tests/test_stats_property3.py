"""Property tests for the round-10 statistics chains: Kruskal–Wallis,
Jarque–Bera, and the BH-FDR screen (including its erf-polynomial
normal CDF). Same rationale as ``test_stats_property``: these are SQL
TEXT chains shared by both engines, so a transposed moment or a
shifted rank produces plausible numbers BOTH engines agree on — only
an independent numpy/pandas/math computation from the raw rows can
catch it."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from football_etl_pipeline_spark.operators.registry import ORACLES

REL_TOL = 1e-5


def _run_all(sql: str, **frames) -> list[tuple]:
    con = duckdb.connect()
    for name, df in frames.items():
        con.register(name, df)
    return con.execute(sql).fetchall()


def _close(got, want, tol=REL_TOL):
    assert got is not None
    assert abs(got - want) <= max(tol, tol * abs(want)), (got, want)


# ---- Kruskal–Wallis --------------------------------------------------------

kw_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=12),  # value (ties likely)
        st.integers(min_value=0, max_value=3),  # group id
    ),
    min_size=8,
    max_size=80,
)


@given(kw_rows)
@settings(max_examples=40, deadline=None)
def test_kruskal_wallis_oracle_matches_direct(rows):
    df = pd.DataFrame(rows, columns=["v", "g"])
    if df["g"].nunique() < 2 or df["v"].nunique() < 2:
        return  # H undefined / tie correction divides by zero
    orders = pd.DataFrame(
        {
            "o_totalprice": df["v"].astype(float),
            "o_orderpriority": df["g"].map("{}-GRP".format),
        }
    )
    ranks = df["v"].rank(method="average")
    n = len(df)
    s = sum(
        ranks[df["g"] == g].sum() ** 2 / (df["g"] == g).sum()
        for g in df["g"].unique()
    )
    h = 12.0 / (n * (n + 1)) * s - 3 * (n + 1)
    tie3 = sum(
        t**3 - t for t in df.groupby("v").size().tolist()
    )
    want = h / (1 - tie3 / (n**3 - n))
    got = _run_all(
        ORACLES["stats_kruskal_wallis_priority"], orders=orders
    )[0]
    assert got[0] == n
    assert got[1] == df["g"].nunique()
    _close(got[3], round(want, 6))


# ---- Jarque–Bera -----------------------------------------------------------

jb_vals = st.lists(
    st.floats(min_value=0.01, max_value=500.0, allow_nan=False),
    min_size=8,
    max_size=100,
)


@given(jb_vals)
@settings(max_examples=40, deadline=None)
def test_jarque_bera_oracle_matches_numpy(vals):
    # mirror the table: 2-decimal money values
    vals = [round(v, 2) for v in vals]
    x = np.asarray(vals, dtype=float)
    if np.var(x) < 1e-9:
        return  # m2 ~ 0: skew/kurtosis undefined
    n = len(x)
    m2 = ((x - x.mean()) ** 2).mean()
    m3 = ((x - x.mean()) ** 3).mean()
    m4 = ((x - x.mean()) ** 4).mean()
    g1 = m3 / m2**1.5
    g2 = m4 / m2**2 - 3
    want = n / 6.0 * (g1**2 + g2**2 / 4)
    events = pd.DataFrame(
        {"event_type": "purchase", "value": x}
    )
    got = _run_all(
        ORACLES["stats_jarque_bera_value"], events=events
    )[0]
    assert got[0] == n
    _close(got[1], round(g1, 6), tol=1e-4)
    _close(got[2], round(g2, 6), tol=1e-4)
    _close(got[3], round(want, 6), tol=1e-4)


# ---- BH-FDR ----------------------------------------------------------------


def _bh_direct(events: pd.DataFrame) -> dict[str, tuple]:
    """Pure-Python BH over per-type weekday/weekend Poisson z."""
    days = events.assign(day=events["ts"].dt.date).groupby("day")[
        "is_wd"
    ].max()
    t1, t2 = int(days.sum()), int((1 - days).sum())
    stats = {}
    for et, grp in events.groupby("event_type"):
        x1 = int(grp["is_wd"].sum())
        x2 = int((1 - grp["is_wd"]).sum())
        p0 = t1 / (t1 + t2)
        z = (x1 - (x1 + x2) * p0) / math.sqrt(
            (x1 + x2) * p0 * (1 - p0)
        )
        z = round(z, 6)
        p = 1 - math.erf(abs(z) / math.sqrt(2))
        stats[et] = (z, p)
    m = len(stats)
    ordered = sorted(stats.items(), key=lambda kv: (kv[1][1], kv[0]))
    qs: dict[str, float] = {}
    running = math.inf
    for i in range(m - 1, -1, -1):
        et, (_, p) = ordered[i]
        running = min(running, p * m / (i + 1))
        qs[et] = min(running, 1.0)
    return {et: (z, p, qs[et]) for et, (z, p) in stats.items()}


bh_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=27),  # day offset (Jan'24)
        st.sampled_from(["alpha", "beta", "gamma"]),
    ),
    min_size=30,
    max_size=200,
)


@given(bh_events)
@settings(max_examples=30, deadline=None)
def test_bh_fdr_oracle_matches_direct(rows):
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        [d for d, _ in rows], unit="D"
    )
    events = pd.DataFrame(
        {"ts": ts, "event_type": [e for _, e in rows]}
    )
    events["is_wd"] = (events["ts"].dt.dayofweek < 5).astype(int)
    # degenerate exposures make the z undefined
    days = events.assign(day=events["ts"].dt.date).groupby("day")[
        "is_wd"
    ].max()
    if days.sum() == 0 or (1 - days).sum() == 0:
        return
    want = _bh_direct(events)
    got = _run_all(
        ORACLES["stats_bh_fdr_event_rates"],
        events=events[["ts", "event_type"]],
    )
    assert len(got) == len(want)
    for et, _x1, _x2, z, p, q, _rej in got:
        wz, wp, wq = want[et]
        _close(z, wz)
        # the A&S erf polynomial carries |error| < 1.5e-7 vs math.erf
        _close(p, wp, tol=5e-7)
        _close(q, wq, tol=5e-6)


# ---- Pettitt ----------------------------------------------------------------

pettitt_counts = st.lists(
    st.integers(min_value=1, max_value=9), min_size=5, max_size=60
)


@given(pettitt_counts)
@settings(max_examples=40, deadline=None)
def test_pettitt_oracle_matches_naive_double_sum(counts):
    """The oracle uses the integral rank identity; the reference is
    the O(n²) definition Uₜ = Σ_{i≤t}Σ_{j>t} sgn(xⱼ−xᵢ)."""
    n = len(counts)
    days = pd.date_range("2020-01-01", periods=n, freq="D")
    # one orders row per unit of count so the daily agg reproduces it
    orders = pd.DataFrame(
        {
            "o_orderdate": [
                d for d, c in zip(days, counts) for _ in range(c)
            ]
        }
    )
    x = counts
    best_k, best_day = -1, None
    # build U_t from the raw O(n²) double sum — the rank recurrence
    # is the identity under test, so it must not appear here
    us = []
    for t in range(n):
        u_t = 0
        for i in range(t + 1):
            for j in range(t + 1, n):
                u_t += (
                    1 if x[j] > x[i] else -1 if x[j] < x[i] else 0
                )
        us.append(u_t)
    for t in range(n):
        if abs(us[t]) > best_k:
            best_k, best_day = abs(us[t]), days[t].date()
    want_p = min(
        1.0, 2 * math.exp(-6 * best_k**2 / (n**3 + n**2))
    )
    got = _run_all(
        ORACLES["stats_pettitt_changepoint"], orders=orders
    )[0]
    assert got[0] == n
    assert got[1] == best_k
    assert got[2] == best_day
    _close(got[3], want_p, tol=1e-6)


# ---- Ljung–Box --------------------------------------------------------------


@given(pettitt_counts)
@settings(max_examples=30, deadline=None)
def test_ljung_box_oracle_matches_direct(counts):
    from football_etl_pipeline_spark.operators.stattests import (
        LJUNG_BOX_MAX_LAG,
    )

    n = len(counts)
    if n <= LJUNG_BOX_MAX_LAG + 1:
        return
    days = pd.date_range("2020-01-01", periods=n, freq="D")
    orders = pd.DataFrame(
        {
            "o_orderdate": [
                d for d, c in zip(days, counts) for _ in range(c)
            ]
        }
    )
    x = np.asarray(counts, dtype=float)
    q = 0.0
    for k in range(1, LJUNG_BOX_MAX_LAG + 1):
        a, b = x[:-k], x[k:]
        va = (len(a) * (a * a).sum() - a.sum() ** 2)
        vb = (len(b) * (b * b).sum() - b.sum() ** 2)
        if va <= 0 or vb <= 0:
            return  # a constant window: r_k undefined
        r = (len(a) * (a * b).sum() - a.sum() * b.sum()) / math.sqrt(
            va * vb
        )
        q += round(r, 9) ** 2 / (n - k)
    want = n * (n + 2) * q
    got = _run_all(ORACLES["stats_ljung_box_daily"], orders=orders)[0]
    assert got[0] == n
    _close(got[3], round(want, 6), tol=1e-5)


# ---- Theil decomposition -----------------------------------------------------

theil_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=30),  # custkey
        st.integers(min_value=0, max_value=3),  # nation of that cust
        st.integers(min_value=100, max_value=99999),  # order cents
    ),
    min_size=6,
    max_size=80,
)


@given(theil_rows)
@settings(max_examples=30, deadline=None)
def test_theil_oracle_matches_numpy_and_decomposes(rows):
    # nation must be functionally dependent on custkey
    nation_of = {}
    fixed = []
    for ck, nk, cents in rows:
        nation_of.setdefault(ck, nk)
        fixed.append((ck, nation_of[ck], cents))
    orders = pd.DataFrame(
        {
            "o_custkey": [ck for ck, _, _ in fixed],
            "o_totalprice": [c / 100.0 for _, _, c in fixed],
        }
    )
    customer = pd.DataFrame(
        sorted(nation_of.items()), columns=["c_custkey", "c_nationkey"]
    )
    percust = orders.groupby("o_custkey")["o_totalprice"].sum()
    x = percust.to_numpy()
    g = customer.set_index("c_custkey").loc[percust.index][
        "c_nationkey"
    ].to_numpy()
    n, mu = len(x), x.mean()
    t_total = float(np.mean(x / mu * np.log(x / mu)))
    t_within = 0.0
    t_between = 0.0
    for nk in np.unique(g):
        xg = x[g == nk]
        mug = xg.mean()
        sg = xg.sum() / x.sum()
        t_within += sg * float(
            np.mean(xg / mug * np.log(xg / mug))
        )
        t_between += sg * math.log(mug / mu)
    got = _run_all(
        ORACLES["customer_theil_inequality"],
        orders=orders,
        customer=customer,
    )[0]
    assert got[0] == n
    assert got[1] == len(np.unique(g))
    _close(got[2], t_total, tol=1e-5)
    _close(got[3], t_within, tol=1e-5)
    _close(got[4], t_between, tol=1e-5)
    # the decomposition identity, on the oracle's own outputs
    assert abs(got[5] - got[2]) < 5e-6


# ---- robust STL decomposition -------------------------------------------------


@given(
    st.lists(
        st.integers(min_value=100, max_value=99999),
        min_size=10,
        max_size=60,
    )
)
@settings(max_examples=30, deadline=None)
def test_robust_stl_oracle_matches_pandas(cents):
    n = len(cents)
    days = pd.date_range("2021-03-01", periods=n, freq="D")
    rev = pd.Series([c / 100.0 for c in cents], index=days)
    orders = pd.DataFrame(
        {"o_orderdate": days, "o_totalprice": rev.to_numpy()}
    )
    trend = rev.rolling(7, center=True, min_periods=1).median()
    trend = trend.round(6)
    detr = (rev - trend).round(6)
    seas = detr.groupby(days.dayofweek + 1).median().round(6)
    got = _run_all(
        ORACLES["orders_robust_stl_decompose"], orders=orders
    )
    assert len(got) == n
    for day, n_window, revenue, t, s, r in got:
        idx = pd.Timestamp(day)
        assert n_window == min(3, (idx - days[0]).days) + 1 + min(
            3, (days[-1] - idx).days
        )
        _close(revenue, rev[idx])
        _close(t, trend[idx], tol=1e-6)
        _close(s, seas[idx.dayofweek + 1], tol=1e-6)
        _close(
            r,
            round(detr[idx] - seas[idx.dayofweek + 1], 6),
            tol=1e-6,
        )


# ---- Friedman ------------------------------------------------------------


@given(
    st.lists(
        st.tuples(*[st.integers(min_value=1, max_value=60)] * 7),
        min_size=3,
        max_size=25,
    )
)
@settings(max_examples=30, deadline=None)
def test_friedman_oracle_matches_direct(weeks):
    """Reference: rank within each block with pandas average ranks,
    tie-general Q = (k−1)·Σ(Rⱼ−n(k+1)/2)² / (Σr²−nk(k+1)²/4)."""
    k = 7
    n = len(weeks)
    # build one order per revenue unit on consecutive Mon..Sun days
    mondays = pd.date_range("2021-01-04", periods=n, freq="7D")
    rows = []
    for wi, rev7 in enumerate(weeks):
        for d, r in enumerate(rev7):
            rows.extend(
                [mondays[wi] + pd.Timedelta(days=d)] * r
            )
    orders = pd.DataFrame(
        {"o_orderdate": rows, "o_totalprice": 1.0}
    )
    ranks = np.zeros((n, k))
    for wi, rev7 in enumerate(weeks):
        ranks[wi] = pd.Series(rev7, dtype=float).rank(
            method="average"
        )
    colsums = ranks.sum(axis=0)
    s_num = ((colsums - n * (k + 1) / 2) ** 2).sum()
    s_den = (ranks**2).sum() - n * k * (k + 1) ** 2 / 4
    if s_den == 0:
        return  # all-tied blocks: Q undefined
    want = (k - 1) * s_num / s_den
    got = _run_all(
        ORACLES["stats_friedman_dow_revenue"], orders=orders
    )[0]
    assert got[0] == n
    _close(got[3], round(want, 6))


# ---- participation ratio ---------------------------------------------------


@given(
    st.lists(
        st.lists(
            st.integers(min_value=-999, max_value=999),
            min_size=64,
            max_size=64,
        ),
        min_size=5,
        max_size=40,
    )
)
@settings(max_examples=20, deadline=None)
def test_participation_ratio_oracle_matches_numpy(milli):
    x = np.asarray(milli, dtype=float) / 1000.0
    c = np.cov(x, rowvar=False, bias=True)
    tr = np.trace(c)
    tr2 = (c * c).sum()
    if tr2 < 1e-12:
        return  # zero-variance corpus: PR undefined
    want = tr * tr / tr2
    emb = pd.DataFrame(
        {
            "vec_id": range(len(milli)),
            "embedding": [list(map(float, row)) for row in x],
        }
    )
    got = _run_all(
        ORACLES["embedding_participation_ratio"], embeddings=emb
    )[0]
    assert got[0] == len(milli)
    assert got[1] == 64
    _close(got[2], tr, tol=1e-5)
    _close(got[3], tr2, tol=1e-5)
    _close(got[4], want, tol=1e-4)


# ---- CMH --------------------------------------------------------------------

cmh_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=89),  # day offset (3 months)
        st.sampled_from(["error", "view"]),
    ),
    min_size=40,
    max_size=300,
)


@given(cmh_rows)
@settings(max_examples=30, deadline=None)
def test_cmh_oracle_matches_direct(rows):
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        [d for d, _ in rows], unit="D"
    )
    events = pd.DataFrame(
        {"ts": ts, "event_type": [e for _, e in rows]}
    )
    wd = events["ts"].dt.dayofweek < 5
    err = events["event_type"] == "error"
    month = events["ts"].dt.month
    sum_a = sum_e = sum_v = sum_r = sum_s = 0.0
    k = 0
    n_ev = 0
    for mo in sorted(month.unique()):
        m = month == mo
        a = int((m & wd & err).sum())
        b = int((m & wd & ~err).sum())
        c = int((m & ~wd & err).sum())
        d = int((m & ~wd & ~err).sum())
        nk = a + b + c + d
        if nk <= 1:
            continue
        k += 1
        n_ev += nk
        sum_a += a
        sum_e += round((a + b) * (a + c) / nk, 9)
        sum_v += round(
            (a + b) * (c + d) * (a + c) * (b + d) / (nk**2 * (nk - 1)),
            9,
        )
        sum_r += round(a * d / nk, 9)
        sum_s += round(b * c / nk, 9)
    if sum_v == 0 or sum_s == 0:
        return  # degenerate family: chi2 / OR undefined
    want_chi2 = (sum_a - sum_e) ** 2 / sum_v
    want_or = sum_r / sum_s
    got = _run_all(ORACLES["stats_cmh_error_weekday"], events=events)[
        0
    ]
    assert got[0] == k
    assert got[1] == n_ev
    assert got[2] == sum_a
    _close(got[4], round(want_chi2, 6), tol=1e-5)
    _close(got[5], round(want_or, 6), tol=1e-5)


# ---- Dunn post-hoc -----------------------------------------------------------


@given(kw_rows)
@settings(max_examples=30, deadline=None)
def test_dunn_posthoc_oracle_matches_direct(rows):
    df = pd.DataFrame(rows, columns=["v", "g"])
    if df["g"].nunique() < 2 or df["v"].nunique() < 2:
        return
    # every group needs >= 1 row and the variance term n > 1
    if len(df) < 3:
        return
    orders = pd.DataFrame(
        {
            "o_totalprice": df["v"].astype(float),
            "o_orderpriority": df["g"].map("{}-GRP".format),
        }
    )
    ranks = df["v"].rank(method="average")
    n = len(df)
    tie3 = sum(t**3 - t for t in df.groupby("v").size().tolist())
    var_base = n * (n + 1) / 12 - tie3 / (12 * (n - 1))
    if var_base <= 0:
        return  # all values tied: z undefined
    groups = sorted(df["g"].unique())
    want = {}
    for ai in range(len(groups)):
        for bi in range(ai + 1, len(groups)):
            ga, gb = groups[ai], groups[bi]
            na = int((df["g"] == ga).sum())
            nb = int((df["g"] == gb).sum())
            z = (
                ranks[df["g"] == ga].mean()
                - ranks[df["g"] == gb].mean()
            ) / math.sqrt(var_base * (1 / na + 1 / nb))
            z = round(z, 6)
            p = 1 - math.erf(abs(z) / math.sqrt(2))
            want[(f"{ga}-GRP", f"{gb}-GRP")] = (z, p)
    got = _run_all(
        ORACLES["stats_dunn_posthoc_priority"], orders=orders
    )
    assert len(got) == len(want)
    # BH q-values: recompute from the wanted p's
    m = len(want)
    ordered = sorted(want.items(), key=lambda kv: (kv[1][1], kv[0]))
    qs = {}
    running = math.inf
    for i in range(m - 1, -1, -1):
        pair, (_, p) = ordered[i]
        running = min(running, p * m / (i + 1))
        qs[pair] = min(running, 1.0)
    for ga, gb, _na, _nb, z, p, q, _rej in got:
        wz, wp = want[(ga, gb)]
        _close(z, wz)
        _close(p, wp, tol=5e-7)
        _close(q, qs[(ga, gb)], tol=5e-6)


# ---- Nelson–Aalen -------------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # first-event day
            st.integers(min_value=0, max_value=15),  # extra days to purchase, or censor
            st.booleans(),  # converts?
        ),
        min_size=4,
        max_size=60,
    )
)
@settings(max_examples=30, deadline=None)
def test_nelson_aalen_oracle_matches_direct(users):
    rows = []
    obs = []
    base = pd.to_datetime("2024-02-01")
    for uid, (d0, extra, conv) in enumerate(users):
        f = base + pd.Timedelta(days=d0)
        last = f + pd.Timedelta(days=extra)
        rows.append((uid, f, "view"))
        rows.append((uid, last, "view"))
        if conv:
            rows.append((uid, last, "purchase"))
            obs.append((extra, 1))
        else:
            obs.append((extra, 0))
    events = pd.DataFrame(
        rows, columns=["user_id", "ts", "event_type"]
    )
    if not any(c for _, c in obs):
        return  # no deaths: empty curve both sides, nothing to compare
    df = pd.DataFrame(obs, columns=["dur", "d"])
    want = {}
    h = vh = 0.0
    total = len(df)
    for dur in sorted(df["dur"].unique()):
        deaths = int(df.loc[df["dur"] == dur, "d"].sum())
        at_risk = int((df["dur"] >= dur).sum())
        if deaths == 0:
            continue
        h += round(deaths / at_risk, 9)
        vh += round(deaths / at_risk**2, 12)
        want[dur] = (at_risk, deaths, h, vh, math.exp(-h))
    got = _run_all(ORACLES["users_nelson_aalen"], events=events)
    assert len(got) == len(want)
    for dur, at_risk, d, ch, hv, surv in got:
        wr, wd, wh, wv, ws = want[dur]
        assert (at_risk, d) == (wr, wd)
        _close(ch, round(wh, 6), tol=1e-6)
        _close(hv, round(wv, 9), tol=1e-9)
        _close(surv, ws, tol=1e-6)


# ---- CUPED --------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=999),  # pre cents
            st.integers(min_value=0, max_value=999),  # post cents
        ),
        min_size=6,
        max_size=80,
    )
)
@settings(max_examples=30, deadline=None)
def test_cuped_oracle_matches_numpy(users):
    """Events: each user gets one pre-midpoint and one post-midpoint
    purchase; arm = hash60(user_id) % 2 recomputed here via md5."""
    import hashlib

    def arm(uid: int) -> int:
        h = hashlib.md5(str(uid).encode()).hexdigest()[:15]
        return int(h, 16) % 2

    rows = []
    pre = pd.to_datetime("2024-01-05")
    post = pd.to_datetime("2024-03-05")
    for uid, (xc, yc) in enumerate(users):
        rows.append((uid, pre, "purchase", xc / 100.0))
        rows.append((uid, post, "purchase", yc / 100.0))
    events = pd.DataFrame(
        rows, columns=["user_id", "ts", "event_type", "value"]
    )
    x = np.array([xc / 100.0 for xc, _ in users])
    y = np.array([yc / 100.0 for _, yc in users])
    g = np.array([arm(u) for u in range(len(users))])
    if g.min() == g.max() or (g == 0).sum() < 2 or (g == 1).sum() < 2:
        return
    # match the oracle: theta = cov/var in the (N-1)-free form
    n = len(x)
    cov = (x * y).sum() - x.sum() * y.sum() / n
    varx = (x * x).sum() - x.sum() ** 2 / n
    vary = (y * y).sum() - y.sum() ** 2 / n
    if varx <= 0 or vary <= 0:
        return
    th = round(cov / varx, 9)
    rho2 = cov**2 / (varx * vary)
    xbar = x.mean()
    adj = y - th * (x - xbar)
    a, b = adj[g == 0], adj[g == 1]
    ya, yb = y[g == 0], y[g == 1]
    raw = yb.mean() - ya.mean()
    diff = b.mean() - a.mean()
    z = diff / math.sqrt(
        a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    )
    got = _run_all(
        ORACLES["events_ab_cuped_adjusted"], events=events
    )[0]
    assert got[0] == int((g == 0).sum())
    assert got[1] == int((g == 1).sum())
    _close(got[2], round(raw, 6), tol=1e-5)
    _close(got[3], round(th, 6), tol=1e-5)
    _close(got[4], round(rho2, 6), tol=1e-5)
    _close(got[5], round(diff, 6), tol=1e-5)
    _close(got[6], round(z, 6), tol=1e-4)


# ---- k-core ------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=14),
            st.integers(min_value=0, max_value=14),
        ),
        min_size=5,
        max_size=60,
    )
)
@settings(max_examples=30, deadline=None)
def test_kcore_oracle_matches_python_peel(raw_edges):
    """The oracle's fixed-round unrolled peel must agree with a plain
    Python peel run to FIXPOINT whenever the flag says it converged
    (8 rounds is far past fixpoint on these graphs)."""
    from football_etl_pipeline_spark.operators.graph import KCORE_K

    edges = {(min(u, v), max(u, v)) for u, v in raw_edges if u != v}
    if not edges:
        return
    cur = set(edges)
    while True:
        deg: dict[int, int] = {}
        for u, v in cur:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, d in deg.items() if d >= KCORE_K}
        nxt = {(u, v) for u, v in cur if u in keep and v in keep}
        if nxt == cur:
            break
        cur = nxt
    want: dict[int, int] = {}
    for u, v in cur:
        want[u] = want.get(u, 0) + 1
        want[v] = want.get(v, 0) + 1
    # feed the oracle an events table whose co-activity graph IS this
    # edge list: one overlapping session pair per edge, far apart
    ts = []
    for i, (u, v) in enumerate(sorted(edges)):
        base = pd.to_datetime("2024-01-01") + pd.Timedelta(hours=4 * i)
        # two events per user so each session is a 10-minute interval
        # and the pair genuinely overlaps ([T,T+10] vs [T+1,T+11])
        ts.append((int(u), base))
        ts.append((int(u), base + pd.Timedelta(minutes=10)))
        ts.append((int(v), base + pd.Timedelta(minutes=1)))
        ts.append((int(v), base + pd.Timedelta(minutes=11)))
    events = pd.DataFrame(ts, columns=["user_id", "ts"])
    events["event_id"] = range(len(events))
    got = _run_all(ORACLES["graph_kcore"], events=events)
    got_deg = {int(n): int(d) for n, d, _c in got}
    conv = all(bool(c) for _n, _d, c in got) if got else True
    if conv:
        assert got_deg == want


# ---- burstiness ---------------------------------------------------------------


@given(
    st.lists(
        st.integers(min_value=1, max_value=3600),  # gaps in seconds
        min_size=3,
        max_size=50,
    )
)
@settings(max_examples=30, deadline=None)
def test_burstiness_oracle_matches_numpy(gaps):
    ts = [pd.to_datetime("2024-01-01")]
    for g in gaps:
        ts.append(ts[-1] + pd.Timedelta(seconds=g))
    events = pd.DataFrame(
        {
            "ts": ts,
            "user_id": 1,
            "event_type": "click",
            "event_id": range(len(ts)),
        }
    )
    x = np.asarray(gaps, dtype=float) * 1e6  # microseconds
    mu = x.mean()
    sigma = x.std(ddof=0)  # population sigma, the stated convention
    if sigma + mu == 0:
        return
    want_b = (sigma - mu) / (sigma + mu)
    want_cv = sigma / mu
    got = _run_all(ORACLES["events_burstiness_index"], events=events)
    assert len(got) == 1
    et, n, mean_gap, cv, b = got[0]
    assert n == len(gaps)
    _close(mean_gap, round(mu / 1e6, 6), tol=1e-6)
    _close(cv, want_cv, tol=1e-5)
    _close(b, want_b, tol=1e-5)


# ---- Holt linear ---------------------------------------------------------------


@given(
    st.lists(
        st.integers(min_value=100, max_value=99999),
        min_size=2,
        max_size=40,
    )
)
@settings(max_examples=30, deadline=None)
def test_holt_oracle_matches_direct_recursion(cents):
    days = pd.date_range("2024-01-01", periods=len(cents), freq="D")
    events = pd.DataFrame(
        {
            "ts": days,
            "event_type": "purchase",
            "value": [c / 100.0 for c in cents],
        }
    )
    a, b = 0.5, 0.3
    x = [c / 100.0 for c in cents]
    l, t = x[0], 0.0
    want = [(l, t)]
    for v in x[1:]:
        nl = a * v + (1 - a) * (l + t)
        nt = b * (nl - l) + (1 - b) * t
        l, t = nl, nt
        want.append((l, t))
    got = _run_all(
        ORACLES["events_holt_linear_recursive"], events=events
    )
    assert len(got) == len(x)
    for (day, rev, lv, tr, fc), (wl, wt) in zip(got, want):
        _close(lv, round(wl, 6), tol=1e-6)
        _close(tr, round(wt, 6), tol=1e-6)
        _close(fc, round(wl + wt, 6), tol=1e-6)


# ---- price elasticity -----------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=50),  # quantity
            st.integers(min_value=100, max_value=99999),  # ext price cents
        ),
        min_size=5,
        max_size=80,
    )
)
@settings(max_examples=30, deadline=None)
def test_elasticity_oracle_matches_numpy(rows):
    q = np.array([r[0] for r in rows], dtype=float)
    ep = np.array([r[1] / 100.0 for r in rows])
    x = np.round(np.log(ep / q), 9)
    y = np.round(np.log(q), 9)
    n = len(rows)
    vx = n * (x * x).sum() - x.sum() ** 2
    vy = n * (y * y).sum() - y.sum() ** 2
    if vx < 1e-9 or vy < 1e-9:
        return  # degenerate: all prices or quantities equal
    cov = n * (x * y).sum() - x.sum() * y.sum()
    slope = cov / vx
    intercept = (y.sum() - slope * x.sum()) / n
    r2 = cov**2 / (vx * vy)
    lineitem = pd.DataFrame(
        {"l_quantity": q, "l_extendedprice": ep}
    )
    got = _run_all(
        ORACLES["lineitem_price_elasticity"], lineitem=lineitem
    )[0]
    assert got[0] == n
    _close(got[1], round(slope, 9), tol=1e-5)
    _close(got[2], round(intercept, 6), tol=1e-5)
    _close(got[3], round(r2, 6), tol=1e-5)


# ---- retention power-law fit ------------------------------------------------------


def test_retention_fit_matches_direct_on_synthetic():
    """Deterministic synthetic cohorts with known decay: cohort A
    starts day 0 (observes k=0..4), cohort B starts day 2 (observes
    k=0..2); actives chosen so pooled ratios are exact."""
    rows = []
    # cohort A: 4 users first-seen day 0
    for u in range(4):
        rows.append((u, 0))
    # A actives: day1 -> 3 users, day2 -> 2, day3 -> 2, day4 -> 1
    for u, k in [(0, 1), (1, 1), (2, 1), (0, 2), (1, 2),
                 (0, 3), (1, 3), (0, 4)]:
        rows.append((u, k))
    # cohort B: 2 users first-seen day 2
    for u in (10, 11):
        rows.append((u, 2))
    # B actives: day3 (k=1) -> 1 user, day4 (k=2) -> 1 user
    rows.append((10, 3))
    rows.append((11, 4))
    base = pd.to_datetime("2024-03-01")
    events = pd.DataFrame(
        {
            "user_id": [u for u, _ in rows],
            "ts": [base + pd.Timedelta(days=d) for _, d in rows],
        }
    )
    # horizon = day 4: cohort A observes k<=4, cohort B k<=2
    pooled = {
        1: (3 + 1, 4 + 2),  # k=1: A 3/4, B 1/2
        2: (2 + 1, 4 + 2),  # k=2: A 2/4, B 1/2
        3: (2, 4),          # k=3: only A eligible
        4: (1, 4),
    }
    xs = np.round(np.log(np.array(sorted(pooled))), 9).astype(float)
    ys = np.round(
        np.log(
            np.array(
                [pooled[k][0] / pooled[k][1] for k in sorted(pooled)]
            )
        ),
        9,
    )
    n = len(xs)
    vx = n * (xs * xs).sum() - xs.sum() ** 2
    cov = n * (xs * ys).sum() - xs.sum() * ys.sum()
    slope = round(cov / vx, 9)
    intercept = (ys.sum() - slope * xs.sum()) / n
    got = _run_all(
        ORACLES["events_retention_powerlaw_fit"], events=events
    )[0]
    assert got[0] == n
    _close(got[1], slope, tol=1e-6)
    _close(got[2], round(intercept, 6), tol=1e-6)
    proj = math.exp(round(intercept, 9) + slope * round(math.log(90), 9))
    _close(got[4], round(proj, 9), tol=1e-6)


# ---- Rayleigh ------------------------------------------------------------------


@given(
    st.lists(
        st.integers(min_value=0, max_value=23), min_size=5, max_size=200
    )
)
@settings(max_examples=30, deadline=None)
def test_rayleigh_oracle_matches_direct(hours):
    ts = [
        pd.to_datetime("2024-01-01") + pd.Timedelta(hours=h)
        for h in hours
    ]
    events = pd.DataFrame({"ts": ts})
    n = len(hours)
    from collections import Counter

    counts = Counter(hours)
    # mirror the oracle's exact pin chain: pinned factor (12dp),
    # per-hour term n_h*factor pinned 6dp, exact sums
    c = sum(
        round(nh * round(math.cos(2 * math.pi * h / 24), 12), 6)
        for h, nh in counts.items()
    )
    s = sum(
        round(nh * round(math.sin(2 * math.pi * h / 24), 12), 6)
        for h, nh in counts.items()
    )
    rbar = math.sqrt(c * c + s * s) / n
    z = n * rbar * rbar
    theta = round(math.atan2(s, c), 9)
    mean_hour = (theta + 2 * math.pi if theta < 0 else theta) * 24 / (
        2 * math.pi
    )
    got = _run_all(
        ORACLES["events_rayleigh_hour_uniformity"], events=events
    )[0]
    assert got[0] == n
    _close(got[1], round(rbar, 9), tol=1e-8)
    _close(got[2], round(z, 6), tol=1e-5)
    _close(got[3], round(mean_hour, 6), tol=1e-5)
