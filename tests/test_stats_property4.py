"""Property tests for the round-11 statistics chains. Same rationale
as the earlier suites: these are SQL TEXT chains shared by both
engines, so a transposed moment, a mis-weighted rank, or a wrong
variance constant produces plausible numbers BOTH engines agree on —
only an independent numpy/pandas/math computation from the raw rows
can catch it. Each test feeds a synthetic frame to the registered
DuckDB oracle and recomputes the statistic directly."""

from __future__ import annotations

import hashlib
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


def _h60(s: str) -> int:
    """The operators' portable 60-bit md5 hash, recomputed here."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---- Cochran's Q ------------------------------------------------------------

weeks_strategy = st.lists(
    st.lists(
        st.integers(min_value=1, max_value=500),  # 7 daily revenues
        min_size=7,
        max_size=7,
    ),
    min_size=3,
    max_size=12,
)


def _orders_from_weeks(weeks):
    """One order per day, Monday-aligned ISO weeks, integer prices."""
    rows = []
    start = pd.Timestamp("2024-01-01")  # a Monday
    for w, days in enumerate(weeks):
        for d, price in enumerate(days):
            rows.append(
                {
                    "o_orderkey": w * 7 + d,
                    "o_custkey": 1,
                    "o_orderstatus": "F",
                    "o_totalprice": float(price),
                    "o_orderdate": start + pd.Timedelta(days=w * 7 + d),
                    "o_orderpriority": "3-MEDIUM",
                }
            )
    return pd.DataFrame(rows)


@given(weeks_strategy)
@settings(max_examples=40, deadline=None)
def test_cochran_q_oracle_matches_direct(weeks):
    orders = _orders_from_weeks(weeks)
    x = np.array(
        [
            [1 if 7 * day > sum(week) else 0 for day in week]
            for week in weeks
        ]
    )
    nj = x.sum(axis=0)
    ri = x.sum(axis=1)
    ntot = x.sum()
    den = 7 * ri.sum() - (ri**2).sum()
    if den == 0:
        return  # every week all-above or all-below: Q undefined
    want = 6.0 * (7 * (nj**2).sum() - ntot**2) / den
    got = _run_all(ORACLES["stats_cochran_q_dow"], orders=orders)[0]
    assert got[0] == len(weeks)
    assert got[3] == ntot
    _close(got[4], round(want, 6), 1e-4)


# ---- Page's L ---------------------------------------------------------------


@given(weeks_strategy)
@settings(max_examples=40, deadline=None)
def test_page_trend_oracle_matches_direct(weeks):
    orders = _orders_from_weeks(weeks)
    n = len(weeks)
    l2 = 0
    for week in weeks:
        ranks = pd.Series(week).rank(method="average")  # dow order
        l2 += int(round((2 * ranks * np.arange(1, 8)).sum()))
    want_z = (l2 - 224.0 * n) / math.sqrt(n * 49 * 64 * 6 / 36)
    got = _run_all(ORACLES["stats_page_trend_dow"], orders=orders)[0]
    assert got[0] == n
    assert got[2] == l2
    assert got[3] == 224 * n
    _close(got[4], round(want_z, 6), 1e-4)


# ---- Fisher / Paasche price indices ----------------------------------------

li_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),  # partkey
        st.integers(min_value=0, max_value=2),  # year offset
        st.integers(min_value=1, max_value=9),  # quantity
        st.integers(min_value=100, max_value=5000),  # unit price cents
    ),
    min_size=6,
    max_size=60,
)


@given(li_rows)
@settings(max_examples=40, deadline=None)
def test_fisher_index_oracle_matches_direct(rows):
    recs = []
    for i, (pk, yo, qty, cents) in enumerate(rows):
        price = round(cents / 100.0, 2)
        recs.append(
            {
                "l_orderkey": i,
                "l_partkey": pk,
                "l_suppkey": 1,
                "l_linenumber": 1,
                "l_quantity": float(qty),
                "l_extendedprice": round(price * qty, 2),
                "l_discount": 0.0,
                "l_tax": 0.0,
                "l_returnflag": "N",
                "l_linestatus": "O",
                "l_shipdate": pd.Timestamp(f"{1995 + yo}-06-01"),
            }
        )
    li = pd.DataFrame(recs)
    li["yr"] = 1995 + np.array([r[1] for r in rows])
    li["unit"] = (li["l_extendedprice"] / li["l_quantity"]).round(6)
    py = (
        li.groupby(["l_partkey", "yr"])
        .agg(p=("unit", lambda s: round(s.sum() / len(s), 6)),
             q=("l_quantity", "sum"))
        .reset_index()
    )
    base_yr = py["yr"].min()
    base = py[py["yr"] == base_yr].set_index("l_partkey")
    got = _run_all(ORACLES["lineitem_fisher_price_index"], lineitem=li)
    for year, n_parts, lasp, paas, fish in got:
        cur = py[py["yr"] == year].set_index("l_partkey")
        common = cur.index.intersection(base.index)
        assert n_parts == len(common)
        l_num = (cur.loc[common, "p"] * base.loc[common, "q"]).sum()
        l_den = (base.loc[common, "p"] * base.loc[common, "q"]).sum()
        p_num = (cur.loc[common, "p"] * cur.loc[common, "q"]).sum()
        p_den = (base.loc[common, "p"] * cur.loc[common, "q"]).sum()
        _close(lasp, l_num / l_den * 100, 1e-4)
        _close(paas, p_num / p_den * 100, 1e-4)
        _close(fish, math.sqrt((l_num / l_den * 100)
                               * (p_num / p_den * 100)), 1e-4)


# ---- blocking-key fanout audit ---------------------------------------------


@given(st.lists(st.integers(min_value=1, max_value=8),
                min_size=2, max_size=120))
@settings(max_examples=40, deadline=None)
def test_fanout_audit_oracle_matches_direct(keys):
    li = pd.DataFrame(
        {
            "l_orderkey": range(len(keys)),
            "l_partkey": keys,
            "l_suppkey": 1,
            "l_linenumber": 1,
            "l_quantity": 1.0,
            "l_extendedprice": 1.0,
            "l_discount": 0.0,
            "l_tax": 0.0,
            "l_returnflag": "N",
            "l_linestatus": "O",
            "l_shipdate": pd.Timestamp("1995-06-01"),
        }
    )
    counts = pd.Series(keys).value_counts()
    pairs = {k: int(n * (n - 1) // 2) for k, n in counts.items()}
    total = sum(pairs.values())
    if total == 0:
        expect_pct = None
    got = _run_all(ORACLES["join_fanout_audit"], lineitem=li)
    expected_order = sorted(
        pairs.items(), key=lambda kv: (-kv[1], kv[0])
    )[:10]
    assert [(r[0], r[2]) for r in got] == expected_order
    for r in got:
        assert r[3] == total
        if total:
            _close(r[4], round(r[2] / total * 100, 6), 1e-4)


# ---- l-diversity ------------------------------------------------------------

cust_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # nation
        st.integers(min_value=0, max_value=3000),  # acctbal
        st.sampled_from(["AUTO", "BUILDING", "FURNITURE"]),  # segment
    ),
    min_size=4,
    max_size=80,
)


@given(cust_rows)
@settings(max_examples=40, deadline=None)
def test_l_diversity_oracle_matches_direct(rows):
    cust = pd.DataFrame(
        {
            "c_custkey": range(len(rows)),
            "c_name": "x",
            "c_nationkey": [r[0] for r in rows],
            "c_acctbal": [float(r[1]) for r in rows],
            "c_mktsegment": [r[2] for r in rows],
        }
    )
    df = pd.DataFrame(
        {
            "nation": cust["c_nationkey"],
            "band": np.floor(cust["c_acctbal"] / 1000).astype(int),
            "seg": cust["c_mktsegment"],
        }
    )
    classes = df.groupby(["nation", "band"])
    l_by_class = classes["seg"].nunique()
    size_by_class = classes.size()
    ent_l = []
    for key, grp in classes:
        p = grp["seg"].value_counts() / len(grp)
        ent_l.append(math.exp(-(p * np.log(p)).sum()))
    got = _run_all(ORACLES["customer_l_diversity"], customer=cust)[0]
    assert got[0] == len(l_by_class)
    assert got[1] == len(df)
    assert got[2] == l_by_class.min()
    assert got[3] == int((l_by_class < 2).sum())
    assert got[4] == int(size_by_class[l_by_class < 2].sum())
    assert got[5] == int((l_by_class < 3).sum())
    assert got[6] == int(size_by_class[l_by_class < 3].sum())
    _close(got[7], min(ent_l), 1e-4)


# ---- delta-method ratio metric ---------------------------------------------

ev_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=25),  # user id
        st.booleans(),  # purchase?
        st.integers(min_value=1, max_value=900),  # value cents
    ),
    min_size=20,
    max_size=200,
)


def _events_frame(rows):
    return pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [
                pd.Timestamp("2024-01-01") + pd.Timedelta(hours=i)
                for i in range(len(rows))
            ],
            "user_id": [r[0] for r in rows],
            "event_type": [
                "purchase" if r[1] else "view" for r in rows
            ],
            "value": [round(r[2] / 100.0, 2) for r in rows],
            "props": "{}",
        }
    )


@given(ev_rows)
@settings(max_examples=30, deadline=None)
def test_delta_method_oracle_matches_direct(rows):
    ev = _events_frame(rows)
    ev2 = ev.assign(
        pval=np.where(ev["event_type"] == "purchase", ev["value"], 0.0)
    )
    per = ev2.groupby("user_id").agg(x=("pval", "sum"), y=("pval", "size"))
    per["arm"] = [_h60(str(u)) % 2 for u in per.index]
    stats = {}
    for arm, g in per.groupby("arm"):
        n = len(g)
        if n < 2:
            return
        sy = g["y"].sum()
        if sy == 0:
            return
        r = g["x"].sum() / sy
        vx = g["x"].var(ddof=1)
        vy = g["y"].var(ddof=1)
        cxy = g["x"].cov(g["y"], ddof=1)
        ybar = g["y"].mean()
        se2 = (vx - 2 * r * cxy + r * r * vy) / (n * ybar * ybar)
        stats[arm] = (n, r, se2)
    if len(stats) < 2:
        return
    got = _run_all(ORACLES["events_ab_delta_method"], events=ev)[0]
    assert got[0] == stats[0][0] and got[1] == stats[1][0]
    _close(got[2], stats[0][1], 1e-4)
    _close(got[3], stats[1][1], 1e-4)
    _close(got[4], stats[1][1] - stats[0][1], 1e-4)
    se = math.sqrt(stats[0][2] + stats[1][2])
    _close(got[5], se, 1e-4)
    _close(got[6], (stats[1][1] - stats[0][1]) / se, 1e-3)


# ---- Wald SPRT monitor ------------------------------------------------------


@given(ev_rows)
@settings(max_examples=30, deadline=None)
def test_sprt_oracle_matches_direct(rows):
    ev = _events_frame(rows)
    days = ev.assign(day=ev["ts"].dt.normalize())
    d0 = days.groupby("user_id")["day"].min()
    dp = (
        days[days["event_type"] == "purchase"]
        .groupby("user_id")["day"].min()
    )
    per = pd.DataFrame({"d0": d0, "dp": dp.reindex(d0.index)})
    per = per[[_h60(str(u)) % 2 == 1 for u in per.index]]
    if per.empty:
        return
    per["conv"] = (per["dp"] == per["d0"]).astype(int)
    daily = (
        per.groupby("d0")
        .agg(n=("conv", "size"), c=("conv", "sum"))
        .sort_index()
    )
    n_cum = daily["n"].cumsum()
    c_cum = daily["c"].cumsum()
    lr1 = math.log(0.30 / 0.25)
    lr0 = math.log((1 - 0.30) / (1 - 0.25))
    got = _run_all(ORACLES["events_ab_sequential_sprt"], events=ev)
    assert len(got) == len(daily)
    for row, (nc, cc) in zip(got, zip(n_cum, c_cum)):
        assert row[1] == nc and row[2] == cc
        llr = cc * lr1 + (nc - cc) * lr0
        _close(row[3], llr, 1e-6)
        want = (
            "accept_h1" if llr >= math.log(19)
            else "accept_h0" if llr <= -math.log(19)
            else "continue"
        )
        assert row[4] == want


# ---- stratified meta-analysis ----------------------------------------------


@given(ev_rows)
@settings(max_examples=30, deadline=None)
def test_meta_analysis_oracle_matches_direct(rows):
    ev = _events_frame(rows)
    days = ev.assign(day=ev["ts"].dt.normalize())
    d0 = days.groupby("user_id")["day"].min()
    dp = (
        days[days["event_type"] == "purchase"]
        .groupby("user_id")["day"].min()
    )
    per = pd.DataFrame(
        {
            "n_ev": days.groupby("user_id").size(),
            "conv": (dp.reindex(d0.index) == d0).astype(int),
        }
    )
    t1 = np.quantile(per["n_ev"], 1 / 3, method="linear")
    t2 = np.quantile(per["n_ev"], 2 / 3, method="linear")
    t1r, t2r = round(t1, 6), round(t2, 6)
    if any(
        abs(v - t) < 1e-5 and abs(v - t) > 0
        for v in per["n_ev"]
        for t in (t1, t2)
    ):
        return  # boundary within rounding slack: membership ambiguous
    seg = np.where(
        per["n_ev"] <= t1r, "low",
        np.where(per["n_ev"] <= t2r, "mid", "high"),
    )
    per["seg"] = seg
    per["arm"] = [_h60(str(u)) % 2 for u in per.index]
    sw = swd = 0.0
    k = n_users = 0
    deltas = []
    for _, g in per.groupby("seg"):
        n0 = int((g["arm"] == 0).sum())
        n1 = int((g["arm"] == 1).sum())
        c0 = int(g.loc[g["arm"] == 0, "conv"].sum())
        c1 = int(g.loc[g["arm"] == 1, "conv"].sum())
        if not (0 < c0 < n0 and 0 < c1 < n1):
            continue
        p0, p1 = c0 / n0, c1 / n1
        d = p1 - p0
        w = 1 / (p0 * (1 - p0) / n0 + p1 * (1 - p1) / n1)
        sw += w
        swd += w * d
        deltas.append((d, w))
        k += 1
        n_users += n0 + n1
    got = _run_all(
        ORACLES["events_ab_stratified_metaanalysis"], events=ev
    )[0]
    assert got[0] == k
    if k == 0:
        return
    assert got[1] == n_users
    pooled = swd / sw
    _close(got[2], pooled, 1e-4)
    _close(got[3], math.sqrt(1 / sw), 1e-4)
    q = sum(w * (d - pooled) ** 2 for d, w in deltas)
    _close(got[5], round(q, 6), 1e-3)
    if round(q, 6) > 1e-4:
        # below that, the oracle's DECIMAL(18,6) pin floors q to ~0 and
        # its I-squared guard returns 0 while the float q here is a
        # denormal-scale residual — the ratio is meaningless for both
        _close(got[7], round(max(0.0, (q - (k - 1)) / q), 6), 1e-3)


# ---- Holt-Winters additive recursion ---------------------------------------


@given(
    st.lists(
        st.integers(min_value=1, max_value=400),
        min_size=9,
        max_size=28,
    )
)
@settings(max_examples=30, deadline=None)
def test_holt_winters_oracle_matches_direct_recursion(dailyrev):
    ev = pd.DataFrame(
        {
            "event_id": range(len(dailyrev)),
            "ts": [
                pd.Timestamp("2024-01-01") + pd.Timedelta(days=i)
                for i in range(len(dailyrev))
            ],
            "user_id": 1,
            "event_type": "purchase",
            "value": [float(v) for v in dailyrev],
            "props": "{}",
        }
    )
    x = [float(v) for v in dailyrev]
    m = sum(x[:7]) / 7
    l, b = m, 0.0
    ring = [xi - m for xi in x[:7]]
    a, beta, g = 0.30, 0.10, 0.20
    rows = [(6, l, b, ring[6], None)]  # t=7 init row (0-indexed day 6)
    for t in range(7, len(x)):
        s1 = ring[0]
        fitted = l + b + s1
        l_new = a * (x[t] - s1) + (1 - a) * (l + b)
        b_new = beta * (l_new - l) + (1 - beta) * b
        s_new = g * (x[t] - l_new) + (1 - g) * s1
        ring = ring[1:] + [s_new]
        l, b = l_new, b_new
        rows.append((t, l, b, ring[6], fitted))
    got = _run_all(ORACLES["events_holt_winters_additive"], events=ev)
    assert len(got) == len(rows)
    for grow, (t, lv, tr, se, fit) in zip(got, rows):
        _close(grow[2], lv, 1e-4)
        _close(grow[3], tr, 1e-4)
        _close(grow[4], se, 1e-4)
        if fit is None:
            assert grow[5] is None
        else:
            _close(grow[5], fit, 1e-4)


# ---- Croston recursion ------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),  # day gap seed
            st.integers(min_value=1, max_value=50),  # quantity
            st.sampled_from([3, 7]),  # part (top-part selection matters)
        ),
        min_size=2,
        max_size=30,
    )
)
@settings(max_examples=30, deadline=None)
def test_croston_oracle_matches_direct_recursion(events):
    # two candidate parts: expected series is the one with MORE lines
    # (tie -> smaller partkey), replicating the operator's top1 rule
    from collections import Counter

    line_counts = Counter(pk for _, _, pk in events)
    top_part = sorted(
        line_counts.items(), key=lambda kv: (-kv[1], kv[0])
    )[0][0]
    day = pd.Timestamp("1995-01-01")
    recs, series = [], []
    for i, (gap, qty, pk) in enumerate(events):
        day = day + pd.Timedelta(days=gap + (1 if i else 0))
        recs.append(
            {
                "l_orderkey": i,
                "l_partkey": pk,
                "l_suppkey": 1,
                "l_linenumber": 1,
                "l_quantity": float(qty),
                "l_extendedprice": 1.0,
                "l_discount": 0.0,
                "l_tax": 0.0,
                "l_returnflag": "N",
                "l_linestatus": "O",
                "l_shipdate": day,
            }
        )
        if pk == top_part:
            series.append((day, float(qty)))
    li = pd.DataFrame(recs)
    agg = {}
    for d, q in series:
        agg[d] = agg.get(d, 0.0) + q
    seq = sorted(agg.items())[-32:]
    a = 0.2
    z = p = None
    rows = []
    for t, (d, dem) in enumerate(seq, start=1):
        q = 1 if t == 1 else (d - seq[t - 2][0]).days
        if t == 1:
            z, p = dem, 1.0
        else:
            z = a * dem + (1 - a) * z
            p = a * q + (1 - a) * p
        rows.append((t, d, dem, q, z, p))
    got = _run_all(ORACLES["lineitem_croston_intermittent"], lineitem=li)
    assert len(got) == len(rows)
    for grow, (t, d, dem, q, z, p) in zip(got, rows):
        assert grow[0] == t
        assert grow[3] == q
        _close(grow[2], dem, 1e-6)
        _close(grow[4], z, 1e-4)
        _close(grow[5], p, 1e-4)
        _close(grow[6], z / p, 1e-4)
        _close(grow[7], (1 - a / 2) * z / p, 1e-4)


# ---- Brier decomposition ----------------------------------------------------

EN_WORDS = ["the", "and", "of"]  # known en markers in the operator set
OTHER_WORDS = ["zzz", "qqq", "xxx"]

doc_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # en-marker words
        st.integers(min_value=1, max_value=6),  # filler words
        st.booleans(),  # labeled en?
    ),
    min_size=5,
    max_size=60,
)


def _docs_frame(rows):
    recs = []
    for i, (n_mark, n_fill, is_en) in enumerate(rows):
        words = (
            [EN_WORDS[j % 3] for j in range(n_mark)]
            + [OTHER_WORDS[j % 3] for j in range(n_fill)]
        )
        text = " ".join(words)
        recs.append(
            {
                "doc_id": i,
                "text": text,
                "lang": "en" if is_en else "de",
                "source": "s0",
                "n_chars": len(text),
            }
        )
    return pd.DataFrame(recs)


def _en_score(text: str) -> float:
    toks = text.strip().lower().split()
    if not toks:
        return 0.0
    return sum(t in EN_WORDS for t in toks) / len(toks)


@given(doc_strategy)
@settings(max_examples=30, deadline=None)
def test_brier_decomposition_oracle_matches_direct(rows):
    from football_etl_pipeline_spark.operators.textops import LANG_MARKERS

    assert set(EN_WORDS) <= set(LANG_MARKERS["en"])
    assert not (set(OTHER_WORDS) & {
        w for ws in LANG_MARKERS.values() for w in ws
    })
    docs = _docs_frame(rows)
    s = docs["text"].map(_en_score)
    y = (docs["lang"] == "en").astype(int)
    n = len(docs)
    bs = ((s - y) ** 2).mean()
    ybar = y.mean()
    bins = np.minimum(np.floor(s * 10).astype(int), 9)
    rel = res = 0.0
    for b in np.unique(bins):
        mask = bins == b
        nk = int(mask.sum())
        pbar = round(s[mask].mean(), 9)
        ybark = y[mask].mean()
        rel += nk * (pbar - ybark) ** 2
        res += nk * (ybark - ybar) ** 2
    got = _run_all(ORACLES["eval_brier_decomposition"], documents=docs)[0]
    assert got[0] == n
    _close(got[1], ybar, 1e-6)
    _close(got[2], bs, 1e-6)
    _close(got[3], rel / n, 1e-6)
    _close(got[4], res / n, 1e-6)
    _close(got[5], ybar * (1 - ybar), 1e-6)
    _close(got[6], bs - (ybar * (1 - ybar) - res / n + rel / n), 1e-5)


# ---- logistic-regression gradient descent ----------------------------------


@given(doc_strategy)
@settings(max_examples=20, deadline=None)
def test_logreg_gd_oracle_matches_numpy_descent(rows):
    docs = _docs_frame(rows)
    x1 = docs["n_chars"].to_numpy(float) / 1000
    x2 = docs["text"].map(_en_score).to_numpy(float)
    y = (docs["lang"] == "en").to_numpy(float)
    n = len(docs)
    w = np.zeros(3)
    eta = 2.0
    got = _run_all(ORACLES["text_logreg_train_gd"], documents=docs)
    assert len(got) == 3
    for step in range(3):
        z = w[0] + w[1] * x1 + w[2] * x2
        sg = 1 / (1 + np.exp(-z))
        g0 = (sg - y).mean()
        g1 = ((sg - y) * x1).mean()
        g2 = ((sg - y) * x2).mean()
        w = np.round(w - eta * np.array([g0, g1, g2]), 12)
        zs = w[0] + w[1] * x1 + w[2] * x2
        ps = 1 / (1 + np.exp(-zs))
        loss = -(y * np.log(ps) + (1 - y) * np.log(1 - ps)).mean()
        acc = ((ps >= 0.5) == (y == 1)).mean()
        row = got[step]
        assert row[0] == step + 1
        _close(row[1], w[0], 1e-6)
        _close(row[2], w[1], 1e-6)
        _close(row[3], w[2], 1e-6)
        _close(row[4], loss, 1e-5)
        _close(row[5], acc, 1e-6)


# ---- naive Bayes language classifier ---------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),  # words per doc
            st.sampled_from(["en", "de"]),
        ),
        min_size=10,
        max_size=60,
    )
)
@settings(max_examples=20, deadline=None)
def test_naive_bayes_oracle_matches_direct(rows):
    vocab_by_lang = {"en": EN_WORDS, "de": OTHER_WORDS}
    recs = []
    for i, (nw, lang) in enumerate(rows):
        words = [vocab_by_lang[lang][j % 3] for j in range(nw)]
        text = " ".join(words)
        recs.append(
            {
                "doc_id": i,
                "text": text,
                "lang": lang,
                "source": "s0",
                "n_chars": len(text),
            }
        )
    docs = pd.DataFrame(recs)
    docs["fold"] = [_h60(str(i)) % 5 for i in docs["doc_id"]]
    train = docs[docs["fold"] != 0]
    test = docs[docs["fold"] == 0]
    if train.empty or test.empty or train["lang"].nunique() == 0:
        return
    counts: dict[str, dict[str, int]] = {}
    totals: dict[str, int] = {}
    vocab = set()
    for _, r in train.iterrows():
        toks = r["text"].split()
        vocab.update(toks)
        counts.setdefault(r["lang"], {})
        totals[r["lang"]] = totals.get(r["lang"], 0) + len(toks)
        for t in toks:
            counts[r["lang"]][t] = counts[r["lang"]].get(t, 0) + 1
    v = len(vocab)
    priors = train["lang"].value_counts()
    n_train = len(train)
    confusion: dict[tuple, int] = {}
    for _, r in test.iterrows():
        toks = r["text"].split()
        best = None
        for lang in sorted(priors.index):
            score = round(math.log(priors[lang] / n_train), 12)
            for t in toks:
                c = counts.get(lang, {}).get(t, 0)
                score += round(
                    math.log((c + 1) / (totals[lang] + v)), 12
                )
            if best is None or score > best[0] + 1e-9:
                best = (score, lang)
        key = (r["lang"], best[1])
        confusion[key] = confusion.get(key, 0) + 1
    got = _run_all(ORACLES["text_naive_bayes_langid"], documents=docs)
    got_map = {(r[0], r[1]): r[2] for r in got}
    assert got_map == confusion


# ---- HITS hubs & authorities ------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),  # customer
            st.integers(min_value=1, max_value=6),  # part
        ),
        min_size=3,
        max_size=40,
    )
)
@settings(max_examples=30, deadline=None)
def test_hits_oracle_matches_integer_iteration(pairs):
    orders = pd.DataFrame(
        {
            "o_orderkey": range(len(pairs)),
            "o_custkey": [c for c, _ in pairs],
            "o_orderstatus": "F",
            "o_totalprice": 1.0,
            "o_orderdate": pd.Timestamp("1995-06-01"),
            "o_orderpriority": "3-MEDIUM",
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": range(len(pairs)),
            "l_partkey": [p for _, p in pairs],
            "l_suppkey": 1,
            "l_linenumber": 1,
            "l_quantity": 1.0,
            "l_extendedprice": 1.0,
            "l_discount": 0.0,
            "l_tax": 0.0,
            "l_returnflag": "N",
            "l_linestatus": "O",
            "l_shipdate": pd.Timestamp("1995-06-01"),
        }
    )
    edges = sorted({(c, p) for (c, p) in pairs})
    h1 = {}
    for c, p in edges:
        h1[c] = h1.get(c, 0) + 1
    a1, h2, a2 = {}, {}, {}
    for c, p in edges:
        a1[p] = a1.get(p, 0) + h1[c]
    for c, p in edges:
        h2[c] = h2.get(c, 0) + a1[p]
    for c, p in edges:
        a2[p] = a2.get(p, 0) + h2[c]
    top_auth = sorted(a2.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    top_hub = sorted(h2.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = _run_all(
        ORACLES["graph_hits_hubs_authorities"], orders=orders, lineitem=li
    )
    want = sorted(
        [("authority", n, s) for n, s in top_auth]
        + [("hub", n, s) for n, s in top_hub],
        key=lambda r: (r[0], -r[2], r[1]),
    )
    assert [tuple(r) for r in got] == want
