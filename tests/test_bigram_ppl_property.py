"""Property test for ``text_bigram_addk_perplexity``.

The add-k chain is one oracle SQL text whose Spark twin is checked by
the dual-engine gate — but a slip both implementations share (wrong V,
wrong OOV mapping, wrong smoothing algebra) would pass the gate. This
suite runs the ORACLE text on synthetic document frames in DuckDB and
compares against a direct Python implementation of the model: md5
bucket split, train bigram/context counts, vocab+UNK, per-bigram
p = (c+k)/(c(·)+k·V), ln terms quantized DECIMAL(18,6) before the
per-doc sum, avg in exact integer micro-nats via the sign-aware
(2|S|+n)//(2n) half-away rule (replaying the pins, not
approximating them).

Invariants pinned:
- output rows = exactly the test-bucket docs with ≥1 bigram;
- n_bigrams / n_oov_bigrams match exact integer counts;
- avg_logprob / perplexity match the quantized-reference within 1e-9
  relative (only the final DECIMAL pins may differ, by < 1 ulp of
  the pin granularity).
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from football_etl_pipeline_spark.operators.textops import (
    PPL_K,
    _bigram_ppl_oracle,
)


def _bucket(text: str) -> int:
    return int(hashlib.md5(text.encode()).hexdigest()[:15], 16) % 100


def _toks(text: str) -> list[str]:
    return re.split(r"[\s\v]+", text.lower().strip(" "))


def _pin(x: float, places: int) -> Decimal:
    return Decimal(x).quantize(Decimal(1).scaleb(-places), ROUND_HALF_UP)


def ppl_reference(texts):
    """Direct implementation: texts = [(doc_id, text)] → per-doc
    (n_bigrams, n_oov_bigrams, avg_logprob, perplexity)."""
    docs = [(d, _toks(t), _bucket(t)) for d, t in texts]
    train = [toks for _, toks, b in docs if b < 90]
    test = [(d, toks) for d, toks, b in docs if b >= 95]
    trainbg: Counter = Counter()
    for toks in train:
        trainbg.update(zip(toks, toks[1:]))
    ctx: Counter = Counter()
    for (a, _b), c in trainbg.items():
        ctx[a] += c
    vocab = {w for toks in train for w in toks}
    v = len(vocab) + 1
    out = {}
    for d, toks in test:
        bgs = list(zip(toks, toks[1:]))
        if not bgs:
            continue
        n = len(bgs)
        noov = 0
        slog = Decimal(0)
        for (a, b), m in Counter(bgs).items():
            oov = a not in vocab or b not in vocab
            a2 = a if a in vocab else "\x01"
            b2 = b if b in vocab else "\x01"
            p = (trainbg.get((a2, b2), 0) + PPL_K) / (
                ctx.get(a2, 0) + PPL_K * v
            )
            if oov:
                noov += m
            slog += _pin(m * math.log(p), 6)
        avg_raw = float(slog) / n
        s_int = int(slog.scaleb(6))  # slog is exactly 6dp -> exact BIGINT
        half_away = (
            (2 * s_int + n) // (2 * n)
            if s_int >= 0
            else -((2 * (-s_int) + n) // (2 * n))
        )
        out[d] = (
            n,
            noov,
            half_away,
            float(_pin(math.exp(-avg_raw), 6)),
        )
    return out


def run_ppl(texts):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    if texts:
        con.executemany("INSERT INTO documents VALUES (?, ?)", texts)
    out = con.execute(_bigram_ppl_oracle()).fetchall()
    con.close()
    return out


_WORD = st.text(alphabet="abcde", min_size=1, max_size=3)


@settings(max_examples=30, deadline=None)
@given(
    n_docs=st.integers(min_value=0, max_value=50),
    data=st.data(),
)
def test_bigram_ppl_matches_reference(n_docs, data):
    texts = []
    for d in range(n_docs):
        words = data.draw(st.lists(_WORD, min_size=0, max_size=8))
        texts.append((d, " ".join(words)))
    expect = ppl_reference(texts)
    got = run_ppl(texts)
    assert {r[0] for r in got} == set(expect)
    for doc_id, n_bg, n_oov, avg_micro, ppl in got:
        en, eoov, eavg, eppl = expect[doc_id]
        assert n_bg == en, (doc_id, n_bg, en)
        assert n_oov == eoov, (doc_id, n_oov, eoov)
        assert avg_micro == eavg, (doc_id, avg_micro, eavg)
        assert math.isclose(ppl, eppl, rel_tol=1e-9, abs_tol=1e-9), (
            doc_id, ppl, eppl,
        )


def test_bigram_ppl_uniform_floor_for_pure_oov():
    """A test doc whose words never occur in train scores exactly the
    uniform floor: every bigram maps to (UNK, UNK) → p = k/(k·V) =
    1/V, so perplexity = V (up to the decimal pins)."""
    # craft texts whose buckets land in the needed ranges
    train_texts, test_text = [], None
    i = 0
    while len(train_texts) < 3 or test_text is None:
        t = f"zz{i} yy{i} zz{i} xx{i}"
        if _bucket(t) < 90 and len(train_texts) < 3:
            train_texts.append(t)
        elif _bucket(t) >= 95 and test_text is None:
            # replace words so they are disjoint from train vocab
            t2 = t.replace("zz", "qq").replace("yy", "pp").replace("xx", "rr")
            if _bucket(t2) >= 95:
                test_text = t2
        i += 1
    texts = [(d, t) for d, t in enumerate(train_texts)]
    texts.append((99, test_text))
    got = {r[0]: r for r in run_ppl(texts)}
    assert 99 in got
    _, n_bg, n_oov, _avg, ppl = got[99]
    assert n_oov == n_bg  # every transition is OOV
    vocab_size = len({w for t in train_texts for w in _toks(t)}) + 1
    assert math.isclose(ppl, vocab_size, rel_tol=1e-4), (ppl, vocab_size)


# ---- Kneser-Ney twin -----------------------------------------------------

def kn_reference(texts):
    """Direct interpolated-KN implementation (fixed D, add-one UNK
    closure of the continuation distribution), replaying the oracle's
    decimal pins — texts = [(doc_id, text)]."""
    from football_etl_pipeline_spark.operators.textops import PPL_KN_D

    docs = [(d, _toks(t), _bucket(t)) for d, t in texts]
    train = [toks for _, toks, b in docs if b < 90]
    test = [(d, toks) for d, toks, b in docs if b >= 95]
    trainbg: Counter = Counter()
    for toks in train:
        trainbg.update(zip(toks, toks[1:]))
    ca: Counter = Counter()
    n1f: Counter = Counter()
    n1b: Counter = Counter()
    for (a, b), c in trainbg.items():
        ca[a] += c
        n1f[a] += 1
        n1b[b] += 1
    nn = len(trainbg)
    vocab = {w for toks in train for w in toks}
    v = len(vocab) + 1
    out = {}
    for d, toks in test:
        bgs = list(zip(toks, toks[1:]))
        if not bgs:
            continue
        n = len(bgs)
        noov = 0
        slog = Decimal(0)
        for (a, b), m in Counter(bgs).items():
            oov = a not in vocab or b not in vocab
            a2 = a if a in vocab else "\x01"
            b2 = b if b in vocab else "\x01"
            pcont = (n1b.get(b2, 0) + 1.0) / (nn + v)
            if a2 not in ca:
                p = pcont
            else:
                p = (
                    max(trainbg.get((a2, b2), 0) - PPL_KN_D, 0) / ca[a2]
                    + (PPL_KN_D * n1f[a2] / ca[a2]) * pcont
                )
            if oov:
                noov += m
            slog += _pin(m * math.log(p), 6)
        avg_raw = float(slog) / n
        s_int = int(slog.scaleb(6))  # slog is exactly 6dp -> exact BIGINT
        half_away = (
            (2 * s_int + n) // (2 * n)
            if s_int >= 0
            else -((2 * (-s_int) + n) // (2 * n))
        )
        out[d] = (
            n,
            noov,
            half_away,
            float(_pin(math.exp(-avg_raw), 6)),
        )
    return out


def run_kn(texts):
    from football_etl_pipeline_spark.operators.textops import (
        _bigram_kn_oracle,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    if texts:
        con.executemany("INSERT INTO documents VALUES (?, ?)", texts)
    out = con.execute(_bigram_kn_oracle()).fetchall()
    con.close()
    return out


@settings(max_examples=30, deadline=None)
@given(
    n_docs=st.integers(min_value=0, max_value=50),
    data=st.data(),
)
def test_kn_ppl_matches_reference(n_docs, data):
    texts = []
    for d in range(n_docs):
        words = data.draw(st.lists(_WORD, min_size=0, max_size=8))
        texts.append((d, " ".join(words)))
    expect = kn_reference(texts)
    got = run_kn(texts)
    assert {r[0] for r in got} == set(expect)
    for doc_id, n_bg, n_oov, avg_micro, ppl in got:
        en, eoov, eavg, eppl = expect[doc_id]
        assert n_bg == en and n_oov == eoov, (doc_id, n_bg, n_oov)
        assert avg_micro == eavg, (doc_id, avg_micro, eavg)
        assert math.isclose(ppl, eppl, rel_tol=1e-9, abs_tol=1e-9), (
            doc_id, ppl, eppl,
        )


def test_kn_discounted_mass_is_conserved():
    """On a no-OOV model, interpolated KN must be a proper
    distribution per seen context: sum over the TRAIN VOCABULARY + UNK
    of P(w2|w1) = 1 − D·N1+(w1·)/c(w1·) · (1 − Σ_vocab+unk Pcont).
    With the add-one closure Σ over vocab+UNK of Pcont =
    (Σ n1b + V)/(nn + V) which is 1 only when every vocab word has
    n1b counted — verify numerically instead of algebraically."""
    from football_etl_pipeline_spark.operators.textops import PPL_KN_D

    train = ["a b a c a b", "b c b a"]
    # force into train bucket by construction: test the MODEL directly
    docs = [t.split() for t in train]
    trainbg: Counter = Counter()
    for toks in docs:
        trainbg.update(zip(toks, toks[1:]))
    ca: Counter = Counter()
    n1f: Counter = Counter()
    n1b: Counter = Counter()
    for (a, b), c in trainbg.items():
        ca[a] += c
        n1f[a] += 1
        n1b[b] += 1
    nn = len(trainbg)
    vocab = {w for toks in docs for w in toks}
    v = len(vocab) + 1
    support = sorted(vocab) + ["\x01"]
    pcont_sum = sum((n1b.get(w, 0) + 1.0) / (nn + v) for w in support)
    for a in sorted(ca):
        total = sum(
            max(trainbg.get((a, w), 0) - PPL_KN_D, 0) / ca[a]
            + (PPL_KN_D * n1f[a] / ca[a])
            * ((n1b.get(w, 0) + 1.0) / (nn + v))
            for w in support
        )
        # proper distribution up to the continuation closure's mass:
        # total = (ca - D*n1f)/ca + D*n1f/ca * pcont_sum
        expect = (ca[a] - PPL_KN_D * n1f[a]) / ca[a] + (
            PPL_KN_D * n1f[a] / ca[a]
        ) * pcont_sum
        assert math.isclose(total, expect, rel_tol=1e-12)
        # and pcont_sum itself is within (0, 1]; with add-one closure
        # it is exactly (sum(n1b) + |support|)/(nn + v)
        assert 0 < pcont_sum <= 1.0 + 1e-12
