"""Property test for ``text_bigram_addk_perplexity``.

The add-k chain is one oracle SQL text whose Spark twin is checked by
the dual-engine gate — but a slip both implementations share (wrong V,
wrong OOV mapping, wrong smoothing algebra) would pass the gate. This
suite runs the ORACLE text on synthetic document frames in DuckDB and
compares against a direct Python implementation of the model: md5
bucket split, train bigram/context counts, vocab+UNK, per-bigram
p = (c+k)/(c(·)+k·V), ln terms quantized DECIMAL(18,6) before the
per-doc sum (replaying the pin, not approximating it).

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
        out[d] = (
            n,
            noov,
            float(_pin(avg_raw, 9)),
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
    for doc_id, n_bg, n_oov, avg, ppl in got:
        en, eoov, eavg, eppl = expect[doc_id]
        assert n_bg == en, (doc_id, n_bg, en)
        assert n_oov == eoov, (doc_id, n_oov, eoov)
        assert math.isclose(avg, eavg, rel_tol=1e-9, abs_tol=1e-9), (
            doc_id, avg, eavg,
        )
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
