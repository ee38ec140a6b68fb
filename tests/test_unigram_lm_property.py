"""Property test for ``text_unigram_lm_train``.

The EM pipeline is one set of shared SQL fragments run by both
engines, so the dual-engine gate can't catch a slip both dialects
share. This suite runs the assembled oracle text on synthetic
document frames in DuckDB against a direct Python implementation of
the same hard-EM: substring seed, integer-picounat costs, exact
Viterbi via the encoded-state lexicographic min, top-40+chars
pruning, add-one smoothed re-estimation.

Counts, pieces, and ranks must match EXACTLY (they are integers
derived from integer-cost argmins); cost_units may differ by ±1
picounat (Python libm vs engine ln at the 12th-decimal rounding
boundary — the engines agree with each other by the oracle gate, the
reference is allowed the last ulp).
"""

from __future__ import annotations

import math
import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from football_etl_pipeline_spark.operators.textops import (
    UG_EM_ITERS,
    UG_KEEP,
    UG_MAX_PLEN,
    UG_MAX_WLEN,
    _UG_TRAIN_FINAL,
    _ug_assemble,
    _ug_steps,
)

_Q = Decimal("0.000000000001")


def cost_units(num: int, den: int) -> int:
    p = num / den
    return int(Decimal(-math.log(p)).quantize(_Q, ROUND_HALF_UP) * 10**12)


def viterbi(w: str, vocab: dict) -> str:
    best = {0: "0" * 18 + "|"}
    for t in range(1, len(w) + 1):
        cands = []
        for k in range(1, UG_MAX_PLEN + 1):
            prev = t - k
            if prev < 0 or prev not in best:
                continue
            piece = w[prev:t]
            if piece not in vocab:
                continue
            s = best[prev]
            cost = int(s[:18]) + vocab[piece]
            path = s[19:]
            cands.append(
                str(cost).zfill(18)
                + "|"
                + (path + " " + piece if path else piece)
            )
        best[t] = min(cands)
    return best[len(w)][19:]


def ug_reference(texts: list[str]):
    words: list[str] = []
    for text in texts:
        words.extend(
            w for w in re.split(r"\s+", text.strip().lower()) if w
        )
    types = Counter(w for w in words if 1 <= len(w) <= UG_MAX_WLEN)
    if not types:
        return []
    seed: Counter = Counter()
    for w, f in types.items():
        for ps in range(len(w)):
            for pl in range(1, UG_MAX_PLEN + 1):
                if ps + pl <= len(w):
                    seed[w[ps : ps + pl]] += f
    total = sum(seed.values())
    vocab = {p: cost_units(c, total) for p, c in seed.items()}
    chars = {p for p in seed if len(p) == 1}
    cc: dict = {}
    for _ in range(UG_EM_ITERS):
        cnt: Counter = Counter()
        for w, f in types.items():
            for piece in viterbi(w, vocab).split(" "):
                cnt[piece] += f
        multi = sorted(
            (p for p in cnt if len(p) > 1), key=lambda p: (-cnt[p], p)
        )[:UG_KEEP]
        kept = set(multi) | chars
        cc = {p: cnt.get(p, 0) for p in kept}
        tot, nv = sum(cc.values()), len(cc)
        vocab = {p: cost_units(c + 1, tot + nv) for p, c in cc.items()}
    out = sorted(cc.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(p, c, vocab[p], i + 1) for i, (p, c) in enumerate(out)]


def run_train(texts: list[str]):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR,"
        " lang VARCHAR, source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, 'en', 'src0', ?)",
        [(i, t, len(t)) for i, t in enumerate(texts)],
    )
    sql = _ug_assemble(_ug_steps("duck", "documents"), _UG_TRAIN_FINAL)
    out = con.execute(sql).fetchall()
    con.close()
    return out


_word = st.text(alphabet="abc", min_size=1, max_size=UG_MAX_WLEN)
_text = st.lists(_word, min_size=1, max_size=8).map(" ".join)


@settings(max_examples=25, deadline=None)
@given(texts=st.lists(_text, min_size=1, max_size=10))
def test_unigram_train_matches_reference(texts):
    expect = ug_reference(texts)
    got = run_train(texts)
    assert len(got) == len(expect)
    for (gp, gc, gu, gr), (ep, ec, eu, er) in zip(got, expect):
        assert (gp, gc, gr) == (ep, ec, er)
        assert abs(gu - eu) <= 1, (gp, gu, eu)
