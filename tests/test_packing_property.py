"""Property test for ``text_packing_boundary_report``'s oracle text.

The Spark side rides ``_range_prefix`` while the oracle uses a plain
window, so the dual-engine gate DOES catch divergence between them —
but both share the same window-span floor arithmetic, which this
suite pins against a direct Python packer that actually walks the
concatenated token stream and counts boundary crossings.
"""

from __future__ import annotations

import re

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from football_etl_pipeline_spark.operators.registry import ORACLES
from football_etl_pipeline_spark.operators.textops import PACK_CTX


def packing_reference(rows):
    """rows = [(doc_id, text, source)] — walk the doc_id-ordered token
    stream and literally pack it into PACK_CTX windows."""
    per_source: dict = {}
    pos = 0
    for doc_id, text, source in sorted(rows):
        # mirror the SQL exactly: n_tok = len(regexp_split(trim(text)))
        # — a whitespace-only text still yields one (empty) element,
        # same as both engines' split semantics
        n_tok = len(re.split(r"[\s\v]+", text.strip(" ").lower()))
        st_ = per_source.setdefault(
            source, {"n_docs": 0, "n_tokens": 0, "n_crossing": 0, "extra": 0}
        )
        if n_tok > 0:
            w_first = pos // PACK_CTX
            w_last = (pos + n_tok - 1) // PACK_CTX
            st_["n_docs"] += 1
            st_["n_tokens"] += n_tok
            st_["n_crossing"] += 1 if w_last > w_first else 0
            st_["extra"] += w_last - w_first
        pos += n_tok
    return per_source


def run_packing(rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR,"
        " lang VARCHAR, source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, 'en', ?, ?)",
        [(d, t, s, len(t)) for d, t, s in rows],
    )
    out = con.execute(ORACLES["text_packing_boundary_report"]).fetchall()
    con.close()
    return out


_word = st.text(alphabet="ab", min_size=1, max_size=6)
_text = st.lists(_word, min_size=1, max_size=700).map(" ".join)


@settings(max_examples=20, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            _text,
            st.sampled_from(["s0", "s1", "s2"]),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
def test_packing_oracle_matches_literal_packer(rows):
    expect = packing_reference(rows)
    got = run_packing(rows)
    assert {r[0] for r in got} == set(expect)
    for source, n_docs, n_tokens, n_crossing, n_extra, share in got:
        e = expect[source]
        assert n_docs == e["n_docs"]
        assert n_tokens == e["n_tokens"]
        assert n_crossing == e["n_crossing"]
        assert n_extra == e["extra"]
        assert abs(float(share) - e["n_crossing"] / e["n_docs"]) < 1e-6
