"""Regression pin for the ADVICE-r9 zero-weight finding: the
Efraimidis-Spirakis key in text_weighted_sample divides by the doc
weight (n_chars); a zero-char doc would make the key NULL in both
engines — and NULL sort order differs (Spark NULLS FIRST ascending,
DuckDB NULLS LAST), so the sample would silently diverge exactly on
the degenerate doc. The fix clamps the weight to GREATEST(n_chars, 1)
in the ONE shared key builder, so both dialects stay finite and
identical. Testdata's min n_chars is 47; this test supplies the
hostile row the gate never sees."""

from __future__ import annotations

import duckdb

from football_etl_pipeline_spark.operators.textops import _es_key


def _rows():
    # one empty doc, one short, one long — the empty one must get a
    # real key (weight clamped to 1), not NULL
    return [("d_empty", 0), ("d_short", 5), ("d_long", 5000)]


def test_es_key_is_non_null_and_engine_identical(spark):
    sdf = spark.createDataFrame(
        _rows(), "doc_id string, n_chars int"
    ).selectExpr(
        "doc_id", f"CAST({_es_key('spark')} AS DOUBLE) AS es_key"
    )
    got = {r.doc_id: r.es_key for r in sdf.collect()}
    assert all(v is not None for v in got.values()), got

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"('{d}', {n})" for d, n in _rows())
        + ") t(doc_id, n_chars)"
    )
    want = dict(
        con.execute(
            f"SELECT doc_id, CAST({_es_key('duck')} AS DOUBLE)"
            " FROM docs"
        ).fetchall()
    )
    con.close()
    assert got == want


def test_empty_doc_has_minimal_weight_not_null_rank(spark):
    """The clamp gives the empty doc weight 1 — the SMALLEST legal
    weight, so its key is the LARGEST of equal-hash draws and it is
    maximally unlikely to be sampled, which is the semantically right
    degeneration (a weighted sample should almost never pick a
    zero-mass doc, and must never crash or diverge on one)."""
    sdf = spark.createDataFrame(
        [("same_hash_seed", 0), ("same_hash_seed", 1000)],
        "doc_id string, n_chars int",
    ).selectExpr(
        "n_chars", f"CAST({_es_key('spark')} AS DOUBLE) AS es_key"
    )
    by_chars = {r.n_chars: r.es_key for r in sdf.collect()}
    # identical hash u, weight 1 vs 1000: key = -ln(u)/w, so the
    # zero-char (clamped-to-1) doc's key is 1000x larger
    assert by_chars[0] > by_chars[1000] > 0
