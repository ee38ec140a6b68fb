"""Streaming exactness against a DuckDB oracle on REAL data.

The synthetic-row tests in test_streaming.py pin the mechanics
(watermarks, state, micro-batch boundaries); these tests give the
stateful accumulator and the stream-stream join the same exactness
story the batch queries have: the sf0.001 ``events`` table is
exported once to JSON, streamed through the operator with
``availableNow``, and compared against DuckDB SQL over the *same*
JSON file (both engines see byte-identical input, so ID sets and
counts must match exactly).

The export is a single file on purpose: one file → one micro-batch →
no intermediate watermark advancement, so join state can't be evicted
mid-stream and the full match set must be emitted (inner stream-stream
joins emit on match; only outer joins hold results for the watermark).
"""

from __future__ import annotations

import glob

import pytest

from football_etl_pipeline_spark.streaming.events_stream import (
    deduped_stream,
    read_events_stream,
    sessionized,
    sliding_counts,
    start_to_memory,
    stateful_user_totals,
    view_to_purchase_join,
    windowed_counts,
)


@pytest.fixture(scope="module")
def events_json(spark, sf_dir, tmp_path_factory):
    """sf0.001 events exported to ONE json file (micro-second ts)."""
    from football_etl_pipeline_spark.sources.testdata import load_table

    out = str(tmp_path_factory.mktemp("ev_json"))
    (
        load_table(spark, sf_dir, "events")
        .coalesce(1)
        .write.mode("overwrite")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .json(out)
    )
    (part,) = glob.glob(out + "/part-*.json")
    return out, part


def test_stateful_totals_match_duckdb_oracle(spark, events_json, tmp_path):
    """applyInPandasWithState lifetime totals over the real corpus ==
    DuckDB GROUP BY on the same JSON: counts exact, double totals to
    float tolerance (accumulation order differs by construction)."""
    import duckdb

    src, part = events_json
    q = start_to_memory(
        stateful_user_totals(read_events_stream(spark, src)),
        "oracle_state",
        str(tmp_path / "ck1"),
        "update",
    )
    q.awaitTermination(300)
    latest: dict[int, tuple[int, float]] = {}
    for r in spark.sql("SELECT * FROM oracle_state").collect():
        cur = latest.get(r.user_id)
        if cur is None or r.n_events > cur[0]:
            latest[r.user_id] = (r.n_events, r.total_value)

    want = {
        int(u): (int(n), float(t))
        for u, n, t in duckdb.sql(
            f"SELECT user_id, COUNT(*), SUM(value) FROM read_json_auto('{part}') "
            "GROUP BY user_id"
        ).fetchall()
    }
    assert set(latest) == set(want)
    for u, (n, t) in want.items():
        assert latest[u][0] == n, f"user {u} count"
        assert latest[u][1] == pytest.approx(t, rel=1e-9), f"user {u} total"


def test_stream_stream_join_matches_duckdb_oracle(spark, events_json, tmp_path):
    """Attribution join streamed over the real corpus == DuckDB's
    interval join on the same JSON — exact (purchase_id, view_id) set."""
    import duckdb

    src, part = events_json
    q = start_to_memory(
        view_to_purchase_join(read_events_stream(spark, src)),
        "oracle_ssjoin",
        str(tmp_path / "ck2"),
        "append",
    )
    q.awaitTermination(300)
    got = sorted(
        (r.purchase_id, r.view_id)
        for r in spark.sql("SELECT * FROM oracle_ssjoin").collect()
    )
    want = sorted(
        (int(p), int(v))
        for p, v in duckdb.sql(
            f"""
            WITH ev AS (
              SELECT event_id, user_id, event_type, ts::TIMESTAMP AS ts
              FROM read_json_auto('{part}')
            )
            SELECT p.event_id, v.event_id
            FROM ev v JOIN ev p
              ON v.user_id = p.user_id
             AND v.event_type = 'view' AND p.event_type = 'purchase'
             AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 30 MINUTE
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_windowed_counts_match_duckdb_oracle(spark, events_json, tmp_path):
    """Tumbling watermarked aggregation streamed over the real corpus
    == DuckDB time_bucket aggregation on the same JSON, restricted to
    windows the final watermark closed (append-mode contract). The
    decimal-sum pattern makes total_value exact, not approximate."""
    import duckdb

    src, part = events_json
    q = start_to_memory(
        windowed_counts(read_events_stream(spark, src)),
        "oracle_wc",
        str(tmp_path / "ck3"),
        "append",
    )
    q.awaitTermination(300)
    got = {
        (r.window_start.isoformat(), r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM oracle_wc").collect()
    }
    want = {
        (ws.isoformat(), et): (int(n), float(tv))
        for ws, et, n, tv in duckdb.sql(
            f"""
            WITH ev AS (
              SELECT ts::TIMESTAMP AS ts, event_type, value
              FROM read_json_auto('{part}')
            )
            SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws,
                   event_type,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS tv
            FROM ev
            GROUP BY 1, 2
            HAVING ws + INTERVAL '5 minutes'
                     <= (SELECT MAX(ts) FROM ev) - INTERVAL '10 minutes'
            """
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_sliding_counts_match_duckdb_oracle(spark, events_json, tmp_path):
    """Sliding (10-min span / 5-min slide) watermarked aggregation ==
    DuckDB over the same JSON with each event expanded into its TWO
    containing windows (starts at bucket and bucket − 5 min), again
    restricted to windows the final watermark closed."""
    import duckdb

    src, part = events_json
    q = start_to_memory(
        sliding_counts(read_events_stream(spark, src)),
        "oracle_slide",
        str(tmp_path / "ck4"),
        "append",
    )
    q.awaitTermination(300)
    got = {
        (r.window_start.isoformat(), r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM oracle_slide").collect()
    }
    want = {
        (ws.isoformat(), et): int(n)
        for ws, et, n in duckdb.sql(
            f"""
            WITH ev AS (
              SELECT ts::TIMESTAMP AS ts, event_type
              FROM read_json_auto('{part}')
            ), x AS (
              SELECT time_bucket(INTERVAL '5 minutes', ts) AS b, event_type
              FROM ev
            ), w AS (
              SELECT b AS ws, event_type FROM x
              UNION ALL
              SELECT b - INTERVAL '5 minutes' AS ws, event_type FROM x
            )
            SELECT ws, event_type, COUNT(*) AS n
            FROM w
            GROUP BY 1, 2
            HAVING ws + INTERVAL '10 minutes'
                     <= (SELECT MAX(ts) FROM ev) - INTERVAL '10 minutes'
            """
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_sessionized_matches_duckdb_oracle(spark, events_json, tmp_path):
    """Built-in session_window (30-min gap) streamed over the real
    corpus == DuckDB lag-gap sessionization on the same JSON.
    Spark's session interval is [first, last + gap) with end-EXCLUSIVE
    merging, so the oracle starts a new session when the gap is
    >= 30 min (not >); emitted sessions are those whose end the final
    watermark passed."""
    import duckdb

    src, part = events_json
    q = start_to_memory(
        sessionized(read_events_stream(spark, src)),
        "oracle_sess",
        str(tmp_path / "ck5"),
        "append",
    )
    q.awaitTermination(300)
    got = sorted(
        (
            r.user_id,
            r.session_start.isoformat(),
            r.session_end.isoformat(),
            r.n_events,
            r.first_ts.isoformat(),
            r.last_ts.isoformat(),
        )
        for r in spark.sql("SELECT * FROM oracle_sess").collect()
    )
    want = sorted(
        (int(u), ss.isoformat(), se.isoformat(), int(n), f.isoformat(), l.isoformat())
        for u, ss, se, n, f, l in duckdb.sql(
            f"""
            WITH ev AS (
              SELECT user_id, ts::TIMESTAMP AS ts FROM read_json_auto('{part}')
            ), seq AS (
              SELECT user_id, ts,
                     CASE WHEN LAG(ts) OVER w IS NULL
                            OR ts >= LAG(ts) OVER w + INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM ev
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), sess AS (
              SELECT user_id, ts,
                     SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
              FROM seq
            )
            SELECT user_id,
                   MIN(ts) AS session_start,
                   MAX(ts) + INTERVAL 30 MINUTE AS session_end,
                   COUNT(*) AS n_events,
                   MIN(ts) AS first_ts,
                   MAX(ts) AS last_ts
            FROM sess
            GROUP BY user_id, sid
            HAVING MAX(ts) + INTERVAL 30 MINUTE
                     <= (SELECT MAX(ts) FROM ev) - INTERVAL 10 MINUTE
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_deduped_stream_matches_duckdb_oracle(spark, events_json, tmp_path):
    """At-least-once redelivery on real data: the corpus JSON is
    delivered TWICE (two copies in the landing dir, both inside one
    micro-batch), and dropDuplicatesWithinWatermark must emit exactly
    DuckDB's DISTINCT event_id set over the doubled input — every
    event once, no redelivered copy surviving."""
    import shutil

    import duckdb

    src, part = events_json
    dup_dir = tmp_path / "dup_src"
    dup_dir.mkdir()
    shutil.copy(part, dup_dir / "a.json")
    shutil.copy(part, dup_dir / "b.json")
    q = start_to_memory(
        deduped_stream(read_events_stream(spark, str(dup_dir))),
        "oracle_dedup",
        str(tmp_path / "ck6"),
        "append",
    )
    q.awaitTermination(300)
    got = sorted(
        r.event_id for r in spark.sql("SELECT event_id FROM oracle_dedup").collect()
    )
    n_in, n_distinct = duckdb.sql(
        f"SELECT COUNT(*), COUNT(DISTINCT event_id) "
        f"FROM read_json_auto(['{dup_dir}/a.json', '{dup_dir}/b.json'])"
    ).fetchone()
    want = sorted(
        int(e)
        for (e,) in duckdb.sql(
            f"SELECT DISTINCT event_id "
            f"FROM read_json_auto(['{dup_dir}/a.json', '{dup_dir}/b.json'])"
        ).fetchall()
    )
    assert int(n_in) == 2 * int(n_distinct)  # the redelivery really happened
    assert got == want and len(got) > 0


def test_stream_static_enrichment_matches_duckdb_oracle(
    spark, events_json, tmp_path, sf_dir
):
    """Stream-static LEFT join (events stream ⋈ customer dimension)
    feeding the watermarked window aggregate == DuckDB's batch join +
    time_bucket over the same JSON and the same customer parquet,
    restricted to watermark-closed windows (append-mode contract).
    Exactness story matches the other oracle tests: counts exact,
    totals decimal-summed."""
    import duckdb

    from football_etl_pipeline_spark.sources.testdata import load_table
    from football_etl_pipeline_spark.streaming.events_stream import (
        enriched_segment_counts,
    )

    src, part = events_json
    customer = load_table(spark, sf_dir, "customer")
    q = start_to_memory(
        enriched_segment_counts(read_events_stream(spark, src), customer),
        "oracle_enrich",
        str(tmp_path / "ck_enrich"),
        "append",
    )
    q.awaitTermination(300)
    got = {
        (r.window_start.isoformat(), r.segment): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM oracle_enrich").collect()
    }
    want = {
        (ws.isoformat(), seg): (int(n), float(tv))
        for ws, seg, n, tv in duckdb.sql(
            f"""
            WITH ev AS (
              SELECT ts::TIMESTAMP AS ts, user_id, value
              FROM read_json_auto('{part}')
            )
            SELECT time_bucket(INTERVAL '5 minutes', ev.ts) AS ws,
                   COALESCE(c.c_mktsegment, 'unknown') AS segment,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(ev.value AS DECIMAL(18,6))) AS DOUBLE) AS tv
            FROM ev
            LEFT JOIN '{sf_dir}/customer.parquet' c
              ON c.c_custkey = ev.user_id
            GROUP BY 1, 2
            HAVING ws + INTERVAL '5 minutes'
                     <= (SELECT MAX(ts) FROM ev) - INTERVAL '10 minutes'
            """
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_streaming_sprt_equals_batch_sprt(spark):
    """The streaming SPRT face must reproduce the batch op ROW FOR ROW
    at sf0.001 — same arm hash, same day-0 conversion, same cumulative
    LLR and decisions. The faces share the decision-layer SQL text by
    construction; this pins that the per-user MIN/MIN state the STREAM
    maintains equals the batch aggregate (the part the shared text
    cannot guarantee)."""
    from football_etl_pipeline_spark.operators.stattests import (
        events_ab_sequential_sprt,
    )
    from football_etl_pipeline_spark.operators.streaming_query import (
        streaming_sprt_monitor,
    )

    sf = "/root/testdata/sf0.001"
    batch = [tuple(r) for r in events_ab_sequential_sprt(spark, sf).collect()]
    stream = [tuple(r) for r in streaming_sprt_monitor(spark, sf).collect()]
    assert stream == batch
    assert len(batch) > 0
