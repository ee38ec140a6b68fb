"""Testdata schema-drift canary + driver-window pin.

Round 4 lost 11/50 driver CORRECTNESS rows, the whole bench, and the
test suite to a silent regeneration of /root/testdata that changed
``events.ts`` from parquet TIMESTAMP(NANOS) to ``timestamp[us]``.
These tests make the NEXT drift fail one obvious fast test instead of
the driver run:

- the canary asserts the physical on-disk dtype of every column a
  loader special-cases, at every sf dir present;
- the loader test asserts the NORMALIZED Spark-side schema the rest of
  the engine is written against (``ts`` must surface as TimestampType
  whatever the file stores);
- the window pin freezes registration order of the first 50 queries to
  the exact key list the driver checked in CORRECTNESS_r04 — a
  refactor that reorders registration would silently rotate a green
  query out of the checked window.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

TESTDATA_ROOT = "/root/testdata"
SF_DIRS = [
    os.path.join(TESTDATA_ROOT, d)
    for d in ("sf0.001", "sf0.01", "sf0.1")
    if os.path.isdir(os.path.join(TESTDATA_ROOT, d))
]

# Physical parquet types the loaders special-case. If a regen changes
# one of these, _load_events (or its sibling) must be re-verified
# against the DuckDB oracle before anything else runs.
#
# events.ts: the loader accepts TIMESTAMP(NANOS)-as-long, timestamp[us]
# (NTZ), and timestamp[us, tz] — anything else is uncharted drift.
EVENTS_TS_ACCEPTED = {"timestamp[ns]", "timestamp[us]", "timestamp[us, tz=UTC]", "int64"}


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
def test_events_ts_physical_type_is_known(sf_dir):
    schema = pq.read_schema(os.path.join(sf_dir, "events.parquet"))
    actual = str(schema.field("ts").type)
    assert actual in EVENTS_TS_ACCEPTED, (
        f"events.ts drifted to {actual!r} in {sf_dir}; update _load_events "
        "(sources/testdata.py) and re-run tools/verify_oracle.py before trusting results"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
def test_all_tables_present(sf_dir):
    from football_etl_pipeline_spark.sources.testdata import TABLES

    missing = [
        t for t in TABLES if not os.path.exists(os.path.join(sf_dir, f"{t}.parquet"))
    ]
    assert not missing, f"testdata tables missing in {sf_dir}: {missing}"


def test_events_loader_normalizes_ts(spark, sf_dir):
    """Whatever the file stores, the engine-facing ``ts`` column must be
    session-tz TimestampType — every events operator was written
    against it."""
    from pyspark.sql import types as T

    from football_etl_pipeline_spark.sources.testdata import load_table

    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType), df.schema["ts"]
    # and it actually evaluates (a dtype-only check missed round 4's bug
    # shape: the failure was in an expression applied after the read)
    assert df.select("ts").limit(1).count() >= 0


# The exact 50-key window the driver verified in CORRECTNESS_r04, in
# order. Registration order of these queries is FROZEN; new queries
# must register after them. tools/verify_oracle.py remains the
# all-queries gate for everything past the window.
DRIVER_WINDOW_R04 = [
    "q1_pricing_summary", "scan_filter_project", "agg_stats_by_segment",
    "distinct_values", "orderby_limit_topk", "agg_exact_percentiles",
    "q6_forecast_revenue", "q14_promo_revenue_share", "q3_shipping_priority",
    "q5_local_supplier_volume", "join_left_nulls", "join_full_outer",
    "join_semi_active_customers", "join_anti_unshipped", "join_right_parts",
    "join_range_price_bands", "join_asof_last_purchase",
    "q19_disjunctive_predicates", "window_topk_per_group", "window_rank_family",
    "window_running_total", "window_lag_lead_delta", "window_moving_avg",
    "window_first_last_nth", "window_range_frame_30d", "setop_priority_overlap",
    "setop_except_all", "setop_union_distinct", "setop_union_all_counts",
    "rollup_revenue", "cube_order_matrix", "grouping_sets_custom",
    "pivot_events_by_type", "unpivot_part_metrics", "scalar_string_funcs",
    "scalar_date_funcs", "scalar_math_funcs", "scalar_conditional",
    "scalar_array_funcs", "scalar_json_funcs", "posexplode_name_words",
    "scalar_map_funcs", "scalar_regex_funcs", "events_by_hour",
    "events_sessionize", "events_windowed_funnel", "events_daily_retention",
    "events_approx_distinct", "events_multi_rollup", "events_anomaly_zscore",
]


def test_driver_window_is_pinned():
    from football_etl_pipeline_spark.operators.registry import QUERIES

    assert list(QUERIES)[:50] == DRIVER_WINDOW_R04, (
        "registration order of the first 50 queries changed — the driver's "
        "CORRECTNESS window checks exactly these keys; register new queries "
        "AFTER the frozen window"
    )


def test_every_query_has_entry_and_most_have_oracles():
    """queries() and oracle_sql() stay consistent with the registry."""
    import __spark_entry__ as entry

    from football_etl_pipeline_spark.operators.registry import QUERIES

    qs = entry.queries()
    oracles = entry.oracle_sql()
    # Exact match against the registry (not a stale floor): silent
    # deregistration of any post-window query must fail loudly here.
    assert set(qs) == set(QUERIES)
    assert len(qs) >= 161
    unknown = set(oracles) - set(qs)
    assert not unknown, f"oracle_sql keys missing from queries(): {unknown}"
