"""Property test for the range-exchange prefix-sum helper
(operators/stattests._range_prefix): on random frames — including
heavily duplicated weights, empty groups, and cardinalities both
below and above PREFIX_PARTS — its running totals must equal a plain
sorted cumulative sum (pandas oracle), grouped and ungrouped. Six
registered queries ride this helper; a broken offset here corrupts
all of them silently."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from football_etl_pipeline_spark.operators.registry import release_persists
from football_etl_pipeline_spark.operators.stattests import _range_prefix

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-1000, max_value=1000),  # sort key
        st.integers(min_value=0, max_value=50),        # weight
        st.sampled_from(["g1", "g2", "g3"]),           # group
    ),
    min_size=1,
    max_size=120,
)


def _dedupe_keys(rows, grouped):
    # the helper's contract: (group_cols +) order_cols is a unique key
    seen, out = set(), []
    for k, w, g in rows:
        key = (g, k) if grouped else k
        if key not in seen:
            seen.add(key)
            out.append((k, w, g))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(rows=rows_strategy)
def test_ungrouped_prefix_matches_pandas(spark, rows):
    rows = _dedupe_keys(rows, grouped=False)
    df = spark.createDataFrame(
        [(k, w) for k, w, _ in rows], "k long, w long"
    )
    got = (
        _range_prefix(df, ["k"], ["w"])
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    release_persists()
    exp = (
        pd.DataFrame(rows, columns=["k", "w", "g"])
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(got["cum_w"]) == list(exp["w"].cumsum())


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(rows=rows_strategy)
def test_grouped_prefix_matches_pandas(spark, rows):
    rows = _dedupe_keys(rows, grouped=True)
    df = spark.createDataFrame(rows, "k long, w long, g string")
    got = (
        _range_prefix(df, ["k"], ["w"], group_cols=["g"])
        .toPandas()
        .sort_values(["g", "k"])
        .reset_index(drop=True)
    )
    release_persists()
    exp = (
        pd.DataFrame(rows, columns=["k", "w", "g"])
        .sort_values(["g", "k"])
        .reset_index(drop=True)
    )
    exp["cum"] = exp.groupby("g")["w"].cumsum()
    assert list(got["cum_w"]) == list(exp["cum"])
