"""Property-based checks (hypothesis) on schema enforcement:
random records × random schemas → the enforced output is always
schema-exact, errors are always routed to the error column, and the
plan never crashes. One Spark job per example, so examples are few
but each carries a whole batch of rows."""

from __future__ import annotations

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from football_etl_pipeline_spark.plans.enforce import ERROR_COL, enforce_schema
from football_etl_pipeline_spark.plans.unified_schema import parse_schema

FIELD_NAMES = [f"f{i}" for i in range(6)]

schema_strategy = st.lists(
    st.tuples(
        st.sampled_from(FIELD_NAMES),
        st.sampled_from(["STRING", "INTEGER", "TIMESTAMP"]),
        st.sampled_from(["REQUIRED", "NULLABLE", None]),
    ),
    min_size=1,
    max_size=6,
    unique_by=lambda t: t[0],
)

value_strategy = st.one_of(
    st.none(),
    st.integers(min_value=-(2**40), max_value=2**40).map(str),
    st.text(alphabet=string.ascii_letters + " .-", max_size=12),
    st.just("2024-01-01T00:00:00"),
    st.just("12.5"),
    st.just(""),
)

records_strategy = st.lists(
    st.fixed_dictionaries({name: value_strategy for name in FIELD_NAMES}),
    min_size=1,
    max_size=20,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(fields=schema_strategy, records=records_strategy)
def test_enforcement_is_total_and_schema_exact(spark, fields, records):
    schema = parse_schema(
        {
            "version": "t",
            "fields": [
                {"name": n, "type": t, **({"mode": m} if m else {})}
                for n, t, m in fields
            ],
        }
    )
    df = spark.createDataFrame(
        [tuple(r[n] for n in FIELD_NAMES) for r in records],
        ", ".join(f"{n} string" for n in FIELD_NAMES),
    )
    out = enforce_schema(df, schema)
    rows = out.collect()  # never raises, regardless of input
    assert len(rows) == len(records)
    # exact projection: error column + schema fields, in order
    assert out.columns == [ERROR_COL, *schema.names]

    cast_ok = {"STRING": str, "INTEGER": int}
    for row, rec in zip(rows, records, strict=True):
        err = row[ERROR_COL]
        for f in schema.fields:
            v_in = rec[f.name]
            v_out = row[f.name]
            if err is not None:
                continue  # failed rows make no output-value promises
            if f.type == "INTEGER" and v_in not in (None, ""):
                assert v_out == int(v_in)
            if f.mode == "REQUIRED":
                assert v_out is not None
        # error routing: a REQUIRED field that was null MUST error
        for f in schema.fields:
            if f.mode == "REQUIRED" and rec[f.name] is None:
                assert err is not None
