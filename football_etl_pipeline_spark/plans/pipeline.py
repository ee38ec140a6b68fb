"""The composed reference-parity pipeline (E2 equivalent):

    read raw JSON → derive group key from path → normalize+join per
    API → enforce schema → split good/dead-letter → write.

Reference DAG: Create → Map(extractPk) → GroupByKey →
ProcessFilesDoFn.with_outputs → [BigQuery | dead-letter text]
(/root/reference/dataflow-flex/football_pipeline/pipeline.py:34-63).

Spark plan: NO GroupByKey shuffle at all — the group key is derived
per-row from the file path, the joins are broadcast (teams side is
~20 rows/group), and failure routing is two filters over one cached
DataFrame. The only wide operation is the group-error aggregation,
over group keys (hundreds, not rows). At 100 TB of landing files this
is a pure scan→broadcast-join→project job that scales linearly with
input bytes.

Group-level failure parity (transforms.py:180-184): ONE bad record
(or one corrupt file, or one failed guard) dead-letters its whole
season-league group: {"PK": group, "files": [...], "error": msg} —
while other groups in the same run land normally.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import raw_football as raw
from .enforce import ERROR_COL, enforce_schema
from .transforms import TRANSFORM_MAP
from .unified_schema import UNIFIED_SCHEMA_V1, ParsedSchema, parse_schema

RAW_SCHEMAS = {
    "apifootball": (raw.APIFOOTBALL_TEAM, raw.APIFOOTBALL_STANDING),
    "apisports": (raw.APISPORTS_TEAMS, raw.APISPORTS_STANDINGS),
}


@dataclass
class TransformResult:
    good: DataFrame         # unified schema columns, ready to load
    dead_letter: DataFrame  # {"PK", "files", "error"} — one row per failed group
    dropped: DataFrame      # probe-miss standings rows (logged skips, not failures)


def run_transform(
    spark: SparkSession,
    api_name: str,
    input_files: list[str],
    schema_data: dict | None = None,
) -> TransformResult:
    """E2 parity entry point. ``input_files`` is the literal file list
    the launcher passes (pipeline.py:14,37)."""
    if api_name not in TRANSFORM_MAP:
        raise ValueError(f"Unsupported API name: {api_name}")
    schema = parse_schema(schema_data or UNIFIED_SCHEMA_V1)
    team_schema, standing_schema = RAW_SCHEMAS[api_name]

    teams_paths, standings_paths, _other = raw.split_paths(input_files)
    teams = raw.read_endpoint(spark, teams_paths, team_schema) if teams_paths else None
    standings = (
        raw.read_endpoint(spark, standings_paths, standing_schema)
        if standings_paths
        else None
    )

    # Provenance: every file of a group, for the dead-letter record
    # (transforms.py:184 lists ALL paths of the failed group — even
    # zero-row files, so this is derived from the literal input list,
    # not from scanned rows). The regex is extractPk (helpers.py:20).
    import re

    def _pk_of(path: str) -> str:
        m = re.search(raw.PK_REGEX, path)
        return f"{m.group(1)}-{m.group(2)}" if m else "unknown"

    groups: dict[str, list[str]] = {}
    for p in input_files:
        groups.setdefault(_pk_of(p), []).append(p)
    files_by_group = spark.createDataFrame(
        [(pk, sorted(fs)) for pk, fs in groups.items()],
        "group_pk string, files array<string>",
    )

    # Corrupt-file parity (transforms.py:167-169): any unparseable file
    # fails its whole group with the path in the message.
    def _corrupt(df: DataFrame | None) -> DataFrame:
        if df is None:
            return spark.createDataFrame([], "group_pk string, error string")
        return (
            df.filter(F.col(raw.CORRUPT_COL).isNotNull())
            .select(
                "group_pk",
                F.concat(
                    F.lit("Dead letter file: "),
                    F.col("_path"),
                    F.lit(", error: malformed JSON"),
                ).alias("error"),
            )
        )

    corrupt_errors = _corrupt(teams).unionByName(_corrupt(standings))

    def _clean(df: DataFrame | None, base_schema) -> DataFrame:
        if df is None:
            from pyspark.sql import types as T

            # fresh StructType — StructType.add mutates in place
            empty_schema = T.StructType(
                list(base_schema.fields)
                + [
                    T.StructField("group_pk", T.StringType()),
                    T.StructField("_path", T.StringType()),
                ]
            )
            return spark.createDataFrame([], empty_schema)
        return df.filter(F.col(raw.CORRUPT_COL).isNull())

    teams_clean = _clean(teams, team_schema)
    standings_clean = _clean(standings, standing_schema)

    norm = TRANSFORM_MAP[api_name](teams_clean, standings_clean)
    enforced = enforce_schema(
        norm.records.withColumn("schema_version", F.lit(schema.version)),
        schema,
        keep=["group_pk"],
    )
    # Cache: the split below reads `enforced` twice (good + error agg) —
    # the Spark idiom for Beam's single-pass multi-output (SURVEY §4).
    enforced = enforced.cache()

    record_errors = (
        enforced.filter(F.col(ERROR_COL).isNotNull())
        .groupBy("group_pk")
        .agg(F.min(ERROR_COL).alias("error"))
    )
    # Precedence mirrors the reference's control flow (transforms.py:149-184):
    # a file-read failure raises before the guards, which raise before
    # per-record enforcement. min(struct(priority, error)) picks the
    # earliest-stage error deterministically.
    group_errors = (
        corrupt_errors.withColumn("_prio", F.lit(0))
        .unionByName(norm.group_errors.withColumn("_prio", F.lit(1)))
        .unionByName(record_errors.withColumn("_prio", F.lit(2)))
        .groupBy("group_pk")
        .agg(F.min(F.struct("_prio", "error")).alias("_e"))
        .select("group_pk", F.col("_e.error").alias("error"))
    )

    good = (
        enforced.join(F.broadcast(group_errors), "group_pk", "left_anti")
        .drop("group_pk", ERROR_COL)
    )
    dead_letter = (
        group_errors.join(files_by_group, "group_pk", "left")
        .select(
            F.col("group_pk").alias("PK"),  # uppercase verbatim (transforms.py:184)
            F.coalesce("files", F.array()).alias("files"),
            "error",
        )
    )
    return TransformResult(good=good, dead_letter=dead_letter, dropped=norm.dropped)


def write_unified(df: DataFrame, out_path: str) -> dict:
    """T13 parity: full overwrite per run (WRITE_TRUNCATE idempotency,
    pipeline.py:53). update_timestamp is stamped honestly at load time
    (the reference declared a CURRENT_TIMESTAMP() default it never
    applied — SURVEY §1).

    Returns load metrics via Spark's Observation API: row count and
    null-pk count are accumulated DURING the write pass itself — no
    second action, no second scan (the reference has no load metrics
    at all; a ``df.count()`` before the write would double the job).
    """
    from pyspark.sql import Observation

    obs = Observation("write_unified")
    observed = df.withColumn(
        "update_timestamp", F.current_timestamp()
    ).observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("pk").isNull(), 1).otherwise(0)).alias(
            "n_null_pk"
        ),
    )
    observed.write.mode("overwrite").parquet(out_path)
    return obs.get


def write_dead_letter(df: DataFrame, out_path: str) -> None:
    """T14 parity: single JSON file per run (num_shards=1 ≡ coalesce(1),
    pipeline.py:58-63)."""
    df.coalesce(1).write.mode("append").json(out_path)


def output_table_name(api_name: str, prefix: str = "teams") -> str:
    """Launch-time table naming parity (ingestion/gcp_utils.py:87)."""
    return f"{prefix}_{api_name}"
