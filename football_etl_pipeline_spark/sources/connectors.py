"""Format connectors: schema'd reads with corrupt-record capture, and
writes with every mode the engine supports (append/overwrite/dynamic
partition overwrite, partitioning, bucketing, single-file).

Reference parity + generalization: the reference reads GCS JSON
(``/root/reference/dataflow-flex/.../transforms.py:160``), writes one
warehouse table with WRITE_TRUNCATE (``pipeline.py:49-55``) and a
single-shard dead-letter text file (``pipeline.py:58-63``). Here that
generalizes to json/csv/parquet in both directions.

Scale rules encoded here:
- ALWAYS pass an explicit schema for json/csv at scale — schema
  inference is a full extra pass over the data.
- PERMISSIVE + ``_corrupt_record`` turns parse failures into rows
  (dead-letterable, like everything else) instead of task failures.
- ``partitionBy`` on write → partition discovery + partition PRUNING
  on read: the reference's regex-over-path key extraction
  (``helpers.py:20-27``) becomes a pure metadata operation.
- dynamic partition overwrite replaces only the partitions present in
  the incoming frame — idempotent daily reruns without truncating the
  whole table (the scalable version of WRITE_TRUNCATE).
- ``coalesce(1)`` only for tiny side outputs (dead letters); never on
  the main path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType, StringType

CORRUPT_COL = "_corrupt_record"

READ_FORMATS = ("parquet", "orc", "json", "csv")


def read_with_dead_letter(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType,
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """Read json/csv with malformed rows CAPTURED, not fatal: returns
    (good, corrupt) where corrupt rows carry the raw text. Parquet and
    ORC are self-describing — corrupt capture doesn't apply (returns
    empty)."""
    if fmt in ("parquet", "orc"):
        df = spark.read.schema(schema).options(**options).format(fmt).load(path)
        return df, df.limit(0).selectExpr("cast(null as string) as " + CORRUPT_COL)
    full = StructType(schema.fields + [StructField(CORRUPT_COL, StringType())])
    reader = (
        spark.read.format(fmt)
        .schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .options(**options)
    )
    df = reader.load(path)
    # Spark requires caching (or re-read) before filtering on the
    # corrupt column alone — referencing only _corrupt_record on a
    # lazy parse raises ANALYSIS error; select real cols alongside.
    df = df.cache()
    good = df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(df[CORRUPT_COL].isNotNull())
    return good, corrupt


def write(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    single_file: bool = False,
    dynamic_overwrite: bool = False,
    **options: str,
) -> None:
    """One write surface for all formats/modes. ``dynamic_overwrite``
    replaces only the incoming partitions (requires partition_by) —
    set per-write via the writer option, not session-wide."""
    out = df.coalesce(1) if single_file else df
    writer = out.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
        if dynamic_overwrite:
            writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed managed table: co-locates rows by hash(bucket_cols) at
    WRITE time so later equi-joins/aggregations on those columns skip
    the shuffle entirely — the pre-partitioning strategy for a fact
    table joined repeatedly on the same key at 100 TB. With ``path``
    the table is EXTERNAL (files at the given location, catalog entry
    only in the session) — what scratch-lifetime callers use so the
    warehouse dir doesn't accumulate run artifacts."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


_EXT_MIME = {
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "gif": "image/gif",
    "wav": "audio/wav",
    "mp4": "video/mp4",
}


def read_media_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw media-file ingestion via Spark's ``binaryFile`` source —
    how a multimodal pipeline lands loose image/audio/video files
    into a lakehouse table (the file-system twin of
    ``operators.multimodal.media_table``): one row per file with
    ``path``/``modificationTime``/``length``/``content`` plus a
    mime column inferred from the extension.

    Scale notes: ``pathGlobFilter`` prunes at LISTING time (skipped
    files are never opened); a ``length`` predicate prunes before
    payload bytes load where the filter is pushed to the source
    (binaryFile advertises pushdown on path/length/modificationTime);
    ``recursiveFileLookup`` walks nested date/shard layouts without a
    partition-discovery pass. Payload bytes stay opaque — downstream
    metadata queries that drop ``content`` never deserialize them."""
    reader = (
        spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    from pyspark.sql import functions as F

    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    mime_map = F.create_map(
        *[F.lit(x) for kv in _EXT_MIME.items() for x in kv]
    )
    return df.withColumn(
        "mime", F.coalesce(mime_map[ext], F.lit("application/octet-stream"))
    )
