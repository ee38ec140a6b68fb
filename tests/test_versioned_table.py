"""Versioned-table format: snapshot isolation, time travel, optimistic
concurrency, crash-orphan vacuum — each guarantee pinned by a test
that breaks if the commit protocol regresses."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from football_etl_pipeline_spark.sources.versioned_table import (
    VersionConflict,
    commit_version,
    read_version,
    snapshot_diff,
    vacuum,
    versions,
)


def _df(spark, ids):
    return spark.createDataFrame([(i, f"row{i}") for i in ids], "id long, v string")


def test_append_and_overwrite_versions_time_travel(spark, tmp_path):
    root = str(tmp_path / "t")
    v1 = commit_version(_df(spark, [1, 2]), root, "append")
    v2 = commit_version(_df(spark, [3]), root, "append")
    v3 = commit_version(_df(spark, [9]), root, "overwrite")
    assert (v1, v2, v3) == (1, 2, 3)
    assert versions(root) == [1, 2, 3]
    # time travel: every committed version stays readable as it was
    assert {r.id for r in read_version(spark, root, 1).collect()} == {1, 2}
    assert {r.id for r in read_version(spark, root, 2).collect()} == {1, 2, 3}
    assert {r.id for r in read_version(spark, root).collect()} == {9}


def test_optimistic_concurrency_conflict(spark, tmp_path):
    root = str(tmp_path / "t")
    commit_version(_df(spark, [1]), root, "append")
    # writer A and writer B both read version 1; A commits first
    commit_version(_df(spark, [2]), root, "append", expected_base=1)
    with pytest.raises(VersionConflict):
        commit_version(_df(spark, [3]), root, "append", expected_base=1)
    # B retries from the new base and succeeds
    v = commit_version(_df(spark, [3]), root, "append", expected_base=2)
    assert v == 3
    assert {r.id for r in read_version(spark, root).collect()} == {1, 2, 3}


def test_staged_files_invisible_until_manifest(spark, tmp_path):
    """A crashed commit (data staged, manifest never created) must not
    change what readers see, and vacuum must reap the orphans."""
    root = str(tmp_path / "t")
    commit_version(_df(spark, [1]), root, "append")
    # simulate the crash: stage data exactly like commit_version does,
    # then "die" before the manifest create
    orphan_dir = os.path.join(root, "data", "deadbeefcafe")
    _df(spark, [99]).write.parquet(orphan_dir)
    assert {r.id for r in read_version(spark, root).collect()} == {1}
    deleted = vacuum(root, keep=1)
    assert any("deadbeefcafe" in d for d in deleted)
    assert {r.id for r in read_version(spark, root).collect()} == {1}


def test_vacuum_keeps_time_travel_window(spark, tmp_path):
    root = str(tmp_path / "t")
    commit_version(_df(spark, [1]), root, "append")
    commit_version(_df(spark, [2]), root, "append")
    commit_version(_df(spark, [7]), root, "overwrite")
    vacuum(root, keep=2)
    assert versions(root) == [2, 3]
    # kept versions still read exactly as committed
    assert {r.id for r in read_version(spark, root, 2).collect()} == {1, 2}
    assert {r.id for r in read_version(spark, root, 3).collect()} == {7}
    with pytest.raises(FileNotFoundError):
        read_version(spark, root, 1)
    # the overwrite-displaced files of v1/v2 are gone from disk only
    # if no kept manifest references them (v2 still carries v1's file)
    assert {r.id for r in read_version(spark, root).collect()} == {7}


def test_snapshot_diff_between_versions(spark, tmp_path):
    root = str(tmp_path / "t")
    commit_version(_df(spark, [1, 2, 3]), root, "append")
    commit_version(_df(spark, [2, 3, 4]), root, "overwrite")
    d = {
        (r.change, r.id)
        for r in snapshot_diff(spark, root, 1, 2, "id").collect()
    }
    assert d == {("delete", 1), ("insert", 4)}


def test_append_reuses_prior_files_no_rewrite(spark, tmp_path):
    """Append commits must carry the previous manifest's files by
    reference — rewriting history on append is the anti-pattern the
    format exists to avoid (the reference's WRITE_TRUNCATE)."""
    import json

    root = str(tmp_path / "t")
    commit_version(_df(spark, [1]), root, "append")
    commit_version(_df(spark, [2]), root, "append")
    m1 = json.load(open(os.path.join(root, "_manifests", "v000001.json")))
    m2 = json.load(open(os.path.join(root, "_manifests", "v000002.json")))
    assert set(m1["files"]) < set(m2["files"])
    for f in m1["files"]:
        assert os.path.exists(os.path.join(root, f))


def test_delete_where_skips_disjoint_files(spark, tmp_path):
    """Copy-on-write delete: footer stats must bound the rewrite set —
    a file whose [min, max] can't contain the predicate is carried BY
    REFERENCE (same path), never rewritten; rows in the touched range
    disappear; the pre-delete version stays time-travel-readable."""
    from football_etl_pipeline_spark.sources.versioned_table import (
        delete_where,
    )

    root = str(tmp_path / "t")
    # two separate commits -> two disjoint key-range file sets
    commit_version(_df(spark, [1, 2, 3]).coalesce(1), root, "append")
    commit_version(_df(spark, [100, 101]).coalesce(1), root, "append")
    v, moved = delete_where(spark, root, "id", 100, 100)
    assert v == 3
    # the low-range file is untouched; the high-range file is rewritten
    assert len(moved["carried"]) == 1
    assert len(moved["rewritten"]) == 1
    import json as _json
    import os as _os

    m2 = _json.load(
        open(_os.path.join(root, "_manifests", "v000002.json"))
    )
    assert moved["carried"][0] in m2["files"]  # carried = same path
    assert {r.id for r in read_version(spark, root).collect()} == {
        1, 2, 3, 101,
    }
    # time travel to the pre-delete version still shows the row
    assert 100 in {r.id for r in read_version(spark, root, 2).collect()}


def test_delete_where_stats_survive_for_next_delete(spark, tmp_path):
    """Stats carry through delete commits so a SECOND delete can still
    skip disjoint files (stats lost = everything rewritten forever)."""
    from football_etl_pipeline_spark.sources.versioned_table import (
        delete_where,
    )

    root = str(tmp_path / "t")
    commit_version(_df(spark, [1, 2]).coalesce(1), root, "append")
    commit_version(_df(spark, [50, 51]).coalesce(1), root, "append")
    commit_version(_df(spark, [900]).coalesce(1), root, "append")
    delete_where(spark, root, "id", 50, 50)
    _, moved = delete_where(spark, root, "id", 900, 999)
    # files for [1,2] and the rewritten [51] survivor are both skipped
    assert len(moved["rewritten"]) == 1
    assert {r.id for r in read_version(spark, root).collect()} == {1, 2, 51}


def test_read_version_prune_skips_files_at_listing(spark, tmp_path):
    """Manifest-stat scan pruning: a pruned read must not even LIST
    files whose footer range can't match — checked via inputFiles() —
    and must still return exactly the matching rows."""
    root = str(tmp_path / "t")
    commit_version(_df(spark, [1, 2, 3]).coalesce(1), root, "append")
    commit_version(_df(spark, [100, 101]).coalesce(1), root, "append")
    df = read_version(spark, root, prune=("id", 100, 200))
    assert {r.id for r in df.collect()} == {100, 101}
    assert len(df.inputFiles()) == 1  # the low-range file never opened
    # empty prune range -> empty frame with the committed schema
    empty = read_version(spark, root, prune=("id", 5000, 6000))
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["id", "v"]


def test_empty_overwrite_commit_reads_back_empty(spark, tmp_path):
    """Overwriting with an empty frame (e.g. a delete-everything
    compaction) must commit cleanly and read back as an empty frame
    with the committed schema — not crash on a zero-file manifest."""
    root = str(tmp_path / "t")
    commit_version(_df(spark, [1, 2]), root, "append")
    empty = _df(spark, []).filter("1=0")
    commit_version(empty, root, "overwrite")
    got = read_version(spark, root)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["id", "v"]
    # the earlier version still time-travels
    assert {r.id for r in read_version(spark, root, 1).collect()} == {1, 2}


def test_string_stats_skipped_unless_exact(spark, tmp_path):
    """Parquet writers may truncate long-string min/max footer stats;
    unless pyarrow reports the exactness flags as true, the column
    must get NO recorded stats (conservative: no stats = always
    scan/rewrite) so delete_where can never carry a file whose
    truncated max hides matching rows."""
    import json as _json
    import os as _os

    import pyarrow.parquet as _pq

    from football_etl_pipeline_spark.sources.versioned_table import (
        delete_where,
    )

    root = str(tmp_path / "t")
    long_lo, long_hi = "a" * 200, "z" * 200
    df = spark.createDataFrame(
        [(1, long_lo), (2, long_hi)], "id long, s string"
    ).coalesce(1)
    commit_version(df, root, "append")
    m = _json.load(open(_os.path.join(root, "_manifests", "v000001.json")))
    rel = m["files"][0]
    st = (
        _pq.ParquetFile(_os.path.join(root, rel))
        .metadata.row_group(0)
        .column(1)
        .statistics
    )
    exact = getattr(st, "is_min_value_exact", False) and getattr(
        st, "is_max_value_exact", False
    )
    mm = m["stats"][rel]["minmax"]
    if exact:
        assert mm.get("s") == [long_lo, long_hi]
    else:
        assert "s" not in mm  # possibly-truncated stats not recorded
    # numeric stats are unaffected either way
    assert mm["id"] == [1, 2]
    # and a string-keyed delete stays CORRECT: no stats -> file is
    # scanned/rewritten, never carried past matching rows
    _, moved = delete_where(spark, root, "s", "a", "b")
    assert {r.id for r in read_version(spark, root).collect()} == {2}
    if not exact:
        assert moved["carried"] == []


def test_meta_watermark_survives_vacuum(spark, tmp_path):
    """Non-batch commits (append/overwrite/delete) filling the whole
    vacuum keep-window must NOT lose the max batch_id: every manifest
    carries the running watermark forward, so a checkpoint-rebuild
    replay after vacuum still skips old batches."""
    from football_etl_pipeline_spark.sources.versioned_table import (
        delete_where,
        last_committed_meta,
    )

    root = str(tmp_path / "t")
    commit_version(_df(spark, [1]), root, "append", meta={"batch_id": 0})
    commit_version(_df(spark, [2]), root, "append", meta={"batch_id": 7})
    # three non-batch commits fill a keep=3 window past both batches
    commit_version(_df(spark, [3]), root, "append")
    delete_where(spark, root, "id", 3, 3)
    commit_version(_df(spark, [4]), root, "append")
    vacuum(root, keep=3)
    assert 1 not in versions(root) and 2 not in versions(root)
    assert last_committed_meta(root, "batch_id") == 7


def test_forget_customers_clustering_bounds_rewrite(spark, tmp_path):
    """The versioned_forget_customers operator's range-clustered
    layout must make the erasure stats-prunable ON REAL DATA: with
    orders range-partitioned on o_custkey, deleting the [100, 199]
    cohort carries most files by reference and the erased keys are
    gone while every bystander survives (same steps as the operator,
    scratch rooted in tmp_path)."""
    from football_etl_pipeline_spark.operators.maintenance import (
        _FORGET_HI,
        _FORGET_LO,
    )
    from football_etl_pipeline_spark.sources.testdata import load_table
    from football_etl_pipeline_spark.sources.versioned_table import (
        delete_where,
    )

    orders = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_custkey"
    )
    root = str(tmp_path / "forget")
    commit_version(
        orders.repartitionByRange(8, "o_custkey"), root, "append"
    )
    _, moved = delete_where(
        spark, root, "o_custkey", _FORGET_LO, _FORGET_HI
    )
    assert len(moved["carried"]) >= len(moved["rewritten"])
    latest = read_version(spark, root)
    assert (
        latest.filter(
            F.col("o_custkey").between(_FORGET_LO, _FORGET_HI)
        ).count()
        == 0
    )
    expected = orders.filter(
        ~F.col("o_custkey").between(_FORGET_LO, _FORGET_HI)
    ).count()
    assert latest.count() == expected
    # pre-delete version stays readable for the audit trail
    assert (
        read_version(spark, root, 1)
        .filter(F.col("o_custkey").between(_FORGET_LO, _FORGET_HI))
        .count()
        > 0
    )


def test_schema_evolution_add_column_null_fills(spark, tmp_path):
    """Add-column append: the committed schema widens (metadata-only —
    v1's files carried by reference), the current read NULL-fills the
    evolved column for pre-evolution files, and time travel to v1
    still sees the narrow schema."""
    root = str(tmp_path / "t")
    commit_version(_df(spark, [1, 2]), root, "append")
    wide = spark.createDataFrame(
        [(3, "row3", "web")], "id long, v string, channel string"
    )
    commit_version(wide, root, "append")

    cur = read_version(spark, root)
    assert cur.columns == ["id", "v", "channel"]
    rows = {r.id: r.channel for r in cur.collect()}
    assert rows == {1: None, 2: None, 3: "web"}

    old = read_version(spark, root, 1)
    assert old.columns == ["id", "v"]
    assert {r.id for r in old.collect()} == {1, 2}


def test_schema_evolution_missing_column_null_fills(spark, tmp_path):
    """Reverse evolution: an append MISSING a committed column keeps
    the committed schema (prior order) and NULL-fills the new file's
    absent column — no silent column drop."""
    root = str(tmp_path / "t")
    commit_version(_df(spark, [1]), root, "append")
    narrow = spark.createDataFrame([(7,)], "id long")
    commit_version(narrow, root, "append")
    cur = read_version(spark, root)
    assert cur.columns == ["id", "v"]
    assert {(r.id, r.v) for r in cur.collect()} == {(1, "row1"), (7, None)}


def test_schema_evolution_type_conflict_refuses_before_staging(
    spark, tmp_path
):
    """Re-typing an existing column must raise SchemaConflict BEFORE
    any data file is staged (no new orphans), and the table stays
    readable at its prior state."""
    from football_etl_pipeline_spark.sources.versioned_table import (
        SchemaConflict,
    )

    root = str(tmp_path / "t")
    commit_version(_df(spark, [1]), root, "append")
    data_dir = os.path.join(root, "data")
    staged_before = set(os.listdir(data_dir))
    bad = spark.createDataFrame([("x", "y")], "id string, v string")
    with pytest.raises(SchemaConflict, match="'id'"):
        commit_version(bad, root, "append")
    assert set(os.listdir(data_dir)) == staged_before
    assert versions(root) == [1]
    assert {r.id for r in read_version(spark, root).collect()} == {1}


def test_schema_evolution_overwrite_resets_schema(spark, tmp_path):
    """Overwrite commits define the schema outright (no merge): a
    narrow overwrite after an evolution yields the narrow schema."""
    root = str(tmp_path / "t")
    commit_version(_df(spark, [1]), root, "append")
    wide = spark.createDataFrame(
        [(2, "row2", "app")], "id long, v string, channel string"
    )
    commit_version(wide, root, "append")
    commit_version(_df(spark, [5]), root, "overwrite")
    cur = read_version(spark, root)
    assert cur.columns == ["id", "v"]
    assert {r.id for r in cur.collect()} == {5}
