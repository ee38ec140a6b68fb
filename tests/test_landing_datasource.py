"""Custom Python Data Source tests: the ``football_landing`` reader
must parse the landing layout into key columns, parallelize one
partition per (api, season, league) group, prune by the ``api``
option at discovery, and round-trip payload bytes exactly — including
malformed JSON (a CONNECTOR never judges content; dead-lettering is
the transform's job)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from football_etl_pipeline_spark.sources.landing_datasource import register
from tests.fixtures_football import (
    LEAGUE,
    SEASON,
    apifootball_standings,
    apifootball_teams,
    stage,
)


def _read(spark, root, **options):
    register(spark)
    r = spark.read.format("football_landing")
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(root)


def test_layout_parsed_and_payload_roundtrips(spark, tmp_path):
    root = str(tmp_path / "landing")
    p = stage(root, "apifootball", "teams", apifootball_teams())
    stage(root, "apifootball", "standings", apifootball_standings())

    df = _read(spark, root)
    rows = {r["endpoint"]: r for r in df.collect()}
    assert set(rows) == {"teams", "standings"}
    t = rows["teams"]
    assert (t["api"], t["season"], t["league"]) == ("apifootball", SEASON, LEAGUE)
    assert t["file_path"] == p
    assert json.loads(t["payload"]) == apifootball_teams()


def test_one_partition_per_group(spark, tmp_path):
    root = str(tmp_path / "landing")
    for league in (LEAGUE, LEAGUE + 1, LEAGUE + 2):
        stage(root, "apifootball", "teams", apifootball_teams(), league=league)
        stage(root, "apifootball", "standings", apifootball_standings(), league=league)
    df = _read(spark, root)
    # 3 groups -> 3 input partitions; 2 files each -> 6 rows
    assert df.count() == 6
    assert df.rdd.getNumPartitions() == 3
    per_group = (
        df.groupBy("league").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert {r["league"]: r["n"] for r in per_group} == {
        LEAGUE: 2, LEAGUE + 1: 2, LEAGUE + 2: 2
    }


def test_api_option_prunes_at_discovery(spark, tmp_path):
    root = str(tmp_path / "landing")
    stage(root, "apifootball", "teams", apifootball_teams())
    stage(root, "apisports", "teams", {"response": []})
    df = _read(spark, root, api="apisports")
    assert [r["api"] for r in df.collect()] == ["apisports"]


def test_malformed_payload_passes_through(spark, tmp_path):
    root = str(tmp_path / "landing")
    stage(root, "apifootball", "standings", "{not valid json")
    df = _read(spark, root)
    assert df.collect()[0]["payload"] == "{not valid json"


def test_missing_path_is_a_clean_error(spark):
    import pytest

    register(spark)
    with pytest.raises(Exception, match="requires a path"):
        # format without load path: reader construction must name the fix
        spark.read.format("football_landing").schema(
            "api string"
        ).load().collect()


def _drain_to_parquet(spark, root, ck, out):
    register(spark)
    q = (
        spark.readStream.format("football_landing")
        .load(root)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_streaming_datasource_incremental_exactly_once(spark, tmp_path):
    """readStream on the custom source: first drain delivers the
    backlog, a restarted drain after new files delivers ONLY the new
    files (the seen-paths offset survives in the checkpoint), and
    nothing is ever delivered twice."""
    root = str(tmp_path / "landing")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    stage(root, "apifootball", "teams", apifootball_teams())
    stage(root, "apifootball", "standings", apifootball_standings())
    _drain_to_parquet(spark, root, ck, out)
    assert spark.read.parquet(out).count() == 2

    stage(root, "apifootball", "teams", apifootball_teams(),
          league=LEAGUE + 1, filename="run2.json")
    _drain_to_parquet(spark, root, ck, out)
    got = spark.read.parquet(out)
    assert got.count() == 3  # exactly the one new file appended
    new = got.filter(F.col("league") == LEAGUE + 1).collect()
    assert len(new) == 1
    assert new[0]["endpoint"] == "teams"


def test_replay_of_deleted_file_names_the_file(spark, tmp_path):
    """A crash-recovery replay referencing a file that was deleted
    since the original batch must fail with a targeted error naming
    the file, not a bare KeyError that hides the cause."""
    import os

    import pytest

    from football_etl_pipeline_spark.sources.landing_datasource import (
        FootballLandingStreamReader,
    )

    root = str(tmp_path / "landing")
    staged = stage(root, "apifootball", "teams", apifootball_teams())
    reader = FootballLandingStreamReader({"path": root})
    start = reader.initialOffset()
    _rows, end = reader.read(start)
    # file vanishes between commit and the crash-recovery replay
    path = end["seen"][0]
    os.remove(path)
    with pytest.raises(FileNotFoundError, match="no longer in the landing"):
        reader.readBetweenOffsets(start, end)


def test_writer_roundtrips_through_reader(spark, tmp_path):
    """df.write.format('football_landing') publishes one JSON file per
    row into the layout; reading the root back yields identical
    (api, season, league, endpoint, payload) rows — and no _staging
    residue survives the commit."""
    import os

    from football_etl_pipeline_spark.sources.landing_datasource import (
        register,
    )

    register(spark)
    root = str(tmp_path / "landing_w")
    rows = [
        ("apifootball", 2023, 39, "standings", '{"a": 1}'),
        ("apifootball", 2023, 39, "teams", '{"b": 2}'),
        ("apisports", 2024, 140, "standings", '{"c": 3}'),
    ]
    df = spark.createDataFrame(
        rows, "api string, season int, league int, endpoint string, payload string"
    )
    df.write.format("football_landing").mode("append").save(root)
    back = (
        spark.read.format("football_landing")
        .load(root)
        .select("api", "season", "league", "endpoint", "payload")
        .collect()
    )
    assert sorted(tuple(r) for r in back) == sorted(rows)
    assert not os.path.exists(os.path.join(root, "_staging"))


def test_writer_overwrite_clears_only_targeted_endpoint_dirs(spark, tmp_path):
    from football_etl_pipeline_spark.sources.landing_datasource import (
        register,
    )

    register(spark)
    root = str(tmp_path / "landing_ow")
    base = [
        ("apifootball", 2023, 39, "standings", '{"old": true}'),
        ("apifootball", 2023, 39, "teams", '{"keep": true}'),
    ]
    spark.createDataFrame(
        base, "api string, season int, league int, endpoint string, payload string"
    ).write.format("football_landing").mode("append").save(root)
    # overwrite ONLY the standings endpoint dir
    spark.createDataFrame(
        [("apifootball", 2023, 39, "standings", '{"new": true}')],
        "api string, season int, league int, endpoint string, payload string",
    ).write.format("football_landing").mode("overwrite").save(root)
    back = {
        (r.endpoint, r.payload)
        for r in spark.read.format("football_landing").load(root).collect()
    }
    assert back == {("standings", '{"new": true}'), ("teams", '{"keep": true}')}
