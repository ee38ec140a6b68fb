"""Golden ETL fixtures (SURVEY §5 item 2): full normalize/join/enforce
path against hand-checked unified rows, including every dead-letter
class — cast failure, probe-miss drop, empty standings, malformed
JSON, unparseable path → 'unknown' group."""

from __future__ import annotations

import json

import pytest

from football_etl_pipeline_spark.plans.pipeline import run_transform
from football_etl_pipeline_spark.plans.unified_schema import (
    UNIFIED_SCHEMA_V1,
    parse_schema,
)

from . import fixtures_football as fx


def _run(spark, files, api):
    return run_transform(spark, api, files)


def _rows_by_pk(df):
    return {r["pk"]: r.asDict() for r in df.collect()}


class TestHappyPath:
    def test_apifootball_golden(self, spark, tmp_path):
        d = str(tmp_path)
        files = [
            fx.stage(d, "apifootball", "teams", fx.apifootball_teams()),
            fx.stage(d, "apifootball", "standings", fx.apifootball_standings()),
        ]
        res = _run(spark, files, "apifootball")
        rows = _rows_by_pk(res.good)
        assert res.dead_letter.count() == 0
        assert res.dropped.count() == 0
        assert len(rows) == 3

        r = rows["2023-153-100"]  # Alpha FC
        assert r["team_id"] == "100"
        assert r["team_name"] == "Alpha FC"
        assert r["team_country"] == "Testland"
        assert r["league_id"] == "153"
        assert r["league_name"] == "Test League"
        assert r["season"] == 2023
        assert r["rank"] == 1
        assert r["points"] == 33          # 3*10+3, cast from string
        assert r["games_played"] == 14    # from the 'payed' typo field
        assert (r["wins"], r["draws"], r["losses"]) == (10, 3, 1)
        assert (r["goals_for"], r["goals_against"]) == (30, 10)
        assert r["goal_difference"] == 20  # DERIVED (GF-GA) for apifootball
        assert r["form"] == "WWLDW"
        assert r["venue_name"] == "Alpha FC Park"
        assert r["venue_city"] == "City0"
        assert r["update_timestamp"] is None  # never populated pre-write
        assert r["schema_version"] == "1"

    def test_apisports_golden(self, spark, tmp_path):
        d = str(tmp_path)
        files = [
            fx.stage(d, "apisports", "teams", fx.apisports_teams()),
            fx.stage(d, "apisports", "standings", fx.apisports_standings()),
        ]
        res = _run(spark, files, "apisports")
        rows = _rows_by_pk(res.good)
        assert res.dead_letter.count() == 0
        assert len(rows) == 3
        r = rows["2023-153-101"]  # Beta United
        assert r["team_id"] == "101"
        # team_name from the TEAMS side for apisports (transforms.py:111)
        assert r["team_name"] == "Beta United"
        assert r["season"] == 2023
        assert r["goal_difference"] == 10  # COPIED from goalsDiff
        assert r["venue_name"] == "Beta United Park"

    def test_column_order_matches_schema(self, spark, tmp_path):
        d = str(tmp_path)
        files = [
            fx.stage(d, "apifootball", "teams", fx.apifootball_teams()),
            fx.stage(d, "apifootball", "standings", fx.apifootball_standings()),
        ]
        res = _run(spark, files, "apifootball")
        expected = [f["name"] for f in UNIFIED_SCHEMA_V1["fields"]]
        assert res.good.columns == expected


class TestDeadLetter:
    def test_cast_failure_kills_whole_group(self, spark, tmp_path):
        d = str(tmp_path)
        standings = fx.apifootball_standings()
        standings[1]["overall_league_PTS"] = "not-a-number"
        files = [
            fx.stage(d, "apifootball", "teams", fx.apifootball_teams()),
            fx.stage(d, "apifootball", "standings", standings),
        ]
        res = _run(spark, files, "apifootball")
        assert res.good.count() == 0  # ONE bad record fails the group
        dl = res.dead_letter.collect()
        assert len(dl) == 1
        assert dl[0]["PK"] == "2023-153"
        assert sorted(dl[0]["files"]) == sorted(files)
        assert "points" in dl[0]["error"]
        assert "not-a-number" in dl[0]["error"]

    def test_probe_miss_is_dropped_not_dead_lettered(self, spark, tmp_path):
        d = str(tmp_path)
        standings = fx.apifootball_standings()
        standings.append({**standings[0], "team_id": "999", "team_name": "Ghost FC"})
        files = [
            fx.stage(d, "apifootball", "teams", fx.apifootball_teams()),
            fx.stage(d, "apifootball", "standings", standings),
        ]
        res = _run(spark, files, "apifootball")
        assert res.good.count() == 3          # the 3 matched teams land
        assert res.dead_letter.count() == 0   # not a failure...
        dropped = res.dropped.collect()       # ...but visible (logged skip)
        assert len(dropped) == 1
        assert dropped[0]["team_id"] == "999"

    def test_empty_standings_guard(self, spark, tmp_path):
        d = str(tmp_path)
        files = [
            fx.stage(d, "apifootball", "teams", fx.apifootball_teams()),
            fx.stage(d, "apifootball", "standings", []),
        ]
        res = _run(spark, files, "apifootball")
        assert res.good.count() == 0
        dl = res.dead_letter.collect()
        assert len(dl) == 1
        assert "missing for standings or teams" in dl[0]["error"]
        # BOTH files of the group are listed, including the empty one
        assert sorted(dl[0]["files"]) == sorted(files)

    def test_apisports_empty_response_guard(self, spark, tmp_path):
        d = str(tmp_path)
        files = [
            fx.stage(d, "apisports", "teams", fx.apisports_teams()),
            fx.stage(d, "apisports", "standings", {"response": []}),
        ]
        res = _run(spark, files, "apisports")
        assert res.good.count() == 0
        dl = res.dead_letter.collect()
        assert len(dl) == 1
        assert "'response' data is empty or missing" in dl[0]["error"]

    def test_malformed_json_kills_group(self, spark, tmp_path):
        d = str(tmp_path)
        files = [
            fx.stage(d, "apifootball", "teams", fx.apifootball_teams()),
            fx.stage(d, "apifootball", "standings", "{this is not json"),
        ]
        res = _run(spark, files, "apifootball")
        assert res.good.count() == 0
        dl = res.dead_letter.collect()
        assert len(dl) == 1
        assert "Dead letter file:" in dl[0]["error"]

    def test_unparseable_path_unknown_group(self, spark, tmp_path):
        d = str(tmp_path)
        files = [
            fx.stage(d, "apifootball", "teams", fx.apifootball_teams()),
            fx.stage(d, "apifootball", "standings", fx.apifootball_standings()),
            # path misses the season_X/league_Y pattern → 'unknown' group
            fx.stage(d, "apifootball", "teams", fx.apifootball_teams(),
                     season="X", league="Y"),
            fx.stage(d, "apifootball", "standings", fx.apifootball_standings(),
                     season="X", league="Y"),
        ]
        res = _run(spark, files, "apifootball")
        # good group lands; 'unknown' group dies on season INTEGER cast
        assert res.good.count() == 3
        dl = {r["PK"]: r for r in res.dead_letter.collect()}
        assert list(dl) == ["unknown"]
        assert "season" in dl["unknown"]["error"]

    def test_multi_group_isolation(self, spark, tmp_path):
        """One league's bad data must not affect another league."""
        d = str(tmp_path)
        bad_standings = fx.apifootball_standings()
        bad_standings[0]["overall_league_W"] = "NaN-ish"
        files = [
            fx.stage(d, "apifootball", "teams", fx.apifootball_teams()),
            fx.stage(d, "apifootball", "standings", fx.apifootball_standings()),
            fx.stage(d, "apifootball", "teams", fx.apifootball_teams(), league=40),
            fx.stage(d, "apifootball", "standings", bad_standings, league=40),
        ]
        res = _run(spark, files, "apifootball")
        assert res.good.count() == 3
        assert {r["league_id"] for r in res.good.collect()} == {"153"}
        dl = res.dead_letter.collect()
        assert len(dl) == 1 and dl[0]["PK"] == "2023-40"


class TestSchemaRegistry:
    def test_required_missing(self, spark):
        from football_etl_pipeline_spark.plans.enforce import ERROR_COL, enforce_schema

        schema = parse_schema(
            {
                "version": 9,
                "fields": [
                    {"name": "a", "type": "STRING", "mode": "REQUIRED"},
                    {"name": "b", "type": "INTEGER"},
                ],
            }
        )
        df = spark.createDataFrame([(None, "3"), ("x", "4")], "a string, b string")
        out = {r["b"]: r[ERROR_COL] for r in enforce_schema(df, schema).collect()}
        assert out[3] == "Missing required field: 'a' in record."
        assert out[4] is None

    def test_prune_extra_fields(self, spark):
        from football_etl_pipeline_spark.plans.enforce import enforce_schema

        schema = parse_schema(
            {"version": 1, "fields": [{"name": "a", "type": "STRING"}]}
        )
        df = spark.createDataFrame([("x", "junk")], "a string, zz string")
        out = enforce_schema(df, schema)
        assert "zz" not in out.columns

    def test_unsupported_type_rejected(self):
        with pytest.raises(TypeError, match="Unsupported schema type"):
            parse_schema(
                {"version": 1, "fields": [{"name": "a", "type": "GEOGRAPHY"}]}
            )

    def test_mode_default_is_nullable(self):
        s = parse_schema(UNIFIED_SCHEMA_V1)
        assert s.required == ("pk",)
        assert s.version == "1"


class TestIngestion:
    def test_ingest_and_transform_end_to_end(self, spark, tmp_path):
        from football_etl_pipeline_spark.plans import ingest as ing

        payloads = {
            "teams": fx.apifootball_teams(),
            "standings": fx.apifootball_standings(),
        }
        res = ing.ingest(
            "apifootball",
            leagues=[153],
            fetcher=lambda api, ep, lg, sn: payloads[ep],
            landing_root=str(tmp_path),
            season=2023,
        )
        assert not res.rolled_back
        assert len(res.uploaded_files) == 2
        tr = run_transform(spark, "apifootball", res.uploaded_files)
        assert tr.good.count() == 3

    def test_ingest_rollback_on_fetch_failure(self, tmp_path):
        from football_etl_pipeline_spark.plans import ingest as ing

        def flaky(api, ep, lg, sn):
            if ep == "standings":
                raise RuntimeError("HTTP 500")
            return fx.apifootball_teams()

        res = ing.ingest(
            "apifootball", [153], flaky, str(tmp_path), season=2023
        )
        assert res.rolled_back
        assert res.error == "HTTP 500"
        import glob

        assert glob.glob(str(tmp_path / "**/*.json"), recursive=True) == []

    def test_season_boundary_at_august(self):
        from datetime import datetime, timezone

        from football_etl_pipeline_spark.plans.ingest import get_current_season

        assert get_current_season(datetime(2024, 7, 31, tzinfo=timezone.utc)) == 2023
        assert get_current_season(datetime(2024, 8, 1, tzinfo=timezone.utc)) == 2024

    def test_trigger_parse_and_league_ids(self):
        from football_etl_pipeline_spark.plans.ingest import (
            get_league_ids,
            parse_trigger_message,
        )

        assert parse_trigger_message({"leagues": [153]}) == {"leagues": [153]}
        assert parse_trigger_message(None) == {}
        assert get_league_ids("[153, 40]") == [153, 40]
        assert get_league_ids("'[153]'") is None  # README's malformed sample
        assert get_league_ids(None) is None

    def test_write_outputs(self, spark, tmp_path):
        from football_etl_pipeline_spark.plans.pipeline import (
            output_table_name,
            write_dead_letter,
            write_unified,
        )

        d = str(tmp_path)
        files = [
            fx.stage(d, "apifootball", "teams", fx.apifootball_teams()),
            fx.stage(d, "apifootball", "standings", fx.apifootball_standings()),
        ]
        res = run_transform(spark, "apifootball", files)
        out = str(tmp_path / output_table_name("apifootball"))
        metrics = write_unified(res.good, out)
        back = spark.read.parquet(out)
        assert back.count() == 3
        # Observation metrics accumulated during the write pass itself
        assert metrics["n_rows"] == 3
        assert metrics["n_null_pk"] == 0
        # update_timestamp stamped at write time (unlike the reference,
        # which declared a default it never applied)
        assert back.filter("update_timestamp IS NULL").count() == 0

        dl_dir = str(tmp_path / "dead_letter")
        write_dead_letter(res.dead_letter, dl_dir)
        import glob

        parts = [p for p in glob.glob(dl_dir + "/part-*") if not p.endswith(".crc")]
        assert len(parts) == 1  # num_shards=1 parity


class TestSchemaEvolution:
    def test_v2_add_field_repoint(self, spark, tmp_path):
        """SURVEY §1 evolution contract: add a v2 schema with a new
        NULLABLE field and repoint the job — no code change. The new
        field lands as explicit NULL (T11: NULLABLE-missing → None)
        and every record stamps schema_version '2'."""
        import copy

        v2 = copy.deepcopy(UNIFIED_SCHEMA_V1)
        v2["version"] = 2
        v2["fields"].insert(
            -1, {"name": "sponsor", "type": "STRING", "mode": "NULLABLE"}
        )

        d = str(tmp_path)
        files = [
            fx.stage(d, "apifootball", "teams", fx.apifootball_teams()),
            fx.stage(d, "apifootball", "standings", fx.apifootball_standings()),
        ]
        res = run_transform(spark, "apifootball", files, schema_data=v2)
        rows = _rows_by_pk(res.good)
        assert res.dead_letter.count() == 0
        assert len(rows) == 3
        assert "sponsor" in res.good.columns
        for r in rows.values():
            assert r["sponsor"] is None
            assert r["schema_version"] == "2"
        # v1 columns unharmed
        assert rows["2023-153-100"]["points"] == 33

    def test_v2_tighten_mode_dead_letters(self, spark, tmp_path):
        """Evolution can also TIGHTEN: making ``form`` REQUIRED in v2
        dead-letters records that lack it, without touching the code."""
        import copy

        v2 = copy.deepcopy(UNIFIED_SCHEMA_V1)
        v2["version"] = 2
        for f in v2["fields"]:
            if f["name"] == "form":
                f["mode"] = "REQUIRED"

        teams = fx.apifootball_teams()
        standings = fx.apifootball_standings()
        # strip the form source field from one standings record
        victim = [s for s in standings if s["team_id"] == "100"][0]
        del victim["overall_league_form"]
        d = str(tmp_path)
        files = [
            fx.stage(d, "apifootball", "teams", teams),
            fx.stage(d, "apifootball", "standings", standings),
        ]
        res = run_transform(spark, "apifootball", files, schema_data=v2)
        # reference semantics (transforms.py:182-184): ONE failing
        # record dead-letters its whole (season, league) group
        assert res.good.count() == 0
        assert res.dead_letter.count() == 1
        err = res.dead_letter.collect()[0]["error"]
        assert "form" in err
