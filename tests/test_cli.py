"""CLI surface tests: the subcommands a reference user would actually
run, driven in-process via ``__main__.main(argv)``."""

from __future__ import annotations

import os

from football_etl_pipeline_spark.__main__ import main

from .fixtures_football import apifootball_standings, apifootball_teams, stage

API = "apifootball"


def test_cli_pipeline_loads_warehouse(spark, tmp_path, capsys):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "wh")
    dead = str(tmp_path / "dead")
    stage(landing, API, "teams", apifootball_teams())
    stage(landing, API, "standings", apifootball_standings())
    rc = main(
        ["pipeline", "--api", API, "--landing", landing, "--out", out,
         "--dead-letter", dead]
    )
    assert rc == 0
    assert "loaded 3 rows" in capsys.readouterr().out
    assert spark.read.parquet(out).count() == 3


def test_cli_pipeline_empty_landing_errors(tmp_path, capsys):
    rc = main(
        ["pipeline", "--api", API, "--landing", str(tmp_path), "--out",
         str(tmp_path / "o")]
    )
    assert rc == 1
    assert "no landing files" in capsys.readouterr().err


def test_cli_query_runs_and_unknown_suggests(capsys):
    rc = main(["query", "--name", "q1_pricing_summary", "--sf-dir",
               "/root/testdata/sf0.001", "--limit", "3"])
    assert rc == 0
    assert "l_returnflag" in capsys.readouterr().out
    rc = main(["query", "--name", "pricing"])
    assert rc == 2
    assert "did you mean" in capsys.readouterr().err


def test_cli_list_inventories_all_queries(capsys):
    from football_etl_pipeline_spark.operators import QUERIES

    rc = main(["list"])
    assert rc == 0
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
    assert len(lines) == len(QUERIES)
    assert all("\toracled" in ln or "\trows-only" in ln for ln in lines)


def test_cli_ingest_requires_key(tmp_path, capsys, monkeypatch):
    monkeypatch.delenv("APIFOOTBALL_KEY", raising=False)
    rc = main(["ingest", "--api", API, "--leagues", "153", "--landing",
               str(tmp_path)])
    assert rc == 2
    assert "APIFOOTBALL_KEY" in capsys.readouterr().err
    assert not os.listdir(tmp_path)
