"""Ingestion parity (reference ``ingestion/`` — I1-I10 in SURVEY §2b).

Pure-Python driver-side ingestion: resolve season + leagues → fetch
teams then standings per league via an INJECTABLE fetcher → stage raw
JSON into the reference's landing layout → hand off in-process to the
Spark transform (no Dataflow launch hop). Rollback (compensating
delete) on any failure, parity with ingestion/main.py:34-52.

Reference bugs fixed here (SURVEY §2b list):
- rollback no longer references variables before assignment
  (main.py:159-161,213 NameError): we track uploaded files in one
  list that always exists.
- the resolved ``season`` is actually passed to every fetch
  (main.py:159,164 dropped it) and is resolved ONCE, not per league
  iteration (main.py:81-82).
- no hardcoded season override (main.py:89 pinned '2023' for
  apisports regardless of the argument).

Distribution note: ingestion is driver-side Python on purpose — it's
a handful of HTTP calls per run (BASELINE.md: 2/API/league). The
scale path for bulk backfills is a URL DataFrame + ``mapInPandas``
fetcher; the landing layout and the transform don't change.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
from collections.abc import Callable
from dataclasses import dataclass, field
from datetime import datetime, timezone

from .structlog import etl_event

log = logging.getLogger(__name__)

# Fetcher contract: (api_name, endpoint, league_id, season) -> payload
# (the object to be JSON-serialized into the staged file). Tests inject
# fixture payloads; production uses ``http_fetch.make_http_fetcher``
# (urllib3-Retry parity with ingestion/api_clients.py:6-73).
Fetcher = Callable[[str, str, int, int], object]

# The reference's structured-log vocabulary (main.py:37-113) — stage is
# spelled "injection" and the fetch-failure event "fecth_error" [sic];
# both strings are preserved verbatim so log pipelines keyed on the
# reference vocabulary match.
ETL_STAGE = "injection"

ENDPOINTS = ("teams", "standings")


def get_current_season(now: datetime | None = None) -> int:
    """I2 (main.py:15-22): football season = year if month >= 8 else
    year - 1 (seasons straddle New Year)."""
    now = now or datetime.now(timezone.utc)
    return now.year if now.month >= 8 else now.year - 1


def get_league_ids(config_value: str | None) -> list[int] | None:
    """I3 (main.py:24-32): JSON-encoded league list, None on any
    failure (caller falls back or aborts)."""
    if not config_value:
        return None
    try:
        leagues = json.loads(config_value)
        return [int(x) for x in leagues]
    except (ValueError, TypeError):
        log.warning("Could not parse league ids from config: %r", config_value)
        return None


def parse_trigger_message(payload: dict | None) -> dict:
    """I1 (main.py:54-72): malformed trigger → {} + warning (the caller
    then falls back to configured leagues)."""
    if isinstance(payload, dict):
        return payload
    etl_event(
        ETL_STAGE,
        "parse_trigger_message_error",
        severity="WARNING",
        reason="Malformed Pub/Sub message data",
        error=repr(payload),
    )
    return {}


def staged_path(
    landing_root: str,
    api_name: str,
    season: int,
    league_id: int,
    endpoint: str,
    run_id: str,
) -> str:
    """I5 layout (main.py:86,91,108-110):
    {api}/season_{s}/league_{l}/{endpoint}/{run_id}_{YYYY-MM-DD}.json"""
    date_str = datetime.now(timezone.utc).strftime("%Y-%m-%d")
    return os.path.join(
        landing_root,
        api_name,
        f"season_{season}",
        f"league_{league_id}",
        endpoint,
        f"{run_id}_{date_str}.json",
    )


@dataclass
class IngestResult:
    uploaded_files: list[str] = field(default_factory=list)
    rolled_back: bool = False
    error: str | None = None


def rollback(files: list[str], api_name: str = "", run_id: str = "") -> None:
    """I6 (main.py:34-52): compensating delete of everything this run
    staged; success logs ``remove_uploaded_files`` INFO, failure logs
    it CRITICAL with the file list — never raises (best-effort)."""
    failed: list[str] = []
    err: str | None = None
    for path in files:
        try:
            os.remove(path)
        except OSError as e:
            failed.append(path)
            err = str(e)
    if failed:
        etl_event(
            ETL_STAGE,
            "remove_uploaded_files",
            api_name,
            run_id,
            severity="CRITICAL",
            reason=err,
            files=failed,
        )
    else:
        etl_event(
            ETL_STAGE,
            "remove_uploaded_files",
            api_name,
            run_id,
            reason="cleanup_successful",
        )


def ingest(
    api_name: str,
    leagues: list[int],
    fetcher: Fetcher,
    landing_root: str,
    season: int | None = None,
    run_id: str | None = None,
) -> IngestResult:
    """I10 (main.py:126-225, both entry points unified): for each
    league fetch+stage teams then standings; any failure rolls back
    every file staged in this run and surfaces the error."""
    season = season if season is not None else get_current_season()
    run_id = run_id or datetime.now(timezone.utc).strftime("%Y%m%dT%H%M%S%f")
    result = IngestResult()
    try:
        for league_id in leagues:
            for endpoint in ENDPOINTS:
                try:
                    payload = fetcher(api_name, endpoint, league_id, season)
                except Exception as e:
                    # Reference event name "fecth_error" [sic]
                    # (main.py:95-103) — preserved for log parity.
                    etl_event(
                        ETL_STAGE,
                        "fecth_error",
                        api_name,
                        run_id,
                        severity="ERROR",
                        league_id=league_id,
                        endpoint=endpoint,
                        reason=str(e),
                    )
                    raise
                path = staged_path(
                    landing_root, api_name, season, league_id, endpoint, run_id
                )
                try:
                    os.makedirs(os.path.dirname(path), exist_ok=True)
                    with open(path, "w") as f:
                        json.dump(payload, f)
                except Exception as e:
                    etl_event(
                        ETL_STAGE,
                        "store_error",
                        api_name,
                        run_id,
                        severity="ERROR",
                        league_id=league_id,
                        endpoint=endpoint,
                        reason=str(e),
                    )
                    raise
                result.uploaded_files.append(path)
                etl_event(
                    ETL_STAGE, "file-staged", api_name, run_id, path=path
                )
    except Exception as e:  # noqa: BLE001 — any fetch/store failure compensates
        rollback(result.uploaded_files, api_name, run_id)
        result.rolled_back = True
        result.error = str(e)
        result.uploaded_files = []
    return result


def clean_landing(landing_root: str, api_name: str) -> None:
    """Remove an API's whole landing subtree (test/backfill helper)."""
    shutil.rmtree(os.path.join(landing_root, api_name), ignore_errors=True)
