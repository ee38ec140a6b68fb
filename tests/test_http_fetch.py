"""I4/I9 tests: retrying HTTP clients (reference api_clients.py:6-73
parity) against a fake transport, and the structured-JSON log contract
(gcp_utils.py:11-18) — no network, no Spark."""

from __future__ import annotations

import json
import logging
import urllib.parse

import pytest

from football_etl_pipeline_spark.plans import ingest
from football_etl_pipeline_spark.plans.http_fetch import (
    HttpFetchError,
    RetryPolicy,
    fetch_apifootball_data,
    fetch_apisports_data,
    http_get_json,
    make_http_fetcher,
)
from football_etl_pipeline_spark.plans.structlog import etl_event, log_struct


class FakeTransport:
    """Scripted transport: pops (status, body) per call; an Exception
    instance in the script is raised (transport-level error)."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = []  # (url, headers)

    def __call__(self, url, headers):
        self.calls.append((url, dict(headers)))
        step = self.script.pop(0)
        if isinstance(step, Exception):
            raise step
        return step


OK = (200, b'{"ok": true}')


def sleeps():
    rec = []
    return rec, rec.append


# ---- retry semantics -------------------------------------------------


def test_success_first_try_no_sleep():
    t = FakeTransport([OK])
    rec, sl = sleeps()
    assert http_get_json("https://x/", transport=t, sleep=sl) == {"ok": True}
    assert len(t.calls) == 1 and rec == []


@pytest.mark.parametrize("status", [429, 500, 502, 504])
def test_forcelist_status_retried_then_success(status):
    t = FakeTransport([(status, b""), (status, b""), OK])
    rec, sl = sleeps()
    assert http_get_json("https://x/", transport=t, sleep=sl) == {"ok": True}
    # urllib3 1.x backoff: 0 before first retry, then factor * 2**(n-1).
    assert len(t.calls) == 3 and rec == [0.0, 0.6]


def test_retries_exhausted_raises():
    t = FakeTransport([(500, b"")] * 4)
    rec, sl = sleeps()
    with pytest.raises(HttpFetchError) as ei:
        http_get_json("https://x/", transport=t, sleep=sl)
    assert ei.value.status == 500
    assert len(t.calls) == 4  # 1 + total(3) retries
    assert rec == [0.0, 0.6, 1.2]


def test_non_retryable_status_raises_immediately():
    t = FakeTransport([(404, b"nope")])
    with pytest.raises(HttpFetchError) as ei:
        http_get_json("https://x/", transport=t, sleep=lambda s: None)
    assert ei.value.status == 404 and len(t.calls) == 1


def test_transport_errors_retried():
    t = FakeTransport([OSError("connection reset"), OK])
    rec, sl = sleeps()
    assert http_get_json("https://x/", transport=t, sleep=sl) == {"ok": True}
    assert len(t.calls) == 2 and rec == [0.0]


def test_invalid_json_body_raises():
    t = FakeTransport([(200, b"<html>")])
    with pytest.raises(HttpFetchError):
        http_get_json("https://x/", transport=t, sleep=lambda s: None)


def test_custom_policy_backoff():
    p = RetryPolicy(total=5, backoff_factor=0.1)
    assert [p.backoff_time(n) for n in range(1, 5)] == [0.0, 0.2, 0.4, 0.8]


# ---- auth shapes (api_clients.py:20-73) ------------------------------


def test_apifootball_query_param_auth():
    t = FakeTransport([OK])
    fetch_apifootball_data("KEY", "get_teams", {"league_id": 152}, transport=t)
    url, headers = t.calls[0]
    q = dict(urllib.parse.parse_qsl(urllib.parse.urlparse(url).query))
    assert url.startswith("https://apiv3.apifootball.com/")
    assert q == {"league_id": "152", "APIkey": "KEY", "action": "get_teams"}
    assert "x-rapidapi-key" not in headers


def test_apisports_header_auth():
    t = FakeTransport([OK])
    fetch_apisports_data("KEY", "teams", {"league": 39, "season": 2025}, transport=t)
    url, headers = t.calls[0]
    parsed = urllib.parse.urlparse(url)
    assert parsed.path == "/teams"
    assert headers["x-rapidapi-host"] == "v3.football.api-sports.io"
    assert headers["x-rapidapi-key"] == "KEY"
    q = dict(urllib.parse.parse_qsl(parsed.query))
    assert q == {"league": "39", "season": "2025"}


def test_make_http_fetcher_param_shapes():
    t = FakeTransport([OK, OK])
    f = make_http_fetcher({"apifootball": "K1", "apisports": "K2"}, transport=t)
    f("apifootball", "teams", 152, 2025)
    f("apisports", "standings", 39, 2025)
    q0 = dict(urllib.parse.parse_qsl(urllib.parse.urlparse(t.calls[0][0]).query))
    assert q0["action"] == "get_teams" and q0["league_id"] == "152"
    p1 = urllib.parse.urlparse(t.calls[1][0])
    q1 = dict(urllib.parse.parse_qsl(p1.query))
    # Season is the RESOLVED one (the main.py:89 hardcode is a fixed bug).
    assert p1.path == "/standings" and q1 == {"league": "39", "season": "2025"}


def test_make_http_fetcher_missing_key(caplog):
    f = make_http_fetcher({}, transport=FakeTransport([]))
    with caplog.at_level(logging.ERROR, "football_etl_pipeline_spark"):
        with pytest.raises(HttpFetchError):
            f("apifootball", "teams", 152, 2025)
    payload = json.loads(caplog.records[-1].message)
    assert payload["event"] == "no_api_key_found"
    assert payload["api-source"] == "apifootball"


# ---- structured log contract (gcp_utils.py:11-18) --------------------


def _payloads(caplog):
    return [json.loads(r.message) for r in caplog.records]


def test_log_struct_json_vocabulary(caplog):
    with caplog.at_level(logging.INFO, "football_etl_pipeline_spark"):
        log_struct(
            {"etl-stage": "injection", "event": "x", "api-source": "a", "run_id": "r"}
        )
        etl_event("injection", "y", "a", "r", severity="ERROR", reason="boom")
    p0, p1 = _payloads(caplog)
    assert set(p0) == {"etl-stage", "event", "api-source", "run_id"}
    assert p1 == {
        "etl-stage": "injection",
        "event": "y",
        "api-source": "a",
        "run_id": "r",
        "reason": "boom",
    }
    assert caplog.records[1].levelno == logging.ERROR


def test_log_struct_non_serializable_uses_default_str(caplog):
    with caplog.at_level(logging.INFO, "football_etl_pipeline_spark"):
        log_struct({"event": "z", "when": object()})
    assert "when" in _payloads(caplog)[0]


# ---- full ingest path through the HTTP fetcher -----------------------


def _ingest_transport_ok():
    # 2 leagues × 2 endpoints = 4 calls.
    return FakeTransport([OK] * 4)


def test_ingest_with_http_fetcher_success(tmp_path):
    t = _ingest_transport_ok()
    f = make_http_fetcher({"apifootball": "K"}, transport=t)
    res = ingest.ingest("apifootball", [152, 302], f, str(tmp_path), season=2025)
    assert res.error is None and not res.rolled_back
    assert len(res.uploaded_files) == 4
    for p in res.uploaded_files:
        assert json.load(open(p)) == {"ok": True}


def test_ingest_retry_then_success(tmp_path):
    # First call stutters (500, 500) then succeeds; remaining 3 clean.
    t = FakeTransport([(500, b""), (500, b""), OK, OK, OK, OK])
    f = make_http_fetcher(
        {"apisports": "K"}, transport=t, sleep=lambda s: None
    )
    res = ingest.ingest("apisports", [39, 61], f, str(tmp_path), season=2025)
    assert res.error is None and len(res.uploaded_files) == 4
    assert len(t.calls) == 6


def test_ingest_retry_exhausted_rolls_back(tmp_path, caplog):
    # League 1 succeeds fully; league 2 teams fetch dies after retries.
    t = FakeTransport([OK, OK] + [(500, b"")] * 4)
    f = make_http_fetcher(
        {"apifootball": "K"}, transport=t, sleep=lambda s: None
    )
    with caplog.at_level(logging.INFO, "football_etl_pipeline_spark"):
        res = ingest.ingest(
            "apifootball", [152, 302], f, str(tmp_path), season=2025
        )
    assert res.rolled_back and res.uploaded_files == []
    assert "retries exhausted" in res.error
    # The two staged files from league 1 were compensated away.
    assert not list(tmp_path.rglob("*.json"))
    events = [p["event"] for p in _payloads(caplog)]
    # Reference vocabulary: staged files, the [sic] fetch error, rollback.
    assert events.count("file-staged") == 2
    assert "fecth_error" in events and "remove_uploaded_files" in events
    last = _payloads(caplog)[-1]
    assert last["reason"] == "cleanup_successful"
    fetch_err = next(p for p in _payloads(caplog) if p["event"] == "fecth_error")
    assert fetch_err["league_id"] == 302 and fetch_err["endpoint"] == "teams"
    assert fetch_err["etl-stage"] == "injection"
