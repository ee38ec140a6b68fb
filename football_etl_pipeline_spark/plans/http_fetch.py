"""Retrying HTTP clients for ingestion (I4 — reference
``ingestion/api_clients.py:6-73``).

The reference builds a ``requests`` session wrapping urllib3
``Retry(total=3, read=3, connect=3, backoff_factor=0.3,
status_forcelist=(429, 500, 502, 504))`` and exposes one fetch
function per API with its auth shape:

- apifootball (``api_clients.py:20-44``): query-param auth — the key
  travels as ``APIkey`` and the endpoint as ``action`` on a single
  base URL.
- apisports (``api_clients.py:46-73``): header auth —
  ``x-rapidapi-host`` / ``x-rapidapi-key``, endpoint in the URL path.

This module reproduces those semantics on the stdlib (``requests`` is
not a declared dependency of this repo) with an injectable transport,
so the retry/backoff/auth logic is unit-testable without a network and
the production path is plain ``urllib.request``.

Retry semantics mirror urllib3 1.x ``Retry.get_backoff_time``:
- statuses in the forcelist and transport-level (connect/read) errors
  are retried up to ``total`` times;
- other 4xx/5xx raise immediately (``raise_for_status`` parity);
- sleep before retry n (1-based) is ``0`` for n == 1, then
  ``backoff_factor * 2**(n-1)`` — 0, 0.6, 1.2 for the defaults.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Callable
from dataclasses import dataclass
from time import sleep as _real_sleep

from .structlog import log_struct

APIFOOTBALL_BASE_URL = "https://apiv3.apifootball.com/"
APISPORTS_BASE_URL = "https://v3.football.api-sports.io/"
APISPORTS_HOST = "v3.football.api-sports.io"

# transport(url, headers) -> (status_code, body_bytes). Transport-level
# failures (DNS, connect, read) raise OSError/URLError.
Transport = Callable[[str, dict], tuple[int, bytes]]


class HttpFetchError(Exception):
    """Fetch failed after exhausting retries (or non-retryable status)."""

    def __init__(self, msg: str, status: int | None = None):
        super().__init__(msg)
        self.status = status


@dataclass(frozen=True)
class RetryPolicy:
    """urllib3-``Retry``-equivalent knobs (api_clients.py:6-18)."""

    total: int = 3
    backoff_factor: float = 0.3
    status_forcelist: tuple[int, ...] = (429, 500, 502, 504)

    def backoff_time(self, consecutive_errors: int) -> float:
        if consecutive_errors <= 1:
            return 0.0
        return self.backoff_factor * (2 ** (consecutive_errors - 1))


def _urllib_transport(url: str, headers: dict) -> tuple[int, bytes]:
    req = urllib.request.Request(url, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        # Non-2xx WITH a response: a status, not a transport error.
        return e.code, e.read()


def http_get_json(
    url: str,
    params: dict | None = None,
    headers: dict | None = None,
    *,
    policy: RetryPolicy | None = None,
    transport: Transport | None = None,
    sleep: Callable[[float], None] = _real_sleep,
) -> dict:
    """GET → JSON with urllib3-Retry-equivalent behavior.

    Retries forcelist statuses and transport errors with exponential
    backoff; any other status ≥ 400 raises immediately (the
    reference's ``raise_for_status``). Statuses in 300-399 never
    reach this layer from the real transport — urllib follows
    redirects internally — so the injectable-transport contract is
    2xx/4xx/5xx only; a 3xx from an injected transport raises with
    an explicit contract-violation message rather than being treated
    as an error response."""
    policy = policy or RetryPolicy()
    transport = transport or _urllib_transport
    if params:
        url = url + ("&" if "?" in url else "?") + urllib.parse.urlencode(params)
    headers = dict(headers or {})

    errors = 0
    last: str = "no attempt made"
    while True:
        try:
            status, body = transport(url, headers)
        except OSError as e:  # URLError subclasses OSError
            errors += 1
            last = f"transport error: {e}"
            status = None
        else:
            if 200 <= status < 300:
                try:
                    return json.loads(body.decode("utf-8"))
                except (ValueError, UnicodeDecodeError) as e:
                    raise HttpFetchError(f"invalid JSON body: {e}", status)
            if 300 <= status < 400:
                raise HttpFetchError(
                    f"unexpected 3xx from injected transport ({status}) for"
                    f" {url}: the real transport follows redirects itself",
                    status,
                )
            if status not in policy.status_forcelist:
                raise HttpFetchError(f"HTTP {status} for {url}", status)
            errors += 1
            last = f"HTTP {status}"
        if errors > policy.total:
            raise HttpFetchError(
                f"retries exhausted ({policy.total}) for {url}: {last}", status
            )
        sleep(policy.backoff_time(errors))


def fetch_apifootball_data(
    api_key: str,
    endpoint: str,
    params: dict,
    *,
    policy: RetryPolicy | None = None,
    transport: Transport | None = None,
    sleep: Callable[[float], None] = _real_sleep,
) -> dict:
    """apifootball auth shape (api_clients.py:20-44): ``APIkey`` and
    ``action`` as query params on one base URL."""
    q = dict(params)
    q["APIkey"] = api_key
    q["action"] = endpoint
    return http_get_json(
        APIFOOTBALL_BASE_URL, q, policy=policy, transport=transport, sleep=sleep
    )


def fetch_apisports_data(
    api_key: str,
    endpoint: str,
    params: dict,
    *,
    policy: RetryPolicy | None = None,
    transport: Transport | None = None,
    sleep: Callable[[float], None] = _real_sleep,
) -> dict:
    """apisports auth shape (api_clients.py:46-73): rapidapi host/key
    headers, endpoint in the URL path."""
    headers = {"x-rapidapi-host": APISPORTS_HOST, "x-rapidapi-key": api_key}
    return http_get_json(
        APISPORTS_BASE_URL + endpoint,
        params,
        headers,
        policy=policy,
        transport=transport,
        sleep=sleep,
    )


def make_http_fetcher(
    api_keys: dict[str, str],
    *,
    policy: RetryPolicy | None = None,
    transport: Transport | None = None,
    sleep: Callable[[float], None] = _real_sleep,
):
    """Adapt the per-API clients to the ingest ``Fetcher`` seam
    (``ingest.Fetcher``: (api_name, endpoint, league_id, season) →
    payload), with the reference's param shapes (main.py:84-90):
    apifootball sends ``league_id`` and prefixes endpoints with
    ``get_``; apisports sends ``league`` + ``season`` (the reference's
    hardcoded season '2023' at main.py:89 is one of the documented
    bugs this repo fixes — the resolved season is actually sent)."""

    def fetcher(api_name: str, endpoint: str, league_id: int, season: int):
        key = api_keys.get(api_name)
        if not key:
            log_struct(
                {
                    "etl-stage": "injection",
                    "event": "no_api_key_found",
                    "api-source": api_name,
                    "reason": "missing_api_key",
                },
                severity="ERROR",
            )
            raise HttpFetchError(f"missing api key for {api_name}")
        if api_name == "apifootball":
            return fetch_apifootball_data(
                key,
                f"get_{endpoint}",
                {"league_id": league_id},
                policy=policy,
                transport=transport,
                sleep=sleep,
            )
        if api_name == "apisports":
            return fetch_apisports_data(
                key,
                endpoint,
                {"league": league_id, "season": season},
                policy=policy,
                transport=transport,
                sleep=sleep,
            )
        # Unknown api names must not fall through to either client — a
        # typo'd name with a configured key would silently send that
        # key to the wrong host.
        raise HttpFetchError(f"unknown api name {api_name!r}")

    return fetcher
