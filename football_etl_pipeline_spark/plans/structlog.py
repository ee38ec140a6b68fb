"""Structured JSON logging (I9 — reference ``ingestion/gcp_utils.py:11-18``).

The reference emits every operational event as one JSON object on the
stdlib logger: ``log_struct(payload, severity)`` →
``logging.log(level, json.dumps(payload, default=str))``. The payload
vocabulary (main.py:37-200) is ``etl-stage`` / ``event`` /
``api-source`` / ``run_id`` plus event-specific fields (``reason``,
``league_id``, ``endpoint``, ``files``…).

This module reproduces that contract exactly so downstream log
pipelines keyed on those fields work unchanged; ``etl_event`` is a
convenience wrapper that fills the common fields.
"""

from __future__ import annotations

import json
import logging

logger = logging.getLogger("football_etl_pipeline_spark")


def log_struct(payload: dict, severity: str = "INFO") -> None:
    """gcp_utils.py:11-18 parity: one JSON object per log record."""
    text = json.dumps(payload, default=str)
    lvl = getattr(logging, severity.upper(), logging.INFO)
    logger.log(lvl, text)


def etl_event(
    stage: str,
    event: str,
    api_source: str | None = None,
    run_id: str | None = None,
    severity: str = "INFO",
    **extra,
) -> None:
    payload: dict = {"etl-stage": stage, "event": event}
    if api_source is not None:
        payload["api-source"] = api_source
    if run_id is not None:
        payload["run_id"] = run_id
    payload.update(extra)
    log_struct(payload, severity=severity)
