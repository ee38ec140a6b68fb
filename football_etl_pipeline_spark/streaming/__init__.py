"""Structured Streaming surface: file-source event streams with
validation/dead-letter split, watermarked tumbling windows, and
session windows (SURVEY.md §7 Stage 4)."""

from .events_stream import (
    EVENTS_SCHEMA,
    read_events_stream,
    sessionized,
    split_valid,
    start_to_memory,
    windowed_counts,
    write_dead_letter,
)

__all__ = [
    "EVENTS_SCHEMA",
    "read_events_stream",
    "sessionized",
    "split_valid",
    "start_to_memory",
    "windowed_counts",
    "write_dead_letter",
]
