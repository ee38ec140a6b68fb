"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API)
for the football landing zone: ``spark.read.format("football_landing")``
yields one row per staged raw JSON file, with the landing-path key
columns (api/season/league/endpoint) already parsed — the connector
face of the reference's file-list + regex-key extraction stages
(``/root/reference/dataflow-flex/football_pipeline/pipeline.py:30-37``,
``helpers.py:14-23``), exposed through Spark's catalog-integrated
reader instead of a bespoke loader.

Parallelism: one ``InputPartition`` per (api, season, league) group —
the reference's GroupByKey unit — so each transform group lands intact
on one task, files within a group read together. Group DISCOVERY runs
on the driver (a directory walk, one entry per staged file); at
100 TB-of-landings scale the walk becomes a listing-service call and
the per-group partition contract is unchanged — discovery cost is the
file COUNT, never file bytes, which are only opened inside workers.

Options:
- ``path`` (required): landing root, laid out
  ``{api}/season_{s}/league_{l}/{endpoint}/*.json``
- ``api`` (optional): restrict to one api subtree — pruning applied at
  discovery, before any file is opened.
"""

from __future__ import annotations

import os
import re

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_LAYOUT_RE = re.compile(
    r"(?P<api>[^/]+)/season_(?P<season>\d+)/league_(?P<league>\d+)/(?P<endpoint>[^/]+)$"
)

SCHEMA = (
    "api string, season int, league int, endpoint string, "
    "file_path string, payload string"
)


class LandingGroup(InputPartition):
    """One (api, season, league) group: [(api, season, league,
    endpoint, path), ...] — a plain picklable value object."""

    def __init__(self, files: list[tuple]):
        self.files = files


class FootballLandingReader(DataSourceReader):
    def __init__(self, options: dict):
        root = options.get("path")
        if not root:
            raise ValueError(
                "football_landing requires a path: spark.read"
                '.format("football_landing").load("<landing root>")'
            )
        self.root = root
        self.api_filter = options.get("api")

    def partitions(self):
        groups: dict[tuple, list] = {}
        for dirpath, _dirs, files in os.walk(self.root):
            rel = os.path.relpath(dirpath, self.root)
            m = _LAYOUT_RE.match(rel.replace(os.sep, "/"))
            if not m:
                continue
            api = m.group("api")
            if self.api_filter and api != self.api_filter:
                continue
            key = (api, int(m.group("season")), int(m.group("league")))
            for f in sorted(files):
                if f.endswith(".json"):
                    groups.setdefault(key, []).append(
                        (*key, m.group("endpoint"), os.path.join(dirpath, f))
                    )
        # deterministic partition order (dict order is insertion order
        # from os.walk, which is filesystem-dependent)
        return [LandingGroup(groups[k]) for k in sorted(groups)]

    def read(self, partition: LandingGroup):
        for api, season, league, endpoint, path in partition.files:
            with open(path) as fh:
                yield (api, season, league, endpoint, path, fh.read())


class FootballLandingDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "football_landing"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema):
        return FootballLandingReader(self.options)


def register(spark) -> None:
    """Idempotent registration: after this,
    ``spark.read.format("football_landing")`` resolves."""
    spark.dataSource.register(FootballLandingDataSource)
