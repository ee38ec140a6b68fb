"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API)
for the football landing zone: ``spark.read.format("football_landing")``
yields one row per staged raw JSON file (and
``df.write.format("football_landing")`` publishes rows back into the
layout through a two-phase staged commit), with the landing-path key
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
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

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


class FootballLandingStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same landing zone: each micro-batch emits
    the files that appeared since the last offset, exactly once.

    Offset format: ``{"seen": [path, ...]}`` (sorted). A path list is
    the HONEST offset for a directory with no ordering guarantees —
    nothing monotone exists to watermark on (mtimes can go backwards
    on copy). It grows with history; at real scale the landing layout
    is date-partitioned and the offset holds only the open partitions'
    listings, with closed days compacted to a count. Replay safety:
    ``readBetweenOffsets`` reproduces any committed batch as a pure
    set difference, which Spark uses to re-deliver a batch lost to a
    crash between write and commit."""

    def __init__(self, options: dict):
        self._discover = FootballLandingReader(options)

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _listing(self) -> dict[str, tuple]:
        return {
            entry[4]: entry
            for part in self._discover.partitions()
            for entry in part.files
        }

    def read(self, start: dict):
        listing = self._listing()
        seen = set(start["seen"])
        new_paths = sorted(p for p in listing if p not in seen)
        end = {"seen": sorted(seen | set(new_paths))}
        return (self._rows(listing, new_paths), end)

    def readBetweenOffsets(self, start: dict, end: dict):
        listing = self._listing()
        paths = sorted(set(end["seen"]) - set(start["seen"]))
        return self._rows(listing, paths)

    @staticmethod
    def _rows(listing: dict[str, tuple], paths: list[str]) -> list[tuple]:
        # Materialized list, not a generator: the simple-reader harness
        # caches each batch's iterator for replay (copy.copy fails on
        # generators). Batch size = files since last trigger — bounded
        # by arrival rate, and payloads are small raw JSON staged by
        # ingest; a bulk-history backfill belongs on the BATCH reader.
        rows = []
        for p in paths:
            entry = listing.get(p)
            if entry is None:
                # Replay of a committed offset can reference a file
                # deleted/moved since the original batch (retention
                # sweep, manual cleanup). A bare KeyError here wedges
                # the stream permanently at this batch; name the file
                # and the recovery path instead.
                raise FileNotFoundError(
                    f"football_landing replay: committed file {p!r} is no "
                    "longer in the landing listing. Restore the file, or "
                    "start a fresh checkpoint to skip the lost batch."
                )
            api, season, league, endpoint, path = entry
            with open(path) as fh:
                rows.append((api, season, league, endpoint, path, fh.read()))
        return rows


class LandingCommit(WriterCommitMessage):
    """Per-task commit message: [(staged_abs_path, final_rel_path)]."""

    def __init__(self, moves: list[tuple]):
        self.moves = moves


class FootballLandingWriter(DataSourceWriter):
    """Write side of the landing connector:
    ``df.write.format("football_landing").save(root)`` publishes rows
    back into the ``{api}/season_{s}/league_{l}/{endpoint}/`` layout,
    one JSON file per row (the layout's unit IS the staged response
    file — the batch reader's payload contract round-trips).

    Two-phase commit, the file-sink recipe: every task writes only
    under ``<root>/_staging/<uuid>/`` and returns the intended final
    locations as its commit message; the DRIVER publishes all staged
    files with renames in ``commit()`` (and clears them in
    ``abort()``) — a crashed task leaves nothing but unreferenced
    staging files. ``overwrite`` replaces each TARGETED endpoint
    directory (the narrow dynamic-partition-overwrite semantics, not
    truncate-root) by renaming the current files into a
    ``_tombstone/<job>/`` dir first and deleting them only after every
    staged rename lands, so a mid-commit crash never loses the prior
    data (it stays recoverable under the tombstone dir) and a rename
    failure rolls the displaced files back. Commit is still not
    atomic for concurrent READERS on a plain filesystem — a reader
    listing an endpoint dir mid-commit can see a mix of old/new files;
    single-writer-then-read is the landing contract (matching the
    reference's GCS job, reference ``main.py`` WRITE_TRUNCATE).

    Input columns: api, season, league, endpoint, payload (the
    reader's ``file_path`` is output-generated and ignored on input).
    """

    def __init__(self, options: dict, overwrite: bool):
        root = options.get("path")
        if not root:
            raise ValueError(
                "football_landing requires a path: df.write"
                '.format("football_landing").save("<landing root>")'
            )
        self.root = root
        self.overwrite = overwrite
        self.staging = os.path.join(root, "_staging", uuid.uuid4().hex)

    def write(self, iterator):
        os.makedirs(self.staging, exist_ok=True)
        moves: list[tuple] = []
        for seq, row in enumerate(iterator):
            rel_dir = (
                f"{row['api']}/season_{int(row['season'])}"
                f"/league_{int(row['league'])}/{row['endpoint']}"
            )
            fname = f"part-{uuid.uuid4().hex[:12]}-{seq}.json"
            staged = os.path.join(
                self.staging, f"{len(moves)}-{fname}"
            )
            with open(staged, "w") as fh:
                fh.write(row["payload"])
            moves.append((staged, f"{rel_dir}/{fname}"))
        return LandingCommit(moves)

    def commit(self, messages) -> None:
        import shutil

        moves = [m for msg in messages if msg for m in msg.moves]
        # Overwrite publishes in three steps so prior data is never
        # destroyed before the new data is in place: (1) rename the
        # targeted endpoints' current .json files into a tombstone dir
        # (rename, not delete — recoverable), (2) rename staged files
        # in, (3) drop the tombstones only after every rename
        # succeeded.  A crash between (1) and (2) leaves the old files
        # intact under _tombstone/<job>/ for manual recovery; a rename
        # failure in (2) restores the tombstoned files before raising.
        tombstone = os.path.join(
            self.root, "_tombstone", os.path.basename(self.staging)
        )
        displaced: list[tuple] = []  # (tombstoned_abs, original_abs)
        if self.overwrite:
            for rel_dir in {os.path.dirname(rel) for _, rel in moves}:
                target = os.path.join(self.root, rel_dir)
                if not os.path.isdir(target):
                    continue
                dst_dir = os.path.join(tombstone, rel_dir)
                os.makedirs(dst_dir, exist_ok=True)
                for f in os.listdir(target):
                    if f.endswith(".json"):
                        src = os.path.join(target, f)
                        dst = os.path.join(dst_dir, f)
                        os.rename(src, dst)
                        displaced.append((dst, src))
        try:
            for staged, rel in moves:
                final = os.path.join(self.root, rel)
                os.makedirs(os.path.dirname(final), exist_ok=True)
                os.rename(staged, final)
        except OSError:
            for dst, src in displaced:
                try:
                    os.rename(dst, src)
                except OSError:
                    pass  # leave the rest in the tombstone dir
            raise
        shutil.rmtree(tombstone, ignore_errors=True)
        try:
            os.rmdir(os.path.join(self.root, "_tombstone"))
        except OSError:
            pass
        self._clean_staging(shutil)

    def abort(self, messages) -> None:
        import shutil

        self._clean_staging(shutil)

    def _clean_staging(self, shutil) -> None:
        # remove only THIS job's staging dir — a concurrent write to
        # the same root owns a sibling under _staging/ and must not be
        # swept; drop the shared parent only once it is empty
        shutil.rmtree(self.staging, ignore_errors=True)
        parent = os.path.join(self.root, "_staging")
        try:
            os.rmdir(parent)
        except OSError:
            pass


class FootballLandingDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "football_landing"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema):
        return FootballLandingReader(self.options)

    def simpleStreamReader(self, schema):
        return FootballLandingStreamReader(self.options)

    def writer(self, schema, overwrite: bool):
        return FootballLandingWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotent registration: after this,
    ``spark.read.format("football_landing")`` resolves."""
    spark.dataSource.register(FootballLandingDataSource)
