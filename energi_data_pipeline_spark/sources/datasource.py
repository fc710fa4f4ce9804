"""Spark 4 Python Data Source for the PowerSystemRightNow feed.

SURVEY.md §2 row 1 lists two ingest shapes: (a) a driver-side fetch
(``sources.rest``, matches the reference's single-page scale) and
(b) a real registrable Spark source.  This is (b), built on the
public Python Data Source API (``pyspark.sql.datasource``):

* **batch**: ``spark.read.format("energy_power")`` — the record set
  is planned into ``num_partitions`` input splits on the driver and
  each split is fetched/decoded ON THE EXECUTOR, so a year-long
  backfill scales out instead of bottlenecking the driver;
* **stream**: ``spark.readStream.format("energy_power")`` — a
  ``SimpleDataSourceStreamReader`` whose offset is the
  ``Minutes1UTC`` cursor.  Spark's checkpoint persists it, which is
  exactly the role dlt's state dir plays in the reference
  (bronze_ingest.py:13,59-66: ``dlt.sources.incremental`` +
  ``pipeline_metadata``) — resume-after-restart comes for free.

Test mode reads a JSON fixture file (``fixture_path`` option); live
mode hits the API only when a ``url`` option is given explicitly.
Records come out RAW (API field names, ISO strings) — bronze
fidelity; ``sources.normalize`` does the snake_case/typing step,
same as the reference's dlt normalization split.
"""

from __future__ import annotations

import json
from typing import Iterator, Tuple

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader)

#: Raw API fields (bronze_ingest.py:8-13,21 and the dataset docs) —
#: the cursor/sort key plus the 15 numeric measures.
CURSOR_FIELD = "Minutes1UTC"
RAW_MEASURES = [
    "CO2Emission", "ProductionGe100MW", "ProductionLt100MW",
    "SolarPower", "OffshoreWindPower", "OnshoreWindPower",
    "ExchangeSum", "ExchangeDK1_DE", "ExchangeDK2_DE", "ExchangeDK1_NL",
    "ExchangeDK1_GB", "ExchangeDK1_NO", "ExchangeDK1_SE",
    "ExchangeDK2_SE", "ExchangeDK1_DK2",
]
RAW_SCHEMA_DDL = ", ".join(
    [f"{CURSOR_FIELD} string"] + [f"{m} double" for m in RAW_MEASURES])

INITIAL_CURSOR = "1970-01-01T00:00"


def _fetch_records(options: dict, cursor: str,
                   end: str | None = None) -> list[dict]:
    """Records strictly after ``cursor`` (minute-truncated compare),
    optionally bounded to ``<= end``, sorted by the cursor field.

    ``fixture_path`` (JSON list of raw records) is the hermetic test
    path; ``url`` switches to the live API via ``sources.rest``.
    Runs wherever it's called — driver during planning, executor
    during reads.  The strictly-greater filter applies to BOTH paths:
    the live API's ``start=`` parameter is inclusive, so without it a
    stream whose offset is the last-seen cursor would re-emit the
    boundary-minute records every micro-batch.
    """
    if options.get("fixture_path"):
        with open(options["fixture_path"], encoding="utf-8") as fh:
            records = json.load(fh)
    elif options.get("url"):
        from .rest import EnergyRestSource
        records = EnergyRestSource(base_url=options["url"]).fetch(cursor)
    else:
        raise ValueError(
            "energy_power source needs a 'fixture_path' or 'url' option")
    keep = [r for r in records
            if r.get(CURSOR_FIELD) and r[CURSOR_FIELD][:16] > cursor[:16]
            and (end is None or r[CURSOR_FIELD][:16] <= end[:16])]
    return sorted(keep, key=lambda r: r[CURSOR_FIELD])


def _to_row(rec: dict) -> Tuple:
    return tuple([rec.get(CURSOR_FIELD)]
                 + [rec.get(m) for m in RAW_MEASURES])


class RangePartition(InputPartition):
    """Cursor window ``(after, end]`` pinned at planning time.

    Index-range slicing would be wrong for the live source: each
    executor refetches independently, and if the record set shifts
    between planning and reads, index slices drop or duplicate rows.
    Cursor bounds are stable under append-only growth — records past
    the planned end boundary are simply excluded, records inside a
    window always land in exactly one partition.
    """

    def __init__(self, after: str, end: str):
        self.after = after
        self.end = end


class EnergyPowerBatchReader(DataSourceReader):
    """Batch reader: plan cursor windows on the driver, fetch/decode
    each window on its executor."""

    def __init__(self, options: dict):
        self.options = options
        self.cursor = options.get("cursor", INITIAL_CURSOR)
        self.num_partitions = int(options.get("num_partitions", "4"))

    def partitions(self) -> list[InputPartition]:
        # Planning snapshots only the CURSOR BOUNDARIES; the rows are
        # fetched executor-side in read().  Slice ends are extended to
        # minute-cursor group boundaries so records sharing a minute
        # can never straddle two windows (the fetch filter is
        # minute-truncated).
        records = _fetch_records(self.options, self.cursor)
        if not records:
            return [RangePartition(self.cursor, self.cursor)]
        step = -(-len(records) // self.num_partitions)  # ceil
        parts: list[RangePartition] = []
        after = self.cursor
        hi = 0
        while hi < len(records):
            hi = min(hi + step, len(records))
            # absorb any trailing records that share the boundary minute
            while (hi < len(records) and records[hi][CURSOR_FIELD][:16]
                   == records[hi - 1][CURSOR_FIELD][:16]):
                hi += 1
            end = records[hi - 1][CURSOR_FIELD]
            parts.append(RangePartition(after, end))
            after = end
        return parts

    def read(self, partition: RangePartition) -> Iterator[Tuple]:
        records = _fetch_records(
            self.options, partition.after, end=partition.end)
        for rec in records:
            yield _to_row(rec)


class EnergyPowerStreamReader(SimpleDataSourceStreamReader):
    """Incremental cursor stream: offset == last-seen Minutes1UTC.

    ``read(start)`` returns everything past the cursor plus the next
    offset; Spark checkpoints the offset, giving the reference's
    resume-from-state semantics (bronze_ingest.py:23) without any
    side state file.  ``readBetweenOffsets`` replays a committed
    span after restart.

    **Open-minute holdback** (``hold_open_minute`` option, default on
    for the live ``url`` path, off for ``fixture_path``): the cursor
    compare is minute-truncated and strictly greater, so advancing
    the offset INTO a minute whose rows are still being published
    would permanently skip the rest of that minute — silent
    at-most-once loss.  Instead the newest minute in a fetch is
    treated as possibly still open: its rows are withheld and the
    offset stops at the last COMPLETE minute; the held rows ship in
    a later batch once a newer minute proves the boundary closed.
    A fixture is a closed feed, so holding back its final minute
    would just lose it — hence the path-dependent default.
    """

    def __init__(self, options: dict):
        self.options = options
        self.start_cursor = options.get("cursor", INITIAL_CURSOR)
        default = "true" if options.get("url") else "false"
        self.hold_open_minute = str(
            options.get("hold_open_minute", default)).lower() == "true"

    def initialOffset(self) -> dict:
        return {"cursor": self.start_cursor}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        records = _fetch_records(self.options, start["cursor"])
        if self.hold_open_minute and records:
            open_minute = records[-1][CURSOR_FIELD][:16]
            records = [r for r in records
                       if r[CURSOR_FIELD][:16] != open_minute]
        if not records:
            return iter([]), start
        next_cursor = records[-1][CURSOR_FIELD]
        return iter([_to_row(r) for r in records]), {"cursor": next_cursor}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        records = _fetch_records(
            self.options, start["cursor"], end=end["cursor"])
        return iter([_to_row(r) for r in records])


class EnergyPowerDataSource(DataSource):
    """``spark.dataSource.register(EnergyPowerDataSource)`` then
    ``spark.read.format("energy_power")`` / ``spark.readStream...``."""

    @classmethod
    def name(cls) -> str:
        return "energy_power"

    def schema(self) -> str:
        return RAW_SCHEMA_DDL

    def reader(self, schema) -> DataSourceReader:
        return EnergyPowerBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return EnergyPowerStreamReader(self.options)
