"""Pluggable ticket source on the Spark 4 Python Data Source API.

SURVEY §2.1 S12: the reference's Selenium crawlers
(crawl/crawl_ticket.py:212-317) are out of engine scope, but their
*contract* — a partitioned producer of raw all-string ticket rows — is
modeled here as a first-class `spark.read.format("vexere_tickets")`
source.  One `InputPartition` per crawl day, so generation (in
production: the per-day scrape/fetch shard) runs ON EXECUTORS in
parallel instead of on the driver like a createDataFrame fixture; a
real deployment swaps the row generator for an HTTP/page fetch while
keeping schema, partitioning and options identical.

Deterministic per (seed, day): same options always produce the same
rows, independent of parallelism — the same reproducibility contract
as operators/sampling.py.

Usage:
    spark.dataSource.register(TicketDataSource)
    df = (spark.read.format("vexere_tickets")
          .option("days", "01-05-2025,02-05-2025")
          .option("rows_per_day", 240).load())
"""

from __future__ import annotations

import random
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from vexere_lakehouse_pipeline_spark.sources.fixtures import messy_ticket_row

TICKET_DDL = (
    "Bus_Key string, Bus_Name string, Start_Date string, Route string, "
    "Departure_Time string, Arrival_Time string, Departure_Place string, "
    "Arrival_Place string, Duration string, Type_Bus string, Price string"
)


class DayPartition(InputPartition):
    def __init__(self, day: str, rows: int, seed: int, key_base: int):
        self.day = day
        self.rows = rows
        self.seed = seed
        self.key_base = key_base


def _day_rows(p: DayPartition) -> Iterator[tuple]:
    # Shared row builder with fixtures.raw_tickets (one source of
    # truth); seeded per partition so executors generate independently
    # and deterministically.
    rng = random.Random(f"{p.seed}:{p.day}")
    for i in range(p.rows):
        yield messy_ticket_row(rng, p.key_base + i, p.day)


class TicketReader(DataSourceReader):
    def __init__(self, options: dict):
        self.days: Sequence[str] = [
            d.strip() for d in options.get("days", "01-05-2025").split(",")
            if d.strip()
        ]
        self.rows_per_day = int(options.get("rows_per_day", 240))
        self.seed = int(options.get("seed", 42))

    def partitions(self) -> Sequence[InputPartition]:
        return [
            DayPartition(day, self.rows_per_day, self.seed,
                         key_base=1 + i * self.rows_per_day)
            for i, day in enumerate(self.days)
        ]

    def read(self, partition: DayPartition) -> Iterator[tuple]:
        return _day_rows(partition)


class TicketDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "vexere_tickets"

    def schema(self) -> str:
        return TICKET_DDL

    def reader(self, schema) -> TicketReader:
        return TicketReader(self.options)

    def streamReader(self, schema):  # noqa: N802
        if not HAS_STREAM_READER:  # pragma: no cover
            raise NotImplementedError("streaming reader needs pyspark >= 4")
        return TicketStreamReader(self.options)


# ---------------------------------------------------------------------------
# Streaming flavor: offsets are crawl-day indexes — restarts resume
# from the checkpointed day boundary and each day is its own input
# partition; with trigger(availableNow=True) the stream drains every
# configured day (possibly in one micro-batch — see latestOffset) then
# stops.
# ---------------------------------------------------------------------------
try:  # pragma: no cover - availability gate (pyspark >= 4)
    from pyspark.sql.datasource import DataSourceStreamReader

    class TicketStreamReader(DataSourceStreamReader):
        def __init__(self, options: dict):
            self._r = TicketReader(options)
            self._committed = 0

        def initialOffset(self) -> dict:  # noqa: N802
            return {"index": 0}

        def latestOffset(self) -> dict:  # noqa: N802
            # The whole configured range is "available": under
            # availableNow Spark snapshots this ONCE and may admit all
            # days into a single micro-batch (the Python stream-reader
            # API has no admission-control hook yet, so per-day batch
            # pacing is not expressible).  Restarts still resume from
            # the committed day boundary, and partitions() keeps one
            # InputPartition per day, so day remains the parallelism
            # and replay unit.
            return {"index": len(self._r.days)}

        def partitions(self, start: dict, end: dict):
            return [
                DayPartition(day, self._r.rows_per_day, self._r.seed,
                             key_base=1 + i * self._r.rows_per_day)
                for i, day in enumerate(self._r.days)
            ][start["index"]:end["index"]]

        def read(self, partition: DayPartition) -> Iterator[tuple]:
            return _day_rows(partition)

        def commit(self, end: dict) -> None:
            self._committed = max(self._committed, end["index"])

    HAS_STREAM_READER = True
except ImportError:  # pragma: no cover
    HAS_STREAM_READER = False
