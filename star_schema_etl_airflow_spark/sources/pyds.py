"""A custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic-events generator.

This is the engine's example of the new pure-Python connector surface —
the same API a real connector (REST pagination, message queue, bespoke
binary format) plugs into: declare a schema, split the work into
``InputPartition``s, and yield rows per partition on the executors.

Scale/determinism design:
- rows are a pure function of the row id (md5-derived), so ANY
  partitioning of the id space yields the same dataset — retries,
  speculative tasks, and re-partitioning cannot change the data (the
  same content-hash determinism rule as sampling/splits).
- partition boundaries are contiguous id ranges; each partition streams
  its rows lazily (no partition-sized materialization).
- no driver-side data: the driver ships only (lo, hi) bounds.

The generator is intentionally SQL-expressible (md5 of ``evt:<id>``,
same recipe as ``functions/text.md5_long_*``), so the DuckDB oracle can
re-derive the identical relation and the connector is value-hash checked
end-to-end (``pyds_synthetic_events``) — reader plumbing included.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

EVENT_TYPES = ("view", "click", "purchase")
DEFAULT_ROWS = 1000
DEFAULT_PARTITIONS = 4

SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, value double"
)


def _row(event_id: int) -> tuple:
    h = int(hashlib.md5(f"evt:{event_id}".encode()).hexdigest()[:15], 16)
    return (
        event_id,
        h % 1000,
        EVENT_TYPES[h % 3],
        (h % 10_000) / 100.0,
    )


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", DEFAULT_ROWS))
        self.parts = int(options.get("partitions", DEFAULT_PARTITIONS))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        i = partition.value
        lo = self.rows * i // self.parts
        hi = self.rows * (i + 1) // self.parts
        for event_id in range(lo, hi):
            yield _row(event_id)


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def streamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


def register_synthetic_events(spark) -> None:
    """Idempotent registration of the datasource with a session."""
    spark.dataSource.register(SyntheticEventsDataSource)


# --- streaming reader -------------------------------------------------------


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Offset-tracked streaming variant: the offset is the count of rows
    emitted so far; ``latestOffset`` exposes everything up to the
    configured ``rows`` cap, and each micro-batch's [start, end) range is
    split into ``partitions`` contiguous chunks.  Rows are the same pure
    md5 function of the id as the batch reader, so a resumed query
    (checkpointed offset) continues the exact sequence — exactly-once
    end-to-end with a transactional sink."""

    def __init__(self, options):
        self.rows = int(options.get("rows", DEFAULT_ROWS))
        self.parts = int(options.get("partitions", DEFAULT_PARTITIONS))

    def initialOffset(self):
        return {"offset": 0}

    def latestOffset(self):
        return {"offset": self.rows}

    def partitions(self, start, end):
        lo, hi = start["offset"], end["offset"]
        n = max(1, self.parts)
        bounds = [lo + (hi - lo) * i // n for i in range(n + 1)]
        return [
            RangePartition(bounds[i], bounds[i + 1])
            for i in range(n)
            if bounds[i] < bounds[i + 1]
        ]

    def read(self, partition):
        for event_id in range(partition.lo, partition.hi):
            yield _row(event_id)

    def commit(self, end):
        pass


class RangePartition(InputPartition):
    def __init__(self, lo, hi):
        self.lo, self.hi = lo, hi
