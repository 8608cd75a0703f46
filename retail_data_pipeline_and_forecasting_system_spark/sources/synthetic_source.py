"""Spark 4 Python DataSource: deterministic synthetic event generator.

The reference seeds its stores from fixture files (CSV/JSON loaders,
src/data_processor.py:98-177). An engine also needs a *generator*
source — for load tests, CI fixtures and scale rehearsals — that is
(a) partition-parallel and (b) fully deterministic, unlike Spark's
``rate`` source whose output depends on wall-clock.

This uses the Spark 4 Python DataSource API: the driver plans one
``InputPartition`` per requested partition, executors generate rows
with pure counter-based arithmetic (Knuth multiplicative hashing — no
RNG object, no seed state to ship), so any (partition, row) pair is
reproducible forever and INDEPENDENT of the partition count actually
scheduled.

Usage::

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("num_partitions", 8)
          .option("rows_per_partition", 1000)
          .load())
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
_KNUTH = 2654435761  # 2^32 / golden ratio, classic multiplicative hash


class SyntheticEventsDataSource(DataSource):
    """``format("synthetic_events")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id long, user_id long, event_type string, value double"
        )

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.num_partitions = int(options.get("num_partitions", 4))
        self.rows_per_partition = int(options.get("rows_per_partition", 1000))
        self.num_users = int(options.get("num_users", 97))

    def partitions(self):
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition: InputPartition):
        base = partition.value * self.rows_per_partition
        for i in range(self.rows_per_partition):
            gid = base + i
            h = (gid * _KNUTH) & 0xFFFFFFFF
            yield (
                gid,
                h % self.num_users,
                _EVENT_TYPES[(h >> 8) % len(_EVENT_TYPES)],
                ((h >> 4) % 1_000_000) / 100.0,
            )
