"""Custom Python data source (Spark 4 DataSource API) — a deterministic
synthetic-events generator.

Why this exists: the reference boots every experiment from sampled
production extracts; a schema-stable deterministic generator is the
engine's answer for load tests, CI fixtures and scale rehearsals —
``spark.read.format("synthetic_events").option("n_rows", 10**9)`` fans
out across the cluster with NO driver-side materialization (each
partition generates its slice on an executor), unlike
``spark.createDataFrame(local_rows)`` which is driver-bounded (S10).

Determinism contract: row ``i`` is a pure function of ``i`` and
``seed`` — independent of partition count, so repartition/rerun produce
identical tables (the same invariance rule every sampler in
operators/sampling.py follows). The value channel uses a 64-bit
splitmix-style integer mix — no ``random`` module, no float drift.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ("click", "view", "purchase", "login", "share")

_SCHEMA = (
    "event_id long, user_id long, event_type string, value double"
)


def _mix64(x: int) -> int:
    """splitmix64 finalizer — deterministic 64-bit avalanche mix."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.n_users = int(options.get("n_users", 100))
        self.seed = int(options.get("seed", 0))

    def partitions(self) -> Sequence[InputPartition]:
        per = -(-self.n_rows // self.n_partitions)  # ceil
        return [
            _RangePartition(i * per, min((i + 1) * per, self.n_rows), self.seed)
            for i in range(self.n_partitions)
            if i * per < self.n_rows
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        n_users, seed = self.n_users, partition.seed
        for i in range(partition.start, partition.end):
            h = _mix64(i ^ seed)
            yield (
                i,
                h % n_users,
                EVENT_TYPES[(h >> 8) % len(EVENT_TYPES)],
                ((h >> 16) % 10_000) / 100.0,
            )


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` after
    ``spark.dataSource.register(SyntheticEventsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the engine's custom sources."""
    spark.dataSource.register(SyntheticEventsDataSource)
